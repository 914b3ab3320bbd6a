from slak_tpu.models.slak import (
    SLaKConfig,
    SLaK,
    slak_tiny,
    slak_small,
    slak_base,
    slak_large,
    convnext_tiny,
    convnext_small,
    convnext_base,
    convnext_large,
    convnext_xlarge,
    MODEL_REGISTRY,
    create_model,
)

__all__ = [
    "SLaKConfig", "SLaK",
    "slak_tiny", "slak_small", "slak_base", "slak_large",
    "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
    "convnext_xlarge",
    "MODEL_REGISTRY", "create_model",
]
