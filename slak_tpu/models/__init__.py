from slak_tpu.models.slak import (
    SLaKConfig,
    SLaK,
    slak_debug,
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

from slak_tpu.models import backbone  # noqa: F401  (downstream API)

__all__ = [
    "SLaKConfig", "SLaK",
    "slak_debug", "slak_tiny", "slak_small", "slak_base", "slak_large",
    "convnext_tiny", "convnext_small", "convnext_base", "convnext_large",
    "convnext_xlarge",
    "MODEL_REGISTRY", "create_model", "backbone",
]

# teacher families (KD zoo) live in their own modules:
#   slak_tpu.models.vit / swin / cswin / resnet / mobile
