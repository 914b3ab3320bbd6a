from slak_tpu.downstream.segmentation import (
    UperNetConfig, init_upernet, upernet_forward, seg_loss,
)
from slak_tpu.downstream.configs import (
    SEG_CONFIGS, DET_CONFIGS, SegRecipe, DetRecipe,
)

__all__ = ["UperNetConfig", "init_upernet", "upernet_forward", "seg_loss",
           "SEG_CONFIGS", "DET_CONFIGS", "SegRecipe", "DetRecipe"]
