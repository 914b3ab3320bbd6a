from slak_tpu.train.engine import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from slak_tpu.train.optim import (
    AdamWConfig,
    adamw_init,
    adamw_update,
    adam_momentum,
    cosine_schedule_array,
    layer_decay_scales,
    layer_id_for_param,
    param_groups,
)
from slak_tpu.train.ema import ema_init, ema_update
from slak_tpu.train import losses

__all__ = [
    "TrainConfig", "TrainState", "create_train_state", "make_train_step",
    "make_eval_step",
    "AdamWConfig", "adamw_init", "adamw_update", "adam_momentum",
    "cosine_schedule_array", "layer_decay_scales", "layer_id_for_param",
    "param_groups", "ema_init", "ema_update", "losses",
]
