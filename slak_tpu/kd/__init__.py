from slak_tpu.kd.losses import (
    nkd_loss, kd_loss, fd_loss, smooth_l1, mse,
    MGDConfig, mgd_init, mgd_loss,
)
from slak_tpu.kd.engine import (
    KDConfig, init_kd_params, make_kd_train_step, make_teacher_apply,
    kd_opt_init,
)

__all__ = [
    "nkd_loss", "kd_loss", "fd_loss", "smooth_l1", "mse",
    "MGDConfig", "mgd_init", "mgd_loss",
    "KDConfig", "init_kd_params", "make_kd_train_step", "make_teacher_apply",
    "kd_opt_init",
]
