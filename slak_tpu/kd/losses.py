"""Knowledge-distillation losses — functional JAX clones of the reference's
KD zoo: ``NKDLoss`` (``engine_kd.py:18-63``), vanilla KD (``engine_kd.py:
65-74``), feature distillation (SmoothL1/MSE, ``engine_kd.py:105-117,
146-172``), and Masked Generative Distillation (``main_KD.py:42-108``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def _label_of(targets: Array) -> Array:
    """Soft targets (from mixup) -> argmax label (engine_kd.py:31-34)."""
    if targets.ndim > 1:
        return jnp.argmax(targets, axis=1)
    return targets


def nkd_loss(logit_s: Array, logit_t: Array, targets: Array,
             temp: float = 1.0, alpha: float = 1.0) -> Array:
    """NKD: 'Rethinking Knowledge Distillation via Cross-Entropy'.

    Clone of engine_kd.py:30-63: the target class is handled by a weighted
    CE term (teacher prob at the label as the weight), and the non-target
    distribution is distilled at temperature ``temp`` after masking the
    label logit out with a -1000 offset.
    """
    label = _label_of(targets)
    n = logit_s.shape[0]
    idx = label[:, None]

    y_i = jax.nn.softmax(logit_s.astype(jnp.float32), axis=1)
    t_i = jax.nn.softmax(logit_t.astype(jnp.float32), axis=1)
    y_t = jnp.take_along_axis(y_i, idx, axis=1)                  # N,1
    w_t = jax.lax.stop_gradient(jnp.take_along_axis(t_i, idx, axis=1))

    mask = jax.nn.one_hot(label, logit_s.shape[1], dtype=jnp.float32)
    ls = logit_s.astype(jnp.float32) - 1000.0 * mask
    lt = logit_t.astype(jnp.float32) - 1000.0 * mask

    T_i = jax.nn.softmax(lt / temp, axis=1)
    S_i = jax.nn.softmax(ls / temp, axis=1)
    T_t = jnp.take_along_axis(T_i, idx, axis=1)
    S_t = jnp.take_along_axis(S_i, idx, axis=1)

    np_t = T_i / (1.0 - T_t)
    np_s = S_i / (1.0 - S_t)
    # reference zeroes entries where T_i == T_t — i.e. the label position
    # (its prob is the gathered one); value-ties elsewhere are measure-zero
    np_t = jnp.where(mask > 0, 0.0, np_t)
    np_s = jnp.where(mask > 0, 1.0, np_s)

    soft_loss = -jnp.mean(w_t * jnp.log(y_t))
    dist = jnp.mean(jnp.sum(np_t * jnp.log(np_s), axis=1))
    return soft_loss - alpha * (temp ** 2) * dist


def kd_loss(logit_s: Array, targets: Array, logit_t: Array, temp: float = 1.0,
            hard: bool = False, alpha: float = 0.1) -> Array:
    """Vanilla KD (engine_kd.py:65-74): KL(student/T || teacher/T)·T²·α +
    CE·(1-α); hard variant distills argmax labels 50/50."""
    label = _label_of(targets)

    def ce(logits, lab):
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
        return -jnp.mean(jnp.take_along_axis(lp, lab[:, None], axis=1))

    if hard:
        y_t = jnp.argmax(logit_t, axis=1)
        return 0.5 * ce(logit_s, label) + 0.5 * ce(logit_s, y_t)
    lp_s = jax.nn.log_softmax(logit_s.astype(jnp.float32) / temp, axis=1)
    p_t = jax.nn.softmax(logit_t.astype(jnp.float32) / temp, axis=1)
    # F.kl_div(input=log_q, target=p, batchmean) = mean_n sum_c p (log p - log_q)
    kl = jnp.mean(jnp.sum(p_t * (jnp.log(jnp.clip(p_t, 1e-30)) - lp_s),
                          axis=1))
    return kl * temp * temp * alpha + ce(logit_s, label) * (1.0 - alpha)


def smooth_l1(x: Array, y: Array, beta: float = 2.0) -> Array:
    """torch nn.SmoothL1Loss(beta) (engine_kd.py:105-106)."""
    d = jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def mse(x: Array, y: Array) -> Array:
    return jnp.mean(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)))


def fd_loss(feat_s: Array, feat_t: Array, loss_type: str = "smoothL1"
            ) -> Array:
    """Feature distillation on (N,H,W,C) stage features; the teacher feature
    is stop-gradient'ed (engine_kd.py:146-172)."""
    feat_t = jax.lax.stop_gradient(feat_t)
    if feat_s.shape[1:3] != feat_t.shape[1:3]:
        feat_s = jax.image.resize(
            feat_s, feat_s.shape[:1] + feat_t.shape[1:3] + feat_s.shape[3:],
            method="bilinear")
    if loss_type == "smoothL1":
        return smooth_l1(feat_s, feat_t)
    if loss_type == "MSE":
        return mse(feat_s, feat_t)
    raise ValueError(loss_type)


# --- MGD (main_KD.py:42-108) -------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MGDConfig:
    alpha_mgd: float = 7e-5
    lambda_mgd: float = 0.5


def mgd_init(rng: Array, student_channels: int, teacher_channels: int
             ) -> Dict[str, Any]:
    """Trainable MGD params: optional 1x1 align conv + 3x3-ReLU-3x3
    generation head (trained jointly with the student)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    tc = teacher_channels

    def conv(rng, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        w = jax.random.normal(rng, (kh, kw, cin, cout)) * jnp.sqrt(2 / fan_in)
        return {"w": w.astype(jnp.float32), "b": jnp.zeros((cout,))}

    p = {"gen1": conv(k2, 3, 3, tc, tc), "gen2": conv(k3, 3, 3, tc, tc)}
    if student_channels != teacher_channels:
        p["align"] = conv(k1, 1, 1, student_channels, tc)
    return p


def _conv(x, p, padding):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(out.dtype)


def mgd_loss(rng: Array, params: Dict[str, Any], feat_s: Array, feat_t: Array,
             cfg: MGDConfig = MGDConfig()) -> Array:
    """Masked Generative Distillation: mask random student channels, ask a
    small generator to reconstruct the teacher feature, MSE(sum)/N."""
    feat_t = jax.lax.stop_gradient(feat_t)
    n, h, w, c_t = feat_t.shape
    if feat_s.shape[1:3] != (h, w):
        feat_s = jax.image.resize(feat_s,
                                  (feat_s.shape[0], h, w, feat_s.shape[3]),
                                  method="bilinear")
    if "align" in params:
        feat_s = _conv(feat_s, params["align"], "SAME")
    mat = jax.random.uniform(rng, (n, 1, 1, feat_s.shape[-1]))
    mat = jnp.where(mat < cfg.lambda_mgd, 0.0, 1.0)
    masked = feat_s * mat.astype(feat_s.dtype)
    gen = _conv(masked, params["gen1"], "SAME")
    gen = jax.nn.relu(gen)
    gen = _conv(gen, params["gen2"], "SAME")
    dis = jnp.sum(jnp.square(gen.astype(jnp.float32)
                             - feat_t.astype(jnp.float32))) / n
    return dis * cfg.alpha_mgd
