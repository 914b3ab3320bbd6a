"""Semantic-segmentation head: UperNet (PSP + FPN fuse) with an FCN
auxiliary head — the JAX equivalent of the mmseg decoder the reference's
ADE20K configs attach to the SLaK backbone
(``segmentation/configs/upernet_slak_tiny_512_80k_ade20k_ss.py:24-45``;
UPerHead pool scales (1,2,3,6)/channels 512 and FCNHead on stage 2 with
loss weight 0.4 come from mmseg's upernet base config the reference
inherits).

The backbone side is :mod:`slak_tpu.models.backbone` (out_indices,
per-stage norms, sparse-eval masks). Everything here is functional NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UperNetConfig:
    in_channels: Tuple[int, ...] = (124, 249, 499, 998)  # dims * 1.3
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    num_classes: int = 150
    aux_in_index: int = 2
    aux_channels: int = 256
    aux_loss_weight: float = 0.4
    dropout: float = 0.1


def _conv_init(rng, kh, kw, cin, cout):
    fan = kh * kw * cin
    k1, _ = jax.random.split(rng)
    return {"w": (jax.random.normal(k1, (kh, kw, cin, cout))
                  * jnp.sqrt(2.0 / fan)).astype(jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _conv(x, p, padding="SAME", relu=True):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["b"].astype(y.dtype)
    return jax.nn.relu(y) if relu else y


def _resize(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


def init_upernet(rng: Array, cfg: UperNetConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 32))
    c = cfg.channels
    p: Dict[str, Any] = {
        # PSP on the last stage
        "psp": [_conv_init(next(keys), 1, 1, cfg.in_channels[-1], c)
                for _ in cfg.pool_scales],
        "psp_bottleneck": _conv_init(
            next(keys), 3, 3, cfg.in_channels[-1] + c * len(cfg.pool_scales),
            c),
        # FPN lateral 1x1s + output 3x3s (all stages but the last)
        "lateral": [_conv_init(next(keys), 1, 1, cin, c)
                    for cin in cfg.in_channels[:-1]],
        "fpn_out": [_conv_init(next(keys), 3, 3, c, c)
                    for _ in cfg.in_channels[:-1]],
        "fuse": _conv_init(next(keys), 3, 3, c * len(cfg.in_channels), c),
        "classifier": _conv_init(next(keys), 1, 1, c, cfg.num_classes),
        # FCN aux head on stage aux_in_index
        "aux_conv": _conv_init(next(keys), 3, 3,
                               cfg.in_channels[cfg.aux_in_index],
                               cfg.aux_channels),
        "aux_classifier": _conv_init(next(keys), 1, 1, cfg.aux_channels,
                                     cfg.num_classes),
    }
    return p


def upernet_forward(params: Dict[str, Any], feats: Sequence[Array],
                    cfg: UperNetConfig, *, train: bool = False,
                    rng: Optional[Array] = None
                    ) -> Tuple[Array, Array]:
    """feats: multi-scale NHWC stage features (from the backbone).
    Returns (main_logits, aux_logits) at the stage-0 resolution (caller
    upsamples to the input size for the loss / prediction)."""
    x4 = feats[-1]
    h4, w4 = x4.shape[1], x4.shape[2]

    # PSP: adaptive-avg-pool to each scale, 1x1 conv, upsample, concat
    psp_outs = [x4]
    for scale, conv_p in zip(cfg.pool_scales, params["psp"]):
        if h4 % scale == 0 and w4 % scale == 0:
            pooled = jnp.mean(
                x4.reshape(x4.shape[0], scale, h4 // scale, scale,
                           w4 // scale, -1), axis=(2, 4))
        else:
            pooled = _adaptive_pool(x4, scale)
        y = _conv(pooled, conv_p)
        psp_outs.append(_resize(y, h4, w4))
    psp = _conv(jnp.concatenate(psp_outs, -1), params["psp_bottleneck"])

    # FPN top-down
    laterals = [_conv(f, p) for f, p in zip(feats[:-1], params["lateral"])]
    laterals.append(psp)
    for i in range(len(laterals) - 1, 0, -1):
        hi, wi = laterals[i - 1].shape[1], laterals[i - 1].shape[2]
        laterals[i - 1] = laterals[i - 1] + _resize(laterals[i], hi, wi)
    outs = [_conv(laterals[i], params["fpn_out"][i])
            for i in range(len(laterals) - 1)]
    outs.append(psp)

    # fuse at the finest scale
    h0, w0 = feats[0].shape[1], feats[0].shape[2]
    fused = jnp.concatenate([_resize(o, h0, w0) for o in outs], -1)
    fused = _conv(fused, params["fuse"])
    if train and cfg.dropout > 0 and rng is not None:
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(rng, keep, fused.shape[:1] + (1, 1, 1))
        fused = jnp.where(mask, fused / keep, 0.0)
    logits = _conv(fused, params["classifier"], relu=False)

    aux = _conv(feats[cfg.aux_in_index], params["aux_conv"])
    aux_logits = _conv(aux, params["aux_classifier"], relu=False)
    aux_logits = _resize(aux_logits, h0, w0)
    return logits, aux_logits


def _adaptive_pool(x: Array, scale: int) -> Array:
    """Adaptive average pool to (scale, scale) for non-divisible sizes."""
    return jax.image.resize(
        x, (x.shape[0], scale, scale, x.shape[-1]), "linear")


def seg_loss(logits: Array, aux_logits: Array, labels: Array,
             cfg: UperNetConfig, ignore_index: int = 255) -> Array:
    """Per-pixel CE (+0.4 * aux CE), mmseg convention with ignore label."""
    h, w = labels.shape[1], labels.shape[2]

    def ce(lg):
        lg = _resize(lg, h, w).astype(jnp.float32)
        lp = jax.nn.log_softmax(lg, axis=-1)
        valid = labels != ignore_index
        lab = jnp.where(valid, labels, 0)
        nll = -jnp.take_along_axis(lp, lab[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    return ce(logits) + cfg.aux_loss_weight * ce(aux_logits)
