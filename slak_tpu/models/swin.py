"""Swin Transformer (tiny) — KD *teacher*, covering the reference's
``swin_tiny_patch4_window7_224`` teacher path (``main_KD.py:413-449``;
the fork's feature capture at ``timm1/models/swin_transformer.py:549``
exposes the final 7x7 token map for FD distillation).

Functional NHWC JAX implementation: windowed MSA with relative position
bias, shifted windows on odd blocks, patch merging between stages.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.models.layers import layer_norm, trunc_normal, gelu, drop_path

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    img_size: int = 224
    drop_path_rate: float = 0.0


def _dense_init(rng, cin, cout, bias=True):
    p = {"w": trunc_normal(rng, (cin, cout))}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _block_init(rng, dim, num_heads, window):
    keys = iter(jax.random.split(rng, 6))
    return {
        "norm1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "qkv": _dense_init(next(keys), dim, 3 * dim),
        "proj": _dense_init(next(keys), dim, dim),
        "rel_bias": trunc_normal(next(keys),
                                 ((2 * window - 1) ** 2, num_heads)),
        "norm2": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "fc1": _dense_init(next(keys), dim, 4 * dim),
        "fc2": _dense_init(next(keys), 4 * dim, dim),
    }


def init(rng: Array, cfg: SwinConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 8 + sum(cfg.depths)))
    d = cfg.embed_dim
    p: Dict[str, Any] = {
        "patch_embed": {
            "w": trunc_normal(next(keys), (cfg.patch_size, cfg.patch_size,
                                           3, d)),
            "b": jnp.zeros((d,))},
        "embed_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "stages": [],
        "merge": [],
        "norm": {"scale": jnp.ones((d * 8,)), "bias": jnp.zeros((d * 8,))},
        "head": _dense_init(next(keys), d * 8, cfg.num_classes),
    }
    for i, depth in enumerate(cfg.depths):
        dim = d * (2 ** i)
        p["stages"].append([
            _block_init(next(keys), dim, cfg.num_heads[i], cfg.window)
            for _ in range(depth)])
        if i < 3:
            p["merge"].append({
                "norm": {"scale": jnp.ones((4 * dim,)),
                         "bias": jnp.zeros((4 * dim,))},
                "reduction": _dense_init(next(keys), 4 * dim, 2 * dim,
                                         bias=False)})
    return p


def _rel_bias_index(window: int) -> jnp.ndarray:
    coords = jnp.stack(jnp.meshgrid(jnp.arange(window), jnp.arange(window),
                                    indexing="ij"), 0).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel + (window - 1)
    return rel[0] * (2 * window - 1) + rel[1]  # (w², w²)


def _window_attn(x: Array, bp: Dict, num_heads: int, window: int,
                 shift: int) -> Array:
    """x: (N, H, W, C) with H, W divisible by window."""
    n, h, w, c = x.shape
    hd = c // num_heads
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    # partition windows
    xw = x.reshape(n, h // window, window, w // window, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)

    qkv = jnp.dot(xw, bp["qkv"]["w"].astype(xw.dtype)) + bp["qkv"]["b"]
    qkv = qkv.reshape(xw.shape[0], -1, 3, num_heads, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = jnp.einsum("bhtd,bhsd->bhts", q, k,
                     preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    bias = bp["rel_bias"][_rel_bias_index(window)]      # (w², w², heads)
    att = att + bias.transpose(2, 0, 1)[None]

    if shift:
        # mask cross-boundary attention in shifted windows
        img_mask = jnp.zeros((h, w), jnp.int32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                img_mask = img_mask.at[hs, ws].set(cnt)
                cnt += 1
        mw = img_mask.reshape(h // window, window, w // window, window)
        mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
        amask = (mw[:, :, None] != mw[:, None, :])
        amask = jnp.where(amask, -100.0, 0.0)           # (nw, w², w²)
        nw = amask.shape[0]
        att = att.reshape(n, nw, num_heads, window * window, -1)
        att = att + amask[None, :, None]
        att = att.reshape(-1, num_heads, window * window, window * window)

    att = jax.nn.softmax(att, axis=-1).astype(xw.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(xw.shape[0], -1, c)
    out = jnp.dot(out, bp["proj"]["w"].astype(out.dtype)) + bp["proj"]["b"]

    out = out.reshape(n, h // window, w // window, window, window, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    return out


def apply(params: Dict, x: Array, *, cfg: SwinConfig, train: bool = False,
          rng: Optional[Array] = None) -> Tuple[Array, Array]:
    """(N, H, W, 3) -> (logits, final 7x7 feature map (N, h, w, C))."""
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"].astype(x.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["b"].astype(x.dtype)
    x = layer_norm(x, params["embed_norm"]["scale"],
                   params["embed_norm"]["bias"])

    total = sum(cfg.depths)
    dp = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    cur = 0
    for i, blocks in enumerate(params["stages"]):
        for j, bp in enumerate(blocks):
            attn_rng = mlp_rng = None
            if rng is not None and train:
                rng, attn_rng, mlp_rng = jax.random.split(rng, 3)
            shift = cfg.window // 2 if (j % 2 == 1
                                        and x.shape[1] > cfg.window) else 0
            shortcut = x
            y = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"])
            y = _window_attn(y, bp, cfg.num_heads[i], cfg.window, shift)
            x = shortcut + drop_path(y, dp[cur + j], attn_rng, train)
            shortcut = x
            y = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"])
            y = jnp.dot(y, bp["fc1"]["w"].astype(y.dtype)) + bp["fc1"]["b"]
            y = gelu(y)
            y = (jnp.dot(y, bp["fc2"]["w"].astype(y.dtype))
                 + bp["fc2"]["b"]).astype(x.dtype)
            x = shortcut + drop_path(y, dp[cur + j], mlp_rng, train)
        cur += cfg.depths[i]
        if i < 3:
            # patch merging 2x2
            n, h, w, c = x.shape
            x = x.reshape(n, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2,
                                                      4 * c)
            mp = params["merge"][i]
            x = layer_norm(x, mp["norm"]["scale"], mp["norm"]["bias"])
            x = jnp.dot(x, mp["reduction"]["w"].astype(x.dtype))

    feature = x                                           # (N, 7, 7, 8d)
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    pooled = jnp.mean(x, axis=(1, 2))
    logits = (jnp.dot(pooled, params["head"]["w"].astype(pooled.dtype))
              + params["head"]["b"]).astype(jnp.float32)
    return logits, feature


class Swin:
    def __init__(self, cfg: SwinConfig):
        self.cfg = cfg

    def init(self, rng):
        return init(rng, self.cfg)

    def apply(self, params, x, **kw):
        return apply(params, x, cfg=self.cfg, **kw)

    def teacher_apply(self, params):
        def fn(images):
            logits, feat = apply(params, images, cfg=self.cfg, train=False)
            return (jax.lax.stop_gradient(logits),
                    jax.lax.stop_gradient(feat))
        return fn


def swin_tiny_patch4_window7_224(**kw) -> Swin:
    return Swin(SwinConfig(**kw))
