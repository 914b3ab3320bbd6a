"""Vision Transformer (DeiT-style) — a KD *teacher* model, covering the
reference's ViT/DeiT teacher path (``main_KD.py:413-449``,
``timm1/models/vision_transformer.py``; the fork adds a ``self.feature``
capture at ``vision_transformer.py:302`` used for FD distillation).

Functional NHWC-input JAX implementation; exposes the patch-token feature
map reshaped to (N, gh, gw, C) like the reference's FD path reshapes tokens
to 14x14 (``engine_kd.py:152-157``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.models.layers import layer_norm, trunc_normal, gelu, drop_path

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    in_chans: int = 3
    img_size: int = 224
    drop_path_rate: float = 0.0
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid


def init(rng: Array, cfg: ViTConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 6 + 8 * cfg.depth))
    d = cfg.embed_dim
    p: Dict[str, Any] = {
        "patch_embed": {
            "w": trunc_normal(next(keys),
                              (cfg.patch_size, cfg.patch_size, cfg.in_chans,
                               d)),
            "b": jnp.zeros((d,), jnp.float32),
        },
        "cls_token": jnp.zeros((1, 1, d), jnp.float32),
        "pos_embed": trunc_normal(next(keys), (1, cfg.num_patches + 1, d)),
        "blocks": [],
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "head": {"w": trunc_normal(next(keys), (d, cfg.num_classes)),
                 "b": jnp.zeros((cfg.num_classes,))},
    }
    for _ in range(cfg.depth):
        p["blocks"].append({
            "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": {"w": trunc_normal(next(keys), (d, 3 * d)),
                    "b": jnp.zeros((3 * d,))},
            "proj": {"w": trunc_normal(next(keys), (d, d)),
                     "b": jnp.zeros((d,))},
            "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "fc1": {"w": trunc_normal(next(keys),
                                      (d, int(d * cfg.mlp_ratio))),
                    "b": jnp.zeros((int(d * cfg.mlp_ratio),))},
            "fc2": {"w": trunc_normal(next(keys),
                                      (int(d * cfg.mlp_ratio), d)),
                    "b": jnp.zeros((d,))},
        })
    return p


def _attn(x: Array, bp: Dict, num_heads: int) -> Array:
    n, t, d = x.shape
    hd = d // num_heads
    qkv = jnp.dot(x, bp["qkv"]["w"].astype(x.dtype)) + bp["qkv"]["b"]
    qkv = qkv.reshape(n, t, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = jnp.einsum("nhtd,nhsd->nhts", q, k,
                     preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhts,nhsd->nhtd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, d)
    return jnp.dot(out, bp["proj"]["w"].astype(x.dtype)) + bp["proj"]["b"]


def apply(params: Dict, x: Array, *, cfg: ViTConfig, train: bool = False,
          rng: Optional[Array] = None) -> Tuple[Array, Array]:
    """(N, H, W, 3) -> (logits, patch_feature (N, gh, gw, C))."""
    n = x.shape[0]
    tok = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"].astype(x.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    tok = tok + params["patch_embed"]["b"].astype(tok.dtype)
    tok = tok.reshape(n, cfg.num_patches, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype),
                           (n, 1, cfg.embed_dim))
    tok = jnp.concatenate([cls, tok], axis=1)
    tok = tok + params["pos_embed"].astype(tok.dtype)

    dp = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
          for i in range(cfg.depth)]
    for i, bp in enumerate(params["blocks"]):
        attn_rng = mlp_rng = None
        if rng is not None and train:
            rng, attn_rng, mlp_rng = jax.random.split(rng, 3)
        h = layer_norm(tok, bp["norm1"]["scale"], bp["norm1"]["bias"])
        h = _attn(h, bp, cfg.num_heads)
        tok = tok + drop_path(h, dp[i], attn_rng, train)
        h = layer_norm(tok, bp["norm2"]["scale"], bp["norm2"]["bias"])
        h = jnp.dot(h, bp["fc1"]["w"].astype(h.dtype)) + bp["fc1"]["b"]
        h = gelu(h)
        h = (jnp.dot(h, bp["fc2"]["w"].astype(h.dtype))
             + bp["fc2"]["b"]).astype(tok.dtype)
        tok = tok + drop_path(h, dp[i], mlp_rng, train)

    tok = layer_norm(tok, params["norm"]["scale"], params["norm"]["bias"])
    logits = (jnp.dot(tok[:, 0], params["head"]["w"].astype(tok.dtype))
              + params["head"]["b"]).astype(jnp.float32)
    feature = tok[:, 1:].reshape(n, cfg.grid, cfg.grid, cfg.embed_dim)
    return logits, feature


class ViT:
    def __init__(self, cfg: ViTConfig):
        self.cfg = cfg

    def init(self, rng):
        return init(rng, self.cfg)

    def apply(self, params, x, **kw):
        return apply(params, x, cfg=self.cfg, **kw)

    def teacher_apply(self, params):
        """KD teacher adapter: images -> (logits, feature), frozen."""
        def fn(images):
            logits, feat = apply(params, images, cfg=self.cfg, train=False)
            return (jax.lax.stop_gradient(logits),
                    jax.lax.stop_gradient(feat))
        return fn


def vit_base_patch16_224(**kw) -> ViT:
    return ViT(ViTConfig(**kw))


def vit_small_patch16_224(**kw) -> ViT:
    kw.setdefault("embed_dim", 384)
    kw.setdefault("num_heads", 6)
    return ViT(ViTConfig(**kw))


def deit_tiny_patch16_224(**kw) -> ViT:
    kw.setdefault("embed_dim", 192)
    kw.setdefault("num_heads", 3)
    return ViT(ViTConfig(**kw))
