"""CSWin Transformer — KD teacher covering the reference's CSWin path
(``cswin.py:246-418``; teachers dispatched at ``main_KD.py:413-449``).

Re-designed functionally for NHWC JAX (not a translation): cross-shaped
window self-attention = half the heads attend within horizontal stripes,
half within vertical stripes, each with LePE (a depthwise 3x3 conv on V
added to the attention output); conv patch embedding and conv merge blocks
between stages; the last stage attends globally (stripe = full width).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.models.layers import layer_norm, trunc_normal, gelu, drop_path

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CSWinConfig:
    embed_dim: int = 64
    depths: Tuple[int, ...] = (1, 2, 21, 1)       # cswin_tiny: (1,2,21,1)
    split_sizes: Tuple[int, ...] = (1, 2, 7, 7)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    img_size: int = 224
    drop_path_rate: float = 0.0


def _dense_init(rng, cin, cout):
    return {"w": trunc_normal(rng, (cin, cout)),
            "b": jnp.zeros((cout,), jnp.float32)}


def _conv_init(rng, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {"w": (jax.random.normal(rng, (kh, kw, cin, cout))
                  * jnp.sqrt(2.0 / fan)).astype(jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _block_init(rng, dim):
    keys = iter(jax.random.split(rng, 6))
    return {
        "norm1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "qkv": _dense_init(next(keys), dim, 3 * dim),
        # LePE: per-window depthwise 3x3 on V (reference cswin.py:84,96-106;
        # nn.Conv2d has bias)
        "lepe": {"w": trunc_normal(next(keys), (3, 3, dim)),
                 "b": jnp.zeros((dim,), jnp.float32)},
        "proj": _dense_init(next(keys), dim, dim),
        "norm2": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "fc1": _dense_init(next(keys), dim, 4 * dim),
        "fc2": _dense_init(next(keys), 4 * dim, dim),
    }


def init(rng: Array, cfg: CSWinConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 12 + sum(cfg.depths)))
    d = cfg.embed_dim
    p: Dict[str, Any] = {
        # conv embedding 7x7 s4 (reference stage1_conv_embed)
        "embed": _conv_init(next(keys), 7, 7, 3, d),
        "embed_norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "stages": [], "merge": [],
        "norm": {"scale": jnp.ones((d * 8,)), "bias": jnp.zeros((d * 8,))},
        "head": _dense_init(next(keys), d * 8, cfg.num_classes),
    }
    for i, depth in enumerate(cfg.depths):
        dim = d * (2 ** i)
        p["stages"].append([_block_init(next(keys), dim)
                            for _ in range(depth)])
        if i < 3:
            p["merge"].append({
                "conv": _conv_init(next(keys), 3, 3, dim, 2 * dim),
                "norm": {"scale": jnp.ones((2 * dim,)),
                         "bias": jnp.zeros((2 * dim,))}})
    return p


def _stripe_attn(q, k, v, lepe_p, heads: int, sh: int, sw: int):
    """Attention within (sh, sw) stripes. q/k/v: (N, H, W, C).

    LePE runs *per window* (the reference reshapes V into windows before
    the conv, cswin.py:96-106, so stripe boundaries see zero padding)."""
    n, h, w, c = q.shape
    hd = c // heads

    def windows(t):
        t = t.reshape(n, h // sh, sh, w // sw, sw, heads, hd)
        return t.transpose(0, 1, 3, 5, 2, 4, 6).reshape(
            -1, heads, sh * sw, hd)

    qw, kw, vw = windows(q), windows(k), windows(v)
    att = jnp.einsum("bhtd,bhsd->bhts", qw, kw,
                     preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", att, vw)
    out = out.reshape(n, h // sh, w // sw, heads, sh, sw, hd)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(n, h, w, c)

    # LePE: per-window depthwise 3x3 conv on V
    vwin = v.reshape(n, h // sh, sh, w // sw, sw, c)
    vwin = vwin.transpose(0, 1, 3, 2, 4, 5).reshape(-1, sh, sw, c)
    lepe = jax.lax.conv_general_dilated(
        vwin, lepe_p["w"].reshape(3, 3, 1, c).astype(v.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    lepe = lepe + lepe_p["b"].astype(lepe.dtype)
    lepe = lepe.reshape(n, h // sh, w // sw, sh, sw, c)
    lepe = lepe.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
    return out + lepe


def apply(params: Dict, x: Array, *, cfg: CSWinConfig, train: bool = False,
          rng: Optional[Array] = None) -> Tuple[Array, Array]:
    # conv embed 7x7 s4 pad 2 (reference cswin.py:258-262: Conv2d(3,d,7,4,2))
    x = jax.lax.conv_general_dilated(
        x, params["embed"]["w"].astype(x.dtype), (4, 4),
        ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["embed"]["b"].astype(x.dtype)
    x = layer_norm(x, params["embed_norm"]["scale"],
                   params["embed_norm"]["bias"])

    total = sum(cfg.depths)
    dp = [cfg.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
    cur = 0
    for i, blocks in enumerate(params["stages"]):
        split = cfg.split_sizes[i]
        heads = cfg.num_heads[i]
        for j, bp in enumerate(blocks):
            block_rng = None
            if rng is not None and train:
                rng, block_rng = jax.random.split(rng)
            n, h, w, c = x.shape
            shortcut = x
            y = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"])
            qkv = jnp.dot(y, bp["qkv"]["w"].astype(y.dtype)) + bp["qkv"]["b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            last = (i == 3) or (h <= split)
            if last:
                # final stage: full-image attention
                out = _stripe_attn(q, k, v, bp["lepe"], heads, h, w)
            else:
                # cross-shaped: first half of channels -> vertical stripes
                # (idx 0: H_sp=reso, W_sp=split, cswin.py:72-77), second
                # half -> horizontal stripes (idx 1)
                ch = c // 2
                lep1 = {"w": bp["lepe"]["w"][..., :ch],
                        "b": bp["lepe"]["b"][:ch]}
                lep2 = {"w": bp["lepe"]["w"][..., ch:],
                        "b": bp["lepe"]["b"][ch:]}
                o1 = _stripe_attn(q[..., :ch], k[..., :ch], v[..., :ch],
                                  lep1, heads // 2, h, split)
                o2 = _stripe_attn(q[..., ch:], k[..., ch:], v[..., ch:],
                                  lep2, heads // 2, split, w)
                out = jnp.concatenate([o1, o2], axis=-1)
            out = jnp.dot(out, bp["proj"]["w"].astype(out.dtype)) \
                + bp["proj"]["b"]
            x = shortcut + drop_path(out, dp[cur + j], block_rng, train)
            shortcut = x
            y = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"])
            y = jnp.dot(y, bp["fc1"]["w"].astype(y.dtype)) + bp["fc1"]["b"]
            y = gelu(y)
            y = (jnp.dot(y, bp["fc2"]["w"].astype(y.dtype))
                 + bp["fc2"]["b"]).astype(x.dtype)
            x = shortcut + drop_path(y, dp[cur + j], block_rng, train)
        cur += cfg.depths[i]
        if i < 3:
            mp = params["merge"][i]
            # Merge_Block: Conv2d(dim, 2dim, 3, 2, 1) (cswin.py:229-233);
            # symmetric pad 1, torch-exact
            x = jax.lax.conv_general_dilated(
                x, mp["conv"]["w"].astype(x.dtype), (2, 2),
                ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + mp["conv"]["b"].astype(x.dtype)
            x = layer_norm(x, mp["norm"]["scale"], mp["norm"]["bias"])

    feature = x
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    pooled = jnp.mean(x, axis=(1, 2))
    logits = (jnp.dot(pooled, params["head"]["w"].astype(pooled.dtype))
              + params["head"]["b"]).astype(jnp.float32)
    return logits, feature


class CSWin:
    def __init__(self, cfg: CSWinConfig):
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


def cswin_tiny(**kw) -> CSWin:
    return CSWin(CSWinConfig(**kw))


def cswin_small(**kw) -> CSWin:
    kw.setdefault("depths", (2, 4, 32, 2))
    return CSWin(CSWinConfig(**kw))


def cswin_base(**kw) -> CSWin:
    kw.setdefault("embed_dim", 96)
    kw.setdefault("depths", (2, 4, 32, 2))
    kw.setdefault("num_heads", (4, 8, 16, 32))
    return CSWin(CSWinConfig(**kw))
