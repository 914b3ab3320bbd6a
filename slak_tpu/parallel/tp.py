"""Tensor (channel) parallel inference for the SLaK family — BEYOND the
reference's parallelism: the reference only ever data-parallels
(``torch.nn.parallel.DistributedDataParallel``, main.py:374-376); this
module shards the CHANNEL dimension over a ``jax.sharding.Mesh`` axis so
one large-batch / high-resolution forward can ride multiple chips' ICI.

Mapping (the scaling-book Megatron recipe, adapted to a ConvNet where
depthwise convs are exactly channel-local):

  * depthwise large-kernel convs + folded branch BNs: channel-local —
    ZERO communication (the decomposed conv is per-channel by
    construction, so TP is its natural axis);
  * LayerNorm over channels: per-token partial sums -> ``psum`` (two
    scalars per token across the axis);
  * block MLP: Megatron split — ``all_gather`` the (T, C_local)
    LN output to (T, C), pwconv1 column-sharded (C, 4C/D), GELU local,
    pwconv2 row-sharded (4C/D, C) -> ``psum``, then each device keeps its
    own C/D slice for the residual (psum+slice = the reduce-scatter
    pattern, kept explicit for readability);
  * downsample convs: contraction (input-channel) sharded -> ``psum``,
    output re-sharded by local slice; stem conv output-sharded (input is
    the replicated RGB image);
  * head: input-sharded matmul -> ``psum`` -> full logits.

Per block: one (T, C) all_gather + one (T, C) psum + the tiny LN psums —
all on ICI. Eval only (BN running stats are read, never written).

Non-divisible widths (the flagship SLaK-T at width_factor 1.3 has stage
dims 124/**249**/**499**/998 — 249 odd, 499 prime) are served by
ZERO-PADDING every channel axis up to a multiple of the mesh axis before
sharding (``pad_for_tp``). The pad lanes are exact no-ops by
construction: pad activations are identically zero at every layer
(LN scale/bias pad to 0, conv taps/biases/BN affines pad to 0, BN
running var pads to 1 so the fold is finite), and every cross-channel
reduction — the LN psum moments and the final head contraction — is
normalized by the REAL channel count, to which zero lanes contribute
nothing. Logits therefore match the unpadded single-device forward
bit-for-bit up to reduction-order rounding.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from slak_tpu.models import slak as M
from slak_tpu.models.layers import gelu

Array = jax.Array

AXIS = "model"


# ---------------------------------------------------------------------------
# spec trees: PartitionSpec per parameter, built by path
# ---------------------------------------------------------------------------


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return ".".join(parts)


def _param_spec(name: str, leaf) -> P:
    if name.startswith("head."):
        # head.w (C, classes): contraction-sharded; head.b full
        return P(AXIS, None) if name.endswith(".w") else P(None)
    if "pwconv1.w" in name:
        return P(None, AXIS)                       # column-sharded (C, 4C)
    if "pwconv2.w" in name:
        return P(AXIS, None)                       # row-sharded (4C, C)
    if "downsample.0.conv.w" in name:
        return P(None, None, None, AXIS)           # stem: output-sharded
    if ".conv.w" in name:
        return P(None, None, AXIS, None)           # downsample: input-shard
    if leaf.ndim == 3:                             # dw branch taps (kh,kw,C)
        return P(None, None, AXIS)
    if leaf.ndim == 1:
        # every per-channel vector (LN/BN scales+biases, conv biases,
        # gamma, pwconv1.b over 4C, pwconv2.b over C) shards on its axis
        return P(AXIS)
    raise ValueError(f"unmapped param {name} {leaf.shape}")


def make_specs(params: Any, state: Any) -> Tuple[Any, Any]:
    pspecs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _param_spec(_path_str(path), leaf), params)
    sspecs = jax.tree_util.tree_map(lambda leaf: P(AXIS), state)
    return pspecs, sspecs


# ---------------------------------------------------------------------------
# zero-padding to the mesh axis (flagship widths are odd/prime)
# ---------------------------------------------------------------------------


def _round_up(n: int, d: int) -> int:
    return -(-n // d) * d


def _pad_axes(leaf: Array, axes, d: int, value: float = 0.0) -> Array:
    pads = [(0, 0)] * leaf.ndim
    changed = False
    for ax in axes:
        extra = _round_up(leaf.shape[ax], d) - leaf.shape[ax]
        if extra:
            pads[ax] = (0, extra)
            changed = True
    if not changed:
        return leaf
    return jnp.pad(leaf, pads, constant_values=value)


def _pad_param(name: str, leaf: Array, d: int) -> Array:
    if name.startswith("head."):
        # head.w (C, classes): pad the contraction only; head.b untouched
        return _pad_axes(leaf, (0,), d) if name.endswith(".w") else leaf
    if name.endswith("pwconv1.w") or name.endswith("pwconv2.w"):
        return _pad_axes(leaf, (0, 1), d)
    if leaf.ndim == 4:                              # downsample convs (HWIO)
        if "downsample.0" in name:
            return _pad_axes(leaf, (3,), d)         # stem: RGB input stays 3
        return _pad_axes(leaf, (2, 3), d)
    if leaf.ndim == 3:                              # dw branch taps (kh,kw,C)
        return _pad_axes(leaf, (2,), d)
    if leaf.ndim == 1:
        # per-channel vectors (LN/BN scale+bias, conv biases, gamma, MLP
        # biases): zero pads make the pad lanes emit exactly 0
        return _pad_axes(leaf, (0,), d)
    raise ValueError(f"unmapped param {name} {leaf.shape}")


def pad_for_tp(params: Any, state: Any, d: int) -> Tuple[Any, Any]:
    """Zero-pad every channel axis up to a multiple of ``d``.

    Pad lanes are mathematically inert (see module docstring): weights,
    biases, and affine scales pad with 0; BN running variance pads with 1
    so ``fold_bn``'s rsqrt stays tame (the folded multiplier is 0 anyway
    because the BN scale pad is 0)."""
    pp = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _pad_param(_path_str(path), leaf, d), params)
    ss = jax.tree_util.tree_map_with_path(
        lambda path, leaf: _pad_axes(
            leaf, (0,), d,
            value=1.0 if _path_str(path).endswith("var") else 0.0),
        state)
    return pp, ss


# ---------------------------------------------------------------------------
# channel-sharded building blocks
# ---------------------------------------------------------------------------


def _tp_layer_norm(x_local: Array, scale_local: Array, bias_local: Array,
                   c_full: int, eps: float = 1e-6) -> Array:
    """LN over the FULL channel dim from a (…, C/D) shard: cross-shard
    moments via psum (two per-token scalars over ICI)."""
    xf = x_local.astype(jnp.float32)
    s1 = lax.psum(jnp.sum(xf, axis=-1, keepdims=True), AXIS)
    s2 = lax.psum(jnp.sum(jnp.square(xf), axis=-1, keepdims=True), AXIS)
    mu = s1 / c_full
    var = s2 / c_full - jnp.square(mu)
    xhat = (xf - mu) * lax.rsqrt(var + eps)
    return (xhat * scale_local + bias_local).astype(x_local.dtype)


def _local_slice(full: Array, axis: int = -1) -> Array:
    d = lax.psum(1, AXIS)
    idx = lax.axis_index(AXIS)
    n = full.shape[axis] // d
    return lax.dynamic_slice_in_dim(full, idx * n, n, axis=axis)


def _tp_block(x_local: Array, p: Any, s: Any, cfg: M.SLaKConfig,
              c_full: int) -> Array:
    """One SLaK block on a channel shard: conv local, LN psum-moments,
    Megatron MLP (all_gather -> column-shard -> psum -> local slice)."""
    shortcut = x_local
    y, lk_bias, _ = M._lk_forward(x_local, p["lk"], s["lk"], train=False,
                                  cfg=cfg)
    if lk_bias is not None:
        y = y + lk_bias.astype(y.dtype)
    h_local = _tp_layer_norm(y, p["norm"]["scale"], p["norm"]["bias"],
                             c_full)
    h = lax.all_gather(h_local, AXIS, axis=h_local.ndim - 1, tiled=True)
    a = jnp.dot(h, p["pwconv1"]["w"].astype(h.dtype),
                preferred_element_type=jnp.float32).astype(h.dtype)
    a = a + p["pwconv1"]["b"].astype(a.dtype)      # b1 sharded like W1 cols
    g = gelu(a)
    o = jnp.dot(g, p["pwconv2"]["w"].astype(g.dtype),
                preferred_element_type=jnp.float32)
    o = lax.psum(o, AXIS)
    o_local = _local_slice(o.astype(x_local.dtype))
    o_local = o_local + p["pwconv2"]["b"].astype(o_local.dtype)
    if "gamma" in p:
        o_local = o_local * p["gamma"].astype(o_local.dtype)
    return shortcut + o_local


def _tp_downsample(x, p, idx: int, c_in_full: int, c_out_full: int):
    if idx == 0:
        # stem: replicated RGB input, output-channel-sharded filter. The
        # LN normalizer is the REAL output width (pad lanes are zero and
        # contribute nothing to the psum moments).
        w = p["conv"]["w"]
        x = lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(4, 4), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + p["conv"]["b"].astype(x.dtype)
        return _tp_layer_norm(x, p["norm"]["scale"], p["norm"]["bias"],
                              c_out_full)
    x = _tp_layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], c_in_full)
    w = p["conv"]["w"]                             # (2, 2, C_in/D, C_out)
    x = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = lax.psum(x, AXIS)                          # contraction was sharded
    x = _local_slice(x)
    return x + p["conv"]["b"].astype(x.dtype)


def _tp_forward(params, state, x, cfg: M.SLaKConfig):
    dims = cfg.widened_dims
    for i in range(4):
        x = _tp_downsample(x, params["downsample"][i], i,
                           dims[i - 1] if i else None, dims[i])
        for j, bp in enumerate(params["stages"][i]):
            x = _tp_block(x, bp, state["stages"][i][j], cfg, dims[i])
    pooled = jnp.mean(x, axis=(1, 2))
    pooled = _tp_layer_norm(pooled, params["norm"]["scale"],
                            params["norm"]["bias"], dims[-1])
    logits = lax.psum(
        jnp.dot(pooled, params["head"]["w"].astype(pooled.dtype),
                preferred_element_type=jnp.float32), AXIS)
    return logits.astype(pooled.dtype) + params["head"]["b"]


def make_tp_apply(model: M.SLaK, mesh: Mesh):
    """Jitted channel-sharded eval forward: ``fn(params, state, x) ->
    logits``. Pass FULL (unsharded, unpadded) params/state/x — widths
    that don't divide the mesh axis are zero-padded to it inside the jit
    (``pad_for_tp``; exact, see module docstring), then shard_map slices
    everything per the spec trees."""
    cfg = model.cfg
    d = mesh.shape[AXIS]
    needs_pad = any(c % d or (4 * c) % d for c in cfg.widened_dims)

    def build(params, state, x):
        if needs_pad:
            params, state = pad_for_tp(params, state, d)
        pspecs, sspecs = make_specs(params, state)
        fn = jax.shard_map(
            functools.partial(_tp_forward, cfg=cfg),
            mesh=mesh,
            in_specs=(pspecs, sspecs, P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(params, state, x)

    return jax.jit(build)
