"""ResNet-D (``resnet50d``) — KD teacher covering the reference's
ResNet50d path (``main_KD.py:413-449``; the fork adds ``self.feature`` +
``project_slak/swin/vit`` heads at ``timm1/models/resnet.py:588-709`` — our
KD engine owns the projection instead, see ``kd/engine.py``).

ResNet-D tweaks vs vanilla: deep 3x3x3 stem, and an AvgPool-then-1x1
downsample shortcut. Functional NHWC, BN via our torch-parity batch_norm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.ops.batchnorm import batch_norm
from slak_tpu.models.layers import trunc_normal

Array = jax.Array

STEM_STRIDES = (2, 1, 1)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)   # resnet50
    width: int = 64
    num_classes: int = 1000
    expansion: int = 4


def _conv_init(rng, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {"w": (jax.random.normal(rng, (kh, kw, cin, cout))
                  * jnp.sqrt(2.0 / fan)).astype(jnp.float32)}


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def _bottleneck_init(rng, cin, planes, expansion, downsample):
    keys = iter(jax.random.split(rng, 4))
    cout = planes * expansion
    p, s = {}, {}
    for name, (kh, kw, a, b) in (("conv1", (1, 1, cin, planes)),
                                 ("conv2", (3, 3, planes, planes)),
                                 ("conv3", (1, 1, planes, cout))):
        p[name] = _conv_init(next(keys), kh, kw, a, b)
        p[name + "_bn"], s[name + "_bn"] = _bn_init(b)
    if downsample:
        p["down"] = _conv_init(next(keys), 1, 1, cin, cout)
        p["down_bn"], s["down_bn"] = _bn_init(cout)
    return p, s


def init(rng: Array, cfg: ResNetConfig) -> Tuple[Dict, Dict]:
    keys = iter(jax.random.split(rng, 8 + sum(cfg.layers)))
    w = cfg.width
    head_in = cfg.width * 8 * cfg.expansion
    params: Dict[str, Any] = {"stem": [], "stages": [],
                              "head": {"w": trunc_normal(
                                  next(keys), (head_in, cfg.num_classes)),
                                  "b": jnp.zeros((cfg.num_classes,))}}
    state: Dict[str, Any] = {"stem": [], "stages": []}
    # deep stem: 3x3 s2 (3->32), 3x3 (32->32), 3x3 (32->64); strides are
    # static (STEM_STRIDES) — params hold arrays only
    for (cin, cout) in ((3, w // 2), (w // 2, w // 2), (w // 2, w)):
        cp = _conv_init(next(keys), 3, 3, cin, cout)
        bp, bs = _bn_init(cout)
        params["stem"].append({"conv": cp, "bn": bp})
        state["stem"].append({"bn": bs})

    cin = w
    for i, depth in enumerate(cfg.layers):
        planes = w * (2 ** i)
        blocks_p, blocks_s = [], []
        for j in range(depth):
            down = (j == 0)
            bp, bs = _bottleneck_init(next(keys), cin, planes,
                                      cfg.expansion, down)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = planes * cfg.expansion
        params["stages"].append(blocks_p)
        state["stages"].append(blocks_s)
    return params, state


def _conv(x, p, stride=1):
    # torch-style symmetric k//2 padding (XLA "SAME" pads (0,1) for even
    # overhang at stride 2, which shifts the grid vs torch and breaks
    # converted-checkpoint logit parity)
    kh, kw = p["w"].shape[:2]
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p, s):
    y, _, _ = batch_norm(x, p["scale"], p["bias"], s["mean"], s["var"],
                         train=False)
    return y


def apply(params: Dict, state: Dict, x: Array, *, cfg: ResNetConfig
          ) -> Tuple[Array, Array]:
    """Eval-mode forward (teachers are frozen). Returns (logits, feature)."""
    for sp, ss, stride in zip(params["stem"], state["stem"], STEM_STRIDES):
        x = jax.nn.relu(_bn(_conv(x, sp["conv"], stride), sp["bn"],
                            ss["bn"]))
    # 3x3 max pool stride 2, torch pad=1 both sides
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))

    for i, (blocks_p, blocks_s) in enumerate(zip(params["stages"],
                                                 state["stages"])):
        stride = 1 if i == 0 else 2
        for j, (bp, bs) in enumerate(zip(blocks_p, blocks_s)):
            st = stride if j == 0 else 1
            shortcut = x
            y = jax.nn.relu(_bn(_conv(x, bp["conv1"]), bp["conv1_bn"],
                                bs["conv1_bn"]))
            y = jax.nn.relu(_bn(_conv(y, bp["conv2"], st), bp["conv2_bn"],
                                bs["conv2_bn"]))
            y = _bn(_conv(y, bp["conv3"]), bp["conv3_bn"], bs["conv3_bn"])
            if "down" in bp:
                # ResNet-D: avg-pool then 1x1 (no strided 1x1). All strided
                # shortcuts see even maps at 224 input, so SAME == torch's
                # AvgPool2d(2, 2, ceil_mode=True) here.
                if st > 1:
                    shortcut = jax.lax.reduce_window(
                        shortcut, 0.0, jax.lax.add, (1, st, st, 1),
                        (1, st, st, 1), "SAME") / (st * st)
                shortcut = _bn(_conv(shortcut, bp["down"]), bp["down_bn"],
                               bs["down_bn"])
            x = jax.nn.relu(shortcut + y)

    feature = x
    pooled = jnp.mean(x, axis=(1, 2))
    logits = (jnp.dot(pooled, params["head"]["w"].astype(pooled.dtype))
              + params["head"]["b"]).astype(jnp.float32)
    return logits, feature


class ResNet:
    def __init__(self, cfg: ResNetConfig):
        self.cfg = cfg

    def init(self, rng):
        return init(rng, self.cfg)

    def apply(self, params, state, x):
        return apply(params, state, x, cfg=self.cfg)

    def teacher_apply(self, params, state):
        def fn(images):
            logits, feat = apply(params, state, images, cfg=self.cfg)
            return (jax.lax.stop_gradient(logits),
                    jax.lax.stop_gradient(feat))
        return fn


def resnet50d(**kw) -> ResNet:
    return ResNet(ResNetConfig(**kw))


def resnet26d(**kw) -> ResNet:
    kw.setdefault("layers", (2, 2, 2, 2))
    return ResNet(ResNetConfig(**kw))
