"""Mobile-family teachers: MobileNetV3-Large and EfficientNet — the last
two KD teachers in the reference's zoo (``main_KD.py:413-509``;
``timm1/models/mobilenetv3.py:143-153`` and ``tf_efficientnet_b3_ns``, both
with the fork's ``self.feature`` capture).

One shared functional inverted-residual (MBConv) implementation covers
both: expansion 1x1 -> depthwise kxk -> SE -> project 1x1, hard-swish or
swish activations. Eval-mode BN (teachers are frozen).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from slak_tpu.models.layers import trunc_normal
from slak_tpu.ops.batchnorm import batch_norm

Array = jax.Array


def hard_swish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


_ACTS = {"relu": jax.nn.relu, "hswish": hard_swish, "swish": jax.nn.silu,
         "sigmoid": jax.nn.sigmoid, "hard_sigmoid": hard_sigmoid}


def make_divisible(v: float, divisor: int = 8) -> int:
    """timm1/models/layers/helpers.py make_divisible (round_limit 0.9)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# block spec: (expand_ratio, cout, kernel, stride, se_ratio, act)
MOBILENETV3_LARGE = [
    (1, 16, 3, 1, 0.0, "relu"),
    (4, 24, 3, 2, 0.0, "relu"),
    (3, 24, 3, 1, 0.0, "relu"),
    (3, 40, 5, 2, 0.25, "relu"),
    (3, 40, 5, 1, 0.25, "relu"),
    (3, 40, 5, 1, 0.25, "relu"),
    (6, 80, 3, 2, 0.0, "hswish"),
    (2.5, 80, 3, 1, 0.0, "hswish"),
    (2.3, 80, 3, 1, 0.0, "hswish"),
    (2.3, 80, 3, 1, 0.0, "hswish"),
    (6, 112, 3, 1, 0.25, "hswish"),
    (6, 112, 3, 1, 0.25, "hswish"),
    (6, 160, 5, 2, 0.25, "hswish"),
    (6, 160, 5, 1, 0.25, "hswish"),
    (6, 160, 5, 1, 0.25, "hswish"),
]

# efficientnet-b0 backbone (b3 = width 1.2 / depth 1.4 scaling)
EFFICIENTNET_B0 = [
    (1, 16, 3, 1, 0.25, "swish"),
    (6, 24, 3, 2, 0.25, "swish"), (6, 24, 3, 1, 0.25, "swish"),
    (6, 40, 5, 2, 0.25, "swish"), (6, 40, 5, 1, 0.25, "swish"),
    (6, 80, 3, 2, 0.25, "swish"), (6, 80, 3, 1, 0.25, "swish"),
    (6, 80, 3, 1, 0.25, "swish"),
    (6, 112, 5, 1, 0.25, "swish"), (6, 112, 5, 1, 0.25, "swish"),
    (6, 112, 5, 1, 0.25, "swish"),
    (6, 192, 5, 2, 0.25, "swish"), (6, 192, 5, 1, 0.25, "swish"),
    (6, 192, 5, 1, 0.25, "swish"), (6, 192, 5, 1, 0.25, "swish"),
    (6, 320, 3, 1, 0.25, "swish"),
]


@dataclasses.dataclass(frozen=True)
class MobileConfig:
    blocks: Tuple = tuple(MOBILENETV3_LARGE)
    stem_ch: int = 16
    head_ch: int = 1280
    num_classes: int = 1000
    stem_act: str = "hswish"
    # SE semantics differ between the two families
    # (timm1/models/efficientnet_blocks.py:32-41 + the partial bindings in
    # mobilenetv3.py:366 / efficientnet.py defaults):
    #   EfficientNet: reduce from the BLOCK INPUT chs, divisor 1, block's
    #     own act inside SE, sigmoid gate;
    #   MobileNetV3: reduce from the expanded (mid) chs, divisor 8, ReLU,
    #     hard-sigmoid gate — for every SE regardless of block act.
    se_from_block_in: bool = False
    se_divisor: int = 8
    se_act: str = "relu"            # 'relu' | 'block' (= block's act)
    se_gate: str = "hard_sigmoid"   # 'hard_sigmoid' | 'sigmoid'
    # head: EfficientNet = conv+BN+act BEFORE pool
    # (efficientnet.py:435-446); MobileNetV3 = pool THEN biased conv+act,
    # no BN (mobilenetv3.py:114-117,154-156)
    head_after_pool: bool = True

    def se_channels(self, cin: int, mid: int, se_ratio: float) -> int:
        base = cin if self.se_from_block_in else mid
        return make_divisible(base * se_ratio, self.se_divisor)


def _conv_init(rng, kh, kw, cin, cout, groups=1):
    fan = kh * kw * cin // groups
    shape = (kh, kw, cin // groups, cout)
    return {"w": (jax.random.normal(rng, shape)
                  * jnp.sqrt(2.0 / fan)).astype(jnp.float32)}


def _bn_init(c):
    return ({"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
            {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))})


def init(rng: Array, cfg: MobileConfig) -> Tuple[Dict, Dict]:
    keys = iter(jax.random.split(rng, 8 + 6 * len(cfg.blocks)))
    params: Dict[str, Any] = {"blocks": []}
    state: Dict[str, Any] = {"blocks": []}
    params["stem"] = _conv_init(next(keys), 3, 3, 3, cfg.stem_ch)
    params["stem_bn"], sbn = _bn_init(cfg.stem_ch)
    state["stem_bn"] = sbn

    cin = cfg.stem_ch
    for (exp, cout, k, stride, se, act) in cfg.blocks:
        mid = int(round(cin * exp))
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        if mid != cin:
            bp["expand"] = _conv_init(next(keys), 1, 1, cin, mid)
            bp["expand_bn"], bs["expand_bn"] = _bn_init(mid)
        bp["dw"] = _conv_init(next(keys), k, k, mid, mid, groups=mid)
        bp["dw_bn"], bs["dw_bn"] = _bn_init(mid)
        if se > 0:
            se_ch = cfg.se_channels(cin, mid, se)
            bp["se_reduce"] = _conv_init(next(keys), 1, 1, mid, se_ch)
            bp["se_reduce"]["b"] = jnp.zeros((se_ch,))
            bp["se_expand"] = _conv_init(next(keys), 1, 1, se_ch, mid)
            bp["se_expand"]["b"] = jnp.zeros((mid,))
        bp["project"] = _conv_init(next(keys), 1, 1, mid, cout)
        bp["project_bn"], bs["project_bn"] = _bn_init(cout)
        params["blocks"].append(bp)
        state["blocks"].append(bs)
        cin = cout

    params["head_conv"] = _conv_init(next(keys), 1, 1, cin, cfg.head_ch)
    if cfg.head_after_pool:
        params["head_conv"]["b"] = jnp.zeros((cfg.head_ch,))
    else:
        params["head_bn"], state["head_bn"] = _bn_init(cfg.head_ch)
    params["classifier"] = {
        "w": trunc_normal(next(keys), (cfg.head_ch, cfg.num_classes)),
        "b": jnp.zeros((cfg.num_classes,))}
    return params, state


def _conv(x, p, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _bn(x, p, s):
    return batch_norm(x, p["scale"], p["bias"], s["mean"], s["var"],
                      train=False)[0]


def apply(params: Dict, state: Dict, x: Array, *, cfg: MobileConfig
          ) -> Tuple[Array, Array]:
    act0 = _ACTS[cfg.stem_act]
    x = act0(_bn(_conv(x, params["stem"], 2), params["stem_bn"],
                 state["stem_bn"]))
    for (exp, cout, k, stride, se_ratio, act_name), bp, bs in zip(
            cfg.blocks, params["blocks"], state["blocks"]):
        act = _ACTS[act_name]
        shortcut = x
        y = x
        if "expand" in bp:
            y = act(_bn(_conv(y, bp["expand"]), bp["expand_bn"],
                        bs["expand_bn"]))
        mid = y.shape[-1]
        y = act(_bn(_conv(y, bp["dw"], stride, groups=mid),
                    bp["dw_bn"], bs["dw_bn"]))
        if "se_reduce" in bp:
            se_act = act if cfg.se_act == "block" else _ACTS[cfg.se_act]
            se = jnp.mean(y, axis=(1, 2), keepdims=True)
            se = _conv(se, bp["se_reduce"]) + bp["se_reduce"]["b"]
            se = se_act(se)
            se = _conv(se, bp["se_expand"]) + bp["se_expand"]["b"]
            y = y * _ACTS[cfg.se_gate](se).astype(y.dtype)
        y = _bn(_conv(y, bp["project"]), bp["project_bn"], bs["project_bn"])
        if stride == 1 and shortcut.shape[-1] == y.shape[-1]:
            y = y + shortcut
        x = y

    feature = x
    if cfg.head_after_pool:
        # MobileNetV3: pool -> biased 1x1 conv -> act, no BN
        # (timm1/models/mobilenetv3.py:114-117,154-156)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = _conv(x, params["head_conv"]) + params["head_conv"]["b"]
        pooled = act0(x)[:, 0, 0, :]
    else:
        # EfficientNet: conv -> BN -> act -> pool
        # (timm1/models/efficientnet.py:435-446,462-466)
        x = act0(_bn(_conv(x, params["head_conv"]), params["head_bn"],
                     state["head_bn"]))
        pooled = jnp.mean(x, axis=(1, 2))
    logits = (jnp.dot(pooled, params["classifier"]["w"].astype(pooled.dtype))
              + params["classifier"]["b"]).astype(jnp.float32)
    return logits, feature


class MobileNet:
    def __init__(self, cfg: MobileConfig):
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


def mobilenetv3_large_100(**kw) -> MobileNet:
    return MobileNet(MobileConfig(**kw))


def _effnet_kw(kw):
    kw.setdefault("se_from_block_in", True)
    kw.setdefault("se_divisor", 1)
    kw.setdefault("se_act", "block")
    kw.setdefault("se_gate", "sigmoid")
    kw.setdefault("head_after_pool", False)
    kw.setdefault("stem_act", "swish")
    return kw


def efficientnet_b0(**kw) -> MobileNet:
    kw.setdefault("blocks", tuple(EFFICIENTNET_B0))
    kw.setdefault("stem_ch", 32)
    return MobileNet(MobileConfig(**_effnet_kw(kw)))


def tf_efficientnet_b3_ns(**kw) -> MobileNet:
    """b3 = b0 scaled (width 1.2, depth 1.4), timm channel rounding."""
    def rnd(c):
        c = c * 1.2
        new = max(8, int(c + 4) // 8 * 8)
        if new < 0.9 * c:
            new += 8
        return new

    blocks: List = []
    for (exp, cout, k, stride, se, act) in EFFICIENTNET_B0:
        repeat = 1 if stride == 2 or cout in (16, 320) else 1
        blocks.append((exp, rnd(cout), k, stride, se, act))
    kw.setdefault("blocks", tuple(blocks))
    kw.setdefault("stem_ch", 40)
    kw.setdefault("head_ch", 1536)
    return MobileNet(MobileConfig(**_effnet_kw(kw)))
