"""Pretrained-teacher checkpoint converters: timm ``state_dict`` -> our
JAX teacher pytrees (ViT/DeiT, Swin, ResNet-D).

The reference KD driver loads timm-pretrained teachers by name
(``/root/reference/main_KD.py:413-509``); these converters are what lets
``--teacher_ckpt`` point at those torch checkpoints so the published L2S
recipes run from real teachers instead of random init.

Layout conversions (same conventions as :mod:`slak_tpu.utils.convert`):
  * conv (out, in, kh, kw) -> HWIO (kh, kw, in, out)
  * linear (out, in)       -> (in, out)

Model-specific notes:
  * ViT/DeiT (``timm1/models/vision_transformer.py``): direct rename;
    cls_token / pos_embed keep their (1, ...) shapes.
  * Swin (``timm1/models/swin_transformer.py``): identical math except the
    patch-merging concat order — timm concatenates
    [h0w0, h1w0, h0w1, h1w1] while our reshape produces
    [h0w0, h0w1, h1w0, h1w1], so the merge-norm params and the reduction
    weight's input dim are group-permuted by (0, 2, 1, 3).
    ``relative_position_index`` buffers are recomputed, not loaded.
  * ResNet-D (``timm1/models/resnet.py``, ``stem_type='deep'`` +
    ``avg_down``): stem is ``conv1.{0,3,6}`` convs with ``conv1.{1,4}``
    BNs and a trailing ``bn1``; downsample is ``downsample.1`` conv +
    ``downsample.2`` BN (slot 0 is the avg-pool).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _unwrap(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    for key in ("model", "state_dict", "model_ema"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = _to_np(v)
    return out


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _linear(sd, prefix, bias=True):
    p = {"w": sd[prefix + ".weight"].T}
    if bias:
        p["b"] = sd[prefix + ".bias"]
    return p


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)  # OIHW -> HWIO


# ---------------------------------------------------------------------------
# ViT / DeiT
# ---------------------------------------------------------------------------


def convert_vit_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm vision_transformer state_dict -> :mod:`slak_tpu.models.vit`
    params. Ignores DeiT's dist_token-free variants' extras."""
    sd = _unwrap(sd)
    depth = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(r"blocks\.(\d+)\.", k)))
    p: Dict[str, Any] = {
        "patch_embed": {"w": _conv_hwio(sd["patch_embed.proj.weight"]),
                        "b": sd["patch_embed.proj.bias"]},
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "blocks": [],
        "norm": _ln(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        p["blocks"].append({
            "norm1": _ln(sd, f"{b}.norm1"),
            "qkv": _linear(sd, f"{b}.attn.qkv"),
            "proj": _linear(sd, f"{b}.attn.proj"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "fc1": _linear(sd, f"{b}.mlp.fc1"),
            "fc2": _linear(sd, f"{b}.mlp.fc2"),
        })
    return p


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------


def _merge_perm(v: np.ndarray, c: int, axis: int = 0) -> np.ndarray:
    """Permute the 4c-wide patch-merge dim from timm's concat order
    [h0w0, h1w0, h0w1, h1w1] to ours [h0w0, h0w1, h1w0, h1w1]."""
    idx = np.concatenate([np.arange(c), 2 * c + np.arange(c),
                          c + np.arange(c), 3 * c + np.arange(c)])
    return np.take(v, idx, axis=axis)


def convert_swin_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm swin_transformer state_dict -> :mod:`slak_tpu.models.swin`
    params."""
    sd = _unwrap(sd)
    n_stages = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"layers\.(\d+)\.", k)))
    p: Dict[str, Any] = {
        "patch_embed": {"w": _conv_hwio(sd["patch_embed.proj.weight"]),
                        "b": sd["patch_embed.proj.bias"]},
        "embed_norm": _ln(sd, "patch_embed.norm"),
        "stages": [],
        "merge": [],
        "norm": _ln(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(n_stages):
        depth = 1 + max(int(m.group(1)) for k in sd
                        if (m := re.match(rf"layers\.{i}\.blocks\.(\d+)\.",
                                          k)))
        blocks = []
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}"
            blocks.append({
                "norm1": _ln(sd, f"{b}.norm1"),
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
                "rel_bias": sd[f"{b}.attn.relative_position_bias_table"],
                "norm2": _ln(sd, f"{b}.norm2"),
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            })
        p["stages"].append(blocks)
        dn = f"layers.{i}.downsample"
        if f"{dn}.reduction.weight" in sd:
            c = sd[f"{dn}.reduction.weight"].shape[1] // 4
            p["merge"].append({
                "norm": {
                    "scale": _merge_perm(sd[f"{dn}.norm.weight"], c),
                    "bias": _merge_perm(sd[f"{dn}.norm.bias"], c)},
                "reduction": {
                    "w": _merge_perm(sd[f"{dn}.reduction.weight"].T, c,
                                     axis=0)},
            })
    return p


# ---------------------------------------------------------------------------
# CSWin
# ---------------------------------------------------------------------------


def convert_cswin_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Official CSWin state_dict (reference ``cswin.py:246-360`` naming:
    ``stage{1..4}``, ``merge{1..3}``, ``stage1_conv_embed``) ->
    :mod:`slak_tpu.models.cswin` params. The two per-block LePE convs
    (``attns.{0,1}.get_v``) concatenate channel-wise into our single
    ``lepe`` tensor (branch 0 = first half = vertical stripes)."""
    sd = _unwrap(sd)

    def dw(prefix):
        w = sd[prefix + ".weight"][:, 0].transpose(1, 2, 0)  # (3,3,C)
        return w, sd[prefix + ".bias"]

    p: Dict[str, Any] = {
        "embed": {"w": _conv_hwio(sd["stage1_conv_embed.0.weight"]),
                  "b": sd["stage1_conv_embed.0.bias"]},
        "embed_norm": _ln(sd, "stage1_conv_embed.2"),
        "stages": [], "merge": [],
        "norm": _ln(sd, "norm"),
        "head": _linear(sd, "head"),
    }
    for i in range(1, 5):
        depth = 1 + max(int(m.group(1)) for k in sd
                        if (m := re.match(rf"stage{i}\.(\d+)\.", k)))
        blocks = []
        for j in range(depth):
            b = f"stage{i}.{j}"
            if f"{b}.attns.1.get_v.weight" in sd:
                w0, b0 = dw(f"{b}.attns.0.get_v")
                w1, b1 = dw(f"{b}.attns.1.get_v")
                lepe = {"w": np.concatenate([w0, w1], -1),
                        "b": np.concatenate([b0, b1], -1)}
            else:  # last stage: single full-dim branch
                w0, b0 = dw(f"{b}.attns.0.get_v")
                lepe = {"w": w0, "b": b0}
            blocks.append({
                "norm1": _ln(sd, f"{b}.norm1"),
                "qkv": _linear(sd, f"{b}.qkv"),
                "lepe": lepe,
                "proj": _linear(sd, f"{b}.proj"),
                "norm2": _ln(sd, f"{b}.norm2"),
                "fc1": _linear(sd, f"{b}.mlp.fc1"),
                "fc2": _linear(sd, f"{b}.mlp.fc2"),
            })
        p["stages"].append(blocks)
        if i < 4:
            p["merge"].append({
                "conv": {"w": _conv_hwio(sd[f"merge{i}.conv.weight"]),
                         "b": sd[f"merge{i}.conv.bias"]},
                "norm": _ln(sd, f"merge{i}.norm"),
            })
    return p


# ---------------------------------------------------------------------------
# ResNet-D
# ---------------------------------------------------------------------------


def _bn_split(sd, prefix):
    return ({"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
            {"mean": sd[prefix + ".running_mean"],
             "var": sd[prefix + ".running_var"]})


def convert_resnet_state_dict(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """timm resnet (deep stem + avg_down, e.g. resnet50d/resnet26d)
    state_dict -> (params, state) for :mod:`slak_tpu.models.resnet`."""
    sd = _unwrap(sd)
    params: Dict[str, Any] = {"stem": [], "stages": [],
                              "head": _linear(sd, "fc")}
    state: Dict[str, Any] = {"stem": [], "stages": []}

    stem_slots = (("conv1.0", "conv1.1"), ("conv1.3", "conv1.4"),
                  ("conv1.6", "bn1"))
    for conv_key, bn_key in stem_slots:
        bn_p, bn_s = _bn_split(sd, bn_key)
        params["stem"].append({
            "conv": {"w": _conv_hwio(sd[conv_key + ".weight"])},
            "bn": bn_p})
        state["stem"].append({"bn": bn_s})

    for i in range(1, 5):
        depth = 1 + max(int(m.group(1)) for k in sd
                        if (m := re.match(rf"layer{i}\.(\d+)\.", k)))
        blocks_p, blocks_s = [], []
        for j in range(depth):
            b = f"layer{i}.{j}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in ("conv1", "conv2", "conv3"):
                bp[c] = {"w": _conv_hwio(sd[f"{b}.{c}.weight"])}
                bp[c + "_bn"], bs[c + "_bn"] = _bn_split(sd, f"{b}.bn{c[-1]}")
            if f"{b}.downsample.1.weight" in sd:
                bp["down"] = {
                    "w": _conv_hwio(sd[f"{b}.downsample.1.weight"])}
                bp["down_bn"], bs["down_bn"] = _bn_split(
                    sd, f"{b}.downsample.2")
            blocks_p.append(bp)
            blocks_s.append(bs)
        params["stages"].append(blocks_p)
        state["stages"].append(blocks_s)
    return params, state


def convert_mobilenet_state_dict(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """timm mobilenetv3 / efficientnet state_dict -> (params, state) for
    :mod:`slak_tpu.models.mobile` (the flat-block MBConv model).

    Stage/block structure is derived from the keys themselves
    (``blocks.{stage}.{i}.*``); block type from key presence —
    ``conv_pwl`` marks an InvertedResidual (expand ``conv_pw``/bn1,
    depthwise ``conv_dw``/bn2, project ``conv_pwl``/bn3), otherwise a
    DepthwiseSeparableConv (``conv_dw``/bn1, project ``conv_pw``/bn2) —
    mirroring ``timm1/models/efficientnet_blocks.py:90-134,149-199``.
    Head: a top-level ``bn2`` means the EfficientNet conv+BN-before-pool
    head (``efficientnet.py:435-446``); otherwise the MobileNetV3 biased
    conv-after-pool head (``mobilenetv3.py:114-117``)."""
    sd = _unwrap(sd)
    params: Dict[str, Any] = {"blocks": []}
    state: Dict[str, Any] = {"blocks": []}

    params["stem"] = {"w": _conv_hwio(sd["conv_stem.weight"])}
    params["stem_bn"], state["stem_bn"] = _bn_split(sd, "bn1")

    n_stages = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"blocks\.(\d+)\.", k)))
    for si in range(n_stages):
        depth = 1 + max(int(m.group(1)) for k in sd
                        if (m := re.match(rf"blocks\.{si}\.(\d+)\.", k)))
        for bi in range(depth):
            b = f"blocks.{si}.{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if f"{b}.conv_pwl.weight" in sd:      # InvertedResidual
                bp["expand"] = {"w": _conv_hwio(sd[f"{b}.conv_pw.weight"])}
                bp["expand_bn"], bs["expand_bn"] = _bn_split(sd, f"{b}.bn1")
                bp["dw"] = {"w": _conv_hwio(sd[f"{b}.conv_dw.weight"])}
                bp["dw_bn"], bs["dw_bn"] = _bn_split(sd, f"{b}.bn2")
                proj, proj_bn = f"{b}.conv_pwl", f"{b}.bn3"
            else:                                  # DepthwiseSeparableConv
                bp["dw"] = {"w": _conv_hwio(sd[f"{b}.conv_dw.weight"])}
                bp["dw_bn"], bs["dw_bn"] = _bn_split(sd, f"{b}.bn1")
                proj, proj_bn = f"{b}.conv_pw", f"{b}.bn2"
            if f"{b}.se.conv_reduce.weight" in sd:
                bp["se_reduce"] = {
                    "w": _conv_hwio(sd[f"{b}.se.conv_reduce.weight"]),
                    "b": sd[f"{b}.se.conv_reduce.bias"]}
                bp["se_expand"] = {
                    "w": _conv_hwio(sd[f"{b}.se.conv_expand.weight"]),
                    "b": sd[f"{b}.se.conv_expand.bias"]}
            bp["project"] = {"w": _conv_hwio(sd[proj + ".weight"])}
            bp["project_bn"], bs["project_bn"] = _bn_split(sd, proj_bn)
            params["blocks"].append(bp)
            state["blocks"].append(bs)

    params["head_conv"] = {"w": _conv_hwio(sd["conv_head.weight"])}
    if "bn2.running_mean" in sd:                   # EfficientNet head
        params["head_bn"], state["head_bn"] = _bn_split(sd, "bn2")
    else:                                          # MobileNetV3 head
        params["head_conv"]["b"] = sd["conv_head.bias"]
    params["classifier"] = _linear(sd, "classifier")
    return params, state


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def load_teacher_checkpoint(path: str, model_name: str):
    """Load a torch teacher checkpoint for ``model_name`` and convert it.

    Returns ``params`` for stateless teachers (vit/swin) or
    ``(params, state)`` for BN teachers (resnet). Mirrors the reference's
    per-family loading (``main_KD.py:413-509``)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(ckpt, dict):
        raise ValueError(f"unsupported checkpoint object in {path}")
    if model_name.startswith(("vit", "deit")):
        return convert_vit_state_dict(ckpt)
    if model_name.startswith("cswin") or model_name.startswith("CSWin"):
        return convert_cswin_state_dict(ckpt)
    if model_name.startswith("swin"):
        return convert_swin_state_dict(ckpt)
    if model_name.startswith("resnet"):
        return convert_resnet_state_dict(ckpt)
    if model_name.startswith(("mobilenet", "efficientnet",
                              "tf_efficientnet")):
        return convert_mobilenet_state_dict(ckpt)
    raise ValueError(f"no teacher converter for {model_name!r}")
