"""PyTorch-checkpoint converter: reference SLaK/ConvNeXt ``state_dict`` ->
our NHWC (params, state) pytrees. Numerically-matching logits from converted
weights are a hard requirement (BASELINE.json north star).

Name mapping (reference ``models/SLaK.py:168-235``):

  torch                                      ours
  -----------------------------------------  -----------------------------
  downsample_layers.0.0.{weight,bias}        downsample.0.conv.{w,b}
  downsample_layers.0.1.{weight,bias}        downsample.0.norm.{scale,bias}
  downsample_layers.i.0.{weight,bias}        downsample.i.norm.{scale,bias}
  downsample_layers.i.1.{weight,bias}        downsample.i.conv.{w,b}
  stages.i.j.large_kernel.LoRA1.conv.weight  stages.i.j.lk.LoRA1.w
  stages.i.j.large_kernel.LoRA1.bn.*         params .bn.{scale,bias} +
                                             state  .bn.{mean,var}
  ... LoRA2 / small_conv / lkb_origin        LoRA2 / small / origin
  ... lkb_reparam.{weight,bias}              reparam.{w,b}
  stages.i.j.norm.{weight,bias}              stages.i.j.norm.{scale,bias}
  stages.i.j.pwconv{1,2}.{weight,bias}       pwconv{1,2}.{w,b}
  stages.i.j.gamma                           gamma
  norm.{weight,bias}                         norm.{scale,bias}
  head.{weight,bias}                         head.{w,b}

Layout conversions:
  * dense conv (out,in,kh,kw)   -> HWIO (kh,kw,in,out)
  * depthwise conv (C,1,kh,kw)  -> (kh,kw,C)
  * linear (out,in)             -> (in,out)

Checkpoint unwrapping follows the reference's loaders: pick the ``model`` /
``model_ema`` / ``state_dict`` entry and strip ``module.`` / ``backbone.``
prefixes (``utils.py:508-544``, ``segmentation/slak.py:294-315``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _strip_prefixes(sd: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "backbone."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


_BRANCH = {"LoRA1": "LoRA1", "LoRA2": "LoRA2", "small_conv": "small",
           "lkb_origin": "origin"}


def convert_state_dict(sd: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Convert a reference state_dict into nested (params, state) dicts that
    match :mod:`slak_tpu.models.slak`'s tree structure."""
    sd = _strip_prefixes(sd)

    params: Dict[str, Any] = {"downsample": {}, "stages": {}}
    state: Dict[str, Any] = {"stages": {}}

    def ds(i):
        return params["downsample"].setdefault(i, {})

    def blk(i, j):
        return params["stages"].setdefault(i, {}).setdefault(j, {})

    def blk_state(i, j):
        return state["stages"].setdefault(i, {}).setdefault(j, {"lk": {}})

    for key, val in sd.items():
        v = _to_np(val)

        m = re.match(r"downsample_layers\.(\d+)\.(\d+)\.(weight|bias)$", key)
        if m:
            i, sub, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            conv_slot = 0 if i == 0 else 1
            if sub == conv_slot:  # conv
                d = ds(i).setdefault("conv", {})
                if wb == "weight":
                    d["w"] = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                else:
                    d["b"] = v
            else:  # LN
                d = ds(i).setdefault("norm", {})
                d["scale" if wb == "weight" else "bias"] = v
            continue

        # official-ConvNeXt naming (reference convnext.py / facebook ckpts):
        # stages.i.j.dwconv.{weight,bias} -> a bias-carrying origin branch
        m = re.match(r"stages\.(\d+)\.(\d+)\.dwconv\.(weight|bias)$", key)
        if m:
            i, j, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            b = blk(i, j).setdefault("lk", {}).setdefault("origin", {})
            blk_state(i, j)["lk"].setdefault("origin", {})
            if wb == "weight":
                b["w"] = v[:, 0].transpose(1, 2, 0)
            else:
                b["b"] = v
            continue

        m = re.match(
            r"stages\.(\d+)\.(\d+)\.large_kernel\.(LoRA1|LoRA2|small_conv|"
            r"lkb_origin)\.(conv|bn)\.(\w+)$", key)
        if m:
            i, j = int(m.group(1)), int(m.group(2))
            branch = _BRANCH[m.group(3)]
            sub, leaf = m.group(4), m.group(5)
            b = blk(i, j).setdefault("lk", {}).setdefault(branch, {})
            bs = blk_state(i, j)["lk"].setdefault(branch, {})
            if sub == "conv":
                if leaf == "weight":  # (C,1,kh,kw) -> (kh,kw,C)
                    b["w"] = v[:, 0].transpose(1, 2, 0)
                # depthwise convs in conv_bn have bias=False; ignore others
            else:
                if leaf == "weight":
                    b.setdefault("bn", {})["scale"] = v
                elif leaf == "bias":
                    b.setdefault("bn", {})["bias"] = v
                elif leaf == "running_mean":
                    bs.setdefault("bn", {})["mean"] = v
                elif leaf == "running_var":
                    bs.setdefault("bn", {})["var"] = v
                # num_batches_tracked dropped
            continue

        m = re.match(r"stages\.(\d+)\.(\d+)\.large_kernel\.lkb_reparam\."
                     r"(weight|bias)$", key)
        if m:
            i, j, wb = int(m.group(1)), int(m.group(2)), m.group(3)
            d = blk(i, j).setdefault("lk", {}).setdefault("reparam", {})
            if wb == "weight":
                d["w"] = v[:, 0].transpose(1, 2, 0)
            else:
                d["b"] = v
            blk_state(i, j)
            continue

        m = re.match(r"stages\.(\d+)\.(\d+)\.(norm|pwconv1|pwconv2)\."
                     r"(weight|bias)$", key)
        if m:
            i, j, mod, wb = (int(m.group(1)), int(m.group(2)), m.group(3),
                             m.group(4))
            blk_state(i, j)
            if mod == "norm":
                d = blk(i, j).setdefault("norm", {})
                d["scale" if wb == "weight" else "bias"] = v
            else:
                d = blk(i, j).setdefault(mod, {})
                if wb == "weight":
                    d["w"] = v.T  # (out,in) -> (in,out)
                else:
                    d["b"] = v
            continue

        m = re.match(r"stages\.(\d+)\.(\d+)\.gamma$", key)
        if m:
            blk(int(m.group(1)), int(m.group(2)))["gamma"] = v
            continue

        if key in ("norm.weight", "norm.bias"):
            params.setdefault("norm", {})[
                "scale" if key.endswith("weight") else "bias"] = v
            continue
        if key in ("head.weight", "head.bias"):
            d = params.setdefault("head", {})
            if key.endswith("weight"):
                d["w"] = v.T
            else:
                d["b"] = v
            continue
        # anything else (e.g. segmentation norms) is the caller's business

    # dict-of-int-keys -> lists, matching our init() tree structure
    params["downsample"] = [params["downsample"][i]
                            for i in sorted(params["downsample"])]
    params["stages"] = [
        [params["stages"][i][j] for j in sorted(params["stages"][i])]
        for i in sorted(params["stages"])]
    state["stages"] = [
        [state["stages"][i][j] for j in sorted(state["stages"][i])]
        for i in sorted(state["stages"])]
    return params, state


def load_torch_checkpoint(path: str, prefer_ema: bool = False,
                          model_key: str = "model|module",
                          model_prefix: str = "") -> Tuple[Dict, Dict]:
    """Load a reference ``checkpoint-*.pth`` and convert it. Mirrors the
    reference's model-key unwrapping (``main.py:407-409``, '|'-separated
    ``--model_key`` candidates tried in order + ``--model_prefix``
    stripping, ``utils.py:508-544``)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        keys = (["model_ema"] if prefer_ema else []) \
            + model_key.split("|") + ["state_dict", "model_ema"]
        for key in keys:
            if key in ckpt:
                ckpt = ckpt[key]
                break
    if model_prefix:
        ckpt = {k[len(model_prefix):] if k.startswith(model_prefix) else k: v
                for k, v in ckpt.items()}
    return convert_state_dict(ckpt)
