"""Checkpoint-conversion parity: a PyTorch model with the reference's exact
module naming and math (models/SLaK.py:60-235) is built here, its state_dict
converted with ``convert_state_dict``, and logits must match to float32
tolerance. Also round-trips our Orbax checkpointing."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from slak_tpu.models import slak as M
from slak_tpu.utils import convert_state_dict


# --- a torch twin with the reference's structure & names --------------------

class TorchLN(nn.Module):
    """LayerNorm supporting channels_first, like models/SLaK.py:237-261."""

    def __init__(self, c, eps=1e-6, channels_first=False):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps
        self.channels_first = channels_first

    def forward(self, x):
        if not self.channels_first:
            return F.layer_norm(x, self.weight.shape, self.weight, self.bias,
                                self.eps)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def conv_bn(c, kh, kw, bn=True):
    seq = nn.Sequential()
    # reference extension: stride 1, per-dim same padding k//2
    # (forward_fp32.cu:140-144), no conv bias (models/SLaK.py:38-47)
    seq.add_module("conv", nn.Conv2d(c, c, (kh, kw), 1, (kh // 2, kw // 2),
                                     groups=c, bias=False))
    if bn:
        seq.add_module("bn", nn.BatchNorm2d(c))
    return seq


class TorchLargeKernel(nn.Module):
    def __init__(self, c, k, s, decom=True, bn=True):
        super().__init__()
        if decom:
            self.LoRA1 = conv_bn(c, k, s, bn)
            self.LoRA2 = conv_bn(c, s, k, bn)
        else:
            self.lkb_origin = conv_bn(c, k, k, bn)
        if s < k:
            self.small_conv = conv_bn(c, s, s, bn)
        self.decom = decom

    def forward(self, x):
        if self.decom:
            out = self.LoRA1(x) + self.LoRA2(x)
        else:
            out = self.lkb_origin(x)
        if hasattr(self, "small_conv"):
            out = out + self.small_conv(x)
        return out


class TorchBlock(nn.Module):
    def __init__(self, c, k, s, decom, bn):
        super().__init__()
        self.large_kernel = TorchLargeKernel(c, k, s, decom, bn)
        self.norm = TorchLN(c)
        self.pwconv1 = nn.Linear(c, 4 * c)
        self.pwconv2 = nn.Linear(4 * c, c)
        self.gamma = nn.Parameter(1e-6 * torch.ones(c))

    def forward(self, x):
        inp = x
        x = self.large_kernel(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = F.gelu(x)
        x = self.pwconv2(x)
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return inp + x


class TorchSLaK(nn.Module):
    def __init__(self, depths, dims, kernel_size, num_classes, decom=True,
                 bn=True, in_chans=3):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(nn.Sequential(
            nn.Conv2d(in_chans, dims[0], 4, 4),
            TorchLN(dims[0], channels_first=True)))
        for i in range(3):
            self.downsample_layers.append(nn.Sequential(
                TorchLN(dims[i], channels_first=True),
                nn.Conv2d(dims[i], dims[i + 1], 2, 2)))
        self.stages = nn.ModuleList()
        for i in range(4):
            self.stages.append(nn.Sequential(*[
                TorchBlock(dims[i], kernel_size[i], kernel_size[-1], decom,
                           bn) for _ in range(depths[i])]))
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head = nn.Linear(dims[-1], num_classes)

    def forward(self, x):
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
        return self.head(self.norm(x.mean([-2, -1])))


def randomize(model, rng):
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(tuple(p.shape)).astype(np.float32) * 0.05))
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(mod.num_features).astype(np.float32)
                    * 0.1))
                mod.running_var.copy_(torch.from_numpy(
                    np.abs(rng.standard_normal(mod.num_features)
                           .astype(np.float32)) + 0.5))


@pytest.mark.parametrize("decom,bn", [(True, True), (False, True),
                                      (True, False)])
def test_converted_logits_match_torch(rng, decom, bn):
    depths, dims = (1, 1, 2, 1), (8, 16, 24, 32)
    ks = (13, 11, 9, 7, 5)
    tm = TorchSLaK(depths, dims, ks, 10, decom, bn).eval()
    randomize(tm, rng)

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params, state = convert_state_dict(tm.state_dict())
    cfg = M.SLaKConfig(depths=depths, dims=dims, kernel_size=ks, decom=decom,
                       branch_bn=bn, num_classes=10, conv_impl="xla")
    got, _ = M.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_converted_sparse_eval_and_merge(rng):
    """Sparse torch ckpt (zeros in weights): resume-mask derivation and the
    merged deployment model must both reproduce the torch logits."""
    from slak_tpu.sparsity import MaskConfig, init_masks

    depths, dims, ks = (1, 1, 1, 1), (8, 16, 24, 32), (13, 11, 9, 7, 5)
    tm = TorchSLaK(depths, dims, ks, 10).eval()
    randomize(tm, rng)
    # sparsify the torch weights like a trained sparse ckpt
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if p.ndim >= 2 and "large_kernel" in name:
                m = torch.from_numpy(
                    (rng.random(tuple(p.shape)) < 0.6).astype(np.float32))
                p.mul_(m)

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    params, state = convert_state_dict(tm.state_dict())
    cfg = M.SLaKConfig(depths=depths, dims=dims, kernel_size=ks,
                       num_classes=10, conv_impl="xla")
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got, _ = M.apply(params, state, xj, cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    # resume masks match the zero pattern
    st = init_masks(jax.random.PRNGKey(0), params,
                    MaskConfig(sparsity=0.4, sparse_init="resume"))
    assert len(st.masks) > 0

    # merged reparam model still matches
    merged = M.merge_model(params, state, cfg)
    got_m, _ = M.apply(merged, state, xj, cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(got_m), want, rtol=1e-3, atol=1e-3)


def test_module_prefix_stripping(rng):
    tm = TorchSLaK((1, 1, 1, 1), (8, 16, 24, 32), (7, 7, 7, 7, 5), 10).eval()
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    params, state = convert_state_dict(sd)
    assert "head" in params and len(params["stages"]) == 4


def test_orbax_roundtrip(tmp_path, rng):
    from slak_tpu.train import TrainConfig, create_train_state
    from slak_tpu.train.checkpoint import (auto_load, latest_checkpoint,
                                           save_checkpoint)
    from slak_tpu.sparsity import MaskConfig

    model = M.SLaK(M.SLaKConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32),
                                kernel_size=(7, 7, 7, 7, 5), num_classes=10))
    tcfg = TrainConfig(ema_decay=0.999)
    mcfg = MaskConfig(sparsity=0.4, sparse_init="uniform")
    st = create_train_state(jax.random.PRNGKey(0), model, tcfg, mcfg)

    out = str(tmp_path / "ckpt")
    save_checkpoint(out, st, epoch=3)
    save_checkpoint(out, st, epoch=7)
    assert latest_checkpoint(out).endswith("checkpoint-7")

    restored, start_epoch = auto_load(out, st)
    assert start_epoch == 8
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(st.params)[0]))
    # masks survived serialization (improvement over the reference)
    assert restored.mask_state is not None
    for n in st.mask_state.masks:
        np.testing.assert_array_equal(np.asarray(restored.mask_state.masks[n]),
                                      np.asarray(st.mask_state.masks[n]))


class TorchConvNeXtBlock(nn.Module):
    """Official ConvNeXt naming: dwconv/norm/pwconv1/pwconv2/gamma."""

    def __init__(self, c):
        super().__init__()
        self.dwconv = nn.Conv2d(c, c, 7, 1, 3, groups=c)  # has bias
        self.norm = TorchLN(c)
        self.pwconv1 = nn.Linear(c, 4 * c)
        self.pwconv2 = nn.Linear(4 * c, c)
        self.gamma = nn.Parameter(1e-6 * torch.ones(c))

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.pwconv2(F.gelu(self.pwconv1(self.norm(x)))) * self.gamma
        return inp + x.permute(0, 3, 1, 2)


def test_official_convnext_naming(rng):
    """facebook/ConvNeXt checkpoints use `dwconv` with a conv bias."""
    depths, dims = (1, 1, 1, 1), (8, 16, 24, 32)
    tm = TorchSLaK(depths, dims, (7, 7, 7, 7, 100), 10, decom=False,
                   bn=False).eval()
    # swap blocks for official-naming blocks
    for i in range(4):
        tm.stages[i] = nn.Sequential(TorchConvNeXtBlock(dims[i]))
    randomize(tm, rng)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    params, state = convert_state_dict(tm.state_dict())
    cfg = M.SLaKConfig(depths=depths, dims=dims,
                       kernel_size=(7, 7, 7, 7, 100), decom=False,
                       branch_bn=False, num_classes=10, conv_impl="xla")
    got, _ = M.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     cfg=cfg, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
