"""Teacher-converter logit parity: torch twins with timm parameter naming
drive the state_dict converters end-to-end (same standard as
tests/test_convert.py for SLaK). The twins re-derive the vendored timm
architectures (reference ``timm1/models/{vision_transformer,
swin_transformer,resnet}.py``) as test oracles — built from scratch."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from slak_tpu.utils.convert_teachers import (convert_resnet_state_dict,
                                             convert_swin_state_dict,
                                             convert_vit_state_dict)


def _randomize(module, rng):
    """Fill every param/buffer with random values so parity is meaningful."""
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.from_numpy(
                rng.standard_normal(p.shape).astype(np.float32) * 0.05))
        for name, b in module.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.from_numpy(
                    0.5 + rng.random(b.shape).astype(np.float32)))
            elif name.endswith("running_mean"):
                b.copy_(torch.from_numpy(
                    rng.standard_normal(b.shape).astype(np.float32) * 0.1))


# ---------------------------------------------------------------------------
# ViT twin (timm1/models/vision_transformer.py naming)
# ---------------------------------------------------------------------------


class _TorchViTBlock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, t, 3, self.heads, d // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) / math.sqrt(d // self.heads)
        h = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, t, d)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x


class _TorchViT(nn.Module):
    def __init__(self, img=32, patch=16, d=16, depth=2, heads=2, classes=10):
        super().__init__()
        grid = img // patch
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch, patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, d))
        self.blocks = nn.ModuleList(
            [_TorchViTBlock(d, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.head = nn.Linear(d, classes)

    def forward(self, x):
        b = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], 1)
        t = t + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        t = self.norm(t)
        return self.head(t[:, 0])


def test_vit_converter_logit_parity(rng):
    from slak_tpu.models.vit import ViT, ViTConfig
    twin = _TorchViT().eval()
    _randomize(twin, rng)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_vit_state_dict(twin.state_dict()))
    model = ViT(ViTConfig(img_size=32, patch_size=16, embed_dim=16, depth=2,
                          num_heads=2, num_classes=10))
    got, feat = model.apply(params, jnp.asarray(x))
    assert feat.shape == (2, 2, 2, 16)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Swin twin (timm1/models/swin_transformer.py naming)
# ---------------------------------------------------------------------------


def _rel_index(ws):
    coords = torch.stack(torch.meshgrid(
        torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws^2, ws^2)


def _win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _win_rev(xw, ws, h, w):
    b = xw.shape[0] // (h // ws * w // ws)
    x = xw.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class _TorchSwinBlock(nn.Module):
    def __init__(self, d, heads, ws, shift):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.attn.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, 4 * d)
        self.mlp.fc2 = nn.Linear(4 * d, d)
        self.heads, self.ws, self.shift = heads, ws, shift

    def forward(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        ws, s = self.ws, self.shift if x.shape[1] > self.ws else 0
        shortcut = x
        x = self.norm1(x)
        if s:
            x = torch.roll(x, (-s, -s), (1, 2))
        xw = _win_part(x, ws)                       # (nW*B, ws², C)
        bw, t, _ = xw.shape
        hd = c // self.heads
        qkv = self.attn.qkv(xw).reshape(bw, t, 3, self.heads, hd)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        bias = self.attn.relative_position_bias_table[_rel_index(ws)]
        att = att + bias.permute(2, 0, 1)[None]
        if s:
            img_mask = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -s), slice(-s, None)):
                for wsl in (slice(0, -ws), slice(-ws, -s),
                            slice(-s, None)):
                    img_mask[:, hs, wsl] = cnt
                    cnt += 1
            mw = _win_part(img_mask, ws).squeeze(-1)   # (nW, ws²)
            am = mw[:, None] - mw[:, :, None]
            am = am.masked_fill(am != 0, -100.0)
            nw = am.shape[0]
            att = att.view(bw // nw, nw, self.heads, t, t) + am[None, :,
                                                                None]
            att = att.view(bw, self.heads, t, t)
        xw = (att.softmax(-1) @ v).transpose(1, 2).reshape(bw, t, c)
        xw = self.attn.proj(xw)
        x = _win_rev(xw, ws, h, w)
        if s:
            x = torch.roll(x, (s, s), (1, 2))
        x = shortcut + x
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class _TorchPatchMerge(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.norm = nn.LayerNorm(4 * d)
        self.reduction = nn.Linear(4 * d, 2 * d, bias=False)

    def forward(self, x):  # (B, H, W, C) — timm concat order
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class _TorchSwin(nn.Module):
    def __init__(self, img=224, patch=4, d=8, depths=(2, 2, 2, 2),
                 heads=(1, 2, 4, 8), ws=7, classes=10):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch, patch)
        self.patch_embed.norm = nn.LayerNorm(d)
        self.layers = nn.ModuleList()
        for i, depth in enumerate(depths):
            dim = d * 2 ** i
            layer = nn.Module()
            layer.blocks = nn.ModuleList([
                _TorchSwinBlock(dim, heads[i], ws,
                                ws // 2 if j % 2 == 1 else 0)
                for j in range(depth)])
            if i < 3:
                layer.downsample = _TorchPatchMerge(dim)
            self.layers.append(layer)
        self.norm = nn.LayerNorm(d * 8)
        self.head = nn.Linear(d * 8, classes)

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for i, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            if i < 3:
                x = layer.downsample(x)
        x = self.norm(x)
        return self.head(x.mean((1, 2)))


def test_swin_converter_logit_parity(rng):
    from slak_tpu.models.swin import Swin, SwinConfig
    twin = _TorchSwin().eval()
    _randomize(twin, rng)
    x = rng.standard_normal((2, 224, 224, 3), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_swin_state_dict(twin.state_dict()))
    model = Swin(SwinConfig(embed_dim=8, depths=(2, 2, 2, 2),
                            num_heads=(1, 2, 4, 8), num_classes=10))
    got, feat = model.apply(params, jnp.asarray(x))
    assert feat.shape == (2, 7, 7, 64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ResNet-D twin (timm1/models/resnet.py deep-stem + avg_down naming)
# ---------------------------------------------------------------------------


class _TorchBottleneckD(nn.Module):
    def __init__(self, cin, planes, stride, expansion=4):
        super().__init__()
        cout = planes * expansion
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout or stride != 1:
            pool = (nn.AvgPool2d(2, stride, ceil_mode=True,
                                 count_include_pad=False)
                    if stride > 1 else nn.Identity())
            self.downsample = nn.Sequential(
                pool, nn.Conv2d(cin, cout, 1, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        sc = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(sc + y)


class _TorchResNetD(nn.Module):
    def __init__(self, layers=(2, 2, 2, 2), w=16, classes=10):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, w // 2, 3, 2, 1, bias=False),
            nn.BatchNorm2d(w // 2), nn.ReLU(),
            nn.Conv2d(w // 2, w // 2, 3, 1, 1, bias=False),
            nn.BatchNorm2d(w // 2), nn.ReLU(),
            nn.Conv2d(w // 2, w, 3, 1, 1, bias=False))
        self.bn1 = nn.BatchNorm2d(w)
        cin = w
        for i, depth in enumerate(layers):
            planes = w * 2 ** i
            blocks = []
            for j in range(depth):
                blocks.append(_TorchBottleneckD(
                    cin, planes, (1 if i == 0 else 2) if j == 0 else 1))
                cin = planes * 4
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(cin, classes)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return self.fc(x.mean((2, 3)))


def test_resnet_converter_logit_parity(rng):
    from slak_tpu.models.resnet import ResNet, ResNetConfig
    twin = _TorchResNetD().eval()
    _randomize(twin, rng)
    x = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    p, s = convert_resnet_state_dict(twin.state_dict())
    p = jax.tree_util.tree_map(jnp.asarray, p)
    s = jax.tree_util.tree_map(jnp.asarray, s)
    model = ResNet(ResNetConfig(layers=(2, 2, 2, 2), width=16,
                                num_classes=10))
    got, _ = model.apply(p, s, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_load_teacher_checkpoint_roundtrip(rng, tmp_path):
    """--teacher_ckpt end-to-end: torch.save -> load_teacher_checkpoint."""
    from slak_tpu.utils.convert_teachers import load_teacher_checkpoint
    twin = _TorchViT().eval()
    _randomize(twin, rng)
    path = str(tmp_path / "vit.pth")
    torch.save({"model": twin.state_dict()}, path)
    params = load_teacher_checkpoint(path, "vit_base_patch16_224")
    assert params["blocks"][0]["qkv"]["w"].shape == (16, 48)
    with pytest.raises(ValueError):
        load_teacher_checkpoint(path, "unknown_model")


# ---------------------------------------------------------------------------
# CSWin twin (reference cswin.py naming: stage{1..4}, merge{1..3})
# ---------------------------------------------------------------------------


def _win_part_chw(x, hsp, wsp):
    """(B, C, H, W) -> (B*nw, C, hsp, wsp), row-major windows."""
    b, c, h, w = x.shape
    x = x.view(b, c, h // hsp, hsp, w // wsp, wsp)
    return x.permute(0, 2, 4, 1, 3, 5).reshape(-1, c, hsp, wsp)


class _TorchLePEAttn(nn.Module):
    def __init__(self, dim, heads, reso, split, idx):
        super().__init__()
        self.get_v = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)
        self.heads = heads
        if idx == -1:
            self.hsp, self.wsp = reso, reso
        elif idx == 0:
            self.hsp, self.wsp = reso, split
        else:
            self.hsp, self.wsp = split, reso

    def forward(self, q, k, v, h, w):
        """q/k/v: (B, L, C) -> (B, L, C)."""
        b, l, c = q.shape
        hd = c // self.heads

        def to_win(t):
            t = t.transpose(1, 2).reshape(b, c, h, w)
            t = _win_part_chw(t, self.hsp, self.wsp)
            t = t.reshape(-1, c, self.hsp * self.wsp).transpose(1, 2)
            return t.reshape(-1, self.hsp * self.wsp, self.heads,
                             hd).permute(0, 2, 1, 3)

        qw, kw = to_win(q), to_win(k)
        vimg = v.transpose(1, 2).reshape(b, c, h, w)
        vwin = _win_part_chw(vimg, self.hsp, self.wsp)
        lepe = self.get_v(vwin)
        lepe = lepe.reshape(-1, self.heads, hd,
                            self.hsp * self.wsp).permute(0, 1, 3, 2)
        vw = vwin.reshape(-1, self.heads, hd,
                          self.hsp * self.wsp).permute(0, 1, 3, 2)
        att = (qw * hd ** -0.5) @ kw.transpose(-2, -1)
        out = att.softmax(-1) @ vw + lepe
        out = out.transpose(1, 2).reshape(-1, self.hsp * self.wsp, c)
        nw_w = w // self.wsp
        nh = h // self.hsp
        out = out.view(b, nh, nw_w, self.hsp, self.wsp, c)
        out = out.permute(0, 1, 3, 2, 4, 5).reshape(b, l, c)
        return out


class _TorchCSWinBlock(nn.Module):
    def __init__(self, dim, heads, reso, split, last):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        if last:
            self.attns = nn.ModuleList([
                _TorchLePEAttn(dim, heads, reso, split, -1)])
        else:
            self.attns = nn.ModuleList([
                _TorchLePEAttn(dim // 2, heads // 2, reso, split, 0),
                _TorchLePEAttn(dim // 2, heads // 2, reso, split, 1)])
        self.reso = reso

    def forward(self, x):  # (B, L, C)
        b, l, c = x.shape
        h = w = self.reso
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, l, 3, c).permute(2, 0, 1, 3)
        if len(self.attns) == 2:
            x1 = self.attns[0](qkv[0, :, :, :c // 2], qkv[1, :, :, :c // 2],
                               qkv[2, :, :, :c // 2], h, w)
            x2 = self.attns[1](qkv[0, :, :, c // 2:], qkv[1, :, :, c // 2:],
                               qkv[2, :, :, c // 2:], h, w)
            att = torch.cat([x1, x2], 2)
        else:
            att = self.attns[0](qkv[0], qkv[1], qkv[2], h, w)
        x = x + self.proj(att)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))


class _TorchMerge(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = nn.Conv2d(dim, 2 * dim, 3, 2, 1)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):  # (B, L, C)
        b, l, c = x.shape
        h = w = int(l ** 0.5)
        x = x.transpose(1, 2).reshape(b, c, h, w)
        x = self.conv(x)
        x = x.reshape(b, 2 * c, -1).transpose(1, 2)
        return self.norm(x)


class _TorchCSWin(nn.Module):
    def __init__(self, img=224, d=8, depths=(1, 2, 1, 1),
                 heads=(2, 2, 4, 8), splits=(1, 2, 7, 7), classes=10):
        super().__init__()
        self.stage1_conv_embed = nn.Sequential(
            nn.Conv2d(3, d, 7, 4, 2), nn.Identity(), nn.LayerNorm(d))
        reso = img // 4
        dim = d
        for i in range(1, 5):
            setattr(self, f"stage{i}", nn.ModuleList([
                _TorchCSWinBlock(dim, heads[i - 1], reso, splits[i - 1],
                                 last=(i == 4)) for _ in range(depths[i - 1])
            ]))
            if i < 4:
                setattr(self, f"merge{i}", _TorchMerge(dim))
                dim, reso = dim * 2, reso // 2
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, classes)

    def forward(self, x):
        x = self.stage1_conv_embed[0](x)
        b, c, h, w = x.shape
        x = x.reshape(b, c, -1).transpose(1, 2)
        x = self.stage1_conv_embed[2](x)
        for i in range(1, 5):
            for blk in getattr(self, f"stage{i}"):
                x = blk(x)
            if i < 4:
                x = getattr(self, f"merge{i}")(x)
        x = self.norm(x)
        return self.head(x.mean(1))


def test_cswin_converter_logit_parity(rng):
    from slak_tpu.models.cswin import CSWin, CSWinConfig
    from slak_tpu.utils.convert_teachers import convert_cswin_state_dict
    twin = _TorchCSWin().eval()
    _randomize(twin, rng)
    x = rng.standard_normal((2, 224, 224, 3), dtype=np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_cswin_state_dict(twin.state_dict()))
    model = CSWin(CSWinConfig(embed_dim=8, depths=(1, 2, 1, 1),
                              split_sizes=(1, 2, 7, 7),
                              num_heads=(2, 2, 4, 8), num_classes=10))
    got, feat = model.apply(params, jnp.asarray(x))
    assert feat.shape == (2, 7, 7, 64)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# MobileNetV3 / EfficientNet twin (timm1/models/efficientnet_blocks.py
# naming: conv_stem/bn1, blocks.s.i.{conv_pw,bn1,conv_dw,bn2,se.conv_*,
# conv_pwl,bn3}, conv_head[,bn2], classifier)
# ---------------------------------------------------------------------------


def _make_div(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


class _TorchSE(nn.Module):
    def __init__(self, c, rd, act, gate):
        super().__init__()
        self.conv_reduce = nn.Conv2d(c, rd, 1, bias=True)
        self.conv_expand = nn.Conv2d(rd, c, 1, bias=True)
        self.act, self.gate = act, gate

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act(self.conv_reduce(s)))
        return x * self.gate(s)


class _TorchDS(nn.Module):
    """DepthwiseSeparableConv (efficientnet_blocks.py:90-134)."""

    def __init__(self, cin, cout, k, stride, act, se):
        super().__init__()
        self.conv_dw = nn.Conv2d(cin, cin, k, stride, k // 2, groups=cin,
                                 bias=False)
        self.bn1 = nn.BatchNorm2d(cin)
        self.se = se or nn.Identity()
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.act = act
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        sc = x
        x = self.act(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        return x + sc if self.has_skip else x


class _TorchIR(nn.Module):
    """InvertedResidual (efficientnet_blocks.py:149-199)."""

    def __init__(self, cin, cout, mid, k, stride, act, se):
        super().__init__()
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = se or nn.Identity()
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.act = act
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        sc = x
        x = self.act(self.bn1(self.conv_pw(x)))
        x = self.act(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        return x + sc if self.has_skip else x


class _TorchMBNet(nn.Module):
    def __init__(self, spec, stem_ch, head_ch, classes, act, mnv3_head,
                 se_from_block_in, se_divisor, se_act, se_gate):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, stem_ch, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(stem_ch)
        self.act = act
        stages = []
        cin = stem_ch
        for stage in spec:
            blocks = []
            for (exp, cout, k, stride, se_ratio) in stage:
                mid = _make_div(cin * exp)
                se = None
                if se_ratio > 0:
                    base = cin if se_from_block_in else mid
                    rd = _make_div(base * se_ratio, se_divisor)
                    se = _TorchSE(mid if exp != 1 else cin, rd, se_act,
                                  se_gate)
                if exp == 1:
                    blocks.append(_TorchDS(cin, cout, k, stride, act, se))
                else:
                    blocks.append(_TorchIR(cin, cout, mid, k, stride, act,
                                           se))
                cin = cout
            stages.append(nn.ModuleList(blocks))
        self.blocks = nn.ModuleList(stages)
        self.mnv3_head = mnv3_head
        if mnv3_head:
            self.conv_head = nn.Conv2d(cin, head_ch, 1, bias=True)
        else:
            self.conv_head = nn.Conv2d(cin, head_ch, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(head_ch)
        self.classifier = nn.Linear(head_ch, classes)

    def forward(self, x):
        x = self.act(self.bn1(self.conv_stem(x)))
        for stage in self.blocks:
            for b in stage:
                x = b(x)
        if self.mnv3_head:
            x = x.mean((2, 3), keepdim=True)
            x = self.act(self.conv_head(x))[:, :, 0, 0]
        else:
            x = self.act(self.bn2(self.conv_head(x)))
            x = x.mean((2, 3))
        return self.classifier(x)


@pytest.mark.parametrize("family", ["mobilenetv3", "efficientnet"])
def test_mobile_converter_logit_parity(rng, family):
    from slak_tpu.models.mobile import MobileConfig, MobileNet
    from slak_tpu.utils.convert_teachers import convert_mobilenet_state_dict

    if family == "mobilenetv3":
        # ds(e1, no se) + IR stage with MNv3 SE semantics, head after pool
        spec = [[(1, 8, 3, 1, 0.0)],
                [(4, 12, 3, 2, 0.25), (3, 12, 5, 1, 0.25)]]
        tw = _TorchMBNet(spec, 8, 24, 10, nn.Hardswish(), True,
                         False, 8, nn.ReLU(), nn.Hardsigmoid())
        cfg = MobileConfig(
            blocks=((1, 8, 3, 1, 0.0, "hswish"),
                    (4, 12, 3, 2, 0.25, "hswish"),
                    (3, 12, 5, 1, 0.25, "hswish")),
            stem_ch=8, head_ch=24, num_classes=10, stem_act="hswish")
    else:
        # ds(e1, WITH se reduced from block input) + IR, conv+BN head
        spec = [[(1, 8, 3, 1, 0.25)],
                [(6, 12, 5, 2, 0.25), (6, 12, 3, 1, 0.25)]]
        tw = _TorchMBNet(spec, 8, 24, 10, nn.SiLU(), False,
                         True, 1, nn.SiLU(), nn.Sigmoid())
        cfg = MobileConfig(
            blocks=((1, 8, 3, 1, 0.25, "swish"),
                    (6, 12, 5, 2, 0.25, "swish"),
                    (6, 12, 3, 1, 0.25, "swish")),
            stem_ch=8, head_ch=24, num_classes=10, stem_act="swish",
            se_from_block_in=True, se_divisor=1, se_act="block",
            se_gate="sigmoid", head_after_pool=False)

    _randomize(tw, rng)
    tw.eval()
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tw(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    params, state = convert_mobilenet_state_dict(tw.state_dict())
    m = MobileNet(cfg)
    got, _ = m.apply(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
