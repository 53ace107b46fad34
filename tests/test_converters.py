"""Pretrained-weight converter round-trip tests.

The real torch.hub checkpoints are unreachable from this container (no
egress), but the converters are the ONLY bridge from those checkpoints to
this framework's accuracy story, so each one is exercised against a
SYNTHETIC torch state dict carrying the official checkpoint key names and
shapes. The torch side of every test consumes the state dict with torch's
own semantics (F.linear = x @ W.T, F.conv2d OIHW, reference module code
where importable), so a wrong key name, a missed transpose, or a dropped
weight diverges the outputs and fails CI.

Key-name sources:
- DINOv2 ViT-S/14 hub naming (torch.hub dinov2_vits14,
  /root/reference/pose_estimation/backbone.py:15): ``patch_embed.proj.*``,
  ``cls_token``, ``pos_embed``, ``mask_token``,
  ``blocks.N.{norm1,attn.qkv,attn.proj,ls1.gamma,norm2,mlp.fc1,mlp.fc2,
  ls2.gamma}``, ``norm.*``.
- SuperPoint superpoint_v1.pth conv names
  (/root/reference/pose_estimation/superpoint.py:4-89): grayscale conv1a
  expanded to 3 channels by the reference's increase_input_channels.
- LPIPS: full torchvision VGG16 checkpoint naming (``features.N.*`` +
  ``classifier.*``) and the richzhang linear file ``lin{i}.model.1.weight``
  (/root/reference/lpipsPyTorch/modules/utils.py:11-30).
"""

import math
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.pose import dino
from sixdgs_tpu.pose import lpips as lpips_mod
from sixdgs_tpu.pose import superpoint as sp_mod

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _t(rng, *shape, scale=0.05):
    return torch.from_numpy(rng.normal(size=shape).astype(np.float32) * scale)


# --------------------------------------------------------------------- DINOv2


def make_dino_state_dict(rng, depth=2, grid=16, embed=384):
    """Synthetic dict with the official dinov2_vits14 key names/shapes
    (depth shortened; the converter iterates blocks by key presence)."""
    sd = {
        "cls_token": _t(rng, 1, 1, embed),
        "pos_embed": _t(rng, 1, 1 + grid * grid, embed),
        "mask_token": _t(rng, 1, embed),  # present in the hub dict; unused
        "patch_embed.proj.weight": _t(rng, embed, 3, 14, 14),
        "patch_embed.proj.bias": _t(rng, embed),
        "norm.weight": 1.0 + _t(rng, embed),
        "norm.bias": _t(rng, embed),
    }
    hidden = embed * 4
    for i in range(depth):
        pre = f"blocks.{i}."
        sd.update({
            pre + "norm1.weight": 1.0 + _t(rng, embed),
            pre + "norm1.bias": _t(rng, embed),
            pre + "attn.qkv.weight": _t(rng, 3 * embed, embed),
            pre + "attn.qkv.bias": _t(rng, 3 * embed),
            pre + "attn.proj.weight": _t(rng, embed, embed),
            pre + "attn.proj.bias": _t(rng, embed),
            pre + "ls1.gamma": _t(rng, embed, scale=1.0),
            pre + "norm2.weight": 1.0 + _t(rng, embed),
            pre + "norm2.bias": _t(rng, embed),
            pre + "mlp.fc1.weight": _t(rng, hidden, embed),
            pre + "mlp.fc1.bias": _t(rng, hidden),
            pre + "mlp.fc2.weight": _t(rng, embed, hidden),
            pre + "mlp.fc2.bias": _t(rng, embed),
            pre + "ls2.gamma": _t(rng, embed, scale=1.0),
        })
    return sd


def torch_dino_forward(sd, img, embed=384, heads=6):
    """DINOv2 forward consuming the hub state dict directly with torch
    semantics (the ground truth the converter must reproduce)."""
    with torch.no_grad():
        x = F.conv2d(torch.from_numpy(img)[None],
                     sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=14)
        x = x.flatten(2).transpose(1, 2)[0]  # [N, D] row-major patch order
        x = torch.cat([sd["cls_token"][0], x], dim=0)
        x = x + sd["pos_embed"][0]
        hd = embed // heads
        i = 0
        while f"blocks.{i}.norm1.weight" in sd:
            pre = f"blocks.{i}."
            y = F.layer_norm(x, (embed,), sd[pre + "norm1.weight"],
                             sd[pre + "norm1.bias"], eps=1e-6)
            n = y.shape[0]
            qkv = F.linear(y, sd[pre + "attn.qkv.weight"],
                           sd[pre + "attn.qkv.bias"])
            qkv = qkv.reshape(n, 3, heads, hd).permute(1, 2, 0, 3)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
            y = (a @ v).permute(1, 0, 2).reshape(n, embed)
            y = F.linear(y, sd[pre + "attn.proj.weight"],
                         sd[pre + "attn.proj.bias"])
            x = x + sd[pre + "ls1.gamma"] * y
            y = F.layer_norm(x, (embed,), sd[pre + "norm2.weight"],
                             sd[pre + "norm2.bias"], eps=1e-6)
            y = F.gelu(F.linear(y, sd[pre + "mlp.fc1.weight"],
                                sd[pre + "mlp.fc1.bias"]))
            y = F.linear(y, sd[pre + "mlp.fc2.weight"],
                         sd[pre + "mlp.fc2.bias"])
            x = x + sd[pre + "ls2.gamma"] * y
            i += 1
        x = F.layer_norm(x, (embed,), sd["norm.weight"], sd["norm.bias"],
                         eps=1e-6)
        return x[1:].numpy()


class TestDinoConverter:
    def test_forward_parity_vs_torch_state_dict(self):
        rng = np.random.default_rng(11)
        sd = make_dino_state_dict(rng, depth=2, grid=16)
        params = dino.convert_torch_state_dict(sd)
        assert len(params["blocks"]) == 2

        img = rng.normal(size=(3, 224, 224)).astype(np.float32)
        ref = torch_dino_forward(sd, img)
        ours = np.asarray(
            dino.forward_features(params, jnp.asarray(img))["x_norm_patchtokens"])
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_official_shapes_convert_and_run(self):
        """Full hub shapes: 12 blocks, 37x37 pos grid (1 + 1369 tokens) —
        conversion + the interpolated-pos-embed forward path both work."""
        rng = np.random.default_rng(12)
        sd = make_dino_state_dict(rng, depth=12, grid=37)
        params = dino.convert_torch_state_dict(sd)
        assert len(params["blocks"]) == 12
        assert params["pos_embed"].shape == (1 + 37 * 37, 384)
        out = dino.forward_features(params, jnp.zeros((3, 224, 224)))
        assert out["x_norm_patchtokens"].shape == (256, 384)

    def test_npz_roundtrip_of_converted(self, tmp_path):
        rng = np.random.default_rng(13)
        sd = make_dino_state_dict(rng, depth=2, grid=16)
        params = dino.convert_torch_state_dict(sd)
        path = tmp_path / "dino.npz"
        np.savez(path, **dino.flatten_params(params))
        params2 = dino.load_params(str(path))
        chex = pytest.importorskip("chex")
        chex.assert_trees_all_close(params, params2)


# ------------------------------------------------------------------ SuperPoint


def make_superpoint_state_dict(rng):
    """superpoint_v1.pth layout: GRAYSCALE conv1a [64, 1, 3, 3]."""
    shapes = {
        "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
        "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
        "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
        "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
        "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
        "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
    }
    sd = {}
    for name, s in shapes.items():
        sd[f"{name}.weight"] = _t(rng, *s, scale=1.0 / math.sqrt(s[1] * s[2] * s[3]))
        sd[f"{name}.bias"] = _t(rng, s[0])
    return sd


class TestSuperPointConverter:
    def test_forward_parity_vs_reference_module(self):
        """Load the synthetic hub dict into the REFERENCE SuperPointNet
        (pure torch, no download), expand to 3 input channels with the
        reference's own increase_input_channels, and compare descriptors."""
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from pose_estimation.superpoint import SuperPointNet

        rng = np.random.default_rng(21)
        sd = make_superpoint_state_dict(rng)

        net = SuperPointNet()
        net.load_state_dict(sd)
        net.increase_input_channels(3)
        img = rng.normal(size=(3, 64, 64)).astype(np.float32) * 0.5
        with torch.no_grad():
            desc = net(torch.from_numpy(img)[None])[0]  # [256, 8, 8]
        ref = desc.permute(1, 2, 0).reshape(-1, 256).numpy()

        params = sp_mod.convert_torch_state_dict(sd)
        ours = np.asarray(
            sp_mod.forward_features(params, jnp.asarray(img))["x_norm_patchtokens"])
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


# ----------------------------------------------------------------------- LPIPS


def make_vgg16_state_dict(rng):
    """Full torchvision vgg16 checkpoint naming: conv layers at features.
    {0,2,5,7,10,12,14,17,19,21,24,26,28} plus classifier entries the
    converter must skip."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    cfg = [c for c in lpips_mod.VGG16_CFG if c != "M"]
    sd = {}
    cin = 3
    for idx, cout in zip(conv_idx, cfg):
        sd[f"features.{idx}.weight"] = _t(rng, cout, cin, 3, 3,
                                          scale=1.0 / math.sqrt(cin * 9))
        sd[f"features.{idx}.bias"] = _t(rng, cout, scale=0.01)
        cin = cout
    sd["classifier.0.weight"] = _t(rng, 8, 8)  # must be ignored
    sd["classifier.0.bias"] = _t(rng, 8)
    return sd


def torch_lpips_distance(vgg_sd, lin_sd, img1, img2):
    """Reference LPIPS semantics (lpipsPyTorch/modules/{lpips,networks}.py)
    consuming the torchvision-named state dict directly."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    shift = torch.tensor([-.030, -.088, -.188])[:, None, None]
    scale = torch.tensor([.458, .448, .450])[:, None, None]

    def feats(img):
        x = (torch.from_numpy(img) - shift) / scale
        x = x[None]
        out = []
        ci = 0
        for item in lpips_mod.VGG16_CFG:
            if item == "M":
                x = F.max_pool2d(x, 2, 2)
            else:
                x = F.relu(F.conv2d(x, vgg_sd[f"features.{conv_idx[ci]}.weight"],
                                    vgg_sd[f"features.{conv_idx[ci]}.bias"],
                                    padding=1))
                if ci in lpips_mod.VGG_TAPS:
                    n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
                    out.append(x / (n + 1e-10))
                ci += 1
        return out

    with torch.no_grad():
        f1, f2 = feats(img1), feats(img2)
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            d = (a - b) ** 2
            w = lin_sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
            total = total + F.conv2d(d, w).mean()
        return float(total)


class TestLpipsConverter:
    def test_distance_parity_vs_torch_state_dicts(self):
        rng = np.random.default_rng(31)
        vgg_sd = make_vgg16_state_dict(rng)
        lin_sd = {
            f"lin{i}.model.1.weight": torch.from_numpy(
                rng.uniform(0.0, 2.0 / c, size=(1, c, 1, 1)).astype(np.float32))
            for i, c in enumerate(lpips_mod.VGG_CHANNELS)
        }
        params = lpips_mod.convert_torch_lpips(vgg_sd, lin_sd)
        assert params["conv0.w"].shape == (64, 3, 3, 3)
        assert params["conv12.w"].shape == (512, 512, 3, 3)

        img1 = rng.uniform(size=(3, 64, 64)).astype(np.float32)
        img2 = np.clip(img1 + rng.normal(size=img1.shape).astype(np.float32) * 0.1,
                       0, 1)
        ref = torch_lpips_distance(vgg_sd, lin_sd, img1, img2)
        ours = float(lpips_mod.lpips_distance(params, jnp.asarray(img1),
                                              jnp.asarray(img2)))
        assert ours == pytest.approx(ref, rel=1e-3, abs=1e-5)

    def test_bare_features_dict_and_renamed_lin(self):
        """The converter also accepts the bare ``.features`` sub-dict and the
        reference's in-memory renamed lin keys ``{i}.1.weight``
        (/root/reference/lpipsPyTorch/modules/utils.py:23-30)."""
        rng = np.random.default_rng(32)
        full = make_vgg16_state_dict(rng)
        bare = {k.split("features.")[1]: v for k, v in full.items()
                if k.startswith("features.")}
        lin = {
            f"{i}.1.weight": torch.from_numpy(
                rng.uniform(size=(1, c, 1, 1)).astype(np.float32))
            for i, c in enumerate(lpips_mod.VGG_CHANNELS)
        }
        p1 = lpips_mod.convert_torch_lpips(bare, lin)
        p2 = lpips_mod.convert_torch_lpips(full, {
            f"lin{i}.model.1.weight": lin[f"{i}.1.weight"] for i in range(5)})
        for k in p1:
            np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))

    def test_missing_lin_weight_raises(self):
        rng = np.random.default_rng(33)
        vgg_sd = make_vgg16_state_dict(rng)
        with pytest.raises(KeyError):
            lpips_mod.convert_torch_lpips(vgg_sd, {})
