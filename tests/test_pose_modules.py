"""Pose module tests: DINO numerics vs torch, loss parity vs reference,
solver geometry."""

import math
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.pose import dino
from sixdgs_tpu.pose import modules
from sixdgs_tpu.pose.backbone import (
    image_position_encoding,
    preprocess_image,
    preprocess_mask,
)
from sixdgs_tpu.pose.modules import (
    init_id_module,
    ray_mlp_apply,
    attention_scores,
    cam_up_apply,
    RAY_IN_DIM,
)
from sixdgs_tpu.pose.id_module import score_image
from sixdgs_tpu.pose.loss import distance_score_loss, target_ray_scores, cam_up_loss
from sixdgs_tpu.pose.solver import solve_pose, angular_error_deg, translation_error
from sixdgs_tpu.rays.engine import Rays

REF = "/root/reference"


class TestDino:
    def test_shapes(self):
        params = dino.init_params(jax.random.key(0))
        img = jnp.asarray(np.random.default_rng(0).normal(size=(3, 224, 224)).astype(np.float32))
        out = dino.forward_features(params, img)
        assert out["x_norm_patchtokens"].shape == (256, 384)
        assert out["x_norm_clstoken"].shape == (384,)

    def test_matches_torch_vit(self):
        """Load identical weights into an independently-built torch ViT
        (DINOv2 block structure) and compare outputs."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        params = dino.init_params(jax.random.key(1), num_patches=256)

        class Block(tnn.Module):
            def __init__(self, d=384, h=6):
                super().__init__()
                self.norm1 = tnn.LayerNorm(d, eps=1e-6)
                self.qkv = tnn.Linear(d, 3 * d)
                self.proj = tnn.Linear(d, d)
                self.ls1 = tnn.Parameter(torch.ones(d))
                self.norm2 = tnn.LayerNorm(d, eps=1e-6)
                self.fc1 = tnn.Linear(d, 4 * d)
                self.fc2 = tnn.Linear(4 * d, d)
                self.ls2 = tnn.Parameter(torch.ones(d))
                self.h = h

            def forward(self, x):
                y = self.norm1(x)
                n, d = y.shape
                qkv = self.qkv(y).reshape(n, 3, self.h, d // self.h).permute(1, 2, 0, 3)
                q, k, v = qkv[0], qkv[1], qkv[2]
                a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d // self.h), dim=-1)
                y = (a @ v).permute(1, 0, 2).reshape(n, d)
                x = x + self.ls1 * self.proj(y)
                y = self.norm2(x)
                x = x + self.ls2 * self.fc2(torch.nn.functional.gelu(self.fc1(y)))
                return x

        def t(x):
            return torch.from_numpy(np.asarray(x, np.float32))

        blocks = []
        for bp in params["blocks"]:
            blk = Block()
            blk.norm1.weight.data = t(bp["norm1"]["scale"])
            blk.norm1.bias.data = t(bp["norm1"]["bias"])
            blk.qkv.weight.data = t(bp["qkv"]["w"]).T.contiguous()
            blk.qkv.bias.data = t(bp["qkv"]["b"])
            blk.proj.weight.data = t(bp["proj"]["w"]).T.contiguous()
            blk.proj.bias.data = t(bp["proj"]["b"])
            blk.ls1.data = t(bp["ls1"])
            blk.norm2.weight.data = t(bp["norm2"]["scale"])
            blk.norm2.bias.data = t(bp["norm2"]["bias"])
            blk.fc1.weight.data = t(bp["fc1"]["w"]).T.contiguous()
            blk.fc1.bias.data = t(bp["fc1"]["b"])
            blk.fc2.weight.data = t(bp["fc2"]["w"]).T.contiguous()
            blk.fc2.bias.data = t(bp["fc2"]["b"])
            blk.ls2.data = t(bp["ls2"])
            blocks.append(blk)

        patch_w = t(params["patch_embed"]["w"])  # [14,14,3,D]
        conv = tnn.Conv2d(3, 384, 14, 14)
        conv.weight.data = patch_w.permute(3, 2, 0, 1).contiguous()
        conv.bias.data = t(params["patch_embed"]["b"])
        final_norm = tnn.LayerNorm(384, eps=1e-6)
        final_norm.weight.data = t(params["norm"]["scale"])
        final_norm.bias.data = t(params["norm"]["bias"])

        rng = np.random.default_rng(2)
        img = rng.normal(size=(3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            x = conv(torch.from_numpy(img)[None])[0].reshape(384, -1).T  # [256, 384]
            x = torch.cat([t(params["cls_token"]), x], dim=0)
            x = x + t(params["pos_embed"])
            for blk in blocks:
                x = blk(x)
            x = final_norm(x)
            ref_tokens = x[1:].numpy()

        ours = np.asarray(
            dino.forward_features(params, jnp.asarray(img))["x_norm_patchtokens"]
        )
        np.testing.assert_allclose(ours, ref_tokens, atol=2e-4, rtol=1e-3)

    def test_pos_embed_interpolation(self):
        params = dino.init_params(jax.random.key(3), num_patches=37 * 37)
        img = jnp.zeros((3, 224, 224))
        out = dino.forward_features(params, img)
        assert out["x_norm_patchtokens"].shape == (256, 384)

    def test_flatten_roundtrip(self):
        params = dino.init_params(jax.random.key(4))
        flat = dino.flatten_params(params)
        params2 = dino.unflatten_params(flat)
        chex = pytest.importorskip("chex")
        chex.assert_trees_all_close(params, params2)


class TestPreprocessing:
    def test_matches_torchvision(self):
        torch = pytest.importorskip("torch")
        transforms = pytest.importorskip("torchvision.transforms")

        rng = np.random.default_rng(5)
        img = rng.uniform(size=(300, 400, 3)).astype(np.float32)
        tr = transforms.Compose([
            transforms.Resize(256, interpolation=transforms.InterpolationMode.BICUBIC,
                              antialias=True),
            transforms.CenterCrop(224),
            transforms.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        ])
        ref = tr(torch.from_numpy(img).permute(2, 0, 1)[None])[0].numpy()
        ours = np.asarray(preprocess_image(jnp.asarray(img)))
        assert ours.shape == ref.shape == (3, 224, 224)
        # different resampling implementations: compare loosely
        assert np.abs(ours - ref).mean() < 0.03
        assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.995

    def test_geometry(self):
        """Resize-shorter + center-crop geometry without torchvision: a
        constant image stays constant; a horizontal gradient is centered."""
        img = np.full((300, 400, 3), 0.5, np.float32)
        out = np.asarray(preprocess_image(jnp.asarray(img)))
        assert out.shape == (3, 224, 224)
        expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out.mean(axis=(1, 2)), expected, atol=1e-4)
        # gradient along width: after shorter-side(=h)->256 resize and center
        # crop, the center column keeps the middle gray value
        grad = np.broadcast_to(
            np.linspace(0, 1, 400, dtype=np.float32)[None, :, None], (300, 400, 3)
        )
        out = np.asarray(preprocess_image(jnp.asarray(grad)))
        mid_val = out[0, :, 112].mean() * 0.229 + 0.485
        np.testing.assert_allclose(mid_val, 0.5, atol=0.01)

    def test_mask(self):
        mask = np.zeros((300, 400), np.float32)
        mask[:, 200:] = 1.0  # right half foreground
        pm = np.asarray(preprocess_mask(jnp.asarray(mask)))
        assert pm.shape == (16, 16)
        assert pm[:, 12:].all()
        assert not pm[:, :4].any()

    def test_position_encoding(self):
        pe = np.asarray(image_position_encoding())
        assert pe.shape == (256, 14)
        np.testing.assert_allclose(pe[0, :2], [-1, -1], atol=1e-6)
        np.testing.assert_allclose(pe[-1, :2], [1, 1], atol=1e-6)


def look_at_c2w(cam_pos, target=np.zeros(3), up=np.array([0.0, 1.0, 0.0])):
    """COLMAP-convention c2w: camera z-axis points at the target."""
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = x, y, z
    c2w[:3, 3] = cam_pos
    return c2w


def make_rays(n=512, n_valid=400, seed=6, target=None):
    rng = np.random.default_rng(seed)
    ori = rng.normal(size=(n, 3)).astype(np.float32)
    ori /= np.linalg.norm(ori, axis=-1, keepdims=True)  # unit sphere surface
    if target is None:
        d = rng.normal(size=(n, 3)).astype(np.float32)
    else:
        d = target[None] - ori + 0.02 * rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    valid = np.zeros(n, bool)
    valid[:n_valid] = True
    return Rays(
        ori=jnp.asarray(np.where(valid[:, None], ori, 0.0)),
        dir=jnp.asarray(np.where(valid[:, None], d, 0.0)),
        rgb=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        valid=jnp.asarray(valid),
        gaussian_idx=jnp.asarray(np.where(valid, rng.integers(0, 100, n), -1).astype(np.int32)),
    )


class TestLossParity:
    def test_matches_reference_loss(self):
        torch = pytest.importorskip("torch")
        if REF not in sys.path:
            sys.path.insert(0, REF)
        from pose_estimation.distance_based_loss import DistanceBasedScoreLoss

        rng = np.random.default_rng(7)
        n = 300
        ori = rng.normal(size=(n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pred = rng.uniform(size=n).astype(np.float32)
        # a valid c2w pose
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [0.5, 3.0, 0.2]
        K = np.array([[500.0, 0, 400], [0, 500.0, 300], [0, 0, 1]], np.float32)
        n_patches = 173

        ref_loss, ref_target = DistanceBasedScoreLoss()(
            torch.from_numpy(pred),
            torch.from_numpy(c2w),
            torch.from_numpy(K),
            torch.from_numpy(ori),
            torch.from_numpy(d),
            n_patches,
            (16, 16),
        )
        ours_loss, ours_target = distance_score_loss(
            jnp.asarray(pred), jnp.asarray(c2w), jnp.asarray(ori), jnp.asarray(d),
            jnp.ones(n, bool), jnp.asarray(n_patches),
        )
        np.testing.assert_allclose(np.asarray(ours_target), ref_target.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(ours_loss), float(ref_loss), rtol=1e-4)

    def test_padding_excluded(self):
        target = np.array([0.0, 0.0, 2.0], np.float32)
        rays = make_rays(target=target)
        c2w = look_at_c2w(target)
        scores = jnp.zeros(512)
        loss_a, tgt = distance_score_loss(
            scores, jnp.asarray(c2w), rays.ori, rays.dir, rays.valid, jnp.asarray(100)
        )
        assert np.asarray(tgt)[~np.asarray(rays.valid)].max() == 0.0
        assert np.isfinite(float(loss_a))

    def test_cam_up_loss(self):
        up = jnp.asarray([0.0, 1.0, 0.0])
        assert abs(float(cam_up_loss(up, up))) < 1e-6
        assert abs(float(cam_up_loss(up, -up)) - 1.0) < 1e-6


class TestSolver:
    def test_recovers_known_pose(self):
        cam_pos = np.array([0.0, 0.5, 3.0], np.float32)
        rays = make_rays(n=1024, n_valid=900, target=cam_pos)
        c2w = look_at_c2w(cam_pos)
        # score rays by the target function (the reference's eval-with-target
        # path, test.py:137-142)
        tgt = target_ray_scores(
            jnp.asarray(c2w), rays.ori, rays.dir, rays.valid, jnp.asarray(100)
        )
        # camera looks at origin with up +y: build gt rotation
        forward = -cam_pos / np.linalg.norm(cam_pos)  # cam -> object... w2c z row
        sol = solve_pose(tgt.target, rays.ori, rays.dir,
                         jnp.asarray([0.0, 1.0, 0.0]), rays.valid)
        center = np.asarray(sol.center)
        assert np.linalg.norm(center - cam_pos) < 0.1, center
        # watch dir points from object to camera
        wd = np.asarray(sol.watch_dir)
        assert np.dot(wd, -forward) > 0.95
        c2w_est = np.asarray(sol.c2w)
        assert np.isfinite(c2w_est).all()
        # camera z axis (third column of R_c2w) looks at the object
        assert np.dot(c2w_est[:3, 2], forward) > 0.9

    def test_nan_fallback_identity(self):
        # all scores equal on parallel rays -> singular LS -> NaN -> identity
        n = 256
        ori = np.tile(np.array([[1.0, 0, 0]], np.float32), (n, 1))
        d = np.tile(np.array([[0.0, 0, 1]], np.float32), (n, 1))
        sol = solve_pose(
            jnp.ones(n), jnp.asarray(ori), jnp.asarray(d),
            jnp.asarray([0.0, 1.0, 0.0]), jnp.ones(n, bool),
        )
        np.testing.assert_allclose(np.asarray(sol.c2w), np.eye(4), atol=1e-6)

    def test_duplicate_origin_dedup(self):
        """Duplicate-origin handling follows the reference exactly: the LAST
        flattened occurrence of a duplicated origin is dropped, earlier ones
        survive (torch.isin assume_unique sort-path semantics, test.py:157-162)."""
        cam_pos = np.array([1.0, 0.0, 2.0], np.float32)
        rays = make_rays(n=512, n_valid=500, target=cam_pos, seed=8)
        ori = np.asarray(rays.ori).copy()
        d = np.asarray(rays.dir).copy()
        # corrupt: two top-score rays share an origin and point garbage
        # (distinct coordinate values — equal coords WITHIN a row mark each
        # other as duplicates in torch's flattened isin, keeping both rays)
        ori[0] = ori[1] = [0.123, 4.56, -7.89]
        d[0] = [1.0, 0, 0]
        d[1] = [0, 1.0, 0]
        c2w = look_at_c2w(cam_pos)
        tgt = target_ray_scores(jnp.asarray(c2w), jnp.asarray(ori), jnp.asarray(d),
                                rays.valid, jnp.asarray(100))
        scores = np.asarray(tgt.target).copy()
        scores[0] = scores[1] = scores.max() * 10  # force into top-k (ranks 0, 1)
        sol = solve_pose(jnp.asarray(scores), jnp.asarray(ori), jnp.asarray(d),
                         jnp.asarray([0.0, 1.0, 0.0]), rays.valid)
        w = np.asarray(sol.topk_weights)
        assert w[0] > 0 and w[1] == 0, w[:2]  # first dup kept, last dropped
        assert np.isfinite(np.asarray(sol.c2w)).all()
        # one surviving garbage ray among 100 shifts but must not destroy the
        # solve (98 clean near-intersecting rays dominate the normal equations)
        assert np.linalg.norm(np.asarray(sol.center) - cam_pos) < 1.0

    def test_dedup_matches_reference_isin_semantics(self):
        """The duplicate-origin filter must replicate the reference's
        coordinate-level torch.isin(...).any(dim=1) mask exactly
        (/root/reference/pose_estimation/test.py:157-162), including the case
        where a duplicated-origin ray survives because one of its coordinates
        collides with a coordinate of a unique origin."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        k = 100
        n = 256
        ori = rng.normal(size=(n, 3)).astype(np.float32)
        # duplicated rows among the top-k
        ori[1] = ori[7]
        ori[3] = ori[9] = ori[12]
        # coordinate collision: ray 5 duplicates ray 6's row, but shares its
        # x-coordinate with the unique ray 20 -> the reference KEEPS 5 and 6
        ori[5] = ori[6]
        ori[5, 0] = ori[6, 0] = ori[20, 0]
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        scores = np.linspace(1.0, 0.01, n).astype(np.float32)  # topk = 0..k-1

        t_ori = torch.from_numpy(ori[:k])
        uniq, counts = torch.unique(t_ori, return_counts=True, dim=0)
        ref_mask = torch.isin(t_ori, uniq[counts == 1], assume_unique=True).any(dim=1)
        ref_mask = ref_mask.numpy()
        assert ref_mask[5] and ref_mask[6], "collision case should be kept"
        # torch's assume_unique sort path marks all but the LAST flattened
        # occurrence of a duplicated coordinate: first dup kept, last dropped
        assert ref_mask[1] and not ref_mask[7]
        assert ref_mask[3] and ref_mask[9] and not ref_mask[12]

        sol = solve_pose(jnp.asarray(scores), jnp.asarray(ori), jnp.asarray(d),
                         jnp.asarray([0.0, 1.0, 0.0]), jnp.ones(n, bool), k=k)
        ours = np.asarray(sol.topk_weights) > 0
        order = np.argsort(-scores[:k])  # top_k returns descending order
        np.testing.assert_array_equal(ours, ref_mask[order])

    def test_error_metrics(self):
        R = np.eye(3, dtype=np.float32)
        ang = float(angular_error_deg(jnp.asarray(R), jnp.asarray(R)))
        assert abs(ang) < 1e-3
        # 90 deg rotation about z
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        ang = float(angular_error_deg(jnp.asarray(R), jnp.asarray(Rz)))
        assert abs(ang - 90.0) < 1e-3
        te = float(translation_error(jnp.asarray([0.0, 0, 0]), jnp.asarray([3.0, 4.0, 0])))
        assert abs(te - 5.0) < 1e-6


class TestIdModule:
    def test_score_image_shapes_and_padding(self):
        dparams = dino.init_params(jax.random.key(10))
        iparams = init_id_module(jax.random.key(11))
        rng = np.random.default_rng(12)
        img = jnp.asarray(rng.uniform(size=(120, 160, 3)).astype(np.float32))
        mask = jnp.ones((120, 160), bool)
        rays = make_rays(n=256, n_valid=200)
        out = score_image(dparams, iparams, img, mask, rays)
        scores = np.asarray(out.scores)
        assert scores.shape == (256,)
        valid = np.asarray(rays.valid)
        np.testing.assert_allclose(scores[~valid], 0.0, atol=1e-12)
        assert scores[valid].sum() > 0
        # scores over valid rays sum to number of masked patches
        np.testing.assert_allclose(scores.sum(), float(out.n_patches), rtol=1e-4)
        up = np.asarray(out.cam_up)
        np.testing.assert_allclose(np.linalg.norm(up), 1.0, atol=1e-5)

    def test_ray_mlp_dims(self):
        from sixdgs_tpu.pose.modules import init_ray_mlp

        params = init_ray_mlp(jax.random.key(13))
        assert params["l1"]["w"].shape == (RAY_IN_DIM, 512)
        assert RAY_IN_DIM == 141  # 3*3 + 2*(8*3 + 8*3 + 6*3)
        out = ray_mlp_apply(params, jnp.zeros((7, 3)), jnp.zeros((7, 3)), jnp.zeros((7, 3)))
        assert out.shape == (7, 384)


class TestSuperPointBackbone:
    """backbone_type="superpoint" (identification_module.py:11-15,
    backbone.py:14-22): 28x28 grid, 256-dim descriptors, same
    resize-256/crop-224/ImageNet preprocessing."""

    def test_score_image_superpoint(self):
        from sixdgs_tpu.pose import superpoint as sp
        from sixdgs_tpu.pose.id_module import score_image
        from sixdgs_tpu.rays.engine import Rays

        rng = np.random.default_rng(31)
        sp_params = sp.init_params(jax.random.key(1))
        id_params = modules.init_id_module(jax.random.key(2), feature_dim=256,
                                           grid=28)
        n = 128
        rays = Rays(
            ori=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            dir=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            rgb=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
            valid=jnp.ones(n, bool), gaussian_idx=jnp.zeros(n, jnp.int32))
        img = jnp.asarray(rng.uniform(size=(240, 300, 3)).astype(np.float32))
        mask = jnp.ones((240, 300), bool)
        out = score_image(sp_params, id_params, img, mask, rays,
                          backbone="superpoint")
        assert out.attention.shape == (784, n)
        assert int(out.n_patches) == 784
        # softmax rows over all-valid rays: scores sum to n_patches
        np.testing.assert_allclose(float(out.scores.sum()), 784.0, rtol=1e-4)
        assert np.isfinite(np.asarray(out.cam_up)).all()

    def test_cam_up_28_matches_reference_head(self):
        """Generalized 28-grid cam-up head == the reference
        CameraDirectionPredictor(256, (28, 28)) with copied weights (the
        residual 13x13 spatial flatten must match view(B, -1) order)."""
        torch = pytest.importorskip("torch")
        if REF not in sys.path:
            sys.path.insert(0, REF)
        from pose_estimation.camera_direction_network import (
            CameraDirectionPredictor,
        )

        rng = np.random.default_rng(32)
        d = 256
        params = modules.init_cam_up(jax.random.key(5), channels=d, grid=28)
        cam = CameraDirectionPredictor(d, (28, 28))

        def t(x):
            return torch.from_numpy(np.asarray(x, np.float32))

        for i, p in enumerate(params["conv1"]):
            cam.dim_reducer1[2 * i].weight.data = t(p["w"])
            cam.dim_reducer1[2 * i].bias.data = t(p["b"])
        cam.dim_reducer2[0].weight.data = t(params["conv2"][0]["w"])
        cam.dim_reducer2[0].bias.data = t(params["conv2"][0]["b"])
        cam.mlp[0].weight.data = t(params["mlp1"]["w"]).T.contiguous()
        cam.mlp[0].bias.data = t(params["mlp1"]["b"])
        cam.mlp[2].weight.data = t(params["mlp2"]["w"]).T.contiguous()
        cam.mlp[2].bias.data = t(params["mlp2"]["b"])

        fmap = rng.normal(size=(d, 28, 28)).astype(np.float32) * 0.2
        with torch.no_grad():
            ref = cam(torch.from_numpy(fmap)).numpy()
        ours = np.asarray(modules.cam_up_apply(params, jnp.asarray(fmap)))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
