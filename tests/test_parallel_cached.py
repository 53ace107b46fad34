"""Sharded cached-feature pose step vs single device."""

import numpy as np
import jax
import jax.numpy as jnp

from sixdgs_tpu.parallel.mesh import make_mesh
from sixdgs_tpu.parallel.pose_sharding import (
    make_sharded_pose_step_cached,
    shard_feature_inputs,
)
from sixdgs_tpu.pose.modules import init_id_module
from sixdgs_tpu.pose.trainer import (
    FeatureBatch,
    make_adafactor,
    pose_train_step_cached,
)
from tests.test_parallel import make_inputs


def make_feature_batch(B=4, D=64, seed=0):
    rng = np.random.default_rng(seed)
    _, rays = make_inputs(B=B, seed=seed)
    c2ws = []
    for _ in range(B):
        pos = rng.normal(size=3) * 2
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, pos
        c2ws.append(m)
    fb = FeatureBatch(
        feats_pe=jnp.asarray(rng.normal(size=(B, 256, D + 14)).astype(np.float32)),
        patch_mask=jnp.asarray(rng.uniform(size=(B, 256)) > 0.3),
        fmap=jnp.asarray(rng.normal(size=(B, D, 16, 16)).astype(np.float32)),
        c2w=jnp.asarray(np.stack(c2ws)),
    )
    return fb, rays


def test_sharded_cached_matches_single():
    mesh = make_mesh(8)
    iparams = init_id_module(jax.random.key(0), feature_dim=64)
    fb, rays = make_feature_batch()
    up = jnp.asarray([0.0, 1.0, 0.0])
    opt = make_adafactor()

    p1 = jax.tree.map(jnp.array, iparams)
    s1 = opt.init(p1)
    p1, s1, aux1 = pose_train_step_cached(p1, s1, fb, rays, up, optimizer=opt)

    p2 = jax.tree.map(jnp.array, iparams)
    s2 = opt.init(p2)
    step = make_sharded_pose_step_cached(mesh, opt)
    sfb, sr = shard_feature_inputs(mesh, fb, rays)
    p2, s2, aux2 = step(p2, s2, sfb, sr, up)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux2["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1.5e-3, rtol=5e-3)
