"""End-to-end pose pipeline test on a synthetic scene.

Covers the full chain: GaussianScene -> ray generation -> id-module scoring ->
distance loss -> Adafactor training -> pose solve -> error metrics, with a
tiny random-weight ViT (pose accuracy from *predicted* scores needs trained
DINO features; the target-score path — the reference's own train-time
validation mode, test.py:137-142 — validates the geometry end-to-end).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.pose import dino
from sixdgs_tpu.pose.evaluate import eval_image
from sixdgs_tpu.pose.evaluate import test_pose_estimation as run_pose_eval
from sixdgs_tpu.pose.modules import init_id_module
from sixdgs_tpu.pose.trainer import PoseTrainer, model_up_from_cameras
from sixdgs_tpu.rays.engine import generate_rays_from_scene
from sixdgs_tpu.scene.gaussians import from_arrays
from sixdgs_tpu.scene.structures import CameraInfo
from sixdgs_tpu.utils.config import PoseEstimationConfig

SIZE = 64
FOV = 0.9


def make_gt_scene(n=300, seed=0):
    rng = np.random.default_rng(seed)
    arrs = {
        "xyz": (rng.normal(size=(n, 3)) * 0.6).astype(np.float32),
        "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": np.zeros((n, 15, 3), np.float32),
        "opacity": rng.uniform(1.0, 3.0, size=(n, 1)).astype(np.float32),
        "scaling": rng.uniform(-2.6, -2.0, size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    cap = 1 << (n - 1).bit_length()
    return from_arrays(arrs, max_sh_degree=3, capacity=max(cap, 128))


def make_camera_infos(scene, n=8, radius=1.8):
    """Ring of cameras looking at the origin; images rendered with our own
    renderer so the pipeline is self-consistent."""
    from sixdgs_tpu.train.gs_trainer import render_eval

    infos = []
    bg = jnp.ones(3)
    for i in range(n):
        ang = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(ang), 0.4, radius * np.sin(ang)])
        z = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z], axis=0)
        T = -R_w2c @ pos
        from sixdgs_tpu.scene.cameras import make_synthetic_camera

        cam = make_synthetic_camera(SIZE, SIZE, FOV, FOV, R_w2c.T, T)
        img = np.asarray(render_eval(scene, cam, bg, sh_degree=3, chunk=128))
        img_u8 = (np.clip(np.transpose(img, (1, 2, 0)), 0, 1) * 255).astype(np.uint8)
        infos.append(
            CameraInfo(
                uid=i, R=R_w2c.T, T=T, FovY=FOV, FovX=FOV,
                image=img_u8, image_path="", image_name=f"cam{i}",
                width=SIZE, height=SIZE,
            )
        )
    return infos


@pytest.fixture(scope="module")
def setup():
    scene = make_gt_scene()
    infos = make_camera_infos(scene)
    cfg = PoseEstimationConfig(
        gradient_accumulation_steps=4, ray_budget=8192, max_ellipsoids=300,
    )
    rays = generate_rays_from_scene(scene, jax.random.key(7), cfg)
    dparams = dino.init_params(jax.random.key(1), embed_dim=64, depth=2)
    iparams = init_id_module(jax.random.key(2), feature_dim=64)
    return scene, infos, cfg, rays, dparams, iparams


class TestPoseE2E:
    def test_solver_chain_with_target_scores(self, setup):
        """The reference's eval-with-target mode must recover poses well."""
        scene, infos, cfg, rays, dparams, iparams = setup
        model_up = jnp.asarray(model_up_from_cameras(infos))
        results, t_err, a_err, loss, recall, t_per_img = run_pose_eval(
            infos[:4], dparams, iparams, rays, model_up, use_target_scores=True,
        )
        assert len(results) == 4
        # cameras sit at radius 1.8; far better than chance (dilution along the
        # ray-cone axis bounds accuracy; the reference's unweighted LS has the
        # same property)
        assert t_err < 0.6, t_err
        assert np.isfinite(a_err)
        assert 0 <= recall <= 1

    def test_prediction_path_runs(self, setup):
        scene, infos, cfg, rays, dparams, iparams = setup
        img, mask = np.array(infos[0].image).astype(np.float32) / 255.0, np.ones((SIZE, SIZE), bool)
        out = eval_image(
            dparams, iparams, jnp.asarray(img), jnp.asarray(mask),
            jnp.asarray(infos[0].c2w()), rays,
        )
        assert np.isfinite(float(out["loss_score"]))
        assert np.asarray(out["c2w"]).shape == (4, 4)

    def test_training_reduces_loss(self, setup):
        scene, infos, cfg, rays, dparams, iparams = setup
        trainer = PoseTrainer(dparams, iparams, scene, infos, cfg, seed=1)
        losses = []
        trainer.run(
            n_iterations=30, log_every=5,
            callback=lambda it, aux, tr: losses.append(float(aux["loss"])),
        )
        assert len(losses) >= 4
        assert losses[-1] < losses[0], losses
        assert all(np.isfinite(l) for l in losses)

    def test_pose_recovery_from_predicted_scores(self, setup):
        """The paper's headline capability, CI-scale: training the id-module
        must make POSES RECOVERABLE FROM PREDICTED SCORES (no
        use_target_scores anywhere) — translation/angular error far better
        than the untrained module and approaching the target-score solve
        (/root/reference/pretrain_eval_attention.py:200-248, test.py:85-142).

        Calibrated on this synthetic scene (cameras at radius 1.8):
        untrained t_err ~1.93 / a_err ~112 deg / recall ~0.005; after 100
        iterations t_err ~0.80 / a_err ~28 deg / recall ~0.42; target-score
        solve t_err ~0.20."""
        scene, infos, cfg, rays, dparams, iparams = setup
        cfg_train = PoseEstimationConfig(
            gradient_accumulation_steps=8, ray_budget=8192, max_ellipsoids=300,
        )
        trainer = PoseTrainer(dparams, iparams, scene, infos, cfg_train, seed=1)
        trainer._regen_rays()
        eval_rays = trainer.rays
        model_up = jnp.asarray(model_up_from_cameras(infos))

        _, t_untrained, a_untrained, _, r_untrained, _ = run_pose_eval(
            infos, dparams, iparams, eval_rays, model_up,
            use_target_scores=False,
        )
        trainer.run(n_iterations=100, validate_every=0)
        _, t_trained, a_trained, _, r_trained, _ = run_pose_eval(
            infos, dparams, trainer.id_params, eval_rays, model_up,
            use_target_scores=False,
        )
        _, t_target, _, _, _, _ = run_pose_eval(
            infos, dparams, iparams, eval_rays, model_up,
            use_target_scores=True,
        )
        assert t_trained < 0.6 * t_untrained, (t_trained, t_untrained)
        assert a_trained < 0.6 * a_untrained, (a_trained, a_untrained)
        assert r_trained > 0.15 > r_untrained, (r_trained, r_untrained)
        # approaches the target-score solve (same order of magnitude)
        assert t_trained < 6.0 * t_target, (t_trained, t_target)
        # ABSOLUTE plateau pins (seed-locked; calibrated ~0.80 / ~28 deg /
        # ~0.42 at 100 iters on this scene) so a solver/trainer regression
        # moves a number CI sees, not just the relative ratios
        assert t_trained < 0.95, t_trained
        assert a_trained < 45.0, a_trained
        assert r_trained > 0.30, r_trained

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        scene, infos, cfg, rays, dparams, iparams = setup
        trainer = PoseTrainer(dparams, iparams, scene, infos, cfg, seed=2)
        p = str(tmp_path / "id_module.npz")
        trainer.save_checkpoint(p, epoch=42)
        params, epoch = PoseTrainer.load_checkpoint(p, iparams)
        assert epoch == 42
        chex = pytest.importorskip("chex")
        chex.assert_trees_all_close(params, trainer.id_params)

    def test_full_resume_restores_optimizer_state(self, setup, tmp_path):
        """The checkpoint must carry Adafactor state + running_loss like the
        reference's id_module.th (/root/reference/pose_estimation/train.py:309-317):
        a resumed run continues bit-identically with a fresh-object run that
        never stopped."""
        scene, infos, cfg, rays, dparams, iparams = setup
        chex = pytest.importorskip("chex")

        # 3 iterations, checkpoint, restore into a NEW trainer
        tr_b = PoseTrainer(dparams, iparams, scene, infos, cfg, seed=2)
        tr_b.run(n_iterations=3, validate_every=0)
        p = str(tmp_path / "id_module.npz")
        tr_b.save_checkpoint(p, epoch=3)
        tr_c = PoseTrainer(dparams, iparams, scene, infos, cfg, seed=2)
        start = tr_c.restore_checkpoint(p)
        assert start == 3
        assert tr_c.running_loss == pytest.approx(tr_b.running_loss)
        chex.assert_trees_all_close(tr_c.opt_state, tr_b.opt_state)
        chex.assert_trees_all_close(tr_c.id_params, tr_b.id_params)

        # Adafactor's step count resumed (NOT restarted): the relative step
        # size schedule min(1e-2, 1/sqrt(t)) continues from t=3, and further
        # training moves the params
        before = jax.tree.map(lambda x: np.asarray(x).copy(), tr_c.id_params)
        tr_c.run(n_iterations=6, start_iteration=start, validate_every=0)
        counts = [np.asarray(x) for x in jax.tree.leaves(tr_c.opt_state)
                  if np.asarray(x).ndim == 0 and np.issubdtype(np.asarray(x).dtype, np.integer)]
        assert any(int(c) == 6 for c in counts), counts
        moved = any(
            not np.allclose(np.asarray(a), b)
            for a, b in zip(jax.tree.leaves(tr_c.id_params), jax.tree.leaves(before))
        )
        assert moved


class TestValidateBackboneDispatch:
    def test_validate_uses_trainer_backbone(self, setup):
        """Regression: validate() must forward backbone=self.backbone — with
        superpoint params it used to default to the DINO forward and crash
        with KeyError 'patch_embed' (the round-4 pose-stage artifact run died
        here on its second backbone pass)."""
        from sixdgs_tpu.pose import superpoint as sp_mod

        scene, infos, cfg, rays, dparams, iparams = setup
        sp_params = sp_mod.init_params(jax.random.key(3))
        ip = init_id_module(jax.random.key(4), feature_dim=256, grid=28)
        tr = PoseTrainer(sp_params, ip, scene, infos[:2], cfg, seed=5,
                         backbone="superpoint")
        tr.rays = rays
        out = tr.validate(0, max_images=1)
        assert np.isfinite(out["train_imgs"]["translation_error"])
