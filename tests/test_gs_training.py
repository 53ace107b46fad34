"""Integration test: 3DGS training on a miniature synthetic scene.

Builds a ground-truth Gaussian scene, renders GT images from a ring of
cameras with our own renderer, then trains a fresh scene from a random point
cloud and asserts the photometric loss/PSNR improves substantially.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sixdgs_tpu.scene.cameras import make_synthetic_camera
from sixdgs_tpu.scene.gaussians import from_arrays
from sixdgs_tpu.scene.structures import BasicPointCloud, SceneInfo
from sixdgs_tpu.train.gs_trainer import (
    GSTrainer,
    densify_event,
    init_train_state,
    render_eval,
    reset_opacity,
    train_step,
    camera_arrays,
    lr_dict,
)
from sixdgs_tpu.utils.config import ModelConfig, OptimizationConfig


def ring_cameras(n=6, radius=4.0, size=32, fov=0.9):
    cams = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        # camera at radius looking at origin
        pos = np.array([radius * np.cos(ang), 0.3, radius * np.sin(ang)])
        forward = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        true_up = np.cross(forward, right)
        R_w2c = np.stack([right, true_up, forward], axis=0)  # rows = cam axes
        t = -R_w2c @ pos
        cams.append(make_synthetic_camera(size, size, fov, fov, R_w2c.T, t, name=f"c{i}"))
    return cams


def true_scene(n=60, seed=3):
    rng = np.random.default_rng(seed)
    arrs = {
        "xyz": (rng.normal(size=(n, 3)) * 0.5).astype(np.float32),
        "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": np.zeros((n, 15, 3), np.float32),
        "opacity": rng.uniform(1.0, 3.0, size=(n, 1)).astype(np.float32),
        "scaling": rng.uniform(-2.2, -1.4, size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    return from_arrays(arrs, max_sh_degree=3, capacity=64)


@pytest.fixture(scope="module")
def synthetic_dataset():
    cams = ring_cameras()
    gt = true_scene()
    bg = jnp.zeros(3)
    rendered = []
    for cam in cams:
        img = render_eval(gt, cam, bg, sh_degree=3, chunk=64)
        rendered.append(
            cam.__class__(**{**cam.__dict__, "image": np.asarray(jnp.clip(img, 0, 1))})
        )
    return rendered


def make_scene_info(cams, n_pts=150, seed=5):
    rng = np.random.default_rng(seed)
    pcd = BasicPointCloud(
        points=rng.normal(size=(n_pts, 3)) * 0.5,
        colors=rng.uniform(size=(n_pts, 3)),
        normals=np.zeros((n_pts, 3)),
    )
    from sixdgs_tpu.scene.structures import get_nerfpp_norm

    infos = []
    return SceneInfo(pcd, [], [], {"radius": 4.0, "translate": np.zeros(3)}, "")


class TestTrainStep:
    def test_loss_decreases(self, synthetic_dataset):
        cams = synthetic_dataset
        info = make_scene_info(cams)
        model_cfg = ModelConfig(sh_degree=3)
        opt_cfg = OptimizationConfig(
            iterations=150,
            densify_from_iter=40,
            densification_interval=50,
            densify_until_iter=120,
            opacity_reset_interval=10_000,
        )
        trainer = GSTrainer(model_cfg, opt_cfg, info, cams[:5], cams[5:],
                            capacity_bucket=256)
        losses = []
        trainer.run(
            iterations=150,
            log_every=10,
            callback=lambda it, m, tr: losses.append(float(m["loss"])),
            chunk=64,
        )
        assert losses[-1] < losses[0] * 0.55, losses
        psnr_val, _ = trainer.eval_psnr(chunk=64)
        assert psnr_val > 14.0, psnr_val

    def test_densify_grows_and_prunes(self, synthetic_dataset):
        cams = synthetic_dataset
        info = make_scene_info(cams, n_pts=50)
        trainer = GSTrainer(
            ModelConfig(), OptimizationConfig(), info, cams, [], capacity_bucket=128
        )
        # run a few steps to accumulate stats
        for it in range(1, 6):
            trainer.state, _ = train_step(
                trainer.state,
                camera_arrays(cams[it % len(cams)]),
                trainer.bg,
                lr_dict(trainer.opt, trainer.spatial_lr_scale, it),
                width=32, height=32, sh_degree=0, chunk=64,
            )
        n_before = int(trainer.state.scene.num_active())
        state = densify_event(
            trainer.state,
            max_grad=1e-9,  # force clone/split of everything visible
            min_opacity=0.005,
            extent=trainer.cameras_extent,
            max_screen_size=None,
            percent_dense=0.01,
            rng=np.random.default_rng(0),
            capacity_bucket=128,
        )
        n_after = int(state.scene.num_active())
        assert n_after > n_before
        # prune-everything event
        state2 = densify_event(
            trainer.state,
            max_grad=1e9,
            min_opacity=0.999,  # prunes all (opacity ~0.1)
            extent=trainer.cameras_extent,
            max_screen_size=None,
            percent_dense=0.01,
            rng=np.random.default_rng(0),
            capacity_bucket=128,
        )
        assert int(state2.scene.num_active()) == 0

    def test_reset_opacity(self, synthetic_dataset):
        cams = synthetic_dataset
        info = make_scene_info(cams, n_pts=30)
        trainer = GSTrainer(
            ModelConfig(), OptimizationConfig(), info, cams, [], capacity_bucket=64
        )
        state = reset_opacity(trainer.state)
        op = np.asarray(state.scene.get_opacity)
        active = np.asarray(state.scene.active)
        assert (op[active] <= 0.01 + 1e-5).all()
        assert (np.asarray(state.adam.m["opacity"]) == 0).all()

    def test_adam_bias_correction_matches_torch(self):
        torch = pytest.importorskip("torch")
        from sixdgs_tpu.train.optim import adam_init, adam_update

        rng = np.random.default_rng(9)
        p0 = rng.normal(size=(5, 3)).astype(np.float32)
        params = {"xyz": jnp.asarray(p0)}
        state = adam_init(params)
        tparam = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = torch.optim.Adam([tparam], lr=0.01, eps=1e-15)
        for i in range(5):
            g = rng.normal(size=(5, 3)).astype(np.float32)
            params, state = adam_update(
                params, {"xyz": jnp.asarray(g)}, state, {"xyz": jnp.asarray(0.01)}
            )
            tparam.grad = torch.from_numpy(g.copy())
            topt.step()
        np.testing.assert_allclose(
            np.asarray(params["xyz"]), tparam.detach().numpy(), atol=1e-5
        )


class TestSaveOrdering:
    def test_save_precedes_opacity_reset(self, synthetic_dataset, tmp_path):
        """A save iteration that coincides with opacity_reset_interval must
        persist the PRE-reset opacities (reference order: train.py:148-150
        saves before the densify/reset block at :153-179). Regression: the
        saved PLY used to contain the freshly reset <=0.01 opacities,
        collapsing reloaded renders to ~8 dB."""
        import jax.nn
        from sixdgs_tpu.scene.gaussians import load_ply

        cams = synthetic_dataset
        info = make_scene_info(cams)
        opt_cfg = OptimizationConfig(
            iterations=6, densify_from_iter=100, opacity_reset_interval=6,
        )
        trainer = GSTrainer(ModelConfig(), opt_cfg, info, cams, [],
                            capacity_bucket=256)
        trainer.run(iterations=6, save_iterations=(6,),
                    model_path=str(tmp_path), chunk=64)
        ply = str(tmp_path / "point_cloud" / "iteration_6" / "point_cloud.ply")
        scene = load_ply(ply, max_sh_degree=3)
        saved_op = np.asarray(jax.nn.sigmoid(scene.opacity))
        assert saved_op.max() > 0.011, "saved PLY contains reset opacities"
        # the in-memory state HAS been reset after the save
        live_op = np.asarray(jax.nn.sigmoid(trainer.state.scene.opacity))
        assert live_op.max() <= 0.011


class TestAdaptiveTiers:
    def test_truncation_widens_a_tier(self, synthetic_dataset, capsys):
        """With starved binning budgets and a tiny adapt interval, the
        trainer must detect the truncation ratio and widen a tier
        (converging toward the CUDA reference's uncapped binning). Which
        tier is targeted depends on per-tier dropped-area telemetry."""
        cams = synthetic_dataset
        info = make_scene_info(cams)
        opt_cfg = OptimizationConfig(iterations=4, densify_from_iter=100)
        trainer = GSTrainer(ModelConfig(), opt_cfg, info, cams, [],
                            capacity_bucket=256)
        trainer.run(iterations=4, chunk=64, rasterizer="tiled",
                    tiers=(1, 4, 2, 2, 4), adapt_tiers_every=2,
                    adapt_drop_threshold=1e-4)
        out = capsys.readouterr().out
        assert "widening tiers" in out, out
        assert "(1, 4, 2, 2, 4) ->" in out, out

    def test_widen_tiers_targets_dominant_tier(self):
        """The widening decision targets the tier that dropped the most
        area, falls through past capped tiers, and returns None when every
        truncating tier is at its cap (the round-3 mid-only policy plateaued
        at ~20% truncation on main-tier-starved scenes)."""
        from sixdgs_tpu.train.gs_trainer import widen_tiers

        base = (16, 4096, 64, 256, 1024)
        assert widen_tiers(base, 100.0, 1.0, 0.0) == (32, 4096, 64, 256, 1024)
        assert widen_tiers(base, 1.0, 100.0, 0.0) == (16, 4096, 128, 256, 1024)
        assert widen_tiers(base, 0.0, 0.0, 100.0) == (16, 4096, 64, 256, 2048)
        # mid t_max_mid capped -> widen mid_k instead
        assert widen_tiers((16, 4096, 256, 256, 1024), 0.0, 100.0, 0.0) == (
            16, 8192, 256, 256, 1024)
        # main capped -> fall through to the next-largest dropping tier
        assert widen_tiers((128, 4096, 64, 256, 1024), 100.0, 5.0, 1.0) == (
            128, 4096, 128, 256, 1024)
        # everything capped -> no change
        assert widen_tiers((128, 16384, 256, 1024, 4096),
                           100.0, 100.0, 100.0) is None
        # a tier with zero drop is never the target
        assert widen_tiers(base, 0.0, 0.0, 0.0) is None

    def test_narrow_tiers_halves_main_when_safe(self):
        """t_max narrowing: halve the main slot budget only when everything
        that would then overflow fits in the tier tables (0.31 occupancy
        hysteresis, mirroring the nc_pairs shrink), the saved slots pay for
        the retrace, and the displaced footprints fit the mid budget."""
        from sixdgs_tpu.train.gs_trainer import narrow_tiers

        base = (16, 4096, 64, 256, 1024)
        # 131k gaussians, few large footprints -> narrow
        assert narrow_tiers(base, 100, 131072) == (8, 4096, 64, 256, 1024)
        # demand at/above 31% of mid+giant capacity -> keep
        assert narrow_tiers(base, int(0.31 * (4096 + 256)) + 1, 131072) is None
        # too few points: the halving would not pay for the recompile
        assert narrow_tiers(base, 100, 6000) is None
        # floor: never below t_max = 4
        assert narrow_tiers((4, 4096, 64, 256, 1024), 0, 1 << 20) is None
        # displaced gaussians must fit the mid budget (t_max//2 <= t_max_mid)
        assert narrow_tiers((128, 4096, 32, 256, 1024), 0, 1 << 20) is None
        # exactly at the slot-savings gate boundary
        assert narrow_tiers(base, 0, (1 << 18) // 8) == (
            8, 4096, 64, 256, 1024)

    def test_binning_saturation_narrow_demand(self):
        """narrow_demand counts visible gaussians whose footprint exceeds
        t_max // 2 — the trainer's main-tier narrowing signal."""
        import jax.numpy as jnp
        from sixdgs_tpu.ops.rasterizer.tiles import binning_saturation

        # 3 gaussians on a 8x8-tile screen (tile=16 px): radii give rect
        # areas ~1 (stays), ~9 (> t_max//2 = 4), and one invisible giant
        means2d = jnp.asarray([[64.0, 64.0], [64.0, 64.0], [64.0, 64.0]])
        radii = jnp.asarray([1.0, 20.0, 120.0])
        vis = jnp.asarray([True, True, False])
        sat = binning_saturation(means2d, radii, vis, 8, 8, 16, t_max=8,
                                 overflow_k=2, mid_k=2)
        assert int(sat["narrow_demand"]) == 1


class TestAdaptiveNcPairs:
    def test_saturated_compact_budget_widens(self, synthetic_dataset, capsys,
                                             monkeypatch):
        """When emitted pairs exceed 90% of the compact nc_pairs budget, the
        trainer must widen it (saturation is otherwise SILENT: the sorted-key
        slice drops whole tiles and the backward drops the step's
        gradients)."""
        from sixdgs_tpu.ops.rasterizer import pallas_tiles

        cams = synthetic_dataset
        info = make_scene_info(cams)
        opt_cfg = OptimizationConfig(iterations=4, densify_from_iter=100)
        trainer = GSTrainer(ModelConfig(), opt_cfg, info, cams, [],
                            capacity_bucket=256)
        # starve the default budget so the tiny scene saturates it
        monkeypatch.setattr(pallas_tiles, "DEFAULT_NC", 128)
        trainer.run(iterations=4, chunk=64, rasterizer="pallas_interpret",
                    adapt_tiers_every=2, adapt_drop_threshold=0.9)
        out = capsys.readouterr().out
        # widening catches up with the EXACT aligned demand in one retrace
        # (the rasterizer's in-graph nc_demand telemetry, round 5) instead
        # of one doubling per adaptation interval
        assert "widening nc_pairs -> " in out, out
        import re

        new_budget = int(re.search(r"widening nc_pairs -> (\d+)", out).group(1))
        demand = int(re.search(r"compact-pair demand (\d+)", out).group(1))
        assert new_budget >= demand, out

    def test_slack_compact_budget_shrinks(self, synthetic_dataset, capsys,
                                          monkeypatch):
        """When real emission falls below 31% of the compact budget, the
        trainer shrinks it back toward 1.6x the real count (floored at 2^18)
        — every per-pair glue cost scales with the static budget — and the
        hysteresis band (shrink <31%, widen >90%) prevents oscillation."""
        from sixdgs_tpu.ops.rasterizer import pallas_tiles

        cams = synthetic_dataset
        info = make_scene_info(cams)
        opt_cfg = OptimizationConfig(iterations=4, densify_from_iter=100)
        trainer = GSTrainer(ModelConfig(), opt_cfg, info, cams, [],
                            capacity_bucket=256)
        # inflate the default budget far past the tiny scene's real emission
        monkeypatch.setattr(pallas_tiles, "DEFAULT_NC", 1 << 19)
        trainer.run(iterations=4, chunk=64, rasterizer="pallas_interpret",
                    adapt_tiers_every=2, adapt_drop_threshold=0.9)
        out = capsys.readouterr().out
        assert "shrinking nc_pairs -> 262144" in out, out
        # the floor (2^18) is not itself shrinkable: exactly one shrink
        assert out.count("shrinking nc_pairs") == 1, out
