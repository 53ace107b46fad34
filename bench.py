"""Headline benchmark: single-image 6DoF pose estimation latency on one chip.

Measures the full jitted test_image path — DINOv2-S/14 forward + ray-MLP over
the full ray budget + patches x rays attention scoring + top-100 solve +
pose assembly (the reference's per-image eval loop,
/root/reference/pose_estimation/test.py:46-218, which it times at
test.py:304-311). North-star target: <= 50 ms/image on one TPU v5e
(BASELINE.md). Prints ONE JSON line; besides the headline metric it carries
per-kernel roofline accounting (achieved FLOP/s vs MXU peak for the fused
attention kernel, achieved HBM GB/s vs peak for the compositing kernels) and
the 3DGS train-step time at Mip-360 scale.

TIMING LAW (VERDICT r4 weak #1): every number here goes through CHAINED
timing (tools/tputime.py) — each step's input data-depends on the previous
step's output and a scalar of the final output is host-fetched inside the
timed region. Over the axon tunnel ``jax.block_until_ready`` can return
before device execution finishes; the round-4 bench used a loop of
same-args re-invocations with one final sync and recorded physically
impossible numbers (fwd 30.7 ms > fwd+bwd 7.9 ms). A ``consistency`` block
in the JSON self-checks fwd<=fwd+bwd per mode and stage-sum-vs-composed-step
agreement, and ``--selftest`` exits nonzero on >30% disagreement so a timing
regression can never silently poison a round artifact again.
"""

import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from tputime import chained_call_ms  # noqa: E402

# TPU v5e (1 chip) roofline constants
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 49.2e12  # MXU f32 ~= bf16/4
V5E_HBM_GBPS = 819.0


def _fetch(out):
    """Hard host sync: fetch a tiny data-dependent piece of ``out``.

    jax.block_until_ready is not a reliable fence on the tunneled (axon)
    backend; a 1-element device_get of a value derived from the output
    cannot lie."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def bench_pose(n_rays=32768, fused_only=False):
    """Headline: full single-image pose path, fused vs unfused (chained)."""
    from sixdgs_tpu.pose import dino
    from sixdgs_tpu.pose.evaluate import eval_image
    from sixdgs_tpu.pose.modules import init_id_module
    from sixdgs_tpu.rays.engine import Rays

    rng = np.random.default_rng(0)
    dino_params = dino.init_params(jax.random.key(0))
    id_params = init_id_module(jax.random.key(1))
    ori = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays(
        ori=jnp.asarray(ori),
        dir=jnp.asarray(d),
        rgb=jnp.asarray(rng.uniform(size=(n_rays, 3)).astype(np.float32)),
        valid=jnp.asarray(np.ones(n_rays, bool)),
        gaussian_idx=jnp.zeros(n_rays, jnp.int32),
    )
    img = jnp.asarray(rng.uniform(size=(800, 800, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((800, 800), bool))
    c2w = jnp.asarray(np.eye(4, dtype=np.float32))

    def run(fused):
        # chain on the image: the whole per-image path re-runs every step
        return chained_call_ms(
            functools.partial(eval_image, fused_attention=fused),
            dino_params, id_params, img, mask, c2w, rays, chain_arg=2)

    if fused_only:
        return run(True), (id_params, rays), None
    ms = run(False)
    fused_error = None
    try:
        ms = min(ms, run(True))
    except Exception as e:
        # record loudly: a broken Pallas attention kernel must not silently
        # report the unfused time as the headline (VERDICT r2 weak #6)
        fused_error = f"{type(e).__name__}: {e}"[:160]
    return ms, (id_params, rays), fused_error


def bench_attention_kernel(id_params, rays, n_patches=256, d=384):
    """Fused attention-score kernel roofline per MXU precision mode: nominal
    FLOPs are the k-projection (2*N*d^2, twice: two streaming passes) and
    the QK^T logits (2*P*N*d, twice); bf16_split3 issues 3 bf16 passes per
    nominal matmul, plain bf16 one."""
    from sixdgs_tpu.ops.attention_kernel import attention_scores_fused

    rng = np.random.default_rng(3)
    n_rays = rays.ori.shape[0]
    q = jnp.asarray(rng.normal(size=(n_patches, d)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(n_rays, d)).astype(np.float32))
    att = id_params["attention"]
    pmask = jnp.ones(n_patches, bool)
    valid = rays.valid
    flops = 2 * (2 * n_rays * d * d + 2 * n_patches * n_rays * d)

    out = {}
    for mode in ("f32", "bf16_split3", "bf16"):
        ms = chained_call_ms(
            functools.partial(attention_scores_fused, mode=mode),
            q, feats, att["k"]["w"], att["k"]["b"], pmask, valid,
            chain_arg=1)
        tflops = flops / (ms * 1e-3) / 1e12
        out[mode] = {
            "ms": round(ms, 3),
            "tflops": round(tflops, 2),
            "mfu_f32": round(tflops * 1e12 / V5E_PEAK_F32_FLOPS, 3),
            "mfu_bf16_peak": round(tflops * 1e12 / V5E_PEAK_BF16_FLOPS, 3),
        }
    # headline fields = the default mode (bf16_split3)
    return {**out["bf16_split3"], "modes": out}


def bench_attention_131k(id_params, n_rays=131072, n_patches=256, d=384):
    """Fused attention at the Mip-360 stress ray budget: fwd AND fwd+bwd per
    MXU precision mode (VERDICT r3 #6), chained on the ray features."""
    from sixdgs_tpu.ops.attention_kernel import attention_scores_fused

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(n_patches, d)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(n_rays, d)).astype(np.float32))
    att = id_params["attention"]
    pmask = jnp.ones(n_patches, bool)
    valid = jnp.ones(n_rays, bool)
    wk, bk = att["k"]["w"], att["k"]["b"]

    out = {}
    for mode in ("f32", "bf16_split3", "bf16"):
        ms_f = chained_call_ms(
            functools.partial(attention_scores_fused, mode=mode),
            q, feats, wk, bk, pmask, valid, chain_arg=1)

        def fb(q_, feats_, wk_, bk_, _mode=mode):
            def loss(q__, f__, wk__, bk__):
                return jnp.sum(attention_scores_fused(
                    q__, f__, wk__, bk__, pmask, valid, mode=_mode))

            return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                q_, feats_, wk_, bk_)

        ms_fb = chained_call_ms(fb, q, feats, wk, bk, chain_arg=1)
        out[mode] = {"fwd_ms": round(ms_f, 3), "fwd_bwd_ms": round(ms_fb, 3)}
    return out


def bench_raster_stages(P=131072, W=1232, H=816):
    """Per-stage raster breakdown (chained timing) so each round's BENCH
    JSON shows where the train-step time lives (VERDICT r3 #6)."""
    import profile_raster as PR

    from sixdgs_tpu.ops.rasterizer.projection import project_gaussians
    from sixdgs_tpu.ops.transforms import covariance_planes
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.train.gs_trainer import camera_arrays

    scene = PR.make_scene(P)
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    ca = camera_arrays(cam)
    params = scene.params()
    active = scene.active

    @jax.jit
    def proj_fn(params):
        scaling = jnp.exp(params["scaling"])
        cov3d = covariance_planes(scaling, params["rotation"])
        opacity = jax.nn.sigmoid(params["opacity"]) * active[:, None]
        sh = jnp.concatenate(
            [params["features_dc"], params["features_rest"]], axis=1)
        return project_gaussians(
            params["xyz"], cov3d, opacity, ca.view, ca.full_proj,
            ca.camera_center, W, H, ca.tan_fovx, ca.tan_fovy,
            sh=sh, sh_degree=3, active=active,
        )

    proj = proj_fn(params)
    _fetch(proj.radii)
    stages = PR.pglue_breakdown(proj, P, W, H, n=10)
    return {k: round(v, 2) for k, v in stages.items()}


def bench_compositing_kernel(P=131072, W=1232, H=816):
    """Pallas compositing fwd kernel HBM roofline at Mip-360 scale: traffic is
    the [16, N] record planes streamed once + per-tile color/trans outputs."""
    from sixdgs_tpu.ops.rasterizer import pallas_tiles as PT
    from sixdgs_tpu.ops.rasterizer.projection import project_gaussians
    from sixdgs_tpu.ops.transforms import covariance_planes
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.train.gs_trainer import camera_arrays

    rng = np.random.default_rng(0)
    xyz = (rng.normal(size=(P, 3)) * 2.0 + [0, 0, 6]).astype(np.float32)
    scaling = np.exp(rng.uniform(-5.2, -3.0, size=(P, 3)).astype(np.float32))
    rot = rng.normal(size=(P, 4)).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.uniform(-2, 2, size=P)))).astype(np.float32)
    cov3d = covariance_planes(jnp.asarray(scaling), jnp.asarray(rot))
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    ca = camera_arrays(cam)
    colors = jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32))
    proj = project_gaussians(
        jnp.asarray(xyz), cov3d, jnp.asarray(opac), ca.view, ca.full_proj,
        ca.camera_center, W, H, ca.tan_fovx, ca.tan_fovy,
        colors_precomp=colors,
    )
    nx, ny = -(-W // PT.TILE), -(-H // PT.TILE)

    # build the sorted compact records once (the glue), then time the
    # kernel alone
    from sixdgs_tpu.ops.rasterizer.tiles import _fused_pair_keys, _permute

    visible = proj.radii > 0
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
    inv = jnp.argsort(order)
    records = _permute(
        jnp.concatenate([proj.means2d, proj.conics, proj.colors,
                         jnp.where(visible, proj.opacities, 0.0)[:, None]],
                        axis=-1), order, inv)
    key, _, _, _, gbits = _fused_pair_keys(
        records[:, 0:2], proj.radii[order].astype(jnp.float32),
        visible[order], nx, ny, PT.TILE, 16)
    assert key is not None
    n_slots = key.shape[0]
    pad = (-n_slots) % PT.KB
    if pad:
        key = jnp.concatenate(
            [key, jnp.full(pad, jnp.uint32(nx * ny) << gbits, jnp.uint32)])
    ncb = PT.ALIGN_CPB * PT.KB
    nc = min(-(-PT.DEFAULT_NC // ncb) * ncb, (key.shape[0] // ncb) * ncb)
    skey = jax.lax.sort((key,), num_keys=1)[0][:nc]
    gidx_c = jax.lax.bitwise_and(
        skey, jnp.uint32((1 << gbits) - 1)).astype(jnp.int32)
    tiles_c = jax.lax.shift_right_logical(
        skey, jnp.uint32(gbits)).astype(jnp.int32)
    starts = jnp.searchsorted(
        tiles_c, jnp.arange(nx * ny + 1, dtype=jnp.int32)).astype(jnp.int32)
    # production layout: chunk-aligned per-tile segments (pallas_tiles r5)
    starts_al, _ = PT._aligned_starts(starts, nc)
    counts = jnp.minimum(starts[1:] - starts[:-1],
                         starts_al[1:] - starts_al[:-1])
    gidx_al = jnp.minimum(  # sentinel P lanes: clamp-gather a garbage row
        PT._align_compact(gidx_c, starts, starts_al, nx * ny, P), P - 1)
    rec_t = jnp.concatenate(
        [records[gidx_al].T,
         jnp.zeros((PT.COLS - 9, nc), jnp.float32)], axis=0)  # [16, NC]
    starts = starts_al
    _fetch((rec_t, starts, counts))

    bg = jnp.zeros(3, jnp.float32)

    # production train path: fwd stores the serial transmittance, the
    # aligned backward rereads it instead of replaying the scan (14 vs 18
    # per-chunk MXU passes)
    def fwd(r, s, c):
        return PT.pallas_composite_fwd(r, s, c, nx, ny, bg, store_t=True)

    ms = chained_call_ms(fwd, rec_t, starts, counts, n=20, chain_arg=0)
    n_real = int(starts[-1])
    bytes_moved = (PT.COLS * n_real * 4  # record rows streamed once
                   + PT.NPIX * n_real * 4  # Texcl store
                   + nx * ny * 3 * 256 * 4)  # out tiles written
    gbps = bytes_moved / (ms * 1e-3) / 1e9

    out, texcl = fwd(rec_t, starts, counts)
    _fetch(out)

    def bwd(r, s, c, o, tx):
        return PT.pallas_composite_bwd(r, s, c, nx, ny, o, o * 1e-3,
                                       aligned=True, texcl=tx)

    ms_bwd = chained_call_ms(bwd, rec_t, starts, counts, out, texcl,
                             n=20, chain_arg=0)
    bwd_bytes = (2 * PT.COLS * n_real * 4  # records read + dpairs written
                 + PT.NPIX * n_real * 4  # Texcl reread
                 + nx * ny * 6 * 256 * 4)  # out/dout tiles read
    gbps_bwd = bwd_bytes / (ms_bwd * 1e-3) / 1e9
    return {
        "ms": round(ms, 3),
        "bwd_ms": round(ms_bwd, 3),
        "real_pairs": n_real,
        "gbps": round(gbps, 1),
        "bwd_gbps": round(gbps_bwd, 1),
        "hbm_util": round(gbps / V5E_HBM_GBPS, 3),
        "bwd_hbm_util": round(gbps_bwd / V5E_HBM_GBPS, 3),
    }


def bench_train_step(P=131072, W=1232, H=816, with_telemetry=False, n=15):
    """3DGS train step (render fwd+bwd + loss + Adam + densify stats) at
    Mip-360 scale — the reference CUDA rasterizer's hot loop.

    Chained by construction: the state is donated through the loop and the
    loss is host-fetched inside the timed region."""
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.scene.gaussians import from_arrays
    from sixdgs_tpu.train.gs_trainer import (
        camera_arrays, init_train_state, lr_dict, train_step,
    )
    from sixdgs_tpu.utils.config import OptimizationConfig

    rng = np.random.default_rng(0)
    arrs = {
        "xyz": (rng.normal(size=(P, 3)) * 2.0 + [0, 0, 6]).astype(np.float32),
        "features_dc": rng.normal(size=(P, 1, 3)).astype(np.float32) * 0.3,
        "features_rest": np.zeros((P, 15, 3), np.float32),
        "opacity": rng.uniform(-2, 2, size=(P, 1)).astype(np.float32),
        "scaling": rng.uniform(-5.2, -3.0, size=(P, 3)).astype(np.float32),
        "rotation": rng.normal(size=(P, 4)).astype(np.float32),
    }
    state = init_train_state(from_arrays(arrs, max_sh_degree=3, capacity=P))
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    ca = camera_arrays(cam)._replace(
        gt_image=jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32))
    lrs = lr_dict(OptimizationConfig(), 1.0, 1000)

    def step(s):
        # explicitly "pallas", not "auto": a broken Pallas path must FAIL
        # the bench (surface as gs_train_step_ms: error), never silently
        # report the 3x slower tiled fallback as the headline.
        # with_telemetry=False is the production common case (the run loop
        # samples telemetry on adaptation/logging iters only); the telemetry
        # variant is reported alongside (ADVICE r4: self-describing JSON)
        return train_step(s, ca, jnp.zeros(3), lrs, width=W, height=H,
                          sh_degree=3, rasterizer="pallas",
                          with_telemetry=with_telemetry)

    for _ in range(3):
        state, m = step(state)
    _fetch(m["loss"])
    best = float("inf")
    for _ in range(3):  # min over regions: tunnel jitter is additive
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state)
        _fetch(m["loss"])  # donated chain: the readback forces every step
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def check_consistency(result):
    """Cross-check the artifact against itself (VERDICT r4 next #1).

    Returns {"ok": bool, "violations": [...]}. A violation means a timing
    pathology (dispatch-timed numbers, queue backlog) — the artifact must
    say so instead of carrying garbage silently."""
    viol = []
    att = result.get("attention_131k")
    if isinstance(att, dict) and "error" not in att:
        for mode, d in att.items():
            if d["fwd_ms"] > d["fwd_bwd_ms"] * 1.05:
                viol.append(
                    f"attention_131k.{mode}: fwd {d['fwd_ms']} ms > "
                    f"fwd+bwd {d['fwd_bwd_ms']} ms (impossible)")
    stages = result.get("raster_stages")
    step = result.get("gs_train_step_ms")
    if (isinstance(stages, dict) and "error" not in stages
            and isinstance(step, (int, float))):
        ssum = sum(v for v in stages.values() if isinstance(v, (int, float)))
        result["raster_stages_sum_ms"] = round(ssum, 2)
        # the stage sum excludes projection/SH/loss/Adam (~8-12 ms at this
        # scale) and pays a per-stage chaining add, so it brackets the
        # composed step loosely: [0.55, 1.30] x step
        if not (0.55 * step <= ssum <= 1.30 * step):
            viol.append(
                f"raster_stages sum {ssum:.1f} ms vs composed step "
                f"{step:.1f} ms: outside [0.55, 1.30]x")
    comp = result.get("compositing_kernel")
    if (isinstance(comp, dict) and "error" not in comp
            and isinstance(stages, dict) and "fwd kernel" in stages):
        for a, b in (("ms", "fwd kernel"), ("bwd_ms", "bwd kernel")):
            x, y = comp[a], stages[b]
            if not (0.65 <= x / y <= 1.55):
                viol.append(
                    f"compositing_kernel.{a} {x} ms vs raster_stages "
                    f"'{b}' {y} ms: >35% apart")
    return {"ok": not viol, "violations": viol}


def selftest():
    """Bench-vs-tools timing guard (VERDICT r4 next #7): one chained
    composed step vs the chained stage sum; fail loudly on >30% disagreement
    after accounting for the non-raster step parts (~8-14 ms)."""
    step_ms = bench_train_step(n=10)
    stages = bench_raster_stages()
    ssum = sum(v for v in stages.values() if isinstance(v, (int, float)))
    # non-raster parts of the composed step (projection, SH, loss, Adam)
    lo, hi = 0.55 * step_ms, 1.30 * step_ms
    ok = lo <= ssum <= hi
    print(json.dumps({
        "selftest": "raster stage sum vs composed train step",
        "gs_train_step_ms": round(step_ms, 2),
        "raster_stages_sum_ms": round(ssum, 2),
        "bounds": [round(lo, 2), round(hi, 2)],
        "ok": ok,
        "stages": stages,
    }))
    return 0 if ok else 1


def _backend_watchdog(seconds: float = 300.0):
    """Emit an error JSON line and exit if the backend never comes up.

    The tunneled (axon) backend can be down; jax would then block forever in
    device init and the driver would record nothing. The watchdog guarantees
    ONE JSON line either way; call .set() on the returned event once the
    first real device op has completed."""
    import threading

    done = threading.Event()

    def bail():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "pose_estimation_latency",
                "value": None,
                "unit": "ms/image",
                "vs_baseline": None,
                "error": f"TPU backend unavailable (no device op within "
                         f"{seconds:.0f}s)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=bail, daemon=True).start()
    return done


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    watchdog = _backend_watchdog()
    jax.device_get(jnp.ones(8) + 1.0)  # backend liveness probe
    watchdog.set()
    if "--selftest" in argv:
        raise SystemExit(selftest())
    ms, (id_params, rays), fused_error = bench_pose()
    target_ms = 50.0
    result = {
        "metric": "pose_estimation_latency",
        "value": round(ms, 3),
        "unit": "ms/image",
        "vs_baseline": round(target_ms / ms, 3),
        "timing": "chained+host-fetch (tools/tputime.py)",
    }
    if fused_error is not None:
        result["fused_failed"] = fused_error
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        try:
            # Mip-360 stress case (SURVEY §5.7): 4x the default ray budget
            ms_stress, _, _ = bench_pose(n_rays=131072, fused_only=True)
            result["pose_latency_131k_rays_ms"] = round(ms_stress, 3)
        except Exception as e:  # pragma: no cover
            result["pose_latency_131k_rays_ms"] = f"error: {type(e).__name__}"[:80]
        try:
            result["attention_kernel"] = bench_attention_kernel(id_params, rays)
        except Exception as e:  # pragma: no cover
            result["attention_kernel"] = {"error": f"{type(e).__name__}: {e}"[:120]}
        try:
            result["attention_131k"] = bench_attention_131k(id_params)
        except Exception as e:  # pragma: no cover
            result["attention_131k"] = {"error": f"{type(e).__name__}: {e}"[:120]}
        try:
            result["compositing_kernel"] = bench_compositing_kernel()
        except Exception as e:  # pragma: no cover
            result["compositing_kernel"] = {"error": f"{type(e).__name__}: {e}"[:120]}
        try:
            result["raster_stages"] = bench_raster_stages()
        except Exception as e:  # pragma: no cover
            result["raster_stages"] = {"error": f"{type(e).__name__}: {e}"[:120]}
        try:
            result["gs_train_step_ms"] = round(bench_train_step(), 2)
            result["gs_train_step_with_telemetry"] = False
            result["gs_train_step_telemetry_ms"] = round(
                bench_train_step(with_telemetry=True), 2)
        except Exception as e:  # pragma: no cover
            result["gs_train_step_ms"] = f"error: {type(e).__name__}: {e}"[:120]
        result["consistency"] = check_consistency(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
