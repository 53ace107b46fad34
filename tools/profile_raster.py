"""Device-time breakdown of the 3DGS train step at Mip-360 scale.

Times each stage of the rasterizer data path separately so optimization
targets the dominant cost (run on the real TPU chip).

Timing is CHAINED with a host fetch (tools/tputime.py): over the tunnel,
bare block_until_ready loops can time dispatch instead of execution.
bench.py imports ``pglue_breakdown`` so every round's BENCH JSON carries
the stage composition (VERDICT r3 #6).
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tputime import chained_ms, seq_dep  # noqa: E402


def timeit(fn, *args, n=20, warmup=3, repeats=3):
    """Chained + host-fetch timing of fn(*args); extra args are closed over
    and the first argument carries the serializing data dependency. Min over
    ``repeats`` regions (tunnel jitter is additive — see tputime)."""

    @jax.jit
    def step(carry):
        a0, _ = carry
        out = fn(a0, *args[1:])
        leaves = jax.tree_util.tree_leaves(out)
        sm = min(leaves, key=lambda v: v.size)
        # fold the dependency into ONE leaf of the (possibly pytree) first arg
        flat, tdef = jax.tree_util.tree_flatten(a0)
        flat[0] = seq_dep(flat[0], sm)
        return tdef.unflatten(flat), sm.astype(jnp.float32).ravel()[0]

    return min(chained_ms(step, (args[0], jnp.float32(0)), n=n,
                          warmup=warmup if r == 0 else 1)
               for r in range(max(repeats, 1)))


def pglue_breakdown(proj, P, W, H, n=20):
    """Stage-by-stage chained timing of the Pallas raster pipeline
    (everything around + including the compositing kernels) for the
    COMPACT-GATHER design: ONE payload-free fused-key sort + one row gather
    forward; one gidx-keyed payload sort + cumsum-diff backward.
    Returns {stage_name: ms} (insertion order = pipeline order)."""
    from sixdgs_tpu.ops.rasterizer import pallas_tiles as PT
    from sixdgs_tpu.ops.rasterizer.tiles import _fused_pair_keys, _permute

    nx, ny = -(-W // PT.TILE), -(-H // PT.TILE)
    visible = proj.radii > 0
    t_max, t_max_mid, t_max_big = 16, 64, 1024
    mid_k, overflow_k = 4096, 256
    n_tiles = nx * ny
    out = {}

    @jax.jit
    def stage_depth(proj_means2d, conics, colors, opacities, depths, radii):
        order = jnp.argsort(jnp.where(visible, depths, jnp.inf))
        # mirror rasterize_pallas: inverse permutation via a disjoint
        # scatter of iota, not a second argsort
        P_all = order.shape[0]
        iota = jnp.arange(P_all, dtype=order.dtype)
        inv = jnp.zeros(P_all, order.dtype).at[order].set(
            iota, unique_indices=True, indices_are_sorted=False)
        rec = _permute(
            jnp.concatenate([proj_means2d, conics, colors,
                             jnp.where(visible, opacities, 0.0)[:, None]],
                            axis=-1), order, inv)
        return rec, radii[order].astype(jnp.float32), visible[order]

    rec, radii_f, vis = jax.block_until_ready(stage_depth(
        proj.means2d, proj.conics, proj.colors, proj.opacities,
        proj.depths, proj.radii))
    out["depth-sort+permute"] = timeit(
        stage_depth, proj.means2d, proj.conics, proj.colors, proj.opacities,
        proj.depths, proj.radii, n=n)

    keys_fn = jax.jit(lambda m, r, v: _fused_pair_keys(
        m, r, v, nx, ny, 16, t_max, overflow_k=overflow_k,
        t_max_big=t_max_big, mid_k=mid_k, t_max_mid=t_max_mid))
    key, _, _, counts_g, gbits = jax.block_until_ready(
        keys_fn(rec[:, 0:2], radii_f, vis))
    assert key is not None
    out["fused_pair_keys"] = timeit(keys_fn, rec[:, 0:2], radii_f, vis, n=n)

    n_slots = P * t_max + mid_k * t_max_mid + overflow_k * t_max_big
    ncb = PT.ALIGN_CPB * PT.KB
    nc = min(-(-PT.DEFAULT_NC // ncb) * ncb, -(-n_slots // ncb) * ncb)
    n_slots_pad = max(-(-n_slots // PT.KB) * PT.KB, nc)

    @jax.jit
    def stage_sort(key):
        pad = n_slots_pad - n_slots
        if pad:
            sentinel = jnp.uint32(n_tiles) << gbits
            key = jnp.concatenate([key, jnp.full(pad, sentinel, jnp.uint32)])
        skey = jax.lax.sort((key,), num_keys=1)[0][:nc]
        gidx_c = jax.lax.bitwise_and(
            skey, jnp.uint32((1 << gbits) - 1)).astype(jnp.int32)
        tiles_c = jax.lax.shift_right_logical(
            skey, jnp.uint32(gbits)).astype(jnp.int32)
        return gidx_c, tiles_c

    gidx_c, tiles_c = jax.block_until_ready(stage_sort(key))
    out[f"key sort+unpack ({n_slots_pad} slots)"] = timeit(stage_sort, key, n=n)

    @jax.jit
    def stage_layout(tiles_c, counts_g):
        starts = PT._segment_starts(tiles_c, n_tiles)
        starts_al, _ = PT._aligned_starts(starts, nc)
        counts_k = jnp.minimum(starts[1:] - starts[:-1],
                               starts_al[1:] - starts_al[:-1])
        return (starts, starts_al, counts_k,
                jnp.cumsum(counts_g).astype(jnp.int32))

    starts, starts_al, counts_k, ends_g = jax.block_until_ready(
        stage_layout(tiles_c, counts_g))
    out["segment+aligned starts"] = timeit(stage_layout, tiles_c, counts_g,
                                           n=n)

    align_fn = jax.jit(lambda g, s, sa: PT._align_compact(
        g, s, sa, n_tiles, P))
    gidx_al = jax.block_until_ready(align_fn(gidx_c, starts, starts_al))
    out["align kernel"] = timeit(align_fn, gidx_c, starts, starts_al, n=n)

    @jax.jit
    def stage_gather(rec, gidx_al):
        recs_c = rec[gidx_al].T
        return jnp.concatenate(
            [recs_c, jnp.zeros((PT.COLS - 9, nc), jnp.float32)], axis=0)

    recs = jax.block_until_ready(stage_gather(rec, gidx_al))
    out["compact row gather"] = timeit(stage_gather, rec, gidx_al, n=n)

    bg = jnp.zeros(3, jnp.float32)
    # production train path: fwd stores the serial transmittance (store_t)
    # and the aligned backward rereads it instead of replaying the scan
    kf = jax.jit(lambda r, s, c: PT.pallas_composite_fwd(
        r, s, c, nx, ny, bg, store_t=True))
    out["fwd kernel"] = timeit(kf, recs, starts_al, counts_k, n=n)
    kf_inf = jax.jit(lambda r, s, c: PT.pallas_composite_fwd(
        r, s, c, nx, ny, bg))
    out["fwd kernel (inference, no T store)"] = timeit(
        kf_inf, recs, starts_al, counts_k, n=n)

    img, texcl = jax.block_until_ready(kf(recs, starts_al, counts_k))
    kb = jax.jit(lambda r, s, c, o, tx: PT.pallas_composite_bwd(
        r, s, c, nx, ny, o, o * 1e-3, aligned=True, texcl=tx))
    out["bwd kernel"] = timeit(kb, recs, starts_al, counts_k, img, texcl,
                               n=n)

    dpairs = jax.block_until_ready(kb(recs, starts_al, counts_k, img, texcl))

    @jax.jit
    def stage_bwd_route(dpairs, gidx_al, ends_g, counts_g):
        # padding lanes already carry the P sentinel
        srt = jax.lax.sort(
            (gidx_al,) + tuple(dpairs[c] for c in range(9)), num_keys=1)
        # stacked-cumsum routing (mirrors production _gather_pairs_bwd; the
        # per-plane 1-D variant wins in isolation but loses 16 ms composed)
        cum = jnp.cumsum(jnp.stack(srt[1:], axis=-1), axis=0)  # [NC, 9]
        cum0 = jnp.concatenate([jnp.zeros((1, 9), cum.dtype), cum], axis=0)
        return cum0[jnp.minimum(ends_g, nc)] - cum0[
            jnp.minimum(ends_g - counts_g, nc)]

    jax.block_until_ready(
        stage_bwd_route(dpairs, gidx_al, ends_g, counts_g))
    out["bwd gidx payload sort+route"] = timeit(
        stage_bwd_route, dpairs, gidx_al, ends_g, counts_g, n=n)
    return out


def make_scene(P=100_000, seed=0, cap=None):
    from sixdgs_tpu.scene.gaussians import from_arrays

    rng = np.random.default_rng(seed)
    arrs = {
        "xyz": (rng.normal(size=(P, 3)) * 2.0 + [0, 0, 6]).astype(np.float32),
        "features_dc": rng.normal(size=(P, 1, 3)).astype(np.float32) * 0.3,
        "features_rest": np.zeros((P, 15, 3), np.float32),
        "opacity": rng.uniform(-2, 2, size=(P, 1)).astype(np.float32),
        "scaling": rng.uniform(-5.2, -3.0, size=(P, 3)).astype(np.float32),
        "rotation": rng.normal(size=(P, 4)).astype(np.float32),
    }
    return from_arrays(arrs, max_sh_degree=3, capacity=cap or P)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--P", type=int, default=131072)
    ap.add_argument("--W", type=int, default=1232)
    ap.add_argument("--H", type=int, default=816)
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()

    from sixdgs_tpu.ops.rasterizer.projection import project_gaussians
    from sixdgs_tpu.ops.rasterizer import tiles as T
    from sixdgs_tpu.ops.ssim import dssim_l1_loss
    from sixdgs_tpu.ops.transforms import covariance_planes
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.train.gs_trainer import (
        camera_arrays, init_train_state, train_step, lr_dict,
    )
    from sixdgs_tpu.utils.config import OptimizationConfig

    W, H = args.W, args.H
    nx, ny = -(-W // 16), -(-H // 16)
    scene = make_scene(args.P)
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    ca = camera_arrays(cam)._replace(
        gt_image=jnp.asarray(np.random.default_rng(1).uniform(size=(3, H, W)), jnp.float32)
    )
    stages = args.stages.split(",") if args.stages != "all" else None

    def want(name):
        return stages is None or name in stages

    params = scene.params()
    active = scene.active

    @jax.jit
    def proj_fn(params):
        scaling = jnp.exp(params["scaling"])
        cov3d = covariance_planes(scaling, params["rotation"])
        opacity = jax.nn.sigmoid(params["opacity"]) * active[:, None]
        sh = jnp.concatenate([params["features_dc"], params["features_rest"]], axis=1)
        return project_gaussians(
            params["xyz"], cov3d, opacity, ca.view, ca.full_proj,
            ca.camera_center, W, H, ca.tan_fovx, ca.tan_fovy,
            sh=sh, sh_degree=3, active=active,
        )

    proj = jax.block_until_ready(proj_fn(params))
    print(f"P={args.P} visible={int((proj.radii > 0).sum())} "
          f"tiles={nx}x{ny}={nx*ny}")

    if want("proj"):
        print(f"projection fwd: {timeit(proj_fn, params):8.2f} ms")

        @jax.jit
        def proj_vjp(params):
            def f(p):
                pr = proj_fn.__wrapped__(p)
                return jnp.sum(pr.means2d * 1e-3) + jnp.sum(pr.colors) + jnp.sum(pr.conics)
            return jax.grad(f)(params)

        print(f"projection fwd+bwd: {timeit(proj_vjp, params):8.2f} ms")

    if want("bin"):
        visible = proj.radii > 0
        order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))
        means2d = proj.means2d[order]
        radii_f = proj.radii[order].astype(jnp.float32)
        vis = visible[order]

        bin_fn = jax.jit(lambda m, r, v: T._bin_pairs(m, r, v, nx, ny, 16, 16))
        out = jax.block_until_ready(bin_fn(means2d, radii_f, vis))
        n_pairs = out[0].shape[0]
        starts = out[2]
        counts = np.asarray(starts[1:] - starts[:-1])
        real = int(np.asarray(jnp.sum(out[1] < nx * ny)))
        print(f"bin_pairs (incl 2 sorts + searchsorted): {timeit(bin_fn, means2d, radii_f, vis):8.2f} ms  "
              f"[pair slots {n_pairs}, real pairs {real}, max/tile {counts.max()}]")

        sort_fn = jax.jit(lambda x: jnp.argsort(x, stable=True))
        keys = out[2]  # sorted_tiles as stand-in key array
        print(f"one stable argsort of {n_pairs} i32: {timeit(sort_fn, keys):8.2f} ms")

    if want("ssim"):
        img = jnp.asarray(np.random.default_rng(2).uniform(size=(3, H, W)), jnp.float32)

        @jax.jit
        def ssim_fb(img):
            return jax.value_and_grad(lambda i: dssim_l1_loss(i, ca.gt_image, 0.2)[0])(img)

        print(f"dssim_l1 fwd+bwd: {timeit(ssim_fb, img):8.2f} ms")

    if want("pglue"):
        for name, ms in pglue_breakdown(proj, args.P, W, H).items():
            print(f"pglue {name}: {ms:8.2f} ms")

    from sixdgs_tpu.train.gs_trainer import _render_params

    for rast in ("tiled", "pallas"):
        if not want(rast):
            continue

        def fwd(params, zeros2d, _rast=rast):
            img, _ = _render_params(params, active, ca, W, H, 3,
                                    jnp.zeros(3), zeros2d, 256, _rast)
            return jnp.sum(img)

        zeros2d = jnp.zeros((scene.capacity, 2))
        try:
            jf = jax.jit(fwd)
            print(f"raster[{rast}] fwd: {timeit(jf, params, zeros2d):8.2f} ms")
            g = jax.jit(jax.grad(fwd, argnums=(0, 1)))
            print(f"raster[{rast}] fwd+bwd: {timeit(g, params, zeros2d):8.2f} ms")
        except Exception as e:
            print(f"raster[{rast}] FAILED: {type(e).__name__}: {e}")

    if want("step") or want("step_pallas"):
        lrs = lr_dict(OptimizationConfig(), 1.0, 1000)
        rasts = ("pallas",) if (stages and "step_pallas" in stages
                                and "step" not in stages) else (
            "tiled", "pallas")
        for rast in rasts:
            stt = init_train_state(make_scene(args.P))
            def stp(s):
                s2, m = train_step(s, ca, jnp.zeros(3), lrs, width=W, height=H,
                                   sh_degree=3, rasterizer=rast,
                                   with_telemetry=False)
                return s2, m
            # donated state: chained by construction; HOST-FETCH the loss
            # (block_until_ready is not a reliable fence over the tunnel)
            for _ in range(3):
                stt, m = stp(stt)
            np.asarray(m["loss"])
            t0 = time.perf_counter()
            N = 20
            for _ in range(N):
                stt, m = stp(stt)
            np.asarray(m["loss"])
            print(f"train_step[{rast}]: {(time.perf_counter()-t0)/N*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
