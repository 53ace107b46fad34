"""Device-time breakdown of the compact-gather rasterizer pipeline (v3).

All timings force a tiny data-dependent device_get — block_until_ready is
not a reliable fence on the tunneled backend (see bench._sync).
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.ravel(leaf)[0])


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--P", type=int, default=131072)
    ap.add_argument("--W", type=int, default=1232)
    ap.add_argument("--H", type=int, default=816)
    args = ap.parse_args()

    from sixdgs_tpu.ops.rasterizer.projection import project_gaussians
    from sixdgs_tpu.ops.rasterizer import pallas_tiles as PT
    from sixdgs_tpu.ops.rasterizer.tiles import _fused_pair_keys, _permute
    from sixdgs_tpu.ops.ssim import dssim_l1_loss
    from sixdgs_tpu.ops.transforms import build_covariance
    from sixdgs_tpu.scene.cameras import make_synthetic_camera
    from sixdgs_tpu.train.gs_trainer import camera_arrays

    W, H = args.W, args.H
    nx, ny = -(-W // 16), -(-H // 16)
    P = args.P
    rng = np.random.default_rng(0)
    xyz = (rng.normal(size=(P, 3)) * 2.0 + [0, 0, 6]).astype(np.float32)
    scaling = np.exp(rng.uniform(-5.2, -3.0, size=(P, 3)).astype(np.float32))
    rot = rng.normal(size=(P, 4)).astype(np.float32)
    opac = (1 / (1 + np.exp(-rng.uniform(-2, 2, size=P)))).astype(np.float32)
    cov3d = build_covariance(jnp.asarray(scaling), jnp.asarray(rot))
    cam = make_synthetic_camera(W, H, 0.9, 0.65, np.eye(3), np.zeros(3))
    ca = camera_arrays(cam)
    colors = jnp.asarray(rng.uniform(size=(P, 3)).astype(np.float32))
    proj = project_gaussians(
        jnp.asarray(xyz), cov3d, jnp.asarray(opac), ca.view, ca.full_proj,
        ca.camera_center, W, H, ca.tan_fovx, ca.tan_fovy,
        colors_precomp=colors,
    )
    visible = proj.radii > 0

    @jax.jit
    def stage_depth(means2d, conics, colors, opacities, depths, radii):
        order = jnp.argsort(jnp.where(visible, depths, jnp.inf))
        inv = jnp.argsort(order)
        rec = _permute(
            jnp.concatenate([means2d, conics, colors,
                             jnp.where(visible, opacities, 0.0)[:, None]],
                            axis=-1), order, inv)
        return rec, radii[order].astype(jnp.float32), visible[order]

    dargs = (proj.means2d, proj.conics, proj.colors, proj.opacities,
             proj.depths, proj.radii)
    rec, radii_f, vis = stage_depth(*dargs)
    print(f"depth-sort+permute: {timeit(stage_depth, *dargs):8.2f} ms",
          flush=True)

    keys_fn = jax.jit(lambda m, r, v: _fused_pair_keys(
        m, r, v, nx, ny, 16, 16))
    key, _, _, counts_g, gbits = keys_fn(rec[:, 0:2], radii_f, vis)
    print(f"fused pair keys: {timeit(keys_fn, rec[:, 0:2], radii_f, vis):8.2f} ms",
          flush=True)

    n_slots = key.shape[0]
    nc = min(PT.DEFAULT_NC, -(-n_slots // PT.KB) * PT.KB)
    sort_fn = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0][:nc])
    skey = sort_fn(key)
    print(f"key-only sort @ {n_slots}: {timeit(sort_fn, key):8.2f} ms",
          flush=True)

    @jax.jit
    def stage_gather(skey, rec):
        gidx = jax.lax.bitwise_and(
            skey, jnp.uint32((1 << gbits) - 1)).astype(jnp.int32)
        tiles_c = jax.lax.shift_right_logical(
            skey, jnp.uint32(gbits)).astype(jnp.int32)
        starts = jnp.searchsorted(
            tiles_c, jnp.arange(nx * ny + 1, dtype=jnp.int32)).astype(jnp.int32)
        rt = jnp.concatenate(
            [rec[gidx].T, jnp.zeros((PT.COLS - 9, nc), jnp.float32)], axis=0)
        return rt, starts

    rec_t, starts = stage_gather(skey, rec)
    print(f"gather+T+pad+searchsorted: {timeit(stage_gather, skey, rec):8.2f} ms",
          flush=True)
    counts = starts[1:] - starts[:-1]

    bg = jnp.zeros(3, jnp.float32)
    kf = jax.jit(lambda r, s, c: PT.pallas_composite_fwd(r, s, c, nx, ny, bg))
    print(f"fwd kernel: {timeit(kf, rec_t, starts, counts):8.2f} ms", flush=True)
    img = kf(rec_t, starts, counts)

    kb = jax.jit(lambda r, s, c, o: PT.pallas_composite_bwd(
        r, s, c, nx, ny, o, o * 1e-3))
    print(f"bwd kernel: {timeit(kb, rec_t, starts, counts, img):8.2f} ms",
          flush=True)

    dp = kb(rec_t, starts, counts, img)
    ends_g = jnp.cumsum(counts_g).astype(jnp.int32)

    @jax.jit
    def stage_route(dp, gidx, v_real):
        d = dp[:9]
        rows = jnp.arange(nc, dtype=jnp.int32)
        gkey = jnp.where(rows < v_real, gidx, jnp.int32(P))
        out = jax.lax.sort((gkey,) + tuple(d[c] for c in range(9)), num_keys=1)
        cum = jnp.cumsum(jnp.stack(out[1:], axis=-1), axis=0)
        cum0 = jnp.concatenate([jnp.zeros((1, 9), cum.dtype), cum], axis=0)
        return (cum0[jnp.minimum(ends_g, nc)]
                - cum0[jnp.minimum(ends_g - counts_g, nc)])

    gidx = jax.lax.bitwise_and(
        skey, jnp.uint32((1 << gbits) - 1)).astype(jnp.int32)
    print(f"bwd route (sort9+cumsum+segdiff): "
          f"{timeit(stage_route, dp, gidx, starts[-1]):8.2f} ms", flush=True)

    img = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    gt = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)

    @jax.jit
    def ssim_fb(img):
        return jax.value_and_grad(lambda i: dssim_l1_loss(i, gt, 0.2)[0])(img)

    print(f"dssim_l1 fwd+bwd: {timeit(ssim_fb, img):8.2f} ms", flush=True)

    full = jax.jit(lambda pr: PT.rasterize_pallas(pr, W, H, jnp.zeros(3)))
    print(f"raster fwd total: {timeit(full, proj):8.2f} ms", flush=True)

    @jax.jit
    def full_fb(colors):
        def f(c):
            pr = proj._replace(colors=c)
            return jnp.sum(PT.rasterize_pallas(pr, W, H, jnp.zeros(3)))
        return jax.grad(f)(colors)

    print(f"raster fwd+bwd (d/dcolors): {timeit(full_fb, colors):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
