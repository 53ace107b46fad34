"""Micro-benchmarks for rasterizer glue ops and SSIM variants (real TPU)."""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    P = 131072
    N = 2_359_296  # P * 16 + 256 * 1024
    NA = N + 3927 * 128

    records = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, P, size=NA).astype(np.int32))
    idxN = jnp.asarray(rng.integers(0, P, size=N).astype(np.int32))
    pair_i32 = jnp.asarray(rng.integers(0, 3928, size=N).astype(np.int32))

    print(f"-- glue ops (P={P}, N_pairs={N}, N_aligned={NA}) --")
    g1 = jax.jit(lambda r, i: r[i])
    print(f"gather [NA,16] rows ({NA*64/1e6:.0f} MB out): {timeit(g1, records, idx):7.2f} ms")
    g1b = jax.jit(lambda r, i: r[i])
    print(f"gather [N,16] rows ({N*64/1e6:.0f} MB out): {timeit(g1b, records, idxN):7.2f} ms")
    g2 = jax.jit(lambda r, i: r.T[:, i])
    print(f"gather transposed [16,NA]: {timeit(g2, records, idx):7.2f} ms")

    big = jnp.asarray(rng.normal(size=(NA, 16)).astype(np.float32))
    tr = jax.jit(lambda x: x.T)
    print(f"transpose [NA,16]->[16,NA]: {timeit(tr, big):7.2f} ms")

    ew = jax.jit(lambda x: x * 1.5 + 1.0)
    print(f"elementwise x*1.5+1 on [NA,16]: {timeit(ew, big):7.2f} ms")

    srt = jax.jit(lambda k: jnp.argsort(k, stable=True))
    print(f"stable argsort {N} i32 (random): {timeit(srt, pair_i32):7.2f} ms")
    srt2 = jax.jit(lambda k: jnp.sort(k))
    print(f"plain sort {N} i32: {timeit(srt2, pair_i32):7.2f} ms")

    def sortpair(k):
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        return jax.lax.sort((k, iota), num_keys=1)
    print(f"lax.sort (k,iota) {N}: {timeit(jax.jit(sortpair), pair_i32):7.2f} ms")

    rep = jax.jit(lambda t: jnp.repeat(t, 128, total_repeat_length=NA))
    t_chunk = jnp.asarray(rng.integers(0, 3927, size=NA // 128).astype(np.int32))
    print(f"repeat {NA//128}->NA: {timeit(rep, t_chunk):7.2f} ms")

    # scatter test: inv_order via scatter vs argsort
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    sc = jax.jit(lambda p: jnp.zeros(N, jnp.int32).at[p].set(jnp.arange(N, dtype=jnp.int32)))
    print(f"scatter-set inv perm {N}: {timeit(sc, perm):7.2f} ms")

    # windowed gather (tiles.py _window shape)
    k_max, n_tiles = 512, 3927
    sorted_recs = jnp.asarray(rng.normal(size=(N, 9)).astype(np.float32))
    starts = jnp.sort(jnp.asarray(rng.integers(0, N, size=n_tiles + 1).astype(np.int32)))
    def window(x, st):
        counts = st[1:] - st[:-1]
        k = jnp.arange(k_max, dtype=jnp.int32)
        ii = st[:-1][:, None] + k[None, :]
        valid = k[None, :] < counts[:, None]
        ii = jnp.minimum(ii, x.shape[0] - 1)
        return jnp.where(valid[..., None], x[ii], 0.0)
    print(f"window gather [n_tiles,512,9] ({n_tiles*k_max*36/1e6:.0f} MB): {timeit(jax.jit(window), sorted_recs, starts):7.2f} ms")

    # ---- SSIM variants ----
    print("-- ssim (1232x816) --")
    H, W = 816, 1232
    img = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

    from sixdgs_tpu.ops.ssim import dssim_l1_loss, _gaussian_window

    f0 = jax.jit(jax.value_and_grad(lambda i: dssim_l1_loss(i, gt, 0.2)[0]))
    print(f"current dssim fwd+bwd: {timeit(f0, img):7.2f} ms")

    # separable stacked variant
    win2d = _gaussian_window(11, 1.5)
    g1d = jnp.asarray(np.asarray(win2d)[5] / np.asarray(win2d)[5].sum(), jnp.float32)

    def blur_sep(x):  # x [B, H, W]
        b = x.shape[0]
        kh = jnp.broadcast_to(g1d.reshape(1, 1, 11, 1), (b, 1, 11, 1))
        kw = jnp.broadcast_to(g1d.reshape(1, 1, 1, 11), (b, 1, 1, 11))
        y = jax.lax.conv_general_dilated(
            x[None], kh, (1, 1), [(5, 5), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=b, precision=jax.lax.Precision.HIGHEST)
        y = jax.lax.conv_general_dilated(
            y, kw, (1, 1), [(0, 0), (5, 5)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=b, precision=jax.lax.Precision.HIGHEST)
        return y[0]

    def ssim_sep(i1, i2):
        stack = jnp.concatenate([i1, i2, i1 * i1, i2 * i2, i1 * i2], 0)
        bl = blur_sep(stack)
        mu1, mu2 = bl[0:3], bl[3:6]
        s11 = bl[6:9] - mu1 * mu1
        s22 = bl[9:12] - mu2 * mu2
        s12 = bl[12:15] - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2))
        return jnp.mean(m)

    def dssim_sep(i):
        ll1 = jnp.mean(jnp.abs(i - gt))
        return 0.8 * ll1 + 0.2 * (1 - ssim_sep(i, gt))

    f1 = jax.jit(jax.value_and_grad(dssim_sep))
    v0 = f0(img)[0]
    v1 = f1(img)[0]
    print(f"separable stacked fwd+bwd: {timeit(f1, img):7.2f} ms  (val {v1:.6f} vs {v0:.6f})")

    # band-matmul variant
    def band(n):
        i = np.arange(n)
        m = np.zeros((n, n), np.float32)
        for o in range(-5, 6):
            j = i + o
            ok = (j >= 0) & (j < n)
            m[i[ok], j[ok]] = np.asarray(g1d)[o + 5]
        return jnp.asarray(m)

    BH, BW = band(H), band(W)

    def blur_mm(x):  # [B, H, W]
        y = jnp.einsum("bhw,hk->bkw", x, BH,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("bkw,wj->bkj", y, BW,
                          precision=jax.lax.Precision.HIGHEST)

    def ssim_mm(i1, i2):
        stack = jnp.concatenate([i1, i2, i1 * i1, i2 * i2, i1 * i2], 0)
        bl = blur_mm(stack)
        mu1, mu2 = bl[0:3], bl[3:6]
        s11 = bl[6:9] - mu1 * mu1
        s22 = bl[9:12] - mu2 * mu2
        s12 = bl[12:15] - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2))
        return jnp.mean(m)

    def dssim_mm(i):
        ll1 = jnp.mean(jnp.abs(i - gt))
        return 0.8 * ll1 + 0.2 * (1 - ssim_mm(i, gt))

    f2 = jax.jit(jax.value_and_grad(dssim_mm))
    v2 = f2(img)[0]
    print(f"band-matmul fwd+bwd: {timeit(f2, img):7.2f} ms  (val {v2:.6f} vs {v0:.6f})")


if __name__ == "__main__":
    main()
