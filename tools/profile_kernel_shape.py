"""Separate per-instance overhead from per-chunk compute in the compositing
kernels.

Builds synthetic compact records with n_tiles uniform segments of depth D
KB-chunks each, holding TOTAL pairs constant while sweeping D. If ms(D) is
flat, cost is per-chunk (VPU/MXU compute bound); if ms falls steeply with D,
per-instance overheads (first-chunk DMA stall, end-of-instance write drain,
grid dispatch) dominate and multi-tile grid instances would pay.

Timing goes through tools/tputime.chained_ms — over the axon tunnel, plain
block_until_ready loops can report dispatch time instead of device time
(see tputime docstring).

Run on the real TPU: PYTHONPATH=/root/.axon_site:. python
tools/profile_kernel_shape.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")
from tputime import chained_ms, seq_dep  # noqa: E402

from sixdgs_tpu.ops.rasterizer.pallas_tiles import (
    KB, pallas_composite_fwd, pallas_composite_bwd)


def synthetic(n_tiles, depth_chunks, seed=0):
    """Records whose every tile segment is exactly depth_chunks KB-chunks."""
    rng = np.random.default_rng(seed)
    seg = depth_chunks * KB
    nc = n_tiles * seg
    rec = np.zeros((16, nc), np.float32)
    rec[0] = rng.uniform(0, 16, nc)   # mean x (tile-local scale)
    rec[1] = rng.uniform(0, 16, nc)   # mean y
    rec[2] = rng.uniform(0.05, 0.3, nc)  # conic A
    rec[3] = rng.uniform(-0.02, 0.02, nc)
    rec[4] = rng.uniform(0.05, 0.3, nc)
    rec[5:8] = rng.uniform(0, 1, (3, nc))
    rec[8] = rng.uniform(0.01, 0.1, nc)  # low opacity: no early stop
    starts = np.arange(n_tiles + 1, dtype=np.int32) * seg
    counts = np.full(n_tiles, seg, np.int32)
    return (jnp.asarray(rec), jnp.asarray(starts[:n_tiles]),
            jnp.asarray(counts))


def main():
    total_chunks = 4096  # constant work: n_tiles * depth = 4096 chunks
    nx = 64
    for depth in (1, 2, 4, 8, 16):
        n_tiles = total_chunks // depth
        ny = n_tiles // nx
        rec, starts, counts = synthetic(nx * ny, depth)

        bg = jnp.zeros(3, jnp.float32)

        @jax.jit
        def fwd_step(r, _nx=nx, _ny=ny, _s=starts, _c=counts):
            img = pallas_composite_fwd(r, _s, _c, _nx, _ny, bg)
            return (seq_dep(r, img), img[0, 0, 0]), img

        (_, _), img = fwd_step(rec)
        t_f = chained_ms(lambda c: fwd_step(c[0])[0], (rec, jnp.float32(0)))
        dimg = jnp.ones_like(img)

        @jax.jit
        def bwd_step(r, _nx=nx, _ny=ny, _s=starts, _c=counts, _o=img,
                     _do=dimg):
            dp = pallas_composite_bwd(r, _s, _c, _nx, _ny, _o, _do)
            return seq_dep(r, dp[0, 0:1]), dp[0, 0]

        t_b = chained_ms(lambda c: bwd_step(c[0]), (rec, jnp.float32(0)))
        n_inst = nx * ny
        print(f"depth {depth:2d} chunks x {n_inst:4d} tiles "
              f"({total_chunks} chunks total): fwd {t_f:7.2f} ms  "
              f"bwd {t_b:7.2f} ms  "
              f"(per-chunk fwd {t_f / total_chunks * 1e3:6.2f} us)",
              flush=True)


if __name__ == "__main__":
    main()
