"""Real spherical-harmonics evaluation (degrees 0-4).

Behavior parity with the reference SH basis used by 3DGS
(see /root/reference/utils/sh_utils.py:24-126): same hardcoded
coefficients, same channel layout ``sh[..., C, (deg+1)**2]``.

TPU notes: written as one fused polynomial expression per degree so XLA
keeps everything in registers/VMEM; fully vmappable over any leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
        deg: static int degree in [0, 4].
        sh: [..., C, (deg+1)**2] coefficients (extra trailing coeffs allowed).
        dirs: [..., 3] unit directions.

    Returns:
        [..., C] evaluated values.
    """
    assert 4 >= deg >= 0
    coeff = (deg + 1) ** 2
    assert sh.shape[-1] >= coeff

    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (
            result - C1 * y * sh[..., 1] + C1 * z * sh[..., 2] - C1 * x * sh[..., 3]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4]
                + C2[1] * yz * sh[..., 5]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                + C2[3] * xz * sh[..., 7]
                + C2[4] * (xx - yy) * sh[..., 8]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                    + C3[1] * xy * z * sh[..., 10]
                    + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                    + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                    + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                    + C3[5] * z * (xx - yy) * sh[..., 14]
                    + C3[6] * x * (xx - 3 * yy) * sh[..., 15]
                )
                if deg > 3:
                    result = (
                        result
                        + C4[0] * xy * (xx - yy) * sh[..., 16]
                        + C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                        + C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                        + C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                        + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                        + C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                        + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                        + C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                        + C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[..., 24]
                    )
    return result


def sh_basis_planes(deg: int, x, y, z):
    """The per-coefficient SH basis factors as (deg+1)**2 flat planes.

    Same coefficient constants and factorization as ``eval_sh`` — each entry
    b_k is exactly the factor that multiplies ``sh[..., k]`` there, so a
    per-channel sum in the same k order reproduces ``eval_sh`` bitwise."""
    one = jnp.ones_like(x)
    basis = [C0 * one]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [
                C2[0] * xy,
                C2[1] * yz,
                C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz,
                C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
                if deg > 3:
                    basis += [
                        C4[0] * xy * (xx - yy),
                        C4[1] * yz * (3 * xx - yy),
                        C4[2] * xy * (7 * zz - 1),
                        C4[3] * yz * (7 * zz - 3),
                        C4[4] * (zz * (35 * zz - 30) + 3),
                        C4[5] * xz * (7 * zz - 3),
                        C4[6] * (xx - yy) * (7 * zz - 1),
                        C4[7] * xz * (xx - 3 * yy),
                        C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
                    ]
    return basis


def eval_sh_planes(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """TPU plane-major twin of ``eval_sh`` for sh in the STORAGE layout
    [P, n_coeffs, C] (channel-minor — note the opposite coefficient/channel
    order vs ``eval_sh``, which wants [..., C, n_coeffs]).

    ``eval_sh`` slices [P, C] arrays per coefficient: with C=3 in the minor
    (lane) dimension every fused op runs at 3/128 lane utilization. Here the
    coefficient table is transposed ONCE to [n_coeffs*C, P] and all math runs
    on flat [P] planes at full lanes; per-channel accumulation follows the
    identical k order, so values match ``eval_sh`` bitwise."""
    P, C = sh.shape[0], sh.shape[2]
    coeff = (deg + 1) ** 2
    assert sh.shape[1] >= coeff
    basis = sh_basis_planes(deg, dirs[:, 0], dirs[:, 1], dirs[:, 2])
    st = sh[:, :coeff, :].reshape(P, coeff * C).T  # [coeff*C, P]
    cols = []
    for c in range(C):
        acc = basis[0] * st[c]
        for k in range(1, coeff):
            acc = acc + basis[k] * st[k * C + c]
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (reference RGB2SH, sh_utils.py:121)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """DC SH coefficient -> RGB (reference SH2RGB, sh_utils.py:125)."""
    return sh * C0 + 0.5


def sh_to_color(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB color, the composition used throughout the reference
    (gaussian_renderer/__init__.py:77-78, pose_estimation/sampling.py:121-122)."""
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)
