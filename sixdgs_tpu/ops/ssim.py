"""Image metrics: SSIM / PSNR / L1, parity with the reference losses.

SSIM matches /root/reference/utils/loss_utils.py:25-83: 11x11 Gaussian window
(sigma=1.5), zero ("same") padding, per-channel depthwise convolution,
C1=0.01^2, C2=0.03^2. PSNR matches /root/reference/utils/image_utils.py:19-23.

The depthwise convolutions compile to fused XLA convs; a [3,H,W] image is a
single conv_general_dilated call with feature_group_count=3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-jnp.square(xs - window_size // 2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _depthwise_conv(img: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """img [C,H,W], kernel2d [k,k] -> same-padded depthwise conv [C,H,W]."""
    c = img.shape[0]
    k = kernel2d.shape[0]
    kern = jnp.broadcast_to(kernel2d, (c, 1, k, k))
    # HIGHEST precision is essential on TPU: the default bf16 conv makes
    # sigma = conv(x^2) - mu^2 cancel into +-1e-3 noise in flat regions,
    # overwhelming C2 = 9e-4 and exploding the SSIM map (observed SSIM > 16
    # during training, corrupting the DSSIM loss term).
    out = jax.lax.conv_general_dilated(
        img[None],
        kern,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM of two [C,H,W] images in [0,1]."""
    window = _gaussian_window(window_size, 1.5).astype(img1.dtype)
    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB for images in [0,1]; mean over leading dim like the reference."""
    mse = jnp.mean(jnp.square(img1 - img2))
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a - b))


def dssim_l1_loss(img: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2):
    """The 3DGS photometric loss 0.8*L1 + 0.2*(1-SSIM)
    (/root/reference/train.py:117-121)."""
    ll1 = l1_loss(img, gt)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(img, gt)), ll1
