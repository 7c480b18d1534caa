"""Training losses: L1 + D-SSIM, the standard 3DGS photometric objective.

The reference renderer exports the densifier signals but leaves the loss to
its downstream trainer crate (SURVEY.md intro); this is the standard
objective used with it: ``(1 - lam) * L1 + lam * (1 - SSIM)`` with
``lam = 0.2``. SSIM uses an 11x11 Gaussian window, computed as two 1-D
separable depthwise convolutions (maps well onto TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SSIM_C1 = 0.01**2
SSIM_C2 = 0.03**2


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jax.Array, window: np.ndarray) -> jax.Array:
    """Separable Gaussian blur of [H, W, C] with SAME padding."""
    size = window.shape[0]
    kernel = jnp.asarray(window)
    # Channels as batch: [C, 1, H, W] with a single-channel kernel.
    x = img.transpose(2, 0, 1)[:, None]
    kx = kernel.reshape(1, 1, 1, size)
    ky = kernel.reshape(1, 1, size, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, ky, (1, 1), [(size // 2, size // 2), (0, 0)], dimension_numbers=dn
    )
    x = jax.lax.conv_general_dilated(
        x, kx, (1, 1), [(0, 0), (size // 2, size // 2)], dimension_numbers=dn
    )
    return x[:, 0].transpose(1, 2, 0)


def ssim_map(a: jax.Array, b: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Per-pixel SSIM map between two [H, W, C] images (SAME zero padding)."""
    w = _gaussian_window(size, sigma)
    mu_a, mu_b = _blur(a, w), _blur(b, w)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    # The fused E[x^2] - E[x]^2 estimator can go slightly negative in f32
    # (catastrophic cancellation on smooth bright regions), which lets the
    # per-pixel SSIM exceed 1 and the D-SSIM loss go negative (observed
    # once in the round-3 30k fit: loss -0.0097 at step 25400). Variances
    # are nonnegative by definition; clamp the noise away.
    sig_a = jnp.maximum(_blur(a * a, w) - mu_aa, 0.0)
    sig_b = jnp.maximum(_blur(b * b, w) - mu_bb, 0.0)
    sig_ab = _blur(a * b, w) - mu_ab
    num = (2 * mu_ab + SSIM_C1) * (2 * sig_ab + SSIM_C2)
    den = (mu_aa + mu_bb + SSIM_C1) * (sig_a + sig_b + SSIM_C2)
    return num / den


def ssim(a: jax.Array, b: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM between two [H, W, C] images in [0, 1]."""
    return jnp.mean(ssim_map(a, b, size, sigma))


def photometric_loss(
    rendered: jax.Array, target: jax.Array, ssim_weight: float = 0.2
) -> jax.Array:
    """(1 - lam) * L1 + lam * (1 - SSIM)."""
    l1 = jnp.mean(jnp.abs(rendered - target))
    if ssim_weight == 0.0:
        return l1
    return (1.0 - ssim_weight) * l1 + ssim_weight * (1.0 - ssim(rendered, target))


def psnr(rendered: jax.Array, target: jax.Array) -> jax.Array:
    mse = jnp.mean((rendered - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
