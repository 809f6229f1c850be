"""SSIM (2D images and 3D volumes) in JAX.

Re-implements the semantics of the reference's forked TF SSIM
(reference ops/image_ops_impl.py:77-233 `custom_ssim`): 11-tap Gaussian
window sigma=1.5, K1=0.01, K2=0.03, compensation=1, VALID padding, returning
per-channel SSIM means.  The loss path symmetric-pads by 5 first so the
VALID conv covers every pixel (reference smoe.py:993-1004).

TPU note: the reference builds the window as softmax(g_i + g_j [+ g_k])
which factorizes exactly into a product of 1D softmax windows, so we run
separable 1D convolutions (O(n * taps * d) instead of O(n * taps^d)) with
bit-identical weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_K1 = 0.01
_K2 = 0.03
FILTER_SIZE = 11
FILTER_SIGMA = 1.5


@functools.lru_cache()
def _gauss_1d(size: int = FILTER_SIZE, sigma: float = FILTER_SIGMA) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-0.5 * coords ** 2 / sigma ** 2)
    return (g / g.sum()).astype(np.float32)


def _separable_reduce(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Valid-mode separable Gaussian filter over the first `ndim` axes of
    an (*spatial, C) array."""
    w = jnp.asarray(_gauss_1d())
    taps = w.shape[0]
    for axis in range(ndim):
        x = jnp.moveaxis(x, axis, -1)
        # windowed weighted sum along last axis, VALID
        n = x.shape[-1]
        out = jnp.zeros(x.shape[:-1] + (n - taps + 1,), x.dtype)
        for t in range(taps):
            out = out + w[t] * jax.lax.slice_in_dim(x, t, t + n - taps + 1, axis=-1)
        x = jnp.moveaxis(out, -1, axis)
    return x


def ssim_per_channel(img1: jnp.ndarray, img2: jnp.ndarray,
                     max_val: float = 1.0, ndim: int = 2) -> jnp.ndarray:
    """Per-channel SSIM of (*spatial, C) arrays; returns (C,).

    Matches reference ops/image_ops_impl.py:106-128 (biased covariance,
    compensation=1).
    """
    c1 = (_K1 * max_val) ** 2
    c2 = (_K2 * max_val) ** 2

    mean0 = _separable_reduce(img1, ndim)
    mean1 = _separable_reduce(img2, ndim)
    num0 = mean0 * mean1 * 2.0
    den0 = jnp.square(mean0) + jnp.square(mean1)
    luminance = (num0 + c1) / (den0 + c1)

    num1 = _separable_reduce(img1 * img2, ndim) * 2.0
    den1 = _separable_reduce(jnp.square(img1) + jnp.square(img2), ndim)
    cs = (num1 - num0 + c2) / (den1 - den0 + c2)

    axes = tuple(range(ndim))
    return jnp.mean(luminance * cs, axis=axes)


def ssim_loss(res: jnp.ndarray, target: jnp.ndarray, use_yuv: bool,
              ndim: int = 2, max_val: float = 1.0) -> jnp.ndarray:
    """1 - SSIM with the reference's symmetric pad + YUV 6/1/1 weighting
    (reference smoe.py:981-1010)."""
    pad = [(5, 5)] * ndim + [(0, 0)]
    res_p = jnp.pad(res, pad, mode="symmetric")
    tgt_p = jnp.pad(target, pad, mode="symmetric")
    per_chan = ssim_per_channel(res_p, tgt_p, max_val=max_val, ndim=ndim)
    if use_yuv and per_chan.shape[0] == 3:
        w = jnp.asarray([6.0, 1.0, 1.0], per_chan.dtype)
        s = jnp.sum(per_chan * w) / 8.0
    else:
        s = jnp.mean(per_chan)
    return 1.0 - s
