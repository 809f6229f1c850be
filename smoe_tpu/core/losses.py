"""Losses and regularizers.

Reference smoe.py:902-1053:
  * eps-insensitive squared error: max(0, (|res-target| - eps))^2, with
    eps = margin / 2^precision and optional per-pixel loss weights
  * YUV channel weighting 6/8 : 1/8 : 1/8
  * SSIM alternative (see core/ssim.py)
  * L1 on pis (sparsification), L1 on diag(A) (bandwidth), SV L1-L2
  * reported MSE scaled by (2^precision)^2 so PSNR = 10 log10((2^p)^2 / mse)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.params import SmoeParams, diag_of_A


class LossAux(NamedTuple):
    mse: jnp.ndarray          # scaled by (2^p)^2
    err_map: jnp.ndarray      # per-pixel mean-channel squared error
    loss_pixel: jnp.ndarray


def pixel_loss(res: jnp.ndarray, target: jnp.ndarray, cfg: SmoeConfig,
               loss_weights: Optional[jnp.ndarray] = None,
               valid_mask: Optional[jnp.ndarray] = None) -> LossAux:
    """eps-insensitive data term over a flat (N, C) block.

    `valid_mask` (N,) combines the overlap crop (reference smoe.py:909-923)
    and the 4D train mask (smoe.py:902-904): masked-out pixels contribute
    neither to the loss nor to the mean's denominator.
    """
    diff = res - target
    if valid_mask is not None:
        # linear per-pixel weight: bool masks (overlap crop / LF view mask)
        # behave bit-identically to the previous residual-scaling form
        # (vm in {0,1} => vm^2 == vm); float masks (cfg.lf_corner_weight)
        # weight the squared error linearly, matching the LS solve's row
        # weights (fit/lsinit.py)
        vm = valid_mask.astype(res.dtype)[:, None]
        denom = jnp.maximum(jnp.sum(valid_mask), 1.0)
    else:
        vm = None
        denom = jnp.asarray(float(res.shape[0]), res.dtype)

    sq = jnp.square(diff)
    if vm is not None:
        sq = sq * vm
    mse = jnp.sum(sq) / (denom * res.shape[1]) * float(2 ** cfg.precision) ** 2

    eps = cfg.epsilon
    lp = jnp.maximum(0.0, jnp.square(jnp.abs(diff) - eps))
    # masked-out pixels: |0| - eps < 0 -> max(0, (. )^2) is (eps)^2 > 0, so
    # mask explicitly.
    if vm is not None:
        lp = lp * vm
    if loss_weights is not None:
        lp = lp * loss_weights[:, None]
    if cfg.use_yuv and res.shape[1] == 3:
        per_chan = jnp.sum(lp, axis=0) / denom                  # (3,)
        loss = 6.0 / 8.0 * per_chan[0] + 1.0 / 8.0 * (per_chan[1] + per_chan[2])
    else:
        loss = jnp.sum(lp) / (denom * res.shape[1])

    err_map = jnp.mean(sq, axis=1)          # reference smoe.py:906 (sampling prob)
    return LossAux(mse=mse, err_map=err_map, loss_pixel=loss)


def pis_l1_reg(params: SmoeParams, cfg: SmoeConfig, active_mask: jnp.ndarray,
               weight: jnp.ndarray, num_active: jnp.ndarray) -> jnp.ndarray:
    """L1 sparsifier on the active pis (reference smoe.py:1018-1027).

    Normalizer is start_pis, or the live kernel count when
    kernel_count_as_norm_l1 (smoe_test.py flag -kcn).
    """
    s = jnp.sum(jnp.where(active_mask, params.pis, 0.0))
    norm = num_active.astype(jnp.float32) if cfg.kernel_count_as_norm_l1 \
        else float(cfg.start_pis)
    return weight * s / norm


def bandwidth_l1_reg(params: SmoeParams, cfg: SmoeConfig,
                     active_mask: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """u_l1 * sum(diag(A)) over active kernels (reference smoe.py:1044)."""
    diag = diag_of_A(params, cfg)                              # (K, d)
    return weight * jnp.sum(jnp.where(active_mask[:, None], diag, 0.0))


def sv_l1_sub_l2_reg(sv: jnp.ndarray, weight: jnp.ndarray,
                     block_pixels: int) -> jnp.ndarray:
    """Support-vector L1 - L2 penalty (reference smoe.py:1029-1036)."""
    p1 = jnp.sum(jnp.abs(sv))
    p2 = jnp.sqrt(jnp.sum(jnp.square(sv)) + 1e-9)
    return weight * 0.1 * (p1 - p2) / float(block_pixels)


def psnr_from_mse(mse: float, precision: int) -> float:
    """PSNR given the pre-scaled MSE (reference plotter.py:14-15).
    A perfect reconstruction (mse == 0) reports the ~144 dB f32 ceiling
    instead of dividing by zero."""
    import numpy as np
    return float(10.0 * np.log10((2 ** precision) ** 2 / max(mse, 1e-12)))
