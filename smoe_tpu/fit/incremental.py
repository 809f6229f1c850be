"""Incremental kernel insertion.

Reference flow (smoe.py:1312-1483, driver smoe_test.py:221-245):
  1. reinit_inc: compute a per-pixel error map (1 - SSIM between image and
     reconstruction, YUV-weighted), find peaks, and re-initialize the "inc"
     kernel block: pi := median of live pis, nu := pixel value at peak,
     A := diag(16 * H / 8), mu := peak coordinate.
  2. train with train_inc=True (separate Adam states for the inc rows).
  3. apply_inc: splice the inc rows into the main block at kernel_count and
     reset the inc optimizer state.

The TF strided-assign + optimizer-slot surgery (smoe.py:442-452, 1288-1310)
becomes a functional row splice on the params pytree.

skimage is not a dependency: `ssim_map` reimplements
skimage.measure.compare_ssim(full=True) (uniform 7x7 window, unbiased
covariance) and `peak_local_max` the skimage peak picker (maximum filter,
min_distance spacing, border exclusion, top-num_peaks by intensity).
"""

from __future__ import annotations

from typing import Optional


import jax.numpy as jnp
import numpy as np
from scipy.ndimage import maximum_filter, uniform_filter

MIN_DISTANCE_PEAKS = 8    # reference smoe.py:1365


def ssim_map(img1: np.ndarray, img2: np.ndarray, data_range: float = 1.0,
             win_size: int = 7) -> np.ndarray:
    """Per-pixel, per-channel SSIM map matching skimage compare_ssim
    (uniform window, unbiased covariance; used at reference smoe.py:1322)."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    ndim = img1.ndim - 1
    npix = win_size ** ndim
    cov_norm = npix / (npix - 1)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def f(x):
        return uniform_filter(x, size=(win_size,) * ndim)

    out = np.empty_like(img1)
    for ch in range(img1.shape[-1]):
        x, y = img1[..., ch], img2[..., ch]
        ux, uy = f(x), f(y)
        uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        a1, a2 = 2 * ux * uy + c1, 2 * vxy + c2
        b1, b2 = ux ** 2 + uy ** 2 + c1, vx + vy + c2
        out[..., ch] = (a1 * a2) / (b1 * b2)
    return out


def peak_local_max(image: np.ndarray, num_peaks: int,
                   min_distance: int = MIN_DISTANCE_PEAKS) -> np.ndarray:
    """Top-`num_peaks` local maxima with `min_distance` spacing
    (skimage.feature.peak_local_max semantics, used at smoe.py:1377)."""
    size = 2 * min_distance + 1
    mx = maximum_filter(image, size=size, mode="constant", cval=-np.inf)
    mask = image == mx
    # exclude borders (skimage exclude_border=True -> min_distance)
    if min_distance > 0:
        for ax in range(image.ndim):
            sl = [slice(None)] * image.ndim
            sl[ax] = slice(0, min_distance)
            mask[tuple(sl)] = False
            sl[ax] = slice(image.shape[ax] - min_distance, None)
            mask[tuple(sl)] = False
    coords = np.argwhere(mask)
    if coords.shape[0] == 0:
        return coords
    vals = image[tuple(coords.T)]
    order = np.argsort(-vals, kind="stable")
    return coords[order[:num_peaks]]


def error_map(smoe) -> np.ndarray:
    """YUV-weighted 1-SSIM error map (reference smoe.py:1316-1324)."""
    rec = smoe.get_reconstruction()
    weights = [6 / 8, 1 / 8, 1 / 8] if smoe.cfg.use_yuv else None
    m = 1.0 - ssim_map(smoe.image, rec, data_range=1.0)
    if weights is not None and m.shape[-1] == 3:
        return np.average(m, axis=-1, weights=weights)
    return m.mean(axis=-1)


def reinit_inc(smoe, plot_dir: Optional[str] = None,
               threshold_rel: float = 0.2) -> None:
    """Refill the inc kernel block from error-map peaks
    (reference smoe.py:1405-1477).

    threshold_rel is accepted but unused, faithfully: the reference's live
    path calls peak_local_max(num_peaks, min_distance) only — its
    threshold_rel use is commented out (smoe.py:1326-1334 vs :1377)."""
    cfg = smoe.cfg
    assert cfg.add_kernel_slots > 0, "model built without add_kernel_slots"
    num_inc = smoe.num_inc_kernels

    diff = error_map(smoe)
    used = smoe.get_num_pis()[-1][1] if smoe.get_num_pis() else cfg.start_pis
    num_new = max(int(cfg.start_pis - used), 0)
    peaks = peak_local_max(diff, num_peaks=num_new)
    n = peaks.shape[0]
    a = 16.0 * smoe.image.shape[0] / MIN_DISTANCE_PEAKS   # smoe.py:1379

    d, c = cfg.dim_domain, smoe.image.shape[-1]
    cap = smoe.params.capacity

    musX_inc = np.zeros((num_inc, d), np.float32)
    pis_inc = np.zeros((num_inc,), np.float32)
    nu_inc = np.zeros((num_inc, c), np.float32)
    gamma_inc = np.zeros((num_inc, d, c), np.float32)
    a_diag_inc = np.zeros((num_inc, d, d), np.float32)
    a_corr_inc = np.zeros((num_inc, d, d), np.float32)

    if n > 0:
        # peak coords -> [0,1] domain (inclusive linspace: i/(n-1))
        denom = np.maximum(np.array(smoe.image.shape[:d]) - 1, 1)
        musX_inc[:n] = peaks[:, :d] / denom
        live = np.asarray(smoe.params.pis)
        live = live[live > 0]
        pis_inc[:n] = np.median(live) if live.size else 1.0 / cfg.start_pis
        nu_inc[:n] = smoe.image[tuple(peaks[:, :d].T)]
        # only the first TWO diagonal entries, like the reference
        # (smoe.py:1428-1429) — its inc path is written for 2D images
        for i in range(min(d, 2)):
            a_diag_inc[:n, i, i] = a

    if plot_dir:
        _plot_peaks(diff, peaks, plot_dir, smoe.iter)

    def splice(arr, new):
        arr = np.asarray(arr).copy()
        arr[cap - num_inc:] = new
        return jnp.asarray(arr)

    p = smoe.params
    smoe.params = p.replace(
        musX=splice(p.musX, musX_inc), pis=splice(p.pis, pis_inc),
        nu_e=splice(p.nu_e, nu_inc), gamma_e=splice(p.gamma_e, gamma_inc),
        a_diag=splice(p.a_diag, a_diag_inc),
        a_corr=splice(p.a_corr, a_corr_inc))

    # all blocks see all kernels until the next list refresh
    # (reference smoe.py:1477)
    smoe.kernel_lists = jnp.ones_like(smoe.kernel_lists)
    smoe.valid = False


def apply_inc(smoe) -> None:
    """Splice inc rows into the main block at kernel_count and reset the inc
    optimizer state (reference smoe.py:1479-1483).

    The inc tail keeps its (live) values after the splice, faithfully: the
    reference's forward concatenates main and inc variables (smoe.py:459+)
    and apply_inc only copies inc -> main (smoe.py:442-452), so the tail
    stays active there too until the next reinit_inc overwrites it."""
    cfg = smoe.cfg
    num_inc = smoe.num_inc_kernels
    cap = smoe.params.capacity
    pos = smoe.kernel_count
    assert pos + num_inc <= cap - num_inc, \
        "insert position overruns add_kernel_slots capacity"

    def move(arr):
        arr = np.asarray(arr).copy()
        arr[pos:pos + num_inc] = arr[cap - num_inc:]
        return jnp.asarray(arr)

    p = smoe.params
    smoe.params = p.replace(
        musX=move(p.musX), pis=move(p.pis), nu_e=move(p.nu_e),
        gamma_e=move(p.gamma_e), a_diag=move(p.a_diag),
        a_corr=move(p.a_corr))
    # fresh Adam state for the inc rows (reference reset_optimizers_op)
    smoe.inc_opt_state = smoe._compiled.tx_inc.init(smoe.params)
    smoe.kernel_count += num_inc
    smoe.valid = False


def _plot_peaks(diff, peaks, plot_dir, iteration):
    import os
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(plot_dir, exist_ok=True)
    fig = plt.figure()
    img = diff if diff.ndim == 2 else diff[..., 0]
    plt.imshow(img, cmap="gray")
    plt.colorbar()
    plt.title(f"num peaks: {peaks.shape[0]}")
    if peaks.shape[0]:
        plt.scatter(peaks[:, 1], peaks[:, 0])
    plt.savefig(f"{plot_dir}/inc_{iteration}.png")
    plt.close(fig)
