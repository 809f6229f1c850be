"""Spatial block partitioning and per-block kernel locality lists.

The reference streams (optionally overlapping, zero-padded) blocks through
one TF graph with per-block feed dicts (sliding_window, reference
smoe.py:18-35; feed loop :1643-1702).  Here blocks are materialized ONCE as a
dense (B, Nb, d+C) device array so the whole sweep is a single lax.scan on
device — the TPU-native replacement for the reference's per-block host
round-trips (the dominant perf sin noted in SURVEY.md §3.1).

Kernel locality ("kernel lists", reference smoe.py:2244-2365) becomes a
(B, K) bool mask computed on device: block-center assignment at init, then
corner/edge probing with maha < 800 plus the influence-culling survivors fed
back after each sweep (reference smoe.py:1763-1766).
"""

from __future__ import annotations

from itertools import product
from typing import NamedTuple, Optional, Tuple


import jax.numpy as jnp
import numpy as np

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.init import gen_domain
from smoe_tpu.core.model import maha_from_A

MAHA_PROBE_THRESHOLD = 800.0   # reference smoe.py:806


class BlockSet(NamedTuple):
    """Static, device-resident blocked view of one image/video/LF."""
    coords: jnp.ndarray        # (B, Nb, d) pixel coordinates (zero in pad)
    targets: jnp.ndarray       # (B, Nb, C) pixel values   (zero in pad)
    valid: jnp.ndarray         # (Nb,) bool: interior (non-overlap) pixels
    probes: jnp.ndarray        # (B, P, d) block corner/edge/mid probe points
    centers: jnp.ndarray       # (B, d) block centers (mean coords incl. pad)
    image_shape: Tuple[int, ...]       # spatial dims
    block_valued: Tuple[int, ...]      # block size per dim without overlap
    block_padded: Tuple[int, ...]      # block size per dim with 2*overlap
    overlap: int
    train_mask: Optional[jnp.ndarray] = None   # (B, Nb) bool (LF corner views)
    # (B, Nb) int32 global raster index of each padded-block pixel; image-
    # edge pad positions point at the dummy row prod(spatial).  Present only
    # under cfg.sv_shared_grid (one SV per pixel shared across overlapping
    # blocks instead of per-block-window rows).
    sv_index: Optional[jnp.ndarray] = None


def row_chunks(nb: int, width: int, budget_bytes: int = 2 << 30) -> int:
    """Row-chunks per block for dense (rows, width) passes — the XLA eval
    forward and the LS normal-equation/line-search accumulations — sized
    so the gating map and its handful of same-shaped f32 temporaries stay
    inside a fixed HBM share.  Unchunked, a one-block video fit
    materializes the full (N, K) map, which stops compiling at production
    scale: 811008 px x 8192 kernels = 26.6 GB > 17 GB HBM on the k=32
    video fit (measured round 5).  Returns the smallest divisor of nb
    that meets the budget (1 = unchunked).  Row chunking is EXACT for the
    forward — gating/expert reductions run over the kernel axis, never
    across rows — and only reorders f32 partial sums in the LS
    accumulations."""
    est = int(max(1, -(-nb * width * 4 * 6 // budget_bytes)))
    if est <= 1:
        return 1
    s = est
    while nb % s:
        s += 1
    return s


def _block_view(arr: np.ndarray, bs: Tuple[int, ...], ov: int) -> np.ndarray:
    """(spatial..., F) -> (B, Nb, F) overlapping zero-padded blocks in the
    reference's row-major block order."""
    d = len(bs)
    f = arr.shape[-1]
    pad = [(ov, ov)] * d + [(0, 0)]
    a = np.pad(arr, pad, mode="constant")
    nb = [arr.shape[i] // bs[i] for i in range(d)]
    win = [bs[i] + 2 * ov for i in range(d)]
    blocks = np.empty((int(np.prod(nb)), int(np.prod(win)), f), arr.dtype)
    for bi, idx in enumerate(product(*[range(n) for n in nb])):
        sl = tuple(slice(idx[i] * bs[i], idx[i] * bs[i] + win[i]) for i in range(d))
        blocks[bi] = a[sl].reshape(-1, f)
    return blocks


def build_blockset(image: np.ndarray, cfg: SmoeConfig,
                   block_shape: Optional[Tuple[int, ...]] = None) -> BlockSet:
    """Partition an image into the device-resident BlockSet.

    image: (*spatial, C) float array in [0,1].
    block_shape: pixels per block per dim (must divide the image dims,
    reference smoe.py:238-241); defaults to cfg.block_shape or whole image.
    """
    d = cfg.dim_domain
    spatial = image.shape[:d]
    bs = tuple(block_shape or cfg.block_shape or spatial)
    assert len(bs) == d, f"block shape {bs} does not match domain dim {d}"
    for n, b in zip(spatial, bs):
        if n % b:
            raise ValueError(f"block shape {bs} does not divide image {spatial}")
    ov = cfg.overlap

    coords_grid = gen_domain(image, d)                    # (*spatial, d)
    joint = np.concatenate([coords_grid, image], axis=-1)
    blocks = _block_view(joint, bs, ov)                   # (B, Nb, d+C)
    coords = blocks[..., :d]
    targets = blocks[..., d:]

    win = tuple(b + 2 * ov for b in bs)
    interior = np.ones(win, dtype=bool)
    if ov > 0:
        sl = tuple(slice(ov, ov + b) for b in bs)
        interior = np.zeros(win, dtype=bool)
        interior[sl] = True
    valid = interior.reshape(-1)

    # probe points: product over dims of {min, max, mid} of each block's
    # coordinate range (reference smoe.py:2332-2354) — same helper the
    # trainer uses for motion-recomputed probes; numpy in, so it stays on
    # host (no device round trip at construction time)
    probes = probe_points(coords.min(axis=1), coords.max(axis=1),
                          grid=getattr(cfg, "probe_grid", 3))
    centers = blocks.mean(axis=1)[:, :d]

    train_mask = None
    if d >= 4:
        # per-block corner-view mask: blocked exactly like the pixel data so
        # a block-partitioned LF fit excludes the same views as a global fit
        # (reference masks the loss regardless of batching, smoe.py:902-904)
        tm = _lf_train_mask(spatial)[..., None].astype(np.float32)
        cw = float(getattr(cfg, "lf_corner_weight", 0.0))
        if cw > 0.0:
            # corner views ride the loss at weight cw instead of being
            # dropped (cfg.lf_corner_weight; attacks the trained/all-views
            # generalization gap) — float mask, consumed multiplicatively
            tm = tm + cw * (1.0 - tm)
            train_mask = jnp.asarray(_block_view(tm, bs, ov)[..., 0],
                                     jnp.float32)
        else:
            train_mask = jnp.asarray(_block_view(tm, bs, ov)[..., 0] > 0.5)

    sv_index = None
    if cfg.train_svs and getattr(cfg, "sv_shared_grid", False):
        # global raster index per padded-block pixel (shifted by 1 so the
        # zero pad decodes as -1 -> the dummy row n_pix)
        n_pix = int(np.prod(spatial))
        idxf = np.arange(1, n_pix + 1, dtype=np.int64).reshape(
            spatial + (1,))
        iv = _block_view(idxf, bs, ov)[..., 0] - 1
        iv[iv < 0] = n_pix
        sv_index = jnp.asarray(iv, jnp.int32)

    return BlockSet(
        coords=jnp.asarray(coords, jnp.float32),
        targets=jnp.asarray(targets, jnp.float32),
        valid=jnp.asarray(valid),
        probes=jnp.asarray(probes, jnp.float32),
        centers=jnp.asarray(centers, jnp.float32),
        image_shape=spatial, block_valued=bs, block_padded=win,
        overlap=ov, train_mask=train_mask, sv_index=sv_index)


def _lf_train_mask(spatial: Tuple[int, ...]) -> np.ndarray:
    """Hardcoded 15x15 light-field view mask excluding corner views
    (reference smoe.py:2374-2389)."""
    m = np.ones(spatial, dtype=bool)
    m[0, 0:4] = False; m[0, 11:] = False
    m[1, 0:2] = False; m[1, 13:] = False
    m[2:4, 0] = False; m[2:4, 14] = False
    m[11:13, 0] = False; m[11:13, 14] = False
    m[13, 0:2] = False; m[13, 13:] = False
    m[14, 0:4] = False; m[14, 11:] = False
    return m


def stitch_blocks(block_vals: jnp.ndarray, bset: BlockSet) -> jnp.ndarray:
    """(B, Nb, F) block outputs -> (*spatial, F) image (interior crop).

    Inverse of _block_view (reference stitches on host, smoe.py:1719-1756).
    """
    d = len(bset.block_valued)
    f = block_vals.shape[-1]
    win = bset.block_padded
    bs = bset.block_valued
    ov = bset.overlap
    nb = [s // b for s, b in zip(bset.image_shape, bs)]
    x = block_vals.reshape(tuple(nb) + tuple(win) + (f,))
    if ov > 0:
        sl = tuple([slice(None)] * d +
                   [slice(ov, ov + b) for b in bs] + [slice(None)])
        x = x[sl]
    # interleave block-grid dims with in-block dims: (n0, b0, n1, b1, ..., F)
    perm = []
    for i in range(d):
        perm += [i, d + i]
    perm += [2 * d]
    x = jnp.transpose(x, perm)
    return x.reshape(tuple(bset.image_shape) + (f,))


# ---------------- kernel locality lists ----------------

def initialize_kernel_lists(A: jnp.ndarray, musX: jnp.ndarray,
                            pis: jnp.ndarray, cfg: SmoeConfig,
                            bset: BlockSet) -> jnp.ndarray:
    """(B, K) bool: each kernel assigned to its nearest block center by maha,
    then extended by probe points (reference smoe.py:2244-2285).

    Takes the effective assembled tensors (post-QAT) like the reference's
    graph-side maha op does.
    """
    B = bset.centers.shape[0]
    maha = maha_from_A(A, musX, cfg, bset.centers)         # (B, K)
    nearest = jnp.argmin(maha, axis=0)                     # (K,)
    lists = nearest[None, :] == jnp.arange(B)[:, None]     # (B, K)
    # dead slots (zero-padded inc/add capacity, pis <= 0) have maha == 0
    # everywhere and would all land in block 0 (the reference feeds an
    # all-ones kernel_list and has the same tie, smoe.py:2267-2270);
    # masking them keeps the capped-dense width honest — they contribute
    # nothing anyway (pi = 0 => no influence)
    lists = lists & (pis > 0)[None, :]
    return update_kernel_lists(A, musX, pis, cfg, bset, lists)


def probe_points(mins, maxs, grid: int = 3):
    """(B, d) min/max per block -> (B, grid^d, d) per-dim-linspace product
    probe points.  grid=3 gives the reference's {min, max, mid} set
    (smoe.py:2332-2354); grid=5 halves the probe spacing — a SHARP kernel
    just outside the box can clear the maha threshold at every 3-grid
    probe yet still reach interior pixels (measured ~1.2 dB of eval-vs-
    dense gap on the CIF k=24 fit), and a finer grid shrinks that leak at
    negligible cost (the probe maha is a (B*grid^d, K) matmul).

    Array-library generic: numpy in stays on host (block-set construction),
    jnp in stays on device (the trainer's motion-recomputed probes)."""
    xp = np if isinstance(mins, np.ndarray) else jnp
    d = mins.shape[1]
    fr = np.linspace(0.0, 1.0, grid).astype(np.float32)    # (g,)
    tt = mins[:, :, None] + (maxs - mins)[:, :, None] * fr  # (B, d, g)
    idx = np.array(list(product(range(grid), repeat=d)))   # (g^d, d)
    return tt[:, np.arange(d)[None, :], idx]               # (B, g^d, d)


def update_kernel_lists(A: jnp.ndarray, musX: jnp.ndarray, pis: jnp.ndarray,
                        cfg: SmoeConfig, bset: BlockSet,
                        lists: jnp.ndarray,
                        probes: Optional[jnp.ndarray] = None,
                        probes_raw: Optional[jnp.ndarray] = None,
                        model_mask: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """OR in all active kernels whose maha to any block probe point < 800
    (reference smoe.py:2287-2365).

    probes: override probe points (motion-transformed domain for video,
    reference smoe.py:2292-2317); probes_raw + model_mask route dual-model
    kernels to their own domain's probes.
    """
    pr = bset.probes if probes is None else probes
    B, P, d = pr.shape
    maha = maha_from_A(
        A, musX, cfg, pr.reshape(B * P, d),
        coords_raw=None if probes_raw is None
        else probes_raw.reshape(B * P, d),
        model_mask=model_mask)
    maha = maha.reshape(B, P, A.shape[0])
    thr = getattr(cfg, "probe_maha_threshold", MAHA_PROBE_THRESHOLD)
    near = jnp.any(maha < thr, axis=1)                     # (B, K)
    # center-inside-block criterion: a SHARP kernel deep inside a block
    # can read maha > thr at every boundary/center probe (A ~ 1000 at
    # 0.03 from the nearest probe exceeds even the reference's 800) yet
    # dominate its neighborhood — the probe grid's known blind spot
    # (reference smoe.py:2332-2354 has it too).  Membership by center box
    # test closes it for ~free and makes tight thresholds (pmt 50) safe.
    def _inside(points, probe_box):
        lo = probe_box.min(axis=1)                         # (B, d)
        hi = probe_box.max(axis=1)
        return jnp.all((points[None, :, :] >= lo[:, None, :])
                       & (points[None, :, :] <= hi[:, None, :]), axis=-1)
    inside = _inside(musX, pr)
    if probes_raw is not None and model_mask is not None:
        # model_mask False = model-1 kernels live on the RAW domain
        # (maha_from_A routes them to coords_raw the same way)
        inside = jnp.where(model_mask[None, :], inside,
                           _inside(musX, probes_raw))
    near = near | inside
    active = pis > 0
    return lists | (near & active[None, :])
