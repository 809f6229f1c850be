"""Fused SMoE gate+expert Pallas TPU kernel.

This is the hot op of the whole framework (SURVEY.md §3.5): for every
(pixel, kernel) pair the reference evaluates

    maha -> exp(-0.5 maha) -> pi-weighted softmax gating -> influence cull
         -> affine expert mix                      (reference smoe.py:791-848)

as separate TF graph ops, which on TPU under XLA materializes several
(N, K) float32 intermediates in HBM per training step (maha, exp, weights,
culled weights) — for a 512x512 fit with K=144 that is ~150 MB of HBM
traffic per intermediate per direction.  This kernel fuses the entire chain
into ONE pass over pixel tiles with everything kept in VMEM:

    inputs   phiT (F, N)  quadratic features  phi(x) = [vec(x x^T), x, 1]
             xeT  (E, N)  expert features     xe(x)  = [x, 1]
             q    (K, F)  kernel quadratics   (see core/model.py docstring)
             G    (K, E*C) expert affine      G_k = [gamma_k; nu_k]
             pi_det (K,)  pi_k * det-normalizer, 0 for dead kernels
             mask (K,)    kernel liveness (kernel list & pis > 0)
    outputs  res  (N, C)  gated expert mix (pre clip/fake-quant)
             surv (K,)    influence-culling survivor flags

per pixel tile (TN pixels):
    maha  = phi @ q^T                          one (TN,F)x(F,K) MXU matmul
    n_w   = exp(-0.5 * maha * mask) * pi_det   VPU
    w     = n_w / max(floor, sum_k n_w)        VPU (denominator reduce)
    w     = w * (w > thr)                      influence cull (smoe.py:825)
    wg    = w @ G                              one (TN,K)x(K,E*C) MXU matmul
    res   = sum_j xe[:, j] * wg[:, j*C:(j+1)*C]

The backward pass is a second Pallas kernel that recomputes the (TN, K)
tiles (flash-attention style: recompute beats storing (N, K) residuals) and
accumulates dq, dG, dpi_det across pixel tiles.  phi/xe are treated as
constants (coords carry no gradient; the motion-compensated video path where
they would falls back to the XLA forward).

Gradient semantics match the XLA path exactly: the cull mask (w > thr) and
the denominator floor are straight-through constants (TF treats the cast
compare and the max-with-constant the same way), and the maha >= 0 clamp
backward uses jnp.minimum's exact subgradient (1 / 0.5 at the tie / 0
where clamped) — see `clamp_f` in _bwd_kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


import os

_TILE_BYTES = int(os.environ.get("SMOE_PALLAS_TILE_BYTES", 2 * 1024 * 1024))
_TILE_CAP = int(os.environ.get("SMOE_PALLAS_TILE_CAP", 1024))


def _tile_n(k_pad: int, f_pad: int = 8, bwd: bool = False) -> int:
    """Pixel-tile size: keep each live (TN, K) f32 intermediate at
    ~_TILE_BYTES so several fit in ~16 MB VMEM (tunable via
    SMOE_PALLAS_TILE_BYTES / SMOE_PALLAS_TILE_CAP for experiments).

    f_pad widens the per-pixel VMEM footprint (phi tiles + the backward's
    dq accumulator traffic): the dual-domain video features (f_pad=32)
    at k_pad=1280 measured 16.95M scoped VMEM against the 16M limit with
    the k-only budget — a 6% overflow that killed the fused backward's
    compile (CIF k=16 reseed run, round 3).  Folding 4*f_pad into the
    denominator shrinks the tile exactly where the wide features bite
    (1280/32: TN 512 -> 384) and leaves the image configs' tiles
    unchanged (256/8: 1024; 2560/8: 256).

    bwd + f_pad>8 (the dual-domain video BACKWARD): Mosaic's scoped stack
    holds ~6 live (TN, K) f32 intermediates at once — measured 27 bytes
    per (pixel, kernel) pair (18.66M @ TN=256/K_pad=2944 and 16.96M @
    TN=384/K_pad=1664, both >16M compile faults in the CIF k=24/k=16
    reseed runs, round 3; 12.8M @ TN=384/K_pad=1280 compiled fine).
    Size the tile against a 13 MB budget with that measured rate and
    round DOWN, so the reseed-grown capped widths can't overflow the
    scoped-VMEM limit again."""
    if bwd and f_pad > 8:
        tn = (13 * 1024 * 1024) // (27 * k_pad + 16 * f_pad)
        # Mosaic requires the pixel (lane) axis of every block to be
        # 128-divisible — a sub-128 tile fails lowering outright (hit at
        # k_pad ~ 4736 when in-graph refresh widened the CIF cap, round
        # 3).  128 is the floor; at k_pad beyond ~4.7k the scoped VMEM
        # estimate rides the ~16 MB limit, so tighten
        # cfg.probe_maha_threshold (or use the XLA path) there.
        return max(128, min(_TILE_CAP, (tn // 128) * 128))
    tn = _TILE_BYTES // (4 * (k_pad + 4 * f_pad))
    tn = max(128, min(_TILE_CAP, tn))
    return _round_up(tn, 128)


def _pad_axis(x, axis: int, to: int):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - x.shape[axis])
    return jnp.pad(x, pad) if pad[axis][1] else x


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(phiT_ref, xeT_ref, qT_ref, G_ref, pi_det_ref,
                res_ref, surv_ref, *, e_dim: int, c_dim: int, n_actual: int,
                tile_n: int, thr: float, floor: float, bf16: bool):
    i = pl.program_id(0)

    phiT = phiT_ref[:]                        # (F, TN)
    qT = qT_ref[:]                            # (F, K)  PRE-SCALED -0.5*mask*q
    pi_det = pi_det_ref[:]                    # (1, K)
    if bf16:
        phiT = phiT.astype(jnp.bfloat16)
        qT = qT.astype(jnp.bfloat16)

    # The caller pre-scales q' = -0.5 * mask * q (exact: power-of-two scale;
    # dead kernels' rows zeroed so they cannot produce inf, smoe.py:738),
    # so mh == -0.5 * max(maha, 0) with NO per-(pixel, kernel) multiplies —
    # the gating chain is VPU-bound and every elementwise op here costs
    # ~10% of the kernel.  min(., 0) is the maha >= 0 Cholesky clamp.
    #
    # precision=HIGHEST is REQUIRED, not a nicety: Mosaic's default f32
    # dot truncates inputs to bf16 (one MXU pass), and the quadratic-
    # feature maha cancels A^2-scale terms — at the steering sharpness
    # real photographs train to (B ~ 1e4), the default's absolute maha
    # error reaches ~1e3 where exp(-0.5 maha) needs ~1e-2 (measured;
    # the hopper fit stalled at 15.8 dB fused vs 21.8 dB XLA-exact on
    # the SAME chip, and dequantized-param evals read 14 dB low).  The
    # F=8 contraction is bandwidth-bound, so the extra passes measured
    # FREE at bench geometries (512^2/K=144: 1.55 vs 2.19 ms for the
    # standalone dot).
    mh = jnp.minimum(jax.lax.dot_general(
        phiT, qT, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST), 0.0)   # (TN, K)
    n_w = jnp.exp(mh) * pi_det
    denom = jnp.maximum(floor, jnp.sum(n_w, axis=1, keepdims=True))
    w = n_w / denom
    w = jnp.where(w > thr, w, 0.0)            # influence cull (smoe.py:825)

    # survivor flags: OR over this tile's valid rows, accumulated over
    # tiles.  Row masking (iota + compare + select over (TN, K)) only runs
    # on the tail tile that actually contains padding.
    def surv_update(w_s):
        sv = jnp.max(w_s, axis=0, keepdims=True)       # (1, K)

        @pl.when(i == 0)
        def _():
            surv_ref[:] = sv

        @pl.when(i > 0)
        def _():
            surv_ref[:] = jnp.maximum(surv_ref[:], sv)

    full = (i + 1) * tile_n <= n_actual

    @pl.when(full)
    def _():
        surv_update(w)

    @pl.when(jnp.logical_not(full))
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0) + i * tile_n
        surv_update(jnp.where(row < n_actual, w, 0.0))

    # expert mix: res[n, c] = sum_j xe[j, n] * (w @ G)[n, j*C + c]
    # (default precision is fine HERE: w in [0,1] summing to <= 1 and
    # G ~ O(1) are well-scaled — no cancellation — and the K-deep
    # contraction is the one real MXU matmul in the kernel, so extra
    # passes cost real time: HIGHEST on all dots measured 4.61 ms/iter
    # vs 3.4 on the 512^2 bench.  Only the maha dots need exactness.)
    wg = jnp.dot(w, G_ref[:], preferred_element_type=jnp.float32)  # (TN, E*C)
    xeT = xeT_ref[:]                          # (E, TN)
    res = jnp.zeros((w.shape[0], c_dim), jnp.float32)
    for j in range(e_dim):
        res = res + xeT[j, :][:, None] * wg[:, j * c_dim:(j + 1) * c_dim]
    res_ref[:] = res


def _fwd_call(phiT, xeT, q, G, pi_det, *, thr, floor, c_dim,
              n_actual, interpret, bf16):
    f_pad, n_pad = phiT.shape
    e_pad = xeT.shape[0]
    k_pad = q.shape[0]
    ec = G.shape[1]
    e_dim = ec // c_dim
    tn = _tile_n(k_pad, f_pad)
    n_tiles = n_pad // tn

    kern = functools.partial(
        _fwd_kernel, e_dim=e_dim, c_dim=c_dim, n_actual=n_actual,
        tile_n=tn, thr=thr, floor=floor, bf16=bf16)
    res, surv = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((f_pad, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_pad, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, ec), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tn, c_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, c_dim), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(phiT, xeT, q.T, G, pi_det[None, :])
    return res, surv


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(phiT_ref, xeT_ref, qT_ref, G_ref, pi_det_ref,
                g_ref, dq_ref, dG_ref, dpi_ref, *, e_dim: int, c_dim: int,
                thr: float, floor: float, bf16: bool):
    i = pl.program_id(0)

    phiT = phiT_ref[:]
    qT = qT_ref[:]                            # PRE-SCALED -0.5*mask*q
    pi_det = pi_det_ref[:]
    G = G_ref[:]
    g = g_ref[:]                              # (TN, C) cotangent of res
    phiT_c = phiT.astype(jnp.bfloat16) if bf16 else phiT
    qT_c = qT.astype(jnp.bfloat16) if bf16 else qT

    # --- recompute forward tile (see _fwd_kernel for the q' prescale;
    # precision=HIGHEST required there and here for the same reason) ---
    mh_raw = jax.lax.dot_general(
        phiT_c, qT_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    mh = jnp.minimum(mh_raw, 0.0)             # maha >= 0 Cholesky clamp
    e_term = jnp.exp(mh)                      # (TN, K)
    n_w = e_term * pi_det
    raw = jnp.sum(n_w, axis=1, keepdims=True)
    denom = jnp.maximum(floor, raw)
    w_tilde = n_w / denom
    cull = (w_tilde > thr).astype(jnp.float32)
    w = w_tilde * cull

    # --- backward ---
    # dwg[n, j*C+c] = xe[j, n] * g[n, c]
    xeT = xeT_ref[:]
    dwg_cols = []
    for j in range(e_dim):
        dwg_cols.append(xeT[j, :][:, None] * g)
    dwg = jnp.concatenate(dwg_cols, axis=1)   # (TN, E*C)

    # dG += w^T @ dwg
    dG_tile = jax.lax.dot_general(
        w, dwg, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (K, E*C)

    # dw = dwg @ G^T ; through the cull mask (straight-through)
    dw = jax.lax.dot_general(
        dwg, G, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # (TN, K)
    dwt = dw * cull

    # through the normalization: w_tilde = n_w / max(floor, sum n_w)
    s = jnp.sum(dwt * w_tilde, axis=1, keepdims=True)      # (TN, 1)
    live = (raw > floor).astype(jnp.float32)
    dn_w = (dwt - s * live) / denom                         # (TN, K)

    # dpi_det += sum_n dn_w * e_term; the kernel accumulates the gradient
    # w.r.t. the PRE-SCALED q' (dmh = dn_w * n_w); the -0.5*mask chain
    # factor is applied outside on the tiny (K, F) result
    dpi_tile = jnp.sum(dn_w * e_term, axis=0, keepdims=True)   # (1, K)
    # through the maha clamp with jnp.minimum's exact subgradient
    # (1 below 0, 0.5 at the tie, 0 where clamped) so fused grads match
    # the XLA path's jnp.maximum(maha, 0) on cancellation-negative maha
    clamp_f = 0.5 * ((mh_raw < 0).astype(jnp.float32)
                     + (mh_raw <= 0).astype(jnp.float32))
    dmh = dn_w * n_w * clamp_f                                 # (TN, K)

    # dq' += dmh^T @ phi   ((K, TN) x (TN, F))
    dq_tile = jax.lax.dot_general(
        dmh, phiT, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)   # (K, F)

    @pl.when(i == 0)
    def _():
        dq_ref[:] = dq_tile
        dG_ref[:] = dG_tile
        dpi_ref[:] = dpi_tile

    @pl.when(i > 0)
    def _():
        dq_ref[:] = dq_ref[:] + dq_tile
        dG_ref[:] = dG_ref[:] + dG_tile
        dpi_ref[:] = dpi_ref[:] + dpi_tile


def _bwd_call(phiT, xeT, q, G, pi_det, g, *, thr, floor, c_dim,
              interpret, bf16):
    f_pad, n_pad = phiT.shape
    e_pad = xeT.shape[0]
    k_pad = q.shape[0]
    ec = G.shape[1]
    e_dim = ec // c_dim
    tn = _tile_n(k_pad, f_pad, bwd=True)
    if n_pad % tn:
        # the caller padded n to the FORWARD tile; re-pad to the (possibly
        # smaller) backward tile — extra rows carry zero cotangent, so all
        # their grad contributions vanish (same mechanism as the n_actual
        # padding)
        n_pad = _round_up(n_pad, tn)
        phiT = _pad_axis(phiT, 1, n_pad)
        xeT = _pad_axis(xeT, 1, n_pad)
        g = _pad_axis(g, 0, n_pad)
    n_tiles = n_pad // tn

    kern = functools.partial(_bwd_kernel, e_dim=e_dim, c_dim=c_dim,
                             thr=thr, floor=floor, bf16=bf16)
    dq, dG, dpi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((f_pad, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_pad, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, ec), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, c_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k_pad, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, ec), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, ec), jnp.float32),
            jax.ShapeDtypeStruct((1, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(phiT, xeT, q.T, G, pi_det[None, :], g)
    return dq, dG, dpi[0]


# ---------------------------------------------------------------------------
# public custom-vjp op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_gate_expert(phi, xe, q, G, pi_det, mask,
                      thr: float, floor: float, n_actual: int,
                      interpret: bool,
                      bf16: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused gate+expert forward.

    phi (N, F) quadratic features; xe (N, E) expert features; q (K, F)
    kernel quadratics; G (K, E*C) affine experts; pi_det (K,) pi*det
    (zeroed for dead kernels); mask (K,) float32 1/0 liveness.
    Returns (res (N, C) pre-clip, surv (K,) max gating weight per kernel).
    Gradients flow to q, G, pi_det only (phi/xe treated as constants).
    """
    res, surv = _fused_fwd_impl(phi, xe, q, G, pi_det, mask, thr, floor,
                                n_actual, interpret, bf16)
    return res, surv


def _prep(phi, xe, q, G, pi_det, mask):
    n, f = phi.shape
    e = xe.shape[1]
    k = q.shape[0]
    f_pad = _round_up(f, 8)
    e_pad = _round_up(e, 8)
    k_pad = _round_up(k, 128)
    tn = _tile_n(k_pad, f_pad)
    n_pad = _round_up(n, tn)
    phiT = _pad_axis(_pad_axis(phi.T, 0, f_pad), 1, n_pad)
    xeT = _pad_axis(_pad_axis(xe.T, 0, e_pad), 1, n_pad)
    # prescale q' = -0.5 * mask * q: kills two per-(pixel, kernel) VPU
    # multiplies in the kernels; exact (power-of-two scale, 0/1 mask)
    q_s = q * (-0.5 * mask)[:, None]
    q_p = _pad_axis(_pad_axis(q_s, 0, k_pad), 1, f_pad)
    G_p = _pad_axis(G, 0, k_pad)
    pi_p = _pad_axis(pi_det, 0, k_pad)
    return phiT, xeT, q_p, G_p, pi_p


def _fused_fwd_impl(phi, xe, q, G, pi_det, mask, thr, floor, n_actual,
                    interpret, bf16=False):
    n, _ = phi.shape
    k = q.shape[0]
    c_dim = G.shape[1] // xe.shape[1]
    phiT, xeT, q_p, G_p, pi_p = _prep(phi, xe, q, G, pi_det, mask)
    res, surv = _fwd_call(phiT, xeT, q_p, G_p, pi_p, thr=thr,
                          floor=floor, c_dim=c_dim, n_actual=n_actual,
                          interpret=interpret, bf16=bf16)
    return res[:n], surv[0, :k]


def _fused_fwd(phi, xe, q, G, pi_det, mask, thr, floor, n_actual, interpret,
               bf16=False):
    out = _fused_fwd_impl(phi, xe, q, G, pi_det, mask, thr, floor,
                          n_actual, interpret, bf16)
    return out, (phi, xe, q, G, pi_det, mask)


def _fused_bwd(thr, floor, n_actual, interpret, bf16, residuals, cts):
    phi, xe, q, G, pi_det, mask = residuals
    g_res, _ = cts                       # surv carries no gradient
    n, f = phi.shape
    k = q.shape[0]
    ec = G.shape[1]
    c_dim = ec // xe.shape[1]
    phiT, xeT, q_p, G_p, pi_p = _prep(phi, xe, q, G, pi_det, mask)
    g_pad = _pad_axis(g_res.astype(jnp.float32), 0, phiT.shape[1])
    dq_s, dG, dpi = _bwd_call(phiT, xeT, q_p, G_p, pi_p, g_pad,
                              thr=thr, floor=floor, c_dim=c_dim,
                              interpret=interpret, bf16=bf16)
    # chain factor of the q' = -0.5 * mask * q prescale (see _prep)
    dq = dq_s[:k, :f] * (-0.5 * mask)[:, None]
    return (jnp.zeros_like(phi), jnp.zeros_like(xe),
            dq, dG[:k], dpi[:k], jnp.zeros_like(mask))


fused_gate_expert.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# pure-jnp reference (tests + non-TPU sanity)
# ---------------------------------------------------------------------------

def gate_expert_reference(phi, xe, q, G, pi_det, mask, thr, floor):
    """Bit-level reference of the fused op in plain jnp (same op order)."""
    maha = jnp.maximum(phi @ q.T, 0.0)
    n_w = jnp.exp(-0.5 * (maha * mask[None, :])) * pi_det[None, :]
    denom = jnp.maximum(floor, jnp.sum(n_w, axis=1, keepdims=True))
    w = n_w / denom
    w = jnp.where(w > thr, w, 0.0)
    wg = w @ G
    c_dim = G.shape[1] // xe.shape[1]
    res = sum(xe[:, j:j + 1] * wg[:, j * c_dim:(j + 1) * c_dim]
              for j in range(xe.shape[1]))
    surv = jnp.max(w, axis=0)
    return res, surv
