"""Block-sparse fused gate+expert kernel: skip inactive kernel tiles.

The reference's per-block kernel locality lists (reference smoe.py:2244-2365)
make each spatial block evaluate only its nearby kernels — SURVEY.md §5
marks this block-sparsity as the main perf lever for large (1080p+) fits.
The dense fused kernel (kernels/gate_expert.py) folds the list into a mask,
so masked kernels still burn MXU/VPU work.

Here the caller PACKS active kernels first (a stable argsort of the mask —
an O(K) XLA gather outside the kernel); the kernel derives the active count
from sum(mask) and loops over K-tiles with a dynamic trip count
`ceil(count / KT)`, so compute scales with the ACTIVE kernel fraction:

    pass 1: n_w tiles -> VMEM scratch (maha matmul + exp, skipped beyond count)
    gating: denominator / cull over the full scratch (inactive tiles are 0)
    pass 2: wg += w_tile @ G_tile  (expert matmul, skipped beyond count)

The backward recomputes the forward tiles (flash-attention style) with the
same dynamic bounds, accumulating dq/dG/dpi_det only for active tiles.
Numerics are identical to the dense kernel (zeros contribute nothing).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoe_tpu.kernels.gate_expert import _pad_axis, _round_up, _tile_n

KT = 256   # kernel-tile width (lane multiple)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(phiT_ref, xeT_ref, qT_ref, G_ref, pi_det_ref,
                mask_ref, res_ref, surv_ref, nw_ref, *, e_dim: int,
                c_dim: int, n_actual: int, tile_n: int, thr: float,
                floor: float):
    i = pl.program_id(0)
    # active-kernel count from the packed mask (active entries first); no
    # scalar input needed, so the op vmaps cleanly over blocks
    count = jnp.sum(mask_ref[:]).astype(jnp.int32)
    n_kt = pl.cdiv(count, KT)

    phiT = phiT_ref[:]                          # (F, TN)
    nw_ref[:] = jnp.zeros_like(nw_ref)          # inactive tiles stay 0

    def pass1(j, _):
        q_t = qT_ref[:, pl.ds(j * KT, KT)]      # (F, KT)
        m_t = mask_ref[:, pl.ds(j * KT, KT)]    # (1, KT)
        pd_t = pi_det_ref[:, pl.ds(j * KT, KT)]
        maha = jnp.maximum(jax.lax.dot_general(
            phiT, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), 0.0)
        nw_ref[:, pl.ds(j * KT, KT)] = jnp.exp(-0.5 * (maha * m_t)) * pd_t
        return 0

    jax.lax.fori_loop(0, n_kt, pass1, 0)

    # (Mosaic cannot dynamic-slice VALUES, only refs — so per-tile data is
    # re-read from the nw scratch ref and w recomputed per tile.)
    denom = jnp.maximum(floor,
                        jnp.sum(nw_ref[:], axis=1, keepdims=True))

    @pl.when(i == 0)
    def _():
        surv_ref[:] = jnp.zeros_like(surv_ref)

    tn_rows = jax.lax.broadcasted_iota(
        jnp.int32, (tile_n, KT), 0) + i * tile_n
    row_ok = tn_rows < n_actual

    def pass2(j, wg):
        nw_t = nw_ref[:, pl.ds(j * KT, KT)]          # (TN, KT)
        w_t = nw_t / denom
        w_t = jnp.where(w_t > thr, w_t, 0.0)
        sv_t = jnp.max(jnp.where(row_ok, w_t, 0.0), axis=0, keepdims=True)
        surv_ref[:, pl.ds(j * KT, KT)] = jnp.maximum(
            surv_ref[:, pl.ds(j * KT, KT)], sv_t)
        g_t = G_ref[pl.ds(j * KT, KT), :]
        return wg + jnp.dot(w_t, g_t, preferred_element_type=jnp.float32)

    wg = jax.lax.fori_loop(
        0, n_kt, pass2,
        jnp.zeros((tile_n, e_dim * c_dim), jnp.float32))

    xeT = xeT_ref[:]
    res = jnp.zeros((tile_n, c_dim), jnp.float32)
    for j in range(e_dim):
        res = res + xeT[j, :][:, None] * wg[:, j * c_dim:(j + 1) * c_dim]
    res_ref[:] = res


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(phiT_ref, xeT_ref, qT_ref, G_ref, pi_det_ref,
                mask_ref, g_ref, dq_ref, dG_ref, dpi_ref, nw_ref,
                *, e_dim: int, c_dim: int, thr: float, floor: float):
    i = pl.program_id(0)
    count = jnp.sum(mask_ref[:]).astype(jnp.int32)
    n_kt = pl.cdiv(count, KT)

    phiT = phiT_ref[:]
    g = g_ref[:]
    nw_ref[:] = jnp.zeros_like(nw_ref)

    @pl.when(i == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        dG_ref[:] = jnp.zeros_like(dG_ref)
        dpi_ref[:] = jnp.zeros_like(dpi_ref)

    def pass1(j, _):
        q_t = qT_ref[:, pl.ds(j * KT, KT)]
        m_t = mask_ref[:, pl.ds(j * KT, KT)]
        pd_t = pi_det_ref[:, pl.ds(j * KT, KT)]
        maha = jnp.maximum(jax.lax.dot_general(
            phiT, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), 0.0)
        nw_ref[:, pl.ds(j * KT, KT)] = jnp.exp(-0.5 * (maha * m_t)) * pd_t
        return 0

    jax.lax.fori_loop(0, n_kt, pass1, 0)

    raw = jnp.sum(nw_ref[:], axis=1, keepdims=True)
    denom = jnp.maximum(floor, raw)
    live = (raw > floor).astype(jnp.float32)

    xeT = xeT_ref[:]
    dwg_cols = []
    for j in range(e_dim):
        dwg_cols.append(xeT[j, :][:, None] * g)
    dwg = jnp.concatenate(dwg_cols, axis=1)      # (TN, E*C)

    # s[n] = sum_k dwt[n,k] w_tilde[n,k]  — accumulate over active tiles
    # (per-tile w recomputed from the nw scratch ref; Mosaic cannot
    # dynamic-slice values)
    def pass_s(j, s):
        g_t = G_ref[pl.ds(j * KT, KT), :]
        dw_t = jax.lax.dot_general(
            dwg, g_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (TN, KT)
        nw_t = nw_ref[:, pl.ds(j * KT, KT)]
        wt_t = nw_t / denom
        c_t = (wt_t > thr).astype(jnp.float32)
        return s + jnp.sum(dw_t * c_t * wt_t, axis=1, keepdims=True)

    s = jax.lax.fori_loop(0, n_kt, pass_s,
                          jnp.zeros((g.shape[0], 1), jnp.float32))

    def pass_grads(j, _):
        sl = pl.ds(j * KT, KT)
        q_t = qT_ref[:, sl]
        g_t = G_ref[sl, :]
        m_t = mask_ref[:, sl]
        nw_t = nw_ref[:, sl]
        wt_t = nw_t / denom
        c_t = (wt_t > thr).astype(jnp.float32)
        w_t = wt_t * c_t
        # recompute e_term = exp(-0.5 maha_m) exactly (nw/pd is unsafe for
        # dead kernels with pd == 0, whose dpi still needs e_term)
        maha = jnp.maximum(jax.lax.dot_general(
            phiT, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), 0.0)
        e_t = jnp.exp(-0.5 * (maha * m_t))

        dw_t = jax.lax.dot_general(
            dwg, g_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwt_t = dw_t * c_t
        dn_t = (dwt_t - s * live) / denom
        dpi_t = jnp.sum(dn_t * e_t, axis=0, keepdims=True)     # (1, KT)
        dmaha_t = -0.5 * dn_t * nw_t * m_t                      # (TN, KT)
        dq_t = jax.lax.dot_general(
            dmaha_t, phiT, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (KT, F)
        dG_t = jax.lax.dot_general(
            w_t, dwg, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (KT, EC)

        dq_ref[sl, :] = dq_ref[sl, :] + dq_t
        dG_ref[sl, :] = dG_ref[sl, :] + dG_t
        dpi_ref[:, sl] = dpi_ref[:, sl] + dpi_t
        return 0

    jax.lax.fori_loop(0, n_kt, pass_grads, 0)


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom vjp
# ---------------------------------------------------------------------------

def _specs(f_pad, e_pad, k_pad, ec, tn):
    in_specs = [
        pl.BlockSpec((f_pad, tn), lambda i: (0, i),
                     memory_space=pltpu.VMEM),                   # phiT
        pl.BlockSpec((e_pad, tn), lambda i: (0, i),
                     memory_space=pltpu.VMEM),                   # xeT
        pl.BlockSpec((f_pad, k_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                   # qT
        pl.BlockSpec((k_pad, ec), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                   # G
        pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                   # pi_det
        pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                   # mask
    ]
    return in_specs


def _fwd_call(phiT, xeT, q, G, pi_det, mask, *, thr, floor, c_dim,
              n_actual, interpret):
    f_pad, n_pad = phiT.shape
    e_pad = xeT.shape[0]
    k_pad = q.shape[0]
    ec = G.shape[1]
    e_dim = ec // c_dim
    tn = _tile_n(k_pad)
    n_tiles = n_pad // tn

    kern = functools.partial(
        _fwd_kernel, e_dim=e_dim, c_dim=c_dim, n_actual=n_actual,
        tile_n=tn, thr=thr, floor=floor)
    res, surv = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=_specs(f_pad, e_pad, k_pad, ec, tn),
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
        scratch_shapes=[pltpu.VMEM((tn, k_pad), jnp.float32)],
        interpret=interpret,
    )(phiT, xeT, q.T, G, pi_det[None, :], mask[None, :])
    return res, surv


def _bwd_call(phiT, xeT, q, G, pi_det, mask, g, *, thr, floor,
              c_dim, interpret):
    f_pad, n_pad = phiT.shape
    e_pad = xeT.shape[0]
    k_pad = q.shape[0]
    ec = G.shape[1]
    e_dim = ec // c_dim
    tn = _tile_n(k_pad)
    n_tiles = n_pad // tn

    kern = functools.partial(_bwd_kernel, e_dim=e_dim, c_dim=c_dim,
                             thr=thr, floor=floor)
    in_specs = _specs(f_pad, e_pad, k_pad, ec, tn)
    in_specs.append(pl.BlockSpec((tn, c_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))       # g
    dq, dG, dpi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=in_specs,
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
        scratch_shapes=[pltpu.VMEM((tn, k_pad), jnp.float32)],
        interpret=interpret,
    )(phiT, xeT, q.T, G, pi_det[None, :], mask[None, :], g)
    return dq, dG, dpi[0]


def _prep(phi, xe, q, G, pi_det, mask):
    n, f = phi.shape
    e = xe.shape[1]
    f_pad = _round_up(f, 8)
    e_pad = _round_up(e, 8)
    k_pad = _round_up(q.shape[0], KT)
    tn = _tile_n(k_pad)
    n_pad = _round_up(n, tn)
    return (_pad_axis(_pad_axis(phi.T, 0, f_pad), 1, n_pad),
            _pad_axis(_pad_axis(xe.T, 0, e_pad), 1, n_pad),
            _pad_axis(_pad_axis(q, 0, k_pad), 1, f_pad),
            _pad_axis(G, 0, k_pad),
            _pad_axis(pi_det, 0, k_pad),
            _pad_axis(mask, 0, k_pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_gate_expert_packed(phi, xe, q, G, pi_det, mask,
                             thr: float, floor: float, n_actual: int,
                             interpret: bool) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """Packed block-sparse gate+expert (inputs sorted active-first).

    mask must be packed (all active entries first); the kernels derive the
    active count from sum(mask), so the op vmaps over blocks cleanly.
    Returns (res (N, C), surv (K,) max-gating). Gradients flow to
    q, G, pi_det.
    """
    return _impl(phi, xe, q, G, pi_det, mask, thr, floor,
                 n_actual, interpret)


def _impl(phi, xe, q, G, pi_det, mask, thr, floor, n_actual,
          interpret):
    n = phi.shape[0]
    k = q.shape[0]
    c_dim = G.shape[1] // xe.shape[1]
    phiT, xeT, q_p, G_p, pi_p, m_p = _prep(phi, xe, q, G, pi_det, mask)
    res, surv = _fwd_call(phiT, xeT, q_p, G_p, pi_p, m_p, thr=thr,
                          floor=floor, c_dim=c_dim, n_actual=n_actual,
                          interpret=interpret)
    return res[:n], surv[0, :k]


def _fwd(phi, xe, q, G, pi_det, mask, thr, floor, n_actual, interpret):
    out = _impl(phi, xe, q, G, pi_det, mask, thr, floor, n_actual,
                interpret)
    return out, (phi, xe, q, G, pi_det, mask)


def _bwd(thr, floor, n_actual, interpret, residuals, cts):
    phi, xe, q, G, pi_det, mask = residuals
    g_res, _ = cts
    n, f = phi.shape
    k = q.shape[0]
    c_dim = G.shape[1] // xe.shape[1]
    phiT, xeT, q_p, G_p, pi_p, m_p = _prep(phi, xe, q, G, pi_det, mask)
    g_pad = _pad_axis(g_res.astype(jnp.float32), 0, phiT.shape[1])
    dq, dG, dpi = _bwd_call(phiT, xeT, q_p, G_p, pi_p, m_p, g_pad,
                            thr=thr, floor=floor, c_dim=c_dim,
                            interpret=interpret)
    return (jnp.zeros_like(phi), jnp.zeros_like(xe),
            dq[:k, :f], dG[:k], dpi[:k], jnp.zeros_like(mask))


fused_gate_expert_packed.defvjp(_fwd, _bwd)
