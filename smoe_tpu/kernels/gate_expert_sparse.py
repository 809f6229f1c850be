"""Block-sparse fused gate+expert kernel with hierarchical tile culling.

The reference's per-block kernel locality lists (reference smoe.py:2244-2365)
make each spatial block evaluate only its nearby kernels — SURVEY.md §5
marks this block-sparsity as the main perf lever for large (1080p+) fits.
The dense fused kernel (kernels/gate_expert.py) folds the list into a mask,
so masked kernels still burn MXU/VPU work.

Two sparsity levels, both resolved inside ONE kernel:

1. **Packed kernel lists** — the caller packs active kernels first (stable
   argsort of the mask); the kernel derives the active count from sum(mask)
   and loops over KT-wide kernel tiles with a dynamic trip count
   ceil(count / KT), so compute scales with the per-block list density.

2. **Hierarchical per-pixel-tile culling** (the coarse maha bound of
   reference smoe.py:2332-2354, pushed down to tile granularity): pixels
   arrive patch-ordered (spatially compact tiles, see core/model.py), and
   every pixel tile carries a descriptor [phi(center), radius].  Per
   (pixel-tile, kernel-tile) the kernel evaluates the rigorous lower bound

       sqrt(maha(x)) = ||A^T (x - mu)||
                     >= ||A^T (c - mu)|| - ||A||_F * r   for all x in tile

   and skips the tile when min-over-kernels of the bound exceeds
   CULL_MAHA: there exp(-0.5*maha) * pi_det underflows to exactly 0.0 in
   f32, so the skipped work contributes nothing — results match the dense
   evaluation to flush-to-zero exactness.  The same test drives forward
   and backward (which recomputes tiles flash-attention style).

Per grid step the only scratch writes are a (TN, 1) denominator and a
(TN, E*C) wg accumulator; the (TN, K) n_w scratch is written only for
LIVE tiles and never zeroed (pass 2 re-reads only live tiles).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoe_tpu.kernels.gate_expert import _pad_axis, _round_up, _tile_n

KT = int(os.environ.get("SMOE_PALLAS_KT", 128))  # kernel-tile width (lanes)

# Skip threshold for the per-tile maha lower bound.  exp(-0.5 * 250) ~ 5e-55
# times any representable pi*det is 0.0 in f32 (even without FTZ), so
# skipped tiles contribute exact zeros — identical to computing them.
CULL_MAHA = float(os.environ.get("SMOE_PALLAS_CULL_MAHA", 250.0))
_BIG = 1e30


def packed_tile_n(k: int) -> int:
    """Pixel-tile size the packed kernel will use for K=k (callers build
    patch orderings / tile descriptors against this)."""
    return _tile_n(_round_up(k, KT))


def build_tile_desc(coords: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-pixel-tile descriptors [phi(center), radius] for the cull bound.

    coords: (N, d) pixel coordinates in the SAME (patch) order as the
    phi/xe rows passed to the op.  Returns (n_tiles, f_pad) f32.
    Zero-padded rows (added here to reach the tile multiple) pull the
    bounding box toward the origin — conservative, never unsound.
    """
    from smoe_tpu.core.model import quadratic_features
    n, d = coords.shape
    f = d * d + d + 1
    f_pad = _round_up(f, 8)
    assert f + 1 <= f_pad, "no room for the radius slot"
    tn = packed_tile_n(k)
    n_pad = _round_up(n, tn)
    c = _pad_axis(coords, 0, n_pad).reshape(-1, tn, d)
    mn = jnp.min(c, axis=1)
    mx = jnp.max(c, axis=1)
    ctr = 0.5 * (mn + mx)
    r = jnp.sqrt(jnp.sum((mx - ctr) ** 2, axis=1))
    phi_c = quadratic_features(ctr)                       # (n_tiles, f)
    desc = jnp.zeros((phi_c.shape[0], f_pad), jnp.float32)
    desc = desc.at[:, :f].set(phi_c).at[:, f].set(r)
    return desc[:, None, :]        # (n_tiles, 1, f_pad): TPU-tileable blocks


def _lb_tile(desc_row, qT_t, fro_t, mask_t, f: int):
    """Lower bound of maha over (pixel tile x kernel tile).  (1, KT).

    qT_t carries the PRE-SCALED q' = -0.5 * mask * q (see _prep); the
    exact -2x recovers maha at the tile center."""
    maha_c = jnp.maximum(-2.0 * jax.lax.dot_general(
        desc_row, qT_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), 0.0)         # (1, KT)
    r = desc_row[0, f]
    lb_sqrt = jnp.maximum(jnp.sqrt(maha_c) - fro_t * r, 0.0)
    lb = lb_sqrt * lb_sqrt
    # masked-out kernels contribute exact zeros either way: treat as far
    return jnp.where(mask_t > 0, lb, _BIG)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(phiT_ref, xeT_ref, qT_ref, G_ref, pi_det_ref,
                mask_ref, desc_ref, fro_ref, res_ref, surv_ref,
                nw_ref, den_ref, wg_ref, *, e_dim: int,
                c_dim: int, n_actual: int, tile_n: int, f_feat: int,
                thr: float, floor: float):
    i = pl.program_id(0)
    # active-kernel count from the packed mask (active entries first); no
    # scalar input needed, so the op vmaps cleanly over blocks
    count = jnp.sum(mask_ref[:]).astype(jnp.int32)
    n_kt = pl.cdiv(count, KT)

    phiT = phiT_ref[:]                          # (F, TN)
    desc = desc_ref[0]                          # (1, f_pad) this pixel tile
    den_ref[:] = jnp.zeros_like(den_ref)
    wg_ref[:] = jnp.zeros_like(wg_ref)

    @pl.when(i == 0)
    def _():
        surv_ref[:] = jnp.zeros_like(surv_ref)

    def pass1(j, _):
        sl = pl.ds(j * KT, KT)
        q_t = qT_ref[:, sl]                     # (F, KT)
        m_t = mask_ref[:, sl]                   # (1, KT)
        live = jnp.min(_lb_tile(desc, q_t, fro_ref[:, sl], m_t,
                                f_feat)) < CULL_MAHA

        @pl.when(live)
        def _():
            pd_t = pi_det_ref[:, sl]
            mh = jnp.minimum(jax.lax.dot_general(
                phiT, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), 0.0)
            nw_t = jnp.exp(mh) * pd_t
            nw_ref[:, sl] = nw_t
            den_ref[:] = den_ref[:] + jnp.sum(nw_t, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_kt, pass1, 0)
    denom = jnp.maximum(floor, den_ref[:])

    tn_rows = jax.lax.broadcasted_iota(
        jnp.int32, (tile_n, KT), 0) + i * tile_n
    row_ok = tn_rows < n_actual

    def pass2(j, _):
        sl = pl.ds(j * KT, KT)
        q_t = qT_ref[:, sl]
        m_t = mask_ref[:, sl]
        live = jnp.min(_lb_tile(desc, q_t, fro_ref[:, sl], m_t,
                                f_feat)) < CULL_MAHA

        @pl.when(live)
        def _():
            nw_t = nw_ref[:, sl]                # (TN, KT)
            w_t = nw_t / denom
            w_t = jnp.where(w_t > thr, w_t, 0.0)
            sv_t = jnp.max(jnp.where(row_ok, w_t, 0.0), axis=0,
                           keepdims=True)
            surv_ref[:, sl] = jnp.maximum(surv_ref[:, sl], sv_t)
            g_t = G_ref[sl, :]
            wg_ref[:] = wg_ref[:] + jnp.dot(
                w_t, g_t, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_kt, pass2, 0)

    wg = wg_ref[:]
    xeT = xeT_ref[:]
    res = jnp.zeros((tile_n, c_dim), jnp.float32)
    for j in range(e_dim):
        res = res + xeT[j, :][:, None] * wg[:, j * c_dim:(j + 1) * c_dim]
    res_ref[:] = res


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(phiT_ref, xeT_ref, qT_ref, G_ref, pi_det_ref,
                mask_ref, desc_ref, fro_ref, g_ref, dq_ref, dG_ref,
                dpi_ref, nw_ref, den_ref, s_ref, *, e_dim: int,
                c_dim: int, f_feat: int, thr: float, floor: float):
    i = pl.program_id(0)
    count = jnp.sum(mask_ref[:]).astype(jnp.int32)
    n_kt = pl.cdiv(count, KT)

    phiT = phiT_ref[:]
    g = g_ref[:]
    desc = desc_ref[0]
    den_ref[:] = jnp.zeros_like(den_ref)
    s_ref[:] = jnp.zeros_like(s_ref)

    @pl.when(i == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        dG_ref[:] = jnp.zeros_like(dG_ref)
        dpi_ref[:] = jnp.zeros_like(dpi_ref)

    def live_j(j):
        sl = pl.ds(j * KT, KT)
        return jnp.min(_lb_tile(desc, qT_ref[:, sl], fro_ref[:, sl],
                                mask_ref[:, sl], f_feat)) < CULL_MAHA

    def pass1(j, _):
        @pl.when(live_j(j))
        def _():
            sl = pl.ds(j * KT, KT)
            mh = jnp.minimum(jax.lax.dot_general(
                phiT, qT_ref[:, sl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), 0.0)
            nw_t = jnp.exp(mh) * pi_det_ref[:, sl]
            nw_ref[:, sl] = nw_t
            den_ref[:] = den_ref[:] + jnp.sum(nw_t, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_kt, pass1, 0)
    raw = den_ref[:]
    denom = jnp.maximum(floor, raw)
    live_den = (raw > floor).astype(jnp.float32)

    xeT = xeT_ref[:]
    dwg_cols = []
    for j in range(e_dim):
        dwg_cols.append(xeT[j, :][:, None] * g)
    dwg = jnp.concatenate(dwg_cols, axis=1)      # (TN, E*C)

    # s[n] = sum_k dwt[n,k] w_tilde[n,k]  — accumulate over live tiles
    def pass_s(j, _):
        @pl.when(live_j(j))
        def _():
            sl = pl.ds(j * KT, KT)
            dw_t = jax.lax.dot_general(
                dwg, G_ref[sl, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TN, KT)
            wt_t = nw_ref[:, sl] / denom
            c_t = (wt_t > thr).astype(jnp.float32)
            s_ref[:] = s_ref[:] + jnp.sum(dw_t * c_t * wt_t, axis=1,
                                          keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_kt, pass_s, 0)
    s = s_ref[:]

    def pass_grads(j, _):
        @pl.when(live_j(j))
        def _():
            sl = pl.ds(j * KT, KT)
            q_t = qT_ref[:, sl]
            g_t = G_ref[sl, :]
            m_t = mask_ref[:, sl]
            nw_t = nw_ref[:, sl]
            wt_t = nw_t / denom
            c_t = (wt_t > thr).astype(jnp.float32)
            w_t = wt_t * c_t
            # recompute e_term exactly (nw/pd is unsafe for dead kernels
            # with pd == 0, whose dpi still needs e_term)
            mh_raw = jax.lax.dot_general(
                phiT, q_t, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mh = jnp.minimum(mh_raw, 0.0)
            e_t = jnp.exp(mh)

            dw_t = jax.lax.dot_general(
                dwg, g_t, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwt_t = dw_t * c_t
            dn_t = (dwt_t - s * live_den) / denom
            dpi_t = jnp.sum(dn_t * e_t, axis=0, keepdims=True)     # (1, KT)
            # gradient w.r.t. the PRE-SCALED q'; the -0.5*mask chain factor
            # is applied outside on the tiny (K, F) result.  Through the
            # maha clamp with jnp.minimum's exact subgradient (1 / 0.5 at
            # the tie / 0 where clamped), matching the XLA path's
            # jnp.maximum(maha, 0) autodiff
            clamp_f = 0.5 * ((mh_raw < 0).astype(jnp.float32)
                             + (mh_raw <= 0).astype(jnp.float32))
            dmh_t = dn_t * nw_t * clamp_f                           # (TN, KT)
            dq_t = jax.lax.dot_general(
                dmh_t, phiT, dimension_numbers=(((0,), (1,)), ((), ())),
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

def _mk_specs(f_pad, e_pad, k_pad, ec, tn):
    return [
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
        pl.BlockSpec((1, 1, f_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),                   # desc
        pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),                   # fro
    ]


def _fwd_call(phiT, xeT, q, G, pi_det, mask, desc, fro, *, thr, floor,
              c_dim, f_feat, n_actual, interpret):
    f_pad, n_pad = phiT.shape
    e_pad = xeT.shape[0]
    k_pad = q.shape[0]
    ec = G.shape[1]
    e_dim = ec // c_dim
    tn = _tile_n(k_pad, f_pad)
    n_tiles = n_pad // tn

    kern = functools.partial(
        _fwd_kernel, e_dim=e_dim, c_dim=c_dim, n_actual=n_actual,
        tile_n=tn, f_feat=f_feat, thr=thr, floor=floor)
    res, surv = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=_mk_specs(f_pad, e_pad, k_pad, ec, tn),
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
        scratch_shapes=[pltpu.VMEM((tn, k_pad), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, ec), jnp.float32)],
        interpret=interpret,
    )(phiT, xeT, q.T, G, pi_det[None, :], mask[None, :], desc, fro[None, :])
    return res, surv


def _bwd_call(phiT, xeT, q, G, pi_det, mask, desc, fro, g, *, thr, floor,
              c_dim, f_feat, interpret):
    f_pad, n_pad = phiT.shape
    e_pad = xeT.shape[0]
    k_pad = q.shape[0]
    ec = G.shape[1]
    e_dim = ec // c_dim
    tn = _tile_n(k_pad, f_pad)
    n_tiles = n_pad // tn

    kern = functools.partial(_bwd_kernel, e_dim=e_dim, c_dim=c_dim,
                             f_feat=f_feat, thr=thr, floor=floor)
    in_specs = _mk_specs(f_pad, e_pad, k_pad, ec, tn)
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
        scratch_shapes=[pltpu.VMEM((tn, k_pad), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32),
                        pltpu.VMEM((tn, 1), jnp.float32)],
        interpret=interpret,
    )(phiT, xeT, q.T, G, pi_det[None, :], mask[None, :], desc,
      fro[None, :], g)
    return dq, dG, dpi[0]


def _prep(phi, xe, q, G, pi_det, mask, desc, fro):
    n, f = phi.shape
    e = xe.shape[1]
    f_pad = _round_up(f, 8)
    e_pad = _round_up(e, 8)
    k_pad = _round_up(q.shape[0], KT)
    tn = _tile_n(k_pad, f_pad)
    n_pad = _round_up(n, tn)
    n_tiles = n_pad // tn
    if desc is None:
        # no tile culling (e.g. dual-model features): zero descriptors give
        # lower bound 0 for every live kernel tile -> nothing is skipped
        desc = jnp.zeros((n_tiles, 1, f_pad), jnp.float32)
    else:
        assert desc.shape == (n_tiles, 1, f_pad), \
            f"desc {desc.shape} != {(n_tiles, 1, f_pad)} (use build_tile_desc)"
    if fro is None:
        fro = jnp.zeros((q.shape[0],), jnp.float32)
    # prescale q' = -0.5 * mask * q (exact; see gate_expert._prep)
    return (_pad_axis(_pad_axis(phi.T, 0, f_pad), 1, n_pad),
            _pad_axis(_pad_axis(xe.T, 0, e_pad), 1, n_pad),
            _pad_axis(_pad_axis(q * (-0.5 * mask)[:, None], 0, k_pad),
                      1, f_pad),
            _pad_axis(G, 0, k_pad),
            _pad_axis(pi_det, 0, k_pad),
            _pad_axis(mask, 0, k_pad),
            desc,
            _pad_axis(fro, 0, k_pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_gate_expert_packed(phi, xe, q, G, pi_det, mask, desc, fro,
                             thr: float, floor: float, n_actual: int,
                             interpret: bool) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """Packed block-sparse gate+expert (inputs sorted active-first).

    mask must be packed (all active entries first); the kernels derive the
    active count from sum(mask), so the op vmaps over blocks cleanly.
    desc: (n_tiles, f_pad) per-pixel-tile [phi(center), radius] descriptors
    from build_tile_desc (None disables tile culling); fro: (K,) ||A||_F
    per kernel for the cull bound (None disables).
    Returns (res (N, C), surv (K,) max-gating). Gradients flow to
    q, G, pi_det.
    """
    return _impl(phi, xe, q, G, pi_det, mask, desc, fro, thr, floor,
                 n_actual, interpret)


# Largest K the packed kernel is validated at on real TPU (v5e, Nov-2025
# libtpu).  At K=9216 the compiled kernel CRASHES the TPU worker inside
# Mosaic despite an estimated ~6 MB VMEM footprint (ROADMAP.md round 2);
# scripts/repro_packed_crash.py is the minimal repro.  Until a libtpu with
# a fix lands, refuse instead of taking the worker down — capped-dense
# (use_pallas="auto") already removes ~96% of dense work at that size.
PACKED_VALIDATED_MAX_K = 2304


def _impl(phi, xe, q, G, pi_det, mask, desc, fro, thr, floor, n_actual,
          interpret):
    n, f = phi.shape
    k = q.shape[0]
    if (not interpret and k > PACKED_VALIDATED_MAX_K
            and os.environ.get("SMOE_PACKED_UNSAFE") != "1"):
        # SMOE_PACKED_UNSAFE=1 bypasses (repro script only)
        raise ValueError(
            f"use_pallas='packed' is validated only to K="
            f"{PACKED_VALIDATED_MAX_K} on TPU; K={k} crashed the TPU "
            f"worker (Mosaic, v5e Nov-2025 libtpu — see "
            f"scripts/repro_packed_crash.py and ROADMAP.md).  Use "
            f"use_pallas='auto' (capped-dense) for large K.")
    c_dim = G.shape[1] // xe.shape[1]
    args = _prep(phi, xe, q, G, pi_det, mask, desc, fro)
    res, surv = _fwd_call(*args, thr=thr, floor=floor, c_dim=c_dim,
                          f_feat=f, n_actual=n_actual, interpret=interpret)
    return res[:n], surv[0, :k]


def _fwd(phi, xe, q, G, pi_det, mask, desc, fro, thr, floor, n_actual,
         interpret):
    out = _impl(phi, xe, q, G, pi_det, mask, desc, fro, thr, floor,
                n_actual, interpret)
    return out, (phi, xe, q, G, pi_det, mask, desc, fro)


def _bwd(thr, floor, n_actual, interpret, residuals, cts):
    phi, xe, q, G, pi_det, mask, desc, fro = residuals
    g_res, _ = cts
    n, f = phi.shape
    k = q.shape[0]
    c_dim = G.shape[1] // xe.shape[1]
    args = _prep(phi, xe, q, G, pi_det, mask, desc, fro)
    g_pad = _pad_axis(g_res.astype(jnp.float32), 0, args[0].shape[1])
    dq_s, dG, dpi = _bwd_call(*args, g_pad, thr=thr, floor=floor,
                              c_dim=c_dim, f_feat=f, interpret=interpret)
    dq = dq_s[:k, :f] * (-0.5 * mask)[:, None]   # q' prescale chain factor
    return (jnp.zeros_like(phi), jnp.zeros_like(xe),
            dq, dG[:k], dpi[:k], jnp.zeros_like(mask),
            None if desc is None else jnp.zeros_like(desc),
            None if fro is None else jnp.zeros_like(fro))


fused_gate_expert_packed.defvjp(_fwd, _bwd)
