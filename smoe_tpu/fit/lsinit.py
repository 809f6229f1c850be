"""Least-squares expert (re)initialization — beyond the reference.

The reference initializes expert offsets from image samples at the kernel
centers and zero slopes (smoe.py:2437-2456) and then leaves ALL of the
expert fitting to Adam.  But for FIXED gating weights w[n,k] the model

    res[n,c] = sum_k w[n,k] * (nu_e[k,c] + gamma_e[k,:,c] @ x[n])

is LINEAR in (nu_e, gamma_e), so the squared reconstruction error has a
closed-form minimizer — one weighted normal-equations solve.  Running that
solve at init (or after any gating change, e.g. an incremental insertion)
starts Adam from the best expert surface the current gating can express,
typically several dB above the sample init.  This is an MXU-friendly
operation: per block one (K, Nb) @ (Nb, p^2) matmul accumulates all
per-kernel Gram matrices at once (p = 1+d design features per kernel).

Two solver modes:
  * 'kernel' (default, any K): per-kernel responsibility-weighted LS —
    the EM M-step for a mixture of affine experts.  Each kernel fits its
    own affine surface to the pixels it gates, minimizing
    sum_n w[n,k] (m_k(x_n) - y_n)^2; the blend sum_k w_k m_k then tracks y
    wherever sum_k w ~= 1.  K independent (1+d)x(1+d) solves, vmapped.
    Because the M-step optimizes the mixture objective, not the blend
    MSE (under heavy gating overlap the blend of per-kernel fits can be
    over-smoothed — measured WORSE than the sample init for nu-only
    fits), the M-step result is used as a search DIRECTION with an exact
    line search on the true blend objective: one extra block pass
    computes t* = -<r,u>/<u,u> (r = residual, u = blended direction), so
    the update never regresses (t=0 is in the search set).
  * 'coupled' (K*(1+d) <= ls_coupled_max columns): the EXACT joint
    minimizer of ||sum_k w_k m_k - y||^2 over all kernels at once —
    accumulates the full cross-kernel Gram G = Z^T Z with
    Z[n, (k,i)] = w[n,k] * phi[n,i] and solves one ridge-regularized
    system per channel group.

Both respect the training semantics: rows are weighted by the overlap
validity crop and the 4D-LF train mask (core/losses.py pixel_loss), the
design uses the motion-TRANSFORMED coordinates exactly as
expert_regression consumes them (fit/trainer.py _forward_eff), gating
comes from the same effective (QAT'd) params as the forward, and kernels
with no gated mass keep their sample-init values.  `only_y_gamma` solves
slopes for the Y channel only; `train_gammas=False` solves offsets only.

No reference counterpart (this closed-form step is impractical in the
reference's per-block feed_dict graph); cited behaviors above are where
the semantics being matched live.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.model import _EXACT, gating, maha_from_A
from smoe_tpu.video.motion import transform_coords

from smoe_tpu.fit.blocks import row_chunks as _ls_row_chunks

# mass below which a kernel keeps its sample-init experts (no pixels to fit)
_MASS_EPS = 1e-6


def _design_coords(eff, cfg: SmoeConfig, coords: jnp.ndarray):
    """(coords_for_maha, coords_raw_for_dual, coords_for_expert) — mirrors
    fit/trainer.py _forward_eff's routing."""
    if eff.motion is not None and cfg.dim_domain == 3:
        coords_t = transform_coords(coords, eff.motion, cfg.num_params_model,
                                    cfg.num_frames)
        return coords_t, coords, coords_t
    return coords, None, coords


@partial(jax.jit, static_argnames=("cfg", "coupled"))
def _accumulate(eff, cfg: SmoeConfig, coords_all, targets_all, klists,
                valid, train_mask, loss_w, model_mask, coupled: bool):
    """Scan the blocks once, accumulating weighted normal equations.

    Returns (G, b) where for 'kernel' mode G is (K, p, p) / b is (K, p, C)
    and for 'coupled' mode G is (K*p, K*p) / b is (K*p, C).
    """
    k = eff.pis.shape[0]
    d = cfg.dim_domain
    c = targets_all.shape[-1]
    p = 1 + d
    diag_A = jnp.diagonal(eff.A, axis1=1, axis2=2)
    nb = coords_all.shape[1]
    s = _ls_row_chunks(nb, k * p if coupled else k)
    m = nb // s

    def block(carry, xs):
        coords, targets, klist, tmask, lw = xs

        def chunk(c2, xs2):
            G, bvec = c2
            coords_c, targets_c, tmask_c, lw_c, valid_c = xs2
            cin, craw, cexp = _design_coords(eff, cfg, coords_c)
            maha = maha_from_A(eff.A, eff.musX, cfg, cin, craw, model_mask)
            w_e = gating(maha, eff.pis, diag_A, cfg, klist)    # (m, K)
            rw = valid_c.astype(jnp.float32) * lw_c
            rw = rw * tmask_c.astype(jnp.float32)
            # zero-padded rows (coords==0 in pad) ride along with w from
            # dead pixels; the valid/train masks already exclude them
            # where they matter, and padded rows have targets==0 AND
            # coords==0 so they only bias the constant column — crop
            # them via the valid mask.
            wv = w_e * rw[:, None]                             # (m, K)
            phi = jnp.concatenate([jnp.ones_like(cexp[:, :1]), cexp],
                                  axis=1)
            if coupled:
                z = (wv[:, :, None] * phi[:, None, :]).reshape(-1, k * p)
                G = G + jnp.dot(z.T, z, precision=_EXACT,
                                preferred_element_type=jnp.float32)
                bvec = bvec + jnp.dot(z.T, targets_c, precision=_EXACT,
                                      preferred_element_type=jnp.float32)
            else:
                pp = (phi[:, :, None] * phi[:, None, :]).reshape(-1, p * p)
                G = G + jnp.dot(wv.T, pp, precision=_EXACT,
                                preferred_element_type=jnp.float32
                                ).reshape(k, p, p)
                py = (phi[:, :, None]
                      * targets_c[:, None, :]).reshape(-1, p * c)
                bvec = bvec + jnp.dot(wv.T, py, precision=_EXACT,
                                      preferred_element_type=jnp.float32
                                      ).reshape(k, p, c)
            return (G, bvec), None

        carry, _ = jax.lax.scan(
            chunk, carry,
            (coords.reshape(s, m, -1), targets.reshape(s, m, -1),
             tmask.reshape(s, m), lw.reshape(s, m), valid.reshape(s, m)))
        return carry, None

    G0 = jnp.zeros((k * p, k * p), jnp.float32) if coupled \
        else jnp.zeros((k, p, p), jnp.float32)
    b0 = jnp.zeros((k * p, c), jnp.float32) if coupled \
        else jnp.zeros((k, p, c), jnp.float32)
    tm = train_mask if train_mask is not None \
        else jnp.ones(coords_all.shape[:2], bool)
    (G, bvec), _ = jax.lax.scan(block, (G0, b0),
                                (coords_all, targets_all, klists, tm,
                                 loss_w))
    return G, bvec


@partial(jax.jit, static_argnames=("cfg", "ridge", "damp"))
def _solve_kernel(G, bvec, nu0, gam0, cfg: SmoeConfig, ridge: float,
                  damp: float):
    """Per-kernel damped solves in the DELTA domain; kernels without mass
    keep (nu0, gam0).

    The solve is x = x0 + (G + Lam)^-1 (b - G x0) — a Levenberg-style
    step around the current experts, with the damping on the SLOPE
    entries only: Lam = diag(eps_nu, lam_g, ..., lam_g), lam_g = damp x
    the median live kernel mass.  Rationale: the affine expert anchors
    at the global origin (reference gamma^T x + nu, smoe.py:845), so
    nu is the surface extrapolated to x=0 — far outside most kernels'
    support — and any ill-constrained slope direction multiplies into an
    extreme nu.  Bounding the slope step bounds nu too (|nu| <=
    |surface@support| + |g|*sqrt(d)), while kernels whose pixels
    genuinely constrain a steep edge (slope-Gram eigenvalue >> lam_g)
    keep their full LS slopes.  NOTE: measured on the RD study, damping
    is the WRONG tool for quantizer-range protection (default damp=0) —
    the range stretch is the origin-anchored nu parameterization itself,
    fixed losslessly at the codec by config.nu_anchor; damping only
    costs float quality (scripts/exp_lsri_quant.py).  Kept for
    robustness experiments."""
    k, p, _ = G.shape
    c = bvec.shape[-1]
    mass = G[:, 0, 0]                                          # sum_n w[n,k]
    tr = jnp.trace(G, axis1=1, axis2=2) / p

    if damp == 0.0:
        # pure LS (x0-independent up to the tiny ridge, biased toward 0
        # like classic ridge — keeps mask-exclusion exactness: corrupted
        # pixels outside the loss/train mask cannot leak in via x0)
        reg = (ridge * tr + _MASS_EPS)[:, None, None] * jnp.eye(p)[None]
        if cfg.train_gammas:
            x = jnp.linalg.solve(G + reg, bvec)                # (K, p, C)
        else:
            x = jnp.zeros((k, p, c), jnp.float32).at[:, 0, :].set(
                bvec[:, 0, :] / jnp.maximum(mass, _MASS_EPS)[:, None])
        if cfg.train_gammas and cfg.only_y_gamma and cfg.use_yuv and c == 3:
            # slopes only on Y (core/model.py expert_regression
            # chan_mask); U/V get the weighted-mean offset
            nu_uv = bvec[:, 0, 1:] / jnp.maximum(mass, _MASS_EPS)[:, None]
            x = x.at[:, 1:, 1:].set(0.0).at[:, 0, 1:].set(nu_uv)
        ok = mass > _MASS_EPS
        nu = jnp.where(ok[:, None], x[:, 0, :], nu0)
        gam = jnp.where(ok[:, None, None], x[:, 1:, :], gam0)
        return nu, gam

    # scale-correct damping: relative to the typical kernel's SLOPE-block
    # curvature (median live trace of G[1:,1:]), not its mass — slope
    # eigenvalues scale as mass*support^2, so a mass-based lam over-damps
    # exactly when kernels are small (fine grids)
    tr_g = jnp.trace(G[:, 1:, 1:], axis1=1, axis2=2) / (p - 1)
    med = jnp.nanmedian(jnp.where(mass > _MASS_EPS, tr_g, jnp.nan))
    med = jnp.where(jnp.isnan(med), 0.0, med)
    lam_g = ridge * tr + damp * med + _MASS_EPS                # (K,)
    lam_nu = ridge * tr + _MASS_EPS
    lam_d = jnp.concatenate([lam_nu[:, None],
                             jnp.broadcast_to(lam_g[:, None], (k, p - 1))],
                            axis=1)                            # (K, p)
    x0 = jnp.concatenate([nu0[:, None, :], gam0], axis=1)      # (K, p, C)

    if cfg.train_gammas:
        rhs = bvec - jnp.einsum("kpq,kqc->kpc", G, x0, precision=_EXACT)
        reg = lam_d[:, :, None] * jnp.eye(p)[None]
        x = x0 + jnp.linalg.solve(G + reg, rhs)                # (K, p, C)
    else:
        dnu = (bvec[:, 0, :] - mass[:, None] * nu0) \
            / (mass + lam_nu)[:, None]
        x = jnp.zeros((k, p, c), jnp.float32).at[:, 0, :].set(nu0 + dnu)
    if cfg.train_gammas and cfg.only_y_gamma and cfg.use_yuv and c == 3:
        # slopes only on Y (core/model.py expert_regression chan_mask);
        # U/V get the damped weighted-mean offset (their x0 slopes are 0)
        dnu_uv = (bvec[:, 0, 1:] - mass[:, None] * nu0[:, 1:]) \
            / (mass + lam_nu)[:, None]
        x = x.at[:, 1:, 1:].set(0.0).at[:, 0, 1:].set(nu0[:, 1:] + dnu_uv)
    ok = mass > _MASS_EPS
    nu = jnp.where(ok[:, None], x[:, 0, :], nu0)
    gam = jnp.where(ok[:, None, None], x[:, 1:, :], gam0)
    return nu, gam


@partial(jax.jit, static_argnames=("cfg", "ridge", "damp"))
def _solve_coupled(G, bvec, nu0, gam0, cfg: SmoeConfig, ridge: float,
                   damp: float):
    """One joint damped solve over all kernels, in the DELTA domain
    around (nu0, gam0), damping the SLOPE entries only — see
    _solve_kernel for the rationale (slope steps bound the
    origin-anchored nu; barely-gated kernels stay near x0, protecting
    the data-derived quantizer bounds)."""
    k = nu0.shape[0]
    c = bvec.shape[-1]
    p = G.shape[0] // k
    diag_kp = jnp.diagonal(G).reshape(k, p)
    mass = diag_kp[:, 0]
    ok = mass > _MASS_EPS
    # dead rows: unit diagonal, zero rhs, original params restored after
    okp = jnp.repeat(ok, p)
    diag_fix = jnp.where(okp, 0.0, 1.0)
    n_live = jnp.maximum(jnp.sum(okp.astype(jnp.float32)), 1.0)
    scale = jnp.sum(jnp.where(okp, jnp.diagonal(G), 0.0)) / n_live
    lam_nu = ridge * jnp.maximum(scale, _MASS_EPS) + _MASS_EPS

    if damp == 0.0:
        # pure joint LS (x0-independent up to the tiny ridge — see
        # _solve_kernel's damp==0 branch for why that matters)
        Gr = G + jnp.diag(diag_fix + lam_nu)
        if cfg.train_gammas:
            x = jnp.linalg.solve(Gr, bvec).reshape(k, p, c)
        else:
            idx = jnp.arange(k) * p                            # nu columns
            Gn = Gr[idx][:, idx]
            x = jnp.zeros((k, p, c), jnp.float32).at[:, 0, :].set(
                jnp.linalg.solve(Gn, bvec[idx]))
        if cfg.train_gammas and cfg.only_y_gamma and cfg.use_yuv and c == 3:
            idx = jnp.arange(k) * p
            Gn = Gr[idx][:, idx]
            nu_uv = jnp.linalg.solve(Gn, bvec[idx][:, 1:])
            x = x.at[:, 1:, 1:].set(0.0).at[:, 0, 1:].set(nu_uv)
        nu = jnp.where(ok[:, None], x[:, 0, :], nu0)
        gam = jnp.where(ok[:, None, None], x[:, 1:, :], gam0)
        return nu, gam

    # median live slope-block diagonal (see _solve_kernel: scale-correct)
    tr_g = jnp.mean(diag_kp[:, 1:], axis=1)
    med = jnp.nanmedian(jnp.where(ok, tr_g, jnp.nan))
    med = jnp.where(jnp.isnan(med), 0.0, med)
    lam_g = lam_nu + damp * med
    is_nu = (jnp.arange(k * p) % p) == 0
    lam = jnp.where(is_nu, lam_nu, lam_g)
    Gr = G + jnp.diag(diag_fix + lam)
    x0 = jnp.concatenate([nu0[:, None, :], gam0], axis=1)      # (K, p, C)
    x0f = x0.reshape(k * p, c)

    if cfg.train_gammas:
        rhs = bvec - jnp.dot(G, x0f, precision=_EXACT)
        x = (x0f + jnp.linalg.solve(Gr, rhs)).reshape(k, p, c)
    else:
        idx = jnp.arange(k) * p                                # nu columns
        Gn = Gr[idx][:, idx]
        rhs = bvec[idx] - jnp.dot(G[idx][:, idx], nu0, precision=_EXACT)
        x = jnp.zeros((k, p, c), jnp.float32).at[:, 0, :].set(
            nu0 + jnp.linalg.solve(Gn, rhs))
    if cfg.train_gammas and cfg.only_y_gamma and cfg.use_yuv and c == 3:
        idx = jnp.arange(k) * p
        Gn = Gr[idx][:, idx]
        rhs_uv = bvec[idx][:, 1:] - jnp.dot(G[idx][:, idx], nu0[:, 1:],
                                            precision=_EXACT)
        x = x.at[:, 1:, 1:].set(0.0).at[:, 0, 1:].set(
            nu0[:, 1:] + jnp.linalg.solve(Gn, rhs_uv))
    nu = jnp.where(ok[:, None], x[:, 0, :], nu0)
    gam = jnp.where(ok[:, None, None], x[:, 1:, :], gam0)
    return nu, gam


@partial(jax.jit, static_argnames=("cfg",))
def _line_search_t(eff, cfg: SmoeConfig, coords_all, targets_all, klists,
                   valid, train_mask, loss_w, model_mask, nu0, gam0,
                   d_nu, d_gam):
    """Exact step size along the direction (d_nu, d_gam) for the blend
    objective sum_n rw_n ||yhat_n + t*u_n - y_n||^2: t* = -<r,u>/<u,u>.
    One scan over blocks; the float (pre-QAT) experts are used for yhat,
    matching what the solve fits."""
    diag_A = jnp.diagonal(eff.A, axis1=1, axis2=2)
    nb = coords_all.shape[1]
    s = _ls_row_chunks(nb, int(eff.pis.shape[0]))
    m = nb // s

    def block(carry, xs):
        coords, targets, klist, tmask, lw = xs

        def chunk(c2, xs2):
            uu, ru = c2
            coords_c, targets_c, tmask_c, lw_c, valid_c = xs2
            cin, craw, cexp = _design_coords(eff, cfg, coords_c)
            maha = maha_from_A(eff.A, eff.musX, cfg, cin, craw, model_mask)
            w_e = gating(maha, eff.pis, diag_A, cfg, klist)    # (m, K)
            rw = valid_c.astype(jnp.float32) * lw_c
            rw = rw * tmask_c.astype(jnp.float32)
            # blended current surface + blended direction at the pixels
            yhat = jnp.einsum("nk,kc->nc", w_e, nu0,
                              precision=_EXACT) + \
                jnp.einsum("nk,nd,kdc->nc", w_e, cexp, gam0,
                           precision=_EXACT)
            u = jnp.einsum("nk,kc->nc", w_e, d_nu, precision=_EXACT) + \
                jnp.einsum("nk,nd,kdc->nc", w_e, cexp, d_gam,
                           precision=_EXACT)
            r = yhat - targets_c
            uu = uu + jnp.sum(rw[:, None] * u * u)
            ru = ru + jnp.sum(rw[:, None] * r * u)
            return (uu, ru), None

        carry, _ = jax.lax.scan(
            chunk, carry,
            (coords.reshape(s, m, -1), targets.reshape(s, m, -1),
             tmask.reshape(s, m), lw.reshape(s, m), valid.reshape(s, m)))
        return carry, None

    tm = train_mask if train_mask is not None \
        else jnp.ones(coords_all.shape[:2], bool)
    (uu, ru), _ = jax.lax.scan(block, (jnp.float32(0), jnp.float32(0)),
                               (coords_all, targets_all, klists, tm,
                                loss_w))
    # clamp to [0, 1]: t=0 keeps the guarantee (never regress), t<=1 keeps
    # the per-kernel damping meaningful — an unclamped global t re-scales
    # EVERY kernel's step, so junk kernels (heavily damped, needing t>>1
    # to reach their LS target) drag t above 1 and well-gated kernels
    # overshoot BEYOND their LS solution; repeated refreshes then ratchet
    # params to extremes (measured: t drifts -0.29 -> 1.07 over 5
    # refreshes at damp=1e-2 and nu blows up to +-80, qpsnr 12.7 dB —
    # scripts/exp_lsri_quant.py).  MSE(clip(t*)) <= MSE(0) still holds
    # (quadratic in t, 0 in the set).
    t = jnp.where(uu > 0, -ru / jnp.maximum(uu, 1e-30), 0.0)
    return jnp.clip(t, 0.0, 1.0)


def ls_refresh_experts(smoe, mode: str = "auto", ridge: float = 1e-6,
                       coupled_max_cols: int = 4096,
                       use_loss_mask: bool = True,
                       damp: float = 0.0) -> float:
    """Replace (nu_e, gamma_e) with their least-squares fit under the
    current gating.  Returns the gated pixel mass (diagnostic).

    mode: 'kernel' | 'coupled' | 'auto' (coupled when K*(1+d) fits).
    damp: optional Levenberg-style damping toward the CURRENT experts
    (fraction of the median live slope curvature).  Default 0: the
    measured fix for LS solutions stretching the data-derived quantizer
    bounds is codec-side center-anchored nu coding (config.nu_anchor)
    plus the [0,1] line-search clamp below — damping additionally costs
    float quality (38.1 -> 34.4 dB on the RD study at damp=1e-2) for no
    extra codec protection (scripts/exp_lsri_quant.py).
    When the Smoe carries a loss mask (inpainting/denoise workloads) the
    solve weights rows by it, like the masked training loss — disable
    via use_loss_mask=False.
    SV caveat: the solve targets the raw pixels, not pixels minus the SV
    residual — exact at init (SVs start at zero); a mid-fit refresh of a
    train_svs model transiently double-counts what the SVs already
    explain (Adam re-equilibrates; the line search still bounds the
    blend-MSE regression).
    Mutates smoe.params; optimizer state is left untouched (Adam moments
    for the expert groups start at zero anyway when called before
    set_optimizer; after training, call set_optimizer() to reset).
    """
    from smoe_tpu.fit.trainer import effective_params

    cfg = smoe.cfg
    eff = effective_params(smoe.params, cfg, smoe.musX_grid)
    kcap = int(eff.pis.shape[0])
    p = 1 + cfg.dim_domain
    if mode == "auto":
        mode = "coupled" if kcap * p <= coupled_max_cols else "kernel"
    coupled = mode == "coupled"

    bset = smoe.bset
    lw = smoe.loss_mask if (use_loss_mask and smoe.loss_mask is not None) \
        else jnp.ones(bset.coords.shape[:2], jnp.float32)
    # bset arrays (not the mesh-sharded _coords_dev): this one-shot solve
    # runs as a plain single-program jit even when the trainer is meshed
    G, bvec = _accumulate(eff, cfg, bset.coords, bset.targets,
                          smoe.kernel_lists, bset.valid, bset.train_mask,
                          lw, smoe.model_mask, coupled)
    solve = _solve_coupled if coupled else _solve_kernel
    nu0, gam0 = smoe.params.nu_e, smoe.params.gamma_e
    nu, gam = solve(G, bvec, nu0, gam0, cfg, float(ridge), float(damp))
    if not coupled:
        # M-step as a direction + exact line search on the blend MSE
        # (see module docstring): never regresses vs the sample init.
        t = _line_search_t(eff, cfg, bset.coords, bset.targets,
                           smoe.kernel_lists, bset.valid, bset.train_mask,
                           lw, smoe.model_mask, nu0, gam0, nu - nu0,
                           gam - gam0)
        nu = nu0 + t * (nu - nu0)
        gam = gam0 + t * (gam - gam0)
    smoe.params = smoe.params.replace(nu_e=nu, gamma_e=gam)
    smoe.valid = False
    if coupled:
        mass = float(jnp.sum(jnp.diagonal(G).reshape(kcap, p)[:, 0]))
    else:
        mass = float(jnp.sum(G[:, 0, 0]))
    return mass
