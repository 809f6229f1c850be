"""EM-style closed-form refresh of the GATING params (musX, A) — study.

The LS expert refresh (`-lsri`, fit/lsinit.py) saturates at a ceiling set
by the gating: after the experts are optimal for the current gating, only
Adam moves (musX, A), and the 512^2 headline study plateaus at 40.03 dB
by iter ~520 (exp_lsinit --refresh 100).  The SMoE model is the
conditional-mean regressor of a joint (x, y) Gaussian mixture, so the
mixture M-step gives CLOSED-FORM gating updates from the same Gram
matrices the LS solve already accumulates (fit/lsinit._accumulate,
kernel mode):

    G[k] = sum_n w[n,k] [1 x][1 x]^T  =  [[S0, S1^T], [S1, S2]]
    mu*_k    = S1/S0
    Sigma*_k = S2/S0 - mu* mu*^T          ->  A* = chol(Sigma*^-1)

Like the expert M-step, this optimizes the MIXTURE objective, not the
blend MSE, so (mu*-mu, A*-A) is used as a DIRECTION with a line search
over a small candidate set of step sizes t, evaluated through the real
compiled blend eval (t=0 included: never regresses).  A* columns are
sign-matched to the current diag(A) so the direction is minimal and
determinant-gating-consistent (codec/quantize.canonicalize_steering).

Variants measured (512^2, K=256, the bench geometry):
  lsri      — periodic LS expert refresh only (the 40.03 dB baseline)
  em        — periodic [EM gating step -> kernel-list refresh -> LS
              expert refresh]

Usage: python scripts/exp_em_refresh.py [--size 512] [--max 1000]
       [--refresh 100] [--cpu] [--ts 0,0.125,0.25,0.5,1]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_image, make_smoe, warm_chunk  # noqa: E402


def _accumulate_yaware(s, sigma2):
    """Joint-mixture responsibilities r[n,k] = w[n,k] *
    exp(-|y_n - m_k(x_n)|^2 / (2 sigma^2)): the position-only gating
    weighted by how well kernel k's OWN expert explains the pixel — the
    E-step of the joint (x, y) mixture the SMoE conditional mean comes
    from.  Returns the same (K, 1+d, 1+d) moment matrices as
    lsinit._accumulate."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from smoe_tpu.core.model import _EXACT, gating, maha_from_A
    from smoe_tpu.fit.lsinit import _design_coords
    from smoe_tpu.fit.trainer import effective_params

    cfg = s.cfg
    eff = effective_params(s.params, cfg, s.musX_grid)

    @partial(jax.jit, static_argnames=("cfg",))
    def run(eff, cfg, coords_all, targets_all, klists, valid, s2):
        kcap = eff.pis.shape[0]
        d = cfg.dim_domain
        p = 1 + d
        diag_A = jnp.diagonal(eff.A, axis1=1, axis2=2)

        def block(G, xs):
            coords, targets, klist = xs
            cin, craw, cexp = _design_coords(eff, cfg, coords)
            maha = maha_from_A(eff.A, eff.musX, cfg, cin, craw,
                               s.model_mask)
            w_e = gating(maha, eff.pis, diag_A, cfg, klist)     # (Nb, K)
            # r2[n,k] = sum_c (nu_kc + x_n . g_kc - y_nc)^2, channel by
            # channel so no (Nb, K, C) tensor materializes at 512^2
            r2 = jnp.zeros(cexp.shape[:1] + (kcap,), jnp.float32)
            for c in range(targets.shape[-1]):
                pc = eff.nu_e[None, :, c] + jnp.dot(
                    cexp, eff.gamma_e[:, :, c].T, precision=_EXACT)
                r2 = r2 + (pc - targets[:, c:c + 1]) ** 2      # (Nb, K)
            r = w_e * jnp.exp(-0.5 * r2 / s2) \
                * valid.astype(jnp.float32)[:, None]
            phi = jnp.concatenate([jnp.ones_like(cexp[:, :1]), cexp], 1)
            pp = (phi[:, :, None] * phi[:, None, :]).reshape(-1, p * p)
            return G + jnp.dot(r.T, pp, precision=_EXACT,
                               preferred_element_type=jnp.float32
                               ).reshape(kcap, p, p), None

        G0 = jnp.zeros((kcap, p, p), jnp.float32)
        G, _ = jax.lax.scan(block, G0,
                            (coords_all, targets_all, klists))
        return G

    return run(eff, cfg, s.bset.coords, s.bset.targets, s.kernel_lists,
               s.bset.valid, jnp.float32(sigma2))


def em_gating_direction(s, yaware=False, sigma2=None):
    """(d_mu, d_Adiag, d_Acorr) toward the mixture M-step, zero for
    kernels without gated mass or with a non-SPD moment matrix."""
    import jax.numpy as jnp
    from smoe_tpu.fit.lsinit import _accumulate
    from smoe_tpu.fit.trainer import effective_params

    cfg = s.cfg
    if yaware:
        G = _accumulate_yaware(s, sigma2)
    else:
        eff = effective_params(s.params, cfg, s.musX_grid)
        lw = (s.loss_mask if s.loss_mask is not None
              else jnp.ones(s.bset.coords.shape[:2], jnp.float32))
        G, _ = _accumulate(eff, cfg, s.bset.coords, s.bset.targets,
                           s.kernel_lists, s.bset.valid,
                           s.bset.train_mask, lw, s.model_mask, False)
    G = np.asarray(G, np.float64)
    k, p, _ = G.shape
    d = p - 1
    S0 = G[:, 0, 0]
    ok = S0 > 1e-6
    mu_star = G[:, 0, 1:] / np.maximum(S0, 1e-12)[:, None]
    Exx = G[:, 1:, 1:] / np.maximum(S0, 1e-12)[:, None, None]
    Sigma = Exx - mu_star[:, :, None] * mu_star[:, None, :]
    Sigma = 0.5 * (Sigma + np.swapaxes(Sigma, 1, 2)) + 1e-12 * np.eye(d)

    A_cur = np.asarray(s.params.a_diag + s.params.a_corr, np.float64)
    A_star = np.array(A_cur)
    for i in range(k):
        if not ok[i]:
            continue
        try:
            Sinv = np.linalg.inv(Sigma[i])
            L = np.linalg.cholesky(0.5 * (Sinv + Sinv.T))
        except np.linalg.LinAlgError:
            ok[i] = False
            continue
        # match the current column sign pattern (maha invariant; keeps
        # prod(diag A)'s sign for the determinant normalizer)
        sgn = np.sign(np.diagonal(A_cur[i]))
        sgn[sgn == 0] = 1.0
        A_star[i] = L * sgn[None, :]

    mu_cur = np.asarray(s.params.musX, np.float64)[:, :d]
    d_mu = np.where(ok[:, None], mu_star - mu_cur, 0.0)
    dA = np.where(ok[:, None, None], A_star - A_cur, 0.0)
    ii = np.arange(d)
    d_Adiag = np.zeros_like(dA)
    d_Adiag[:, ii, ii] = dA[:, ii, ii]
    d_Acorr = np.tril(dA, -1)
    return d_mu.astype(np.float32), d_Adiag.astype(np.float32), \
        d_Acorr.astype(np.float32), ok


def em_gating_step(s, ts, yaware=False):
    """Line-searched EM gating step; returns (chosen t, mse@t)."""
    s2 = None
    if yaware:
        _, mse, _, _ = s.run_batched(train=False)
        # sigma^2 of the joint model's y-noise ~ the current fit MSE
        # (mse is reported scaled by (2^p)^2, reference smoe.py:1053)
        s2 = max(float(mse) / float(2 ** s.cfg.precision) ** 2, 1e-8)
    d_mu, d_Ad, d_Ac, ok = em_gating_direction(s, yaware, s2)
    p0 = s.params
    best = (0.0, None)
    for t in ts:
        s.params = p0.replace(
            musX=np.asarray(p0.musX) + t * d_mu,
            a_diag=np.asarray(p0.a_diag) + t * d_Ad,
            a_corr=np.asarray(p0.a_corr) + t * d_Ac)
        s.valid = False
        _, mse, _, _ = s.run_batched(train=False)
        mse = float(mse)
        if best[1] is None or mse < best[1]:
            best = (t, mse)
    t = best[0]
    s.params = p0.replace(
        musX=np.asarray(p0.musX) + t * d_mu,
        a_diag=np.asarray(p0.a_diag) + t * d_Ad,
        a_corr=np.asarray(p0.a_corr) + t * d_Ac)
    s.valid = False
    return best


def fit(s, max_iters, chunk=20, refresh=100, em=False, ts=(0.0,)):
    from smoe_tpu.core.losses import psnr_from_mse
    iters, psnr = 0, 0.0
    traj, t_em = [], []
    while iters < max_iters:
        _, mse_a, _, _ = s.run_batched_chunk(chunk)
        iters += chunk
        if iters % 100 == 0:
            s.update_kernel_list()
        if refresh and iters % refresh == 0 and iters < max_iters:
            if em:
                t, _ = em_gating_step(s, ts, yaware=em == "y")
                t_em.append(t)
                s.update_kernel_list()
            s.ls_init_experts(mode="kernel")
        psnr = max(psnr, psnr_from_mse(np.nanmin(mse_a), s.cfg.precision))
        traj.append((iters, round(float(psnr), 2)))
    return {"psnr": round(float(psnr), 2),
            "traj": traj[:5] + traj[5::5],
            **({"t_chosen": t_em} if em else {})}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--max", type=int, default=1000)
    ap.add_argument("--refresh", type=int, default=100)
    ap.add_argument("--ts", type=str, default="0,0.01,0.03,0.1,0.3,1")
    ap.add_argument("--variants", type=str, default="lsri,em,em_y")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    ts = tuple(float(x) for x in args.ts.split(","))

    img = build_image(args.size)
    s = make_smoe(img)
    s.set_optimizer()
    warm_chunk(s, 20, rounds=2)

    out = {}
    all_v = {"lsri": False, "em": True, "em_y": "y"}
    for tag in args.variants.split(","):
        em = all_v[tag]
        s.reinit()
        s.ls_init_experts(mode="kernel")
        t0 = time.time()
        out[tag] = fit(s, args.max, refresh=args.refresh, em=em, ts=ts)
        out[tag]["wall_s"] = round(time.time() - t0, 1)
        print(tag, json.dumps(out[tag]), flush=True)
    print(json.dumps({"metric": "em_refresh_study", **out}))


if __name__ == "__main__":
    main()
