"""Where does the fused gate+expert step time actually go? (VERDICT r2 #5)

The maha matmul's contraction width is F=8 (quadratic features, d=2), so
the 128-deep MXU runs at ~6% utilization *by construction* — but
BASELINE.md also claims the kernel is VPU-bound in practice, in which case
no wider-contraction reformulation of the matmul can move the headline.
This script settles it with an ABLATION: variants of the forward kernel
with pieces removed, timed at the 512x512/K=256 bench geometry on the real
chip.

variants:
  full        the production forward kernel
  exp2        exp(mh) -> exp2(mh * log2 e), scale folded into the (K, F)
              prescale (exact reformulation candidate: if the VPU lowers
              exp via exp2 anyway this is free; if not it saves a multiply)
  no_cull     drop the influence cull (one (TN,K) cmp+select less)
  no_norm     drop denominator+cull (no reduce, no div)
  no_exp      drop exp+norm+cull: matmul -> min -> matmul only.  The gap
              full - no_exp is the total VPU-elementwise cost; no_exp
              itself is the pure-MXU floor a wider contraction could
              (at best) approach.

Each variant is timed standalone (median of reps over a jitted loop of
iters), forward only — the backward recomputes the same chain, so the
attribution carries over.

    python scripts/bench_contraction.py [--n 262144] [--k 256] [--reps 5]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoe_tpu.kernels.gate_expert import (_pad_axis, _round_up, _tile_n,
                                          fused_gate_expert)

LOG2E = float(np.log2(np.e))


def _variant_kernel(phiT_ref, qT_ref, G_ref, pi_det_ref, res_ref, *,
                    c_dim: int, e_dim: int, thr: float, floor: float,
                    mode: str):
    mh = jnp.minimum(jax.lax.dot_general(
        phiT_ref[:], qT_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), 0.0)
    if mode == "no_exp":
        w = mh
    else:
        e = jnp.exp2(mh) if mode == "exp2" else jnp.exp(mh)
        n_w = e * pi_det_ref[:]
        if mode == "no_norm":
            w = n_w
        else:
            denom = jnp.maximum(floor, jnp.sum(n_w, axis=1, keepdims=True))
            w = n_w / denom
            if mode != "no_cull":
                w = jnp.where(w > thr, w, 0.0)
    wg = jnp.dot(w, G_ref[:], preferred_element_type=jnp.float32)
    # fold the xe mix into a fixed sum so every variant does the same tail
    res = jnp.zeros((w.shape[0], c_dim), jnp.float32)
    for j in range(e_dim):
        res = res + wg[:, j * c_dim:(j + 1) * c_dim]
    res_ref[:] = res


def variant_call(phi, q, G, pi_det, mode: str, thr=1e-4, floor=1e-11):
    n, f = phi.shape
    k = q.shape[0]
    ec = G.shape[1]
    c_dim = 3
    e_dim = ec // c_dim
    f_pad = _round_up(f, 8)
    k_pad = _round_up(k, 128)
    tn = _tile_n(k_pad)
    n_pad = _round_up(n, tn)
    phiT = _pad_axis(_pad_axis(phi.T, 0, f_pad), 1, n_pad)
    scale = -0.5 * (LOG2E if mode == "exp2" else 1.0)
    qp = _pad_axis(_pad_axis(q * scale, 0, k_pad), 1, f_pad)
    Gp = _pad_axis(G, 0, k_pad)
    pip = _pad_axis(pi_det, 0, k_pad)
    kern = functools.partial(_variant_kernel, c_dim=c_dim, e_dim=e_dim,
                             thr=thr, floor=floor, mode=mode)
    res = pl.pallas_call(
        kern,
        grid=(n_pad // tn,),
        in_specs=[
            pl.BlockSpec((f_pad, tn), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, ec), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, c_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c_dim), jnp.float32),
        interpret=os.environ.get("SMOE_BENCH_INTERPRET") == "1",
    )(phiT, qp.T, Gp, pip[None, :])
    return res[:n]


def time_fn(fn_of_c, iters=50, reps=5):
    """Time fn_of_c(carry) inside a scan.  The carry feeds the next call's
    inputs (fn must add carry*1e-30 to an operand) so XLA can neither DCE
    the kernel nor hoist the loop-invariant call out of the scan."""
    def step(c, _):
        return jnp.sum(fn_of_c(c)), None
    loop = jax.jit(lambda: jax.lax.scan(step, jnp.float32(0), None,
                                        length=iters)[0])
    jax.block_until_ready(loop())             # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(loop())
        ts.append((time.time() - t0) / iters)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512 * 512)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n, k, d, c = args.n, args.k, 2, 3
    f = d * d + d + 1
    side = int(np.sqrt(n))
    y, x = np.mgrid[0:side, 0:side] / (side - 1)
    coords = np.stack([y, x], -1).reshape(-1, d).astype(np.float32)
    phi = np.concatenate([
        (coords[:, :, None] * coords[:, None, :]).reshape(-1, d * d),
        coords, np.ones((coords.shape[0], 1), np.float32)], 1)[:n]
    xe = np.concatenate([coords, np.ones((coords.shape[0], 1),
                                         np.float32)], 1)[:n]
    q = rng.normal(0, 3, (k, f)).astype(np.float32)
    G = rng.normal(0, .1, (k, (d + 1) * c)).astype(np.float32)
    pi_det = np.full((k,), 1.0 / k, np.float32)
    mask = np.ones((k,), np.float32)

    jphi, jxe = jnp.asarray(phi), jnp.asarray(xe)
    jq, jG = jnp.asarray(q), jnp.asarray(G)
    jpi, jmask = jnp.asarray(pi_det), jnp.asarray(mask)

    # production op (fwd only), for scale reference
    t_prod = time_fn(
        lambda c: fused_gate_expert(jphi, jxe, jq + c * 1e-30, jG, jpi,
                                    jmask, 1e-4, 1e-11, n, False)[0],
        iters=args.iters, reps=args.reps)
    print(f"production fused fwd        : {t_prod * 1e3:8.3f} ms",
          flush=True)

    results = {}
    for mode in ("full", "exp2", "no_cull", "no_norm", "no_exp"):
        t = time_fn(lambda c, m=mode: variant_call(jphi, jq + c * 1e-30,
                                                   jG, jpi, m),
                    iters=args.iters, reps=args.reps)
        results[mode] = t
        print(f"variant {mode:12s}        : {t * 1e3:8.3f} ms", flush=True)

    full, floor_t = results["full"], results["no_exp"]
    print(f"\nN={n} K={k}: VPU-elementwise share = "
          f"{(full - floor_t) / full * 100:.1f}% of the forward "
          f"(full {full * 1e3:.3f} ms vs pure-matmul floor "
          f"{floor_t * 1e3:.3f} ms).")
    print("A wider-contraction maha reformulation can at BEST reach the "
          "pure-matmul floor; the exp2/no_cull deltas show what cheaper "
          "elementwise chains buy.")


if __name__ == "__main__":
    main()
