"""Diagnose the lsri <-> quantization interaction seen on the RD config.

rd_curve.py --lsri originally measured a collapsed qpsnr relative to the
plain fit despite lsri's large float gains.  This script separates the
candidate causes on the RD geometry (256^2, K=144):

  (a) in-list illusion — float in-list PSNR >> float dense PSNR
      (kernel-list drift, see ROADMAP "drift pathology");
  (b) quantizer-range stretch — float dense PSNR fine, qpsnr collapsed,
      param min/max ranges (the data-derived quantizer bounds) blown up
      by the LS experts;
  (c) genuine float regression — float dense PSNR itself below plain
      (refresh perturbs Adam in the unsaturated regime).

RESOLVED (round 3, 1000-iter sweep): the cause is (b), but NOT low-mass
junk kernels — it is the origin-anchored nu parameterization itself.
LS fits honest steep slopes (gamma +-5.7 vs Adam's +-0.65), and
nu = surface value extrapolated to x=0 then spans +-5 instead of [0,1],
stretching the 6-bit data-derived nu quantizer 10x.  Two wrong fixes
measured first: Levenberg damping of the solve ratchets params to
extremes through the global line search (t drifts -0.29 -> 1.07; nu
+-80, qpsnr 12.7 at damp=1e-2 pre-clamp) and, even t-clamped, costs
float quality (38.1 -> 34.4 dB) without tightening ranges.  The right
fix is codec-side center-anchored nu coding (config.nu_anchor): same
float fit 38.05 dB, qpsnr 30.46 -> 34.84 (+4.4 dB at identical rate);
plain fit reaches 28.9.  Numbers: BASELINE.md round-3 table.

Usage: python scripts/exp_lsri_quant.py [--iters 1000] [--size 256]
       [--damps 0 1e-2]   # each damp runs anchor off AND on
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def dense_eval_psnr(s):
    """Float PSNR with ALL kernels listed for every block (no list bias)."""
    import jax.numpy as jnp
    saved = s.kernel_lists
    s.kernel_lists = jnp.ones_like(saved)
    try:
        from smoe_tpu.core.losses import psnr_from_mse
        _, mse, _, _ = s.run_batched(train=False)
        return float(psnr_from_mse(mse, s.cfg.precision))
    finally:
        s.kernel_lists = saved
        s.valid = False


def run_variant(img, precision, iters, ls_every, damp=0.0, anchor=False):
    import jax.numpy as jnp  # noqa: F401
    from smoe_tpu import Smoe
    from smoe_tpu.codec.quantize import quantize_params, rescaler
    from smoe_tpu.core.losses import psnr_from_mse

    s = Smoe(img, kernels_per_dim=[12], use_yuv=True, precision=precision,
             nu_anchor=anchor)
    s.set_optimizer()
    if ls_every:
        s.ls_init_experts(mode="kernel", damp=damp)
    done = 0
    while done < iters:
        n = min(100, iters - done)
        _, mse_list, _, _ = s.run_batched_chunk(n)
        s.update_kernel_list()
        done += n
        if ls_every and done % ls_every == 0 and done < iters:
            s.ls_init_experts(mode="kernel", damp=damp)
    inlist = float(psnr_from_mse(np.nanmin(mse_list), precision))
    dense = dense_eval_psnr(s)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    s.rparams = rescaler(s.qparams, s.cfg)
    _, qmse, _, _ = s.run_batched(train=False, update_reconstruction=True,
                                  with_quantized_params=True)
    qpsnr = float(psnr_from_mse(qmse, precision))
    p = s.get_params()
    ranges = {name: [round(float(np.min(v)), 3), round(float(np.max(v)), 3)]
              for name, v in p.items()
              if hasattr(v, "size") and np.asarray(v).size}
    return {"float_inlist_db": round(inlist, 2),
            "float_dense_db": round(dense, 2),
            "qpsnr_db": round(qpsnr, 2), "ranges": ranges}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lsri", type=int, default=100)
    ap.add_argument("--damps", type=float, nargs="*", default=[0.0])
    args = ap.parse_args()

    from bench import build_image
    img = build_image(args.size)
    out = {"plain": run_variant(img, 8, args.iters, 0)}
    print("plain", json.dumps(out["plain"]), flush=True)
    for damp in args.damps:
        for anchor in (False, True):
            tag = f"lsri_damp{damp:g}" + ("_anchor" if anchor else "")
            out[tag] = run_variant(img, 8, args.iters, args.lsri, damp,
                                   anchor)
            print(tag, json.dumps(out[tag]), flush=True)
    print(json.dumps({"metric": "lsri_quant_diag", **out}))


if __name__ == "__main__":
    main()
