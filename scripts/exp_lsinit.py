"""Measure the least-squares expert init (fit/lsinit.py) on the headline
bench geometry: 512x512 RGB, K=256 (bench.py).

For each variant (plain sample init vs -lsinit) runs the reference recipe
fit and records the PSNR trajectory, iterations-to-32dB, and the one-shot
cost of the LS solve itself.  Run on TPU by default (axon), CPU via
`--cpu --size 64`.

Usage: python scripts/exp_lsinit.py [--size 512] [--target 32] [--max 2000]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_image, make_smoe, warm_chunk  # noqa: E402


def fit(s, target, max_iters, chunk=20, ls_every=0):
    from smoe_tpu.core.losses import psnr_from_mse
    t0 = time.time()
    iters, psnr, t_hit, i_hit = 0, 0.0, None, None
    traj = []
    while iters < max_iters:
        _, mse_a, _, _ = s.run_batched_chunk(chunk)
        iters += chunk
        if iters % 100 == 0:
            s.update_kernel_list()
        if ls_every and iters % ls_every == 0:
            s.ls_init_experts(mode="kernel")
        psnr = max(psnr, psnr_from_mse(np.nanmin(mse_a), s.cfg.precision))
        traj.append((iters, round(float(psnr), 2)))
        if t_hit is None and psnr >= target:
            t_hit, i_hit = time.time() - t0, iters
            break
    return {"psnr": round(float(psnr), 2), "iters_to_target": i_hit,
            "t_to_target_s": round(t_hit, 3) if t_hit else None,
            "traj": traj[:5] + traj[5::5]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--target", type=float, default=32.0)
    ap.add_argument("--max", type=int, default=2000)
    ap.add_argument("--mode", type=str, default="auto")
    ap.add_argument("--refresh", type=int, default=0,
                    help="also run a variant with a periodic kernel-mode "
                         "LS refresh every N iters")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    img = build_image(args.size)
    s = make_smoe(img)
    s.set_optimizer()
    warm_chunk(s, 20, rounds=2)

    out = {}
    variants = ["plain", "lsinit"] + \
        (["ls_refresh"] if args.refresh else [])
    for tag in variants:
        s.reinit()
        if tag != "plain":
            t0 = time.time()
            s.ls_init_experts(mode=args.mode)
            t_solve_cold = time.time() - t0
            s.reinit()
            t0 = time.time()
            s.ls_init_experts(mode=args.mode)
            t_solve = time.time() - t0
            out["ls_solve_s"] = round(t_solve, 3)
            out["ls_solve_cold_s"] = round(t_solve_cold, 3)
        from smoe_tpu.core.losses import psnr_from_mse
        _, m0, _, _ = s.run_batched(train=False)
        r = fit(s, args.target, args.max,
                ls_every=args.refresh if tag == "ls_refresh" else 0)
        r["init_psnr"] = round(float(psnr_from_mse(m0, s.cfg.precision)), 2)
        out[tag] = r
        print(tag, json.dumps(r), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
