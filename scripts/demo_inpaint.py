"""Inpainting workload demo: the loss-mask capability (reference
smoe.py loss-masked MSE via smoe_test.py -mask) as a hole-filling demo.

Holes are punched into a structured image; the fit sees only the pixels
OUTSIDE the holes (loss_mask=0 inside), and the continuous SMoE model
interpolates across them.  Reports PSNR over the hole pixels vs the
clean image — a number the masked loss never saw.

Usage: python scripts/demo_inpaint.py [--size 128] [--iters 600] [--cpu]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(size):
    from bench import build_image
    img = build_image(size)
    rng = np.random.default_rng(7)
    mask = np.ones(img.shape[:2], np.float32)       # 1 = trusted pixel
    for _ in range(6):                              # rectangular dropouts
        h = rng.integers(size // 16, size // 6)
        w = rng.integers(size // 16, size // 6)
        y = rng.integers(0, size - h)
        x = rng.integers(0, size - w)
        mask[y:y + h, x:x + w] = 0.0
    return img, mask


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from smoe_tpu import Smoe
    img, mask = build(args.size)
    holes = mask == 0.0
    corrupted = img.copy()
    corrupted[holes] = 0.5              # the fit must never look here

    def psnr_on(rec, sel):
        mse = float(np.mean((rec[sel] - img[sel]) ** 2)) * 255.0 ** 2
        return 10 * np.log10(255.0 ** 2 / mse)

    s = Smoe(corrupted, kernels_per_dim=[args.k], loss_mask=mask)
    s.set_optimizer()
    s.ls_init_experts()   # LS solve weights rows by the mask too
    s.train(args.iters, val_iter=max(args.iters // 5, 1), ukl_iter=100,
            use_loss_mask=True)
    s.run_batched(train=False, update_reconstruction=True)
    rec = np.asarray(s.get_reconstruction(), np.float32)
    if rec.shape[-1] != img.shape[-1]:
        rec = rec[..., : img.shape[-1]]

    out = {
        "metric": "inpaint_demo",
        "hole_frac": round(float(holes.mean()), 4),
        "psnr_holes_input_db": round(psnr_on(corrupted, holes), 2),
        "psnr_holes_db": round(psnr_on(rec, holes), 2),
        "psnr_trusted_db": round(psnr_on(rec, ~holes), 2),
        "kernels": int(np.asarray(s.get_num_pis()).reshape(-1)[-1]),
        "iters": args.iters,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
