"""Super-resolution decode demo: one bitstream, any raster.

`bench.build_image(n)` samples the SAME continuous function at any n, so
fitting SMoE at 256 and decoding the bitstream at the 512 raster
(`decode_bitstream(out_shape=...)`) has a real ground truth.  Compares
the continuous 2x decode against bicubic upsampling of (a) the decoded
256 image and (b) the raw 256 input.  The steered-kernel model renders
edges continuously — bicubic can only interpolate the coarse raster.

Usage: python scripts/demo_superres.py [--iters 600] [--k 16] [--cpu]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 10 * np.log10(1.0 / mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    import cv2

    from bench import build_image
    from smoe_tpu import Smoe
    from smoe_tpu.codec.bitstream import write_bitstream
    from smoe_tpu.codec.quantize import quantize_params
    from smoe_tpu.codec.serve import decode_bitstream

    lo = build_image(256)
    gt = build_image(512)        # same continuous function, finer raster

    # -np 0 semantics: normalized pis (~1/K) fall below the 10-bit pi
    # quantization step and collapse the decode (see rd_curve/video
    # bench notes); unnormalized pis start at 1.0
    s = Smoe(lo, kernels_per_dim=[args.k], use_yuv=True,
             use_determinant=True, normalize_pis=False)
    s.set_optimizer()
    s.ls_init_experts()
    s.train(args.iters, val_iter=max(args.iters // 5, 1), ukl_iter=100)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    path = os.path.join(tempfile.mkdtemp(prefix="smoe_sr_"), "m.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": [256, 256], "dim_of_output": [3],
        "use_yuv": True, "use_determinant": bool(s.cfg.use_determinant)})

    rec256 = np.asarray(decode_bitstream(path))
    rec512 = np.asarray(decode_bitstream(path, out_shape=(512, 512)))
    cubic_rec = cv2.resize(rec256, (512, 512), interpolation=cv2.INTER_CUBIC)
    cubic_raw = cv2.resize(lo, (512, 512), interpolation=cv2.INTER_CUBIC)

    out = {
        "metric": "superres_demo",
        "psnr_256_db": round(psnr(rec256, lo), 2),
        "psnr_sr512_db": round(psnr(rec512, gt), 2),
        "psnr_bicubic_of_decode_db": round(psnr(cubic_rec, gt), 2),
        "psnr_bicubic_of_input_db": round(psnr(cubic_raw, gt), 2),
        "iters": args.iters, "kernels": int(s.cfg.capacity),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
