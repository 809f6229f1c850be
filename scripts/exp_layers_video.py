"""Layered (SNR-scalable) bitstream ladder at PRODUCTION scale: re-code a
converged CIF video fit (the bench_video_quality recipe's params_best.pkl)
as an L-tier layered .smoe and decode every tier prefix — rate + PSNR per
prefix on a 6k-kernel dual-model motion-compensated video model, not a toy.

The reference has no bitstream at all (its codec stand-in is a pickle of
quantized integers, reference smoe_reconstruction_decoded.py:16-62), let
alone a scalable one.

Usage: python scripts/exp_layers_video.py --params <out/params_best.pkl>
           [--layers 4] [--static]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_video import build_video                    # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True,
                    help="params_best.pkl of a converged video fit")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--static", action="store_true",
                    help="the fit used the pure-pan clip")
    ap.add_argument("--nuanchor", action="store_true",
                    help="center-anchored nu coding (use for LS fits, "
                         "VERDICT r3 #7)")
    ap.add_argument("--bd", type=int, nargs=5, default=None,
                    help="bit depths A/mu/nu/pi/gamma (default reference)")
    args = ap.parse_args()

    # the bench clip is deterministic — rebuild it as the PSNR target
    vid, affines = build_video(moving_obj=not args.static)
    tmp = tempfile.mkdtemp(prefix="smoe_layvid_")
    clip = os.path.join(tmp, "cif.npz")
    np.savez(clip, imgs=np.moveaxis((vid * 255).astype(np.uint8), 2, 0),
             affines=affines)

    # re-code through the real encode CLI (rebuilds motion/diff-center/
    # dual-model state exactly as the recorded control recode did)
    from smoe_tpu.cli.reconstruct import main as rec_main
    rec_dir = os.path.join(tmp, "rec")
    rec_main(["-i", clip, "-p", args.params, "-r", rec_dir,
              "--layers", str(args.layers)]
             + (["-nuanchor", "1"] if args.nuanchor else [])
             + (["-bd"] + [str(b) for b in args.bd] if args.bd else []))
    lay = os.path.join(rec_dir, "model.smoe")

    from smoe_tpu.codec.bitstream import read_header
    from smoe_tpu.codec.serve import decode_bitstream
    from smoe_tpu.io.images import read_image

    orig, precision, _ = read_image(clip, True)        # YUV train target
    n_pix = float(np.prod(orig.shape[:3]))
    peak = (2.0 ** precision) ** 2

    def psnr(rec):
        mse = float(np.mean((np.asarray(rec).reshape(orig.shape)
                             - orig) ** 2)) * peak
        return 10 * np.log10(peak / mse)

    header = read_header(lay)
    per = [int(lh["bytes"]) for lh in header["layers"]]
    fixed = os.path.getsize(lay) - sum(per)
    rows, cum = [], fixed * 8
    for m in range(1, args.layers + 1):
        cum += per[m - 1] * 8
        t0 = time.time()
        rec = decode_bitstream(lay, layers=m)
        dt = time.time() - t0
        rows.append({"tiers": m,
                     "kernels": sum(int(lh["num_kernels"])
                                    for lh in header["layers"][:m]),
                     "cum_bits": int(cum), "cum_bpp": round(cum / n_pix, 4),
                     "psnr_db": round(psnr(rec), 2),
                     "decode_s": round(dt, 1)})
    print(json.dumps({
        "metric": "layered_video_ladder",
        "layers": args.layers,
        "clip": "static-pan" if args.static else "moving-obj",
        "file_bits": os.path.getsize(lay) * 8,
        "file_bpp": round(os.path.getsize(lay) * 8 / n_pix, 4),
        "ladder": rows}))


if __name__ == "__main__":
    main()
