"""End-to-end 4D LIGHT-FIELD quality benchmark (the d=4 analog of
bench_video_quality; reference capability C14, smoe.py:2199-2217).

Builds a synthetic 15x15-view light field with real disparity structure
(a textured background plane plus a foreground square at a different
disparity — the content class 4D steered kernels exist for: a kernel's
(u,v)x(y,x) covariance encodes the disparity slope), fits it through the
real CLI (which applies the reference's hardcoded corner-view train mask,
smoe.py:2374-2389), quantizes, entropy-codes, and decodes with the
serving decoder.  Reports decoded PSNR over the TRAINED views (the
reference's evaluation frame), all views, coded bpp, and wall-clock.

    python scripts/bench_lf.py [--k 6] [--kt 4] [--n 2000] [--s 48]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_lf(views: int = 15, s: int = 48, seed: int = 3,
             texture: str = "synth"):
    """(views, views, s, s, 1) grayscale LF in [0,1] with two disparity
    planes: background texture at slope +1.5 px/view, foreground square at
    -2.5 px/view (sampled from a shared oversized texture so every view is
    an exact shift — the Lambertian planar-scene model).

    texture="hopper" samples both planes from the REAL grace_hopper.jpg
    photograph (luminance) instead of the sinusoid fields — real natural
    texture under the same exact-shift disparity geometry."""
    rng = np.random.default_rng(seed)
    pad = int(3.0 * views) + 8
    side = s + 2 * pad
    if texture == "hopper":
        import cv2
        import matplotlib
        path = os.path.join(os.path.dirname(matplotlib.__file__),
                            "mpl-data", "sample_data", "grace_hopper.jpg")
        g = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.
        if min(g.shape) < side:
            sc = side / min(g.shape)
            g = cv2.resize(g, (int(np.ceil(g.shape[1] * sc)),
                               int(np.ceil(g.shape[0] * sc))),
                           interpolation=cv2.INTER_CUBIC)
        gh, gw = g.shape
        # background from the photo center, foreground plane from the
        # top-left corner (different real texture per disparity plane)
        tex = g[(gh - side) // 2:(gh - side) // 2 + side,
                (gw - side) // 2:(gw - side) // 2 + side].copy()
        ftex = g[:side, :side].copy()
    else:
        yy, xx = np.mgrid[0:side, 0:side] / s
        tex = (0.55 + 0.25 * np.sin(5.1 * yy + 1.0) * np.cos(4.3 * xx)
               + 0.12 * np.sin(11.0 * (yy + xx)))
        ftex = 0.35 + 0.3 * np.cos(7.0 * yy) * np.sin(6.2 * xx + 0.5)
    lf = np.empty((views, views, s, s), np.float32)
    uc = (views - 1) / 2
    d_bg, d_fg = 1.5, -2.5
    fy0, fx0, fs = int(0.30 * s), int(0.36 * s), int(0.30 * s)
    for u in range(views):
        for v in range(views):
            oy_b = pad + int(round(d_bg * (u - uc)))
            ox_b = pad + int(round(d_bg * (v - uc)))
            view = tex[oy_b:oy_b + s, ox_b:ox_b + s].copy()
            oy_f = pad + int(round(d_fg * (u - uc)))
            ox_f = pad + int(round(d_fg * (v - uc)))
            fg = ftex[oy_f:oy_f + s, ox_f:ox_f + s]
            view[fy0:fy0 + fs, fx0:fx0 + fs] = fg[fy0:fy0 + fs,
                                                  fx0:fx0 + fs]
            lf[u, v] = view
    lf += rng.normal(0, 0.004, lf.shape).astype(np.float32)
    return np.clip(lf, 0.0, 1.0)[..., None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=6,
                    help="spatial (y,x) kernels/dim")
    ap.add_argument("--kt", type=int, default=4,
                    help="view-axis (u,v) kernels/dim")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--s", type=int, default=48, help="spatial size")
    ap.add_argument("--val", type=int, default=500)
    ap.add_argument("--ukl", type=int, default=None,
                    help="kernel-list refresh cadence (see "
                         "bench_video_quality --ukl)")
    ap.add_argument("--iukl", action="store_true",
                    help="in-graph per-sweep kernel-list refresh")
    ap.add_argument("--pmt", type=float, default=None,
                    help="probe maha threshold")
    ap.add_argument("--pg", type=int, default=None,
                    help="probe grid points per dim")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--lean", action="store_true",
                    help="code with the lean bit allocation")
    ap.add_argument("--ulean", action="store_true",
                    help="code with the ultra-lean allocation "
                         "A8/mu10/nu8/pi10/g6 (per-group knee)")
    ap.add_argument("--lslean", action="store_true",
                    help="code with the LS-fit knee A8/mu10/nu10/pi10/g8 "
                         "(fit -lslean 1)")
    ap.add_argument("--lsinit", action="store_true",
                    help="closed-form LS expert init (fit -lsinit kernel)")
    ap.add_argument("--lsri", type=int, default=0,
                    help="periodic LS expert refresh cadence (fit -lsri N; "
                         "+5.0 dB over lsinit-only on this recipe)")
    ap.add_argument("--ganchor", action="store_true",
                    help="code gamma in the steering-whitened basis "
                         "(fit -ganchor 1)")
    ap.add_argument("--cw", type=float, default=0.0,
                    help="corner-view loss weight in (0,1]: include the "
                         "reference-masked corner views at this weight "
                         "during the fit (0 = reference behavior, corners "
                         "fully excluded; attacks the trained/all-views "
                         "generalization gap)")
    ap.add_argument("--texture", type=str, default="synth",
                    choices=["synth", "hopper"],
                    help="scene texture: synth = sinusoid planes; hopper "
                         "= both disparity planes sampled from the REAL "
                         "grace_hopper.jpg photograph")
    args = ap.parse_args()

    lf = build_lf(s=args.s, texture=args.texture)
    tmp = tempfile.mkdtemp(prefix="smoe_lfq_")
    mat = os.path.join(tmp, "lf.mat")
    from scipy.io import savemat
    savemat(mat, {"LF": lf})
    res_dir = os.path.join(tmp, "out")

    from smoe_tpu.cli.fit import main as fit_main

    t0 = time.time()
    argv = ["-i", mat, "-r", res_dir,
            "-n", str(args.n),
            "-k", str(args.kt), str(args.kt), str(args.k), str(args.k),
            "-v", str(args.val), "-lr", str(args.lr),
            "-np", "0", "-qm", "1"]
    if args.ukl:
        argv += ["-ukl", str(args.ukl)]
    if args.iukl:
        argv += ["-iukl", "1"]
    if args.pmt is not None:
        argv += ["-pmt", str(args.pmt)]
    if args.pg:
        argv += ["-pg", str(args.pg)]
    if args.lean:
        argv += ["-lean", "1"]
    if args.ulean:
        argv += ["-ulean", "1"]
    if args.lslean:
        argv += ["-lslean", "1"]
    if args.lsinit:
        argv += ["-lsinit", "kernel"]
    if args.lsinit or args.lsri:
        # LS-fitted slopes need center-anchored nu coding whether the fit
        # came from -lsinit or -lsri (exp_lsri_quant: −4.4 dB without)
        argv += ["-nuanchor", "1"]
    if args.lsri:
        argv += ["-lsri", str(args.lsri)]
    if args.ganchor:
        argv += ["-ganchor", "1"]
    if args.cw:
        argv += ["-lfcw", str(args.cw)]
    smoe = fit_main(argv)
    fit_s = time.time() - t0

    from smoe_tpu.codec.serve import decode_bitstream
    from smoe_tpu.fit.blocks import _lf_train_mask
    from smoe_tpu.io.images import read_image

    smoe_file = os.path.join(res_dir, "model_best.smoe")
    bits = os.path.getsize(smoe_file) * 8
    t0 = time.time()
    rec = np.asarray(decode_bitstream(smoe_file))
    dec_s = time.time() - t0

    orig, precision, _ = read_image(mat, False)
    rec = rec.reshape(orig.shape)
    scale = (2 ** precision) ** 2
    tm = _lf_train_mask(orig.shape[:2])          # (15, 15) trained views
    err2 = (rec - orig) ** 2
    mse_tr = float(err2[tm].mean()) * scale
    mse_all = float(err2.mean()) * scale
    psnr_tr = 10 * np.log10(scale / mse_tr)
    psnr_all = 10 * np.log10(scale / mse_all)
    n_pix = int(np.prod(orig.shape[:4]))

    from smoe_tpu.core.losses import psnr_from_mse
    gm = smoe.global_best_mse if smoe.global_best_mse is not None \
        else smoe.get_best_mse()

    print(json.dumps({
        "metric": "lf_4d_e2e_decoded_psnr_db",
        "value": round(psnr_tr, 2),
        "unit": "dB (trained views)",
        "psnr_all_views_db": round(psnr_all, 2),
        "psnr_train_best_db": round(psnr_from_mse(gm, precision), 2),
        "coded_bpp": round(bits / n_pix, 4),
        "coded_bits": bits,
        "live_kernels": int(smoe.get_num_pis()[-1][1]),
        "fit_wallclock_s": round(fit_s, 1),
        "decode_s": round(dec_s, 3),
        "views": list(orig.shape[:2]), "spatial": list(orig.shape[2:4]),
        "workdir": tmp,
        "recipe": f"fit {args.n}, k={args.kt},{args.kt},{args.k},{args.k}, "
                  f"qm=1, lr={args.lr}"
                  + (f", ukl={args.ukl}" if args.ukl else "")
                  + (", iukl" if args.iukl else "")
                  + (f", pmt={args.pmt}" if args.pmt is not None else "")
                  + (f", pg={args.pg}" if args.pg else "")
                  + (", lean" if args.lean else "")
                  + (", ulean" if args.ulean else "")
                  + (", lslean" if args.lslean else "")
                  + (", lsinit" if args.lsinit else "")
                  + (f", lsri={args.lsri}" if args.lsri else "")
                  + (", ganchor" if args.ganchor else "")
                  + (f", cw={args.cw}" if args.cw else "")
                  + (f", texture={args.texture}"
                     if args.texture != "synth" else ""),
    }))


if __name__ == "__main__":
    main()
