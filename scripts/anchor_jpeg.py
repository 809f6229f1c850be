"""Classical-codec anchor for the RD story: JPEG (and WebP when OpenCV
ships it) quality sweep on the same image the smoe RD curve uses, so
BASELINE rate points have a familiar yardstick.

The reference never ships an anchor comparison; its papers position SMoE
against JPEG at low bpp.  This prints one JSON row per anchor quality
(bpp + RGB PSNR) and, with --fit N, one smoe row (N-iter fit, ulean
quantize -> REAL coded bitstream -> decode PSNR) for the same image.

Usage: python scripts/anchor_jpeg.py [image.png] [--fit 1000] [--size 256]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255.0 ** 2 / mse)


def ssim_rgb(a_u8, b_u8):
    """Mean per-channel SSIM in the coding (RGB/gray) domain on [0,1],
    with the trainer's symmetric 5-px pad (core/ssim.py, reference
    ops/image_ops_impl.py semantics) — the perceptual yardstick column
    for both the classical anchors and the smoe rows."""
    from smoe_tpu.core.ssim import ssim_loss
    a = (a_u8 / 255.0).astype(np.float32)
    b = (b_u8 / 255.0).astype(np.float32)
    return float(1.0 - ssim_loss(a, b, use_yuv=False))


def anchor_rows(img_u8, n_pix):
    import cv2
    rows = []
    codecs = [("jpeg", ".jpg", cv2.IMWRITE_JPEG_QUALITY)]
    if hasattr(cv2, "IMWRITE_WEBP_QUALITY"):
        codecs.append(("webp", ".webp", cv2.IMWRITE_WEBP_QUALITY))
    gray = img_u8.shape[-1] == 1             # mri/dem families
    enc_in = img_u8[..., 0] if gray else img_u8[..., ::-1]
    for name, ext, flag in codecs:
        for q in (2, 5, 10, 20, 35, 50, 75, 90):
            try:
                ok, buf = cv2.imencode(ext, enc_in, [flag, q])
            except cv2.error:                # e.g. webp rejects 1-channel
                break
            if not ok:
                break
            dec = (cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)[..., None]
                   if gray else
                   cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1])
            rows.append({"codec": name, "q": q,
                         "bpp": round(8 * len(buf) / n_pix, 4),
                         "psnr_db": round(psnr(img_u8, dec), 2),
                         "ssim": round(ssim_rgb(img_u8, dec), 4)})
    return rows


def smoe_row(img_u8, iters, k=12, lsri=0, auto=False, ssim_fit=False):
    """One smoe RD point for the anchor table.

    Default: LS-init fit at the LS-knee depths + center-anchored nu,
    coding the BEST-validation snapshot (photograph fits measurably
    degrade past their best — hopper k=20 ended at mse 559 vs best 177).

    auto=True runs the PRODUCTION composed encode on the fit: measured
    per-group bit allocation (codec/alloc.py --auto-bd semantics) + the
    RD prune sweep — the path that beats JPEG q2 by +3.7 dB at 0.29 bpp
    on the real photograph (BASELINE round 4).
    """
    from smoe_tpu import Smoe
    from smoe_tpu.codec.bitstream import write_bitstream
    from smoe_tpu.codec.quantize import quantize_params, rescaler
    from smoe_tpu.core.losses import psnr_from_mse

    img = (img_u8 / 255.0).astype(np.float32)
    n_pix = int(np.prod(img.shape[:-1]))
    s = Smoe(img, kernels_per_dim=[k], bit_depths=(8, 10, 10, 10, 8),
             nu_anchor=True, in_graph_ukl=True, ssim_opt=ssim_fit)
    s.set_optimizer()
    s.ls_init_experts()
    s.train(iters, val_iter=max(iters // 10, 1), ukl_iter=100,
            ls_refresh_iter=lsri or None)
    # rebuild on the BEST-validation snapshot (the production CLI path:
    # reconstruct loads params_best.pkl the same way)
    s = Smoe(img, init_params_dict=s.get_best_params(),
             bit_depths=(8, 10, 10, 10, 8), nu_anchor=True)

    if auto:
        from smoe_tpu.codec.alloc import START, choose_anchors, \
            search_bit_depths
        from smoe_tpu.codec.prune import prune_search
        s.cfg = s.cfg.replace(bit_depths=START)
        choose_anchors(s)
        bd, _, _ = search_bit_depths(s, tol_db=0.05)
        s.cfg = s.cfg.replace(bit_depths=bd)
        s.qparams = quantize_params(s.get_params(), s.cfg,
                                    musX_grid=s.musX_grid)
        s.qparams = prune_search(s, 0.0)
    else:
        s.qparams = quantize_params(s.get_params(), s.cfg,
                                    musX_grid=s.musX_grid)
    s.rparams = rescaler(s.qparams, s.cfg,
                         None if s.musX_grid is None else
                         np.asarray(s.musX_grid)[
                             np.asarray(s.qparams["used_kernels"])])
    _, mse_q, npi, _ = s.run_batched(train=False, update_reconstruction=True,
                                     with_quantized_params=True)
    rec_u8 = np.uint8(np.clip(np.asarray(s.get_qreconstruction()), 0, 1)
                      * 255 + 0.5)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".smoe") as f:
        bits = write_bitstream(f.name, s.qparams, s.cfg)
    return {"codec": "smoe-ssim" if ssim_fit else "smoe", "q": None,
            "bpp": round(bits / n_pix, 4),
            "psnr_db": round(float(psnr_from_mse(mse_q, 8)), 2),
            "ssim": round(ssim_rgb(img_u8, rec_u8), 4),
            "iters": iters, "kernels": int(npi),
            "k": k, "lsri": lsri, "auto": bool(auto)}


def main():
    argv = sys.argv[1:]

    def intopt(flag, default):
        if flag in argv:
            i = argv.index(flag)
            v = int(argv[i + 1])
            del argv[i:i + 2]
            return v
        return default

    fit_iters = intopt("--fit", 0)
    size = intopt("--size", 256)
    k = intopt("--k", 12)
    lsri = intopt("--lsri", 0)
    auto = "--auto" in argv
    if auto:
        argv.remove("--auto")
    ssim_fit = "--ssim" in argv
    if ssim_fit:
        argv.remove("--ssim")
    family = "bench"
    if "--family" in argv:
        i = argv.index("--family")
        family = argv[i + 1]
        del argv[i:i + 2]

    if argv:
        import cv2
        bgr = cv2.imread(argv[0], cv2.IMREAD_COLOR)
        if bgr is None:
            raise SystemExit(f"cannot read {argv[0]}")
        img_u8 = bgr[..., ::-1]
    else:
        from content import build_family
        img_u8 = np.uint8(build_family(family, size) * 255)

    n_pix = int(np.prod(img_u8.shape[:-1]))
    for row in anchor_rows(img_u8, n_pix):
        print(json.dumps({"family": family, **row}), flush=True)
    if fit_iters:
        print(json.dumps({"family": family,
                          **smoe_row(img_u8, fit_iters, k=k, lsri=lsri,
                                     auto=auto, ssim_fit=ssim_fit)}),
              flush=True)


if __name__ == "__main__":
    main()
