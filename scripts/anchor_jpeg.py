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


def anchor_rows(img_u8, n_pix):
    import cv2
    rows = []
    codecs = [("jpeg", ".jpg", cv2.IMWRITE_JPEG_QUALITY)]
    if hasattr(cv2, "IMWRITE_WEBP_QUALITY"):
        codecs.append(("webp", ".webp", cv2.IMWRITE_WEBP_QUALITY))
    bgr = img_u8[..., ::-1]
    for name, ext, flag in codecs:
        for q in (2, 5, 10, 20, 35, 50, 75, 90):
            ok, buf = cv2.imencode(ext, bgr, [flag, q])
            if not ok:
                continue
            dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
            rows.append({"codec": name, "q": q,
                         "bpp": round(8 * len(buf) / n_pix, 4),
                         "psnr_db": round(psnr(img_u8, dec), 2)})
    return rows


def smoe_row(img_u8, iters):
    from smoe_tpu import Smoe
    from smoe_tpu.codec.bitstream import write_bitstream
    from smoe_tpu.codec.quantize import quantize_params, rescaler
    from smoe_tpu.core.losses import psnr_from_mse

    img = (img_u8 / 255.0).astype(np.float32)
    n_pix = int(np.prod(img.shape[:-1]))
    # LS-fit knee depths + center-anchored nu: the fit below is
    # LS-initialized, and the Adam-era ulean knee (g6/nu8) measured a
    # ~4 dB loss on LS fits (BASELINE round 4); code the BEST-validation
    # snapshot, not the last iterate (the fit can degrade past its best)
    s = Smoe(img, kernels_per_dim=[12], bit_depths=(8, 10, 10, 10, 8),
             nu_anchor=True)
    s.set_optimizer()
    s.ls_init_experts()
    s.train(iters, val_iter=max(iters // 10, 1), ukl_iter=100)
    s.qparams = quantize_params(s.get_best_params(), s.cfg)
    s.rparams = rescaler(s.qparams, s.cfg)
    _, mse_q, npi, _ = s.run_batched(train=False, update_reconstruction=True,
                                     with_quantized_params=True)
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".smoe") as f:
        bits = write_bitstream(f.name, s.qparams, s.cfg)
    return {"codec": "smoe", "q": None,
            "bpp": round(bits / n_pix, 4),
            "psnr_db": round(float(psnr_from_mse(mse_q, 8)), 2),
            "iters": iters, "kernels": int(npi)}


def main():
    argv = sys.argv[1:]
    fit_iters = 0
    if "--fit" in argv:
        i = argv.index("--fit")
        fit_iters = int(argv[i + 1])
        del argv[i:i + 2]
    size = 256
    if "--size" in argv:
        i = argv.index("--size")
        size = int(argv[i + 1])
        del argv[i:i + 2]
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
                          **smoe_row(img_u8, fit_iters)}), flush=True)


if __name__ == "__main__":
    main()
