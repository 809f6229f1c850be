"""Classical-codec anchors for the 4D LIGHT-FIELD modality (VERDICT r4
#1): per-view JPEG / WebP quality sweeps, plus pseudo-video coding of the
view raster through cv2.VideoWriter inter-frame codecs (mp4v / XVID /
VP9) — serializing the 15x15 view grid in boustrophedon order so
neighboring "frames" differ by one disparity step, the standard
pseudo-sequence LF-coding baseline.

Same LF content and same metric as scripts/bench_lf.py: grayscale
(views, views, s, s, 1) in [0,1]; PSNR over ALL views and over the
reference-trained views (corner mask, reference smoe.py:2374-2389);
bpp over all views' pixels.  Anchors are scored against the uint8
rounding of the float LF (the codecs' input), exactly as the .mat read
path quantizes nothing — so anchor PSNR carries the codecs' own u8
floor (~52 dB), far above every rate point compared here.

Usage:
  python scripts/anchor_lf.py [--s 24] [--texture synth|hopper]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_lf import build_lf                          # noqa: E402


def psnr_pair(orig, rec, train_mask):
    err2 = (rec.astype(np.float64) - orig.astype(np.float64)) ** 2
    return (round(10 * np.log10(1.0 / max(err2[train_mask].mean(), 1e-12)),
                  2),
            round(10 * np.log10(1.0 / max(err2.mean(), 1e-12)), 2))


def per_view_rows(views_u8, orig, tm, n_pix):
    """JPEG (native grayscale) and WebP (gray replicated to 3 channels —
    cv2's WebP encoder rejects 1-channel input) applied per view."""
    import cv2
    u, v, s, _ = views_u8.shape
    rows = []
    codecs = [("jpeg", ".jpg", cv2.IMWRITE_JPEG_QUALITY, False)]
    if hasattr(cv2, "IMWRITE_WEBP_QUALITY"):
        codecs.append(("webp", ".webp", cv2.IMWRITE_WEBP_QUALITY, True))
    for name, ext, flag, need3 in codecs:
        for q in (2, 5, 10, 20, 35, 50, 75, 90):
            bits = 0
            rec = np.empty_like(views_u8)
            ok_all = True
            for i in range(u):
                for j in range(v):
                    im = views_u8[i, j]
                    if need3:
                        im = np.repeat(im[..., None], 3, -1)
                    ok, buf = cv2.imencode(ext, im, [flag, q])
                    if not ok:
                        ok_all = False
                        break
                    bits += 8 * len(buf)
                    d = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE
                                     if not need3 else cv2.IMREAD_COLOR)
                    rec[i, j] = d if not need3 else d[..., 0]
                if not ok_all:
                    break
            if not ok_all:
                break
            p_tr, p_all = psnr_pair(orig, rec / 255.0, tm)
            rows.append({"codec": f"{name}-per-view", "q": q,
                         "inter": False, "bpp": round(bits / n_pix, 4),
                         "psnr_trained_db": p_tr, "psnr_all_db": p_all})
    return rows


def pseudo_video_rows(views_u8, orig, tm, n_pix):
    """Boustrophedon view scan -> VideoWriter inter-frame codecs (the
    pseudo-sequence LF baseline).  MJPG gets the quality sweep; the
    inter-frame codecs run at ffmpeg's fixed default qscale."""
    import cv2
    u, v, s, _ = views_u8.shape
    order = [(i, j if i % 2 == 0 else v - 1 - j)
             for i in range(u) for j in range(v)]
    rows = []
    cases = [("MJPG", ".avi", False, q) for q in (20, 50, 90)]
    cases += [("mp4v", ".mp4", True, None), ("XVID", ".avi", True, None),
              ("VP90", ".webm", True, None)]
    for cc, ext, inter, q in cases:
        path = tempfile.mktemp(suffix=ext)
        try:
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*cc), 25,
                                 (s, s),
                                 *([[cv2.VIDEOWRITER_PROP_QUALITY, q]]
                                   if q is not None else []))
            if not vw.isOpened():
                continue
            if q is not None:
                vw.set(cv2.VIDEOWRITER_PROP_QUALITY, q)
            for i, j in order:
                vw.write(np.repeat(views_u8[i, j][..., None], 3, -1))
            vw.release()
            if not os.path.exists(path) or os.path.getsize(path) == 0:
                continue
            bits = 8 * os.path.getsize(path)
            cap = cv2.VideoCapture(path)
            rec = np.empty_like(views_u8)
            n = 0
            while True:
                ret, fr = cap.read()
                if not ret:
                    break
                i, j = order[n]
                rec[i, j] = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
                n += 1
            cap.release()
            if n != len(order):
                continue
            p_tr, p_all = psnr_pair(orig, rec / 255.0, tm)
            rows.append({"codec": f"{cc}-pseudo-seq", "q": q,
                         "inter": inter, "bpp": round(bits / n_pix, 4),
                         "psnr_trained_db": p_tr, "psnr_all_db": p_all})
        finally:
            if os.path.exists(path):
                os.remove(path)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=24, help="spatial size")
    ap.add_argument("--texture", type=str, default="synth",
                    choices=["synth", "hopper"])
    args = ap.parse_args()

    from smoe_tpu.fit.blocks import _lf_train_mask

    lf = build_lf(s=args.s, texture=args.texture)[..., 0]   # (15,15,s,s)
    views_u8 = np.round(lf * 255.0).astype(np.uint8)
    # score anchors against what they encode: the u8 view raster (the
    # float->u8 rounding floor is ~52 dB, above every point here)
    orig = views_u8 / 255.0
    tm = _lf_train_mask(lf.shape[:2])
    n_pix = int(np.prod(lf.shape))

    meta = {"s": args.s, "texture": args.texture}
    for row in per_view_rows(views_u8, orig, tm, n_pix):
        print(json.dumps({**meta, **row}), flush=True)
    for row in pseudo_video_rows(views_u8, orig, tm, n_pix):
        print(json.dumps({**meta, **row}), flush=True)


if __name__ == "__main__":
    main()
