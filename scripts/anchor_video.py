"""Classical-codec anchors for the VIDEO modality (VERDICT r4 #1): the
flagship SMoE video headlines had no external yardstick.  This prints one
JSON row per anchor point on the SAME clip and SAME metric that
scripts/bench_video_quality.py reports, so the BASELINE rows compare
apples to apples:

  * per-frame JPEG / WebP quality sweeps (intra-only, the image-codec
    floor the SMoE literature positions against),
  * MJPG via cv2.VideoWriter (intra-only AVI, quality sweep),
  * mp4v / XVID (MPEG-4 part 2) and VP9 via cv2.VideoWriter — TRUE
    inter-frame codecs with motion compensation (this build carries no
    H.264 encoder: only the broken h264_v4l2m2m V4L2 wrapper, probed
    2026-08-20).  ffmpeg's default fixed-qscale settings give one RD
    point each (cv2 exposes no CRF/bitrate control for them).

Metric parity: bench_video_quality feeds the clip through
read_image(npz, use_yuv=True) — per-frame uint8 RGB->YUV (cv2) then /255
— and reports PSNR = 10*log10(1/mean((rec-orig)^2)) over the whole YUV
volume, plus the 6/1/1-weighted variant.  Anchor decodes go through the
identical conversion here.

With --smoe FILE.smoe, also decodes an SMoE bitstream of this clip
through the serving decoder and prints its row on the same metric.

Usage:
  python scripts/anchor_video.py [--texture synth|hopper] [--static]
                                 [--smoe model.smoe]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_video import build_video                    # noqa: E402


def to_yuv_float(frames_u8_rgb):
    """(T, H, W, 3) uint8 RGB -> float YUV in [0,1], the read_image path
    (io/images.py:93-100: cv2 RGB2YUV on uint8, then /255)."""
    import cv2
    out = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV)
                    for f in frames_u8_rgb])
    return out.astype(np.float32) / 255.0


def psnr_rows(orig_yuv, rec_yuv):
    mse = float(np.mean((rec_yuv - orig_yuv) ** 2))
    wts = np.array([6, 1, 1]) / 8
    mse_yuv = float(np.average(
        np.mean((rec_yuv - orig_yuv) ** 2, axis=(0, 1, 2)), weights=wts))
    return (round(10 * np.log10(1.0 / mse), 2),
            round(10 * np.log10(1.0 / mse_yuv), 2))


def per_frame_rows(frames_rgb, orig_yuv, n_pix):
    """JPEG / WebP applied frame-by-frame (intra-only image codecs)."""
    import cv2
    rows = []
    codecs = [("jpeg", ".jpg", cv2.IMWRITE_JPEG_QUALITY)]
    if hasattr(cv2, "IMWRITE_WEBP_QUALITY"):
        codecs.append(("webp", ".webp", cv2.IMWRITE_WEBP_QUALITY))
    for name, ext, flag in codecs:
        for q in (2, 5, 10, 20, 35, 50, 75, 90):
            bits = 0
            dec = []
            ok_all = True
            for f in frames_rgb:
                ok, buf = cv2.imencode(ext, f[..., ::-1], [flag, q])
                if not ok:
                    ok_all = False
                    break
                bits += 8 * len(buf)
                dec.append(cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1])
            if not ok_all:
                break
            p, p_w = psnr_rows(orig_yuv, to_yuv_float(np.stack(dec)))
            rows.append({"codec": f"{name}-per-frame", "q": q,
                         "inter": False, "bpp": round(bits / n_pix, 4),
                         "psnr_db": p, "psnr_yuv_weighted_db": p_w})
    return rows


def videowriter_rows(frames_rgb, orig_yuv, n_pix):
    """cv2.VideoWriter anchors.  MJPG honors VIDEOWRITER_PROP_QUALITY
    (constructor params); mp4v/XVID/VP9 ignore it (fixed ffmpeg default
    qscale — one point each, probed 2026-08-20)."""
    import cv2
    h, w = frames_rgb[0].shape[:2]
    rows = []
    cases = [("MJPG", ".avi", False, q) for q in (20, 35, 50, 75, 90, 95)]
    cases += [("mp4v", ".mp4", True, None), ("XVID", ".avi", True, None),
              ("VP90", ".webm", True, None)]
    for cc, ext, inter, q in cases:
        path = tempfile.mktemp(suffix=ext)
        try:
            fourcc = cv2.VideoWriter_fourcc(*cc)
            if q is not None:
                vw = cv2.VideoWriter(path, fourcc, 25, (w, h),
                                     [cv2.VIDEOWRITER_PROP_QUALITY, q])
            else:
                vw = cv2.VideoWriter(path, fourcc, 25, (w, h))
            if not vw.isOpened():
                continue
            if q is not None:
                vw.set(cv2.VIDEOWRITER_PROP_QUALITY, q)
            for f in frames_rgb:
                vw.write(np.ascontiguousarray(f[..., ::-1]))
            vw.release()
            if not os.path.exists(path) or os.path.getsize(path) == 0:
                continue
            bits = 8 * os.path.getsize(path)
            cap = cv2.VideoCapture(path)
            dec = []
            while True:
                ret, fr = cap.read()
                if not ret:
                    break
                dec.append(fr[..., ::-1])
            cap.release()
            if len(dec) != len(frames_rgb):
                continue
            p, p_w = psnr_rows(orig_yuv, to_yuv_float(np.stack(dec)))
            rows.append({"codec": cc, "q": q, "inter": inter,
                         "bpp": round(bits / n_pix, 4),
                         "psnr_db": p, "psnr_yuv_weighted_db": p_w})
        finally:
            if os.path.exists(path):
                os.remove(path)
    return rows


def smoe_row(smoe_file, orig_yuv, n_pix):
    from smoe_tpu.codec.serve import decode_bitstream
    bits = os.path.getsize(smoe_file) * 8
    rec = np.asarray(decode_bitstream(smoe_file))
    # serving decode returns (H, W, T, C); orig_yuv here is (T, H, W, C)
    rec = np.moveaxis(rec.reshape(orig_yuv.shape[1], orig_yuv.shape[2],
                                  orig_yuv.shape[0], orig_yuv.shape[3]),
                      2, 0)
    p, p_w = psnr_rows(orig_yuv, rec)
    return {"codec": "smoe", "q": None, "inter": True,
            "bpp": round(bits / n_pix, 4), "psnr_db": p,
            "psnr_yuv_weighted_db": p_w, "file": smoe_file}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--texture", type=str, default="synth",
                    choices=["synth", "hopper"])
    ap.add_argument("--static", action="store_true")
    ap.add_argument("--smoe", type=str, default=None,
                    help="optional .smoe bitstream of this clip to score "
                         "on the same metric")
    ap.add_argument("--rot", type=float, default=0.0,
                    help="rotating-foreground clip variant (must match the "
                         "bench_video_quality --rot being anchored)")
    args = ap.parse_args()

    vid, _ = build_video(moving_obj=not args.static, texture=args.texture,
                         rot=args.rot)
    # the exact uint8 RGB frames bench_video_quality writes to the .npz
    frames_rgb = np.moveaxis((vid * 255).astype(np.uint8), 2, 0)
    orig_yuv = to_yuv_float(frames_rgb)
    n_pix = int(np.prod(frames_rgb.shape[:3]))

    clip = {"texture": args.texture,
            "motion": "static-pan" if args.static
            else (f"moving-obj-rot{args.rot:g}" if args.rot
                  else "moving-obj")}
    for row in per_frame_rows(frames_rgb, orig_yuv, n_pix):
        print(json.dumps({**clip, **row}), flush=True)
    for row in videowriter_rows(frames_rgb, orig_yuv, n_pix):
        print(json.dumps({**clip, **row}), flush=True)
    if args.smoe:
        print(json.dumps({**clip, **smoe_row(args.smoe, orig_yuv, n_pix)}),
              flush=True)


if __name__ == "__main__":
    main()
