"""Serving-side decode throughput: dequantized params -> pixels on TPU.

Fits + encodes a model at each size, then measures steady-state decode
latency through the lean serving decoder (codec/serve.py) — the number a
production decode service would see per frame (one compiled program,
fresh parameter uploads each call). Prints one JSON line per size.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bench import build_image
    from smoe_tpu import Smoe
    from smoe_tpu.codec.quantize import quantize_params, rescaler
    from smoe_tpu.codec.serve import make_decoder, pad_decoded_params

    for size, kpd, iters in ((512, 16, 200), (1024, 24, 200)):
        img = build_image(size)
        s = Smoe(img, kernels_per_dim=[kpd], use_yuv=True,
                 use_determinant=True)
        s.set_optimizer()
        s.run_batched_chunk(iters)
        s.qparams = quantize_params(s.get_params(), s.cfg)
        s.rparams = rescaler(s.qparams, s.cfg)

        d, c = s.cfg.dim_domain, img.shape[-1]
        k = int(np.asarray(s.rparams["pis"]).shape[0])
        padded = pad_decoded_params(s.rparams, k, d, c)
        dec = make_decoder(img.shape[:d], c, s.cfg, k)
        args = (padded["A"], padded["musX"], padded["nu_e"],
                padded["gamma_e"], padded["pis"])
        rec = np.asarray(dec(*args))          # compile + correctness anchor
        mse = float(np.mean((255 * (rec - img)) ** 2))

        n_frames = 50
        t0 = time.time()
        for _ in range(n_frames):
            out = dec(*args)
        out.block_until_ready()
        dt = (time.time() - t0) / n_frames
        mp = img.shape[0] * img.shape[1] / 1e6
        print(json.dumps({
            "metric": f"decode_ms_per_frame_{size}",
            "value": round(dt * 1000, 3),
            "unit": "ms",
            "megapixels": mp,
            "megapixels_per_s": round(mp / dt, 1),
            "kernels": k,
            "psnr_db": round(10 * np.log10(255 ** 2 / mse), 2),
        }), flush=True)

        # random-access variants (round 3): a quarter-frame ROI window
        # decodes ~4x cheaper than the full raster — the point of
        # window serving
        q = size // 2
        sp = (np.linspace(0, (q - 1) / (size - 1), q, dtype=np.float32),
              np.linspace(0, (q - 1) / (size - 1), q, dtype=np.float32))
        dec_roi = make_decoder(None, c, s.cfg, k, sample_points=sp)
        out = dec_roi(*args)
        t0 = time.time()
        for _ in range(n_frames):
            out = dec_roi(*args)
        out.block_until_ready()
        dt_roi = (time.time() - t0) / n_frames
        print(json.dumps({
            "metric": f"decode_roi_quarter_ms_{size}",
            "value": round(dt_roi * 1000, 3), "unit": "ms",
            "full_frame_ms": round(dt * 1000, 3),
        }), flush=True)

    _video_decode()


def _video_decode():
    """Motion-compensated dual-model VIDEO through the serving decoder:
    the whole 8-frame volume decodes as one program (motion transform +
    dual-domain gating baked in)."""
    from bench_video import build_video
    from smoe_tpu import Smoe
    from smoe_tpu.codec.quantize import quantize_params, rescaler
    from smoe_tpu.codec.serve import make_decoder, pad_decoded_params
    from smoe_tpu.core.quant import apply_qat

    vid, affines = build_video()
    s = Smoe(vid, kernels_per_dim=[12, 12, 4], affines=affines,
             init_flag=1, use_yuv=True, use_determinant=True)
    s.set_optimizer()
    s.run_batched_chunk(200)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    s.rparams = rescaler(s.qparams, s.cfg)

    d, c = s.cfg.dim_domain, vid.shape[-1]
    k = int(np.asarray(s.rparams["pis"]).shape[0])
    used = np.asarray(s.qparams["used_kernels"], bool)
    padded = pad_decoded_params(s.rparams, k, d, c)
    dec = make_decoder(vid.shape[:d], c, s.cfg, k,
                       motion=np.asarray(apply_qat(s.params, s.cfg).motion),
                       model_mask=np.asarray(s.model_mask)[used])
    args = (padded["A"], padded["musX"], padded["nu_e"],
            padded["gamma_e"], padded["pis"])
    dec(*args).block_until_ready()              # compile + drain warm exec
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = dec(*args)
    out.block_until_ready()
    dt = (time.time() - t0) / n
    t_frames = vid.shape[2]
    mp = vid.shape[0] * vid.shape[1] * t_frames / 1e6
    print(json.dumps({
        "metric": "decode_ms_per_cif_video",
        "value": round(dt * 1000, 3),
        "unit": "ms",
        "frames": t_frames,
        "ms_per_frame": round(dt * 1000 / t_frames, 3),
        "megapixels_per_s": round(mp / dt, 1),
        "kernels": k,
    }), flush=True)


if __name__ == "__main__":
    main()
