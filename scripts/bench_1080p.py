"""Config-3 capability check (BASELINE.md): block-partitioned 1080p fit.

Measures steady-state ms/iter and PSNR trajectory for a 1920x1080 RGB fit
with 16 spatial blocks and per-block kernel lists. Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_1080p():
    rng = np.random.default_rng(0)
    h, w = 1080, 1920
    y, x = np.mgrid[0:h, 0:w]
    y = y / (h - 1)
    x = x / (w - 1)
    img = np.stack([
        0.5 + 0.3 * np.sin(4 * x + 1.5 * y),
        0.5 + 0.25 * np.cos(5 * x * y + 1.0),
        0.4 + 0.3 * np.sin(3 * (x + y)),
    ], axis=-1)
    img[200:500, 400:900, 0] += 0.2
    img[600:, 1200:, 1] -= 0.15
    img += rng.normal(0, 0.005, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


def main():
    from smoe_tpu import Smoe

    img = build_1080p()
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    mode = sys.argv[2] if len(sys.argv) > 2 else "auto"
    s = Smoe(img, kernels_per_dim=[k, k], batch_size=(270, 480),
             use_yuv=True, use_determinant=True, use_pallas=mode)
    B = s.start_batches
    t0 = time.time()
    s.set_optimizer()
    s.run_batched_chunk(20)
    compile_s = time.time() - t0

    t0 = time.time()
    loss, mse, npi, _ = s.run_batched_chunk(100)
    per_iter = (time.time() - t0) / 100
    s.update_kernel_list()
    best = 10 * np.log10(255 ** 2 / np.nanmin(mse))
    chunk_ms = [round(per_iter * 1000, 2)]
    for _ in range(4):
        t0 = time.time()
        loss, mse, npi, _ = s.run_batched_chunk(100)
        chunk_ms.append(round((time.time() - t0) * 10, 2))
        s.update_kernel_list()
        best = max(best, 10 * np.log10(255 ** 2 / np.nanmin(mse)))

    klist = np.asarray(s.kernel_lists)
    active_frac = float(klist.mean())
    print(json.dumps({
        "metric": "1080p_block_fit_ms_per_iter",
        "value": min(chunk_ms),
        "unit": "ms",
        "chunk_ms": chunk_ms,
        "mode": mode,
        "blocks": B,
        "kernels": k * k,
        "psnr_500_iters": round(float(best), 2),
        "kernel_list_active_frac": round(active_frac, 3),
        "compile_s": round(compile_s, 1),
        "pixel_kernel_pairs_per_iter": int(img.shape[0] * img.shape[1]) * k * k,
    }))


if __name__ == "__main__":
    main()
