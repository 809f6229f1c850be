"""4K scaling check: 3840x2160 RGB, blocked fit, capped-dense lists.

--packed: run the in-kernel tile-culling Pallas path (use_pallas="packed")
instead of capped-dense — the EXACT config that faulted the TPU worker in
round 2 at K=9216 (ROADMAP item 5's final bisect step; sets
SMOE_PACKED_UNSAFE=1 to bypass the guard).  May kill the worker: run it
with nothing else on the chip.

Usage: python scripts/bench_4k.py [thr] [k] [--packed]
"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

argv = [a for a in sys.argv[1:] if a != "--packed"]
packed = "--packed" in sys.argv[1:]
if packed:
    os.environ["SMOE_PACKED_UNSAFE"] = "1"
thr = float(argv[0]) if argv else 800.0
k = int(argv[1]) if len(argv) > 1 else 48

def build_4k():
    rng = np.random.default_rng(0)
    h, w = 2160, 3840
    y, x = np.mgrid[0:h, 0:w]
    y = y / (h - 1); x = x / (w - 1)
    img = np.stack([
        0.5 + 0.3 * np.sin(6 * x + 2 * y),
        0.5 + 0.25 * np.cos(7 * x * y + 1.0),
        0.4 + 0.3 * np.sin(4 * (x + y)),
    ], axis=-1)
    img[400:1000, 800:1800, 0] += 0.2
    img[1200:, 2400:, 1] -= 0.15
    img += rng.normal(0, 0.005, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)

from smoe_tpu import Smoe
img = build_4k()
t0 = time.time()
s = Smoe(img, kernels_per_dim=[k, k], batch_size=(540, 480),
         use_yuv=True, use_determinant=True, probe_maha_threshold=thr,
         use_pallas="packed" if packed else "auto")
s.set_optimizer()
s.run_batched_chunk(20)
compile_s = time.time() - t0
best = 0.0
times = []
for _ in range(3):
    t0 = time.time()
    _, mse, npi, _ = s.run_batched_chunk(100)
    times.append((time.time() - t0) / 100)
    s.update_kernel_list()
    from smoe_tpu.core.losses import psnr_from_mse
    best = max(best, psnr_from_mse(float(np.nanmin(mse)), 8))
print(json.dumps({
    "metric": "4k_block_fit_ms_per_iter", "value": round(min(times)*1000, 2),
    "unit": "ms", "thr": thr, "blocks": s.start_batches, "kernels": k*k,
    "chunk_ms": [round(t*1000, 2) for t in times],
    "psnr_300": round(float(best), 2), "compile_s": round(compile_s, 1),
    "pallas": "packed" if packed else "auto",
    "density": round(float(np.asarray(s.kernel_lists).mean()), 3)}))
