"""Config-5 capability check (BASELINE.md): video volume fit with 3D
spatio-temporal kernels + global-motion compensation.

Synthetic panning video (known affine ground truth) fit with the dual-model
affine-init path. Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_video(h=288, w=352, t=8, shift=2.0, moving_obj=False,
                texture="synth", rot=0.0):
    """CIF-sized panning scene.

    moving_obj=True adds a textured square moving AGAINST the pan — a
    foreground that global motion compensation cannot explain, so the
    per-time-slab reseeding (raw-domain kernels) has real residuals to
    absorb (the dual-model fg/bg split of reference smoe.py:280-329).
    The patch occludes different background each frame.

    texture="hopper" pans over matplotlib's bundled grace_hopper.jpg
    photograph instead of the synthetic sinusoid canvas — REAL natural
    texture with the same known-affine motion structure (the reference's
    I/O targets real camera content, /root/reference/utils.py:68-134).

    rot=DEG (round 5, VERDICT r4 #2): the moving patch additionally
    ROTATES by DEG degrees per frame (cv2.warpAffine, reflected border so
    the square stays full of real texture) — non-translational foreground
    motion that neither the global 6-param model nor a rigidly-tracking
    kernel cloud explains; the known affines still describe ONLY the
    background pan."""
    rng = np.random.default_rng(0)
    wide_w = w + int(shift * t) + 4
    if texture == "hopper":
        import cv2
        import matplotlib
        path = os.path.join(os.path.dirname(matplotlib.__file__),
                            "mpl-data", "sample_data", "grace_hopper.jpg")
        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        ph, pw = bgr.shape[:2]                     # 600 x 512
        if ph < h or pw < wide_w:
            s = max(h / ph, wide_w / pw)
            bgr = cv2.resize(bgr, (int(np.ceil(pw * s)),
                                   int(np.ceil(ph * s))),
                             interpolation=cv2.INTER_CUBIC)
            ph, pw = bgr.shape[:2]
        r0, c0 = (ph - h) // 2, (pw - wide_w) // 2
        wide = bgr[r0:r0 + h, c0:c0 + wide_w, ::-1].astype(np.float32) / 255.0
    else:
        y, x = np.mgrid[0:h, 0:wide_w]
        y = y / (h - 1)
        x = x / (w - 1)
        wide = np.stack([
            0.5 + 0.3 * np.sin(6 * x + 2 * y),
            0.5 + 0.25 * np.cos(4 * x * y + 1.0),
            0.4 + 0.3 * np.sin(3 * (x + y)),
        ], axis=-1).astype(np.float32)
        wide += rng.normal(0, 0.005, wide.shape).astype(np.float32)
    frames = [wide[:, int(shift * i):int(shift * i) + w].copy()
              for i in range(t)]
    if moving_obj:
        oy, ox, s = 60, 40, 56
        if texture == "hopper":
            # a real-texture patch (from the photo's far corner, outside
            # the panned rows) moving against the pan
            patch = wide[-s:, :s].copy()
        else:
            yy, xx = np.mgrid[0:s, 0:s] / (s - 1)
            patch = np.stack([0.2 + 0.6 * yy, 0.7 - 0.5 * xx,
                              0.5 + 0.4 * yy * xx], -1).astype(np.float32)
        for i in range(t):
            py, px = oy + 6 * i, ox + 9 * i       # against the pan
            p_i = patch
            if rot:
                import cv2
                M = cv2.getRotationMatrix2D(((s - 1) / 2, (s - 1) / 2),
                                            rot * i, 1.0)
                p_i = cv2.warpAffine(patch, M, (s, s),
                                     flags=cv2.INTER_LINEAR,
                                     borderMode=cv2.BORDER_REFLECT)
            frames[i][py:py + s, px:px + s] = p_i
    vid = np.clip(np.stack(frames, axis=2), 0, 1)
    affines = np.zeros((t, 2, 3), np.float32)
    affines[:, 0, 0] = 1.0
    affines[:, 1, 1] = 1.0
    affines[:, 0, 2] = -shift * np.arange(t)
    return vid, affines


def main():
    from smoe_tpu import Smoe

    vid, affines = build_video()
    t0 = time.time()
    s = Smoe(vid, kernels_per_dim=[12, 12, 4], affines=affines,
             init_flag=1, use_yuv=True, use_determinant=True)
    s.set_optimizer()
    s.run_batched_chunk(20)
    compile_s = time.time() - t0

    # warm the 100-step program at the SETTLED cap (the width tightens
    # after each chunk; stop when it stops changing), then time it
    from smoe_tpu.core.losses import psnr_from_mse
    best = 0.0
    prev = object()
    for _ in range(4):
        loss, mse, npi, _ = s.run_batched_chunk(100)
        best = max(best, psnr_from_mse(float(np.nanmin(mse)), 8))
        cap = s._current_k_cap()
        if cap == prev:
            break
        prev = cap
    t0 = time.time()
    loss, mse, npi, _ = s.run_batched_chunk(100)
    per_iter = (time.time() - t0) / 100
    best = max(best, psnr_from_mse(float(np.nanmin(mse)), 8))
    for _ in range(3):
        loss, mse, npi, _ = s.run_batched_chunk(100)
        s.update_kernel_list()
        best = max(best, psnr_from_mse(float(np.nanmin(mse)), 8))

    print(json.dumps({
        "metric": "video_cif_fit_ms_per_iter",
        "value": round(per_iter * 1000, 3),
        "unit": "ms",
        "frames": vid.shape[2],
        "kernels_live": int(npi[-1]),
        "dual_model": s.model_mask is not None,
        "psnr_500_iters": round(float(best), 2),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
