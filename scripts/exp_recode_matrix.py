"""Post-hoc CODING matrix on a saved fit: re-quantize + entropy-code +
decode one params_best.pkl under several bit-allocation / anchor configs,
WITHOUT refitting (the fit trajectory does not depend on coding depths
under qm=1 — the best snapshot is picked on the float loss).

Used for VERDICT r3 #2/#7: the lean/ulean knees were measured on
Adam-width fits; LS fits (lsinit/lsri) have wider slopes and need the
knee re-measured, plus the gamma_anchor (-ganchor) variants.

Usage:
  python scripts/exp_recode_matrix.py WORKDIR [--video|--lf]
    WORKDIR: a bench_video_quality/bench_lf tempdir (has cif.npz|lf.mat
             and out/params_best.pkl)

Prints one JSON row per coding config: decoded PSNR (+ trained-views PSNR
for LF), coded bpp.
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = (20, 18, 6, 10, 10)
LEAN = (10, 12, 8, 10, 8)
ULEAN = (8, 10, 8, 10, 6)
ULEAN_G8 = (8, 10, 8, 10, 8)

CONFIGS = [
    ("ref", REF, [], True),
    ("ref+nuanchor", REF, ["-nuanchor", "1"], True),
    ("ref+nuanchor+ganchor", REF, ["-nuanchor", "1", "-ganchor", "1"], True),
    ("ulean+nuanchor", ULEAN, ["-nuanchor", "1"], True),
    ("ulean+nuanchor+ganchor", ULEAN,
     ["-nuanchor", "1", "-ganchor", "1"], True),
    ("ulean-g8+nuanchor", ULEAN_G8, ["-nuanchor", "1"], True),
    # LS fits carry more information in the expert offsets: nu6/nu8 are
    # the measured limiter on LS-refreshed video fits (round 4 nu-knee
    # probe) — nu10 variants locate the corrected knee
    ("ulean-nu10+nuanchor", (8, 10, 10, 10, 6), ["-nuanchor", "1"], True),
    ("ulean-nu10-g8+nuanchor", (8, 10, 10, 10, 8),
     ["-nuanchor", "1"], True),
    ("lean+nuanchor", LEAN, ["-nuanchor", "1"], True),
    ("lean+nuanchor+ganchor", LEAN,
     ["-nuanchor", "1", "-ganchor", "1"], True),
]


def main():
    wd = sys.argv[1]
    inputs = [f for f in os.listdir(wd)
              if f.endswith((".npz", ".mat", ".png"))]
    assert inputs, f"no input media in {wd}"
    img_path = os.path.join(wd, inputs[0])
    pkl = os.path.join(wd, "out", "params_best.pkl")

    from smoe_tpu.cli.reconstruct import main as rec_main
    from smoe_tpu.codec.serve import decode_bitstream
    from smoe_tpu.io.images import read_image

    is_lf = img_path.endswith(".mat")
    orig, precision, _ = read_image(img_path, not is_lf)
    scale = float(2 ** precision) ** 2
    n_pix = int(np.prod(orig.shape[:-1]))
    tm = None
    if is_lf:
        from smoe_tpu.fit.blocks import _lf_train_mask
        tm = _lf_train_mask(orig.shape[:2])

    for label, bd, flags, enabled in CONFIGS:
        if not enabled:
            continue
        out = tempfile.mkdtemp(prefix="smoe_recode_")
        rec_main(["-i", img_path, "-p", pkl, "-r", out,
                  "-bd"] + [str(b) for b in bd] + flags)
        fs = [os.path.join(out, x) for x in os.listdir(out)
              if x.endswith(".smoe")]
        f = fs[0]
        rec = np.asarray(decode_bitstream(f)).reshape(orig.shape)
        err2 = (rec - orig) ** 2
        mse = float(err2.mean()) * scale
        bits = os.path.getsize(f) * 8
        row = {"config": label, "bit_depths": list(bd),
               "decoded_db": round(10 * np.log10(scale / mse), 2),
               "bpp": round(bits / n_pix, 4)}
        if tm is not None:
            mse_tr = float(err2[tm].mean()) * scale
            row["decoded_trained_views_db"] = round(
                10 * np.log10(scale / mse_tr), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
