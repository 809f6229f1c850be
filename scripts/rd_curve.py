"""Config-4 driver (BASELINE.md): fit -> quantize -> decode RD curve.

Sweeps the pi-L1 sparsifier to trade kernels for quality, measuring the
REAL entropy-coded rate (codec/bitstream.py) and the decoded PSNR at each
point. Prints one JSON line per RD point plus a summary line.

Usage: python scripts/rd_curve.py [image.png] [iters]
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from smoe_tpu import Smoe
    from smoe_tpu.codec.bitstream import write_bitstream
    from smoe_tpu.codec.quantize import quantize_params, rate_bits, rescaler
    from smoe_tpu.io.images import read_image

    if len(sys.argv) > 1 and not sys.argv[1].isdigit():
        img, precision, _ = read_image(sys.argv[1])
        iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    else:
        from bench import build_image
        img = build_image(256)
        precision = 8
        iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

    n_pix = int(np.prod(img.shape[:-1]))
    points = []
    for pis_l1 in (0.0, 1e-5, 1e-4, 5e-4):
        s = Smoe(img, kernels_per_dim=[12], use_yuv=img.shape[-1] == 3,
                 precision=precision)
        s.set_optimizer()
        chunk = 100
        for i in range(iters // chunk):
            s.run_batched_chunk(chunk, pis_l1=pis_l1)
            s.update_kernel_list()

        s.qparams = quantize_params(s.get_params(), s.cfg)
        s.rparams = rescaler(s.qparams, s.cfg)
        _, qmse, npi, _ = s.run_batched(train=False,
                                        update_reconstruction=True,
                                        with_quantized_params=True)
        qpsnr = 10 * np.log10((2 ** precision) ** 2 / qmse)
        with tempfile.NamedTemporaryFile(suffix=".smoe") as tf:
            bits = write_bitstream(tf.name, s.qparams, s.cfg)
        pt = {"pis_l1": pis_l1, "active_kernels": int(npi),
              "bpp": round(bits / n_pix, 4),
              "bpp_raw_proxy": round(rate_bits(s.qparams, s.cfg) / n_pix, 4),
              "qpsnr_db": round(float(qpsnr), 2)}
        points.append(pt)
        print(json.dumps(pt), flush=True)

    print(json.dumps({"metric": "rd_curve", "points": points}))


if __name__ == "__main__":
    main()
