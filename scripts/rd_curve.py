"""Config-4 driver (BASELINE.md): fit -> quantize -> decode RD curve.

Sweeps the pi-L1 sparsifier to trade kernels for quality, measuring the
REAL entropy-coded rate (codec/bitstream.py) and the decoded PSNR at each
point. Prints one JSON line per RD point plus a summary line.

Usage: python scripts/rd_curve.py [image.png] [iters] [--dp]
                                  [--lean|--ulean] [--lsinit] [--lsri]
                                  [--prune] [--family bench|pink|mosaic|text|hopper|mri|dem]

--family: synthetic content family (scripts/content.py) — structurally
different signal classes to check the measured levers generalize off the
bench generator (VERDICT r3 #4).

--lsri: additionally re-run the kernel-mode LS expert solve every 100
iters (the `-lsri 100` cadence; sequential path only) — the alternating
closed-form-experts / gradient-gating scheme measured +6.6 dB over pure
Adam at a fixed kernel budget on the 512² headline (BASELINE round 3).

--prune: RD-prune each point at encode (cli/reconstruct --prune 0): keep
the smallest gating-mass-ordered kernel prefix matching the best decoded
PSNR — quantization can make the low-mass tail net-negative.

--dp: fit all RD points concurrently via the data-parallel fan-out
(parallel/sharded.py fit_many, SURVEY §2.2 DP row) — one model per device
when >1 device is available, vmapped on one otherwise.

--lean: quantize/code with the measured lean allocation A10/mu12/nu8/
pi10/g8 instead of the reference depths [20,18,6,10,10] — -28% coded
bits at equal-or-better decoded PSNR (256^2 RD study, round 3).
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

    raw = sys.argv[1:]
    family = "bench"
    if "--family" in raw:
        i = raw.index("--family")
        family = raw[i + 1]
        raw = raw[:i] + raw[i + 2:]
    argv = [a for a in raw
            if a not in ("--dp", "--lean", "--ulean", "--lslean",
                         "--lsinit", "--lsri", "--prune", "--ganchor")]
    use_dp = "--dp" in raw
    lean = "--lean" in raw
    ulean = "--ulean" in raw
    lslean = "--lslean" in raw
    lsinit = "--lsinit" in raw
    lsri = "--lsri" in raw
    prune = "--prune" in raw
    ganchor = "--ganchor" in raw
    bit_depths = ((8, 10, 10, 10, 8) if lslean else
                  (8, 10, 8, 10, 6) if ulean else
                  (10, 12, 8, 10, 8) if lean else (20, 18, 6, 10, 10))
    if argv and not argv[0].isdigit():
        img, precision, _ = read_image(argv[0])
        iters = int(argv[1]) if len(argv) > 1 else 1000
    else:
        from content import build_family
        img = build_family(family, 256)
        precision = 8
        iters = int(argv[0]) if argv else 1000

    n_pix = int(np.prod(img.shape[:-1]))
    pis_vals = (0.0, 1e-5, 1e-4, 5e-4)

    def measure(s, pis_l1, params=None):
        """Quantize -> entropy-code -> decoded PSNR of s.params."""
        s.qparams = quantize_params(params if params is not None
                                    else s.get_params(), s.cfg)
        if prune:
            from smoe_tpu.codec.prune import prune_search
            s.qparams = prune_search(s, 0.0)
        s.rparams = rescaler(s.qparams, s.cfg)
        _, qmse, npi, _ = s.run_batched(train=False,
                                        update_reconstruction=True,
                                        with_quantized_params=True)
        from smoe_tpu.core.losses import psnr_from_mse
        qpsnr = psnr_from_mse(qmse, precision)
        with tempfile.NamedTemporaryFile(suffix=".smoe") as tf:
            bits = write_bitstream(tf.name, s.qparams, s.cfg)
        pt = {"pis_l1": pis_l1, "active_kernels": int(npi),
              "bpp": round(bits / n_pix, 4),
              "bpp_raw_proxy": round(rate_bits(s.qparams, s.cfg) / n_pix, 4),
              "qpsnr_db": round(float(qpsnr), 2)}
        print(json.dumps(pt), flush=True)
        return pt

    points = []
    if use_dp:
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from smoe_tpu.parallel.sharded import fit_many

        s = Smoe(img, kernels_per_dim=[12], use_yuv=img.shape[-1] == 3,
                 precision=precision, bit_depths=bit_depths,
                 nu_anchor=lsinit, gamma_anchor=ganchor)
        devs = jax.devices()
        mesh = Mesh(np.asarray(devs[:len(pis_vals)]), ("m",)) \
            if len(devs) >= len(pis_vals) else None
        imgs = np.repeat(img[None], len(pis_vals), axis=0)
        batched, _ = fit_many(imgs, s.cfg, steps=iters, mesh=mesh,
                              pis_l1=np.asarray(pis_vals, np.float32),
                              refresh_every=100, ls_init=lsinit)
        for i, pis_l1 in enumerate(pis_vals):
            s.params = jax.tree_util.tree_map(lambda x: jnp.asarray(x[i]),
                                              batched)
            s.valid = s.qvalid = False
            points.append(measure(s, pis_l1))
    else:
        for pis_l1 in pis_vals:
            s = Smoe(img, kernels_per_dim=[12], use_yuv=img.shape[-1] == 3,
                     precision=precision, bit_depths=bit_depths,
                     nu_anchor=lsinit or lsri, gamma_anchor=ganchor)
            s.set_optimizer()
            if lsinit or lsri:
                s.ls_init_experts(mode="kernel")
            chunk = 100
            done = 0
            best_loss, best_params = np.inf, None
            while done < iters:           # run ALL iters incl. a remainder
                n = min(chunk, iters - done)
                loss, _, _, _ = s.run_batched_chunk(n, pis_l1=pis_l1)
                if float(loss[-1]) < best_loss:   # code the BEST state,
                    best_loss = float(loss[-1])   # as the production CLI
                    best_params = s.get_params()  # does (params_best)
                s.update_kernel_list()
                done += n
                if lsri and done < iters:
                    s.ls_init_experts(mode="kernel")
            points.append(measure(s, pis_l1, params=best_params))

    print(json.dumps({"metric": "rd_curve", "family": family,
                      "bit_depths": list(bit_depths),
                      "ganchor": ganchor, "points": points}))


if __name__ == "__main__":
    main()
