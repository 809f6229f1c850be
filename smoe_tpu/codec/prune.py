"""Post-hoc RD kernel pruning (no reference analog).

Quantization can make the least-important kernels net-negative: on the
CIF k=28 video fit the gating-mass-ordered 81% prefix decodes +0.49 dB
ABOVE the full model at -20% bits (BASELINE.md, round 3), while a
converged 2D image fit keeps every kernel (rd_curve.py --prune).  The
sweep here finds that boundary per model, through the real quantized
decode.  Exposed as `cli.reconstruct --prune TOL_DB` and
`scripts/rd_curve.py --prune`.
"""

from __future__ import annotations

import numpy as np


def prune_search(smoe, tol_db: float):
    """Evaluate gating-mass-ordered kernel prefixes through the real
    quantized decode and return the qparams of the smallest prefix
    within tol_db of the best candidate.  The full set is always a
    candidate, so decoded quality never drops below full-model minus
    tol_db.  smoe.qparams must hold the quantized set (quantize_params).
    """
    from smoe_tpu.codec.bitstream import (_bit_reversed_rank,
                                          kernel_importance)
    from smoe_tpu.codec.quantize import rescaler, subset_qparams
    from smoe_tpu.core.losses import psnr_from_mse

    full = smoe.qparams
    used = np.asarray(full["used_kernels"], bool)
    k = int(np.count_nonzero(used))
    grid = (None if smoe.musX_grid is None else
            np.asarray(smoe.musX_grid)[used])
    mm = getattr(smoe, "model_mask", None)
    if mm is not None:
        mm = np.asarray(mm, bool)[used]    # same slot indexing as the
        # dual-model extra in cli/reconstruct (capacity-length mask)
    imp = kernel_importance(full, smoe.cfg, musX_grid=grid, model_mask=mm)
    # same stratified tie-break as the layered tiers (_layer_rows):
    # exact-tie kernels spread across the raster, not a contiguous wedge
    order = np.lexsort((_bit_reversed_rank(k),
                        -np.asarray(imp, np.float64)))
    rank = np.empty(k, np.int64)
    rank[order] = np.arange(k)
    # Zeroing a kernel's dequantized pi removes it EXACTLY (numerator
    # pi*N[*det] = 0, denominator = sum over the others), so every
    # candidate prefix evaluates through ONE compiled program at the full
    # row count — no per-candidate recompiles.
    rp_full = rescaler(full, smoe.cfg, grid)
    smoe.qparams = full
    cands = sorted({max(1, (k * j) // 16) for j in range(2, 16)} | {k})
    results = []
    for kc in cands:
        rp = dict(rp_full)
        rp["pis"] = np.where(rank < kc, rp_full["pis"],
                             0.0).astype(rp_full["pis"].dtype)
        smoe.rparams = rp
        _, mse, *_ = smoe.run_batched(train=False,
                                      update_reconstruction=False,
                                      with_quantized_params=True)
        results.append((kc, float(psnr_from_mse(mse, smoe.cfg.precision))))
        print(f"prune sweep: {kc}/{k} kernels -> {results[-1][1]:.2f} dB")
    best = max(r[1] for r in results)
    kc, ps = next(r for r in results if r[1] >= best - tol_db)
    print(f"prune: keeping {kc}/{k} kernels ({ps:.2f} dB; best candidate "
          f"{best:.2f} dB, tol {tol_db})")
    return full if kc == k else subset_qparams(full, np.sort(order[:kc]))
