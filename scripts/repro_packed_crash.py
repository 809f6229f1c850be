"""Minimal repro: the packed block-sparse kernel crashes the TPU worker at
K=9216 (v5e, Nov-2025 libtpu) — VERDICT r2 #4 / ROADMAP round-2 finding.

This drives `fused_gate_expert_packed` DIRECTLY (no trainer, no scan, no
custom-vjp backward — forward only) at the 4K-bench geometry:
K=9216 kernels, one 16384-pixel block, d=2 quadratic features (F=8).
VMEM accounting at this size: tile_n=128, n_w scratch (128, 9216) f32
= 4.5 MB + in-specs ~1 MB — nowhere near the ~16 MB budget, so the crash
is not an obvious VMEM overflow.

The production path refuses K > PACKED_VALIDATED_MAX_K (=2304) instead of
crashing; this script sets SMOE_PACKED_UNSAFE=1 to bypass the guard.

    python scripts/repro_packed_crash.py [--k 9216] [--n 16384]

Expected on a fixed stack: prints "OK" with a finite checksum.
On the affected stack: the TPU worker dies mid-execution (the axon tunnel
surfaces a connection reset / worker restart).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SMOE_PACKED_UNSAFE"] = "1"

import numpy as np                                             # noqa: E402


def run_trainer_shape(args):
    """Bisect the trainer-context fault: the standalone op passes every
    K=9216 case, but the full 32-block 4K trainer kills the worker.
    This reconstructs the EXACT trainer program (per-block argsort
    packing, patch-desc tile culling, value_and_grad, optax update,
    lax.scan over blocks AND sweeps) at a chosen block count."""
    import jax
    import numpy as np
    from smoe_tpu import Smoe

    kpd = int(round(np.sqrt(args.k)))             # capacity == --k directly
    rng = np.random.default_rng(0)
    h = w = 1024 if args.trainer <= 4 else 2048
    y, x = np.mgrid[0:h, 0:w] / (h - 1)
    img = np.stack([.5 + .3 * np.sin(7 * x + 2 * y),
                    .5 + .25 * np.cos(5 * x * y),
                    .4 + .3 * np.sin(3 * (x + y))], -1).astype(np.float32)
    img += rng.normal(0, 0.005, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)
    bb = int(round(np.sqrt(args.trainer)))
    assert bb * bb == args.trainer, "--trainer must be a square number"
    s = Smoe(img, kernels_per_dim=[kpd], use_yuv=True,
             batch_size=(h // bb, w // bb), use_pallas="packed")
    s.set_optimizer()
    print(f"trainer-shape: K={s.cfg.capacity} blocks={args.trainer} "
          f"sweeps={args.sweeps} img={h}x{w}", flush=True)
    out = s.run_batched_chunk(args.sweeps)
    print(f"OK trainer-shape: loss={float(out[0][-1]):.6f} "
          f"mse={float(out[1][-1]):.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=9216)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--interpret", action="store_true",
                    help="run interpreted (off-TPU check of the math)")
    ap.add_argument("--grad", action="store_true",
                    help="also run the backward kernel (value_and_grad)")
    ap.add_argument("--density", type=float, default=1.0,
                    help="fraction of kernels live (packed active-first "
                         "mask; the 4K trainer runs ~0.02)")
    ap.add_argument("--trainer", type=int, default=0, metavar="BLOCKS",
                    help="ROADMAP r3 next step: run the REAL trainer "
                         "(Smoe, use_pallas='packed') on a synthetic 4K "
                         "image partitioned into BLOCKS blocks — the "
                         "faulting context is scan-over-32-blocks x "
                         "sweeps; bisect with 1/2/4/32")
    ap.add_argument("--sweeps", type=int, default=2,
                    help="chunk length for --trainer (sweeps per program)")
    args = ap.parse_args()

    if args.trainer:
        run_trainer_shape(args)
        return

    import jax
    import jax.numpy as jnp
    from smoe_tpu.kernels.gate_expert_sparse import (
        build_tile_desc, fused_gate_expert_packed, packed_tile_n)

    rng = np.random.default_rng(0)
    k, d, c = args.k, 2, 3
    f = d * d + d + 1
    side = int(np.sqrt(args.n))
    n = side * side                    # exact square (patch ordering)
    y, x = np.mgrid[0:side, 0:side] / (side - 1)
    coords = np.stack([y, x], -1).reshape(-1, d).astype(np.float32)

    phi = np.concatenate([
        (coords[:, :, None] * coords[:, None, :]).reshape(n, d * d),
        coords, np.ones((n, 1), np.float32)], axis=1)
    xe = np.concatenate([coords, np.ones((n, 1), np.float32)], axis=1)
    q = rng.normal(0, 1, (k, f)).astype(np.float32)
    G = rng.normal(0, 0.1, (k, (d + 1) * c)).astype(np.float32)
    pi_det = np.full((k,), 1.0 / k, np.float32)
    mask = np.zeros((k,), np.float32)         # packed: active entries first
    mask[:max(1, int(round(k * args.density)))] = 1.0
    pi_det = pi_det * mask

    desc = build_tile_desc(jnp.asarray(coords), k)
    fro = np.ones((k,), np.float32)

    print(f"packed fwd: K={k} N={n} tile_n={packed_tile_n(k)} "
          f"interpret={args.interpret}", flush=True)
    res, surv = fused_gate_expert_packed(
        jnp.asarray(phi), jnp.asarray(xe), jnp.asarray(q), jnp.asarray(G),
        jnp.asarray(pi_det), jnp.asarray(mask), desc, jnp.asarray(fro),
        1e-4, 1e-11, n, bool(args.interpret))
    res = jax.block_until_ready(res)
    print(f"OK fwd: checksum={float(jnp.sum(res)):.6f} "
          f"surv={int(jnp.sum(surv > 0))}/{k}")

    if args.grad:
        def loss(qq, GG, pp):
            r, _ = fused_gate_expert_packed(
                jnp.asarray(phi), jnp.asarray(xe), qq, GG, pp,
                jnp.asarray(mask), desc, jnp.asarray(fro),
                1e-4, 1e-11, n, bool(args.interpret))
            return jnp.sum(r * r)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(q), jnp.asarray(G), jnp.asarray(pi_det))
        val = jax.block_until_ready(val)
        print(f"OK bwd: loss={float(val):.6f} "
              f"|dq|={float(jnp.sum(jnp.abs(grads[0]))):.6f}")


if __name__ == "__main__":
    main()
