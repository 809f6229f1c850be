"""Virtual-mesh demonstration of kernel-axis (TP/EP) sharding at the
K=9216 scale — the regime where capped-dense saturates a single chip
(BASELINE.md config 3c) and the 'k' mesh axis is the remaining lever.

Runs the FULL trainer (`Smoe(mesh=...)`, QAT-3 + kernel lists +
regularizers) on a ('b','k') virtual CPU mesh with the 4K bench's kernel
capacity (96x96 = 9216 kernels), executes real train steps, and prints the
per-device kernel width (~K/nk) of every kernel-indexed leaf.

The image is spatially reduced (CPU hosts the virtual devices; a full
3840x2160 forward at K=9216 is a TPU-pod-scale computation) — the POINT is
the capacity-axis sharding: each device holds, differentiates, and updates
only K/nk kernel rows, with the gating denominator + expert partials +
QAT-3 bounds as the only cross-shard traffic (reference smoe.py:820).

    python scripts/dryrun_tp_bigk.py [--k 96] [--size 256] [--nk 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                                     # noqa: E402
import numpy as np                                             # noqa: E402
from jax.sharding import Mesh                                  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=96,
                    help="kernels per dim (96 -> K=9216, the 4K bench)")
    ap.add_argument("--size", type=int, default=256,
                    help="image side (reduced for the CPU virtual mesh)")
    ap.add_argument("--nk", type=int, default=4,
                    help="'k' mesh axis size (nb = 8 // nk)")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from smoe_tpu.fit.trainer import Smoe

    nk = args.nk
    nb = 8 // nk
    devs = np.asarray(jax.devices("cpu")[:8]).reshape(nb, nk)
    mesh = Mesh(devs, ("b", "k"))

    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:args.size, 0:args.size] / (args.size - 1)
    img = np.stack([0.5 + 0.3 * np.sin(9 * x + 2 * y),
                    0.5 + 0.25 * np.cos(7 * x * y),
                    0.4 + 0.3 * np.sin(5 * (x + y))], -1).astype(np.float32)
    img += rng.normal(0, 0.005, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)

    # normalize_pis=False: at K ~ 10^4 a normalized 1/K init sits below
    # the 10-bit pi quantization step (2/1023) and QAT would zero every
    # kernel at init — same semantics as the reference's fixed-bound pi
    # fake-quant (smoe.py:474-478); big-K runs start pis at 1
    s = Smoe(img, kernels_per_dim=[args.k], start_batches=nb * 2,
             quantization_mode=3, normalize_pis=False, mesh=mesh)
    s.set_optimizer()
    K = s.cfg.capacity
    print(f"mesh=({nb}b x {nk}k)  K={K}  blocks={s.start_batches}  "
          f"image={img.shape}")

    t0 = time.time()
    loss_a, mse_a, npi_a, _ = s.run_batched_chunk(args.steps,
                                                  pis_l1=1e-5, u_l1=1e-7)
    dt = time.time() - t0
    assert np.isfinite(loss_a).all()

    widths = {}
    for name in ("pis", "musX", "nu_e", "gamma_e", "a_diag"):
        leaf = getattr(s.params, name)
        rows = sorted({sh.data.shape[0] for sh in leaf.addressable_shards})
        widths[name] = rows
        assert rows == [K // nk], f"{name}: shards {rows}, want {K // nk}"
    print(f"per-device kernel width: {K}//{nk} = {K // nk}  "
          f"(verified on {list(widths)})")
    print(f"{args.steps} steps: loss {loss_a[0]:.5f} -> {loss_a[-1]:.5f}, "
          f"mse {mse_a[-1]:.1f}, live kernels {int(npi_a[-1])}, "
          f"{dt:.1f}s wall (CPU virtual mesh, compile included)")


if __name__ == "__main__":
    main()
