"""Multi-host initialization and deterministic resume.

The reference's nearest analog is "HPC mode": resumable single inc-steps
for cluster job arrays (reference smoe_test.py:112-116, 329-333).  The
TPU-native equivalent (SURVEY §2.2 multi-host row) is jax's multi-process
runtime: every host runs the same program, `initialize` wires the
coordinator, and `jax.devices()` then spans the whole slice so a
`Smoe(mesh=...)` mesh built from it shards the block axis across hosts.

The SMoE data model keeps the rest simple:

  * parameters and optimizer state are replicated; each host's devices own
    their shard of the block axis and psum the accumulated gradients, so
    every process computes identical updated params each sweep —
    deterministic by construction.
  * checkpoints are written by process 0 only (`primary()`); on resume
    EVERY process restores the same file (params, Adam moments, kernel
    lists, iteration counter are all in the pickle — `Smoe.checkpoint`),
    so the fleet restarts in lockstep with no further synchronization.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               **kwargs) -> bool:
    """Wire the jax multi-process runtime.  Call before any device use.

    No-op (returns False) for single-process runs: no coordinator given
    and num_processes absent or 1.  Under cluster managers that jax can
    auto-detect (SLURM and friends) all three arguments may be None but
    an explicit num_processes > 1 still requests initialization.
    """
    if coordinator_address is None and (num_processes or 1) == 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def primary() -> bool:
    """True on the checkpoint-owning process (process 0).

    All processes compute identical replicated state, so one writer
    suffices; single-process runs are always primary.
    """
    return jax.process_index() == 0


def save_checkpoint(smoe, path: str) -> bool:
    """Process-0-only full-state checkpoint.  Returns True if written."""
    if not primary():
        return False
    smoe.checkpoint(path)
    return True


def save_model_primary(save_fn, *args, **kwargs) -> bool:
    """Run a host-side save callable on process 0 only."""
    if not primary():
        return False
    save_fn(*args, **kwargs)
    return True
