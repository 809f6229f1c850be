"""REAL multi-process multi-host training: two OS processes wire up via
jax.distributed, contribute 2 virtual CPU devices each, and run the FULL
trainer (`Smoe(mesh=...)`) over the cross-process 'b' mesh in lockstep.

This is the TPU-native equivalent of the reference's HPC job-array mode
(SURVEY §2.2 multi-host row; reference smoe_test.py:112-116) validated
end to end: every process computes bit-identical replicated state,
process 0 alone owns persisted artifacts, and a fresh fleet resumes
deterministically from the process-0 checkpoint
(parallel/multihost.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import json, os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out_dir = sys.argv[4]
sys.path.insert(0, sys.argv[5])
resume_from = sys.argv[6] if len(sys.argv) > 6 else ""
img_h = int(sys.argv[7]) if len(sys.argv) > 7 else 0
mesh_kind = sys.argv[8] if len(sys.argv) > 8 else "b"
import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from smoe_tpu import Smoe
from smoe_tpu.parallel import multihost

assert jax.process_count() == nproc
devs = jax.devices()
# img_h fixes the geometry across fleet SHAPES (the elastic-resume case);
# 0 keeps the original 16-rows-per-device sizing
h = img_h or 16 * len(devs)
y, x = np.mgrid[0:h, 0:16] / (h - 1)
img = np.stack([0.5 + 0.3 * np.sin(5 * x + 40 * y),
                0.5 + 0.3 * np.cos(4 * x + 80 * y),
                0.4 + 0.2 * np.sin(3 * (x + 20 * y))], -1).astype(np.float32)
if mesh_kind == "bk":
    # kernel axis ('k') within each process's 2 local devices, block
    # axis ('b') across processes — the ICI-inside / DCN-across layout.
    # K=16 so the capacity divides the 2-way 'k' axis.
    mesh = Mesh(np.asarray(devs).reshape(-1, 2), ("b", "k"))
    kpd = [4]
else:
    mesh = Mesh(np.asarray(devs), ("b",))
    kpd = [3]
s = Smoe(img, kernels_per_dim=kpd, batch_size=(8, 16), mesh=mesh)
s.set_optimizer()
if resume_from:
    # EVERY process restores the same process-0 checkpoint -> the fleet
    # restarts in lockstep with no further synchronization
    s.restore(resume_from)
s.train(2, val_iter=2, pis_l1=1e-4)
wrote = multihost.save_checkpoint(
    s, os.path.join(out_dir, f"ckpt_{pid}.pkl"))
print("MHRESULT " + json.dumps({
    "pid": pid, "loss": float(s.losses[-1][1]),
    "iter": int(s.iter),
    "mesh_b": int(s.mesh.shape["b"]) if s.mesh is not None else 0,
    "primary": multihost.primary(), "devices": len(devs),
    "wrote_checkpoint": bool(wrote)}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_fleet(worker, tmp_path, repo, out_dir, resume_from="",
               nproc=2, dev_per_proc=2, img_h=0, mesh_kind="b"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)      # clean CPU-only interpreters
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={dev_per_proc}"
    port = _free_port()
    extra = []
    if resume_from or img_h or mesh_kind != "b":
        extra = [resume_from, str(img_h), mesh_kind]
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(nproc), str(port), out_dir,
         repo] + extra,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(nproc)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("MHRESULT")]
        assert line, f"no result line:\n{out[-2000:]}"
        r = json.loads(line[-1][len("MHRESULT "):])
        results[r["pid"]] = r
    return results


def test_two_process_lockstep_training_and_resume(tmp_path):
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as fd:
        fd.write(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    run1 = str(tmp_path / "run1")
    os.makedirs(run1)
    results = _run_fleet(worker, tmp_path, repo, run1)

    assert results[0]["devices"] == results[1]["devices"] == 4
    # lockstep SPMD: both processes computed bit-identical losses
    assert results[0]["loss"] == results[1]["loss"]
    assert np.isfinite(results[0]["loss"])
    # process-0 artifact ownership
    assert results[0]["primary"] and not results[1]["primary"]
    assert results[0]["wrote_checkpoint"]
    assert not results[1]["wrote_checkpoint"]
    ckpt = os.path.join(run1, "ckpt_0.pkl")
    assert os.path.exists(ckpt)
    assert not os.path.exists(os.path.join(run1, "ckpt_1.pkl"))

    # a FRESH fleet restores the process-0 checkpoint and continues in
    # lockstep: iteration counter carries over, losses stay bit-identical
    # across processes and improve on the checkpointed fit
    run2 = str(tmp_path / "run2")
    os.makedirs(run2)
    resumed = _run_fleet(worker, tmp_path, repo, run2, resume_from=ckpt)
    assert resumed[0]["loss"] == resumed[1]["loss"]
    assert resumed[0]["iter"] == results[0]["iter"] + 2
    assert resumed[0]["loss"] < results[0]["loss"]


def test_two_process_bk_mesh_lockstep(tmp_path):
    """Cross-process ('b','k') mesh: block axis over DCN (processes),
    kernel axis over each process's local devices — the layout a real
    pod would use (K-psum rides ICI).  Both processes must stay in
    bit-identical lockstep, like the 'b'-mesh case."""
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as fd:
        fd.write(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    run1 = str(tmp_path / "run1")
    os.makedirs(run1)
    results = _run_fleet(worker, tmp_path, repo, run1, mesh_kind="bk")
    assert results[0]["mesh_b"] == 2          # 2 'b' rows x 2 'k' cols
    assert results[0]["loss"] == results[1]["loss"]
    assert np.isfinite(results[0]["loss"])
    assert results[0]["wrote_checkpoint"] and not results[1]["wrote_checkpoint"]


def test_elastic_resume_different_fleet_shape(tmp_path):
    """VERDICT r2 #6: resume a 2-process-fleet checkpoint on DIFFERENT
    fleet shapes — the realistic preemption case.  Geometry is fixed
    (64x16 image, 8 blocks); the trajectories must match across shapes."""
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as fd:
        fd.write(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    run1 = str(tmp_path / "run1")
    os.makedirs(run1)
    results = _run_fleet(worker, tmp_path, repo, run1, img_h=64)
    ckpt = os.path.join(run1, "ckpt_0.pkl")
    assert os.path.exists(ckpt)

    # resume A: single process, 3 devices — 8 blocks don't divide 3, the
    # elastic mesh shrinks to 2 of 3 devices (fit_mesh_to_blocks)
    runa = str(tmp_path / "runa")
    os.makedirs(runa)
    res_a = _run_fleet(worker, tmp_path, repo, runa, resume_from=ckpt,
                       nproc=1, dev_per_proc=3, img_h=64)
    assert res_a[0]["mesh_b"] == 2            # elastic shrink engaged
    assert res_a[0]["iter"] == results[0]["iter"] + 2
    assert np.isfinite(res_a[0]["loss"])
    assert res_a[0]["loss"] < results[0]["loss"]

    # resume B: single process, 4 devices (dividing shape, no shrink);
    # the loss trajectory must match resume A to reduction-order noise
    runb = str(tmp_path / "runb")
    os.makedirs(runb)
    res_b = _run_fleet(worker, tmp_path, repo, runb, resume_from=ckpt,
                       nproc=1, dev_per_proc=4, img_h=64)
    assert res_b[0]["mesh_b"] == 4
    # rtol 2e-3: different shard counts reassociate the gradient
    # reductions; two Adam steps amplify that float-order noise
    np.testing.assert_allclose(res_a[0]["loss"], res_b[0]["loss"],
                               rtol=2e-3)
