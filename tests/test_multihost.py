"""Multi-host plumbing (SURVEY §2.2 multi-host row): what is testable
single-host — init no-op semantics, process-0 checkpoint ownership, and
deterministic resume from the full-state checkpoint."""

import os

import numpy as np
import pytest

from smoe_tpu.parallel import multihost


def test_initialize_noop_single_process():
    # no coordinator, no process count: must not touch jax.distributed
    assert multihost.initialize() is False
    assert multihost.initialize(num_processes=1) is False


def test_primary_single_process():
    assert multihost.primary() is True


def test_save_checkpoint_ownership(tmp_path, monkeypatch):
    class FakeSmoe:
        def __init__(self):
            self.saved = []

        def checkpoint(self, path):
            self.saved.append(path)

    s = FakeSmoe()
    p = str(tmp_path / "ck.pkl")
    assert multihost.save_checkpoint(s, p) is True
    assert s.saved == [p]

    # a non-zero process must not write
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 1)
    assert multihost.save_checkpoint(s, p) is False
    assert s.saved == [p]
    wrote = []
    assert multihost.save_model_primary(lambda q: wrote.append(q), 1) is False
    assert wrote == []


def test_cli_flags_plumbed(monkeypatch, tmp_path):
    """--coordinator_address/--num_processes reach multihost.initialize."""
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None, **kw):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)
        return False

    monkeypatch.setattr(multihost, "initialize", fake_init)
    import cv2
    img = (np.random.default_rng(0).uniform(0, 255, (16, 16, 3))
           ).astype(np.uint8)
    ip = str(tmp_path / "t.png")
    cv2.imwrite(ip, img)
    from smoe_tpu.cli.fit import main
    main(["-i", ip, "-r", str(tmp_path / "out"), "-n", "1", "-v", "1",
          "-k", "2", "--coordinator_address", "host0:1234",
          "--num_processes", "2", "--process_id", "0"])
    assert calls == {"addr": "host0:1234", "n": 2, "pid": 0}


def test_logger_skips_on_non_primary(tmp_path, monkeypatch):
    from smoe_tpu.diag.log import ModelLogger
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 1)
    lg = ModelLogger(str(tmp_path / "lg"))

    class FakeSmoe:
        iter = 7
    lg.log(FakeSmoe())   # must return before touching FakeSmoe details
    assert os.listdir(str(tmp_path / "lg" / "params")) == []


def test_checkpoint_resume_deterministic(tmp_path):
    """Every process restores the same pickle: resumed training must equal
    uninterrupted training exactly (the lockstep-resume contract)."""
    from smoe_tpu.fit.trainer import Smoe
    y, x = np.mgrid[0:16, 0:16] / 15.0
    img = np.stack([.5 + .3 * np.sin(5 * x), .5 + .3 * np.cos(4 * y),
                    .4 + .2 * np.sin(3 * (x + y))], -1).astype(np.float32)

    a = Smoe(img, kernels_per_dim=[3])
    a.set_optimizer()
    a.run_batched_chunk(6)
    ck = str(tmp_path / "state.pkl")
    a.checkpoint(ck)
    a.run_batched_chunk(6)

    b = Smoe(img, kernels_per_dim=[3])
    b.set_optimizer()
    b.restore(ck)
    b.run_batched_chunk(6)

    pa, pb = a.get_params(), b.get_params()
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)
