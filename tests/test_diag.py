"""Diagnostics: plotters, loggers, profiler (C17/C18 + SURVEY §5)."""

import json
import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from smoe_tpu.fit.trainer import Smoe
    y, x = np.mgrid[0:16, 0:16] / 15.0
    img = np.stack([0.5 + 0.3 * np.sin(4 * x), 0.5 + 0.2 * np.cos(3 * y),
                    np.full_like(x, 0.5)], -1).astype(np.float32)
    s = Smoe(img, kernels_per_dim=[3])
    s.set_optimizer()
    s.train(10, val_iter=5)
    return s


def test_image_plotter_writes_panels(trained, tmp_path):
    from smoe_tpu.diag.plots import ImagePlotter
    p = ImagePlotter(path=str(tmp_path),
                     options=["orig", "reconstruction", "gating", "pis_hist"])
    p.plot(trained)
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_loss_plotter(trained, tmp_path):
    from smoe_tpu.diag.plots import LossPlotter
    out = str(tmp_path / "loss.png")
    LossPlotter(path=out).plot(trained)
    assert os.path.exists(out)


def test_denoise_plotter(trained, tmp_path):
    from smoe_tpu.diag.plots import DenoisePlotter
    clean = np.asarray(trained.image)
    p = DenoisePlotter(clean_image=clean, path=str(tmp_path / "dn.png"))
    p.plot(trained)
    assert os.path.exists(str(tmp_path / "dn.png"))


def test_model_logger_and_jsonl(trained, tmp_path):
    from smoe_tpu.diag.log import JsonlLogger, ModelLogger
    ModelLogger(path=str(tmp_path)).log(trained)
    assert any("params" in f for f in os.listdir(tmp_path))
    jl = str(tmp_path / "metrics.jsonl")
    JsonlLogger(jl).log(trained)
    with open(jl) as fd:
        rec = json.loads(fd.readline())
    assert "mse" in rec or "loss" in rec


def test_phase_timer_and_trace(tmp_path):
    from smoe_tpu.diag.profile import PhaseTimer, trace
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    d = t.as_dict()
    assert d["a"]["count"] == 2
    t.report()

    # jax.profiler trace produces output files
    import jax
    import jax.numpy as jnp
    with trace(str(tmp_path / "prof")):
        jnp.ones((8,)).sum().block_until_ready()
    found = False
    for root, _, files in os.walk(str(tmp_path / "prof")):
        found |= bool(files)
    assert found
