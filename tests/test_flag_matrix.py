"""Flag-combination smoke matrix: every notable config trains a few steps,
stays finite, and can evaluate.  Guards the long tail of the reference's
~40-flag surface (reference smoe_test.py:260-356)."""

import numpy as np
import pytest

from smoe_tpu.fit.trainer import Smoe


CONFIGS = {
    "default": {},
    "no_gammas": {"train_gammas": False},
    "no_musx": {"train_musx": False},
    "no_pis": {"train_pis": False},
    "radial": {"radial_as": True},
    "no_determinant": {"use_determinant": False},
    "inverse_cov": {"train_inverse_cov": True},
    "diff_center": {"use_diff_center": True},
    "only_y_gamma": {"only_y_gamma": True, "use_yuv": True},
    "qat_fixed": {"quantization_mode": 2},
    "qat_derived": {"quantization_mode": 3},
    "quantize_pis": {"quantize_pis": True},
    "ssim": {"ssim_opt": True},
    "unnormalized_pis": {"normalize_pis": False},
    "kcn_norm": {"kernel_count_as_norm_l1": True},
    "bf16": {"compute_dtype": "bfloat16"},
    "pallas_on": {"use_pallas": "on"},
}


@pytest.fixture(scope="module")
def img(rng):
    y, x = np.mgrid[0:16, 0:16] / 15.0
    im = np.stack([0.5 + 0.3 * np.sin(4 * x), 0.5 + 0.2 * np.cos(3 * y),
                   0.45 + 0.1 * np.sin(2 * (x + y))], -1)
    return im.astype(np.float32)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_config_trains_and_evals(img, name):
    s = Smoe(img, kernels_per_dim=[3], **CONFIGS[name])
    s.set_optimizer()
    l0, m0, npi0, _ = s.run_batched(train=False)
    assert np.isfinite(l0), f"{name}: initial eval not finite"
    for _ in range(5):
        loss, mse, npi, _ = s.run_batched(train=True, pis_l1=1e-5,
                                          u_l1=1e-9)
    assert np.isfinite(loss), f"{name}: training went non-finite"
    l1, m1, *_ = s.run_batched(train=False, update_reconstruction=True)
    assert np.isfinite(l1)
    assert s.get_reconstruction().shape == img.shape


@pytest.mark.parametrize("extra", [
    {"start_batches": 4},
    {"batch_size": (8, 8), "overlap": 2},
    {"start_batches": 4, "sampling": 50},
])
def test_blocked_variants(img, extra):
    sampling = extra.pop("sampling", 100)
    s = Smoe(img, kernels_per_dim=[3], **extra)
    s.set_optimizer()
    for _ in range(4):
        loss, *_ = s.run_batched(train=True,
                                 sampling_percentage=sampling)
    assert np.isfinite(loss)


def test_grad_clip(img):
    from smoe_tpu.config import OptConfig
    s = Smoe(img, kernels_per_dim=[3],
             opt_cfg=OptConfig(grad_clip_value_abs=0.1))
    s.set_optimizer()
    for _ in range(3):
        loss, *_ = s.run_batched(train=True)
    assert np.isfinite(loss)


def test_grayscale_and_uint16_precision(rng):
    img = rng.uniform(0, 1, (16, 16, 1)).astype(np.float32)
    s = Smoe(img, kernels_per_dim=[3], precision=16, use_yuv=False)
    s.set_optimizer()
    for _ in range(3):
        loss, mse, *_ = s.run_batched(train=True)
    assert np.isfinite(loss)
    # PSNR definition scales with precision (reference plotter.py:14-15)
    assert mse < (2 ** 16) ** 2
