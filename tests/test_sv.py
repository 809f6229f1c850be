"""Support-vector residual (reference smoe.py:402-426, 688-709, 850-856)."""

import jax.numpy as jnp
import numpy as np

from smoe_tpu.fit.trainer import Smoe, _sv_residual


def test_sv_residual_math():
    """res_sv[b] = sum_a SV_a * exp(-(x_b-x_a)^T A_a A_a^T (x_b-x_a))."""
    rng = np.random.default_rng(0)
    n, d = 6, 2
    coords = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    sv = jnp.asarray(rng.normal(0, 1, (n, 1)), jnp.float32)
    bw_diag = jnp.asarray(
        np.tile((3.0 * np.eye(d, dtype=np.float32))[None], (n, 1, 1)))
    bw_corr = jnp.asarray(rng.normal(0, 0.5, (n, d, d)), jnp.float32)

    res, sv_eff = _sv_residual(coords, sv, bw_diag, bw_corr,
                               jnp.float32(0.0))

    c = np.asarray(coords)
    A = np.zeros((n, d, d), np.float32)
    for a in range(n):
        A[a] = np.diag(np.diag(np.asarray(bw_diag)[a])) + \
            np.tril(np.asarray(bw_corr)[a], k=-1)
    expected = np.zeros((n,), np.float32)
    for b in range(n):
        for a in range(n):
            dv = c[b] - c[a]
            m = dv @ A[a] @ A[a].T @ dv
            expected[b] += float(np.asarray(sv)[a, 0]) * np.exp(-m)
    np.testing.assert_allclose(np.asarray(res), expected, rtol=1e-4,
                               atol=1e-5)


def test_sv_threshold_zeroes_small():
    coords = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (4, 2)),
                         jnp.float32)
    sv = jnp.asarray([[0.5], [0.001], [-0.3], [0.0001]], jnp.float32)
    bw = jnp.tile(jnp.eye(2)[None] * 5.0, (4, 1, 1))
    _, sv_eff = _sv_residual(coords, sv, bw, jnp.zeros_like(bw),
                             jnp.float32(0.01))
    np.testing.assert_array_equal(
        np.asarray(sv_eff)[:, 0] != 0, [True, False, True, False])


def test_sv_training_absorbs_residual():
    """A constant-image fit with one outlier pixel: the SV layer (Y channel)
    should pick up residual energy and the num_sv counter should see it."""
    img = np.full((8, 8, 1), 0.5, np.float32)
    img[3, 4, 0] = 0.9
    s = Smoe(img, kernels_per_dim=[2], train_svs=True, use_yuv=False,
             use_determinant=True)
    s.set_optimizer()
    l0, m0, _, _ = s.run_batched(train=False)
    for _ in range(60):
        s.run_batched(train=True)
    loss, mse, _, _ = s.run_batched(train=False, update_reconstruction=True)
    assert np.isfinite(loss)
    assert mse < m0
    assert s.params.sv is not None
    assert s.reconstruction_sv is not None
    assert s.reconstruction_sv.shape == (8, 8)


def test_sv_with_pixel_subsampling():
    """VERDICT r2 #7: train_svs composes with sampling_percentage < 100.
    The SV rows/bandwidths ride the same Gumbel-top-k indices as their
    pixels (reference feeds the SV mask alongside the sampled block,
    smoe.py:1664-1682), so only the sampled rows receive gradients."""
    img = np.full((8, 8, 1), 0.5, np.float32)
    img[3, 4, 0] = 0.9
    img[6, 1, 0] = 0.1
    s = Smoe(img, kernels_per_dim=[2], train_svs=True, use_yuv=False,
             use_determinant=True)
    s.set_optimizer()
    sv0 = np.asarray(s.params.sv).copy()
    _, m0, _, _ = s.run_batched(train=False)

    # one step at 50%: exactly the sampled SV rows may change
    s.run_batched(train=True, sampling_percentage=50)
    changed = np.flatnonzero(np.asarray(s.params.sv)[:, 0] != sv0[:, 0])
    assert 0 < changed.size <= 32, (
        f"{changed.size} SV rows changed; at most the 32 sampled may")

    # and the composed config actually trains
    for _ in range(60):
        s.run_batched(train=True, sampling_percentage=50)
    loss, mse, _, _ = s.run_batched(train=False)
    assert np.isfinite(loss)
    assert mse < m0


def test_sv_reg_and_num_sv_metric():
    img = np.full((8, 8, 1), 0.4, np.float32)
    img[2, 2, 0] = 0.8
    s = Smoe(img, kernels_per_dim=[2], train_svs=True, use_yuv=False)
    s.set_optimizer()
    for _ in range(40):
        out = s.run_batched(train=True, sv_l1_sub_l2=1e-4)
    # metric counts |SV| > 5e-3 (reference smoe.py:1013-1016)
    expected = int(np.sum(np.abs(np.asarray(s.params.sv)) > 5e-3))
    _, _, _, nsv = s.run_batched(train=False)
    assert nsv == expected
