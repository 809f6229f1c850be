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


def test_sv_shared_grid_index_map():
    """cfg.sv_shared_grid: the BlockSet index map sends every padded-block
    position to its global raster pixel, and image-edge pad positions to
    the dummy row prod(spatial)."""
    from smoe_tpu.config import SmoeConfig
    from smoe_tpu.fit.blocks import build_blockset

    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 1)) \
        .astype(np.float32)
    cfg = SmoeConfig(dim_domain=2, num_channels=1, kernels_per_dim=(2, 2),
                     train_svs=True, sv_shared_grid=True,
                     block_shape=(4, 4), overlap=1, use_yuv=False)
    bset = build_blockset(img, cfg)
    assert bset.sv_index.shape == (4, 36)          # 4 blocks, 6x6 windows
    iv = np.asarray(bset.sv_index)
    for bi in range(2):
        for bj in range(2):
            b = bi * 2 + bj
            for wi in range(6):
                for wj in range(6):
                    gi, gj = bi * 4 + wi - 1, bj * 4 + wj - 1
                    want = gi * 8 + gj if (0 <= gi < 8 and 0 <= gj < 8) \
                        else 64
                    assert iv[b, wi * 6 + wj] == want
    # every real pixel is covered, overlapped pixels appear in >1 block
    real = iv[iv < 64]
    assert set(real.tolist()) == set(range(64))
    counts = np.bincount(real, minlength=64)
    assert counts.max() > 1 and counts.min() == 1


def test_sv_shared_grid_matches_blocklocal_without_overlap():
    """With overlap=0 the window pixels are disjoint, so shared-grid and
    block-local SV storage are the same model up to row ordering — the
    training trajectories must match."""
    rng = np.random.default_rng(3)
    img = np.full((8, 8, 1), 0.5, np.float32)
    img[3, 4, 0] = 0.9
    img[6, 1, 0] = 0.1

    fits = []
    for shared in (False, True):
        s = Smoe(img, kernels_per_dim=[2], train_svs=True,
                 sv_shared_grid=shared, batch_size=(4, 4),
                 use_yuv=False, use_determinant=True)
        s.set_optimizer()
        hist = []
        for _ in range(30):
            _, mse, _, _ = s.run_batched(train=True)
            hist.append(mse)
        fits.append((s, hist))
    (s0, h0), (s1, h1) = fits
    np.testing.assert_allclose(h0, h1, rtol=1e-4)
    assert s0.params.sv.shape == (64, 1)
    assert s1.params.sv.shape == (65, 1)           # 64 pixels + dummy
    # per-pixel SV values agree after mapping block order -> raster order
    iv = np.asarray(s1.bset.sv_index).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(s1.params.sv)[iv, 0],
        np.asarray(s0.params.sv)[:, 0], rtol=1e-3, atol=1e-6)
    assert float(np.asarray(s1.params.sv)[64, 0]) == 0.0


def test_sv_shared_grid_overlap_cotrains():
    """Under block overlap the shared grid keeps ONE SV per pixel: the fit
    trains, the dummy (edge-pad) row never moves, and overlapped pixels'
    rows receive gradients (they change) — the block-local layout would
    instead carry independent copies per covering block."""
    img = np.full((8, 8, 1), 0.5, np.float32)
    img[3, 4, 0] = 0.9
    s = Smoe(img, kernels_per_dim=[2], train_svs=True, sv_shared_grid=True,
             batch_size=(4, 4), overlap=1, use_yuv=False,
             use_determinant=True)
    s.set_optimizer()
    _, m0, _, _ = s.run_batched(train=False)
    for _ in range(60):
        s.run_batched(train=True)
    loss, mse, _, _ = s.run_batched(train=False, update_reconstruction=True)
    assert np.isfinite(loss) and mse < m0
    sv = np.asarray(s.params.sv)
    assert sv.shape == (65, 1)
    assert sv[64, 0] == 0.0                        # dummy row: no gradient
    # rows shared between blocks (the overlap band) did train
    iv = np.asarray(s.bset.sv_index)
    real = iv[iv < 64]
    shared_rows = np.flatnonzero(np.bincount(real, minlength=64) > 1)
    assert np.any(sv[shared_rows, 0] != 0.0)
    assert s.reconstruction_sv.shape == (8, 8)


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
