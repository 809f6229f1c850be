"""4D light-field support (C14): domain, train mask, fit, .mat I/O
(reference smoe.py:2199-2217, 2374-2389; utils.py:104-110, 155-162)."""

import numpy as np
import pytest

from smoe_tpu.fit.blocks import _lf_train_mask, build_blockset
from smoe_tpu.fit.trainer import Smoe
from smoe_tpu.config import SmoeConfig


def make_lf(views=15, h=6, w=6, c=1):
    rng = np.random.default_rng(0)
    u = np.linspace(0, 1, views)[:, None, None, None]
    v = np.linspace(0, 1, views)[None, :, None, None]
    yy = np.linspace(0, 1, h)[None, None, :, None]
    xx = np.linspace(0, 1, w)[None, None, None, :]
    lf = 0.5 + 0.2 * np.sin(3 * (yy + 0.2 * u)) * np.cos(4 * (xx + 0.2 * v))
    lf = np.broadcast_to(lf, (views, views, h, w)).astype(np.float32)
    lf = lf + rng.normal(0, 0.01, lf.shape).astype(np.float32)
    return np.clip(lf, 0, 1)[..., None][..., :c]


def test_lf_train_mask_excludes_corners():
    m = _lf_train_mask((15, 15, 6, 6))
    assert not m[0, 0].any()          # corner views excluded
    assert not m[14, 14].any()
    assert m[7, 7].all()              # central view trained


def test_lf_blockset_carries_mask():
    lf = make_lf()
    cfg = SmoeConfig(dim_domain=4, num_channels=1,
                     kernels_per_dim=(2, 2, 2, 2), use_yuv=False)
    bset = build_blockset(lf, cfg, lf.shape[:4])
    assert bset.train_mask is not None
    frac = float(np.mean(np.asarray(bset.train_mask)))
    assert 0.8 < frac < 1.0           # some views masked, most kept


def test_lf_blocked_mask_excludes_corner_views():
    """Block-partitioned LF fit: pixels in masked (corner) views must not
    affect the loss or the gradients (reference smoe.py:902-904 masks the
    loss regardless of batching)."""
    from smoe_tpu.fit.blocks import _lf_train_mask
    lf = make_lf()
    lf2 = lf.copy()
    mask = _lf_train_mask(lf.shape[:4])
    lf2[~mask] = 0.93                      # corrupt ONLY excluded views

    def fit_one_step(img):
        # 4 blocks: split the view axes so corner views land in different
        # blocks than the center
        s = Smoe(img, kernels_per_dim=[2, 2, 2, 2], use_yuv=False,
                 batch_size=(5, 15, 6, 6))
        s.set_optimizer()
        l0, m0, *_ = s.run_batched(train=False)
        s.run_batched_chunk(1)
        return l0, s.get_params()

    l1, p1 = fit_one_step(lf)
    l2, p2 = fit_one_step(lf2)
    assert lf.shape[0] % 5 == 0
    np.testing.assert_allclose(l1, l2, rtol=0, atol=0)
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k])


def test_lf_fit_end_to_end():
    lf = make_lf()
    s = Smoe(lf, kernels_per_dim=[2, 2, 2, 2], use_yuv=False)
    s.set_optimizer()
    l0, m0, *_ = s.run_batched(train=False)
    for _ in range(10):
        loss, mse, npi, _ = s.run_batched(train=True)
    assert np.isfinite(loss)
    assert mse < m0


def test_lf_mat_io_roundtrip(tmp_path):
    from smoe_tpu.io.images import read_image, write_image
    lf = make_lf(c=1)
    lf3 = np.repeat(lf, 3, axis=-1)
    path = str(tmp_path / "lf")
    out = write_image(lf3, path, dim_domain=4, yuv=False, precision=8)
    assert out.endswith(".mat")
    back, precision, _ = read_image(out, use_yuv=False)
    assert back.shape == lf3.shape
    assert precision == 8
    np.testing.assert_allclose(back, lf3, atol=1.5 / 255)


def test_lf_mat_v73_read(tmp_path):
    """MATLAB v7.3 (HDF5) light fields read via the h5py fallback
    (reference reads these with hdf5storage, utils.py:104-110)."""
    h5py = pytest.importorskip("h5py")
    lf = np.repeat(make_lf(c=1), 3, axis=-1)
    lf8 = np.round(lf * 255).astype(np.uint8)
    path = str(tmp_path / "lf73.mat")
    # genuine v7.3 layout: 512-byte MATLAB userblock + HDF5 payload with
    # column-major (reversed) axes — scipy.io.loadmat must refuse it with
    # NotImplementedError so read_image takes the h5py path.
    with h5py.File(path, "w", userblock_size=512) as f:
        f["LF"] = lf8.transpose()
    header = b"MATLAB 7.3 MAT-file, written by smoe_tpu tests"
    block = header + b" " * (124 - len(header)) \
        + np.uint16(0x0200).tobytes() + b"IM"
    with open(path, "r+b") as fd:
        fd.write(block)
    from scipy.io import loadmat
    with pytest.raises(NotImplementedError):
        loadmat(path)
    from smoe_tpu.io.images import read_image
    back, precision, _ = read_image(path, use_yuv=False)
    assert back.shape == lf8.shape
    assert precision == 8
    np.testing.assert_allclose(back, lf8.astype(np.float32) / 255.0)


def test_lf_mat_v73_write_roundtrip(tmp_path):
    """write_image(mat_v73=True) emits a MATLAB v7.3 container (like the
    reference's hdf5storage output) that scipy refuses and our h5py
    fallback reads back exactly."""
    pytest.importorskip("h5py")
    from scipy.io import loadmat

    from smoe_tpu.io.images import read_image, write_image
    lf = np.repeat(make_lf(c=1), 3, axis=-1)
    path = str(tmp_path / "lf73w")
    out = write_image(lf, path, dim_domain=4, yuv=False, precision=8,
                      mat_v73=True)
    with pytest.raises(NotImplementedError):
        loadmat(out)
    back, precision, _ = read_image(out, use_yuv=False)
    assert back.shape == lf.shape
    assert precision == 8
    np.testing.assert_allclose(back, np.round(lf * 255) / 255.0,
                               atol=1e-6)


class TestCornerWeight:
    """cfg.lf_corner_weight (beyond reference): corner views enter the loss
    at a small linear weight instead of being dropped — attacks the
    trained/all-views generalization gap (BASELINE: 8.3 dB at the LF lsri
    point)."""

    def test_mask_is_float_with_corner_weight(self):
        lf = make_lf()
        cfg = SmoeConfig(dim_domain=4, num_channels=1,
                         kernels_per_dim=(2, 2, 2, 2), use_yuv=False,
                         lf_corner_weight=0.25)
        bset = build_blockset(lf, cfg, lf.shape[:4])
        tm = np.asarray(bset.train_mask)
        assert tm.dtype == np.float32
        full = _lf_train_mask(lf.shape[:4])
        assert set(np.unique(tm)) == {np.float32(0.25), np.float32(1.0)}
        # blocked mask matches the view mask layout
        assert np.isclose(tm.mean(),
                          full.mean() + 0.25 * (1 - full.mean()), atol=1e-6)

    def test_zero_weight_is_reference_parity(self):
        lf = make_lf()
        s0 = Smoe(lf, kernels_per_dim=[2, 2, 2, 2], use_yuv=False)
        sz = Smoe(lf, kernels_per_dim=[2, 2, 2, 2], use_yuv=False,
                  lf_corner_weight=0.0)
        s0.set_optimizer(); sz.set_optimizer()
        l0, *_ = s0.run_batched(train=False)
        lz, *_ = sz.run_batched(train=False)
        assert l0 == lz

    def test_corner_gradients_flow(self):
        """With cw>0, corrupting ONLY the corner views changes the loss and
        the one-step parameters (the exact inverse of
        test_lf_blocked_mask_excludes_corner_views)."""
        lf = make_lf()
        lf2 = lf.copy()
        mask = _lf_train_mask(lf.shape[:4])
        lf2[~mask] = 0.93

        def fit_one_step(img):
            s = Smoe(img, kernels_per_dim=[2, 2, 2, 2], use_yuv=False,
                     batch_size=(5, 15, 6, 6), lf_corner_weight=0.3)
            s.set_optimizer()
            l0, *_ = s.run_batched(train=False)
            s.run_batched_chunk(1)
            return l0, s.get_params()

        l1, p1 = fit_one_step(lf)
        l2, p2 = fit_one_step(lf2)
        assert l1 != l2
        assert any(not np.array_equal(p1[k], p2[k]) for k in p1)

    def test_ls_init_respects_corner_weight(self):
        lf = make_lf()
        s = Smoe(lf, kernels_per_dim=[2, 2, 2, 2], use_yuv=False,
                 lf_corner_weight=0.3)
        s.set_optimizer()
        s.ls_init_experts(mode="kernel")
        l, m, *_ = s.run_batched(train=False)
        assert np.isfinite(l) and np.isfinite(m)
