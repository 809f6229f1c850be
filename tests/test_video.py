"""Video: motion transform, affine-driven init strategies, dual model,
time-slab reseeding (reference smoe.py:554-686, 1895-2138;
smoe_test.py:123-207)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smoe_tpu.config import SmoeConfig
from smoe_tpu.fit.trainer import Smoe
from smoe_tpu.video.init_strategies import (dual_model_concat,
                                            motion_from_affines,
                                            video_kernel_init, warp_domain)
from smoe_tpu.video.motion import TIME_PLANE, transform_coords


def make_video(h=12, w=12, t=4, c=3, shift=1.0):
    """Moving gradient pattern + per-frame translation affines."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (h, w, c)).astype(np.float32)
    vid = np.stack([np.roll(base, i, axis=1) for i in range(t)], axis=2)
    affines = np.zeros((t, 2, 3), np.float32)
    affines[:, 0, 0] = 1.0
    affines[:, 1, 1] = 1.0
    affines[:, 0, 2] = -shift * np.arange(t)      # x translation, pixels
    return vid, affines


def test_warp_domain_translation():
    vid, aff = make_video()
    warped = warp_domain(vid, aff, num_params_model=6)
    assert warped.shape == vid.shape[:3] + (3,)
    assert np.all(warped[..., 2] == TIME_PLANE)
    h, w = vid.shape[:2]
    xs = np.broadcast_to(np.linspace(0, 1, w)[None, :], (h, w))
    # frame 0 untouched
    np.testing.assert_allclose(warped[:, :, 0, 1], xs, atol=1e-6)
    # frame 1 shifted in x by -shift/(W-1)
    np.testing.assert_allclose(warped[:, :, 1, 1], xs - 1.0 / (w - 1),
                               atol=1e-5)


def test_motion_from_affines_matches_transform():
    vid, aff = make_video()
    m = motion_from_affines(aff, vid.shape)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 12),
                             np.linspace(0, 1, 4), indexing="ij"),
                 -1).reshape(-1, 3), jnp.float32)
    out = np.asarray(transform_coords(coords, jnp.asarray(m), 6, 4))
    warped = warp_domain(vid, aff, 6).reshape(-1, 3)
    np.testing.assert_allclose(out, warped, atol=1e-5)


@pytest.mark.parametrize("npm", [2, 4, 6])
def test_warp_matches_transform_non_square(npm):
    """warp_domain (init) and transform_coords (training) must agree on
    NON-square frames too — the reference's init warp normalizes the
    translations with H/W swapped relative to its own training transform
    (smoe.py:1901-1908 vs :560-566); we deviate toward consistency."""
    rng = np.random.default_rng(4)
    h, w, t = 12, 20, 3
    vid = rng.uniform(0, 1, (h, w, t, 1)).astype(np.float32)
    aff = np.zeros((t, 2, 3), np.float32)
    for i in range(t):
        aff[i, 0, 0] = aff[i, 1, 1] = 1.0
        aff[i, 0, 2] = 3.0 * i        # x translation, pixels
        aff[i, 1, 2] = -2.0 * i       # y translation, pixels
        if npm >= 4:
            aff[i, 0, 1] = 0.05 * i
    m = motion_from_affines(aff, vid.shape)
    ys, xs, ts = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                             np.linspace(0, 1, t), indexing="ij")
    coords = jnp.asarray(np.stack([ys, xs, ts], -1).reshape(-1, 3),
                         jnp.float32)
    out = np.asarray(transform_coords(coords, jnp.asarray(m), npm, t))
    warped = warp_domain(vid, aff, npm).reshape(-1, 3)
    np.testing.assert_allclose(out, warped, atol=1e-5)


@pytest.mark.parametrize("flag", [1, 2, 2.5, 3, 4, 5])
def test_video_kernel_init_strategies(flag):
    vid, aff = make_video()
    warped = warp_domain(vid, aff, 6)
    out = video_kernel_init(vid, warped, (3, 3, 2), flag)
    k = out["pis"].shape[0]
    assert k > 0
    assert out["musX"].shape == (k, 3)
    assert out["A"].shape == (k, 3, 3)
    assert np.all(np.isfinite(out["musX"]))
    assert np.all(np.diagonal(out["A"], axis1=1, axis2=2) > 0)


def test_dual_model_concat():
    m0 = {"musX": np.zeros((2, 3), np.float32),
          "A": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
          "nu_e": np.full((2, 3), 0.5, np.float32),
          "gamma_e": np.zeros((2, 3, 3), np.float32),
          "pis": np.ones((2,), np.float32)}
    m1 = {k: np.concatenate([v, v], 0) for k, v in m0.items()}
    out, mask = dual_model_concat(m0, m1)
    assert out["pis"].shape == (6,)
    np.testing.assert_array_equal(mask, [1, 1, 0, 0, 0, 0])
    assert np.all(out["pis"][2:] == 0)            # model-1 starts disabled
    assert np.all(out["musX"][:2, 2] == TIME_PLANE)


def test_video_fit_with_affines_end_to_end():
    vid, aff = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1,
             train_trafo=False)
    assert s.model_mask is not None
    assert s.params.motion is not None
    s.set_optimizer()
    l0, m0, *_ = s.run_batched(train=False)
    for _ in range(15):
        loss, mse, npi, _ = s.run_batched(train=True)
    assert np.isfinite(loss)
    assert mse < m0


def test_reseed_time_slab():
    vid, aff = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1)
    s.set_optimizer()
    for _ in range(5):
        s.run_batched(train=True)
    pis_before = int(np.sum(np.asarray(s.params.pis) > 0))
    rows = s.reseed_time_slab(0, rng=0)
    pis_after = int(np.sum(np.asarray(s.params.pis) > 0))
    assert pis_after > pis_before
    assert np.all(np.asarray(s.params.pis)[rows] == 1.0)
    # reseeded centers are inside the domain
    mus = np.asarray(s.params.musX)[rows]
    assert np.all((mus >= 0) & (mus <= 1))
    loss, mse, *_ = s.run_batched(train=True)
    assert np.isfinite(loss)


def test_train_trafo_video_fits():
    """Trainable motion (no affines): h params get gradients, frame 0 frozen."""
    vid, _ = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], train_trafo=True,
             num_params_model=6)
    s.set_optimizer()
    m_before = np.asarray(s.params.motion).copy()
    for _ in range(10):
        loss, mse, *_ = s.run_batched(train=True)
    m_after = np.asarray(s.params.motion)
    assert np.isfinite(loss)
    # frame 0 motion params never move (reference smoe.py:1155-1158)
    np.testing.assert_array_equal(m_before[:, 0], m_after[:, 0])


def test_dual_model_fused_matches_xla():
    """The feature-concat dual-domain maha (one matmul) must match the
    two-matmul + select XLA semantics, in both XLA and fused paths."""
    import jax
    from smoe_tpu.fit.trainer import _forward_eff, effective_params

    vid, aff = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1)
    eff = effective_params(s.params, s.cfg, s.musX_grid)
    coords = s.bset.coords[0]
    kmask = s.kernel_lists[0]

    out_xla = _forward_eff(eff, s.cfg, coords, kmask, s.model_mask)
    out_fused = _forward_eff(eff, s.cfg, coords, kmask, s.model_mask,
                             fused=(True, True))
    # both paths are exact up to float addition order; borderline pixels
    # may flip one output-quantization step (1/255)
    np.testing.assert_allclose(np.asarray(out_fused.res),
                               np.asarray(out_xla.res),
                               atol=1.01 / 255)
    np.testing.assert_array_equal(np.asarray(out_fused.survivors),
                                  np.asarray(out_xla.survivors))


def test_dual_model_fused_training():
    vid, aff = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1,
             use_pallas="on")
    s.set_optimizer()
    l0, m0, *_ = s.run_batched(train=False)
    for _ in range(10):
        loss, mse, *_ = s.run_batched(train=True)
    assert np.isfinite(loss)
    assert mse < m0


def test_update_kernel_list_uses_motion_probes():
    """Kernel-list probing must evaluate motion-plane (t=-5) kernels against
    the TRANSFORMED domain — raw probes would never reach them
    (reference smoe.py:2292-2317)."""
    vid, aff = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1)
    # wipe the lists, then refresh via probes only
    s.kernel_lists = jnp.zeros_like(s.kernel_lists)
    s.update_kernel_list()
    lists = np.asarray(s.kernel_lists)
    m0 = np.asarray(s.model_mask)[: s.cfg.start_pis]
    pis = np.asarray(s.params.pis)[: s.cfg.start_pis]
    live_m0 = m0 & (pis > 0)
    # every live motion-plane kernel must be reachable in some block
    assert np.all(lists[:, : s.cfg.start_pis][:, live_m0].any(axis=0))


def test_prune_search_dual_model_sweeps_msplit(capsys):
    """Dual-model fits sweep a second candidate ordering (msplit:
    transformed-domain kernels pruned first) because the two models'
    gating masses are measured on different domains; the sweep picks
    the smallest within-tol candidate across BOTH orderings."""
    from smoe_tpu.codec.prune import prune_search
    from smoe_tpu.codec.quantize import quantize_params

    vid, aff = make_video(h=8, w=8, t=3)
    s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1)
    s.set_optimizer()
    for _ in range(5):
        s.run_batched(train=True)
    s.reseed_time_slab(0, rng=0)    # populate raw-domain (model-1) rows
    for _ in range(3):
        s.run_batched(train=True)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    used = np.asarray(s.qparams["used_kernels"], bool)
    k = int(np.count_nonzero(used))
    mm_used = np.asarray(s.model_mask, bool)[used]
    assert mm_used.any() and not mm_used.all()    # both models present

    qp = prune_search(s, 99.0)    # huge tol -> smallest swept prefix
    out = capsys.readouterr().out
    assert "prune sweep[mass]" in out
    assert "prune sweep[msplit]" in out
    assert int(np.count_nonzero(qp["used_kernels"])) == max(1, k * 2 // 16)
