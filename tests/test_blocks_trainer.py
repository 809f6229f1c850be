"""Block partitioning, kernel lists, and trainer integration tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from smoe_tpu import Smoe
from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.init import (gen_domain, generate_experts,
                                generate_kernel_grid, generate_pis,
                                get_batch_shape, init_params)
from smoe_tpu.fit.blocks import build_blockset, stitch_blocks


class TestInit:
    def test_domain_inclusive_linspace(self):
        img = np.zeros((5, 9, 1), np.float32)
        dom = gen_domain(img, 2)
        assert dom.shape == (5, 9, 2)
        np.testing.assert_allclose(dom[0, 0], [0, 0])
        np.testing.assert_allclose(dom[-1, -1], [1, 1])
        np.testing.assert_allclose(dom[1, 2], [0.25, 0.25])

    def test_kernel_grid_half_inset(self):
        cfg = SmoeConfig(dim_domain=2, kernels_per_dim=(4, 4))
        musX, A = generate_kernel_grid(cfg)
        assert musX.shape == (16, 2)
        np.testing.assert_allclose(musX[0], [1 / 8, 1 / 8])
        np.testing.assert_allclose(musX[-1], [7 / 8, 7 / 8])
        # A = diag(2*(k+1)) = 10 (reference smoe.py:2152-2159)
        np.testing.assert_allclose(A[0], 10 * np.eye(2))

    def test_kernel_grid_inverse_cov_squared(self):
        cfg = SmoeConfig(dim_domain=2, kernels_per_dim=(4, 4),
                         train_inverse_cov=True)
        _, A = generate_kernel_grid(cfg)
        np.testing.assert_allclose(A[0], 100 * np.eye(2))

    def test_expert_means_local_patches(self):
        img = np.zeros((16, 16, 1), np.float32)
        img[:8] = 1.0   # top half white
        cfg = SmoeConfig(dim_domain=2, kernels_per_dim=(2, 2),
                         num_channels=1)
        musX, _ = generate_kernel_grid(cfg)
        nu, gamma = generate_experts(img, musX, cfg)
        np.testing.assert_allclose(nu[:2, 0], 1.0)   # top kernels
        np.testing.assert_allclose(nu[2:, 0], 0.0)   # bottom kernels
        assert gamma.shape == (4, 2, 1)
        np.testing.assert_allclose(gamma, 0.0)

    def test_pis_normalized(self):
        np.testing.assert_allclose(generate_pis(10, True), 0.1)
        np.testing.assert_allclose(generate_pis(10, False), 1.0)

    def test_get_batch_shape_divisors(self):
        # 32x32 image, want 4 blocks -> 16x16 blocks
        shape = get_batch_shape(4, (32, 32, 3))
        assert np.prod([32 // shape[0], 32 // shape[1]]) >= 4

    def test_capacity_padding(self):
        img = np.full((8, 8, 1), 0.5, np.float32)
        cfg = SmoeConfig(dim_domain=2, kernels_per_dim=(2, 2),
                         num_channels=1, add_kernel_slots=6)
        p = init_params(img, cfg)
        assert p.pis.shape[0] == 6 + 2 * 4
        assert np.asarray(p.pis)[4:].sum() == 0   # padded slots dead


class TestBlocks:
    def test_partition_stitch_roundtrip(self, rng):
        img = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=2, num_channels=3)
        bset = build_blockset(img, cfg, (8, 8))
        assert bset.coords.shape[0] == 2 * 3
        out = stitch_blocks(bset.targets, bset)
        np.testing.assert_allclose(np.asarray(out), img, rtol=1e-6)

    def test_partition_with_overlap(self, rng):
        img = rng.uniform(0, 1, (16, 16, 1)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=2, num_channels=1, overlap=2)
        bset = build_blockset(img, cfg, (8, 8))
        assert bset.block_padded == (12, 12)
        assert int(np.asarray(bset.valid).sum()) == 64
        out = stitch_blocks(bset.targets, bset)
        np.testing.assert_allclose(np.asarray(out), img, rtol=1e-6)

    def test_3d_partition(self, rng):
        vol = rng.uniform(0, 1, (8, 8, 6, 1)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=3, num_channels=1)
        bset = build_blockset(vol, cfg, (4, 8, 3))
        assert bset.coords.shape[0] == 2 * 1 * 2
        out = stitch_blocks(bset.targets, bset)
        np.testing.assert_allclose(np.asarray(out), vol, rtol=1e-6)

    def test_padded_coords_zero(self, rng):
        """Zero-padded overlap region carries zero coords+values
        (reference pads the joint domain with zeros, smoe.py:21)."""
        img = rng.uniform(0.5, 1, (8, 8, 1)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=2, num_channels=1, overlap=1)
        bset = build_blockset(img, cfg, (8, 8))
        coords = np.asarray(bset.coords)[0].reshape(10, 10, 2)
        np.testing.assert_allclose(coords[0], 0.0)   # padded row


class TestTrainerIntegration:
    def test_loss_decreases(self, toy_image):
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
        l0, m0, *_ = s.run_batched(train=False)
        s.set_optimizer()
        for _ in range(40):
            s.run_batched(train=True)
        l1, m1, *_ = s.run_batched(train=False)
        assert l1 < l0
        assert m1 < m0

    def test_blocked_matches_global_constant_image(self):
        """Block-partitioned eval of a constant image == global eval
        (stitching property, SURVEY §4)."""
        img = np.full((16, 16, 1), 0.5, np.float32)
        sg = Smoe(img, kernels_per_dim=[2], use_yuv=False)
        sb = Smoe(img, kernels_per_dim=[2], batch_size=(8, 8),
                  use_yuv=False)
        lg, mg, *_ = sg.run_batched(train=False, update_reconstruction=True)
        lb, mb, *_ = sb.run_batched(train=False, update_reconstruction=True)
        np.testing.assert_allclose(mg, mb, rtol=1e-4)
        np.testing.assert_allclose(sg.get_reconstruction(),
                                   sb.get_reconstruction(), atol=1e-6)

    def test_best_snapshot_tracks_improvement(self, toy_image):
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
        s.set_optimizer()
        s.train(20, val_iter=10)
        assert s.best_loss is not None
        assert s.best_params is not None
        assert len(s.losses) >= 2

    def test_checkpoint_restore_roundtrip(self, toy_image, tmp_path):
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
        s.set_optimizer()
        for _ in range(5):
            s.run_batched(train=True)
        l_before, *_ = s.run_batched(train=False)
        path = str(tmp_path / "ckpt.pkl")
        s.checkpoint(path)

        s2 = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
        s2.set_optimizer()
        s2.restore(path)
        l_after, *_ = s2.run_batched(train=False)
        np.testing.assert_allclose(l_before, l_after, rtol=1e-5)

    def test_container_save_load(self, toy_image, tmp_path):
        from smoe_tpu.codec.container import save_model, load_params
        from smoe_tpu.codec.quantize import quantize_params
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
        qp = quantize_params(s.get_params(), s.cfg)
        path = str(tmp_path / "m.pkl")
        save_model(path, s.get_params(), s.cfg, qparams=qp)
        params = load_params(path)
        assert params["pis"].shape[0] == 9   # reduced to active
        s2 = Smoe(toy_image, init_params_dict=params, kernels_per_dim=None,
                  use_yuv=False)
        l1, m1, *_ = s.run_batched(train=False)
        l2, m2, *_ = s2.run_batched(train=False)
        np.testing.assert_allclose(m1, m2, rtol=1e-4)

    def test_quantized_eval_path(self, toy_rgb):
        from smoe_tpu.codec.quantize import quantize_params, rescaler
        s = Smoe(toy_rgb, kernels_per_dim=[3])
        s.set_optimizer()
        for _ in range(20):
            s.run_batched(train=True)
        s.qparams = quantize_params(s.get_params(), s.cfg)
        s.rparams = rescaler(s.qparams, s.cfg)
        l, m, *_ = s.run_batched(train=False, update_reconstruction=True,
                                 with_quantized_params=True)
        lq, mq, *_ = s.run_batched(train=False, update_reconstruction=True)
        # 20/18/6/10/10-bit quantization ~ lossless at this scale
        assert abs(m - mq) / max(mq, 1e-9) < 0.2
        assert s.get_qreconstruction().shape == toy_rgb.shape

    def test_sampling_percentage(self, toy_image):
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
        s.set_optimizer()
        l0, *_ = s.run_batched(train=False)
        for _ in range(30):
            s.run_batched(train=True, sampling_percentage=50)
        l1, *_ = s.run_batched(train=False)
        assert l1 < l0

    def test_train_divergence_guard(self, toy_image):
        """Huge LR diverges -> guard stops without raising."""
        from smoe_tpu.config import OptConfig
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False,
                 opt_cfg=OptConfig(base_lr=1e4))
        s.set_optimizer()
        s.train(50, val_iter=5)   # must return, not raise


class TestIncremental:
    def test_peak_local_max(self):
        from smoe_tpu.fit.incremental import peak_local_max
        img = np.zeros((64, 64))
        img[20, 20] = 2.0
        img[40, 45] = 3.0
        img[22, 21] = 1.0   # within min_distance of (20,20)
        peaks = peak_local_max(img, num_peaks=5, min_distance=8)
        assert (peaks == [40, 45]).all(axis=1).any()
        assert (peaks == [20, 20]).all(axis=1).any()
        assert not (peaks == [22, 21]).all(axis=1).any()

    def test_ssim_map_identical(self, rng):
        from smoe_tpu.fit.incremental import ssim_map
        img = rng.uniform(0, 1, (32, 32, 3))
        m = ssim_map(img, img)
        np.testing.assert_allclose(m, 1.0, atol=1e-7)

    def test_inc_cycle(self, toy_image):
        """reinit -> train_inc -> apply splices kernels into main block."""
        s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False,
                 add_kernel_slots=18)
        s.set_optimizer()
        cap = s.params.capacity
        assert cap == 18 + 2 * 9
        for _ in range(10):
            s.run_batched(train=True)
        s.run_batched(train=False, update_reconstruction=True)
        n_before = int(np.asarray(s.params.pis > 0).sum())
        s.reinit_inc()
        s.run_batched(train=True, with_inc=True, train_inc=True)
        s.apply_inc()
        assert s.kernel_count > 9 or n_before >= s.cfg.start_pis


class TestChunkedTrainer:
    def test_chunk_equals_stepwise(self, toy_rgb):
        """run_batched_chunk(n) must produce the same params as n single
        sweeps (no subsampling -> rng unused, so trajectories coincide)."""
        import jax
        from smoe_tpu.fit.trainer import Smoe

        a = Smoe(toy_rgb, kernels_per_dim=[3], batch_size=(16, 16))
        b = Smoe(toy_rgb, kernels_per_dim=[3], batch_size=(16, 16))
        a.set_optimizer()
        b.set_optimizer()
        for _ in range(4):
            a.run_batched(train=True)
        b.run_batched_chunk(4)
        for f in ("musX", "a_diag", "a_corr", "pis", "nu_e", "gamma_e"):
            np.testing.assert_allclose(
                np.asarray(getattr(a.params, f)),
                np.asarray(getattr(b.params, f)), rtol=1e-6, atol=1e-7,
                err_msg=f"chunked vs stepwise diverged on {f}")
        np.testing.assert_array_equal(np.asarray(a.kernel_lists),
                                      np.asarray(b.kernel_lists))

    def test_chunk_metrics_match_history(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[3])
        s.set_optimizer()
        loss, mse, npi, nsv = s.run_batched_chunk(5)
        assert loss.shape == (5,) and mse.shape == (5,)
        assert np.all(np.isfinite(loss))

    def test_phase_breakdown_programs(self, toy_rgb):
        """The fwd-only phase program (phase_breakdown diagnostic, VERDICT
        r4 #4) must compute exactly the production sweep's loss — the
        breakdown is only auditable if the timed programs run the same
        math — and the fwd+bwd program's 1e-30 grad-axpy must be a
        numerical no-op."""
        import jax.numpy as jnp
        import pytest
        from smoe_tpu.fit.trainer import RegWeights, Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[3], batch_size=(16, 16))
        s.set_optimizer()
        s.run_batched_chunk(2)
        kcap = s._current_k_cap()
        fwd_fn, fb_fn = s._compiled.phase_fns(True, False, 100, False, 1,
                                              k_cap=kcap)
        reg = RegWeights(jnp.float32(0), jnp.float32(0), jnp.float32(0))
        args = (s.params, s.kernel_lists, None, reg, s.musX_grid,
                s.model_mask, s.sampling_probs, s._next_rng(),
                jnp.float32(0.0), s._coords_dev, s._targets_dev)
        acc_fwd = float(fwd_fn(*args))
        acc_fb = float(fb_fn(*args))
        loss, *_ = s.run_batched_chunk(1)   # metrics describe pre-update
        assert acc_fwd == pytest.approx(float(loss[0]), rel=1e-5)
        assert acc_fb == pytest.approx(acc_fwd, rel=1e-5)

        pb = s.phase_breakdown(n_steps=2)
        assert set(pb) == {"fwd", "bwd", "opt_metrics", "step", "k_cap"}
        assert pb["fwd"] > 0 and pb["step"] > 0

    def test_reinit_resets_state_keeps_compiled(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[3])
        s.set_optimizer()
        p0 = np.asarray(s.params.musX).copy()
        s.run_batched_chunk(5)
        assert not np.allclose(np.asarray(s.params.musX), p0)
        fns_before = dict(s._compiled._train_fns)
        s.reinit()
        np.testing.assert_allclose(np.asarray(s.params.musX), p0)
        assert s._compiled._train_fns == fns_before   # compile cache kept


class TestLossMask:
    def test_masked_pixels_excluded_from_gradients(self):
        """Reference -mask semantics (smoe.py:906-923): zero-weighted pixels
        contribute nothing, so two images differing only inside the masked
        region train identically."""
        from smoe_tpu.fit.trainer import Smoe

        y, x = np.mgrid[0:16, 0:16] / 15.0
        img = (0.5 + 0.3 * np.sin(5 * x) * np.cos(4 * y)
               ).astype(np.float32)[..., None]
        img2 = img.copy()
        img2[:, :8] = 0.9                       # differs only where masked
        mask = np.ones((16, 16), np.float32)
        mask[:, :8] = 0.0

        outs = []
        init = None
        for im in (img, img2):
            s = Smoe(im, kernels_per_dim=[3], use_yuv=False, loss_mask=mask,
                     init_params_dict=init)
            if init is None:            # share the (image-derived) init
                init = {"musX": np.asarray(s.params.musX),
                        "A": np.asarray(s.params.a_diag + s.params.a_corr),
                        "nu_e": np.asarray(s.params.nu_e),
                        "gamma_e": np.asarray(s.params.gamma_e),
                        "pis": np.asarray(s.params.pis)}
            s.set_optimizer()
            s.run_batched_chunk(3, use_loss_mask=True)
            outs.append(np.asarray(s.params.musX))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_loss_mask_blocked_with_overlap(self):
        """Regression: the per-block loss mask must be blocked with the SAME
        overlap as coords/targets (it was blocked with overlap=0, so any
        overlap > 0 fit with a mask mis-shaped the per-block weights)."""
        from smoe_tpu.fit.trainer import Smoe

        y, x = np.mgrid[0:16, 0:16] / 15.0
        img = (0.5 + 0.3 * np.sin(5 * x) * np.cos(4 * y)
               ).astype(np.float32)[..., None]
        img2 = img.copy()
        img2[:4, :4] = 0.1
        mask = np.ones((16, 16), np.float32)
        mask[:4, :4] = 0.0

        outs = []
        init = None
        for im in (img, img2):
            s = Smoe(im, kernels_per_dim=[3], use_yuv=False, loss_mask=mask,
                     batch_size=(8, 8), overlap=2, init_params_dict=init)
            if init is None:            # share the (image-derived) init
                init = {"musX": np.asarray(s.params.musX),
                        "A": np.asarray(s.params.a_diag + s.params.a_corr),
                        "nu_e": np.asarray(s.params.nu_e),
                        "gamma_e": np.asarray(s.params.gamma_e),
                        "pis": np.asarray(s.params.pis)}
            assert s.loss_mask.shape == s.bset.coords.shape[:2]
            s.set_optimizer()
            loss, *_ = s.run_batched_chunk(2, use_loss_mask=True)
            assert np.all(np.isfinite(loss))
            outs.append(np.asarray(s.params.musX))
        np.testing.assert_array_equal(outs[0], outs[1])


def test_train_grad_clip_arg_is_applied(toy_image):
    """train(grad_clip_value_abs=...) rebuilds the rig with the clip
    (reference smoe.py:1491); it was silently ignored before."""
    from smoe_tpu.fit.trainer import Smoe

    clip = 1e-7
    s = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
    s.set_optimizer()
    s.train(2, val_iter=2, grad_clip_value_abs=clip)
    assert s.opt_cfg.grad_clip_value_abs == clip
    # with |g| <= clip, one Adam step moves each coord by at most ~lr
    s2 = Smoe(toy_image, kernels_per_dim=[3], use_yuv=False)
    s2.set_optimizer()
    s2.train(2, val_iter=2)
    d_clip = np.abs(np.asarray(s.params.nu_e) - np.asarray(s2.params.nu_e))
    assert d_clip.max() > 0                     # the two runs diverge


def test_probe_maha_threshold_knob():
    """cfg.probe_maha_threshold controls kernel-list density (default 800
    = reference smoe.py:806); tighter thresholds give sparser lists."""
    from smoe_tpu.core.init import init_params
    from smoe_tpu.fit.blocks import build_blockset, initialize_kernel_lists
    from smoe_tpu.fit.trainer import effective_params

    import jax

    rng = np.random.default_rng(0)
    img = rng.uniform(0.2, 0.8, (32, 32, 1)).astype(np.float32)
    counts = {}
    for thr in (800.0, 10.0):
        cfg = SmoeConfig(dim_domain=2, num_channels=1,
                         kernels_per_dim=(6, 6), use_yuv=False,
                         probe_maha_threshold=thr)
        params = jax.tree_util.tree_map(jnp.asarray, init_params(img, cfg))
        eff = effective_params(params, cfg, None)
        bset = build_blockset(img, cfg, (8, 8))
        lists = initialize_kernel_lists(eff.A, eff.musX, eff.pis, cfg, bset)
        counts[thr] = int(np.asarray(lists).sum())
    assert counts[10.0] < counts[800.0]


class TestInGraphUkl:
    """cfg.in_graph_ukl: per-sweep list refresh inside the compiled chunk
    (survivors | probe-near) — no active probe-near kernel may stay
    unlisted longer than one sweep (the drift pathology measured at
    >10 dB decoded-PSNR cost on the CIF recipe, round 3)."""

    def test_probe_near_always_listed(self, rng):
        img = rng.random((48, 48, 3)).astype(np.float32)
        s = Smoe(img, kernels_per_dim=(6,), block_shape=(24, 24),
                 in_graph_ukl=True)
        s.set_optimizer()
        s.run_batched_chunk(8)
        from smoe_tpu.fit.blocks import update_kernel_lists
        from smoe_tpu.fit.trainer import effective_params
        eff = effective_params(s.params, s.cfg, s.musX_grid)
        near = np.asarray(update_kernel_lists(
            eff.A, eff.musX, eff.pis, s.cfg, s.bset,
            jnp.zeros_like(s.kernel_lists)))
        lists = np.asarray(s.kernel_lists)
        assert np.all(lists[near]), \
            "an active probe-near kernel is missing from the lists"

    def test_quality_not_worse_than_host_cadence(self, rng):
        img = rng.random((32, 32, 3)).astype(np.float32)
        out = {}
        for iukl in (False, True):
            s = Smoe(img, kernels_per_dim=(4,), block_shape=(16, 16),
                     in_graph_ukl=iukl)
            s.set_optimizer()
            s.train(30, val_iter=10)
            out[iukl] = s.best_loss
        # same small geometry: every kernel is probe-near every block, so
        # the refreshed lists equal the host-refresh behavior exactly
        assert out[True] == pytest.approx(out[False], rel=1e-5)

    def test_video_motion_probe_branch(self, rng):
        # 3-D + affines: the in-graph refresh recomputes probe boxes from
        # the CURRENT motion params (host analog: trainer.py
        # update_kernel_list motion branch)
        vid = rng.random((16, 16, 4, 3)).astype(np.float32)
        aff = np.tile(np.eye(3, dtype=np.float32)[None], (4, 1, 1))
        aff[:, 0, 2] = 0.02 * np.arange(4)
        s = Smoe(vid, kernels_per_dim=(3, 3, 2), affines=aff,
                 in_graph_ukl=True)
        s.set_optimizer()
        loss, *_ = s.run_batched_chunk(3)
        assert np.isfinite(loss).all()

    def test_inc_cycle_composes(self, toy_image):
        """Incremental insertion under in_graph_ukl.

        reinit_inc refills only up to the start budget (num_peaks =
        start_pis - used, reference smoe.py:1377), so a fit where nothing
        was culled requests ZERO peaks.  Simulate sparsification by
        zeroing some pis, let a validation record the reduced count, then
        drive the full reference inc cycle (reinit -> apply -> train,
        smoe_test.py:221-245): the error-map peaks go live immediately and
        the per-sweep list refresh must pick the spliced rows up."""
        s = Smoe(toy_image, kernels_per_dim=(4,), add_kernel_slots=16,
                 in_graph_ukl=True)
        s.set_optimizer()
        s.train(20, val_iter=10)
        pis = np.asarray(s.params.pis).copy()
        pis[5:11] = 0.0
        s.params = s.params.replace(pis=jnp.asarray(pis))
        s.valid = False
        s.train(4, val_iter=2)      # degraded eval -> num_pis history
        n0 = int(np.asarray(s.params.pis > 0).sum())
        assert n0 < 16
        mse0 = s.get_mses()[-1][1]
        s.reinit_inc()
        assert int(np.asarray(s.params.pis > 0).sum()) > n0
        s.apply_inc()
        s.train(20, val_iter=10)
        assert int(np.asarray(s.params.pis > 0).sum()) > n0
        assert np.isfinite(s.best_loss)
        assert s.get_mses()[-1][1] < mse0
