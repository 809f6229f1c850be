"""Least-squares expert init (fit/lsinit.py) — beyond-reference feature.

Checks: both solver modes improve on the sample init, the coupled solve is
the exact joint minimizer (vs numpy lstsq on the explicit design), config
variants (nu-only, only_y_gamma, video motion, QAT) stay correct, and
training composes after the init.
"""

import numpy as np
import pytest

from smoe_tpu import Smoe
from smoe_tpu.core.losses import psnr_from_mse


def _img(n=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:n, 0:n] / (n - 1)
    img = np.stack([.5 + .3 * np.sin(5 * x),
                    .5 + .3 * np.cos(4 * y),
                    .4 + .2 * np.sin(3 * (x + y))], -1)[..., :c]
    img += rng.normal(0, 0.003, img.shape)
    return np.clip(img, 0, 1).astype(np.float32)


def _mse(s):
    return float(s.run_batched(train=False)[1])


class TestLsInit:
    @pytest.mark.parametrize("mode", ["kernel", "coupled"])
    def test_improves_sample_init(self, mode):
        s = Smoe(_img(), kernels_per_dim=[4], batch_size=(16, 16))
        m0 = _mse(s)
        s.ls_init_experts(mode=mode)
        m1 = _mse(s)
        assert m1 < 0.25 * m0, (m0, m1)

    def test_coupled_is_joint_minimizer(self):
        """Coupled mode == numpy lstsq on the explicit (N, K(1+d)C) design
        built from the SAME gating weights (single block, no padding)."""
        img = _img(16)
        s = Smoe(img, kernels_per_dim=[3], batch_size=(16, 16))
        # explicit design from the full-image weight matrix
        w = s.get_weight_matrix()                        # (K, H, W)
        k = w.shape[0]
        wf = np.asarray(w).reshape(k, -1).T              # (N, K)
        yx = np.stack(np.mgrid[0:16, 0:16] / 15.0, -1).reshape(-1, 2)
        phi = np.concatenate([np.ones((256, 1)), yx], 1)  # (N, 3)
        z = (wf[:, :, None] * phi[:, None, :]).reshape(256, k * 3)
        tgt = np.asarray(s.bset.targets).reshape(256, 3)  # YUV targets
        ref, *_ = np.linalg.lstsq(z, tgt, rcond=None)
        ref = ref.reshape(k, 3, 3)

        s.ls_init_experts(mode="coupled", ridge=1e-12, damp=0.0)
        nu = np.asarray(s.params.nu_e)[:k]
        gam = np.asarray(s.params.gamma_e)[:k]
        # compare through the PREDICTION (the design may be rank-deficient,
        # so params themselves are not unique)
        pred_ref = z @ ref.reshape(k * 3, 3)
        got = np.concatenate([nu[:, None, :], gam], axis=1)
        pred_got = z @ got.reshape(k * 3, 3)
        assert np.max(np.abs(pred_ref - pred_got)) < 5e-3

    @pytest.mark.parametrize("mode", ["kernel", "coupled"])
    def test_damp_shrinks_toward_current_experts(self, mode):
        """The Levenberg damping pulls the solution toward the CURRENT
        experts: as damp grows the step shrinks, and barely-gated kernels
        stay near their pre-solve params (quantizer-range protection)."""
        s = Smoe(_img(), kernels_per_dim=[4], batch_size=(16, 16))
        nu0 = np.asarray(s.params.nu_e).copy()
        gam0 = np.asarray(s.params.gamma_e).copy()

        def step_norm(damp):
            s.params = s.params.replace(nu_e=nu0, gamma_e=gam0)
            s.valid = False
            s.ls_init_experts(mode=mode, damp=damp)
            return (np.linalg.norm(np.asarray(s.params.nu_e) - nu0)
                    + np.linalg.norm(np.asarray(s.params.gamma_e) - gam0))

        n_small, n_big = step_norm(1e-3), step_norm(1e3)
        assert n_big < 0.5 * n_small, (n_small, n_big)
        # huge damping ~= no-op on the slopes
        assert np.allclose(np.asarray(s.params.gamma_e), gam0, atol=1e-3)

    def test_nu_only_when_gammas_off(self):
        s = Smoe(_img(), kernels_per_dim=[4], batch_size=(16, 16),
                 train_gammas=False)
        g0 = np.asarray(s.params.gamma_e).copy()
        m0 = _mse(s)
        s.ls_init_experts(mode="kernel")
        assert np.array_equal(np.asarray(s.params.gamma_e), g0)
        assert _mse(s) < m0

    @pytest.mark.parametrize("mode", ["kernel", "coupled"])
    def test_only_y_gamma(self, mode):
        s = Smoe(_img(), kernels_per_dim=[4], batch_size=(16, 16),
                 only_y_gamma=True)
        m0 = _mse(s)
        s.ls_init_experts(mode=mode)
        gam = np.asarray(s.params.gamma_e)
        assert np.all(gam[:, :, 1:] == 0.0)          # slopes live on Y only
        assert _mse(s) < 0.6 * m0

    def test_video_motion_dual_model(self):
        """d=3 dual-model with non-identity global motion: the design must
        use the TRANSFORMED coords (what expert_regression consumes) and
        the dual-domain gating."""
        rng = np.random.default_rng(0)
        h = w = 8
        t = 3
        base = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
        vid = np.stack([np.roll(base, i, axis=1) for i in range(t)], axis=2)
        aff = np.zeros((t, 2, 3), np.float32)
        aff[:, 0, 0] = aff[:, 1, 1] = 1.0
        aff[:, 0, 2] = -1.0 * np.arange(t)         # x translation, pixels
        s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1)
        assert s.model_mask is not None and s.params.motion is not None
        m0 = _mse(s)
        s.ls_init_experts(mode="kernel")
        m1 = _mse(s)
        assert m1 < m0, (m0, m1)

    def test_composes_with_training_and_qat(self):
        s = Smoe(_img(), kernels_per_dim=[4], batch_size=(16, 16),
                 quantization_mode=3, bit_depths=(20, 18, 6, 10, 10))
        s.ls_init_experts()
        s.set_optimizer()
        losses, mses, *_ = s.run_batched_chunk(10)
        assert np.isfinite(losses).all()
        assert float(mses[-1]) < 50.0   # stays near the LS-init quality

    def test_cli_flag(self, tmp_path):
        """-lsinit through cli/fit.py: the LS-initialized short fit must
        beat the identically-seeded plain fit."""
        cv2 = pytest.importorskip("cv2")
        from smoe_tpu.cli.fit import main as fit_main
        img_path = str(tmp_path / "img.png")
        cv2.imwrite(img_path, np.uint8(_img() * 255))
        runs = {}
        for tag, extra in (("plain", []), ("ls", ["-lsinit", "auto"]),
                           ("lsri", ["-lsinit", "auto", "-lsri", "10"])):
            res = str(tmp_path / tag)
            s = fit_main(["-i", img_path, "-r", res, "-n", "20", "-k", "4",
                          "-v", "10"] + extra)
            runs[tag] = s.get_best_mse()
        assert runs["ls"] < runs["plain"], runs
        assert runs["lsri"] <= runs["ls"] * 1.05, runs

    def test_cli_inc_compose(self, tmp_path):
        """-lsinit composes with the incremental-insertion loop (refresh
        after each splice) without destabilizing the fit."""
        cv2 = pytest.importorskip("cv2")
        from smoe_tpu.cli.fit import main as fit_main
        img_path = str(tmp_path / "img.png")
        cv2.imwrite(img_path, np.uint8(_img() * 255))
        res = str(tmp_path / "inc")
        s = fit_main(["-i", img_path, "-r", res, "-n", "20", "-k", "3",
                      "-v", "10", "-is", "1", "-ni", "10", "-na", "10",
                      "-lsinit", "kernel"])
        assert np.isfinite(s.get_best_mse())
        assert int(s.kernel_count) > 9  # kernels were inserted

    def test_mesh_trainer_compose(self):
        """ls_init_experts on a mesh-mode Smoe (the solve runs as a plain
        single-program jit; the meshed step reshards the refreshed params):
        solution == unmeshed, and training still steps."""
        import jax
        cpus = jax.devices("cpu")
        mesh_b = jax.sharding.Mesh(np.asarray(cpus[:8]), ("b",))
        mesh_bk = jax.sharding.Mesh(np.asarray(cpus[:8]).reshape(4, 2),
                                    ("b", "k"))
        nus = []
        for m in (None, mesh_b, mesh_bk):
            s = Smoe(_img(), kernels_per_dim=[4], batch_size=(8, 8), mesh=m)
            s.set_optimizer()
            s.ls_init_experts(mode="coupled")
            nus.append(np.asarray(s.params.nu_e))
            if m is not None:
                loss, *_ = s.run_batched_chunk(2)
                assert np.isfinite(np.asarray(loss)).all()
        np.testing.assert_allclose(nus[0], nus[1], atol=1e-5)
        np.testing.assert_allclose(nus[0], nus[2], atol=1e-5)

    def test_train_ls_refresh_cadence(self):
        """train(ls_refresh_iter=N): the refreshed fit must end at least
        as good as the plain fit (line search is non-regressing) and the
        cadence must not break chunk boundaries or the best snapshot."""
        runs = {}
        for lri in (None, 10):
            s = Smoe(_img(), kernels_per_dim=[4], batch_size=(16, 16))
            s.set_optimizer()
            s.train(30, val_iter=15, ls_refresh_iter=lri)
            runs[lri] = s.get_best_mse()
        assert np.isfinite(runs[10])
        assert runs[10] <= runs[None] * 1.05, runs

    def test_fit_many_ls_init_parity(self):
        """fit_many(ls_init=True) == Smoe.ls_init_experts('kernel') for the
        same (global-fit) config; zero-LR step isolates the solve."""
        from smoe_tpu.config import OptConfig
        from smoe_tpu.parallel.sharded import fit_many
        img = _img()
        s = Smoe(img, kernels_per_dim=[4], batch_size=(32, 32))
        s.ls_init_experts(mode="kernel")
        imgs = np.stack([img, img])
        batched, mses = fit_many(imgs, s.cfg, steps=1,
                                 opt_cfg=OptConfig(base_lr=0.0),
                                 ls_init=True)
        # atol 5e-4: vmapped solve reorders the Gram reductions vs the
        # single-model jit (measured diff ~7e-5 on O(1) params)
        for i in range(2):
            np.testing.assert_allclose(np.asarray(batched.nu_e[i]),
                                       np.asarray(s.params.nu_e), atol=5e-4)
            np.testing.assert_allclose(np.asarray(batched.gamma_e[i]),
                                       np.asarray(s.params.gamma_e),
                                       atol=5e-4)

    def test_loss_mask_rows_excluded(self):
        """Pixels with loss weight 0 (inpainting holes) must not enter the
        solve: corrupting them changes nothing."""
        img = _img()
        mask = np.ones(img.shape[:2], np.float32)
        mask[8:16, 10:20] = 0.0
        # coupled mode: the solve is sample-init-independent for gated
        # kernels (kernel mode's line-search direction starts from nu0,
        # which itself samples the corrupted pixels)
        s1 = Smoe(img, kernels_per_dim=[4], batch_size=(16, 16),
                  loss_mask=mask)
        s1.ls_init_experts(mode="coupled")
        bad = img.copy()
        bad[8:16, 10:20] = 0.99
        s2 = Smoe(bad, kernels_per_dim=[4], batch_size=(16, 16),
                  loss_mask=mask)
        s2.ls_init_experts(mode="coupled")
        np.testing.assert_allclose(np.asarray(s1.params.nu_e),
                                   np.asarray(s2.params.nu_e), atol=1e-5)

    def test_lf_train_mask_rows_excluded(self):
        """4D LF: untrained corner views must not enter the solve."""
        rng = np.random.default_rng(2)
        u = np.linspace(0, 1, 15)[:, None, None, None]
        v = np.linspace(0, 1, 15)[None, :, None, None]
        yy = np.linspace(0, 1, 6)[None, None, :, None]
        xx = np.linspace(0, 1, 6)[None, None, None, :]
        lf = 0.5 + 0.2 * np.sin(3 * (yy + 0.2 * u)) * np.cos(4 * (xx + v))
        lf = np.broadcast_to(lf, (15, 15, 6, 6)).astype(np.float32)
        lf = np.clip(lf + rng.normal(0, 0.01, lf.shape), 0, 1)\
            .astype(np.float32)[..., None]
        s = Smoe(lf, kernels_per_dim=[2, 2, 2, 2], use_yuv=False)
        if s.bset.train_mask is None:
            pytest.skip("no train mask in this config")
        # poison the masked-out rows: solve must be unaffected
        tm = np.asarray(s.bset.train_mask)
        t2 = np.asarray(s.bset.targets).copy()
        s.ls_init_experts(mode="kernel")
        nu_clean = np.asarray(s.params.nu_e).copy()
        t2[~tm] = 7.0
        s.bset = s.bset._replace(targets=np.asarray(t2, np.float32))
        s.ls_init_experts(mode="kernel")
        assert np.allclose(np.asarray(s.params.nu_e), nu_clean, atol=1e-5)


class TestRowChunking:
    """Dense (rows, K) passes chunk rows at production scale
    (fit/blocks.py row_chunks): 811008 px x 8192 kernels = 26.6 GB
    stopped the k=32 video fit's compile (round 5).  Chunking must be a
    pure memory transform: the LS solve within f32 partial-sum noise,
    the eval forward bit-exact (no cross-row reductions)."""

    def test_row_chunks_sizing(self):
        from smoe_tpu.fit.blocks import row_chunks
        assert row_chunks(1024, 16) == 1                 # small: unchunked
        s = row_chunks(811008, 8192)                     # the failing case
        assert s > 1 and 811008 % s == 0
        assert (811008 // s) * 8192 * 4 * 6 <= (2 << 30)
        # smallest divisor >= the estimate (nb = 2^13 * 99)
        assert s == 88

    def test_ls_solve_parity_chunked(self, monkeypatch):
        import smoe_tpu.fit.lsinit as L
        img = _img(32)
        s1 = Smoe(img, kernels_per_dim=[4], batch_size=(16, 16))
        s1.ls_init_experts(mode="kernel")
        monkeypatch.setattr(L, "_ls_row_chunks", lambda nb, w, **k: 4)
        s2 = Smoe(img, kernels_per_dim=[4], batch_size=(16, 16))
        s2.ls_init_experts(mode="kernel")
        np.testing.assert_allclose(np.asarray(s1.params.nu_e),
                                   np.asarray(s2.params.nu_e), atol=2e-4)
        np.testing.assert_allclose(np.asarray(s1.params.gamma_e),
                                   np.asarray(s2.params.gamma_e), atol=2e-4)

    def test_eval_parity_chunked(self, monkeypatch):
        import smoe_tpu.fit.trainer as T
        img = _img(32)
        s1 = Smoe(img, kernels_per_dim=[4], batch_size=(16, 16))
        s1.set_optimizer()
        for _ in range(5):
            s1.run_batched(train=True)
        params = s1.get_params()
        s3 = Smoe(img, kernels_per_dim=[4], batch_size=(16, 16),
                  init_params_dict=params)
        l1, m1, *_ = s3.run_batched(train=False, update_reconstruction=True)
        rec1 = np.asarray(s3.get_reconstruction())
        wam1 = np.asarray(s3.weight_matrix_argmax)
        monkeypatch.setattr(T, "row_chunks", lambda nb, w, **k: 4)
        s2 = Smoe(img, kernels_per_dim=[4], batch_size=(16, 16),
                  init_params_dict=params)
        l2, m2, *_ = s2.run_batched(train=False, update_reconstruction=True)
        rec2 = np.asarray(s2.get_reconstruction())
        # forward is row-wise: chunking must be bit-exact
        assert m1 == m2 and l1 == l2
        np.testing.assert_array_equal(rec1, rec2)
        np.testing.assert_array_equal(wam1,
                                      np.asarray(s2.weight_matrix_argmax))
