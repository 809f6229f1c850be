"""Loss, SSIM, fake-quant, and codec round-trip tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core import losses as L
from smoe_tpu.core.quant import fake_quant
from smoe_tpu.core.ssim import ssim_per_channel, ssim_loss
from smoe_tpu.codec.quantize import quantize_params, rescaler, rate_bits


class TestPixelLoss:
    def test_eps_insensitive_formula(self):
        """loss = mean((|diff| - eps)^2): the reference squares BEFORE the
        max (smoe.py:932, `maximum(0., square(abs(diff) - eps))`), so this
        is a V-shaped penalty minimized at |diff| == eps, not a true hinge.
        We replicate exactly."""
        cfg = SmoeConfig(precision=8, margin=0.5, use_yuv=False,
                         num_channels=1)
        eps = 0.5 / 256
        diffs = np.array([eps / 2, 0.0, eps, 0.1], np.float32)
        res = jnp.zeros((4, 1))
        tgt = jnp.asarray(diffs[:, None])
        out = L.pixel_loss(res, tgt, cfg)
        want = np.mean((np.abs(diffs) - eps) ** 2)
        np.testing.assert_allclose(float(out.loss_pixel), want, rtol=1e-5)

    def test_yuv_weighting(self):
        """6/8 mean(Y) + 1/8 (mean(U)+mean(V)) (reference smoe.py:933-935)."""
        cfg = SmoeConfig(precision=8, margin=0.0, use_yuv=True,
                         num_channels=3)
        res = jnp.zeros((4, 3))
        tgt = jnp.asarray(np.tile([[0.1, 0.2, 0.4]], (4, 1)))
        out = L.pixel_loss(res, tgt, cfg)
        want = 6 / 8 * 0.01 + 1 / 8 * (0.04 + 0.16)
        np.testing.assert_allclose(float(out.loss_pixel), want, rtol=1e-5)

    def test_mse_scaling(self):
        """MSE scaled by (2^precision)^2 (reference smoe.py:1053)."""
        cfg = SmoeConfig(precision=8, use_yuv=False, num_channels=1)
        res = jnp.zeros((2, 1))
        tgt = jnp.full((2, 1), 0.5)
        out = L.pixel_loss(res, tgt, cfg)
        np.testing.assert_allclose(float(out.mse), 0.25 * 65536, rtol=1e-6)

    def test_valid_mask_denominator(self):
        """Masked pixels excluded from both numerator and denominator."""
        cfg = SmoeConfig(precision=8, margin=0.0, use_yuv=False,
                         num_channels=1)
        res = jnp.zeros((4, 1))
        tgt = jnp.asarray([[1.0], [1.0], [0.0], [0.0]])
        mask = jnp.asarray([True, True, False, False])
        out = L.pixel_loss(res, tgt, cfg, valid_mask=mask)
        np.testing.assert_allclose(float(out.loss_pixel), 1.0, rtol=1e-6)

    def test_loss_weights(self):
        cfg = SmoeConfig(precision=8, margin=0.0, use_yuv=False,
                         num_channels=1)
        res = jnp.zeros((2, 1))
        tgt = jnp.ones((2, 1))
        lw = jnp.asarray([1.0, 0.0])
        out = L.pixel_loss(res, tgt, cfg, loss_weights=lw)
        np.testing.assert_allclose(float(out.loss_pixel), 0.5, rtol=1e-6)


class TestSSIM:
    def test_identical_images(self, rng):
        img = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
        s = np.asarray(ssim_per_channel(jnp.asarray(img), jnp.asarray(img)))
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_matches_direct_gaussian_ssim(self, rng):
        """Separable implementation == dense 11x11 Gaussian reference."""
        from scipy.signal import convolve2d
        img1 = rng.uniform(0, 1, (32, 32, 1)).astype(np.float64)
        img2 = np.clip(img1 + rng.normal(0, 0.05, img1.shape), 0, 1)

        # dense reference
        coords = np.arange(11) - 5.0
        g1 = np.exp(-0.5 * coords ** 2 / 1.5 ** 2)
        g1 /= g1.sum()
        w = np.outer(g1, g1)

        def filt(x):
            return convolve2d(x, w[::-1, ::-1], mode="valid")

        c1, c2 = 0.01 ** 2, 0.03 ** 2
        x, y = img1[..., 0], img2[..., 0]
        ux, uy = filt(x), filt(y)
        num0 = 2 * ux * uy
        den0 = ux ** 2 + uy ** 2
        lum = (num0 + c1) / (den0 + c1)
        num1 = 2 * filt(x * y)
        den1 = filt(x * x + y * y)
        cs = (num1 - num0 + c2) / (den1 - den0 + c2)
        want = (lum * cs).mean()

        got = float(ssim_per_channel(jnp.asarray(img1, jnp.float32),
                                     jnp.asarray(img2, jnp.float32))[0])
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_loss_decreases_with_noise(self, rng):
        img = rng.uniform(0.2, 0.8, (24, 24, 3)).astype(np.float32)
        noisy1 = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
        noisy2 = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
        l1 = float(ssim_loss(jnp.asarray(noisy1, jnp.float32),
                             jnp.asarray(img), use_yuv=True))
        l2 = float(ssim_loss(jnp.asarray(noisy2, jnp.float32),
                             jnp.asarray(img), use_yuv=True))
        assert 0 < l1 < l2 < 1

    def test_3d_volume(self, rng):
        vol = rng.uniform(0, 1, (16, 16, 12, 1)).astype(np.float32)
        loss = float(ssim_loss(jnp.asarray(vol), jnp.asarray(vol),
                               use_yuv=False, ndim=3))
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)


class TestFakeQuant:
    def test_tf_nudging_semantics(self):
        """TF fake_quant nudging: min=-0.25, max=0.5, bits=2.

        scale=0.25, zero_point_from_min=1 (exact) -> nudged range
        [-0.25, 0.5], lattice {-0.25, 0, 0.25, 0.5}.
        """
        x = jnp.asarray([-0.4, -0.25, -0.1, 0.0, 0.13, 0.3, 0.5, 0.7])
        q = np.asarray(fake_quant(x, -0.25, 0.5, 2))
        want = [-0.25, -0.25, 0.0, 0.0, 0.25, 0.25, 0.5, 0.5]
        np.testing.assert_allclose(q, want, atol=1e-7)

    def test_quant_lattice_properties(self, rng):
        """Outputs lie on the nudged lattice; error <= scale/2 in-range."""
        x = rng.uniform(-1.5, 1.5, 200).astype(np.float32)
        mn, mx, bits = -0.63, 0.87, 6
        q = np.asarray(fake_quant(jnp.asarray(x), mn, mx, bits))
        scale = (mx - mn) / (2 ** bits - 1)
        # all outputs on the lattice (integer multiples of scale from nmin)
        steps = (q - q.min()) / scale
        np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)
        inside = (x > mn + scale) & (x < mx - scale)
        assert np.all(np.abs(q[inside] - x[inside]) <= scale / 2 + 1e-6)

    def test_zero_exactly_representable(self):
        q = float(fake_quant(jnp.asarray([0.0]), -0.13, 0.77, 8)[0])
        assert q == 0.0

    def test_ste_gradient_in_range(self):
        import jax
        g = jax.grad(lambda v: fake_quant(v, 0.0, 1.0, 8).sum())(
            jnp.asarray([0.5, 2.0]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.0])


class TestCodecRoundTrip:
    def _params(self, rng, k=20, d=2, c=3):
        return {
            "pis": np.concatenate([rng.uniform(0.01, 1, k - 5),
                                   np.zeros(5)]).astype(np.float32),
            "musX": rng.uniform(0, 1, (k, d)).astype(np.float32),
            "A_diagonal": (np.eye(d) * rng.uniform(5, 50, (k, 1, 1))
                           ).astype(np.float32),
            # only the strict lower triangle ever receives gradient
            "A_corr": np.tril(rng.normal(0, 3, (k, d, d)), -1
                              ).astype(np.float32),
            "nu_e": rng.uniform(0, 1, (k, c)).astype(np.float32),
            "gamma_e": rng.normal(0, 1, (k, d, c)).astype(np.float32),
        }

    def test_reduce_drops_dead(self, rng):
        from smoe_tpu.codec.quantize import reduce_params
        p = self._params(rng)
        red, idx = reduce_params(p)
        assert red["pis"].shape[0] == 15
        assert idx.sum() == 15

    def test_quantize_rescale_bounds(self, rng):
        """Dequantized values within half a step of originals (mode 0/1,
        data-derived bounds)."""
        cfg = SmoeConfig(dim_domain=2, num_channels=3, quantization_mode=1)
        p = self._params(rng)
        qp = quantize_params(p, cfg)
        rp = rescaler(qp, cfg)
        from smoe_tpu.codec.quantize import reduce_params
        red, _ = reduce_params(p)
        for name, bits in [("musX", 18), ("nu_e", 6), ("pis", 10),
                           ("gamma_e", 10)]:
            rng_span = red[name].max(0) - red[name].min(0)
            step = rng_span / (2 ** bits - 1)
            np.testing.assert_array_less(
                np.abs(rp[name] - red[name]),
                np.broadcast_to(step * 0.51 + 1e-9, rp[name].shape))
        # A reassembled from diag + corr
        want_A = red["A_diagonal"] + red["A_corr"]
        span = want_A.max(0) - want_A.min(0)
        step = span / (2 ** 20 - 1)
        np.testing.assert_array_less(np.abs(rp["A"] - want_A),
                                     np.broadcast_to(2 * step * 0.51 + 1e-9,
                                                     rp["A"].shape))

    def test_quantize_idempotent_bitexact(self, rng):
        """quantize(rescale(quantize(p))) == quantize(p): the dequantized
        reconstruction decodes bit-exactly (BASELINE requirement)."""
        cfg = SmoeConfig(dim_domain=2, num_channels=3, quantization_mode=1)
        p = self._params(rng)
        qp1 = quantize_params(p, cfg)
        rp = rescaler(qp1, cfg)
        # rebuild full-style params from rescaled and re-quantize
        p2 = {"pis": rp["pis"], "musX": rp["musX"],
              "A_diagonal": np.stack([np.diag(np.diag(a)) for a in rp["A"]]),
              "A_corr": np.stack([np.tril(a, -1) for a in rp["A"]]),
              "nu_e": rp["nu_e"], "gamma_e": rp["gamma_e"]}
        qp2 = quantize_params(p2, cfg)
        for key in ["pis", "musX", "nu_e", "gamma_e", "A_diagonal"]:
            np.testing.assert_allclose(qp1[key], qp2[key], atol=1.0)

    def test_canonicalize_steering(self, rng):
        """Column sign flips preserve A A^T exactly, make every diagonal
        entry positive, and survive quantize->rescale; the raw-sign path
        stays available via cfg (codec/quantize.canonicalize_steering)."""
        from smoe_tpu.codec.quantize import canonicalize_steering
        cfg = SmoeConfig(dim_domain=2, num_channels=3, quantization_mode=1)
        p = self._params(rng)
        # drive two kernels into the fragile negative-determinant state
        p["A_diagonal"][3, 1, 1] *= -1
        p["A_diagonal"][7, 0, 0] *= -1
        p["A_corr"][7, 1, 0] *= -1
        c = canonicalize_steering(p, cfg)
        for q in (p, c):                       # original left untouched?
            assert q["A_diagonal"].shape == p["A_diagonal"].shape
        assert p["A_diagonal"][3, 1, 1] < 0    # input not mutated
        A0 = np.tril(p["A_diagonal"] + p["A_corr"])
        A1 = np.tril(c["A_diagonal"] + c["A_corr"])
        np.testing.assert_allclose(A0 @ A0.swapaxes(1, 2),
                                   A1 @ A1.swapaxes(1, 2), rtol=1e-6)
        assert np.all(np.diagonal(c["A_diagonal"], axis1=1, axis2=2) > 0)
        # flows through quantize_params by default; rescaled A keeps the
        # canonical signs
        rp = rescaler(quantize_params(p, cfg), cfg)
        assert np.all(np.diagonal(rp["A"], axis1=1, axis2=2) > 0)
        # reference-faithful escape hatch
        cfg_raw = SmoeConfig(dim_domain=2, num_channels=3,
                             quantization_mode=1,
                             canonicalize_steering=False)
        rp_raw = rescaler(quantize_params(p, cfg_raw), cfg_raw)
        assert (np.diagonal(rp_raw["A"], axis1=1, axis2=2) < 0).sum() == 2
        # radial: |a|
        cfg_r = SmoeConfig(dim_domain=2, num_channels=3, radial_as=True)
        pr = {"pis": p["pis"], "musX": p["musX"], "nu_e": p["nu_e"],
              "gamma_e": p["gamma_e"],
              "A_diagonal": rng.uniform(-50, 50, 20).astype(np.float32),
              "A_corr": np.zeros((20, 2, 2), np.float32)}
        cr = canonicalize_steering(pr, cfg_r)
        assert np.all(cr["A_diagonal"] > 0)

    def test_fixed_bounds_mode2(self, rng):
        cfg = SmoeConfig(dim_domain=2, num_channels=3, quantization_mode=2,
                         quantize_pis=True)
        p = self._params(rng)
        qp = quantize_params(p, cfg)
        assert np.all(qp["lower_bounds"]["musX"] == cfg.lower_bounds[1])
        rp = rescaler(qp, cfg)
        assert rp["pis"].shape == qp["pis"].shape

    def test_rate_bits(self, rng):
        cfg = SmoeConfig(dim_domain=2, num_channels=3)
        p = self._params(rng)
        qp = quantize_params(p, cfg)
        bits = rate_bits(qp, cfg)
        # 15 active kernels x (20*3 + 18*2 + 6*3 + 10 + 10*6) bits
        assert bits == 15 * (60 + 36 + 18 + 10 + 60)


class TestDiffCenterCodec:
    def test_diff_center_quantize_decode_roundtrip(self, toy_rgb):
        """use_diff_center stores musX as offsets; the decoder must re-add
        the grid (reference quantizer.py:140-141,
        smoe_reconstruction_decoded.py:34)."""
        import jax.numpy as jnp
        from smoe_tpu.fit.trainer import Smoe
        from smoe_tpu.codec.quantize import quantize_params, rescaler

        s = Smoe(toy_rgb, kernels_per_dim=[4], use_diff_center=True)
        s.set_optimizer()
        for _ in range(10):
            s.run_batched(train=True)
        # musX params are offsets (small); effective centers near the grid
        off = np.abs(np.asarray(s.params.musX)).max()
        assert off < 0.2

        s.qparams = quantize_params(s.get_params(), s.cfg)
        grid = np.asarray(s.musX_grid)[np.asarray(
            s.qparams["used_kernels"])]
        s.rparams = rescaler(s.qparams, s.cfg, musX_grid=grid)
        # dequantized centers live near the grid positions, not near 0
        assert np.all(s.rparams["musX"] >= -0.2)
        assert np.all(s.rparams["musX"] <= 1.2)

        l, m, *_ = s.run_batched(train=False, update_reconstruction=True)
        ql, qm, *_ = s.run_batched(train=False, update_reconstruction=True,
                                   with_quantized_params=True)
        # 18-bit musX / 20-bit A quantization: near-lossless decode
        assert abs(qm - m) / m < 0.05


class TestAutoAllocation:
    """codec/alloc.search_bit_depths: the per-fit transparency knee,
    measured through the real quantized decode (round 4 — allocation
    knees are fit-dependent, so the encoder searches instead of trusting
    a hand-picked -lean/-ulean/-lslean table)."""

    def _fit(self, toy_rgb, iters=40):
        from smoe_tpu.fit.trainer import Smoe
        s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
        s.set_optimizer()
        s.run_batched_chunk(iters)
        return s

    def test_search_properties(self, toy_rgb):
        from smoe_tpu.codec.alloc import search_bit_depths, START
        s = self._fit(toy_rgb)
        bd, p_at, p_ref = search_bit_depths(s, tol_db=0.1)
        assert all(b <= s0 for b, s0 in zip(bd, START))
        assert all(b >= 4 for b in bd)
        assert p_at >= p_ref - 0.1 - 1e-6
        # a short Adam fit keeps tiny slopes: gamma must compress far
        # below its generous 14-bit start
        assert bd[4] <= 10, bd
        # the trainer's qparams are left at the CHOSEN allocation
        assert s.qparams is not None

    def test_cli_auto_bd(self, toy_rgb, tmp_path):
        import os
        from smoe_tpu.codec.container import save_model
        from smoe_tpu.cli.reconstruct import main as rec_main
        from smoe_tpu.io.images import write_image

        s = self._fit(toy_rgb)
        img_path = write_image(toy_rgb, str(tmp_path / "img"), 2, yuv=False)
        pkl = str(tmp_path / "p.pkl")
        save_model(pkl, s.get_params(), s.cfg, musX_grid=s.musX_grid)
        out = str(tmp_path / "rec")
        rec_main(["-i", img_path, "-p", pkl, "-r", out,
                  "--auto-bd", "0.1"])
        assert os.path.exists(os.path.join(out, "model.smoe"))

    def test_choose_anchors_picks_measured_max(self, toy_rgb):
        """The anchor search's contract: it returns (and sets on cfg) the
        candidate with the maximum MEASURED quantized-decode PSNR — the
        per-fit selection that round 4 showed is necessary (nuanchor
        +3.4 dB on the lsri video fit, −3.1 dB on an lsinit-only fit)."""
        import numpy as np
        from smoe_tpu.codec.alloc import choose_anchors, _quantized_psnr
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True,
                 bit_depths=(20, 18, 6, 10, 10))
        rng = np.random.default_rng(0)
        k, d = np.asarray(s.params.musX).shape
        c = np.asarray(s.params.nu_e).shape[-1]
        gam = rng.uniform(-2, 2, (k, d, c)).astype(np.float32)
        v_center = rng.uniform(0.2, 0.8, (k, c)).astype(np.float32)
        nu = v_center - np.einsum("kd,kdc->kc", np.asarray(s.params.musX),
                                  gam)
        s.params = s.params.replace(nu_e=np.asarray(nu, np.float32),
                                    gamma_e=gam)
        s.valid = False
        cands = {}
        for nu_a, g_a in ((False, False), (True, False), (True, True),
                          (False, True)):
            s.cfg = s.cfg.replace(nu_anchor=nu_a, gamma_anchor=g_a)
            cands[(nu_a, g_a)] = _quantized_psnr(s, s.cfg.bit_depths)
        nu_a, g_a, p = choose_anchors(s)
        best = max(cands, key=cands.get)
        assert (nu_a, g_a) == best, (cands, nu_a, g_a)
        assert abs(p - cands[best]) < 1e-6
        assert s.cfg.nu_anchor is nu_a and s.cfg.gamma_anchor is g_a


class TestQuantizedEvalExactPath:
    def test_quantized_eval_routes_to_exact_xla(self, toy_rgb):
        """Codec measurement must be decode-exact: with_quantized_params
        evals route through the XLA forward (Precision.HIGHEST), never the
        fused Pallas kernel whose MXU dots truncate f32 inputs to bf16
        (measured 14 dB off on a dequantized 4D LF fit, 7 dB on dual-model
        video — TPU, round 4)."""
        from smoe_tpu.codec.quantize import quantize_params, rescaler
        from smoe_tpu.fit.trainer import Smoe

        # use_pallas='on' so the light (float) eval WOULD take the fused
        # path — the quantized eval must not
        s = Smoe(toy_rgb, kernels_per_dim=[4], use_pallas="on",
                 bit_depths=(20, 18, 6, 10, 10))
        s.qparams = quantize_params(s.get_params(), s.cfg,
                                    musX_grid=s.musX_grid)
        s.rparams = rescaler(s.qparams, s.cfg, None)
        _, qmse, _, _ = s.run_batched(train=False,
                                      with_quantized_params=True)
        assert hasattr(s._compiled, "_eval_fn_exact")
        assert not hasattr(s._compiled, "_eval_fn_light")
        # and the float light eval still uses (and caches) the fused path
        s.run_batched(train=False)
        assert hasattr(s._compiled, "_eval_fn_light")
        # exact quantized eval == the with_rec (XLA) eval, bit-for-bit
        _, qmse_rec, _, _ = s.run_batched(train=False,
                                          update_reconstruction=True,
                                          with_quantized_params=True)
        assert qmse == qmse_rec

    def test_search_consistent_with_final_decode_dual_model_video(self):
        """The invariant the round-4 TPU bug violated: the search's
        reported PSNR at the chosen depths must equal an independent
        re-eval at those depths on the dual-model video path (the fused
        eval had read ~7 dB off the real decode, mis-ranking every
        candidate)."""
        import numpy as np
        from smoe_tpu.codec.alloc import search_bit_depths, _quantized_psnr
        from smoe_tpu.fit.trainer import Smoe

        rng = np.random.default_rng(0)
        base = rng.uniform(0.2, 0.8, (12, 12, 3)).astype(np.float32)
        vid = np.stack([np.roll(base, i, axis=1) for i in range(3)], axis=2)
        aff = np.zeros((3, 2, 3), np.float32)
        aff[:, 0, 0] = aff[:, 1, 1] = 1.0
        aff[:, 0, 2] = -np.arange(3)
        s = Smoe(vid, kernels_per_dim=[2, 2, 2], affines=aff, init_flag=1,
                 quantize_pis=True)
        s.set_optimizer()
        s.run_batched_chunk(20)
        assert s.model_mask is not None          # dual-model path engaged
        bd, p_at, _ = search_bit_depths(s, tol_db=0.2)
        p_again = _quantized_psnr(s, bd)
        assert abs(p_at - p_again) < 1e-5, (bd, p_at, p_again)
