"""End-to-end CLI drives: fit -> reconstruct (pickle + .smoe bitstream) ->
decode-from-bitstream, with bit-exact decode parity
(reference smoe_test.py / smoe_reconstruction.py /
smoe_reconstruction_decoded.py)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    """Small fit via the CLI; returns (img_path, results_dir)."""
    root = tmp_path_factory.mktemp("cli")
    img_path = str(root / "img.png")
    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.stack([0.5 + 0.3 * np.sin(5 * x),
                    0.5 + 0.3 * np.cos(4 * y),
                    0.4 + 0.2 * np.sin(3 * (x + y))], -1)
    cv2.imwrite(img_path, np.uint8(img * 255))

    res = str(root / "fit")
    from smoe_tpu.cli.fit import main as fit_main
    smoe = fit_main(["-i", img_path, "-r", res, "-n", "60", "-k", "4",
                     "-v", "30"])
    assert os.path.exists(os.path.join(res, "params_best.pkl"))
    assert smoe.get_best_mse() is not None
    return img_path, res


def test_fit_then_reconstruct(fitted, tmp_path):
    img_path, res = fitted
    from smoe_tpu.cli.reconstruct import main as rec_main
    out = str(tmp_path / "rec")
    rec = rec_main(["-i", img_path, "-p",
                    os.path.join(res, "params_last.pkl"), "-r", out])
    assert rec is not None
    assert os.path.exists(os.path.join(out, "output.png"))
    assert os.path.exists(os.path.join(out, "qparams.pkl"))
    assert os.path.exists(os.path.join(out, "model.smoe"))


def test_decode_matches_reconstruct(fitted, tmp_path):
    """Decode from pickle and from the entropy-coded bitstream must produce
    the SAME image as the encoder-side quantized reconstruction."""
    img_path, res = fitted
    from smoe_tpu.cli.reconstruct import main as rec_main
    from smoe_tpu.cli.decode import main as dec_main

    out = str(tmp_path / "rec2")
    rec = rec_main(["-i", img_path, "-p",
                    os.path.join(res, "params_last.pkl"), "-r", out])

    dec_pkl = dec_main(["-p", os.path.join(out, "qparams.pkl"),
                        "-r", str(tmp_path / "dpkl")])
    np.testing.assert_allclose(dec_pkl, rec, atol=1e-6,
                               err_msg="pickle decode != encoder recon")

    dec_bs = dec_main(["-p", os.path.join(out, "model.smoe"),
                       "-r", str(tmp_path / "dbs")])
    np.testing.assert_allclose(dec_bs, rec, atol=1e-6,
                               err_msg="bitstream decode != encoder recon")


def test_default_automatic_encode_beats_hand_table(fitted, tmp_path):
    """Round-5 default (VERDICT r4 #6): a flag-less `reconstruct` runs the
    composed automatic encode (--auto-bd 0.05 --prune 0), and it must not
    lose to the reference-depth hand encode of the same fit: coded rate
    strictly lower at ~unchanged decoded quality (auto-bd accepts depth
    reductions only while the measured decode stays within tolerance of
    the generous allocation, which itself is >= the reference depths on
    every group)."""
    img_path, res = fitted
    from smoe_tpu.cli.reconstruct import main as rec_main
    from smoe_tpu.io.images import read_image

    orig, precision, _ = read_image(img_path, use_yuv=True)
    arms = {}
    for name, extra in (("auto", []), ("ref", ["--ref"])):
        out = str(tmp_path / name)
        rec = np.asarray(rec_main(["-i", img_path, "-p",
                                   os.path.join(res, "params_last.pkl"),
                                   "-r", out] + extra))
        mse = float(np.mean((rec.reshape(orig.shape) - orig) ** 2))
        arms[name] = (os.path.getsize(os.path.join(out, "model.smoe")),
                      10 * np.log10(1.0 / max(mse, 1e-12)))
    assert arms["auto"][0] < arms["ref"][0], \
        f"auto coded {arms['auto'][0]} B >= ref {arms['ref'][0]} B"
    # tolerance: auto-bd tol (0.05) + prune tol (0) + quantization noise
    # on this tiny fixture fit
    assert arms["auto"][1] >= arms["ref"][1] - 0.3, \
        f"auto {arms['auto'][1]:.2f} dB << ref {arms['ref'][1]:.2f} dB"


def test_prune_reconstruct(fitted, tmp_path):
    """--prune 0 keeps the smallest mass-ordered kernel prefix whose
    decoded PSNR ties the best candidate (the full set is always a
    candidate, so quality never drops); the written bitstream and its
    decode carry the pruned model."""
    img_path, res = fitted
    from smoe_tpu.cli.decode import main as dec_main
    from smoe_tpu.cli.reconstruct import main as rec_main
    from smoe_tpu.codec.bitstream import read_bitstream

    base = str(tmp_path / "full")
    rec_full = rec_main(["-i", img_path, "-p",
                         os.path.join(res, "params_last.pkl"), "-r", base,
                         "--ref"])
    k_full = int(np.count_nonzero(np.asarray(read_bitstream(
        os.path.join(base, "model.smoe"))[0]["used_kernels"], bool)))

    out = str(tmp_path / "pruned")
    rec_pr = rec_main(["-i", img_path, "-p",
                       os.path.join(res, "params_last.pkl"), "-r", out,
                       "--prune", "0"])
    qp, _ = read_bitstream(os.path.join(out, "model.smoe"))
    k_pr = int(np.count_nonzero(np.asarray(qp["used_kernels"], bool)))
    assert 1 <= k_pr <= k_full

    orig = cv2.imread(img_path).astype(np.float64) / 255.0
    def mse(r):
        return np.mean((np.asarray(r, np.float64) - orig) ** 2)
    # tol 0: pruned decode is >= full-model quality by construction
    assert mse(rec_pr) <= mse(rec_full) + 1e-12
    # the bitstream decodes the pruned model identically
    dec = dec_main(["-p", os.path.join(out, "model.smoe"),
                    "-r", str(tmp_path / "dec")])
    np.testing.assert_allclose(dec, rec_pr, atol=1e-6)


def test_prune_composes_with_layers(fitted, tmp_path):
    """--prune then --layers: the layered file carries the pruned model
    (full decode == pruned reconstruction) and tier prefixes decode."""
    img_path, res = fitted
    from smoe_tpu.cli.reconstruct import main as rec_main
    from smoe_tpu.codec.serve import decode_bitstream

    out = str(tmp_path / "pl")
    rec = rec_main(["-i", img_path, "-p",
                    os.path.join(res, "params_last.pkl"), "-r", out,
                    "--prune", "0", "--layers", "2"])
    lay = os.path.join(out, "model.smoe")
    np.testing.assert_allclose(decode_bitstream(lay), rec, atol=1e-6)
    low = decode_bitstream(lay, layers=1)
    assert low.shape == np.asarray(rec).shape


def test_prune_bpp_rate_control(fitted, tmp_path, capsys):
    """--prune-bpp: encoder-side rate control — every candidate is
    entropy-encoded for its REAL payload size and the best-PSNR one
    under the budget wins; the written file's coded rate fits it."""
    import re

    img_path, res = fitted
    from smoe_tpu.cli.decode import main as dec_main
    from smoe_tpu.cli.reconstruct import main as rec_main
    from smoe_tpu.codec.bitstream import read_bitstream

    def coded_bits_of(out_dir):
        txt = capsys.readouterr().out
        return int(re.search(r"rate: (\d+) bits coded", txt).group(1))

    base = str(tmp_path / "full")
    rec_main(["-i", img_path, "-p",
              os.path.join(res, "params_last.pkl"), "-r", base, "--ref"])
    full_bits = coded_bits_of(base)
    k_full = int(np.count_nonzero(np.asarray(read_bitstream(
        os.path.join(base, "model.smoe"))[0]["used_kernels"], bool)))

    orig = cv2.imread(img_path)
    n_pix = orig.shape[0] * orig.shape[1]
    budget_bpp = 0.5 * full_bits / n_pix
    out = str(tmp_path / "rate")
    rec_pr = rec_main(["-i", img_path, "-p",
                       os.path.join(res, "params_last.pkl"), "-r", out,
                       "--prune-bpp", f"{budget_bpp:.6f}"])
    pr_bits = coded_bits_of(out)
    assert pr_bits <= int(budget_bpp * n_pix)
    qp, _ = read_bitstream(os.path.join(out, "model.smoe"))
    assert int(np.count_nonzero(np.asarray(qp["used_kernels"],
                                           bool))) < k_full
    dec = dec_main(["-p", os.path.join(out, "model.smoe"),
                    "-r", str(tmp_path / "dec")])
    np.testing.assert_allclose(dec, rec_pr, atol=1e-6)


def test_subset_qparams_roundtrip(fitted, tmp_path):
    """subset_qparams keeps row integers and slot alignment: a subset's
    decode equals the full decode restricted to the kept kernels'
    contributions (bounds unchanged; kept rows bit-identical)."""
    img_path, res = fitted
    from smoe_tpu.codec.container import load_model
    from smoe_tpu.codec.quantize import quantize_params, subset_qparams
    from smoe_tpu.config import SmoeConfig

    cp = load_model(os.path.join(res, "params_last.pkl"))
    cfg = SmoeConfig(kernels_per_dim=tuple(int(v) for v in
                                           np.ravel(cp["kernels_per_dim"])))
    q = quantize_params(cp["params"], cfg)
    k = int(np.count_nonzero(np.asarray(q["used_kernels"], bool)))
    keep = np.zeros(k, bool)
    keep[::2] = True
    sub = subset_qparams(q, keep)
    assert int(np.count_nonzero(sub["used_kernels"])) == int(keep.sum())
    full_slots = np.flatnonzero(np.asarray(q["used_kernels"], bool))
    np.testing.assert_array_equal(
        np.flatnonzero(sub["used_kernels"]), full_slots[keep])
    np.testing.assert_array_equal(np.asarray(sub["pis"]),
                                  np.asarray(q["pis"])[keep])
    np.testing.assert_array_equal(np.asarray(sub["musX"]),
                                  np.asarray(q["musX"])[keep])


def test_params_reload_preserves_correlations():
    """Rebuilding a model from a saved params dict must keep the strict-lower
    steering entries (the reference zeroes A_corr_var on reload,
    smoe.py:431-437 — documented deviation)."""
    import jax.numpy as jnp
    from smoe_tpu.core.init import init_params
    from smoe_tpu.core.params import assemble_A
    from smoe_tpu.config import SmoeConfig

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (8, 8, 1)).astype(np.float32)
    cfg = SmoeConfig(dim_domain=2, num_channels=1, kernels_per_dim=(2, 2),
                     use_yuv=False)
    k = 4
    A_dg = np.tile(np.diag([6.0, 6.0]).astype(np.float32)[None], (k, 1, 1))
    A_cr = np.zeros((k, 2, 2), np.float32)
    A_cr[:, 1, 0] = 1.5
    init = {"musX": np.full((k, 2), 0.5, np.float32),
            "A_diagonal": A_dg, "A_corr": A_cr,
            "nu_e": np.full((k, 1), 0.5, np.float32),
            "gamma_e": np.zeros((k, 2, 1), np.float32),
            "pis": np.full((k,), 0.25, np.float32)}
    p = init_params(img, cfg, init)
    A = np.asarray(assemble_A(
        type(p)(*(jnp.asarray(getattr(p, f)) if getattr(p, f) is not None
                  else None for f in p.FIELDS)), cfg))
    np.testing.assert_allclose(A[:, 1, 0], 1.5)
    np.testing.assert_allclose(A[:, 0, 0], 6.0)


def test_video_fit_cli_npz(tmp_path):
    """Video path through the CLI: .npz with per-frame affines drives the
    dual-model init + per-time-slab reseed loop (reference
    smoe_test.py:123-207)."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (8, 8, 3)).astype(np.float32)
    t = 3
    imgs = np.stack([np.roll(base, i, axis=1) for i in range(t)], axis=0)
    imgs = np.uint8(imgs * 255)
    affines = np.zeros((t, 2, 3), np.float32)
    affines[:, 0, 0] = 1.0
    affines[:, 1, 1] = 1.0
    affines[:, 0, 2] = -np.arange(t, dtype=np.float32)
    npz_path = str(tmp_path / "vid.npz")
    np.savez(npz_path, imgs=imgs, affines=affines)

    from smoe_tpu.cli.fit import main as fit_main
    res = str(tmp_path / "out")
    smoe = fit_main(["-i", npz_path, "-r", res, "-n", "10", "-v", "5",
                     "-k", "2", "-ri", "2", "-yuv", "false"])
    assert smoe.model_mask is not None          # dual model active
    assert smoe.params.motion is not None       # affine-driven motion
    assert os.path.exists(os.path.join(res, "params_best.pkl"))
    assert np.isfinite(smoe.get_losses()[-1][1])


def test_video_fit_cli_lsri_reseeds(tmp_path):
    """-lsri threads through the video reseed retrains (and inc trains):
    every phase runs the periodic LS expert refresh, matching -lsinit's
    per-phase solve semantics (beyond reference; fit/lsinit.py)."""
    rng = np.random.default_rng(1)
    base = rng.uniform(0.2, 0.8, (8, 8, 3)).astype(np.float32)
    t = 3
    imgs = np.uint8(np.stack([np.roll(base, i, axis=1)
                              for i in range(t)], axis=0) * 255)
    affines = np.zeros((t, 2, 3), np.float32)
    affines[:, 0, 0] = affines[:, 1, 1] = 1.0
    affines[:, 0, 2] = -np.arange(t, dtype=np.float32)
    npz_path = str(tmp_path / "vid.npz")
    np.savez(npz_path, imgs=imgs, affines=affines)

    from smoe_tpu.cli.fit import main as fit_main
    res = str(tmp_path / "out")
    smoe = fit_main(["-i", npz_path, "-r", res, "-n", "10", "-v", "5",
                     "-k", "2", "-ri", "4", "-yuv", "false",
                     "-lsinit", "kernel", "-lsri", "2"])
    assert smoe.model_mask is not None
    assert np.isfinite(smoe.get_losses()[-1][1])


def test_inc_steps_cli(fitted, tmp_path):
    """Incremental kernel insertion through the CLI (-is): error-map peaks
    -> inc block training -> splice (reference smoe_test.py:221-245)."""
    img_path, _ = fitted
    from smoe_tpu.cli.fit import main as fit_main
    res = str(tmp_path / "inc")
    smoe = fit_main(["-i", img_path, "-r", res, "-n", "20", "-v", "10",
                     "-k", "3", "-is", "1", "-ni", "10", "-na", "10"])
    # capacity was extended by add_kernel_slots and kernels were spliced in
    assert smoe.cfg.add_kernel_slots == 9
    assert smoe.kernel_count > 9
    assert np.isfinite(smoe.get_losses()[-1][1])


def test_diff_center_save_reconstruct_roundtrip(tmp_path):
    """use_diff_center models must reconstruct exactly from the pickle:
    the container stores the grid rows of the used kernels so reload can
    rebuild effective centers (the reference reloads the saved DIFFS as
    the grid, smoe.py:254 + :392, collapsing all centers)."""
    import jax.numpy as jnp
    from smoe_tpu import Smoe
    from smoe_tpu.codec.container import load_model, save_model

    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.clip(0.5 + 0.3 * np.sin(6 * x) * np.cos(5 * y), 0,
                  1).astype(np.float32)[..., None]
    s = Smoe(img, kernels_per_dim=[4], use_yuv=False, use_diff_center=True)
    s.set_optimizer()
    s.run_batched_chunk(30)
    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    _, mse_ref, *_ = s.run_batched(train=False, update_reconstruction=True)
    rec_ref = s.get_reconstruction()

    path = str(tmp_path / "dc.pkl")
    save_model(path, s.get_params(), s.cfg, musX_grid=s.musX_grid)
    cp = load_model(path)
    assert "musX_grid" in cp

    s2 = Smoe(img, init_params_dict=cp["params"], use_yuv=False,
              use_diff_center=True, kernels_per_dim=[4],
              musX_grid_init=cp["musX_grid"])
    _, mse2, *_ = s2.run_batched(train=False, update_reconstruction=True)
    np.testing.assert_allclose(np.asarray(s2.get_reconstruction()),
                               np.asarray(rec_ref), atol=1e-6)
    np.testing.assert_allclose(mse2, mse_ref, rtol=1e-5)


def test_video_motion_reload_from_pickle(tmp_path):
    """A video model's per-frame motion rows (h11..h32) saved by
    get_params must be restored on reload so the transformed domain (and
    thus the reconstruction) matches the trained model."""
    from smoe_tpu import Smoe
    from smoe_tpu.codec.container import load_model, save_model

    rng = np.random.default_rng(0)
    h = w = 16
    t = 3
    y, x = np.mgrid[0:h, 0:w] / (h - 1)
    frames, affines = [], []
    for i in range(t):
        dx = 0.1 * i
        frames.append(0.5 + 0.3 * np.sin(6 * (x + dx)) * np.cos(4 * y))
        affines.append(np.array([[1, 0, -dx * (w - 1)], [0, 1, 0]],
                                np.float32))
    vid = np.clip(np.stack(frames, 2), 0, 1).astype(np.float32)[..., None]

    s = Smoe(vid, kernels_per_dim=[3, 3, 2], use_yuv=False,
             affines=np.stack(affines))
    s.set_optimizer()
    s.run_batched_chunk(10)
    import jax.numpy as jnp
    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    _, mse_ref, *_ = s.run_batched(train=False, update_reconstruction=True)
    rec_ref = s.get_reconstruction()

    path = str(tmp_path / "vid.pkl")
    save_model(path, s.get_params(), s.cfg)
    cp = load_model(path)
    assert "h11" in cp["params"] and "num_params_model" in cp

    s2 = Smoe(vid, init_params_dict=cp["params"], use_yuv=False,
              num_params_model=int(cp["num_params_model"]),
              num_frames=int(cp["num_frames"]),
              dual_model=bool(np.asarray(cp["params"]["pis"]).shape[0]
                              and s.cfg.dual_model))
    # dual-model assignment travels separately; rebuild it like decode does
    if s.model_mask is not None:
        used = np.asarray(s.get_params()["pis"]) > 0
        mm = np.asarray(s.model_mask)[used]
        pad = s2.params.capacity - mm.shape[0]
        s2.model_mask = jnp.asarray(np.concatenate(
            [mm, np.ones((pad,), bool)]))
    # decoder semantics: evaluate all active kernels (motion kernels live
    # on the t=-5 plane, raw-domain list init would miss them)
    s2.kernel_lists = jnp.ones_like(s2.kernel_lists)
    _, mse2, *_ = s2.run_batched(train=False, update_reconstruction=True)
    # capacity padding differs between the two builds, so f32 reduction
    # order can flip isolated pixels across an output fake-quant boundary:
    # allow one 8-bit quantization step
    np.testing.assert_allclose(np.asarray(s2.get_reconstruction()),
                               np.asarray(rec_ref), atol=1.01 / 255)


def test_hpc_mode_resume(tmp_path):
    """HPC job-array flow (reference smoe_test.py:112-116, 329-333): job 1
    runs the base fit + exactly ONE inc step, a later job restores the
    checkpoint with --current_inc_step to continue where it left off."""
    import cv2 as _cv2

    img_path = str(tmp_path / "img.png")
    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.stack([0.5 + 0.3 * np.sin(5 * x),
                    0.5 + 0.3 * np.cos(4 * y),
                    0.4 + 0.2 * np.sin(3 * (x + y))], -1)
    _cv2.imwrite(img_path, np.uint8(img * 255))

    from smoe_tpu.cli.fit import main as fit_main
    res1 = str(tmp_path / "job1")
    s1 = fit_main(["-i", img_path, "-r", res1, "-n", "100", "-k", "3",
                   "-v", "50", "-is", "2", "-ni", "5", "-na", "5",
                   "-hpc", "true"])   # 100 iters: ModelLogger checkpoints
                                      # every 100 (reference logger.py:45)
    # hpc base job: NO inc step runs (reference smoe_test.py:221 condition
    # `hpc_mode and iterations == 0 or not hpc_mode`)
    assert s1.kernel_count == 9
    ckpts = sorted(os.listdir(os.path.join(res1, "checkpoints")))
    assert ckpts, "ModelLogger must have written a resumable checkpoint"
    ckpt = os.path.join(res1, "checkpoints", ckpts[-1])

    # job 2: -n 0 + checkpoint -> exactly ONE inc step, then stop
    res2 = str(tmp_path / "job2")
    s2 = fit_main(["-i", img_path, "-r", res2, "-n", "0", "-k", "3",
                   "-v", "10", "-is", "2", "-ni", "5", "-na", "5",
                   "-hpc", "true", "-cis", "1", "-c", ckpt])
    assert s2.kernel_count == 9 + s2.num_inc_kernels
    ckpts2 = sorted(os.listdir(os.path.join(res2, "checkpoints")))
    ckpt2 = os.path.join(res2, "checkpoints", ckpts2[-1])

    # job 3: resume at inc step 2 (kernel_count offset by cis-1 blocks)
    res3 = str(tmp_path / "job3")
    s3 = fit_main(["-i", img_path, "-r", res3, "-n", "0", "-k", "3",
                   "-v", "10", "-is", "2", "-ni", "5", "-na", "5",
                   "-hpc", "true", "-cis", "2", "-c", ckpt2])
    assert s3.kernel_count == 9 + 2 * s3.num_inc_kernels
    assert np.isfinite(s3.losses[-1][1])


def test_checkpoint_resume_and_orfc(fitted, tmp_path):
    """Plain -c resume continues training from the full state (with pi
    re-normalization, reference smoe_test.py:99-107), and
    --only_rec_from_checkpoint writes the reconstruction and stops."""
    img_path, _ = fitted
    from smoe_tpu.cli.fit import main as fit_main

    res1 = str(tmp_path / "base")
    s1 = fit_main(["-i", img_path, "-r", res1, "-n", "100", "-k", "3",
                   "-v", "50"])
    ckpt = os.path.join(res1, "checkpoints", "100.pkl")
    assert os.path.exists(ckpt)
    mse1 = s1.get_mses()[-1][1]

    # resume + train further: loss picks up from the checkpoint state
    res2 = str(tmp_path / "resume")
    s2 = fit_main(["-i", img_path, "-r", res2, "-n", "20", "-k", "3",
                   "-v", "10", "-c", ckpt])
    assert s2.iter >= 100 + 20        # iteration counter carried over
    assert s2.get_mses()[-1][1] <= mse1 * 1.5

    # reconstruction-only run
    res3 = str(tmp_path / "orfc")
    s3 = fit_main(["-i", img_path, "-r", res3, "-n", "20", "-k", "3",
                   "-c", ckpt, "-orfc", "true"])
    assert os.path.exists(os.path.join(res3, "reconstruction.png"))
    # no training happened
    assert s3.iter == s2.iter - 20


def test_lean_bits_preset(fitted, tmp_path):
    """-lean overrides the reference bit depths with the measured lean
    allocation A10/mu12/nu8/pi10/g8 (round-3 RD study: -28% coded bits at
    equal-or-better decoded PSNR) and the .smoe file decodes bit-exactly."""
    img_path, _ = fitted
    res = str(tmp_path / "lean")
    from smoe_tpu.cli.fit import main as fit_main
    smoe = fit_main(["-i", img_path, "-r", res, "-n", "20", "-k", "4",
                     "-v", "10", "-qm", "1", "-lean", "1"])
    assert tuple(smoe.cfg.bit_depths) == (10, 12, 8, 10, 8)
    smoe_file = os.path.join(res, "model_last.smoe")
    assert os.path.exists(smoe_file)
    from smoe_tpu.codec.bitstream import read_bitstream
    q, header = read_bitstream(smoe_file)
    assert list(header["bit_depths"]) == [10, 12, 8, 10, 8]
    for name in ("A_diagonal", "musX", "nu_e", "pis", "gamma_e"):
        if name in q and name in smoe.qparams:
            np.testing.assert_array_equal(
                np.asarray(q[name]), np.asarray(smoe.qparams[name]),
                err_msg=f"bitstream roundtrip mismatch for {name}")


def test_video_pickle_roundtrip_with_reseeds(tmp_path):
    """A reseeded video pickle carries MORE live kernels than the grid
    capacity and a dual-model mask; reconstruct must rebuild both (round
    3: capacity stayed at the grid size -> IndexError, and the mask was
    never persisted, silently decoding every kernel on the transformed
    domain)."""
    import jax.numpy as jnp
    from smoe_tpu import Smoe
    from smoe_tpu.codec.container import load_model, save_model

    h = w = 16
    t = 4
    y, x = np.mgrid[0:h, 0:w] / (h - 1)
    frames, affines = [], []
    for i in range(t):
        dx = 0.08 * i
        frames.append(0.5 + 0.3 * np.sin(6 * (x + dx)) * np.cos(4 * y))
        affines.append(np.array([[1, 0, -dx * (w - 1)], [0, 1, 0]],
                                np.float32))
    vid = np.clip(np.stack(frames, 2), 0, 1).astype(np.float32)[..., None]

    s = Smoe(vid, kernels_per_dim=[3, 3, 2], use_yuv=False,
             affines=np.stack(affines), normalize_pis=False)
    s.set_optimizer()
    s.run_batched_chunk(6)
    s.reseed_time_slab(0, rng=0)     # activates spare raw-domain kernels
    s.run_batched_chunk(6)
    live = int(np.sum(np.asarray(s.get_params()["pis"]) > 0))

    path = str(tmp_path / "vid.pkl")
    save_model(path, s.get_params(), s.cfg, model_mask=s.model_mask)
    cp = load_model(path)
    assert "model_mask" in cp and cp["params"]["pis"].shape[0] == live

    s2 = Smoe(vid, init_params_dict=cp["params"], use_yuv=False,
              kernels_per_dim=[3, 3, 2],
              num_params_model=int(cp["num_params_model"]),
              num_frames=int(cp["num_frames"]),
              model_mask_init=cp["model_mask"])
    assert s2.cfg.capacity >= live          # the round-3 IndexError case
    assert s2.model_mask is not None

    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    _, mse_ref, *_ = s.run_batched(train=False, update_reconstruction=True)
    s2.kernel_lists = jnp.ones_like(s2.kernel_lists)
    _, mse2, *_ = s2.run_batched(train=False, update_reconstruction=True)
    np.testing.assert_allclose(np.asarray(s2.get_reconstruction()),
                               np.asarray(s.get_reconstruction()),
                               atol=1.01 / 255)


def test_video_reconstruct_lean_recode(tmp_path):
    """Re-coding a fitted VIDEO model with the lean allocation through
    cli/reconstruct must shrink the coded rate at ~unchanged decode error
    (the round-3 measurement workflow: 30.29 dB @1.76bpp -> 30.28 @1.12
    on the k=28 CIF fit; the lean win grows with dimension because the
    20-bit A fields, d(d+1)/2 per kernel, dominate at d>=3)."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (8, 8, 3)).astype(np.float32)
    t = 3
    imgs = np.stack([np.roll(base, i, axis=1) for i in range(t)], axis=0)
    affines = np.zeros((t, 2, 3), np.float32)
    affines[:, 0, 0] = affines[:, 1, 1] = 1.0
    affines[:, 0, 2] = -np.arange(t, dtype=np.float32)
    npz_path = str(tmp_path / "vid.npz")
    np.savez(npz_path, imgs=np.uint8(imgs * 255), affines=affines)

    from smoe_tpu.cli.fit import main as fit_main
    from smoe_tpu.cli.reconstruct import main as rec_main
    res = str(tmp_path / "out")
    fit_main(["-i", npz_path, "-r", res, "-n", "20", "-v", "10",
              "-k", "2", "-ri", "2", "-yuv", "false", "-qm", "1",
              "-np", "0"])
    pkl = os.path.join(res, "params_best.pkl")

    sizes, mses = {}, {}
    for name, extra in (("ref", ["--ref"]), ("lean", ["-lean", "1"])):
        out = str(tmp_path / f"rec_{name}")
        rec_main(["-i", npz_path, "-p", pkl, "-r", out] + extra)
        sizes[name] = os.path.getsize(os.path.join(out, "model.smoe"))
        from smoe_tpu.codec.serve import decode_bitstream
        vol = np.asarray(decode_bitstream(os.path.join(out, "model.smoe")))
        target = np.moveaxis(imgs, 0, 2)
        mses[name] = float(np.mean(
            (vol.reshape(target.shape) - target) ** 2)) * 255 ** 2

    assert sizes["lean"] < sizes["ref"]
    # lean is transparent on converged fits; on this tiny fit allow the
    # quantization-noise floor to move a little either way
    assert mses["lean"] < max(1.5 * mses["ref"], mses["ref"] + 30.0)


def test_ulean_bits_preset(fitted, tmp_path):
    """-ulean overrides the depths with the ultra-lean allocation
    A8/mu10/nu8/pi10/g6 — the per-group transparency knee measured on
    converged 2D/3D/4D fits (round 3: −41/−51/−57% coded bits vs the
    reference depths at ≤0.03 dB; one step lower in any group costs
    0.2–2.6 dB)."""
    img_path, _ = fitted
    res = str(tmp_path / "ulean")
    from smoe_tpu.cli.fit import main as fit_main
    smoe = fit_main(["-i", img_path, "-r", res, "-n", "20", "-k", "4",
                     "-v", "10", "-qm", "1", "-ulean", "1"])
    assert tuple(smoe.cfg.bit_depths) == (8, 10, 8, 10, 6)
    smoe_file = os.path.join(res, "model_last.smoe")
    from smoe_tpu.codec.bitstream import read_bitstream
    q, header = read_bitstream(smoe_file)
    assert list(header["bit_depths"]) == [8, 10, 8, 10, 6]
    for name in ("A_diagonal", "musX", "nu_e", "pis", "gamma_e"):
        if name in q and name in smoe.qparams:
            np.testing.assert_array_equal(
                np.asarray(q[name]), np.asarray(smoe.qparams[name]),
                err_msg=f"bitstream roundtrip mismatch for {name}")


def test_info_cli(fitted, tmp_path, capsys):
    """cli.info prints container metadata (header-only for flat files,
    tier table for layered ones, per-group bits with --breakdown)."""
    img_path, res = fitted
    from smoe_tpu.cli.info import main as info_main
    from smoe_tpu.cli.reconstruct import main as rec_main

    flat = str(tmp_path / "flat")
    rec_main(["-i", img_path, "-p",
              os.path.join(res, "params_last.pkl"), "-r", flat])
    lay = str(tmp_path / "lay")
    rec_main(["-i", img_path, "-p",
              os.path.join(res, "params_last.pkl"), "-r", lay,
              "--layers", "2"])
    capsys.readouterr()

    h = info_main([os.path.join(flat, "model.smoe"), "--breakdown"])
    out = capsys.readouterr().out
    assert "container      v3" in out
    assert "payload bits" in out and "bpp" in out
    assert "breakdown" in out and "musX" in out and "total" in out
    assert h["num_kernels"] >= 1

    info_main([os.path.join(lay, "model.smoe")])
    out = capsys.readouterr().out
    assert "layered" in out
    assert "tier 1" in out and "tier 2" in out and "cum_bpp" in out


def test_lsri_rejects_negative(tmp_path):
    from smoe_tpu.cli.fit import build_parser
    import pytest
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-i", "x", "-r", "y", "-lsri", "-5"])


def test_lsrip_initial_restricts_refresh(tmp_path, monkeypatch):
    """-lsrip initial: the periodic LS refresh runs in the FIRST train
    phase only; reseed retrains see ls_refresh_iter=None (the video
    recipe's measured-negative mode keeps the reseed phases' Adam
    trajectories unperturbed, ROADMAP 6b''')."""
    rng = np.random.default_rng(1)
    base = rng.uniform(0.2, 0.8, (8, 8, 3)).astype(np.float32)
    t = 3
    imgs = np.uint8(np.stack([np.roll(base, i, axis=1)
                              for i in range(t)], axis=0) * 255)
    affines = np.zeros((t, 2, 3), np.float32)
    affines[:, 0, 0] = affines[:, 1, 1] = 1.0
    affines[:, 0, 2] = -np.arange(t, dtype=np.float32)
    npz_path = str(tmp_path / "vid.npz")
    np.savez(npz_path, imgs=imgs, affines=affines)

    from smoe_tpu.fit.trainer import Smoe
    seen = []
    orig_train = Smoe.train

    def spy(self, *a, **kw):
        seen.append(kw.get("ls_refresh_iter"))
        return orig_train(self, *a, **kw)

    monkeypatch.setattr(Smoe, "train", spy)
    from smoe_tpu.cli.fit import main as fit_main
    res = str(tmp_path / "out")
    fit_main(["-i", npz_path, "-r", res, "-n", "10", "-v", "5",
              "-k", "2", "-ri", "4", "-yuv", "false",
              "-lsinit", "kernel", "-lsri", "2", "-lsrip", "initial"])
    assert seen[0] == 2                      # initial fit refreshes
    assert len(seen) > 1                     # reseed retrains happened
    assert all(v is None for v in seen[1:])  # ...without the refresh


def test_lsrs_stops_refresh_mid_initial_fit(tmp_path, monkeypatch):
    """-lsrs N: the initial fit splits into a refreshing phase of N iters
    and a refresh-free settling remainder (round-5 A/B lever for the
    lsri-initial trajectory question, VERDICT r4 #5)."""
    rng = np.random.default_rng(1)
    img = np.uint8(rng.uniform(0.2, 0.8, (16, 16, 3)) * 255)
    import cv2
    img_path = str(tmp_path / "img.png")
    cv2.imwrite(img_path, img)

    from smoe_tpu.fit.trainer import Smoe
    seen = []
    orig_train = Smoe.train

    def spy(self, n, *a, **kw):
        seen.append((n, kw.get("ls_refresh_iter")))
        return orig_train(self, n, *a, **kw)

    monkeypatch.setattr(Smoe, "train", spy)
    from smoe_tpu.cli.fit import main as fit_main
    fit_main(["-i", img_path, "-r", str(tmp_path / "out"), "-n", "10",
              "-v", "5", "-k", "2", "-lsinit", "kernel", "-lsri", "2",
              "-lsrs", "6"])
    assert seen == [(6, 2), (4, None)]


def test_reconstruct_estimate_batches():
    """cli/reconstruct sizes its first eval attempt from the decoder's
    memory heuristic (cli/decode.py:98-109): small models keep the user
    default, video-scale models (8192 kernels x 811k pixels — the round-5
    compile-OOM case) are split before the first compile."""
    from smoe_tpu.cli.reconstruct import estimate_batches
    # small image, small K: user default untouched
    assert estimate_batches(256 * 256, 144, 1) == 1
    # the measured OOM geometry gets a power-of-two split > 1
    b = estimate_batches(288 * 352 * 8, 8192, 1)
    assert b > 1 and (b & (b - 1)) == 0
    # per-block footprint fits the 2 GB budget after the split
    assert (288 * 352 * 8 / b) * 8192 * 4 * 6 <= (2 << 30)
    # an explicit user -b wins when larger than the estimate
    assert estimate_batches(64, 4, 8) == 8
