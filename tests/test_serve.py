"""Lean serving decoder (codec/serve.py): parity with the trainer's
q-reconstruction and one-call bitstream decode."""

import numpy as np
import pytest

from smoe_tpu.codec.quantize import quantize_params, rescaler
from smoe_tpu.codec.serve import (decode_bitstream, make_decoder,
                                  pad_decoded_params)
from smoe_tpu.fit.trainer import Smoe


@pytest.fixture(scope="module")
def fitted():
    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.stack([.5 + .3 * np.sin(5 * x), .5 + .3 * np.cos(4 * y),
                    .4 + .2 * np.sin(3 * (x + y))], -1).astype(np.float32)
    s = Smoe(img, kernels_per_dim=[4], quantize_pis=True)
    s.set_optimizer()
    s.run_batched_chunk(30)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    s.rparams = rescaler(s.qparams, s.cfg)
    # decoder semantics: evaluate all active kernels (no survivor lists)
    import jax.numpy as jnp
    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    return img, s


def test_serve_matches_trainer_qreconstruction(fitted):
    img, s = fitted
    rec_ref = s.get_qreconstruction()

    rp = s.rparams
    d, c = s.cfg.dim_domain, img.shape[-1]
    k = int(np.asarray(rp["pis"]).shape[0])
    padded = pad_decoded_params(rp, k, d, c)
    dec = make_decoder(img.shape[:d], c, s.cfg, k)
    rec = np.asarray(dec(padded["A"], padded["musX"], padded["nu_e"],
                         padded["gamma_e"], padded["pis"]))
    assert rec.shape == rec_ref.shape
    np.testing.assert_allclose(rec, rec_ref, atol=1e-6)


def test_serve_capacity_padding_invariant(fitted):
    """Padding dead slots must not change the decoded image beyond f32
    reduction-order noise."""
    img, s = fitted
    rp = s.rparams
    d, c = s.cfg.dim_domain, img.shape[-1]
    k = int(np.asarray(rp["pis"]).shape[0])
    recs = []
    for cap in (k, 128, 256):
        padded = pad_decoded_params(rp, cap, d, c)
        dec = make_decoder(img.shape[:d], c, s.cfg, cap)
        recs.append(np.asarray(dec(padded["A"], padded["musX"],
                                   padded["nu_e"], padded["gamma_e"],
                                   padded["pis"])))
    np.testing.assert_allclose(recs[0], recs[1], atol=1e-6)
    np.testing.assert_allclose(recs[1], recs[2], atol=1e-6)


def test_serve_video_with_motion_and_dual_model(tmp_path):
    """Video decodes from the bitstream alone: trained motion params and
    the dual-model domain assignment travel in the header (beyond the
    reference, whose decoded path is image-only)."""
    from smoe_tpu.codec.bitstream import write_bitstream
    from smoe_tpu.core.quant import apply_qat

    rng = np.random.default_rng(0)
    h = w = 16
    t = 4
    y, x = np.mgrid[0:h, 0:w] / (h - 1)
    frames = []
    affines = []
    for i in range(t):
        dx = 0.08 * i
        frames.append(0.5 + 0.3 * np.sin(6 * (x + dx)) * np.cos(4 * y))
        affines.append(np.array([[1, 0, -dx * (w - 1)], [0, 1, 0]],
                                np.float32))
    vid = np.stack(frames, axis=2).astype(np.float32)[..., None]
    vid = np.clip(vid, 0, 1)

    s = Smoe(vid, kernels_per_dim=[3, 3, 2], use_yuv=False,
             affines=np.stack(affines), quantize_pis=True)
    s.set_optimizer()
    s.run_batched_chunk(15)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    s.rparams = rescaler(s.qparams, s.cfg)
    # decoder semantics = evaluate ALL active kernels (the reference's
    # decode re-initializes fresh kernel lists, not the trained survivor
    # lists; serve skips lists entirely)
    import jax.numpy as jnp
    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    rec_ref = s.get_qreconstruction()

    used = np.asarray(s.qparams["used_kernels"], bool)
    path = str(tmp_path / "v.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(vid.shape[:3]),
        "dim_of_output": [1],
        "use_yuv": False,
        "use_determinant": bool(s.cfg.use_determinant),
        "motion": np.asarray(apply_qat(s.params, s.cfg).motion).tolist(),
        "num_params_model": int(s.cfg.num_params_model),
        "num_frames": int(s.cfg.num_frames),
        "model_mask": np.asarray(s.model_mask)[used].astype(int).tolist(),
    })
    rec = decode_bitstream(path)
    assert rec.shape == rec_ref.shape
    np.testing.assert_allclose(rec, rec_ref, atol=1e-6)

    # scaled video decode: spatial dims at 2x, frame axis untouched (the
    # motion transform + frame indexing live on the t coordinate)
    rec2 = decode_bitstream(path, scale=2.0)
    assert rec2.shape == (2 * h, 2 * w, t, 1)
    assert np.isfinite(rec2).all()
    # roi: a spatial window of every frame
    rec_r = decode_bitstream(path, roi=((4, 12), (2, 10)))
    np.testing.assert_allclose(rec_r, rec[4:12, 2:10], atol=1e-5)
    # frames: random access to a frame range at native t coordinates
    # (the motion transform needs the TRUE t value per frame)
    rec_f = decode_bitstream(path, frames=(1, 3))
    np.testing.assert_allclose(rec_f, rec[:, :, 1:3], atol=1e-5)
    # multi-chip serving: motion transform + dual-model routing ride the
    # sharded chunks unchanged (both are per-pixel, params replicated)
    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    rec_m = decode_bitstream(path, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(rec_m), np.asarray(rec))


def test_decode_bitstream_diff_center_beyond_grid(tmp_path):
    """use_diff_center + a used kernel BEYOND the init grid (what an inc
    splice produces): such slots carry their full center with grid offset
    0 (trainer zero-pads musX_grid to capacity).  The serving decoder
    must apply the same convention instead of indexing the bare grid with
    out-of-range slot indices."""
    import jax.numpy as jnp
    from smoe_tpu.codec.bitstream import write_bitstream

    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.clip(.5 + .25 * np.sin(6 * x) * np.cos(5 * y)
                  + .1 * (x > .5), 0, 1).astype(np.float32)[..., None]

    s = Smoe(img, kernels_per_dim=[3], use_yuv=False, use_diff_center=True,
             add_kernel_slots=18, quantize_pis=True)
    s.set_optimizer()
    for _ in range(5):
        s.run_batched(train=True)

    # enliven slot 12 — beyond the 9-row 3x3 grid, like an inc insertion:
    # its params.musX holds the FULL center (grid offset 0 by convention)
    p = s.params
    grid_rows = 9
    slot = 12
    assert slot >= grid_rows
    musX = np.asarray(p.musX).copy()
    musX[slot] = [0.7, 0.3]
    pis = np.asarray(p.pis).copy()
    pis[slot] = float(pis[:9].mean())
    a_diag = np.asarray(p.a_diag).copy()
    a_diag[slot] = 8.0 * np.eye(2, dtype=np.float32)
    nu_e = np.asarray(p.nu_e).copy()
    nu_e[slot] = 0.6
    s.params = p.replace(musX=jnp.asarray(musX), pis=jnp.asarray(pis),
                         a_diag=jnp.asarray(a_diag),
                         nu_e=jnp.asarray(nu_e))

    s.qparams = quantize_params(s.get_params(), s.cfg)
    used = np.asarray(s.qparams["used_kernels"], bool)
    assert np.flatnonzero(used).max() >= grid_rows
    s.rparams = rescaler(s.qparams, s.cfg,
                         musX_grid=np.asarray(s.musX_grid)[used])
    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    rec_ref = s.get_qreconstruction()

    path = str(tmp_path / "dc.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(img.shape[:2]),
        "dim_of_output": [1],
        "use_yuv": False,
        "use_determinant": bool(s.cfg.use_determinant),
    })
    rec = decode_bitstream(path)
    np.testing.assert_allclose(rec, rec_ref, atol=1e-6)


def test_decode_bitstream_inverse_cov(tmp_path):
    """train_inverse_cov travels in the bitstream header: the maha form is
    x^T (D+L+L^T) x, not |A^T x|^2, and decoding with the wrong form would
    silently mis-reconstruct."""
    import jax.numpy as jnp
    from smoe_tpu.codec.bitstream import write_bitstream

    y, x = np.mgrid[0:32, 0:32] / 31.0
    img = np.clip(.5 + .3 * np.sin(6 * x) * np.cos(4 * y), 0,
                  1).astype(np.float32)[..., None]
    s = Smoe(img, kernels_per_dim=[4], use_yuv=False,
             train_inverse_cov=True, quantize_pis=True)
    s.set_optimizer()
    s.run_batched_chunk(20)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    s.rparams = rescaler(s.qparams, s.cfg)
    s.kernel_lists = jnp.ones_like(s.kernel_lists)
    rec_ref = s.get_qreconstruction()

    path = str(tmp_path / "ic.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(img.shape[:2]),
        "dim_of_output": [1],
        "use_yuv": False,
        "use_determinant": bool(s.cfg.use_determinant),
    })
    rec = decode_bitstream(path)
    np.testing.assert_allclose(rec, rec_ref, atol=1e-6)


def test_decode_bitstream_one_call(fitted, tmp_path):
    img, s = fitted
    from smoe_tpu.codec.bitstream import write_bitstream
    path = str(tmp_path / "m.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(img.shape[:2]),
        "dim_of_output": [img.shape[-1]],
        "use_yuv": bool(s.cfg.use_yuv),
        "use_determinant": bool(s.cfg.use_determinant),
    })
    rec = decode_bitstream(path)
    rec_ref = s.get_qreconstruction()
    np.testing.assert_allclose(rec, rec_ref, atol=1e-6)


def test_serve_lf_view_navigation(tmp_path):
    """4D LF: decode a single view (views=) and a view window, exact vs
    the corresponding slice of the full decode."""
    rng = np.random.default_rng(2)
    u = np.linspace(0, 1, 15)[:, None, None, None]
    v = np.linspace(0, 1, 15)[None, :, None, None]
    yy = np.linspace(0, 1, 6)[None, None, :, None]
    xx = np.linspace(0, 1, 6)[None, None, None, :]
    lf = 0.5 + 0.2 * np.sin(3 * (yy + 0.2 * u)) * np.cos(4 * (xx + v))
    lf = np.clip(np.broadcast_to(lf, (15, 15, 6, 6))
                 + rng.normal(0, 0.01, (15, 15, 6, 6)), 0, 1
                 ).astype(np.float32)[..., None]
    s = Smoe(lf, kernels_per_dim=[2, 2, 2, 2], use_yuv=False)
    s.set_optimizer()
    s.run_batched_chunk(10)
    s.qparams = quantize_params(s.get_params(), s.cfg)
    from smoe_tpu.codec.bitstream import write_bitstream
    path = str(tmp_path / "lf.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(lf.shape[:4]), "dim_of_output": [1],
        "use_yuv": False, "use_determinant": bool(s.cfg.use_determinant)})
    full = decode_bitstream(path)
    one = decode_bitstream(path, views=((1, 2), (3, 4)))
    np.testing.assert_allclose(one, full[1:2, 3:4], atol=1e-5)
    win = decode_bitstream(path, views=((0, 3), (2, 5)))
    np.testing.assert_allclose(win, full[0:3, 2:5], atol=1e-5)


def test_decode_bitstream_scaled(fitted, tmp_path):
    """Resolution-free decode: the continuous model rendered at 2x must
    agree with the 1x decode at the SHARED sample points (the [0,1]
    raster i/(N-1) hits the same coords at stride 2 when the 2x raster
    has 2N-1 points), and out_shape= names an explicit raster."""
    img, s = fitted
    from smoe_tpu.codec.bitstream import write_bitstream
    path = str(tmp_path / "m.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(img.shape[:2]),
        "dim_of_output": [img.shape[-1]],
        "use_yuv": bool(s.cfg.use_yuv),
        "use_determinant": bool(s.cfg.use_determinant),
    })
    rec1 = decode_bitstream(path)
    n = img.shape[0]
    rec2 = decode_bitstream(path, out_shape=(2 * n - 1, 2 * n - 1))
    assert rec2.shape == (2 * n - 1, 2 * n - 1, img.shape[-1])
    np.testing.assert_allclose(rec2[::2, ::2], rec1, atol=1e-5)
    # scale= derives the raster (identity at 1.0)
    rec_s = decode_bitstream(path, scale=1.0)
    np.testing.assert_allclose(rec_s, rec1, atol=1e-6)
    assert decode_bitstream(path, scale=2.0).shape == \
        (2 * n, 2 * n, img.shape[-1])
    # roi= renders exactly the native crop (and composes with scale)
    rec_roi = decode_bitstream(path, roi=((8, 24), (4, 20)))
    np.testing.assert_allclose(rec_roi, rec1[8:24, 4:20], atol=1e-5)
    assert decode_bitstream(path, roi=((8, 24), (4, 20)), scale=2.0).shape \
        == (32, 32, img.shape[-1])


def test_decode_bitstream_mesh_multichip(fitted, tmp_path):
    """Multi-chip serving: mesh= shard_maps the pixel-chunk axis over the
    devices (params replicated, no collectives) — output bit-identical
    to the single-device decode.  Also exercises a non-dividing chunk
    count (padding rounds up to chunks x devices)."""
    import jax
    from jax.sharding import Mesh

    img, s = fitted
    from smoe_tpu.codec.bitstream import write_bitstream
    path = str(tmp_path / "m.smoe")
    write_bitstream(path, s.qparams, s.cfg, extra={
        "shape_of_img": list(img.shape[:2]),
        "dim_of_output": [img.shape[-1]],
        "use_yuv": bool(s.cfg.use_yuv),
        "use_determinant": bool(s.cfg.use_determinant),
    })
    ref = decode_bitstream(path, chunk_pixels=256)
    for ndev in (8, 3):           # 32x32 = 4 chunks of 256: pads to 8 / 6
        mesh = Mesh(np.array(jax.devices()[:ndev]), ("x",))
        rec = decode_bitstream(path, chunk_pixels=256, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(rec), np.asarray(ref),
                                      err_msg=f"ndev={ndev}")
