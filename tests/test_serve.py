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
