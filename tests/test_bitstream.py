"""Entropy-coded bitstream: C++/Python bit-exactness, round trips, and the
real-rate-vs-proxy relationship."""

import numpy as np
import pytest

from smoe_tpu.codec import bitstream as bs
from smoe_tpu.codec.quantize import quantize_params, rate_bits, rescaler
from smoe_tpu.config import SmoeConfig


def _symbols(n=500, seed=0):
    rng = np.random.default_rng(seed)
    nbits = rng.integers(1, 21, n).astype(np.uint8)
    group = rng.integers(0, 5, n).astype(np.uint8)
    # biased values (mostly small) so the coder can compress
    vals = np.minimum(
        rng.geometric(0.3, n) - 1,
        (1 << nbits.astype(np.uint32)) - 1).astype(np.uint32)
    return vals, nbits, group


def test_python_roundtrip():
    vals, nbits, group = _symbols()
    data = bs._py_encode(vals, nbits, group)
    out = bs._py_decode(data, nbits, group)
    np.testing.assert_array_equal(out, vals)


def test_native_matches_python():
    lib = bs.load_native()
    if lib is None:
        pytest.skip("no C++ toolchain")
    vals, nbits, group = _symbols(seed=3)
    py = bs._py_encode(vals, nbits, group)
    nat = bs.encode_symbols(vals, nbits, group)
    assert nat == py, "C++ and Python encoders must be bit-exact"
    out = bs.decode_symbols(nat, nbits, group)
    np.testing.assert_array_equal(out, vals)


def test_biased_stream_compresses_below_raw():
    vals, nbits, group = _symbols(n=4000, seed=7)
    data = bs.encode_symbols(vals, nbits, group)
    raw_bits = int(np.sum(nbits))
    assert len(data) * 8 < raw_bits


def test_container_roundtrip(tmp_path, toy_rgb):
    from smoe_tpu.fit.trainer import Smoe

    s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
    s.set_optimizer()
    for _ in range(10):
        s.run_batched(train=True)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "model.smoe")
    nbits_payload = bs.write_bitstream(path, q, s.cfg)
    q2, header = bs.read_bitstream(path)

    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q[name]).round(), np.asarray(q2[name]),
            err_msg=f"{name} mismatch after bitstream roundtrip")
    np.testing.assert_array_equal(q["used_kernels"], q2["used_kernels"])

    # dequantized params identical -> decode is bit-exact through the file
    r1 = rescaler(q, s.cfg)
    r2 = rescaler(q2, s.cfg)
    for k in r1:
        np.testing.assert_allclose(r1[k], r2[k], rtol=0, atol=1e-12)

    # tiny 16-kernel stream: adaptive-coder warmup dominates, so only bound
    # the overhead; at production K the payload lands at/below the proxy
    # (test_biased_stream_compresses_below_raw covers the win)
    assert nbits_payload < rate_bits(q, s.cfg) * 1.5 + 512


def test_out_of_range_qm2_values_roundtrip(tmp_path, toy_rgb):
    """Fixed-bound (QM2) quantization never clips in the reference
    (quantizer.py:58-77), so quantized integers can fall outside
    [0, 2^b); the bitstream must carry them losslessly via the `ranges`
    header instead of clipping."""
    from smoe_tpu.fit.trainer import Smoe

    s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
    q = quantize_params(s.get_params(), s.cfg)
    # force out-of-range integers like a below-lower-bound / above-upper-
    # bound trained param would produce
    q["musX"] = np.asarray(q["musX"], np.float64).copy()
    q["musX"][0, 0] = -7.0
    q["nu_e"] = np.asarray(q["nu_e"], np.float64).copy()
    q["nu_e"][1, 0] = float((1 << s.cfg.bit_depths[2]) + 5)

    path = str(tmp_path / "oor.smoe")
    bs.write_bitstream(path, q, s.cfg)
    q2, header = bs.read_bitstream(path)
    assert "ranges" in header and "musX" in header["ranges"]
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q[name]).round(), np.asarray(q2[name]),
            err_msg=f"{name} mismatch after out-of-range roundtrip")


def test_grid_mode_width_overflow_guarded(tmp_path, toy_rgb):
    """ADVICE r2 (medium): a ranges-shifted musX stream whose 'grid'
    residuals are computed against unshifted 0..steps predictions can
    exceed the shifted width+1; before the candidate-fit guard the range
    coder silently dropped the high bits and the file decoded WRONG.

    Construction: most used kernels sit exactly on low grid slots
    (residual == the tiny shift -> grid wins the magnitude estimate), one
    kernel drifted below the lower bound (forcing the shift) while owning
    a high grid slot (its residual overflows the declared width)."""
    from smoe_tpu.core.init import kernel_centers
    from smoe_tpu.fit.trainer import Smoe

    s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
    q = quantize_params(s.get_params(), s.cfg)
    steps = int(q["steps"]["musX"])
    grid = kernel_centers((4, 4), 2)              # (16, 2)

    # bounds [0, 1]: quantized grid slot = round(g * steps)
    q["lower_bounds"]["musX"] = np.zeros(2)
    q["upper_bounds"]["musX"] = np.ones(2)
    keep = [0, 1, 4, 5, 15]                       # low slots + one high slot
    used = np.zeros(16, bool)
    used[keep] = True
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        q[name] = np.asarray(q[name])[keep]
    q["used_kernels"] = used
    pred = np.round(grid[keep] * steps)
    q["musX"] = pred.astype(np.float64)           # on-slot: residual = shift
    q["musX"][-1] = [-7.0, -7.0]                  # drifted below lb -> shift

    path = str(tmp_path / "overflow.smoe")
    bs.write_bitstream(path, q, s.cfg)
    q2, header = bs.read_bitstream(path)
    # the overflowing 'grid' candidate must have been rejected...
    assert header["modes"]["musX"] != "grid"
    assert "musX" in header.get("ranges", {})
    # ...and the decode must be EXACT (silent truncation decoded wrong)
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q[name]).round(), np.asarray(q2[name]),
            err_msg=f"{name} mismatch after overflow-guard roundtrip")


def test_interkernel_prediction_beats_proxy(tmp_path):
    """At production kernel counts the predicted+entropy-coded rate must be
    meaningfully below the raw-bits proxy at identical decoded values
    (VERDICT r1 #5)."""
    from smoe_tpu.fit.trainer import Smoe
    y, x = np.mgrid[0:64, 0:64] / 63.0
    img = np.stack([.5 + .3 * np.sin(7 * x) * np.cos(5 * y),
                    .5 + .25 * np.cos(6 * (x + y)),
                    .4 + .3 * np.sin(4 * x * y)], -1).astype(np.float32)
    s = Smoe(img, kernels_per_dim=[12], quantize_pis=True)
    s.set_optimizer()
    s.run_batched_chunk(60)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "model.smoe")
    bits = bs.write_bitstream(path, q, s.cfg)
    q2, header = bs.read_bitstream(path)
    # prediction engaged on the spatially-correlated streams...
    assert header["modes"]["musX"] in ("grid", "delta")
    assert any(m != "raw" for m in header["modes"].values())
    # ...decoded exactly...
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(np.asarray(q[name]).round(),
                                      np.asarray(q2[name]), err_msg=name)
    # ...and at least 3% below the raw proxy
    assert bits < rate_bits(q, s.cfg) * 0.97


def test_nbr_mode_spatial_prediction_roundtrip(tmp_path, toy_rgb):
    """The 'nbr' mode (VERDICT r2 #3) predicts per-kernel streams from the
    causally-nearest kernel by DECODED musX.  Kernel rows are SHUFFLED out
    of raster order and values made smooth over POSITION, so raster-delta
    residuals are large while spatial-neighbor residuals are tiny — nbr
    must win the magnitude estimate and the file must decode exactly."""
    from smoe_tpu.fit.trainer import Smoe

    rng = np.random.default_rng(5)
    s = Smoe(toy_rgb, kernels_per_dim=[8], quantize_pis=True)
    q = quantize_params(s.get_params(), s.cfg)
    K = np.asarray(q["musX"]).shape[0]
    perm = rng.permutation(K)
    steps_mus = int(q["steps"]["musX"])
    # shuffled 8x8 grid positions in [0.1, 0.9]^2
    g = (np.stack(np.meshgrid(np.arange(8), np.arange(8),
                              indexing="ij"), -1).reshape(-1, 2)
         / 7.0 * 0.8 + 0.1)[perm]
    q["lower_bounds"]["musX"] = np.zeros(2)
    q["upper_bounds"]["musX"] = np.ones(2)
    q["musX"] = np.round(g * steps_mus).astype(np.float64)
    # nu LOCALLY smooth over position but globally wide: spatial-neighbor
    # residuals (~400 * grid spacing) are far below the const-median
    # spread (~±360), while raster-adjacent rows (shuffled) jump wildly
    nu = np.asarray(q["nu_e"], np.float64)
    q["nu_e"] = np.round(np.stack([400 * (g[:, 0] + g[:, 1])] * nu.shape[1],
                                  axis=1))

    path = str(tmp_path / "nbr.smoe")
    bs.write_bitstream(path, q, s.cfg)
    q2, header = bs.read_bitstream(path)
    assert header["modes"]["nu_e"] == "nbr"
    assert header["order"][0] == "musX"       # positions decode first
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q[name]).round(), np.asarray(q2[name]),
            err_msg=f"{name} mismatch after nbr roundtrip")


def test_corrupt_payload_crc_rejected(tmp_path, toy_rgb):
    """A bit-flip in the range-coded payload raises a clear error
    instead of silently decoding garbage (payload_crc32, v3.2)."""
    from smoe_tpu.codec.bitstream import read_bitstream, write_bitstream
    from smoe_tpu.fit.trainer import Smoe
    s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
    s.set_optimizer()
    s.run_batched_chunk(5)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "m.smoe")
    write_bitstream(path, q, s.cfg)
    read_bitstream(path)                     # intact file decodes
    blob = bytearray(open(path, "rb").read())
    blob[-3] ^= 0x10                         # flip one payload bit
    bad = str(tmp_path / "bad.smoe")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="CRC"):
        read_bitstream(bad)


def test_fuzz_symbol_roundtrip():
    """Randomized symbol streams (1..20-bit, all context groups) encode ->
    decode exactly, native and Python coders agreeing bit for bit."""
    lib = bs.load_native()
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        n = int(rng.integers(1, 1200))
        nbits = rng.integers(1, 21, n).astype(np.uint8)
        group = rng.integers(0, 5, n).astype(np.uint8)
        vals = (rng.integers(0, 1 << 20, n).astype(np.uint32)
                & ((1 << nbits.astype(np.uint32)) - 1))
        data = bs.encode_symbols(vals, nbits, group)
        out = bs.decode_symbols(data, nbits, group)
        np.testing.assert_array_equal(out, vals, err_msg=f"seed {seed}")
        if lib is not None:
            assert bs._py_encode(vals, nbits, group) == data, f"seed {seed}"


def test_fuzz_bitstream_roundtrip(tmp_path):
    """Randomized quantized-parameter dicts (kernel counts, bit depths,
    out-of-range values, radial / non-radial) survive the full container
    round trip exactly."""
    from smoe_tpu.config import SmoeConfig

    for seed in range(6):
        rng = np.random.default_rng(200 + seed)
        k = int(rng.integers(2, 40))
        d = 2
        radial = bool(rng.integers(0, 2))
        bd = [int(b) for b in rng.integers(2, 21, 5)]
        cfg = SmoeConfig(dim_domain=d, num_channels=3,
                         kernels_per_dim=(max(2, int(np.sqrt(k))),) * d,
                         bit_depths=tuple(bd), radial_as=radial)
        steps = {n: (1 << bd[i]) - 1 for i, n in enumerate(
            ["A", "musX", "nu_e", "pis", "gamma_e"])}

        def qvals(name, shape, step):
            v = rng.integers(0, step + 1, shape).astype(np.float64)
            if rng.random() < 0.3:      # sprinkle out-of-range (QM2 case)
                v.flat[0] = -float(rng.integers(1, 50))
                v.flat[-1] = float(step + rng.integers(1, 50))
            return v

        used = np.zeros((k + 5,), bool)
        used[rng.choice(k + 5, k, replace=False)] = True
        q = {
            "A_diagonal": qvals("A", (k,) if radial else (k, 3),
                                steps["A"]),
            "musX": qvals("musX", (k, d), steps["musX"]),
            "nu_e": qvals("nu_e", (k, 3), steps["nu_e"]),
            "pis": qvals("pis", (k,), steps["pis"]),
            "gamma_e": qvals("gamma_e", (k, d * 3), steps["gamma_e"]),
            "steps": steps,
            "lower_bounds": {n: np.full((1,), -0.5) for n in steps},
            "upper_bounds": {n: np.full((1,), 1.5) for n in steps},
            "used_kernels": used,
        }
        if not radial:
            q["A_corr"] = qvals("A", (k, 3), steps["A"])
        path = str(tmp_path / f"fuzz{seed}.smoe")
        bs.write_bitstream(path, q, cfg)
        q2, _ = bs.read_bitstream(path)
        for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis",
                     "gamma_e"):
            if name not in q:
                continue
            np.testing.assert_array_equal(
                np.asarray(q[name]).round(), np.asarray(q2[name]),
                err_msg=f"seed {seed} {name}")
        np.testing.assert_array_equal(q["used_kernels"], q2["used_kernels"])


@pytest.mark.parametrize("bad_width", [200, 288, 0, -3])
def test_corrupt_header_width_rejected(tmp_path, toy_rgb, bad_width):
    """A corrupt header claiming out-of-range symbol widths must raise a
    clear error, not overrun the coder's per-group context rows (288 also
    guards the uint8-wrap case: 288 % 256 == 32 would sneak past a
    post-cast check)."""
    import json
    import struct

    from smoe_tpu.fit.trainer import Smoe

    s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "c.smoe")
    bs.write_bitstream(path, q, s.cfg)
    data = open(path, "rb").read()
    hlen = struct.unpack("<I", data[4:8])[0]
    import zlib
    header = json.loads(zlib.decompress(data[8:8 + hlen]).decode())
    header["bit_depths"] = [bad_width, 18, 6, 10, 10]    # corrupt width
    # write the tampered header as plain JSON — readers accept both forms
    hjson = json.dumps(header).encode()
    open(path, "wb").write(data[:4] + struct.pack("<I", len(hjson))
                           + hjson + data[8 + hlen:])
    with pytest.raises(ValueError, match="width"):
        bs.read_bitstream(path)


# ---------------------------------------------------------------------------
# Layered (SNR-scalable, v4) bitstreams


def _fit_toy(toy_rgb, iters=10, **kw):
    from smoe_tpu.fit.trainer import Smoe

    s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True, **kw)
    s.set_optimizer()
    s.run_batched_chunk(iters)
    return s


def test_layered_full_decode_bit_exact(tmp_path, toy_rgb):
    """A full decode of a layered file returns EXACTLY the qparams of the
    same model written without layers (rows re-sorted to raster slot
    order), so layering costs nothing but the per-tier header/coder
    overhead."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    # exercise the ranges path through the layered writer too
    q["musX"] = np.asarray(q["musX"], np.float64).copy()
    q["musX"][0, 0] = -5.0
    flat = str(tmp_path / "flat.smoe")
    lay = str(tmp_path / "lay.smoe")
    bits_flat = bs.write_bitstream(flat, q, s.cfg)
    bits_lay = bs.write_bitstream(lay, q, s.cfg, layers=3)
    q1, _ = bs.read_bitstream(flat)
    q2, h2 = bs.read_bitstream(lay)
    assert len(h2["layers"]) == 3
    assert sum(lh["num_kernels"] for lh in h2["layers"]) \
        == h2["num_kernels"]
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q1[name]), np.asarray(q2[name]),
            err_msg=f"{name} differs between layered and flat decode")
    np.testing.assert_array_equal(q1["used_kernels"], q2["used_kernels"])
    # 3 independent adaptive coders re-learn their contexts: small
    # overhead, not a blow-up
    assert bits_lay < bits_flat * 1.6 + 1024


def test_layered_prefix_decode(tmp_path, toy_rgb):
    """Decoding m < L tiers yields a self-consistent sub-model: fewer
    kernels, used_kernels the union of the decoded tier bitmaps, and
    rescaler/serve work unchanged."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=3,
                       extra={"shape_of_img": list(toy_rgb.shape[:-1]),
                              "dim_of_output": toy_rgb.shape[-1],
                              "use_yuv": s.cfg.use_yuv,
                              "use_determinant": s.cfg.use_determinant})
    ks, used_prev = [], None
    for m in (1, 2, 3):
        qm, hm = bs.read_bitstream(path, max_layers=m)
        k = int(np.asarray(qm["pis"]).shape[0])
        ks.append(k)
        assert hm["layers_decoded"] == m
        assert int(np.count_nonzero(qm["used_kernels"])) == k
        assert hm["num_kernels"] == k
        if used_prev is not None:       # tiers nest
            assert np.all(used_prev <= np.asarray(qm["used_kernels"]))
        used_prev = np.asarray(qm["used_kernels"], bool)
        r = rescaler(qm, s.cfg)
        assert np.asarray(r["pis"]).shape == (k,)
    assert ks[0] < ks[1] < ks[2]
    q_full, _ = bs.read_bitstream(path)
    assert ks[2] == int(np.asarray(q_full["pis"]).shape[0])

    # serving decode of each prefix runs; the full-prefix image equals
    # the unlayered-file image exactly
    from smoe_tpu.codec.serve import decode_bitstream
    imgs = [decode_bitstream(path, layers=m) for m in (1, 3)]
    flat = str(tmp_path / "flat.smoe")
    bs.write_bitstream(flat, q, s.cfg,
                       extra={"shape_of_img": list(toy_rgb.shape[:-1]),
                              "dim_of_output": toy_rgb.shape[-1],
                              "use_yuv": s.cfg.use_yuv,
                              "use_determinant": s.cfg.use_determinant})
    np.testing.assert_array_equal(imgs[1], decode_bitstream(flat))
    assert imgs[0].shape == imgs[1].shape


def test_layered_importance_ordering(tmp_path, toy_rgb):
    """Tier 0 holds the highest-importance kernels (default: gating mass
    ~ pi with the determinant normalizer), and an explicit importance=
    overrides the default."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    k = int(np.count_nonzero(np.asarray(q["used_kernels"], bool)))
    if k < 4:
        pytest.skip("toy fit culled too many kernels")
    imp = bs.kernel_importance(q, s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=[2, k - 2])
    _, h = bs.read_bitstream(path, max_layers=1)
    slot_of_row = np.flatnonzero(np.asarray(q["used_kernels"], bool))
    top2 = set(slot_of_row[np.argsort(-imp, kind="stable")[:2]].tolist())
    lmask = np.unpackbits(np.asarray(h["layers"][0]["kernels"], np.uint8),
                          count=h["num_slots"]).astype(bool)
    assert set(np.flatnonzero(lmask).tolist()) == top2

    # explicit importance: reverse it -> tier 0 holds the BOTTOM two
    bs.write_bitstream(path, q, s.cfg, layers=[2, k - 2], importance=-imp)
    _, h2 = bs.read_bitstream(path, max_layers=1)
    bot2 = set(slot_of_row[np.argsort(imp, kind="stable")[:2]].tolist())
    lmask2 = np.unpackbits(np.asarray(h2["layers"][0]["kernels"],
                                      np.uint8),
                           count=h2["num_slots"]).astype(bool)
    assert set(np.flatnonzero(lmask2).tolist()) == bot2


def test_layered_truncated_transmission(tmp_path, toy_rgb):
    """A file cut mid-tier still decodes the intact tier prefix via
    max_layers=, while a full decode refuses (per-tier CRCs)."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=3)
    q1_ref, h = bs.read_bitstream(path, max_layers=1)
    data = open(path, "rb").read()
    # cut mid-tier-2: drop tier 3 entirely plus 2 bytes of tier 2
    tail = sum(int(lh["bytes"]) for lh in h["layers"][2:]) + 2
    cut = str(tmp_path / "cut.smoe")
    open(cut, "wb").write(data[:len(data) - tail])
    with pytest.raises(ValueError, match="CRC|truncat"):
        bs.read_bitstream(cut)
    with pytest.raises(ValueError, match="CRC|truncat"):
        bs.read_bitstream(cut, max_layers=2)
    q1_cut, _ = bs.read_bitstream(cut, max_layers=1)
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q1_ref[name]), np.asarray(q1_cut[name]),
            err_msg=f"{name} differs on the truncated file's tier-1")


def test_layered_bitflip_isolated_to_its_tier(tmp_path, toy_rgb):
    """A bit flip inside tier 2's payload kills tier 2+ decodes (per-tier
    CRC) but leaves tier 1 decodable — corruption is isolated to the
    damaged tier, unlike a flat file where one flip loses everything."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=3)
    q1_ref, h = bs.read_bitstream(path, max_layers=1)
    data = bytearray(open(path, "rb").read())
    per = [int(lh["bytes"]) for lh in h["layers"]]
    tier2_mid = len(data) - sum(per) + per[0] + per[1] // 2
    data[tier2_mid] ^= 0x10
    bad = str(tmp_path / "bad.smoe")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="CRC|corrupt"):
        bs.read_bitstream(bad)
    with pytest.raises(ValueError, match="CRC|corrupt"):
        bs.read_bitstream(bad, max_layers=2)
    q1_bad, _ = bs.read_bitstream(bad, max_layers=1)
    for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis", "gamma_e"):
        np.testing.assert_array_equal(
            np.asarray(q1_ref[name]), np.asarray(q1_bad[name]))


def test_layered_model_mask_subset(tmp_path, toy_rgb):
    """Per-kernel extra header fields aligned to reduced rows
    (model_mask, cli/fit) are subset to the surviving rows on a prefix
    decode, in the same raster order."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    k = int(np.count_nonzero(np.asarray(q["used_kernels"], bool)))
    mm = [int(i % 2 == 0) for i in range(k)]
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=2,
                       extra={"model_mask": mm})
    qm, hm = bs.read_bitstream(path, max_layers=1)
    full_slots = np.flatnonzero(np.asarray(q["used_kernels"], bool))
    dec_slots = np.flatnonzero(np.asarray(qm["used_kernels"], bool))
    want = [mm[i] for i, sl in enumerate(full_slots)
            if sl in set(dec_slots.tolist())]
    assert hm["model_mask"] == want
    assert len(hm["model_mask"]) == hm["num_kernels"]
    # full decode leaves the mask untouched
    _, hf = bs.read_bitstream(path)
    assert hf["model_mask"] == mm


def test_nonlayered_file_rejects_max_layers(tmp_path, toy_rgb):
    s = _fit_toy(toy_rgb, iters=2)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "flat.smoe")
    bs.write_bitstream(path, q, s.cfg)
    with pytest.raises(ValueError, match="layered"):
        bs.read_bitstream(path, max_layers=1)


def test_mass_importance_nondegenerate(toy_rgb):
    """The default (gating-mass) importance measures each kernel's real
    responsibility share: non-degenerate even when every pi quantizes
    equal (where the analytic mode ties and tiers would fall back to
    raster wedges), and it sums to ~the sample count (weights sum to 1
    per point away from the denominator floor)."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    imp = bs.kernel_importance(q, s.cfg)
    k = int(np.count_nonzero(np.asarray(q["used_kernels"], bool)))
    assert imp.shape == (k,)
    assert imp.min() >= 0
    assert imp.max() > imp.min() * 1.01
    assert 0 < imp.sum() <= 65536 * 1.001
    ana = bs.kernel_importance(q, s.cfg, mode="analytic")
    assert ana.shape == (k,)


def test_tie_break_stratifies():
    """Equal-importance kernels split into bit-reversal strata (each
    tier spread across the raster), not contiguous raster wedges."""
    rows = bs._layer_rows(16, 4, np.ones(16))
    assert sorted(rows[0].tolist()) == [0, 4, 8, 12]
    assert sorted(np.concatenate(rows).tolist()) == list(range(16))
    # distinct importances still order strictly by importance
    imp = np.arange(16, dtype=float)
    rows = bs._layer_rows(16, 4, imp)
    assert sorted(rows[0].tolist()) == [12, 13, 14, 15]


def test_layers_for_budget(tmp_path, toy_rgb):
    """max_bytes picks the largest tier prefix whose container header +
    tiers fit the budget; serving decode under a budget equals the
    explicit layers= decode; a budget below header+tier1 refuses."""
    import os

    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=3,
                       extra={"shape_of_img": list(toy_rgb.shape[:-1]),
                              "dim_of_output": toy_rgb.shape[-1],
                              "use_yuv": s.cfg.use_yuv,
                              "use_determinant": s.cfg.use_determinant})
    header = bs.read_header(path)
    per = [int(lh["bytes"]) for lh in header["layers"]]
    total = os.path.getsize(path)
    fixed = total - sum(per)
    # exact boundaries: budget == header+tiers(1..m) yields m
    assert bs.layers_for_budget(path, fixed + per[0]) == 1
    assert bs.layers_for_budget(path, fixed + per[0] + per[1]) == 2
    assert bs.layers_for_budget(path, fixed + per[0] + per[1] - 1) == 1
    assert bs.layers_for_budget(path, total) == 3
    assert bs.layers_for_budget(path, total + 10 ** 6) == 3
    with pytest.raises(ValueError, match="budget"):
        bs.layers_for_budget(path, fixed + per[0] - 1)

    from smoe_tpu.codec.serve import decode_bitstream
    budget = fixed + per[0] + per[1]
    np.testing.assert_array_equal(
        decode_bitstream(path, max_bytes=budget),
        decode_bitstream(path, layers=2))

    flat = str(tmp_path / "flat.smoe")
    bs.write_bitstream(flat, q, s.cfg,
                       extra={"shape_of_img": list(toy_rgb.shape[:-1]),
                              "dim_of_output": toy_rgb.shape[-1]})
    with pytest.raises(ValueError, match="layered"):
        bs.layers_for_budget(flat, 10 ** 9)


def test_layers_for_budget_truncated_file(tmp_path, toy_rgb):
    """On a file cut mid-tier, the budget math must use the header's
    length field (not filesize minus declared tiers) and cap by the
    bytes actually present — a big budget then decodes the intact
    prefix instead of tripping the missing tier's CRC."""
    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=3,
                       extra={"shape_of_img": list(toy_rgb.shape[:-1]),
                              "dim_of_output": toy_rgb.shape[-1]})
    _, h = bs.read_bitstream(path, max_layers=1)
    data = open(path, "rb").read()
    # drop tier 3 exactly at its boundary: tiers 1-2 intact
    cut = str(tmp_path / "cut.smoe")
    open(cut, "wb").write(data[:len(data) - int(h["layers"][2]["bytes"])])
    assert bs.layers_for_budget(cut, 10 ** 9) == 2
    from smoe_tpu.codec.serve import decode_bitstream
    np.testing.assert_array_equal(decode_bitstream(cut, max_bytes=10 ** 9),
                                  decode_bitstream(path, layers=2))
    # a cut 2 bytes short of tier 2's end leaves only tier 1 decodable
    cut2 = str(tmp_path / "cut2.smoe")
    open(cut2, "wb").write(
        data[:len(data) - int(h["layers"][2]["bytes"]) - 2])
    assert bs.layers_for_budget(cut2, 10 ** 9) == 1


def test_mass_importance_dual_model_time_plane():
    """Dual-model video: model-0 kernels gate on the transformed domain
    whose time coordinate is TIME_PLANE=-5 — without model_mask their
    raw-grid mass underflows to ~0; with it they compete on their own
    plane."""
    from smoe_tpu.codec.quantize import quantize_params as qp_fn
    from smoe_tpu.config import SmoeConfig
    from smoe_tpu.video.motion import TIME_PLANE

    cfg = SmoeConfig(dim_domain=3, num_channels=1,
                     kernels_per_dim=(1, 1, 2), use_determinant=True)
    k, d = 2, 3
    A = np.zeros((k, d, d))
    for i in range(k):
        np.fill_diagonal(A[i], 5.0)
    params = {"A_diagonal": A, "A_corr": np.zeros((k, d, d)),
              "musX": np.array([[0.5, 0.5, TIME_PLANE],
                                [0.5, 0.5, 0.5]]),
              "nu_e": np.full((k, 1), 0.5),
              "gamma_e": np.zeros((k, d, 1)),
              "pis": np.ones(k)}
    q = qp_fn(params, cfg)
    raw = bs.kernel_importance(q, cfg)
    assert raw[0] < raw[1] * 1e-6          # t=-5 kernel starves on [0,1]^3
    mm = bs.kernel_importance(q, cfg, model_mask=np.array([True, False]))
    assert mm[0] > 0.1 * mm[1]             # competes on its own plane


def test_decode_cli_max_bytes(tmp_path, toy_rgb):
    import os

    s = _fit_toy(toy_rgb)
    q = quantize_params(s.get_params(), s.cfg)
    path = str(tmp_path / "lay.smoe")
    bs.write_bitstream(path, q, s.cfg, layers=2,
                       extra={"shape_of_img": list(toy_rgb.shape[:-1]),
                              "dim_of_output": toy_rgb.shape[-1],
                              "use_yuv": s.cfg.use_yuv,
                              "use_determinant": s.cfg.use_determinant})
    from smoe_tpu.cli import decode as decode_cli
    from smoe_tpu.codec.serve import decode_bitstream

    rec = decode_cli.main(["-p", path, "-r", str(tmp_path / "out"),
                           "--max-bytes", str(os.path.getsize(path))])
    np.testing.assert_array_equal(rec, decode_bitstream(path))


class TestNuAnchor:
    """Center-anchored expert-offset coding (config.nu_anchor, beyond the
    reference): nu is coded as the expert value at the decoded kernel
    center, inverted exactly by the decoder.  Built for LS-initialized
    fits whose steep slopes stretch origin-nu far outside [0,1]
    (scripts/exp_lsri_quant.py)."""

    def _steep_model(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
        # hand the experts honest steep slopes whose surfaces stay in
        # [0,1] AT the kernel centers — origin-nu then spans ~[-6, 7]
        rng = np.random.default_rng(0)
        k, d = np.asarray(s.params.musX).shape
        c = np.asarray(s.params.nu_e).shape[-1]
        gam = rng.uniform(-4, 4, (k, d, c)).astype(np.float32)
        v_center = rng.uniform(0.2, 0.8, (k, c)).astype(np.float32)
        mu = np.asarray(s.params.musX)
        nu = v_center - np.einsum("kd,kdc->kc", mu, gam)
        s.params = s.params.replace(
            nu_e=np.asarray(nu, np.float32), gamma_e=gam)
        s.valid = False
        return s

    def test_bounds_tighten_and_error_shrinks(self, toy_rgb):
        s = self._steep_model(toy_rgb)
        params = s.get_params()
        cfg_plain = s.cfg
        cfg_anchor = s.cfg.replace(nu_anchor=True)

        qp = quantize_params(dict(params), cfg_plain)
        qa = quantize_params(dict(params), cfg_anchor)
        assert "nu_anchor" not in qp and qa.get("nu_anchor") is True
        span_p = np.max(qp["upper_bounds"]["nu_e"]
                        - qp["lower_bounds"]["nu_e"])
        span_a = np.max(qa["upper_bounds"]["nu_e"]
                        - qa["lower_bounds"]["nu_e"])
        assert span_a < 0.3 * span_p, (span_p, span_a)

        rp = rescaler(qp, cfg_plain)
        ra = rescaler(qa, cfg_anchor)
        err_p = np.max(np.abs(rp["nu_e"] - params["nu_e"]))
        err_a = np.max(np.abs(ra["nu_e"] - params["nu_e"]))
        # anchor decode error ~ (tight nu step) + (gamma step * |mu|),
        # both far under the stretched origin-nu step at 6 bits
        assert err_a < 0.3 * err_p, (err_p, err_a)
        # the other groups are coded identically
        for name in ("A", "musX", "pis", "gamma_e"):
            np.testing.assert_array_equal(rp[name], ra[name])

    def test_file_roundtrip_flat_and_layered(self, tmp_path, toy_rgb):
        s = self._steep_model(toy_rgb)
        cfg = s.cfg.replace(nu_anchor=True)
        q = quantize_params(s.get_params(), cfg)
        want = rescaler(q, cfg)

        flat = str(tmp_path / "m.smoe")
        bs.write_bitstream(flat, q, cfg)
        q2, header = bs.read_bitstream(flat)
        assert header["nu_anchor"] is True and q2.get("nu_anchor") is True
        got = rescaler(q2, cfg)
        for k in want:
            np.testing.assert_allclose(want[k], got[k], rtol=0, atol=1e-12)

        lay = str(tmp_path / "m_l.smoe")
        bs.write_bitstream(lay, q, cfg, layers=2)
        q3, _ = bs.read_bitstream(lay)
        assert q3.get("nu_anchor") is True
        got3 = rescaler(q3, cfg)
        for k in want:
            np.testing.assert_allclose(want[k], got3[k], rtol=0, atol=1e-12)
        # prefix decode also inverts the anchor (per-kernel transform:
        # a kernel subset decodes independently of dropped kernels)
        q1, _ = bs.read_bitstream(lay, max_layers=1)
        assert q1.get("nu_anchor") is True
        rows = np.flatnonzero(np.asarray(q3["used_kernels"], bool))
        sub = np.isin(rows,
                      np.flatnonzero(np.asarray(q1["used_kernels"], bool)))
        np.testing.assert_allclose(rescaler(q1, cfg)["nu_e"],
                                   got3["nu_e"][sub], rtol=0, atol=1e-12)

    def test_diff_center_needs_grid(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], use_diff_center=True,
                 nu_anchor=True)
        with pytest.raises(ValueError, match="musX_grid"):
            quantize_params(s.get_params(), s.cfg)
        q = quantize_params(s.get_params(), s.cfg, musX_grid=s.musX_grid)
        grid = np.asarray(s.musX_grid)[np.asarray(q["used_kernels"])]
        r = rescaler(q, s.cfg, musX_grid=grid)
        # fresh model: surfaces are the sample init, anchor is near-lossless
        assert np.max(np.abs(r["nu_e"]
                             - np.asarray(s.get_params()["nu_e"]))) < 0.05

    def test_qm2_fixed_bounds_ignore_anchor(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], quantization_mode=2,
                 bit_depths=(20, 18, 6, 10, 10), nu_anchor=True)
        q = quantize_params(s.get_params(), s.cfg)
        assert "nu_anchor" not in q   # QM2 bounds refer to origin-nu


class TestGammaAnchor:
    """Steering-whitened slope coding (config.gamma_anchor, beyond the
    reference): gamma is coded as w = M^-1 gamma with M the decoded
    steering factor (diag magnitude floored), inverted exactly by the
    decoder.  Built for LS-refreshed fits whose steep slopes on SHARP
    kernels stretch the shared data-derived gamma bounds (the measured
    3.1 dB train->decode gap on the video -lsri recipe, ROADMAP 6b''')."""

    def _sharp_steep_model(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], quantize_pis=True)
        rng = np.random.default_rng(1)
        k, d = np.asarray(s.params.musX).shape
        c = np.asarray(s.params.nu_e).shape[-1]
        # make a few kernels SHARP (large A) and give exactly those
        # kernels steep slopes — the regime the LS refresh produces
        # (slope ~ signal change across the kernel's support, so
        # |gamma| scales with |A|)
        a_diag = np.asarray(s.params.a_diag).copy()
        gam = rng.uniform(-0.4, 0.4, (k, d, c)).astype(np.float32)
        sharp = rng.choice(k, size=max(1, k // 5), replace=False)
        for i in sharp:
            a_diag[i] *= 40.0
            gam[i] *= 40.0
        s.params = s.params.replace(a_diag=a_diag, gamma_e=gam)
        s.valid = False
        return s

    def test_bounds_tighten_and_error_shrinks(self, toy_rgb):
        s = self._sharp_steep_model(toy_rgb)
        params = s.get_params()
        cfg_plain = s.cfg
        cfg_anchor = s.cfg.replace(gamma_anchor=True)

        qp = quantize_params(dict(params), cfg_plain)
        qa = quantize_params(dict(params), cfg_anchor)
        assert "gamma_anchor" not in qp and qa.get("gamma_anchor") is True
        span_p = np.max(qp["upper_bounds"]["gamma_e"]
                        - qp["lower_bounds"]["gamma_e"])
        span_a = np.max(qa["upper_bounds"]["gamma_e"]
                        - qa["lower_bounds"]["gamma_e"])
        assert span_a < 0.3 * span_p, (span_p, span_a)

        rp = rescaler(qp, cfg_plain)
        ra = rescaler(qa, cfg_anchor)
        # what matters is the EXPERT SURFACE over each kernel's support,
        # res(x) = gamma^T x + nu: measure slope error in the whitened
        # (per-bandwidth-unit) metric — the surface error one kernel
        # width from the center along each axis
        from smoe_tpu.codec.quantize import _whiten_scale
        A = np.asarray(params["A_diagonal"]) + np.asarray(params["A_corr"])
        inv_s = 1.0 / _whiten_scale(A, 1.0)[:, :, None]
        g0 = np.asarray(params["gamma_e"], np.float64)
        err_p = np.max(np.abs(inv_s * (rp["gamma_e"] - g0)))
        err_a = np.max(np.abs(inv_s * (ra["gamma_e"] - g0)))
        assert err_a < 0.3 * err_p, (err_p, err_a)
        # the other groups are coded identically
        for name in ("A", "musX", "pis", "nu_e"):
            np.testing.assert_array_equal(rp[name], ra[name])

    def test_composes_with_nu_anchor(self, toy_rgb):
        s = self._sharp_steep_model(toy_rgb)
        cfg = s.cfg.replace(gamma_anchor=True, nu_anchor=True)
        q = quantize_params(s.get_params(), cfg)
        assert q.get("gamma_anchor") is True and q.get("nu_anchor") is True
        r = rescaler(q, cfg)
        # decode is deterministic and self-consistent: re-quantizing the
        # decoded params reproduces the same integers (idempotence)
        p2 = dict(s.get_params())
        p2.update({k: r[k] for k in ("musX", "nu_e", "pis", "gamma_e")})
        p2["A_diagonal"] = np.stack([np.diag(np.diag(a)) for a in r["A"]])
        p2["A_corr"] = r["A"] - p2["A_diagonal"]
        q2 = quantize_params(p2, cfg)
        for name in ("A_diagonal", "A_corr", "musX", "nu_e", "pis",
                     "gamma_e"):
            np.testing.assert_array_equal(q[name], q2[name])

    def test_file_roundtrip_flat_layered_prefix(self, tmp_path, toy_rgb):
        s = self._sharp_steep_model(toy_rgb)
        cfg = s.cfg.replace(gamma_anchor=True)
        q = quantize_params(s.get_params(), cfg)
        want = rescaler(q, cfg)

        flat = str(tmp_path / "g.smoe")
        bs.write_bitstream(flat, q, cfg)
        q2, header = bs.read_bitstream(flat)
        assert header["gamma_anchor"] is True
        assert q2.get("gamma_anchor") is True
        got = rescaler(q2, cfg)
        for k in want:
            np.testing.assert_allclose(want[k], got[k], rtol=0, atol=1e-12)

        lay = str(tmp_path / "g_l.smoe")
        bs.write_bitstream(lay, q, cfg, layers=2)
        q3, _ = bs.read_bitstream(lay)
        got3 = rescaler(q3, cfg)
        for k in want:
            np.testing.assert_allclose(want[k], got3[k], rtol=0, atol=1e-12)
        # prefix decode: per-kernel transform, independent of dropped rows
        q1, _ = bs.read_bitstream(lay, max_layers=1)
        assert q1.get("gamma_anchor") is True
        rows = np.flatnonzero(np.asarray(q3["used_kernels"], bool))
        sub = np.isin(rows,
                      np.flatnonzero(np.asarray(q1["used_kernels"], bool)))
        np.testing.assert_allclose(rescaler(q1, cfg)["gamma_e"],
                                   got3["gamma_e"][sub], rtol=0, atol=1e-12)

    def test_qm2_and_inverse_cov_gate_off(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], quantization_mode=2,
                 bit_depths=(20, 18, 6, 10, 10), gamma_anchor=True)
        q = quantize_params(s.get_params(), s.cfg)
        assert "gamma_anchor" not in q   # QM2 bounds refer to raw gamma

        s2 = Smoe(toy_rgb, kernels_per_dim=[4], train_inverse_cov=True,
                  gamma_anchor=True)
        q2 = quantize_params(s2.get_params(), s2.cfg)
        assert "gamma_anchor" not in q2  # no triangular factor to whiten

    def test_radial_roundtrip(self, toy_rgb):
        from smoe_tpu.fit.trainer import Smoe

        s = Smoe(toy_rgb, kernels_per_dim=[4], radial_as=True,
                 gamma_anchor=True, quantize_pis=True)
        q = quantize_params(s.get_params(), s.cfg)
        assert q.get("gamma_anchor") is True
        r = rescaler(q, s.cfg)
        g0 = np.asarray(s.get_params()["gamma_e"])
        # fresh grid model: slopes are zeros -> whitened zeros, decode
        # lands within one quantizer step of zero
        step = np.max(q["upper_bounds"]["gamma_e"]
                      - q["lower_bounds"]["gamma_e"]) / (2 ** 10 - 1)
        assert np.max(np.abs(r["gamma_e"] - g0)) <= step * np.max(
            np.abs(np.asarray(s.get_params()["A_diagonal"]))) + 1e-9
