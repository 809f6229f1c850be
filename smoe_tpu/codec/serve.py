"""Lean decode / serving path: dequantized parameters -> pixels.

The reference decodes by rebuilding the whole training graph and feeding
rescaled params into it (smoe_reconstruction_decoded.py:16-62); the CLI
mirror of that (cli/decode.py) likewise instantiates the full trainer.
For production serving that is wasteful: decoding needs ONE jitted
function from a handful of small parameter arrays to the image.

`make_decoder` builds exactly that: the canonical forward math
(core/model.py) evaluated over the pixel grid in row-chunks (lax.map
keeps peak memory at chunk x K), clipped and fake-quantized like the
encoder's reconstruction, compiled once and reusable across frames /
models of the same geometry.  Decoded output is bit-identical to
`Smoe.get_qreconstruction` for a single-block fit (same op order).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.init import gen_domain
from smoe_tpu.core.model import (expert_regression, fake_quant_unit, gating,
                                 maha_from_A)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_decoded_params(rp: dict, capacity: int, d: int, c: int) -> dict:
    """Pad reduced (K' active) rescaler output to `capacity` slots
    (dead slots pis=0) so one compiled decoder serves any model with
    K' <= capacity."""
    out = {}
    k = int(np.asarray(rp["pis"]).shape[0])
    assert k <= capacity, f"{k} kernels exceed decoder capacity {capacity}"

    def pad(x, shape):
        full = np.zeros((capacity,) + shape, np.float32)
        full[:k] = np.asarray(x, np.float32).reshape((k,) + shape)
        return full

    out["A"] = pad(rp["A"], (d, d))
    out["musX"] = pad(rp["musX"], (d,))
    out["nu_e"] = pad(rp["nu_e"], (c,))
    out["gamma_e"] = pad(rp["gamma_e"], (d, c))
    out["pis"] = pad(rp["pis"], ())
    return out


def make_decoder(img_shape: Tuple[int, ...], channels: int,
                 cfg: SmoeConfig, capacity: int,
                 chunk_pixels: Optional[int] = None,
                 motion: Optional[np.ndarray] = None,
                 model_mask: Optional[np.ndarray] = None,
                 sample_points: Optional[Tuple[np.ndarray, ...]] = None,
                 mesh=None):
    """Compile a decoder for one image/video geometry.

    Returns fn(A (K,d,d), musX (K,d), nu_e (K,C), gamma_e (K,d,C),
    pis (K,)) -> (*img_shape, channels) float image in [0,1], where
    K == round_up(capacity, 128).  Call `pad_decoded_params` on the
    rescaler output first.

    motion: (8, T) per-frame global-motion params for d==3 video — the
    domain is motion-transformed exactly like training (video/motion.py).
    model_mask: (capacity,) bool for dual-model video (kernels with False
    gate on the raw domain).  Both baked into the compiled program.
    sample_points: per-dim 1D coordinate vectors in [0,1] overriding the
    native raster (gen_domain's linspace(0,1,n)) — the ROI/zoom/SR hook;
    the output raster is their outer product and img_shape is ignored.
    mesh: a one-axis jax.sharding.Mesh for MULTI-CHIP serving — the
    pixel-chunk axis is shard_map'd over it (params replicated; gating
    reduces over kernels only, so decode needs NO collectives) and each
    device lax.maps its chunk share.  Output is bit-identical to the
    single-device decode (same per-chunk op order).
    """
    d = cfg.dim_domain
    if sample_points is not None:
        assert len(sample_points) == d
        sp = [np.asarray(v, np.float32) for v in sample_points]
        img_shape = tuple(len(v) for v in sp)
        coords = np.stack(np.meshgrid(*sp, indexing="ij"),
                          axis=-1).astype(np.float32)
    else:
        assert len(img_shape) == d
        coords = gen_domain(tuple(img_shape), d)  # no pixel array needed
    n = int(np.prod(img_shape))
    k_pad = _round_up(capacity, 128)
    if chunk_pixels is None:
        # keep the (chunk, K) gating map around 8 MB
        chunk_pixels = max(1024, min(n, (8 << 20) // (4 * k_pad)))
        chunk_pixels = _round_up(chunk_pixels, 256)
    n_pad = _round_up(n, chunk_pixels)
    if mesh is not None:
        assert len(mesh.axis_names) == 1, \
            "serving decode shards one pixel-chunk axis"
        ndev = int(np.prod(mesh.devices.shape))
        n_pad = _round_up(n_pad, chunk_pixels * ndev)
    coords = np.pad(coords.reshape(-1, d), ((0, n_pad - n), (0, 0)))
    coords = jnp.asarray(coords.reshape(-1, chunk_pixels, d))
    motion_arr = None if motion is None \
        else jnp.asarray(motion, jnp.float32)
    mm = None
    if model_mask is not None:
        m = np.ones((k_pad,), bool)
        m[:len(model_mask)] = np.asarray(model_mask, bool)
        mm = jnp.asarray(m)

    def pad_k(x):
        pad = [(0, k_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad) if k_pad > x.shape[0] else x

    def eval_chunks(cs, A, musX, nu_e, gamma_e, pis, mask, diag_A):
        def chunk_fn(c_blk):
            c_in, c_raw = c_blk, None
            if motion_arr is not None and d == 3:
                from smoe_tpu.video.motion import transform_coords
                c_in = transform_coords(c_blk, motion_arr,
                                        cfg.num_params_model,
                                        cfg.num_frames)
                if mm is not None:
                    c_raw = c_blk
            maha = maha_from_A(A, musX, cfg, c_in, c_raw, mm)
            w_e = gating(maha, pis, diag_A, cfg, mask)
            res = expert_regression(w_e, c_in, nu_e, gamma_e, cfg)
            res = jnp.clip(res, 0.0, 1.0)
            return fake_quant_unit(res, cfg.precision)

        return jax.lax.map(chunk_fn, cs)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from smoe_tpu.parallel.compat import shard_map
        ax = mesh.axis_names[0]
        rep = P()
        eval_all = shard_map(
            eval_chunks, mesh=mesh,
            in_specs=(P(ax),) + (rep,) * 7, out_specs=P(ax))
    else:
        eval_all = eval_chunks

    @jax.jit
    def decode(A, musX, nu_e, gamma_e, pis):
        A, musX, nu_e, gamma_e, pis = (pad_k(jnp.asarray(v, jnp.float32))
                                       for v in (A, musX, nu_e, gamma_e,
                                                 pis))
        mask = pis > 0
        diag_A = jnp.diagonal(A, axis1=1, axis2=2)
        res = eval_all(coords, A, musX, nu_e, gamma_e, pis, mask, diag_A)
        return res.reshape(-1, channels)[:n].reshape(img_shape + (channels,))

    return decode


def decode_bitstream(path: str, chunk_pixels: Optional[int] = None,
                     return_header: bool = False,
                     scale: Optional[float] = None,
                     out_shape: Optional[Tuple[int, ...]] = None,
                     roi: Optional[Tuple[Tuple[int, int], ...]] = None,
                     frames: Optional[Tuple[int, int]] = None,
                     views: Optional[Tuple[Tuple[int, int], ...]] = None,
                     layers: Optional[int] = None,
                     max_bytes: Optional[int] = None,
                     mesh=None):
    """One-call serving decode: .smoe file -> image (numpy).

    return_header: also return the decoded bitstream header dict (so
    callers that need output metadata don't entropy-decode twice).

    scale / out_shape / roi (beyond the reference): the model is a
    CONTINUOUS function on [0,1]^d, so it decodes at ANY raster —
    `scale=2` renders the spatial dims at 2x (video keeps its frame
    count, 4D LF keeps its view grid), `out_shape` names the full output
    raster explicitly, and `roi=((y0,y1),(x0,x1))` (native-pixel
    half-open box over the spatial dims) renders just that window
    without decoding the rest of the frame; roi composes with scale
    (zoom rendering).  `frames=(t0,t1)` (video, d==3) decodes only that
    half-open frame range at the native frame coordinates — random
    access without rendering the rest of the clip; `views=((u0,u1),
    (v0,v1))` (4D LF, d==4) is the analog for view navigation (decode
    one view: `views=((u,u+1),(v,v+1))`).  `layers=m` decodes only the
    first m tiers of an SNR-scalable layered bitstream
    (bitstream.write_bitstream layers=) — a coarser model from a prefix
    of the file; `max_bytes=n` picks that tier count automatically as
    the largest prefix (container header + tiers) fitting n bytes.
    `mesh=` (one-axis jax.sharding.Mesh) serves the decode MULTI-CHIP:
    pixel chunks shard over the devices, params replicate, no
    collectives — bit-identical to the single-device decode.  The
    reference evaluates only the training grid
    (smoe_reconstruction_decoded.py:16-62).
    """
    from smoe_tpu.codec.bitstream import layers_for_budget, read_bitstream
    from smoe_tpu.codec.quantize import rescaler

    if max_bytes is not None:
        assert layers is None, "pass layers= or max_bytes=, not both"
        layers = layers_for_budget(path, max_bytes)
    qp, header = read_bitstream(path, max_layers=layers)
    img_shape = tuple(int(v) for v in np.ravel(header["shape_of_img"]))
    c = int(np.ravel(header.get("dim_of_output", [3]))[0])
    d = len(img_shape)
    cfg = SmoeConfig(
        dim_domain=d, num_channels=c,
        kernels_per_dim=tuple(header["kernels_per_dim"])
        if len(header["kernels_per_dim"]) > 1
        else tuple(header["kernels_per_dim"]) * d,
        precision=int(header.get("precision", 8)),
        use_yuv=bool(header.get("use_yuv", True)) and c == 3,
        use_determinant=bool(header.get("use_determinant", True)),
        use_diff_center=bool(header.get("use_diff_center", False)),
        radial_as=bool(header.get("radial_as", False)),
        train_inverse_cov=bool(header.get("train_inverse_cov", False)),
        num_params_model=int(header.get("num_params_model", 8)),
        num_frames=int(header.get("num_frames",
                                  img_shape[2] if d == 3 else 0)))
    motion = header.get("motion")
    if motion is not None:
        motion = np.asarray(motion, np.float32)
    model_mask = header.get("model_mask")
    if model_mask is not None:
        model_mask = np.asarray(model_mask, bool)
    # diff-center grid offsets of the used slots (None otherwise) — the
    # shared slots-past-the-grid convention lives in one place
    from smoe_tpu.codec.bitstream import _grid_of_used
    rp = rescaler(qp, cfg, musX_grid=_grid_of_used(qp, cfg))
    k = int(np.asarray(rp["pis"]).shape[0])
    cap = _round_up(max(k, 1), 128)
    padded = pad_decoded_params(rp, cap, d, c)
    if frames is not None:
        assert d == 3, "frames= is for video bitstreams (d==3)"
    if views is not None:
        assert d == 4, "views= is for 4D light-field bitstreams (d==4)"
    sample_points = None
    if out_shape is None and (scale is not None or roi is not None
                              or frames is not None or views is not None):
        # spatial dims only: a video's frame axis (dim 2 of (H, W, T))
        # and an LF's view grid (dims 0,1 of (U, V, Y, X)) keep their
        # native sampling — the time/view coordinates are where motion /
        # the corner mask semantics live
        spatial = {2: (0, 1), 3: (0, 1), 4: (2, 3)}[d]
        sample_points = []
        for i, s_dim in enumerate(img_shape):
            if i not in spatial:
                native = np.linspace(0.0, 1.0, s_dim, dtype=np.float32)
                win = None
                if frames is not None and d == 3 and i == 2:
                    win = frames
                elif views is not None and d == 4 and i in (0, 1):
                    win = views[i]
                if win is not None:
                    lo, hi = win
                    assert 0 <= lo < hi <= s_dim, \
                        f"range {(lo, hi)} out of [0,{s_dim}] on dim {i}"
                    native = native[lo:hi]
                sample_points.append(native)
                continue
            lo, hi = (roi[spatial.index(i)] if roi is not None
                      else (0, s_dim))
            assert 0 <= lo < hi <= s_dim, f"roi {(lo, hi)} out of [0,{s_dim}]"
            npts = max(int(round((hi - lo) * (scale or 1.0))), 1)
            # native pixel i sits at i/(N-1): the window's samples span
            # its first..last native pixel so scale=1 reproduces the
            # crop of the native decode exactly
            sample_points.append(np.linspace(
                lo / (s_dim - 1), (hi - 1) / (s_dim - 1), npts,
                dtype=np.float32))
    dec = make_decoder(out_shape or img_shape, c, cfg, cap, chunk_pixels,
                       motion=motion, model_mask=model_mask,
                       sample_points=sample_points, mesh=mesh)
    rec = np.asarray(dec(padded["A"], padded["musX"], padded["nu_e"],
                         padded["gamma_e"], padded["pis"]))
    return (rec, header) if return_header else rec
