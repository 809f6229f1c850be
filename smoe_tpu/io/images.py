"""Image / video / light-field I/O.

Mirrors reference utils.py:68-162:
  read_image: PNG/TIFF/PGM/JPG (grayscale auto-detect, BGR->YUV), video
  containers via cv2.VideoCapture, 4D light fields from .mat, .npz bundles
  with per-frame affine matrices.  Returns (float image in [0,1],
  precision in {8,16}, affines or None).
  write_image: PNG / raw .yuv I420 video / .mat light field.

Light-field .mat files are handled through scipy.io (v7 and earlier) with
an h5py fallback for MATLAB v7.3 (HDF5) containers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMG_EXT = (".png", ".tif", ".tiff", ".pgm", ".ppm", ".jpg", ".jpeg")
VID_EXT = (".mp4", ".avi", ".mov", ".mkv", ".flv")


def read_image(path: str, use_yuv: bool = True
               ) -> Tuple[np.ndarray, int, Optional[np.ndarray]]:
    import cv2
    affines = None
    p = path.lower()

    if p.endswith(IMG_EXT):
        orig = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if orig is None:
            raise ValueError(f"cannot read image {path}")
        if orig.ndim == 2:
            orig = orig[..., None]
        elif orig.shape[2] >= 3:
            orig = orig[..., :3]
            # grayscale auto-detect (reference utils.py:73-78)
            if np.array_equal(orig[..., 0], orig[..., 1]) and \
                    np.array_equal(orig[..., 0], orig[..., 2]):
                orig = orig[..., :1]
            elif use_yuv:
                if orig.dtype == np.uint8:
                    orig = cv2.cvtColor(orig, cv2.COLOR_BGR2YUV)
                else:
                    # YUV conversion on uint16 via float path
                    f = orig.astype(np.float32) / np.iinfo(orig.dtype).max
                    f = cv2.cvtColor(f, cv2.COLOR_BGR2YUV)
                    orig = (f * np.iinfo(orig.dtype).max).astype(orig.dtype)

    elif p.endswith(VID_EXT):
        cap = cv2.VideoCapture(path)
        frames = []
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if use_yuv:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2YUV)
            frames.append(frame)
        cap.release()
        if not frames:
            raise ValueError(f"no frames in {path}")
        # (H, W, T, C) layout (reference utils.py:87-93)
        orig = np.stack(frames, axis=2).astype(np.uint8)
        if np.mean(orig[..., 1] == orig[..., 2]) > 0.9:   # grayscale video
            orig = orig[..., :1]

    elif p.endswith(".mat"):
        from scipy.io import loadmat
        try:
            lf = loadmat(path)["LF"]
        except NotImplementedError:
            # MATLAB v7.3 is an HDF5 container (the reference reads these
            # via hdf5storage, utils.py:104-110).  h5py returns MATLAB's
            # column-major layout with the axes reversed; transpose()
            # restores the (U, V, H, W, C) order.
            try:
                import h5py
            except ImportError as e:
                raise ValueError(
                    "v7.3 .mat light fields need h5py; convert with "
                    "scipy.io.savemat(..., do_compression=True) first") from e
            with h5py.File(path, "r") as f:
                lf = np.asarray(f["LF"]).transpose()
        orig = lf[..., 0:3]
        if use_yuv and orig.shape[-1] == 3:   # grayscale LFs skip YUV
            import cv2
            for i in range(orig.shape[0]):
                for j in range(orig.shape[1]):
                    orig[i, j] = cv2.cvtColor(orig[i, j], cv2.COLOR_RGB2YUV)

    elif p.endswith(".npz"):
        npz = np.load(path)
        orig = np.moveaxis(npz["imgs"], 0, -2)
        if use_yuv:
            import cv2
            for i in range(orig.shape[2]):
                orig[:, :, i, :] = cv2.cvtColor(orig[:, :, i, :],
                                                cv2.COLOR_RGB2YUV)
        affines = npz["affines"]
    else:
        raise ValueError(f"Unknown data format: {path}")

    if orig.dtype == np.uint8:
        orig = orig.astype(np.float32) / 255.0
        precision = 8
    elif orig.dtype == np.uint16:
        orig = orig.astype(np.float32) / 2 ** 16
        precision = 16
    else:
        orig = np.clip(orig.astype(np.float32), 0, 1)
        precision = 8
    return orig, precision, affines


def _write_mat_v73(path: str, lf: np.ndarray) -> None:
    """MATLAB v7.3 (HDF5) light-field container, like the reference's
    hdf5storage.write(matlab_compatible=True) (utils.py:155-162): column-
    major dataset + MATLAB_class attr + the 512-byte MAT userblock header
    so both MATLAB and our own v7.3 read fallback accept it."""
    import struct

    import h5py
    classes = {"uint8": b"uint8", "uint16": b"uint16",
               "float32": b"single", "float64": b"double"}
    with h5py.File(path, "w", userblock_size=512) as f:
        ds = f.create_dataset("LF", data=lf.transpose())
        ds.attrs.create(
            "MATLAB_class", np.bytes_(classes.get(str(lf.dtype), b"double")))
    head = b"MATLAB 7.3 MAT-file, created by smoe_tpu"
    with open(path, "r+b") as fd:
        fd.write(head.ljust(116, b" "))
        fd.write(b"\x00" * 8)                       # subsystem data offset
        fd.write(struct.pack("<H", 0x0200))         # version
        fd.write(b"IM")                             # endian indicator


def write_image(img: np.ndarray, path: str, dim_domain: int,
                yuv: bool = True, precision: int = 8,
                mat_v73: bool = False) -> str:
    """Write reconstruction (reference utils.py:136-162).  Returns the path
    actually written.

    mat_v73: write 4D light fields as MATLAB v7.3 (HDF5) like the
    reference's hdf5storage output, instead of scipy's v5 format."""
    import cv2
    if precision == 8:
        out = np.uint8(np.round(img * 255))
    else:
        out = np.uint16(np.round(np.clip(img * 2 ** precision, 0,
                                         2 ** 16 - 1)))

    if dim_domain == 2:
        if out.shape[-1] == 3 and yuv:
            out = cv2.cvtColor(out, cv2.COLOR_YUV2BGR)
        elif out.shape[-1] == 1:
            out = out[..., 0]
        cv2.imwrite(path + ".png", out)
        return path + ".png"
    if dim_domain == 3:
        # raw I420 .yuv stream (reference utils.py:146-154)
        with open(path + ".yuv", "wb") as fd:
            for t in range(out.shape[2]):
                frame = out[:, :, t, :]
                if frame.shape[-1] == 1:
                    # grayscale: luma + neutral chroma (the reference's
                    # video writer has a "grayscale videos do not work"
                    # TODO, utils.py:150; repeating luma into U/V would
                    # decode as saturated false color)
                    neutral = np.full_like(frame, 128 if precision == 8
                                           else 1 << (precision - 1))
                    frame = np.concatenate([frame, neutral, neutral], -1)
                elif not yuv:
                    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2YUV)
                i420 = cv2.cvtColor(frame, cv2.COLOR_YUV2BGR)
                i420 = cv2.cvtColor(i420, cv2.COLOR_BGR2YUV_I420)
                fd.write(i420.tobytes())
        return path + ".yuv"
    if dim_domain == 4:
        lf = out.copy()
        if yuv and lf.shape[-1] == 3:
            for i in range(lf.shape[0]):
                for j in range(lf.shape[1]):
                    lf[i, j] = cv2.cvtColor(lf[i, j], cv2.COLOR_YUV2RGB)
        if mat_v73:
            _write_mat_v73(path + ".mat", lf)
        else:
            from scipy.io import savemat
            savemat(path + ".mat", {"LF": lf})
        return path + ".mat"
    raise ValueError(f"unsupported dim_domain {dim_domain}")
