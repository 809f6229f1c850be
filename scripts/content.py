"""Synthetic content families for the RD / anchor / quality benches.

VERDICT r3 #4: every round-3 quality headline was measured on ONE
generator family (bench.build_image's sinusoids+blocks), so levers tuned
there carry generator-overfit risk.  These families are structurally
different signal classes (the reference's I/O targets natural images,
/root/reference/utils.py:68-134; no real assets ship in this
environment, so diversity comes from structure):

  bench   - the original sinusoid+blocks+noise headline image
  pink    - 1/f spectral field (natural-image second-order statistics)
  mosaic  - piecewise-constant Voronoi cells (cartoon/graphics class)
  text    - high-contrast thin strokes on a smooth gradient (screen
            content / document class; the hardest case for smooth
            steered Gaussians)
  hopper  - a REAL photograph: matplotlib's bundled grace_hopper.jpg
            sample image, center-cropped square and resized — the
            ground truth the synthetic families approximate
  mri     - a REAL MRI head slice (matplotlib sample_data s1045.ima.gz,
            256x256 big-endian uint16): smooth anatomy + sharp skull /
            tissue boundaries — the classic medical very-low-bpp
            content class.  Single channel.
  dem     - REAL terrain elevation (matplotlib sample_data
            jacksboro_fault_dem.npz, 344x403 int16): natural fractal
            relief with a fault scarp — smooth structured content,
            SMoE's home regime.  Single channel.

All deterministic (seeded), float32 in [0,1]; RGB except mri/dem.
"""

import numpy as np

FAMILIES = ("bench", "pink", "mosaic", "text", "hopper", "mri", "dem")


def build_hopper(size=256):
    """Real photograph (portrait: skin, fabric, flag stripes, sharp
    insignia) from matplotlib's sample_data — deterministic, no egress."""
    import matplotlib
    import os
    import cv2
    path = os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "sample_data", "grace_hopper.jpg")
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    h, w = bgr.shape[:2]
    s = min(h, w)
    r0, c0 = (h - s) // 2, (w - s) // 2
    crop = bgr[r0:r0 + s, c0:c0 + s]
    interp = cv2.INTER_AREA if size < s else cv2.INTER_CUBIC
    crop = cv2.resize(crop, (size, size), interpolation=interp)
    rgb = crop[..., ::-1].astype(np.float32) / 255.0
    return np.clip(rgb, 0, 1)


def _sample_data(name):
    import matplotlib
    import os
    return os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "sample_data", name)


def build_mri(size=256):
    """Real MRI head slice (s1045.ima.gz): 256x256 big-endian uint16
    (native read maxes at 55040 = 215<<8), values 0..215."""
    import gzip
    a = np.frombuffer(gzip.open(_sample_data("s1045.ima.gz")).read(),
                      np.uint16).reshape(256, 256).byteswap()
    img = (a / float(a.max())).astype(np.float32)
    if size != 256:
        import cv2
        interp = cv2.INTER_AREA if size < 256 else cv2.INTER_CUBIC
        img = cv2.resize(img, (size, size), interpolation=interp)
    return np.clip(img, 0, 1)[..., None]


def build_dem(size=256):
    """Real terrain elevation (jacksboro_fault_dem.npz, 344x403 int16),
    center-cropped square, min-max normalized."""
    a = np.load(_sample_data("jacksboro_fault_dem.npz"))["elevation"] \
        .astype(np.float32)
    h, w = a.shape
    s = min(h, w)
    r0, c0 = (h - s) // 2, (w - s) // 2
    a = a[r0:r0 + s, c0:c0 + s]
    if size != s:
        import cv2
        interp = cv2.INTER_AREA if size < s else cv2.INTER_CUBIC
        a = cv2.resize(a, (size, size), interpolation=interp)
    a = (a - a.min()) / (a.max() - a.min() + 1e-12)
    return np.clip(a, 0, 1).astype(np.float32)[..., None]


def build_pink(size=256, seed=7, beta=1.8):
    """1/f^beta spectral field per channel: the classic natural-image
    power-law statistics (beta ~ 1.8-2.0)."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0 / size
    amp = f ** (-beta / 2.0)
    chans = []
    for _ in range(3):
        phase = rng.uniform(0, 2 * np.pi, (size, size))
        spec = amp * np.exp(1j * phase)
        x = np.real(np.fft.ifft2(spec))
        x = (x - x.min()) / (x.max() - x.min() + 1e-12)
        chans.append(x)
    img = np.stack(chans, axis=-1).astype(np.float32)
    # correlate the channels like natural content (shared luminance)
    lum = img.mean(-1, keepdims=True)
    return np.clip(0.7 * lum + 0.3 * img, 0, 1).astype(np.float32)


def build_mosaic(size=256, seed=11, cells=40):
    """Piecewise-constant Voronoi mosaic (cartoon class: flat regions,
    sharp irregular boundaries — rewards steering, punishes slopes)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, size, (cells, 2))
    cols = rng.uniform(0.1, 0.9, (cells, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    d2 = ((yy[..., None] - pts[:, 0]) ** 2
          + (xx[..., None] - pts[:, 1]) ** 2)
    img = cols[np.argmin(d2, axis=-1)]
    img += rng.normal(0, 0.003, img.shape).astype(np.float32)
    return np.clip(img, 0, 1).astype(np.float32)


def build_text(size=256, seed=13):
    """Glyph-like thin strokes on a smooth two-tone gradient (screen/
    document content): high-contrast 1-3 px structures at many
    orientations, no font dependency."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size] / (size - 1)
    img = np.stack([0.75 + 0.15 * x - 0.1 * y,
                    0.78 + 0.1 * (x + y) / 2,
                    0.8 - 0.12 * x], axis=-1).astype(np.float32)
    ink = np.zeros((size, size), bool)
    n_glyphs = max(6, size // 18) ** 2

    def stamp_line(r0, c0, r1, c1, w):
        n = int(max(abs(r1 - r0), abs(c1 - c0))) + 1
        rr = np.clip(np.linspace(r0, r1, n).astype(int), 0, size - 1)
        cc = np.clip(np.linspace(c0, c1, n).astype(int), 0, size - 1)
        for dy in range(w):
            for dx in range(w):
                ink[np.clip(rr + dy, 0, size - 1),
                    np.clip(cc + dx, 0, size - 1)] = True

    grid = int(np.sqrt(n_glyphs))
    cell = size // grid
    for gi in range(grid):
        for gj in range(grid):
            if rng.uniform() < 0.25:          # word spacing
                continue
            r, c = gi * cell + 2, gj * cell + 2
            h, w = int(cell * 0.6), int(cell * 0.5)
            for _ in range(rng.integers(2, 5)):   # strokes per glyph
                p = rng.integers(0, [h, w], 2)
                q = rng.integers(0, [h, w], 2)
                stamp_line(r + p[0], c + p[1], r + q[0], c + q[1],
                           max(1, size // 256))
    img[ink] = np.float32([0.08, 0.08, 0.12])
    return np.clip(img, 0, 1).astype(np.float32)


def build_family(name: str, size=256):
    if name == "bench":
        from bench import build_image
        return build_image(size)
    if name == "pink":
        return build_pink(size)
    if name == "mosaic":
        return build_mosaic(size)
    if name == "text":
        return build_text(size)
    if name == "hopper":
        return build_hopper(size)
    if name == "mri":
        return build_mri(size)
    if name == "dem":
        return build_dem(size)
    raise ValueError(f"unknown content family {name!r}; "
                     f"choose from {FAMILIES}")
