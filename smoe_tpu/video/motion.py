"""Global-motion compensation for video volumes.

Per-frame 2/4/6/8-parameter motion models applied to the (y, x, t) domain
in-graph (reference smoe.py:554-686).  The transformed domain replaces the
time coordinate with the constant -5 so motion-compensated kernels are
time-invariant (reference smoe.py:684 and the musX_init[:, 2] = -5 of the
dual-model concat, smoe.py:304).

The reference tiles per-frame params over pixels via a boolean frames_list
feed (smoe.py:654-663); here the frame index is derived directly from each
pixel's t coordinate (t = frame/(T-1) from the inclusive linspace domain), so
blocks need no frame bookkeeping.
"""

from __future__ import annotations

import jax.numpy as jnp

TIME_PLANE = -5.0   # reference smoe.py:684


def transform_coords(coords: jnp.ndarray, motion: jnp.ndarray,
                     num_params_model: int, num_frames: int) -> jnp.ndarray:
    """Apply the per-frame global motion model to (N, 3) (y, x, t) coords.

    motion: (8, F) rows h11,h12,h13,h21,h22,h23,h31,h32.
    Returns (N, 3) [y', x', TIME_PLANE]  (reference smoe.py:665-684).
    """
    y, x, t = coords[:, 0], coords[:, 1], coords[:, 2]
    fidx = jnp.clip(jnp.round(t * (num_frames - 1)).astype(jnp.int32),
                    0, num_frames - 1)
    h = motion[:, fidx]                                   # (8, N)
    h11, h12, h13, h21, h22, h23, h31, h32 = (h[i] for i in range(8))

    if num_params_model == 2:
        x_d = x + h13
        y_d = y + h23
        w_d = 1.0
    elif num_params_model == 4:
        x_d = h11 * x + h12 * y + h13
        y_d = -h12 * x + h11 * y + h23
        w_d = 1.0
    elif num_params_model in (6, 8):
        x_d = h11 * x + h12 * y + h13
        y_d = h21 * x + h22 * y + h23
        w_d = h31 * x + h32 * y + 1.0 if num_params_model == 8 else 1.0
    else:
        raise ValueError(f"invalid motion model {num_params_model}")

    tp = jnp.full_like(t, TIME_PLANE)
    return jnp.stack([y_d / w_d, x_d / w_d, tp], axis=1)
