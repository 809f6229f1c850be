"""Quantization-aware training: TF-semantics fake-quant with straight-through
gradients, plus the mode-2/3 parameter wrapping of the reference
(reference smoe.py:473-538).

Modes (reference smoe_test.py:298-301):
  0: none
  1: post-hoc quantize/rescale each validation (codec/quantize.py)
  2: in-graph fake-quant with FIXED bounds per group
  3: in-graph fake-quant with bounds derived from the active (pis>0) kernels
  pis are always fake-quantized for modes >= 2 (smoe_test.py:36-37).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.params import SmoeParams


def fake_quant(x: jnp.ndarray, min_val, max_val, bits: int) -> jnp.ndarray:
    """tf.fake_quant_with_min_max_args/vars semantics.

    Nudges the range so zero is exactly representable, clips, rounds to
    2^bits-1 steps, and passes a straight-through gradient that is zero
    outside the nudged range (like TF's FakeQuantWithMinMaxArgsGradient).
    """
    quant_max = float((1 << bits) - 1)
    min_val = jnp.asarray(min_val, jnp.float32)
    max_val = jnp.asarray(max_val, jnp.float32)
    scale = (max_val - min_val) / quant_max
    scale = jnp.where(scale == 0, 1.0, scale)          # degenerate range guard
    zero_point_from_min = -min_val / scale
    nudged_zp = jnp.clip(jnp.round(zero_point_from_min), 0.0, quant_max)
    nudged_min = (0.0 - nudged_zp) * scale
    nudged_max = (quant_max - nudged_zp) * scale
    clamped = jnp.clip(x, nudged_min, nudged_max)      # grad 0 outside range
    q = jnp.round((clamped - nudged_min) / scale) * scale + nudged_min
    return clamped + jax.lax.stop_gradient(q - clamped)


def _masked_min_max(x: jnp.ndarray, mask: jnp.ndarray,
                    kernel_axis: Optional[str] = None):
    """min/max of x over rows where mask (stop-gradient, see module docstring).

    The reference backprops into these reductions as fake_quant_with_min_max
    _vars side inputs; we deliberately stop the gradient (documented
    deviation — negligible effect, keeps the quant bounds out of Adam).

    kernel_axis: mesh axis name when the kernel rows are sharded (TP/EP).
    The active-kernel min/max become a pmin/pmax over that axis so mode-3
    bounds stay GLOBAL — the one extra collective QAT-3 needs under
    kernel sharding (cf. reference smoe.py:497-511, where the bounds are
    global by construction on one device).
    """
    big = jnp.float32(3.4e38)
    m = mask.reshape((-1,) + (1,) * (x.ndim - 1))
    # stop_gradient BEFORE the collectives: pmin/pmax carry no
    # differentiation rule, and the bounds are non-differentiable here
    # by design anyway (see docstring)
    mn = jax.lax.stop_gradient(jnp.min(jnp.where(m, x, big)))
    mx = jax.lax.stop_gradient(jnp.max(jnp.where(m, x, -big)))
    if kernel_axis is not None:
        mn = jax.lax.pmin(mn, kernel_axis)
        mx = jax.lax.pmax(mx, kernel_axis)
    # no active kernels (e.g. every pi fake-quantized to 0): the sentinel
    # bounds come back inverted (+big, -big) and would turn fake_quant
    # into NaNs; collapse to the degenerate range instead (scale-0 guard
    # in fake_quant then passes values through a zero range cleanly)
    empty = mn > mx
    mn = jnp.where(empty, 0.0, mn)
    mx = jnp.where(empty, 0.0, mx)
    return mn, mx


def apply_qat(params: SmoeParams, cfg: SmoeConfig,
              kernel_axis: Optional[str] = None) -> SmoeParams:
    """Return the effective (fake-quantized) params seen by the forward pass.

    Mirrors the q* tensor construction of reference smoe.py:473-538.  With
    quantization_mode < 2 and quantize_pis False this is the identity.

    kernel_axis: see _masked_min_max — makes mode-3 bounds global when the
    kernel rows are sharded over a mesh axis.
    """
    lb, ub, bd = cfg.lower_bounds, cfg.upper_bounds, cfg.bit_depths
    qm = cfg.quantization_mode

    pis = params.pis
    if qm >= 2 or cfg.quantize_pis:
        pis = fake_quant(pis, lb[3], ub[3], bd[3])
    if qm < 2:
        return params.replace(pis=pis)

    if qm == 2:
        a_diag = fake_quant(params.a_diag, lb[0], ub[0], bd[0])
        a_corr = fake_quant(params.a_corr, lb[0], ub[0], bd[0])
        musX = fake_quant(params.musX, lb[1], ub[1], bd[1])
        nu_e = fake_quant(params.nu_e, lb[2], ub[2], bd[2])
        gamma_e = fake_quant(params.gamma_e, lb[4], ub[4], bd[4])
    elif qm == 3:
        active = pis > 0
        ka = kernel_axis
        if cfg.radial_as:
            diag_vals = params.a_diag
        else:
            diag_vals = jnp.diagonal(params.a_diag, axis1=1, axis2=2)
        mn, mx = _masked_min_max(diag_vals, active, ka)
        # shift-to-zero trick (reference smoe.py:497-511)
        a_diag = fake_quant(params.a_diag - mn, 0.0, mx - mn, bd[0]) + mn
        mn, mx = _masked_min_max(params.a_corr, active, ka)
        a_corr = fake_quant(params.a_corr, mn, mx, bd[0])
        if cfg.train_musx:
            mn, mx = _masked_min_max(params.musX, active, ka)
            musX = fake_quant(params.musX, mn, mx, bd[1])
        else:
            musX = params.musX
        mn, mx = _masked_min_max(params.nu_e, active, ka)
        nu_e = fake_quant(params.nu_e - mn, 0.0, mx - mn, bd[2]) + mn
        mn, mx = _masked_min_max(params.gamma_e, active, ka)
        gamma_e = fake_quant(params.gamma_e, mn, mx, bd[4])
    else:
        raise ValueError(f"unknown quantization mode {qm}")

    out = params.replace(pis=pis, a_diag=a_diag, a_corr=a_corr,
                         musX=musX, nu_e=nu_e, gamma_e=gamma_e)
    if params.motion is not None and qm > 1:
        # 8-bit fake-quant of motion params with per-row derived bounds
        # (reference smoe.py:588-641)
        mn = jax.lax.stop_gradient(jnp.min(params.motion, axis=1, keepdims=True))
        mx = jax.lax.stop_gradient(jnp.max(params.motion, axis=1, keepdims=True))
        out = out.replace(motion=fake_quant(params.motion - mn, 0.0, mx - mn, 8) + mn)
    return out
