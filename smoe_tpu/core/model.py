"""SMoE forward pass, MXU-native.

The reference evaluates the Mahalanobis distance with a (K, N, d, 1)
broadcasting einsum (reference smoe.py:791-806 via the forked
exponential_space_einsum, ops/special_math_ops.py:36-149), which on TPU would
materialize huge intermediates and starve the MXU.  Here the whole
pixel x kernel evaluation is reformulated as dense matmuls over a quadratic
feature map so XLA tiles it straight onto the 128x128 systolic array:

With B_k = A_k A_k^T (or the symmetric inverse-cov matrix directly):

    maha[n, k] = x_n^T B_k x_n - 2 (B_k mu_k)^T x_n + mu_k^T B_k mu_k
               = < phi(x_n), q_k >

where phi(x) = [vec(x x^T), x, 1]  (d^2 + d + 1 features) and
      q_k    = [vec(B_k), -2 B_k mu_k, mu_k^T B_k mu_k].

So maha = Phi @ Q^T is ONE (N, d^2+d+1) x (d^2+d+1, K) matmul.  Gating and
the expert regression are two more matmuls:

    nums   = exp(-0.5 maha) * det_k * pi_k * mask_k         (VPU, fused)
    w      = nums / max(1e-11, sum_k nums)                   (reference smoe.py:819-823)
    res    = w @ nu_e + sum_d x_d * (w @ gamma_e[:, d, :])   (reference smoe.py:840-848)

Everything here is pure and jit-friendly; kernel liveness comes in as a
(K,) bool mask (per-block kernel list AND pis>0, reference smoe.py:738).
The decode path can inject an explicit dequantized A via `A_override`,
mirroring the reference's feed-point override of the assembled A
(reference smoe.py:746-753, 1689).
"""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.params import SmoeParams, assemble_A

# Floor for the gating denominator.  Reference writes `10e-12` (= 1e-11),
# smoe.py:821.
DENOM_FLOOR = 1e-11


class ForwardOut(NamedTuple):
    res: jnp.ndarray          # (N, C) reconstruction, clipped + fake-quantized
    w_e: jnp.ndarray          # (N, K) gating weights after influence culling
    survivors: jnp.ndarray    # (K,) bool: kernel influences > threshold somewhere
    maha: jnp.ndarray         # (N, K) Mahalanobis distances (for kernel lists)


def quadratic_features(x: jnp.ndarray) -> jnp.ndarray:
    """phi(x) = [vec(x x^T), x, 1] for a batch of coords.  (N,d) -> (N, d*d+d+1)."""
    n, d = x.shape
    outer = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)
    ones = jnp.ones((n, 1), dtype=x.dtype)
    return jnp.concatenate([outer, x, ones], axis=-1)


def dual_domain_features(coords_t: jnp.ndarray, coords_raw: jnp.ndarray,
                         q: jnp.ndarray, model_mask: jnp.ndarray):
    """Concatenated features for the dual-model video mode: per-kernel
    domain selection folded into the quadratic-feature matmul.

    Returns (phi2 (N, 2F), q2 (K, 2F)) with
        phi2 @ q2^T == where(model_mask, phi_t @ q^T, phi_raw @ q^T).
    """
    phi2 = jnp.concatenate([quadratic_features(coords_t),
                            quadratic_features(coords_raw)], axis=-1)
    mm = model_mask.astype(q.dtype)[:, None]
    q2 = jnp.concatenate([q * mm, q * (1.0 - mm)], axis=-1)
    return phi2, q2


# TPU f32 matmuls default to fast reduced-precision passes (ONE bf16 MXU
# pass — both in XLA and in Mosaic/Pallas); exact f32 is REQUIRED
# everywhere the quadratic-feature maha is evaluated, because it cancels
# A^2-scale terms: the video domain mixes the t=-5 motion plane with
# steering values up to O(10^3) (maha terms ~O(10^8); a CIF dual-model
# decode read 6.2 dB on TPU vs 17.9 dB on CPU from the SAME bitstream),
# and real-photograph fits train steering to B ~ 1e4 even in 2D (the
# hopper fit stalled at 15.8 dB under the fused kernel's then-default
# dots vs 21.8 dB exact, same chip).  The fused Pallas kernel requests
# HIGHEST on its dots too (kernels/gate_expert.py) — an earlier claim
# here that Mosaic's f32 dot is exact was measured WRONG (round 4).
_EXACT = jax.lax.Precision.HIGHEST


def kernel_quadratics(B: jnp.ndarray, musX: jnp.ndarray) -> jnp.ndarray:
    """q_k = [vec(B_k), -2 B_k mu_k, mu_k^T B_k mu_k].  (K,d,d),(K,d) -> (K, d*d+d+1)."""
    k, d, _ = B.shape
    Bmu = jnp.einsum("kij,kj->ki", B, musX, precision=_EXACT)
    const = jnp.einsum("ki,ki->k", Bmu, musX, precision=_EXACT)[:, None]
    return jnp.concatenate([B.reshape(k, d * d), -2.0 * Bmu, const], axis=-1)


def maha_from_A(A: jnp.ndarray, musX: jnp.ndarray, cfg: SmoeConfig,
                coords: jnp.ndarray,
                coords_raw: Optional[jnp.ndarray] = None,
                model_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(N, K) Mahalanobis distances given the assembled steering factor A.

    train_inverse_cov: maha = x^T A x (A already symmetrized);
    otherwise:         maha = x^T A A^T x        (reference smoe.py:791-806).

    For the dual-model video mode kernels with model_mask==False are
    evaluated on `coords_raw` instead of the motion-transformed `coords`
    (reference smoe.py:796-805).
    """
    if cfg.train_inverse_cov:
        B = A
    else:
        B = jnp.einsum("klm,knm->kln", A, A, precision=_EXACT)   # A A^T
    q = kernel_quadratics(B, musX)             # (K, F)

    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else coords.dtype
    if coords_raw is not None and model_mask is not None:
        # dual-model: model-0 kernels gate on the motion-transformed
        # domain, model-1 on the raw domain (reference smoe.py:796-805).
        # Instead of two (N, K) matmuls + select, concatenate the feature
        # maps and zero each kernel's unused half:
        #   maha = [phi_t, phi_raw] @ [q*m, q*(1-m)]^T  — ONE matmul.
        phi2, q2 = dual_domain_features(coords, coords_raw, q, model_mask)
        maha = jnp.dot(phi2.astype(dt), q2.T.astype(dt),
                       preferred_element_type=jnp.float32,
                       precision=_EXACT)
    else:
        phi = quadratic_features(coords)       # (N, F)
        maha = jnp.dot(phi.astype(dt), q.T.astype(dt),
                       preferred_element_type=jnp.float32,
                       precision=_EXACT)
    if not cfg.train_inverse_cov:
        # ||A^T (x-mu)||^2 >= 0 by construction in the reference
        # (smoe.py:796-797); the quadratic-feature form can go slightly
        # negative under f32 cancellation for large steering values, and a
        # negative maha would let exp(-0.5*maha) overflow.  Clamp restores
        # the mathematical invariant (exact, not a heuristic).
        maha = jnp.maximum(maha, 0.0)
    return maha


def mahalanobis(params: SmoeParams, cfg: SmoeConfig, coords: jnp.ndarray,
                coords_raw: Optional[jnp.ndarray] = None,
                model_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Convenience wrapper assembling A from the params."""
    A = assemble_A(params, cfg)
    return maha_from_A(A, params.musX, cfg, coords, coords_raw, model_mask)


def gating(maha: jnp.ndarray, pis: jnp.ndarray, diag_A: jnp.ndarray,
           cfg: SmoeConfig, kernel_mask: jnp.ndarray,
           kernel_axis: Optional[str] = None) -> jnp.ndarray:
    """Softmax-like gating with influence culling.  (N,K) -> (N,K).

    Reference smoe.py:807-827:
        N    = exp(-0.5 maha) [* prod(diag A)/sqrt((2 pi)^d)]
        w    = pi * N / max(1e-11, sum(pi * N))
        w    = w * (w > 0.5/2^precision)

    kernel_axis: mesh axis name when K is sharded (tensor/expert
    parallelism).  The denominator is the ONLY cross-shard reduction in the
    gating (SURVEY §2.2 TP row); it becomes one psum over that axis.
    """
    mask = kernel_mask & (pis > 0)
    # Mask inside the exp so dead kernels with garbage params can never
    # produce inf * 0 = nan in the denominator (they are excluded from the
    # graph entirely in the reference via boolean_mask, smoe.py:738-753).
    n_exp = jnp.exp(-0.5 * jnp.where(mask[None, :], maha, 0.0))
    if cfg.use_determinant:
        n_div = jnp.prod(diag_A, axis=-1)                          # (K,)
        n_quo = n_div / np.sqrt((2.0 * np.pi) ** cfg.dim_domain)
        n_exp = n_exp * n_quo[None, :]
    n_w = n_exp * jnp.where(mask, pis, 0.0)[None, :]
    denom = jnp.sum(n_w, axis=1, keepdims=True)
    if kernel_axis is not None:
        denom = jax.lax.psum(denom, kernel_axis)     # <- TP/EP collective
    denom = jnp.maximum(DENOM_FLOOR, denom)
    w_e = n_w / denom
    w_e = w_e * (w_e > cfg.minimum_influence)
    return w_e


def expert_regression(w_e: jnp.ndarray, coords: jnp.ndarray,
                      nu_e: jnp.ndarray, gamma_e: jnp.ndarray,
                      cfg: SmoeConfig,
                      kernel_axis: Optional[str] = None) -> jnp.ndarray:
    """res[n,c] = sum_k w[n,k] (gamma_k^T x_n + nu_k).  Reference smoe.py:840-848.

    Implemented as (N,K)@(K,C) + sum_d x_d * ((N,K)@(K,dC) reshaped), i.e. two
    MXU matmuls, no (N,K,C) intermediate.

    kernel_axis: mesh axis name when K is sharded — each shard contributes a
    partial expert sum, reduced with one psum.
    """
    k, d, c = gamma_e.shape
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else w_e.dtype
    res = jnp.dot(w_e.astype(dt), nu_e.astype(dt),
                  preferred_element_type=jnp.float32, precision=_EXACT)
    if cfg.train_gammas:
        if cfg.only_y_gamma and cfg.use_yuv:
            # zero out slopes for non-Y channels (reference smoe.py:725-729)
            chan_mask = jnp.zeros((c,), gamma_e.dtype).at[0].set(1.0)
            gamma_e = gamma_e * chan_mask[None, None, :]
        g = jnp.dot(w_e.astype(dt), gamma_e.reshape(k, d * c).astype(dt),
                    preferred_element_type=jnp.float32,
                    precision=_EXACT).reshape(-1, d, c)
        res = res + jnp.einsum("nd,ndc->nc", coords, g)
    if kernel_axis is not None:
        res = jax.lax.psum(res, kernel_axis)         # <- partial expert sums
    return res


def fake_quant_unit(x: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Fake-quantize values in [0,1] to `bits` (straight-through gradient).

    Matches tf.fake_quant_with_min_max_args(min=0, max=1) used on the output
    (reference smoe.py:899): scale = 1/(2^bits - 1), zero point exact.
    """
    steps = (1 << bits) - 1
    q = jnp.round(jnp.clip(x, 0.0, 1.0) * steps) / steps
    return x + jax.lax.stop_gradient(q - x)


def resolve_pallas(use_pallas: str) -> Tuple[bool, bool]:
    """Resolve cfg.use_pallas to (enabled, interpret).

    'auto' enables the fused Pallas kernel on real TPU backends and leaves
    the XLA path elsewhere; 'on' forces it (interpreted off-TPU, for tests).
    """
    if use_pallas == "off":
        return False, False
    dd = jax.config.jax_default_device
    if dd is None:
        platform = jax.devices()[0].platform
    elif isinstance(dd, str):
        platform = dd
    else:
        platform = dd.platform
    on_tpu = platform in ("tpu", "axon")
    if use_pallas == "on":
        return True, not on_tpu
    return on_tpu, False


def forward_fused(A: jnp.ndarray, musX: jnp.ndarray, nu_e: jnp.ndarray,
                  gamma_e: jnp.ndarray, pis: jnp.ndarray, cfg: SmoeConfig,
                  coords: jnp.ndarray, kernel_mask: jnp.ndarray,
                  interpret: bool,
                  sv_add: Optional[jnp.ndarray] = None,
                  coords_raw: Optional[jnp.ndarray] = None,
                  model_mask: Optional[jnp.ndarray] = None,
                  spatial: Optional[Tuple[int, ...]] = None,
                  k_cap: Optional[int] = None) -> ForwardOut:
    """Forward via the fused Pallas gate+expert kernel (training hot path).

    Numerically equivalent to gating() + expert_regression() with the
    (N, K) intermediates kept in VMEM (see kernels/gate_expert.py).  Does
    not produce the dense w_e map (eval uses the XLA path for that).
    Dual-model video is supported (coords_raw + model_mask fold the
    per-kernel domain select into 2F-wide features, see
    dual_domain_features).  Restriction: coords carry no gradient, so not
    for train_trafo video.

    k_cap: static width cap for the CAPPED-DENSE sparsity mode — the
    caller guarantees every kernel list has <= k_cap active kernels
    (lists only shrink within a compiled chunk, see
    fit/trainer.py run_batched_chunk); the k_cap highest-priority
    (active-first) kernels are gathered and the dense kernel runs at the
    narrower width.  Measured faster than in-kernel dynamic tile loops at
    1080p scales: one wide MXU matmul beats many predicated narrow ones.
    """
    from smoe_tpu.kernels.gate_expert import fused_gate_expert

    if not k_cap:
        # a falsy cap (None/0/False) means "no cap", never "width 0" — a
        # stale packed-mode bool in the fused tuple once reached here as
        # k_cap=False and built a zero-width kernel (round 4)
        k_cap = None
    if cfg.train_inverse_cov:
        B = A
    else:
        B = jnp.einsum("klm,knm->kln", A, A, precision=_EXACT)
    q = kernel_quadratics(B, musX)

    mask = kernel_mask & (pis > 0)
    if cfg.use_determinant:
        diag_A = jnp.diagonal(A, axis1=1, axis2=2)
        det = jnp.prod(diag_A, axis=-1) / np.sqrt(
            (2.0 * np.pi) ** cfg.dim_domain)
        pi_det = jnp.where(mask, pis * det, 0.0)
    else:
        pi_det = jnp.where(mask, pis, 0.0)

    k, d, c = gamma_e.shape
    if coords_raw is not None and model_mask is not None:
        # dual-model video: fold the per-kernel domain select into the
        # features (see dual_domain_features) — the fused kernels just see
        # 2F-wide features.
        phi, q = dual_domain_features(coords, coords_raw, q, model_mask)
    else:
        phi = quadratic_features(coords)
    if cfg.train_gammas:
        if cfg.only_y_gamma and cfg.use_yuv:
            chan_mask = jnp.zeros((c,), gamma_e.dtype).at[0].set(1.0)
            gamma_e = gamma_e * chan_mask[None, None, :]
        xe = jnp.concatenate(
            [coords, jnp.ones((coords.shape[0], 1), coords.dtype)], axis=1)
        G = jnp.concatenate([gamma_e.reshape(k, d * c), nu_e], axis=1)
    else:
        xe = jnp.ones((coords.shape[0], 1), coords.dtype)
        G = nu_e

    if k_cap is not None and k_cap < k:
        # capped-dense: gather the (<= k_cap) listed kernels, run the dense
        # kernel at the narrow width, scatter survivors back
        order = jnp.argsort(jnp.logical_not(mask))[:k_cap]
        res_raw, surv_c = fused_gate_expert(
            phi, xe, q[order], G[order],
            pi_det[order].astype(jnp.float32),
            mask[order].astype(jnp.float32),
            float(cfg.minimum_influence), float(DENOM_FLOOR),
            int(coords.shape[0]), bool(interpret),
            cfg.compute_dtype == "bfloat16")
        surv = jnp.zeros((k,), surv_c.dtype).at[order].set(surv_c)
    else:
        res_raw, surv = fused_gate_expert(
            phi, xe, q, G, pi_det.astype(jnp.float32),
            mask.astype(jnp.float32),
            float(cfg.minimum_influence), float(DENOM_FLOOR),
            int(coords.shape[0]), bool(interpret),
            cfg.compute_dtype == "bfloat16")
    if sv_add is not None:
        # SV residual on the Y channel, pre-clip (reference smoe.py:850-857)
        res_raw = res_raw.at[:, 0].add(sv_add)
    res = jnp.clip(res_raw, 0.0, 1.0)
    res = fake_quant_unit(res, cfg.precision)
    return ForwardOut(res=res, w_e=None, survivors=surv > 0, maha=None)


def smoe_forward(params: SmoeParams, cfg: SmoeConfig,
                 coords: jnp.ndarray,
                 kernel_mask: Optional[jnp.ndarray] = None,
                 coords_raw: Optional[jnp.ndarray] = None,
                 model_mask: Optional[jnp.ndarray] = None,
                 A_override: Optional[jnp.ndarray] = None) -> ForwardOut:
    """Full forward pass on a flat pixel set.

    coords: (N, d) in [0,1]^d (already motion-transformed if applicable).
    kernel_mask: (K,) bool per-block kernel list (defaults to all-on).
    A_override: explicit (K, d, d) steering factor (decode path).
    """
    if kernel_mask is None:
        kernel_mask = jnp.ones((params.capacity,), dtype=bool)
    A = A_override if A_override is not None else assemble_A(params, cfg)
    maha = maha_from_A(A, params.musX, cfg, coords, coords_raw, model_mask)
    diag_A = jnp.diagonal(A, axis1=1, axis2=2)
    w_e = gating(maha, params.pis, diag_A, cfg, kernel_mask)
    res = expert_regression(w_e, coords, params.nu_e, params.gamma_e, cfg)
    res = jnp.clip(res, 0.0, 1.0)
    res = fake_quant_unit(res, cfg.precision)
    survivors = jnp.any(w_e > cfg.minimum_influence, axis=0)
    return ForwardOut(res=res, w_e=w_e, survivors=survivors, maha=maha)
