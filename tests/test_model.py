"""Closed-form unit tests for the forward math (SURVEY.md §4 strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.model import (DENOM_FLOOR, gating, maha_from_A,
                                 quadratic_features, smoe_forward)
from smoe_tpu.core.params import SmoeParams, assemble_A


def make_params(musX, a_diag, pis, nu_e, gamma_e, a_corr=None):
    musX = np.asarray(musX, np.float32)
    k, d = musX.shape
    if a_corr is None:
        a_corr = np.zeros((k, d, d), np.float32)
    return SmoeParams(
        musX=jnp.asarray(musX),
        a_diag=jnp.asarray(a_diag, jnp.float32),
        a_corr=jnp.asarray(a_corr, jnp.float32),
        pis=jnp.asarray(pis, jnp.float32),
        nu_e=jnp.asarray(nu_e, jnp.float32),
        gamma_e=jnp.asarray(gamma_e, jnp.float32))


class TestMahalanobis:
    def test_matches_direct_computation(self, rng):
        """Quadratic-feature matmul == explicit (x-mu)^T A A^T (x-mu)."""
        k, n, d = 5, 17, 2
        A = np.tril(rng.normal(size=(k, d, d))).astype(np.float32)
        for i in range(k):
            A[i, np.arange(d), np.arange(d)] = np.abs(A[i].diagonal()) + 1.0
        mus = rng.uniform(0, 1, (k, d)).astype(np.float32)
        x = rng.uniform(0, 1, (n, d)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=d, num_channels=1, train_inverse_cov=False)
        got = np.asarray(maha_from_A(jnp.asarray(A), jnp.asarray(mus), cfg,
                                     jnp.asarray(x)))
        want = np.empty((n, k))
        for ki in range(k):
            diff = x - mus[ki]
            B = A[ki] @ A[ki].T
            want[:, ki] = np.einsum("ni,ij,nj->n", diff, B, diff)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_inverse_cov_mode(self, rng):
        """train_inverse_cov: maha = (x-mu)^T S (x-mu), S symmetric."""
        k, n, d = 3, 11, 2
        S = rng.normal(size=(k, d, d)).astype(np.float32)
        S = S + np.swapaxes(S, 1, 2)   # symmetric
        mus = rng.uniform(0, 1, (k, d)).astype(np.float32)
        x = rng.uniform(0, 1, (n, d)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=d, train_inverse_cov=True)
        got = np.asarray(maha_from_A(jnp.asarray(S), jnp.asarray(mus), cfg,
                                     jnp.asarray(x)))
        want = np.stack([np.einsum("ni,ij,nj->n", x - mus[ki], S[ki],
                                   x - mus[ki]) for ki in range(k)], axis=1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_assemble_A_lower_triangular(self, rng):
        """A = diag(a_diag) + strict_lower(a_corr); upper of a_corr ignored
        (reference smoe.py:731-736)."""
        k, d = 4, 3
        a_diag = rng.normal(size=(k, d, d)).astype(np.float32)
        a_corr = rng.normal(size=(k, d, d)).astype(np.float32)
        p = make_params(np.zeros((k, d)), a_diag, np.ones(k),
                        np.zeros((k, 1)), np.zeros((k, d, 1)), a_corr)
        cfg = SmoeConfig(dim_domain=d, train_inverse_cov=False)
        A = np.asarray(assemble_A(p, cfg))
        for i in range(k):
            want = np.diag(np.diag(a_diag[i])) + np.tril(a_corr[i], -1)
            np.testing.assert_allclose(A[i], want, rtol=1e-6)

    def test_radial_mode(self):
        cfg = SmoeConfig(dim_domain=2, radial_as=True)
        p = SmoeParams(musX=jnp.zeros((3, 2)),
                       a_diag=jnp.asarray([2.0, 3.0, 4.0]),
                       a_corr=jnp.zeros((3, 2, 2)), pis=jnp.ones(3),
                       nu_e=jnp.zeros((3, 1)), gamma_e=jnp.zeros((3, 2, 1)))
        A = np.asarray(assemble_A(p, cfg))
        for i, a in enumerate([2.0, 3.0, 4.0]):
            np.testing.assert_allclose(A[i], a * np.eye(2))


class TestGating:
    def test_single_kernel_weight_is_one(self):
        """One live kernel => w == 1 everywhere (softmax of one)."""
        cfg = SmoeConfig(dim_domain=2, use_determinant=False, precision=8)
        maha = jnp.asarray(np.random.default_rng(0).uniform(
            0, 10, (20, 1)).astype(np.float32))
        w = gating(maha, jnp.asarray([0.5]), jnp.ones((1, 2)), cfg,
                   jnp.ones((1,), bool))
        np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-6)

    def test_symmetric_two_kernels(self):
        """Two identical kernels at mirror positions: midpoint weight 0.5."""
        cfg = SmoeConfig(dim_domain=2, use_determinant=False)
        A = np.tile(5.0 * np.eye(2)[None], (2, 1, 1)).astype(np.float32)
        mus = np.array([[0.25, 0.5], [0.75, 0.5]], np.float32)
        x = jnp.asarray([[0.5, 0.5]])
        maha = maha_from_A(jnp.asarray(A), jnp.asarray(mus), cfg, x)
        w = gating(maha, jnp.asarray([0.5, 0.5]),
                   jnp.asarray(A.diagonal(axis1=1, axis2=2)), cfg,
                   jnp.ones((2,), bool))
        np.testing.assert_allclose(np.asarray(w), 0.5, atol=1e-6)

    def test_determinant_normalizer(self):
        """use_determinant multiplies N by prod(diag A)/sqrt((2pi)^d)
        (reference smoe.py:809-815) — changes gating when diags differ."""
        cfg = SmoeConfig(dim_domain=2, use_determinant=True)
        maha = jnp.zeros((1, 2))
        diag = jnp.asarray([[2.0, 2.0], [4.0, 4.0]])
        w = gating(maha, jnp.asarray([0.5, 0.5]), diag, cfg,
                   jnp.ones((2,), bool))
        # dets 4 vs 16 -> weights 0.2 / 0.8
        np.testing.assert_allclose(np.asarray(w)[0], [0.2, 0.8], atol=1e-6)

    def test_influence_culling(self):
        """Weights below 0.5/2^precision are zeroed (reference smoe.py:825-827)."""
        cfg = SmoeConfig(dim_domain=2, use_determinant=False, precision=8)
        # kernel 2 very far -> tiny weight
        maha = jnp.asarray([[0.0, 60.0]])
        w = np.asarray(gating(maha, jnp.asarray([0.5, 0.5]),
                              jnp.ones((2, 2)), cfg, jnp.ones((2,), bool)))
        assert w[0, 1] == 0.0
        assert w[0, 0] > 0.99

    def test_dead_kernel_excluded(self):
        """pis <= 0 and masked kernels contribute nothing, even with
        garbage maha (nan-safety)."""
        cfg = SmoeConfig(dim_domain=2, use_determinant=False)
        maha = jnp.asarray([[0.0, -1e30]])   # exp would overflow
        w = np.asarray(gating(maha, jnp.asarray([0.5, 0.0]),
                              jnp.ones((2, 2)), cfg, jnp.ones((2,), bool)))
        assert np.isfinite(w).all()
        np.testing.assert_allclose(w[0], [1.0, 0.0])

    def test_denominator_floor(self):
        """All-tiny numerators: denom floored at 1e-11 (reference 10e-12)."""
        cfg = SmoeConfig(dim_domain=2, use_determinant=False, precision=8)
        maha = jnp.asarray([[200.0]])
        w = np.asarray(gating(maha, jnp.asarray([1e-3]), jnp.ones((1, 2)),
                              cfg, jnp.ones((1,), bool)))
        assert np.isfinite(w).all()


class TestForward:
    def test_single_kernel_affine_expert(self, rng):
        """K=1 => res = clip(gamma^T x + nu) exactly (SURVEY §4)."""
        d, c = 2, 3
        gamma = rng.normal(size=(1, d, c)).astype(np.float32) * 0.1
        nu = rng.uniform(0.3, 0.6, (1, c)).astype(np.float32)
        p = make_params([[0.5, 0.5]], 4.0 * np.eye(d)[None], [1.0], nu,
                        gamma)
        cfg = SmoeConfig(dim_domain=d, num_channels=c, use_determinant=False,
                         train_gammas=True, precision=16)
        x = rng.uniform(0, 1, (13, d)).astype(np.float32)
        out = smoe_forward(p, cfg, jnp.asarray(x))
        want = np.clip(x @ gamma[0] + nu[0], 0, 1)
        np.testing.assert_allclose(np.asarray(out.res), want, atol=2e-4)

    def test_constant_experts(self, rng):
        """train_gammas=False: slopes ignored."""
        d, c = 2, 1
        gamma = np.ones((1, d, c), np.float32)     # would shift if used
        nu = np.full((1, c), 0.25, np.float32)
        p = make_params([[0.5, 0.5]], 4.0 * np.eye(d)[None], [1.0], nu,
                        gamma)
        cfg = SmoeConfig(dim_domain=d, num_channels=c, use_determinant=False,
                         train_gammas=False, precision=16)
        x = rng.uniform(0, 1, (7, d)).astype(np.float32)
        out = smoe_forward(p, cfg, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out.res), 0.25, atol=2e-4)

    def test_output_fake_quant(self):
        """Output snapped to precision grid with STE (reference smoe.py:899)."""
        from smoe_tpu.core.model import fake_quant_unit
        x = jnp.asarray([0.1234567, 0.5, 0.9999])
        q = np.asarray(fake_quant_unit(x, 8))
        np.testing.assert_allclose(q, np.round(np.asarray(x) * 255) / 255,
                                   atol=1e-7)

    def test_survivors_mask(self):
        """Far-away kernel never influential -> not a survivor."""
        d = 2
        p = make_params([[0.2, 0.2], [30.0, 30.0]],
                        np.tile(8 * np.eye(d)[None], (2, 1, 1)),
                        [0.5, 0.5], np.full((2, 1), 0.5),
                        np.zeros((2, d, 1)))
        cfg = SmoeConfig(dim_domain=d, num_channels=1, use_determinant=False)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (50, d)).astype(np.float32))
        out = smoe_forward(p, cfg, x)
        surv = np.asarray(out.survivors)
        assert surv[0] and not surv[1]
