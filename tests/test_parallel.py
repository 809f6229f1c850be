"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Verifies the SP (block-axis) + TP/EP (kernel-axis) sharded train step
produces the same numbers as the single-device path (SURVEY §2.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core.init import init_params
from smoe_tpu.core.model import smoe_forward
from smoe_tpu.core.quant import apply_qat
from smoe_tpu.fit.blocks import build_blockset
from smoe_tpu.parallel.sharded import (fit_many, make_mesh,
                                       make_sharded_train_step, shard_inputs)

cpus = jax.devices("cpu")
pytestmark = pytest.mark.skipif(len(cpus) < 8,
                                reason="needs 8 virtual CPU devices")


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    img = rng.uniform(0.2, 0.8, (16, 16, 1)).astype(np.float32)
    cfg = SmoeConfig(dim_domain=2, num_channels=1, kernels_per_dim=(4, 4),
                     use_yuv=False, use_determinant=True)
    params = jax.tree_util.tree_map(jnp.asarray, init_params(img, cfg))
    bset = build_blockset(img, cfg, (4, 8))   # 8 blocks
    return img, cfg, params, bset


def _reference_sweep(params, cfg, bset, tx, opt_state):
    """Single-device scan-accumulated sweep for comparison."""
    from smoe_tpu.core import losses as Lo

    def block_loss(p, coords, targets):
        eff = apply_qat(p, cfg)
        out = smoe_forward(eff, cfg, coords)
        la = Lo.pixel_loss(out.res, targets, cfg)
        return la.loss_pixel, la.mse

    grad_fn = jax.value_and_grad(block_loss, has_aux=True)
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)

    def body(carry, xs):
        g_acc, l_acc, m_acc = carry
        c, t = xs
        (l, m), g = grad_fn(params, c, t)
        return (jax.tree_util.tree_map(lambda a, b: a + b, g_acc, g),
                l_acc + l / 8, m_acc + m / 8), None

    (grads, loss, mse), _ = jax.lax.scan(
        body, (zero, 0.0, 0.0), (bset.coords, bset.targets))
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), loss, mse


class TestShardedStep:
    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
    def test_matches_single_device(self, setup, mesh_shape):
        img, cfg, params, bset = setup
        mesh = make_mesh(*mesh_shape, devices=cpus)
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        step = make_sharded_train_step(cfg, mesh, tx, block_weight=1 / 8)

        klists = jnp.ones((8, params.capacity), bool)
        p_sh, coords, targets, kl = shard_inputs(
            mesh, params, bset.coords, bset.targets, klists)
        opt_sh = tx.init(p_sh)
        p2, _, loss, mse = step(p_sh, opt_sh, coords, targets, kl,
                                jnp.float32(0), jnp.float32(0))

        p_ref, loss_ref, mse_ref = _reference_sweep(
            params, cfg, bset, tx, opt_state)

        np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(float(mse), float(mse_ref), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(p2.musX),
                                   np.asarray(p_ref.musX), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p2.pis),
                                   np.asarray(p_ref.pis), atol=1e-6)

    def test_multiple_steps_stable(self, setup):
        img, cfg, params, bset = setup
        mesh = make_mesh(4, 2, devices=cpus)
        tx = optax.adam(1e-3)
        step = make_sharded_train_step(cfg, mesh, tx, block_weight=1 / 8)
        klists = jnp.ones((8, params.capacity), bool)
        p, coords, targets, kl = shard_inputs(
            mesh, params, bset.coords, bset.targets, klists)
        s = tx.init(p)
        losses = []
        for _ in range(5):
            p, s, loss, mse = step(p, s, coords, targets, kl,
                                   jnp.float32(0), jnp.float32(0))
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestDataParallel:
    def test_fit_many_images(self):
        rng = np.random.default_rng(3)
        imgs = rng.uniform(0.3, 0.7, (4, 8, 8, 1)).astype(np.float32)
        cfg = SmoeConfig(dim_domain=2, num_channels=1, kernels_per_dim=(2, 2),
                         use_yuv=False)
        mesh = jax.sharding.Mesh(np.asarray(cpus[:4]), ("m",))
        _, mses = fit_many(imgs, cfg, steps=30, mesh=mesh)
        assert mses.shape == (4,)
        assert np.isfinite(mses).all()
