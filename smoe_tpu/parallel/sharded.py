"""Multi-chip SMoE training: shard_map over a (blocks, kernels) mesh.

The reference is strictly single-device (one tf.InteractiveSession,
reference smoe.py:277).  SURVEY.md §2.2 maps the parallelism strategies onto
this model:

  * "sequence parallelism" == sharding the PIXEL-BLOCK axis: each device owns
    B/nb blocks of the image, runs the same per-block loss, and the
    accumulated gradients are psum'd over the block axis — the TPU-native
    version of the reference's block-sequential gradient accumulation
    (smoe.py:1145-1151, 1785-1790).
  * tensor/expert parallelism == sharding the KERNEL axis K: the only
    cross-shard reduction in the forward pass is the gating denominator
    sum_j pi_j N_j (reference smoe.py:820) plus the partial expert sums —
    both become psum over the kernel axis.
  * data parallelism for RD sweeps is plain vmap/shard_map over images
    (see fit_many below).

Everything rides ICI collectives; there is no point-to-point communication.
The Adam update runs under GSPMD on the kernel shards (elementwise), so
parameters, optimizer state, and gradients never leave their shard.

The FULL-semantics multi-chip trainer lives in fit/trainer.py
(`Smoe(mesh=...)` shards the block axis around the real per-block loss);
this module provides the kernel-axis TP/EP step and the DP fan-out.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smoe_tpu.config import SmoeConfig
from smoe_tpu.core import losses as Lo
from smoe_tpu.core.model import (expert_regression, fake_quant_unit, gating,
                                 maha_from_A)
from smoe_tpu.core.params import SmoeParams, assemble_A
from smoe_tpu.core.quant import apply_qat


def make_mesh(n_blocks: int, n_kernels: int = 1,
              devices=None) -> Mesh:
    """Create a (blocks, kernels) device mesh."""
    devices = devices if devices is not None else jax.devices()
    n = n_blocks * n_kernels
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(n_blocks, n_kernels)
    return Mesh(dev, ("b", "k"))


def _param_specs(params: SmoeParams) -> SmoeParams:
    """PartitionSpec pytree: kernel-indexed leaves sharded on 'k'."""
    def spec(name, x):
        if x is None:
            return None
        if name in ("motion", "sv", "sv_bw_diag", "sv_bw_corr"):
            return P()
        return P("k")
    return SmoeParams(**{f: spec(f, getattr(params, f))
                         for f in SmoeParams.FIELDS})


def _sharded_forward(eff: SmoeParams, cfg: SmoeConfig, coords: jnp.ndarray,
                     kmask: jnp.ndarray, kernel_axis: str):
    """Forward with the kernel axis sharded.

    Built entirely from the canonical math in core/model.py — maha on the
    local K shard, then gating/expert_regression with kernel_axis set (one
    psum each for the gating denominator and the partial expert sums).
    """
    A = assemble_A(eff, cfg)
    maha = maha_from_A(A, eff.musX, cfg, coords)
    diag_A = jnp.diagonal(A, axis1=1, axis2=2)
    w_e = gating(maha, eff.pis, diag_A, cfg, kmask, kernel_axis=kernel_axis)
    res = expert_regression(w_e, coords, eff.nu_e, eff.gamma_e, cfg,
                            kernel_axis=kernel_axis)
    res = jnp.clip(res, 0.0, 1.0)
    res = fake_quant_unit(res, cfg.precision)
    survivors = jnp.any(w_e > cfg.minimum_influence, axis=0)
    return res, survivors


def make_sharded_train_step(cfg: SmoeConfig, mesh: Mesh, tx,
                            block_weight: float):
    """Build the jitted multi-chip train step.

    Inputs at call time:
      params     SmoeParams, kernel leaves sharded P('k')
      opt_state  matching sharding
      coords     (B, Nb, d)   sharded P('b')
      targets    (B, Nb, C)   sharded P('b')
      klists     (B, K)       sharded P('b', 'k')
      reg        (pis_l1, u_l1) scalars

    One step == one full sweep over all blocks with psum-accumulated grads
    (gradient accumulation across the block axis), then the Adam update on
    the kernel shards.
    """
    def device_fn(params, coords, targets, klists, pis_l1, u_l1):
        def block_loss(p, c_blk, t_blk, kmask):
            # QAT mode 3's data-derived bounds pmin/pmax over the kernel
            # shards so they stay global (core/quant._masked_min_max)
            eff = apply_qat(p, cfg, kernel_axis="k")
            res, _ = _sharded_forward(eff, cfg, c_blk, kmask, "k")
            la = Lo.pixel_loss(res, t_blk, cfg)
            active = kmask & (eff.pis > 0)
            num_active = jax.lax.psum(jnp.sum(eff.pis > 0), "k")
            norm = (num_active.astype(jnp.float32)
                    if cfg.kernel_count_as_norm_l1 else float(cfg.start_pis))
            reg1 = pis_l1 * jax.lax.psum(
                jnp.sum(jnp.where(active, eff.pis, 0.0)), "k") / norm
            from smoe_tpu.core.params import assemble_A
            diag_A = jnp.diagonal(assemble_A(eff, cfg), axis1=1, axis2=2)
            reg2 = u_l1 * jax.lax.psum(
                jnp.sum(jnp.where(active[:, None], diag_A, 0.0)), "k")
            return la.loss_pixel + reg1 + reg2, la.mse

        grad_fn = jax.value_and_grad(block_loss, has_aux=True)

        def body(carry, xs):
            g_acc, loss_acc, mse_acc = carry
            c_blk, t_blk, kmask = xs
            (loss, mse), g = grad_fn(params, c_blk, t_blk, kmask)
            g_acc = jax.tree_util.tree_map(lambda a, b: a + b, g_acc, g)
            return (g_acc, loss_acc + block_weight * loss,
                    mse_acc + block_weight * mse), None

        from smoe_tpu.parallel.compat import pvary
        zero_g = jax.tree_util.tree_map(
            lambda x: pvary(jnp.zeros_like(x), "b"), params)
        zero_s = pvary(jnp.float32(0.0), "b")
        (grads, loss, mse), _ = jax.lax.scan(
            body, (zero_g, zero_s, zero_s), (coords, targets, klists))

        # gradient accumulation across the block axis (DP/SP collective)
        grads = jax.lax.psum(grads, "b")
        loss = jax.lax.psum(loss, "b")
        mse = jax.lax.psum(mse, "b")
        return grads, loss, mse

    import optax
    from smoe_tpu.parallel.compat import shard_map as _shard_map

    @jax.jit
    def step(params, opt_state, coords, targets, klists, pis_l1, u_l1):
        specs = _param_specs(params)
        grads, loss, mse = _shard_map(
            device_fn, mesh=mesh,
            in_specs=(specs, P("b"), P("b"), P("b", "k"), P(), P()),
            out_specs=(specs, P(), P()),
        )(params, coords, targets, klists, pis_l1, u_l1)
        # Adam is elementwise: GSPMD keeps the update on the kernel shards.
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse

    return step


def shard_inputs(mesh: Mesh, params: SmoeParams, coords, targets, klists):
    """Device_put everything with the canonical shardings."""
    specs = _param_specs(params)
    pshard = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s) if s is not None else None, specs,
        is_leaf=lambda x: isinstance(x, P) or x is None)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        params, pshard)
    coords = jax.device_put(coords, NamedSharding(mesh, P("b")))
    targets = jax.device_put(targets, NamedSharding(mesh, P("b")))
    klists = jax.device_put(klists, NamedSharding(mesh, P("b", "k")))
    return params, coords, targets, klists


def fit_many(images: jnp.ndarray, cfg: SmoeConfig, steps: int = 100,
             mesh: Optional[Mesh] = None, opt_cfg=None,
             pis_l1=0.0, u_l1=0.0, block_shape=None,
             refresh_every: Optional[int] = None,
             ls_init: bool = False):
    """Data-parallel RD-sweep fan-out: fit M independent SMoE models, one
    (or more) per device (SURVEY §2.2 DP row).

    Full fitting semantics, not a toy: the per-model loss is the trainer's
    `_block_loss` (QAT fake-quant inside, pis/A-L1 regularizers) and the
    optimizer is the real 5-LR multi_transform rig (`make_tx`), both
    vmapped over the model axis and sharded over the mesh.

    images: (M, *spatial, C) equal-shaped batch — repeat one image M times
            to sweep regularizer weights for an RD curve.
    pis_l1 / u_l1: scalar or (M,) per-model regularizer weights.
    block_shape: pixels per block per dim (or set cfg.block_shape) — each
            model sweeps its blocks with accumulated gradients and
            per-block kernel lists, exactly like `Smoe`'s block training
            (reference smoe.py:1145-1151, 1785-1790); default: global fit
            (one block).  Lists refresh from influence-culling survivors
            each sweep (reference smoe.py:1763-1766).
    refresh_every: every N sweeps additionally run the PROBE refresh
            (`update_kernel_lists`, reference smoe.py:2287-2365) vmapped
            over the model axis, so kernels that migrate toward a block
            re-enter its list — the analog of `Smoe.update_kernel_list`'s
            ukl cadence (default None: survivor feedback only).
    ls_init: run the closed-form LS expert init (fit/lsinit.py, kernel
            mode + line search) vmapped over the model axis before the
            first sweep — the fan-out analog of `Smoe.ls_init_experts`.
    Overlap (cfg.overlap, reference smoe.py:18-35) and SSIM optimization
    (cfg.ssim_opt) fan out too: the per-model loss IS the trainer's
    `_block_loss`, which handles both.  Only the SV residual stays
    Smoe-only (per-pixel SV state is per-image host bookkeeping).
    Returns (batched final SmoeParams with leading M axis, (M,) final MSEs).
    """
    import optax
    from smoe_tpu.config import OptConfig
    from smoe_tpu.core.init import init_params
    from smoe_tpu.fit.blocks import (_block_view, build_blockset,
                                     initialize_kernel_lists)
    from smoe_tpu.fit.trainer import (RegWeights, _block_loss,
                                      effective_params, make_tx)

    assert not cfg.train_svs, \
        "fit_many: the SV residual is Smoe-only (per-image SV state)"
    imgs = np.asarray(images, np.float32)
    m = imgs.shape[0]
    ps = [init_params(imgs[i], cfg) for i in range(m)]
    musX_grid = None
    if cfg.use_diff_center:
        # same grid for every model (function of cfg + image shape only)
        musX_grid = jnp.asarray(ps[0].musX)
        ps = [p.replace(musX=np.zeros_like(p.musX)) for p in ps]
    batched = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *ps)

    # Block geometry is shared across models (equal shapes); the global fit
    # is the one-block special case of the same sweep.  ONE blockset gives
    # coords/probes/valid; per-image targets reuse its geometry via
    # _block_view instead of rebuilding a blockset per image.
    bs = block_shape or cfg.block_shape or None
    bset = build_blockset(imgs[0], cfg, bs)
    coords = bset.coords                               # (B, Nb, d)
    B = int(coords.shape[0])
    targets = jnp.stack([
        bset.targets if i == 0
        else jnp.asarray(_block_view(imgs[i], bset.block_valued,
                                     cfg.overlap))
        for i in range(m)])                            # (m, B, Nb, C)
    valid = bset.valid if cfg.overlap > 0 else None
    r1 = jnp.broadcast_to(jnp.asarray(pis_l1, jnp.float32), (m,))
    r2 = jnp.broadcast_to(jnp.asarray(u_l1, jnp.float32), (m,))

    tx = make_tx(cfg, opt_cfg or OptConfig())
    opt_state = jax.vmap(tx.init)(batched)
    if B == 1:
        kmasks = jnp.ones((m, 1, cfg.capacity), bool)
    else:
        # all models share the init-time lists (A/musX/pis inits are
        # image-independent); survivor feedback diverges them per model
        eff0 = effective_params(
            jax.tree_util.tree_map(jnp.asarray, ps[0]), cfg, musX_grid)
        kl0 = initialize_kernel_lists(eff0.A, eff0.musX, eff0.pis, cfg, bset)
        kmasks = jnp.tile(kl0[None], (m, 1, 1))       # (m, B, K)
    block_padded = bset.block_padded
    bw = 1.0 / B

    if ls_init:
        from smoe_tpu.fit.lsinit import (_accumulate, _line_search_t,
                                         _solve_kernel)
        lw = jnp.ones(coords.shape[:2], jnp.float32)

        def solve_one(p, tgt, km):
            eff = effective_params(p, cfg, musX_grid)
            G, bv = _accumulate(eff, cfg, coords, tgt, km, bset.valid,
                                None, lw, None, False)
            nu, gam = _solve_kernel(G, bv, p.nu_e, p.gamma_e, cfg, 1e-6,
                                    0.0)
            t = _line_search_t(eff, cfg, coords, tgt, km, bset.valid,
                               None, lw, None, p.nu_e, p.gamma_e,
                               nu - p.nu_e, gam - p.gamma_e)
            return p.replace(nu_e=p.nu_e + t * (nu - p.nu_e),
                             gamma_e=p.gamma_e + t * (gam - p.gamma_e))

        batched = jax.vmap(solve_one)(batched, targets, kmasks)

    def one_step(p, s, km, tgt, w1, w2):
        reg = RegWeights(w1, w2, jnp.float32(0.0))

        def block_loss_fn(pp, c_blk, t_blk, kmask):
            return _block_loss(pp, cfg, c_blk, t_blk, kmask, valid, None,
                               reg, musX_grid, None, block_padded)

        grad_fn = jax.value_and_grad(block_loss_fn, has_aux=True)
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, p)

        def body(carry, xs):
            g_acc, l_acc, mse_acc = carry
            c_blk, t_blk, kmask = xs
            (l, (mse, surv, *_)), g = grad_fn(p, c_blk, t_blk, kmask)
            g_acc = jax.tree_util.tree_map(lambda a, b: a + b, g_acc, g)
            return (g_acc, l_acc + bw * l, mse_acc + bw * mse), surv

        # one sweep over the blocks with accumulated grads, one update
        (g, l, mse), survs = jax.lax.scan(
            body, (zero_g, jnp.float32(0.0), jnp.float32(0.0)),
            (coords, tgt, km))
        upd, s = tx.update(g, s, p)
        # survivor feedback: next sweep skips influence-culled kernels
        # (reference smoe.py:1763-1766), same as the trainer's kernel lists
        return optax.apply_updates(p, upd), s, survs, l, mse

    @functools.partial(jax.jit, static_argnums=(6,))
    def run(batched, opt_state, kmasks, targets, r1, r2, n_steps):
        def body(carry, _):
            b, s, km = carry
            b, s, km, l, mse = jax.vmap(one_step)(b, s, km, targets, r1, r2)
            return (b, s, km), (l, mse)
        (b, s, km), (ls, mses) = jax.lax.scan(
            body, (batched, opt_state, kmasks), None, length=n_steps)
        return b, s, km, mses[-1]

    @jax.jit
    def probe_refresh(batched, kmasks):
        from smoe_tpu.fit.blocks import update_kernel_lists

        def one(p, km):
            eff = effective_params(p, cfg, musX_grid)
            return update_kernel_lists(eff.A, eff.musX, eff.pis, cfg,
                                       bset, km)
        return jax.vmap(one)(batched, kmasks)

    if mesh is not None:
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        targets = jax.device_put(targets, sh)
        r1 = jax.device_put(r1, sh)
        r2 = jax.device_put(r2, sh)
        kmasks = jax.device_put(kmasks, sh)
        batched = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batched)

    seg = steps if not refresh_every or B == 1 else int(refresh_every)
    done = 0
    mse = np.zeros((m,), np.float32)
    while done < steps:
        n = min(seg, steps - done)
        batched, opt_state, kmasks, mse = run(
            batched, opt_state, kmasks, targets, r1, r2, n)
        done += n
        if done < steps:
            kmasks = probe_refresh(batched, kmasks)
    return batched, np.asarray(mse)
