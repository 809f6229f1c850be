"""SMoE fitting: jitted block-sweep training with optax multi-group Adam.

This replaces the reference's TF1 rig — 5 Adam optimizers with manual
accumulator variables and one session.run per block per iteration
(reference smoe.py:1079-1204 set_optimizer, :1485-1603 train,
:1606-1793 run_batched) — with ONE compiled XLA program per validation
interval (run_batched_chunk):

    lax.scan over sweeps
      lax.scan over pixel blocks
        -> value_and_grad of the per-block loss (QAT fake-quant inside;
           fused Pallas gate+expert kernel on TPU)
        -> f32 gradient accumulation in the scan carry
      -> optax multi_transform update (per-group LRs)
      -> kernel lists <- influence-culling survivors

Measured on the v5e tunnel this is a 29x wall-clock win over per-iteration
dispatch (4 ms vs 123 ms per iteration at 512^2).

The public `Smoe` class mirrors the reference class's API surface
(smoe.py:37: train, run_batched, get_params/get_best_params,
get_reconstruction/get_qreconstruction, get_weight_matrix(_argmax),
checkpoint/restore, reinit_inc/apply_inc).
"""

from __future__ import annotations

import pickle

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smoe_tpu.config import OptConfig, SmoeConfig
from smoe_tpu.core import losses as L
from smoe_tpu.core.init import get_batch_shape, init_params
from smoe_tpu.core.model import (ForwardOut, fake_quant_unit, gating,
                                 expert_regression, kernel_quadratics,
                                 maha_from_A, quadratic_features)
from smoe_tpu.core.params import SmoeParams, assemble_A
from smoe_tpu.core.quant import apply_qat
from smoe_tpu.core.ssim import ssim_loss
from smoe_tpu.fit.blocks import (BlockSet, build_blockset,
                                 initialize_kernel_lists, probe_points,
                                 row_chunks, stitch_blocks,
                                 update_kernel_lists)
from smoe_tpu.video.motion import transform_coords


class RegWeights(NamedTuple):
    pis_l1: jnp.ndarray
    u_l1: jnp.ndarray
    sv_l1_sub_l2: jnp.ndarray


class SweepMetrics(NamedTuple):
    loss: jnp.ndarray
    mse: jnp.ndarray
    num_pi: jnp.ndarray
    num_sv: jnp.ndarray
    survivors: jnp.ndarray      # (B, K)


# --------------------------------------------------------------------------
# effective (post-QAT) parameter view used by forward/eval
# --------------------------------------------------------------------------

class EffParams(NamedTuple):
    """Assembled, fake-quantized parameters as consumed by the forward pass
    (the q* tensors + assembled A of reference smoe.py:473-753)."""
    A: jnp.ndarray
    musX: jnp.ndarray
    nu_e: jnp.ndarray
    gamma_e: jnp.ndarray
    pis: jnp.ndarray
    motion: Optional[jnp.ndarray]


def effective_params(params: SmoeParams, cfg: SmoeConfig,
                     musX_grid: Optional[jnp.ndarray],
                     kernel_axis: Optional[str] = None) -> EffParams:
    eff = apply_qat(params, cfg, kernel_axis=kernel_axis)
    musX = eff.musX + musX_grid if (cfg.use_diff_center and musX_grid
                                    is not None) else eff.musX
    return EffParams(A=assemble_A(eff, cfg), musX=musX, nu_e=eff.nu_e,
                     gamma_e=eff.gamma_e, pis=eff.pis, motion=eff.motion)


def _sv_residual(coords: jnp.ndarray, sv_rows: jnp.ndarray,
                 bw_diag: jnp.ndarray, bw_corr: jnp.ndarray,
                 thr_sv: jnp.ndarray):
    """Support-vector residual on a block (reference smoe.py:688-709).

    Each pixel owns an RBF with its own steering factor A_SV:
        k[b, a] = exp(-(x_b - x_a)^T A_a A_a^T (x_b - x_a))
        res_sv[b] = sum_a k[b, a] * SV_a   (SVs below thr_sv zeroed)
    Evaluated through the same quadratic-feature matmul as the kernel maha
    (exp(-1 * m) == exp(-0.5 * m') with B' = 2 A A^T).
    Returns (res_sv (Nb,), sv_eff (Nb, 1)).
    """
    d = coords.shape[1]
    diag = jnp.diagonal(bw_diag, axis1=1, axis2=2)
    A_sv = jnp.einsum("ni,ij->nij", diag, jnp.eye(d, dtype=bw_diag.dtype)) \
        + jnp.tril(bw_corr, k=-1)
    B_sv = 2.0 * jnp.einsum("nlm,nkm->nlk", A_sv, A_sv)
    q_sv = kernel_quadratics(B_sv, coords)
    phi = quadratic_features(coords)
    # exact f32: TPU's default single-bf16-pass dot corrupts the
    # quadratic-feature cancellation once bandwidths sharpen (see
    # core/model.py _EXACT)
    maha = jnp.dot(phi, q_sv.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    # the quadratic form is PSD by construction; restore the invariant
    # under f32 cancellation so exp(...) <= 1 (same clamp as the kernel
    # gating path, core/model.py maha_from_A)
    maha = jnp.maximum(maha, 0.0)
    kmat = jnp.exp(-0.5 * maha)
    sv_eff = sv_rows * (jnp.abs(sv_rows) >= thr_sv)
    res_sv = jnp.dot(kmat, sv_eff, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)[:, 0]
    return res_sv, sv_eff


def _forward_eff(eff: EffParams, cfg: SmoeConfig, coords: jnp.ndarray,
                 kernel_mask: jnp.ndarray,
                 model_mask: Optional[jnp.ndarray],
                 fused: Tuple[bool, bool] = (False, False),
                 sv_add: Optional[jnp.ndarray] = None,
                 spatial: Optional[Tuple[int, ...]] = None,
                 kernel_axis: Optional[str] = None) -> ForwardOut:
    """Forward from the effective view (handles motion + dual model).

    fused = (enabled, interpret): route through the Pallas gate+expert
    kernel when enabled and the config allows (no dual model, no coordinate
    gradients, i.e. not train_trafo video).
    sv_add: (Nb,) precomputed SV residual added to the Y channel pre-clip.
    kernel_axis: mesh axis name when the kernel rows are sharded (TP/EP):
    the gating denominator and the partial expert sums each psum over it
    (the only cross-shard reductions in the forward, reference smoe.py:820);
    forces the XLA path (the fused Pallas kernel normalizes in-kernel and
    cannot psum mid-flight).
    """
    coords_raw = None
    if eff.motion is not None and cfg.dim_domain == 3:
        coords_t = transform_coords(coords, eff.motion, cfg.num_params_model,
                                    cfg.num_frames)
        # the mask's presence IS the dual-model signal: a reloaded pickle
        # carries the mask but not necessarily cfg.dual_model (round 3 —
        # reconstruct silently gated every kernel on the transformed
        # domain, 62% of pixels wrong)
        if model_mask is not None:
            coords_raw = coords
        coords_in = coords_t
    else:
        coords_in = coords
    if (fused[0] and kernel_axis is None and not cfg.train_inverse_cov
            and not (eff.motion is not None and cfg.train_trafo)):
        from smoe_tpu.core.model import forward_fused
        return forward_fused(eff.A, eff.musX, eff.nu_e, eff.gamma_e,
                             eff.pis, cfg, coords_in, kernel_mask,
                             interpret=fused[1], sv_add=sv_add,
                             coords_raw=coords_raw,
                             model_mask=model_mask, spatial=spatial,
                             k_cap=fused[2] if len(fused) > 2 else None)
    maha = maha_from_A(eff.A, eff.musX, cfg, coords_in, coords_raw, model_mask)
    diag_A = jnp.diagonal(eff.A, axis1=1, axis2=2)
    w_e = gating(maha, eff.pis, diag_A, cfg, kernel_mask,
                 kernel_axis=kernel_axis)
    res = expert_regression(w_e, coords_in, eff.nu_e, eff.gamma_e, cfg,
                            kernel_axis=kernel_axis)
    if sv_add is not None:
        res = res.at[:, 0].add(sv_add)    # Y channel (reference smoe.py:854)
    res = jnp.clip(res, 0.0, 1.0)
    res = fake_quant_unit(res, cfg.precision)
    survivors = jnp.any(w_e > cfg.minimum_influence, axis=0)
    return ForwardOut(res=res, w_e=w_e, survivors=survivors, maha=maha)


# --------------------------------------------------------------------------
# per-block loss
# --------------------------------------------------------------------------

def _block_loss(params: SmoeParams, cfg: SmoeConfig,
                coords: jnp.ndarray, targets: jnp.ndarray,
                kernel_mask: jnp.ndarray, valid: Optional[jnp.ndarray],
                loss_w: Optional[jnp.ndarray], reg: RegWeights,
                musX_grid: Optional[jnp.ndarray],
                model_mask: Optional[jnp.ndarray],
                block_padded: Tuple[int, ...],
                fused: Tuple[bool, bool] = (False, False),
                sv_blk=None, thr_sv=None,
                kernel_axis: Optional[str] = None):
    """Loss of one block; differentiated w.r.t. raw params (QAT is STE).

    Mirrors the loss assembly of reference smoe.py:899-1051.
    sv_blk: optional (sv_rows, bw_diag, bw_corr) slices for this block.
    kernel_axis: mesh axis when kernel rows are sharded (TP/EP): the QAT-3
    bounds, gating denominator, expert sums, active-kernel count, and the
    regularizer sums each become one psum over that axis; everything else
    runs on the local K/nk rows.
    """
    eff = effective_params(params, cfg, musX_grid, kernel_axis=kernel_axis)
    sv_add, sv_eff = None, None
    if sv_blk is not None:
        sv_add, sv_eff = _sv_residual(coords, *sv_blk, thr_sv)
    out = _forward_eff(eff, cfg, coords, kernel_mask, model_mask,
                       fused=fused, sv_add=sv_add, spatial=block_padded,
                       kernel_axis=kernel_axis)

    if cfg.ssim_opt:
        c = targets.shape[-1]
        res_img = out.res.reshape(block_padded + (c,))
        tgt_img = targets.reshape(block_padded + (c,))
        ov = cfg.overlap
        if ov > 0:
            sl = tuple(slice(ov, s - ov) for s in block_padded)
            res_img = res_img[sl]
            tgt_img = tgt_img[sl]
        loss_pix = ssim_loss(res_img, tgt_img, cfg.use_yuv,
                             ndim=cfg.dim_domain)
        la = L.pixel_loss(out.res, targets, cfg, None, valid)
        mse = la.mse
        err_map = la.err_map
    else:
        la = L.pixel_loss(out.res, targets, cfg, loss_w, valid)
        loss_pix, mse, err_map = la.loss_pixel, la.mse, la.err_map

    active = kernel_mask & (eff.pis > 0)
    num_active = jnp.sum(eff.pis > 0)
    s_pis = jnp.sum(jnp.where(active, eff.pis, 0.0))
    diag_A = jnp.diagonal(eff.A, axis1=1, axis2=2)
    s_diag = jnp.sum(jnp.where(active[:, None], diag_A, 0.0))
    if kernel_axis is not None:
        # the regularizers + live-count sum over ALL kernels (reference
        # smoe.py:1012, 1018-1027, 1044) — one fused psum over the shards
        num_active, s_pis, s_diag = jax.lax.psum(
            (num_active, s_pis, s_diag), kernel_axis)
    norm = (num_active.astype(jnp.float32) if cfg.kernel_count_as_norm_l1
            else float(cfg.start_pis))
    loss = loss_pix + reg.pis_l1 * s_pis / norm + reg.u_l1 * s_diag
    if sv_eff is not None:
        # normalize by the FED SV count (== block pixels without
        # subsampling; == sample_n with it, matching the reference's
        # per-fed-pixel normalization, smoe.py:1029-1036 + :1664-1682)
        loss = loss + L.sv_l1_sub_l2_reg(sv_eff, reg.sv_l1_sub_l2,
                                         int(sv_eff.shape[0]))
    return loss, (mse, out.survivors, err_map, num_active)


def make_tx(cfg: SmoeConfig, opt_cfg: OptConfig, inc: bool = False):
    """optax multi_transform mirroring the reference's 5-optimizer rig
    (reference smoe_test.py:84-97, smoe.py:1079-1204): per-group Adam LRs
    for {nu, gamma, musX}, {pis}, {A}, {SV}, {motion}, optional |g| clip."""
    oc = opt_cfg

    def adam_or_zero(lr, enabled=True):
        chain = []
        if oc.grad_clip_value_abs is not None:
            chain.append(optax.clip(oc.grad_clip_value_abs))
        chain.append(optax.adam(lr) if (enabled and lr != 0)
                     else optax.set_to_zero())
        return optax.chain(*chain)

    transforms = {
        "nu": adam_or_zero(oc.base_lr),
        "gamma": adam_or_zero(oc.base_lr, cfg.train_gammas),
        "musx": adam_or_zero(oc.base_lr, cfg.train_musx),
        "pis": adam_or_zero(oc.base_lr / oc.lr_div, cfg.train_pis),
        "A": adam_or_zero(oc.base_lr * oc.lr_mult),
        "sv": adam_or_zero(oc.base_lr * oc.lr_mult_sv, cfg.train_svs),
        "motion": adam_or_zero(oc.base_lr, cfg.train_trafo and not inc),
    }

    def labels(params):
        return SmoeParams(
            musX="musx", a_diag="A", a_corr="A", pis="pis",
            nu_e="nu", gamma_e="gamma",
            motion=None if params.motion is None else "motion",
            sv=None if params.sv is None else "sv",
            sv_bw_diag=None if params.sv_bw_diag is None else "sv",
            sv_bw_corr=None if params.sv_bw_corr is None else "sv")

    return optax.multi_transform(transforms, labels)


def fit_mesh_to_blocks(mesh, num_blocks: int):
    """Elastic fleet-shape adaptation (VERDICT r2 #6): when the block count
    does not divide the mesh's 'b' axis — e.g. resuming a checkpoint on a
    differently-sized fleet (the reference analog is job-array resume,
    smoe_test.py:112-116) — shrink the 'b' axis to the largest divisor of
    the block count and train on that device subset.

    Only legal when the sub-mesh still spans every participating process
    (in multi-process JAX a program cannot run on a mesh that orphans a
    process's devices); otherwise the original divisibility error stands.
    """
    from jax.sharding import Mesh
    nb = int(mesh.shape["b"])
    B = int(num_blocks)
    if B % nb == 0:
        return mesh
    nb2 = max(d for d in range(1, min(nb, B) + 1) if B % d == 0)
    sub = mesh.devices[:nb2]
    procs_all = {d.process_index for d in mesh.devices.flat}
    procs_sub = {d.process_index for d in sub.flat}
    if procs_sub != procs_all:
        raise ValueError(
            f"{B} blocks do not divide over the {nb}-way 'b' mesh axis, "
            f"and shrinking to {nb2} devices would orphan processes "
            f"{sorted(procs_all - procs_sub)}; choose start_batches as a "
            f"multiple of the fleet size")
    print(f"elastic mesh: {B} blocks do not divide the {nb}-way 'b' axis; "
          f"training on {nb2} of {nb} devices")
    return Mesh(sub, mesh.axis_names)


# --------------------------------------------------------------------------
# compiled sweeps (built per (cfg, static flags) by _Compiled)
# --------------------------------------------------------------------------

class _Compiled:
    """Holds the jitted sweep functions for one Smoe instance."""

    def __init__(self, cfg: SmoeConfig, bset: BlockSet, opt_cfg: OptConfig,
                 num_pixel: int, mesh=None):
        self.cfg = cfg
        self.bset = bset
        self.opt_cfg = opt_cfg
        self.num_pixel = num_pixel
        self.mesh = mesh
        self.nk = 1
        if mesh is not None:
            nb_dev = mesh.shape["b"]
            B = int(bset.coords.shape[0])
            assert B % nb_dev == 0, (
                f"{B} blocks do not divide over the {nb_dev}-way 'b' mesh "
                f"axis; choose start_batches as a multiple of the mesh size")
            if "k" in mesh.axis_names:
                self.nk = int(mesh.shape["k"])
            if self.nk > 1:
                assert cfg.capacity % self.nk == 0, (
                    f"kernel capacity {cfg.capacity} does not divide over "
                    f"the {self.nk}-way 'k' mesh axis")
        # kernel_axis: set when the ('b','k') mesh shards the K rows — the
        # TP/EP strategy of SURVEY §2.2 inside the FULL trainer: params,
        # optimizer state, and gradients live on their kernel shard; the
        # forward needs exactly two psums (gating denominator + partial
        # expert sums, reference smoe.py:820) plus one for the QAT-3 bounds
        # and one for the regularizer sums.
        self.kernel_axis = "k" if self.nk > 1 else None
        self.block_weight = float(np.prod(bset.block_valued)) / num_pixel
        from smoe_tpu.core.model import resolve_pallas
        if cfg.use_pallas == "packed":
            # the in-kernel tile-culling variant was REMOVED in round 4:
            # it measured slower than capped-dense at every size tried
            # (90 vs 31.5 ms @K=576; 139 vs 64 @K=2304) and conclusively
            # faulted the TPU worker at the 4K/K=9216 trainer config
            # (bench_4k --packed, 2026-08-19; ROADMAP item 5) — the code
            # lives in git history (kernels/gate_expert_sparse.py,
            # pre-round-4)
            raise ValueError(
                "use_pallas='packed' was removed: capped-dense ('auto') "
                "is faster at every measured size and the packed kernel "
                "faulted the TPU runtime at large K (see ROADMAP.md)")
        self.pallas = resolve_pallas(cfg.use_pallas)
        if self.kernel_axis is not None:
            # the fused Pallas kernel normalizes the gating in-VMEM and
            # cannot psum mid-kernel; under K-sharding each device runs the
            # XLA path on its K/nk rows (already the narrow-width win that
            # capped-dense emulates on one chip)
            self.pallas = (False, False)
        self._train_fns: Dict[Any, Any] = {}
        # raw (un-jitted) sweep pieces cached per train_sweep_fn key, so
        # phase_fns can time fwd-only / fwd+bwd at the EXACT production
        # fused spec + capped width (VERDICT r4 #4: auditable MFU)
        self._phase_parts: Dict[Any, Any] = {}
        self.tx_main = self._make_tx(inc=False)
        self.tx_inc = self._make_tx(inc=True)

    # ---- optimizers ----
    def _make_tx(self, inc: bool):
        return make_tx(self.cfg, self.opt_cfg, inc=inc)

    # ---- row masks for the main/inc split ----
    def _row_masks(self, capacity: int):
        cfg = self.cfg
        if cfg.add_kernel_slots > 0:
            num_inc = cfg.start_pis
            main = np.ones((capacity,), bool)
            main[capacity - num_inc:] = False
        else:
            main = np.ones((capacity,), bool)
        return jnp.asarray(main)

    @staticmethod
    def _mask_grad_rows(grads: SmoeParams, row_mask: jnp.ndarray,
                        keep_main: bool) -> SmoeParams:
        """Zero gradient rows outside the main (or inc) region; non-kernel
        leaves (motion, sv) follow the main optimizer."""
        sel = row_mask if keep_main else ~row_mask

        def mask_leaf(name, g):
            if g is None:
                return None
            if name in ("motion", "sv", "sv_bw_diag", "sv_bw_corr"):
                return g if keep_main else jnp.zeros_like(g)
            shape = (g.shape[0],) + (1,) * (g.ndim - 1)
            return g * sel.reshape(shape).astype(g.dtype)

        return SmoeParams(**{f: mask_leaf(f, getattr(grads, f))
                             for f in SmoeParams.FIELDS})

    # ---- sweeps ----
    def train_sweep_fn(self, train_orig: bool, train_inc: bool,
                       sampling_pct: int, use_loss_mask: bool,
                       n_steps: int = 1, k_cap: Optional[int] = None):
        """Jitted multi-sweep: `n_steps` full block sweeps (each = one
        optimizer step) inside ONE XLA program via lax.scan.

        The reference pays a host->device round trip per block per iteration
        (feed_dict, SURVEY §3.1); running a whole validation interval
        device-side amortizes dispatch/tunnel latency to once per chunk.
        Kernel lists are refreshed from the influence-culling survivors
        between sweeps inside the scan (reference smoe.py:1763-1766).
        """
        key = (train_orig, train_inc, sampling_pct, use_loss_mask, n_steps,
               k_cap)
        if key in self._train_fns:
            return self._train_fns[key]
        fused_spec = self.pallas + (k_cap,)

        cfg = self.cfg
        bset = self.bset
        bw = self.block_weight
        ka = self.kernel_axis
        row_mask = self._row_masks(cfg.capacity)
        sample_n = int(round(np.prod(bset.block_padded) * sampling_pct / 100.0))
        do_sample = (sampling_pct < 100 and not cfg.ssim_opt
                     and cfg.overlap == 0)
        with_sv = cfg.train_svs
        nb = int(np.prod(bset.block_padded))

        def loss_for_block(params, coords, targets, kmask, lw, reg,
                           musX_grid, model_mask, probs, rng, bidx, thr_sv):
            lw = lw if use_loss_mask else None
            valid = bset.valid if cfg.overlap > 0 else None
            if bset.train_mask is not None:
                tm = bset.train_mask[bidx]        # this block's view mask
                if tm.dtype == jnp.bool_:
                    valid = tm if valid is None else valid & tm
                else:   # float corner-weight mask (cfg.lf_corner_weight)
                    valid = tm if valid is None else tm * valid
            sv_blk = None
            if with_sv:
                if bset.sv_index is not None:
                    # shared-grid SVs (cfg.sv_shared_grid): gather this
                    # block's pixel rows from the global grid — the gather's
                    # VJP scatter-adds, so overlapping blocks co-train ONE
                    # SV per pixel; edge-pad gathers (dummy row) are zeroed
                    svix = bset.sv_index[bidx]
                    real = (svix < params.sv.shape[0] - 1)[:, None]
                    sv_blk = (params.sv[svix] * real,
                              params.sv_bw_diag[svix],
                              params.sv_bw_corr[svix])
                else:
                    off = bidx * nb
                    sv_blk = (
                        jax.lax.dynamic_slice_in_dim(params.sv, off, nb),
                        jax.lax.dynamic_slice_in_dim(
                            params.sv_bw_diag, off, nb),
                        jax.lax.dynamic_slice_in_dim(
                            params.sv_bw_corr, off, nb))
            if do_sample:
                # error-proportional subsampling without replacement
                # (Gumbel top-k ~ np.random.choice(p=...), reference
                # smoe.py:1664-1667)
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(rng, probs.shape, minval=1e-20)))
                scores = jnp.log(jnp.maximum(probs, 1e-20)) + g
                if valid is not None:
                    scores = jnp.where(valid > 0 if valid.dtype != jnp.bool_
                                       else valid, scores, -jnp.inf)
                idx = jax.lax.top_k(scores, sample_n)[1]
                coords = coords[idx]
                targets = targets[idx]
                lw = None if lw is None else lw[idx]
                valid = None
                if sv_blk is not None:
                    # SV rows/bandwidths ride the SAME sampled indices as
                    # their pixels (the reference feeds the SV mask
                    # alongside the sampled block, smoe.py:1664-1682) —
                    # grads flow only to the sampled SVs
                    sv_blk = tuple(a[idx] for a in sv_blk)

            return _block_loss(params, cfg, coords, targets, kmask, valid,
                               lw, reg, musX_grid, model_mask,
                               bset.block_padded, fused=fused_spec,
                               sv_blk=sv_blk, thr_sv=thr_sv, kernel_axis=ka)

        grad_fn = jax.value_and_grad(loss_for_block, has_aux=True)

        mesh = self.mesh

        def sweep_grads(params, coords_all, targets_all, klists, lw_xs, reg,
                        musX_grid, model_mask, probs, rngs, bidxs, thr_sv):
            """Grad accumulation over (this device's share of) the blocks.

            Runs directly single-device; under shard_map over the 'b' mesh
            axis each device scans its local blocks only — the TPU-native
            version of the reference's block-sequential gradient
            accumulation (smoe.py:1145-1151, 1785-1790).
            """
            # NOTE (measured on v5e, 1080p, 16 blocks, K=576): the
            # sequential scan beats a vmapped whole-sweep variant (151 vs
            # 396 ms/iter) — vmap materializes every block's padded
            # phi/xe/residuals in HBM at once while the scan streams them.
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
            zero_s = jnp.float32(0.0)
            if mesh is not None:
                from smoe_tpu.parallel.compat import pvary
                zero_g = jax.tree_util.tree_map(
                    lambda x: pvary(x, "b"), zero_g)
                zero_s = pvary(zero_s, "b")
                if ka is not None and zero_g.motion is not None:
                    # motion grads vary over 'k' too (they flow through the
                    # K-sharded maha), so the accumulator must as well
                    zero_g = zero_g.replace(motion=pvary(zero_g.motion, ka))

            def body(carry, xs):
                g_acc, loss_acc, mse_acc = carry
                coords, targets, kmask, lw, p, r, bidx = xs
                (loss, (mse, surv, _, num_active)), g = grad_fn(
                    params, coords, targets, kmask, lw, reg,
                    musX_grid, model_mask, p, r, bidx, thr_sv)
                g_acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, g_acc, g)
                return ((g_acc, loss_acc + bw * loss,
                         mse_acc + bw * mse), (surv, num_active))

            (grads, loss, mse), (survivors, _) = jax.lax.scan(
                body, (zero_g, zero_s, zero_s),
                (coords_all, targets_all, klists, lw_xs, probs, rngs, bidxs))
            if mesh is not None:
                # gradient accumulation across the block shards (SP/DP
                # collective; SURVEY §2.2 SP row)
                grads = jax.lax.psum(grads, "b")
                loss = jax.lax.psum(loss, "b")
                mse = jax.lax.psum(mse, "b")
                if ka is not None and grads.motion is not None:
                    # motion acts on the coords BEFORE the K-sharded maha,
                    # so each kernel shard holds only its kernels' share of
                    # d loss/d motion — sum the partials.  (SV grads need
                    # no 'k' psum: the SV residual joins AFTER the expert
                    # psum, so every shard computes the full grad already.)
                    grads = grads.replace(
                        motion=jax.lax.psum(grads.motion, ka))
            return grads, loss, mse, survivors

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from smoe_tpu.parallel.compat import shard_map as _shard_map
            if ka is None:
                pspec, mg_spec, mm_spec = P(), P(), P()
                kl_spec = P("b")
            else:
                # kernel-indexed leaves live on their 'k' shard end to end
                # (params, grads, and — via GSPMD through the optax update
                # outside shard_map — the Adam moments as well)
                def _leaf_spec(name):
                    return P() if name in ("motion", "sv", "sv_bw_diag",
                                           "sv_bw_corr") else P("k")
                pspec = SmoeParams(**{f: _leaf_spec(f)
                                      for f in SmoeParams.FIELDS})
                mg_spec, mm_spec = P("k"), P("k")
                kl_spec = P("b", "k")
            sweep_all = _shard_map(
                sweep_grads, mesh=mesh,
                in_specs=(pspec, P("b"), P("b"), kl_spec, P("b"), P(),
                          mg_spec, mm_spec, P("b"), P("b"), P("b"), P()),
                out_specs=(pspec, P(), P(), kl_spec))
        else:
            sweep_all = sweep_grads

        self._phase_parts[key] = (loss_for_block, sweep_all)

        def one_sweep(params, opt_state, inc_opt_state, klists, loss_w, reg,
                      musX_grid, model_mask, probs, rng, thr_sv,
                      coords_all, targets_all):
            B = coords_all.shape[0]
            rngs = jax.random.split(rng, B)
            nb_pix = coords_all.shape[1]
            lw_xs = loss_w if (use_loss_mask and loss_w is not None) \
                else jnp.zeros((B, nb_pix))

            grads, loss, mse, survivors = sweep_all(
                params, coords_all, targets_all, klists, lw_xs, reg,
                musX_grid, model_mask, probs, rngs, jnp.arange(B), thr_sv)

            new_params = params
            if train_orig:
                g_main = self._mask_grad_rows(grads, row_mask, keep_main=True)
                if cfg.train_trafo and g_main.motion is not None:
                    # frame 0 needs no transform (reference smoe.py:1155-1158)
                    m = jnp.ones_like(g_main.motion).at[:, 0].set(0.0)
                    g_main = g_main.replace(motion=g_main.motion * m)
                updates, opt_state = self.tx_main.update(
                    g_main, opt_state, params)
                new_params = optax.apply_updates(new_params, updates)
            if train_inc:
                g_inc = self._mask_grad_rows(grads, row_mask, keep_main=False)
                updates, inc_opt_state = self.tx_inc.update(
                    g_inc, inc_opt_state, params)
                new_params = optax.apply_updates(new_params, updates)

            eff_pis = apply_qat(params, cfg).pis
            num_sv = (jnp.sum(jnp.abs(params.sv) > 5e-3).astype(jnp.int32)
                      if with_sv else jnp.asarray(0, jnp.int32))
            metrics = SweepMetrics(
                loss=loss, mse=mse,
                num_pi=jnp.sum(eff_pis > 0),
                num_sv=num_sv,
                survivors=survivors)
            return new_params, opt_state, inc_opt_state, metrics

        # inc-candidate rows have pis=0 until apply_inc, so a refresh
        # during train_inc would drop them from every list and cut their
        # gradients — keep the host-cadence behavior for inc phases
        refresh = bool(getattr(cfg, "in_graph_ukl", False)) and not train_inc

        def refresh_lists(params, survivors, coords_all, musX_grid,
                          model_mask):
            """Per-sweep in-graph kernel-list refresh: survivors | probe-
            near (cfg.in_graph_ukl).  Same math as the host-side
            update_kernel_list, folded into the compiled sweep so unlisted
            kernels can never drift for more than one sweep (the >10 dB
            decoded-PSNR pathology measured on the CIF recipe, round 3)."""
            eff = effective_params(params, cfg, musX_grid)
            probes = probes_raw = None
            if eff.motion is not None and cfg.dim_domain == 3:
                B, Nb, d = coords_all.shape
                tc = transform_coords(
                    coords_all.reshape(-1, d), eff.motion,
                    cfg.num_params_model, cfg.num_frames).reshape(B, Nb, d)
                probes = probe_points(tc.min(axis=1), tc.max(axis=1),
                                      grid=getattr(cfg, "probe_grid", 3))
                if model_mask is not None:
                    probes_raw = bset.probes
            return update_kernel_lists(
                eff.A, eff.musX, eff.pis, cfg, bset, survivors,
                probes=probes, probes_raw=probes_raw,
                model_mask=model_mask if probes_raw is not None else None)

        def multi(params, opt_state, inc_opt_state, klists, loss_w, reg,
                  musX_grid, model_mask, probs, rng, thr_sv,
                  coords_all, targets_all):
            def body(carry, _):
                params, opt_state, inc_opt_state, klists, rng = carry
                rng, sub = jax.random.split(rng)
                p, o, io, m = one_sweep(params, opt_state, inc_opt_state,
                                        klists, loss_w, reg, musX_grid,
                                        model_mask, probs, sub, thr_sv,
                                        coords_all, targets_all)
                lists_next = m.survivors if not refresh else refresh_lists(
                    p, m.survivors, coords_all, musX_grid, model_mask)
                # max per-block kernel-list count: rides the one metrics
                # pull so run_batched_chunk can adapt the capped-dense
                # width with NO extra device round trip
                kmax = jnp.max(jnp.sum(lists_next, axis=1))
                return ((p, o, io, lists_next, rng),
                        (m.loss, m.mse, m.num_pi, m.num_sv, kmax))

            carry, ys = jax.lax.scan(
                body, (params, opt_state, inc_opt_state, klists, rng),
                None, length=n_steps)
            params, opt_state, inc_opt_state, klists, _ = carry
            return params, opt_state, inc_opt_state, klists, ys

        fn = jax.jit(multi)
        self._train_fns[key] = fn
        return fn

    def eval_sweep_fn(self, with_rec: bool = True, exact: bool = False):
        """Jitted eval sweep.

        with_rec=True: full outputs (stitchable reconstruction, gating
        argmax, error-proportional sampling probs) via the XLA forward.
        with_rec=False: light validation — loss/mse/survivors/num_pi only,
        through the FUSED forward (no (N, K) gating map is ever formed);
        used by train() when nothing consumes the reconstruction.
        exact=True: force the XLA forward even for the light sweep.  Codec
        measurement (quantized-params evals: auto-bd / anchor selection /
        prune sweeps / qm>=1 q-validation) MUST be decode-exact: the fused
        kernel's MXU dots truncate f32 inputs to bf16 and the quadratic-
        feature maha cancels large A^2-scale terms, which measured
        14 dB off on a dequantized 4D LF fit and ~7 dB on dual-model video
        (TPU, round 4) while the XLA path carries Precision.HIGHEST
        (core/model.py) and matches the serving decoder to 1 LSB.  Float
        (training) evals keep the fused path: train-best vs decode parity
        measured <= 0.05 dB on the video headline fits.
        """
        attr = "_eval_fn" if with_rec else (
            "_eval_fn_exact" if exact else "_eval_fn_light")
        if hasattr(self, attr):
            return getattr(self, attr)
        cfg = self.cfg
        bset = self.bset
        bw = self.block_weight
        with_sv = cfg.train_svs
        nb = int(np.prod(bset.block_padded))

        def eval_block(eff, svp, coords, targets, kmask, lw, reg,
                       model_mask, bidx, thr_sv):
            sv_add = jnp.zeros((coords.shape[0],), jnp.float32)
            sv_eff = None
            if with_sv and svp is not None:
                if bset.sv_index is not None:
                    svix = bset.sv_index[bidx]
                    real = (svix < svp[0].shape[0] - 1)[:, None]
                    sv_blk = (svp[0][svix] * real, svp[1][svix],
                              svp[2][svix])
                else:
                    off = bidx * nb
                    sv_blk = (
                        jax.lax.dynamic_slice_in_dim(svp[0], off, nb),
                        jax.lax.dynamic_slice_in_dim(svp[1], off, nb),
                        jax.lax.dynamic_slice_in_dim(svp[2], off, nb))
                sv_add, sv_eff = _sv_residual(coords, *sv_blk, thr_sv)
            use_xla = with_rec or exact
            s = row_chunks(coords.shape[0], int(cfg.capacity)) \
                if use_xla else 1
            w_argmax_pre = None
            if s > 1:
                # row-chunked XLA forward: the dense (Nb, K) gating map
                # stops compiling at production scale (811008 px x 8192
                # kernels = 26.6 GB, k=32 video).  Bit-exact vs the
                # unchunked forward — gating/expert reductions run over
                # the kernel axis only — so decode parity (exact=True)
                # is untouched; the argmax and survivor OR fold per chunk
                # so no (Nb, K) output is ever materialized.
                m = coords.shape[0] // s

                def fwd_chunk(xs):
                    coords_c, sv_c = xs
                    o = _forward_eff(eff, cfg, coords_c, kmask, model_mask,
                                     fused=(False, False),
                                     sv_add=sv_c if with_sv else None,
                                     spatial=bset.block_padded)
                    return (o.res, jnp.argmax(o.w_e, axis=1),
                            o.survivors)

                res_c, wam_c, surv_c = jax.lax.map(
                    fwd_chunk, (coords.reshape(s, m, -1),
                                sv_add.reshape(s, m)))
                out = ForwardOut(res=res_c.reshape(-1, res_c.shape[-1]),
                                 w_e=None, survivors=jnp.any(surv_c, 0),
                                 maha=None)
                w_argmax_pre = wam_c.reshape(-1)
            else:
                out = _forward_eff(eff, cfg, coords, kmask, model_mask,
                                   fused=(False, False) if use_xla
                                   else self.pallas,
                                   sv_add=sv_add if with_sv else None,
                                   spatial=bset.block_padded)
            valid = bset.valid if cfg.overlap > 0 else None
            if bset.train_mask is not None:
                tm = bset.train_mask[bidx]        # this block's view mask
                if tm.dtype == jnp.bool_:
                    valid = tm if valid is None else valid & tm
                else:   # float corner-weight mask (cfg.lf_corner_weight)
                    valid = tm if valid is None else tm * valid
            la = L.pixel_loss(out.res, targets, cfg, lw, valid)
            if cfg.ssim_opt:
                c = targets.shape[-1]
                ov = cfg.overlap
                res_img = out.res.reshape(bset.block_padded + (c,))
                tgt_img = targets.reshape(bset.block_padded + (c,))
                if ov > 0:
                    sl = tuple(slice(ov, s - ov) for s in bset.block_padded)
                    res_img, tgt_img = res_img[sl], tgt_img[sl]
                loss_pix = ssim_loss(res_img, tgt_img, cfg.use_yuv,
                                     ndim=cfg.dim_domain)
            else:
                loss_pix = la.loss_pixel
            active = kmask & (eff.pis > 0)
            num_active = jnp.sum(eff.pis > 0)
            norm = (num_active.astype(jnp.float32)
                    if cfg.kernel_count_as_norm_l1 else float(cfg.start_pis))
            loss = loss_pix + reg.pis_l1 * jnp.sum(
                jnp.where(active, eff.pis, 0.0)) / norm
            diag_A = jnp.diagonal(eff.A, axis1=1, axis2=2)
            loss = loss + reg.u_l1 * jnp.sum(
                jnp.where(active[:, None], diag_A, 0.0))
            if sv_eff is not None:
                # same objective as training (_block_loss): the reference's
                # eval runs the one graph loss incl. the SV penalty
                # (smoe.py:1029-1036, 1051)
                loss = loss + L.sv_l1_sub_l2_reg(sv_eff, reg.sv_l1_sub_l2,
                                                 nb)
            if not with_rec:
                return loss, la.mse, out.survivors
            w_argmax = w_argmax_pre if w_argmax_pre is not None \
                else jnp.argmax(out.w_e, axis=1)
            probs = la.err_map / jnp.maximum(jnp.sum(la.err_map), 1e-30)
            return (loss, la.mse, out.res, w_argmax, out.survivors, probs,
                    sv_add)

        def sweep(eff: EffParams, svp, klists, loss_w, reg, model_mask,
                  thr_sv):
            B = bset.coords.shape[0]
            lw_xs = loss_w if loss_w is not None else jnp.zeros((B, 1))

            def body(carry, xs):
                loss_acc, mse_acc = carry
                coords, targets, kmask, lw, bidx = xs
                out = eval_block(
                    eff, svp, coords, targets, kmask,
                    lw if loss_w is not None else None, reg, model_mask,
                    bidx, thr_sv)
                loss, mse = out[0], out[1]
                return ((loss_acc + bw * loss, mse_acc + bw * mse), out[2:])

            (loss, mse), ys = jax.lax.scan(
                body, (0.0, 0.0),
                (bset.coords, bset.targets, klists, lw_xs, jnp.arange(B)))
            num_pi = jnp.sum(eff.pis > 0)
            if not with_rec:
                (surv,) = ys
                return loss, mse, surv, num_pi
            res, w_am, surv, probs, sv_map = ys
            return loss, mse, res, w_am, surv, probs, num_pi, sv_map

        setattr(self, attr, jax.jit(sweep))
        return getattr(self, attr)

    def phase_fns(self, train_orig: bool, train_inc: bool,
                  sampling_pct: int, use_loss_mask: bool,
                  n_steps: int, k_cap: Optional[int]):
        """Two diagnostic programs matching the production train sweep's
        EXACT fused spec and capped width (same `loss_for_block` /
        `sweep_all` closures), for the per-phase step-time breakdown
        (VERDICT r4 #4):

          fwd      — n_steps sweeps of forward+loss only (the training
                     step's primal, backward dead-code-eliminated)
          fwd_bwd  — n_steps sweeps of forward+backward with the grads
                     consumed (no optimizer / metrics / list refresh)

        Each body depends on the scan carry (a 1e-30-scale perturbation —
        below f32 eps of any operand, a numerical no-op) so XLA cannot
        hoist the loop-invariant computation out and time one iteration
        as n.  Single-device only (the mesh path wraps sweep_grads in
        shard_map; the breakdown is a one-chip roofline diagnostic)."""
        assert self.mesh is None, "phase_fns is a single-device diagnostic"
        key = (train_orig, train_inc, sampling_pct, use_loss_mask, n_steps,
               k_cap)
        pkey = ("phase",) + key
        if pkey in self._train_fns:
            return self._train_fns[pkey]
        # populate the raw-parts cache for this key
        self.train_sweep_fn(train_orig, train_inc, sampling_pct,
                            use_loss_mask, n_steps, k_cap)
        loss_for_block, sweep_all = self._phase_parts[key]
        bw = self.block_weight

        def fwd_multi(params, klists, loss_w, reg, musX_grid, model_mask,
                      probs, rng, thr_sv, coords_all, targets_all):
            B = coords_all.shape[0]
            nb_pix = coords_all.shape[1]
            lw_xs = loss_w if (use_loss_mask and loss_w is not None) \
                else jnp.zeros((B, nb_pix))
            rngs = jax.random.split(rng, B)

            def body(acc, _):
                # the carry must perturb an INPUT of the forward, or XLA's
                # while-loop invariant code motion hoists the whole
                # loop-invariant forward out of the scan and the timing
                # reads one iteration as n (observed: 0.26 ms "fwd" where
                # the standalone kernel measures 2.8)
                params_i = params.replace(pis=params.pis + acc * 1e-30)

                def blk(c, xs):
                    coords, targets, kmask, lw, p, r, bidx = xs
                    loss, _aux = loss_for_block(
                        params_i, coords, targets, kmask, lw, reg,
                        musX_grid, model_mask, p, r, bidx, thr_sv)
                    return c + bw * loss, None

                loss, _ = jax.lax.scan(
                    blk, jnp.float32(0.0),
                    (coords_all, targets_all, klists, lw_xs, probs, rngs,
                     jnp.arange(B)))
                return acc + loss, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=n_steps)
            return acc

        def fwdbwd_multi(params, klists, loss_w, reg, musX_grid, model_mask,
                         probs, rng, thr_sv, coords_all, targets_all):
            B = coords_all.shape[0]
            nb_pix = coords_all.shape[1]
            lw_xs = loss_w if (use_loss_mask and loss_w is not None) \
                else jnp.zeros((B, nb_pix))
            rngs = jax.random.split(rng, B)

            def body(carry, _):
                p_cur, acc = carry
                grads, loss, _mse, _surv = sweep_all(
                    p_cur, coords_all, targets_all, klists, lw_xs, reg,
                    musX_grid, model_mask, probs, rngs, jnp.arange(B),
                    thr_sv)
                # consume the grads (defeats DCE of the backward) with a
                # numerically-no-op axpy (1e-30·g underflows vs any param)
                p_next = jax.tree_util.tree_map(
                    lambda p, g: p - jnp.float32(1e-30) * g, p_cur, grads)
                return (p_next, acc + loss), None

            (p_out, acc), _ = jax.lax.scan(
                body, (params, jnp.float32(0.0)), None, length=n_steps)
            return acc

        fns = (jax.jit(fwd_multi), jax.jit(fwdbwd_multi))
        self._train_fns[pkey] = fns
        return fns


# --------------------------------------------------------------------------
# public trainer class (reference class Smoe, smoe.py:37)
# --------------------------------------------------------------------------

class Smoe:
    """SMoE model + fitting loop with the reference's public API."""

    def __init__(self, image: np.ndarray,
                 kernels_per_dim=None,
                 init_params_dict: Optional[dict] = None,
                 start_batches: int = 1,
                 batch_size: Optional[Tuple[int, ...]] = None,
                 cfg: Optional[SmoeConfig] = None,
                 opt_cfg: Optional[OptConfig] = None,
                 loss_mask: Optional[np.ndarray] = None,
                 affines: Optional[np.ndarray] = None,
                 init_flag: float = 1,
                 iter_offset: int = 0,
                 mesh=None,
                 musX_grid_init: Optional[np.ndarray] = None,
                 model_mask_init: Optional[np.ndarray] = None,
                 **cfg_overrides):
        """mesh: optional jax.sharding.Mesh with a 'b' axis and optionally a
        'k' axis.  When given, the FULL training semantics (QAT, SSIM, SV,
        motion, kernel-list refresh, best-snapshot) run multi-chip:

          * 'b' (SP): the block axis is sharded via shard_map around the
            same per-block loss, with one psum for the accumulated
            gradients (SURVEY §2.2 SP row).  Block count must be a
            multiple of the 'b' axis size.
          * 'k' (TP/EP): the kernel capacity axis is additionally sharded —
            params, gradients, and (via GSPMD through the optax update) the
            Adam moments live on their kernel shard; the forward psums the
            gating denominator + partial expert sums (reference smoe.py:820)
            and QAT-3 pmin/pmaxes its active bounds over 'k'.  Kernel lists
            are sharded P('b','k').  Capacity must be a multiple of the 'k'
            axis size.  This is the scaling lever for K >~ 10^4 where even
            capped-dense width saturates a single chip's step time."""
        image = np.asarray(image, np.float32)
        dim = image.ndim - 1
        if cfg is None:
            kpd = tuple(kernels_per_dim) if kernels_per_dim else (12,) * dim
            if len(kpd) == 1:
                kpd = kpd * dim
            cfg = SmoeConfig(dim_domain=dim, num_channels=image.shape[-1],
                             kernels_per_dim=kpd, **cfg_overrides)
        if image.shape[-1] != 3 and cfg.use_yuv:
            cfg = cfg.replace(use_yuv=False)
        if cfg.dim_domain == 3 and cfg.train_trafo and cfg.num_frames == 0:
            cfg = cfg.replace(num_frames=image.shape[2])

        # motion-compensated video init: warp domain by per-frame affines,
        # place model-0 kernels by init_flag, concat disabled raw-domain
        # model-1 kernels (reference smoe.py:280-329, 1895-2138)
        motion_init = None
        if model_mask_init is not None:   # reload path (container pickle)
            model_mask_init = np.asarray(model_mask_init, bool)
            cfg = cfg.replace(dual_model=True)
        self.num_2d_kernels = None
        if cfg.dim_domain == 3 and affines is not None \
                and init_params_dict is None:
            from smoe_tpu.video.init_strategies import (
                dual_model_concat, motion_from_affines, video_kernel_init,
                warp_domain)
            from smoe_tpu.core.init import (generate_kernel_grid,
                                            generate_experts, generate_pis)
            affines = np.asarray(affines, np.float32)
            cfg = cfg.replace(num_frames=image.shape[2], dual_model=True)
            warped = warp_domain(image, affines, cfg.num_params_model)
            m0 = video_kernel_init(image, warped, cfg.kernels_per_dim,
                                   init_flag)
            base = cfg.replace(dual_model=False, start_pis_override=0)
            musX1, A1 = generate_kernel_grid(base)
            nu1, g1 = generate_experts(image, musX1, base)
            m1 = {"musX": musX1, "A": A1, "nu_e": nu1, "gamma_e": g1,
                  "pis": generate_pis(musX1.shape[0], cfg.normalize_pis)}
            init_params_dict, model_mask_init = dual_model_concat(m0, m1)
            cfg = cfg.replace(
                start_pis_override=int(init_params_dict["pis"].shape[0]))
            motion_init = motion_from_affines(affines, image.shape)
            self.num_2d_kernels = int(np.sum(init_params_dict["pis"] > 0))

        # block shape (reference smoe.py:231-247, 2459-2543)
        if batch_size is not None:
            bs = tuple(batch_size)
            if len(bs) == 1:
                bs = bs * dim
        else:
            joint_shape = image.shape[:dim] + (dim + image.shape[-1],)
            bs = get_batch_shape(start_batches, joint_shape)[:dim]
        cfg = cfg.replace(block_shape=tuple(int(b) for b in bs))

        if init_params_dict is not None:
            # a reloaded video pickle can carry MORE live kernels than the
            # grid capacity (time-slab reseeds activate spare slots);
            # init_params grows the arrays, so the config's capacity must
            # follow or every capacity-shaped consumer (row masks,
            # _eff_from_rparams, kernel lists) misindexes
            rows = int(np.asarray(init_params_dict["pis"]).shape[0])
            if rows > cfg.capacity:
                cfg = cfg.replace(start_pis_override=rows,
                                  add_kernel_slots=0)

        self.cfg = cfg
        self.image = image
        self.num_pixel = int(np.prod(image.shape[:dim]))
        self.opt_cfg = opt_cfg or OptConfig()

        p = init_params(image, cfg, init_params_dict)
        self.params: SmoeParams = jax.tree_util.tree_map(jnp.asarray, p)
        self.musX_grid = None
        if cfg.use_diff_center:
            if musX_grid_init is not None:
                # reload path: the saved musX are the learned DIFFS; the
                # container carries the matching grid rows (container.py)
                # so effective centers reconstruct exactly.  (The reference
                # has no such path: it reloads the diffs AS the grid,
                # smoe.py:254 + :392, collapsing all centers toward 0.)
                g = np.zeros((p.musX.shape[0], cfg.dim_domain), np.float32)
                rows = np.asarray(musX_grid_init, np.float32)
                g[:rows.shape[0]] = rows
                self.musX_grid = jnp.asarray(g)
            else:
                self.musX_grid = jnp.asarray(p.musX)
                self.params = self.params.replace(
                    musX=jnp.zeros_like(self.params.musX))
        self.model_mask = None   # dual-model kernel->domain assignment
        if motion_init is None and init_params_dict is not None \
                and "h11" in init_params_dict and cfg.dim_domain == 3:
            # reload path: per-frame motion rows saved by get_params
            # (reference smoe.py:1802-1807 saves them the same way but its
            # reconstruction never rebuilds the motion graph from them)
            motion_init = np.stack([
                np.asarray(init_params_dict[k], np.float32) for k in
                ("h11", "h12", "h13", "h21", "h22", "h23", "h31", "h32")])
            if cfg.num_frames == 0:
                cfg = cfg.replace(num_frames=motion_init.shape[1])
                self.cfg = cfg
        if motion_init is not None:
            self.params = self.params.replace(
                motion=jnp.asarray(motion_init))
        if model_mask_init is not None:
            pad_n = cfg.capacity - model_mask_init.shape[0]
            self.model_mask = jnp.asarray(np.concatenate(
                [model_mask_init, np.ones((pad_n,), bool)]))

        self.bset = build_blockset(image, cfg, cfg.block_shape)
        self.start_batches = int(self.bset.coords.shape[0])
        self.loss_mask = None
        if loss_mask is not None:
            # blocked with the SAME overlap as coords/targets so per-block
            # weights line up pixel for pixel (reference smoe.py:906-923)
            lm = loss_mask.reshape(loss_mask.shape[:dim] + (1,))
            from smoe_tpu.fit.blocks import _block_view
            self.loss_mask = jnp.asarray(
                _block_view(lm.astype(np.float32), cfg.block_shape,
                            cfg.overlap)[..., 0])

        if mesh is not None:
            # elastic fleet shape: a resumed checkpoint's block count may
            # not divide a different fleet's 'b' axis — shrink to the
            # largest dividing device subset (fit_mesh_to_blocks)
            mesh = fit_mesh_to_blocks(mesh, int(self.bset.coords.shape[0]))
        self.mesh = mesh
        self._coords_dev = self.bset.coords
        self._targets_dev = self.bset.targets
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh_b = NamedSharding(mesh, P("b"))
            self._coords_dev = jax.device_put(self.bset.coords, sh_b)
            self._targets_dev = jax.device_put(self.bset.targets, sh_b)
        self._compiled = _Compiled(cfg, self.bset, self.opt_cfg,
                                   self.num_pixel, mesh=mesh)
        self.opt_state = None
        self.inc_opt_state = None

        eff0 = effective_params(self.params, cfg, self.musX_grid)
        if self.model_mask is not None or (cfg.dim_domain == 3
                                           and cfg.train_trafo):
            # motion-compensated video starts with all-on lists (reference
            # smoe.py:314-317); raw-domain center assignment would be wrong
            # for kernels living on the t=-5 motion plane
            self.kernel_lists = jnp.ones(
                (int(self.bset.coords.shape[0]), cfg.capacity), bool)
        else:
            self.kernel_lists = initialize_kernel_lists(
                eff0.A, eff0.musX, eff0.pis, cfg, self.bset)
        nb = int(np.prod(self.bset.block_padded))
        self.sampling_probs = jnp.full(
            (self.start_batches, nb), 1.0 / nb, jnp.float32)

        # histories (reference smoe.py:183-194)
        self.losses, self.qlosses = [], []
        self.mses, self.qmses = [], []
        self.losses_history, self.mses_history = [], []
        self.num_pis, self.num_svs = [], []
        self.best_loss = None
        self.best_mse = None
        self.best_qloss = None
        self.best_qmse = None
        self.best_params: Optional[Dict[str, np.ndarray]] = None
        # GLOBAL best across train() phases: the reference resets
        # best_loss at the top of every train() call (smoe.py:1508), so
        # a multi-phase recipe (video reseeds, inc loop) can end with a
        # "best" worse than an earlier phase's.  best_params keeps the
        # reference's per-phase semantics; global_best_params never
        # resets — it is what a receiver-facing codec should ship.
        self.global_best_loss = None
        self.global_best_mse = None
        self.global_best_params: Optional[Dict[str, np.ndarray]] = None
        self.valid = False
        self.qvalid = False
        self.reconstruction_image = None
        self.reconstruction_sv = None
        self.qreconstruction_image = None
        self.weight_matrix_argmax = None
        self.qweight_matrix_argmax = None
        self.qparams = None
        self.rparams = None
        self.iter = int(iter_offset)      # resumed-run offset (reference
                                          # smoe.py:38 iter_offset kwarg)
        self.kernel_count = cfg.start_pis
        self.num_inc_kernels = cfg.start_pis if cfg.add_kernel_slots else 0
        self._rng = jax.random.PRNGKey(0)
        from smoe_tpu.diag.profile import PhaseTimer
        self.phase_timer = PhaseTimer()

    # ---------------- optimizer ----------------

    def set_optimizer(self, opt_cfg: Optional[OptConfig] = None, **kw):
        """(Re)build the optimizers; fresh state like the reference's new
        AdamOptimizer objects (smoe_test.py:84-91, 124-125)."""
        if opt_cfg is None:
            opt_cfg = OptConfig(**{**self.opt_cfg.__dict__, **kw}) if kw \
                else self.opt_cfg
        self.opt_cfg = opt_cfg
        self._compiled = _Compiled(self.cfg, self.bset, opt_cfg,
                                   self.num_pixel, mesh=self.mesh)
        self.opt_state = self._compiled.tx_main.init(self.params)
        self.inc_opt_state = self._compiled.tx_inc.init(self.params)

    def set_inc_optimizer(self, *a, **kw):
        """Inc optimizers share LR structure with the main rig
        (reference smoe_test.py:93-97); state already separate."""
        if self.inc_opt_state is None:
            self.inc_opt_state = self._compiled.tx_inc.init(self.params)

    # ---------------- sweeps ----------------

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    @property
    def kernel_lists(self):
        return self._kernel_lists

    @kernel_lists.setter
    def kernel_lists(self, v):
        # Lists assigned from outside the sweep (probe refresh, restore,
        # hpc all-on reset, ...) may GROW, so the capped-dense width must
        # be re-derived.  Sweep-internal survivor feedback shrinks only
        # and writes _kernel_lists directly, keeping the cached cap (a
        # still-valid upper bound) without a device->host pull per chunk.
        self._kernel_lists = v
        self._k_cap_cache = None

    def _current_k_cap(self) -> Optional[int]:
        """Static kernel-width cap for the capped-dense sparse mode: the max
        per-block kernel-list count, rounded up to the 128-lane bucket.

        SOUND FOR A WHOLE CHUNK: within a compiled chunk the lists only
        shrink (each sweep replaces them with its influence-culling
        survivors, a subset of the evaluated kernels); they grow only
        between chunks via update_kernel_list, after which the cache is
        invalidated and this is re-evaluated (a new bucket recompiles that
        sweep length once).  Measured at 1080p/K=576 this beats both an
        in-kernel dynamic tile loop (90 ms) and a per-block lax.switch
        over width buckets (43 ms): one wide static MXU matmul wins
        (33 ms vs 35 dense).  The cap is cached until the lists can grow
        (the device->host count pull is a ~50 ms round trip through the
        remote-TPU tunnel — per chunk, it would rival the chunk itself).
        """
        if not self._capped_mode():
            return None
        if self._k_cap_cache is None:
            pad = 0
            if getattr(self.cfg, "in_graph_ukl", False):
                # entry lists may be survivor-shrunk (eval feedback) OR
                # all-on (video init): rebuild them as exactly the
                # probe-near & active set — the in-graph refresh invariant
                # — and size the width from that (plus headroom), or the
                # first chunk runs truncated / at a degenerate full width
                self.update_kernel_list(replace=True)
                pad = 128
            counts = np.asarray(jnp.sum(self._kernel_lists, axis=1))
            self._k_cap_cache = (self._cap_bucket(
                (int(counts.max()) if counts.size else 0) + pad),)
        return self._k_cap_cache[0]

    def _capped_mode(self) -> bool:
        """Capped-dense width applies when the fused kernel is on."""
        return bool(self._compiled.pallas[0])

    def _cap_bucket(self, count: int) -> Optional[int]:
        """128-lane bucket for a kernel count; None = full width."""
        cap = max(128, -(-count // 128) * 128)
        k_pad = -(-self.cfg.capacity // 128) * 128
        return cap if cap < k_pad else None

    def run_batched_chunk(self, n_steps, pis_l1=0.0, u_l1=0.0,
                          sv_l1_sub_l2=0.0, sampling_percentage=100,
                          train_orig=True, train_inc=False, thr_sv=None,
                          use_loss_mask=False):
        """`n_steps` training sweeps in ONE device program (lax.scan).

        Amortizes host<->device dispatch to once per chunk — the TPU-native
        replacement for the reference's per-block feed_dict round trips.
        Returns per-step numpy arrays (loss, mse, num_pi, num_sv).  Like the
        reference (metrics fetched in the accumulation run, train_op applied
        after, smoe.py:1702/1788), each step's metrics describe the params
        BEFORE that step's update.
        """
        if self.opt_state is None:
            self.set_optimizer()
        reg = RegWeights(jnp.float32(pis_l1), jnp.float32(u_l1),
                         jnp.float32(sv_l1_sub_l2))
        lw = self.loss_mask if use_loss_mask else None
        fn = self._compiled.train_sweep_fn(
            bool(train_orig), bool(train_inc), int(sampling_percentage),
            use_loss_mask and lw is not None, int(n_steps),
            k_cap=self._current_k_cap())
        # reference trains with threshold 0 (smoe.py:1552, default :707)
        tsv = jnp.float32(0.0 if thr_sv is None else thr_sv)
        # _kernel_lists direct: survivor feedback only shrinks the lists,
        # so the cached capped-dense width stays a valid upper bound
        (self.params, self.opt_state, self.inc_opt_state, self._kernel_lists,
         ys) = fn(self.params, self.opt_state, self.inc_opt_state,
                  self.kernel_lists, lw, reg, self.musX_grid,
                  self.model_mask, self.sampling_probs, self._next_rng(),
                  tsv, self._coords_dev, self._targets_dev)
        self.valid = False
        # ONE device->host transfer for all metric arrays: through the
        # remote-TPU tunnel each np.asarray is a separate round trip
        # (~50 ms each measured), which dominates short chunks
        loss_a, mse_a, npi_a, nsv_a, kmax_a = jax.device_get(ys)
        # adapt the capped-dense width from the kernel-list count that rode
        # along with the metrics (free: same pull).  Without in-graph
        # refresh growth only goes through update_kernel_list (which
        # invalidates the cache), so shrink-only; with cfg.in_graph_ukl the
        # lists grow inside the chunk too, so follow kmax both ways — a
        # chunk whose lists outgrew the current cap ran its last sweeps
        # truncated to the cap width, and the next chunk recompiles wider.
        # (The cache is always populated here — _current_k_cap ran above.)
        if self._capped_mode():
            cur = self._k_cap_cache[0]
            if getattr(self.cfg, "in_graph_ukl", False):
                # one 128-lane bucket of headroom so the next chunk's
                # in-graph growth fits without truncation
                self._k_cap_cache = (self._cap_bucket(int(kmax_a[-1]) + 128),)
            else:
                new = self._cap_bucket(int(kmax_a[-1]))
                if new is not None and (cur is None or new < cur):
                    self._k_cap_cache = (new,)
        return loss_a, mse_a, npi_a, nsv_a

    def phase_breakdown(self, n_steps: int = 50) -> Dict[str, float]:
        """Per-phase step time (seconds/iteration) of the production train
        sweep at the current capped-dense width — the auditable MFU
        breakdown (VERDICT r4 #4).

        Times three compiled programs over the same blocks/lists/width:
          fwd      forward + loss (the step's primal alone)
          fwd_bwd  forward + backward, grads consumed, no optimizer
          step     the production sweep (fwd + bwd + optax 5-group update
                   + metrics + survivor-list propagation)
        and returns the derived phases:
          {"fwd": t, "bwd": t_fwd_bwd - t_fwd,
           "opt_metrics": t_step - t_fwd_bwd, "step": t_step}
        NOTE: `step` trains the model n_steps·2 iterations (warm + timed)
        as a side effect; call after — not during — a quality fit.
        """
        import time as _time
        if self.opt_state is None:
            self.set_optimizer()
        kcap = self._current_k_cap()
        fwd_fn, fb_fn = self._compiled.phase_fns(
            True, False, 100, False, int(n_steps), k_cap=kcap)
        reg = RegWeights(jnp.float32(0.0), jnp.float32(0.0),
                         jnp.float32(0.0))
        args = (self.params, self.kernel_lists, None, reg, self.musX_grid,
                self.model_mask, self.sampling_probs, self._next_rng(),
                jnp.float32(0.0), self._coords_dev, self._targets_dev)

        def timed(fn):
            jax.block_until_ready(fn(*args))       # compile + warm
            t0 = _time.time()
            jax.block_until_ready(fn(*args))
            return (_time.time() - t0) / n_steps

        t_fwd = timed(fwd_fn)
        t_fb = timed(fb_fn)
        self.run_batched_chunk(n_steps)            # warm at this cap
        t0 = _time.time()
        self.run_batched_chunk(n_steps)
        t_step = (_time.time() - t0) / n_steps
        return {"fwd": t_fwd, "bwd": t_fb - t_fwd,
                "opt_metrics": t_step - t_fb, "step": t_step,
                "k_cap": float(kcap) if kcap is not None
                else float(self.cfg.capacity)}

    def run_batched(self, pis_l1=0.0, u_l1=0.0, sv_l1_sub_l2=0.0, train=True,
                    update_reconstruction=False, with_quantized_params=False,
                    sampling_percentage=100, with_inc=False, train_inc=False,
                    thr_sv=None, use_loss_mask=False):
        """One sweep over all blocks (reference smoe.py:1606-1793).

        Returns (loss, mse, num_pi, num_sv) floats.
        """
        reg = RegWeights(jnp.float32(pis_l1), jnp.float32(u_l1),
                         jnp.float32(sv_l1_sub_l2))
        lw = self.loss_mask if use_loss_mask else None

        if (train or train_inc) and not with_quantized_params:
            loss, mse, npi, nsv = self.run_batched_chunk(
                1, pis_l1, u_l1, sv_l1_sub_l2, sampling_percentage,
                train_orig=train, train_inc=train_inc, thr_sv=thr_sv,
                use_loss_mask=use_loss_mask)
            return float(loss[-1]), float(mse[-1]), int(npi[-1]), int(nsv[-1])

        # evaluation path; SVs evaluated at the reporting threshold 5e-3
        # (reference smoe.py:1536, 1558)
        tsv = jnp.float32(5e-3 if thr_sv is None else thr_sv)
        svp = None
        if self.cfg.train_svs and self.params.sv is not None:
            svp = (self.params.sv, self.params.sv_bw_diag,
                   self.params.sv_bw_corr)
        if with_quantized_params:
            eff = self._eff_from_rparams()
        else:
            eff = effective_params(self.params, self.cfg, self.musX_grid)
        fn = self._compiled.eval_sweep_fn(
            with_rec=bool(update_reconstruction),
            exact=bool(with_quantized_params))
        kl = self.kernel_lists
        if getattr(self.cfg, "in_graph_ukl", False):
            # DENSE validation: the probe grid samples the block boundary,
            # so a sharp kernel just outside can leak past any threshold
            # (measured ~1.2 dB in-list-vs-dense on the CIF k=24 fit);
            # evaluating all active kernels makes every validation — and
            # therefore the best-snapshot selection — measure exactly what
            # the (dense) serving decoder will reproduce
            kl = jnp.broadcast_to((eff.pis > 0)[None, :], kl.shape)
        if update_reconstruction:
            loss, mse, res, w_am, surv, probs, num_pi, sv_map = fn(
                eff, svp, kl, lw, reg, self.model_mask, tsv)
        else:
            loss, mse, surv, num_pi = fn(
                eff, svp, kl, lw, reg, self.model_mask, tsv)

        # batch ALL device->host transfers into one jax.device_get — each
        # separate pull is a ~50 ms round trip through the remote-TPU tunnel
        pull = {"loss": loss, "mse": mse, "num_pi": num_pi}
        if svp is not None:
            pull["num_sv"] = jnp.sum(jnp.abs(self.params.sv) > 5e-3)
        if update_reconstruction:
            pull["rec"] = stitch_blocks(res, self.bset)
            pull["wam"] = stitch_blocks(w_am[..., None], self.bset)[..., 0]
            if svp is not None:
                pull["sv_map"] = stitch_blocks(sv_map[..., None],
                                               self.bset)[..., 0]
        h = jax.device_get(pull)
        num_sv = int(h["num_sv"]) if svp is not None else 0

        if update_reconstruction:
            self.sampling_probs = probs        # stays on device
            if svp is not None:
                self.reconstruction_sv = h["sv_map"]
            if with_quantized_params:
                self.qreconstruction_image = h["rec"]
                self.qweight_matrix_argmax = h["wam"]
                self.qvalid = True
            else:
                self.reconstruction_image = h["rec"]
                self.weight_matrix_argmax = h["wam"]
                self.valid = True
        if not with_quantized_params:
            self._update_kernel_lists_from(surv)
        return float(h["loss"]), float(h["mse"]), int(h["num_pi"]), num_sv

    def _update_kernel_lists_from(self, survivors):
        """Per-block kernel lists <- influence-culling survivors
        (reference smoe.py:1763-1766).  Shrink-only: keeps the cached
        capped-dense width (see `kernel_lists` setter).

        Under in_graph_ukl the eval ran DENSE, so its survivors are not
        bounded by the previous lists — go through the setter, which
        invalidates the cap; the next chunk entry rebuilds the refresh
        invariant (update_kernel_list(replace=True)) and re-derives it."""
        if getattr(self.cfg, "in_graph_ukl", False):
            self.kernel_lists = survivors
        else:
            self._kernel_lists = survivors

    def update_kernel_list(self, *_, replace: bool = False):
        """Probe block corners/edges, OR into the lists
        (reference smoe.py:2287-2365).  For motion-compensated video the
        probe boxes are recomputed from the CURRENT (quantized) motion
        params (reference smoe.py:2292-2317); dual-model kernels are probed
        against their own domain via the model mask.

        replace=True: the lists become exactly the probe-near & active set
        (the in_graph_ukl invariant) instead of ORing into the current
        lists — an all-on init (video, reference smoe.py:315) can never
        shrink through OR, which forces full-width dense eval the
        dual-domain fused backward cannot fit in VMEM at k>=24."""
        cfg = self.cfg
        eff = effective_params(self.params, cfg, self.musX_grid)
        probes = probes_raw = None
        if eff.motion is not None and cfg.dim_domain == 3:
            B, Nb, d = self.bset.coords.shape
            tc = transform_coords(
                self.bset.coords.reshape(-1, d), eff.motion,
                cfg.num_params_model, cfg.num_frames).reshape(B, Nb, d)
            probes = probe_points(tc.min(axis=1), tc.max(axis=1),
                                  grid=getattr(cfg, "probe_grid", 3))
            if self.model_mask is not None:
                probes_raw = self.bset.probes
        base = jnp.zeros_like(self._kernel_lists) if replace \
            else self.kernel_lists
        self.kernel_lists = update_kernel_lists(
            eff.A, eff.musX, eff.pis, cfg, self.bset, base,
            probes=probes, probes_raw=probes_raw,
            model_mask=self.model_mask if probes_raw is not None else None)

    def _eff_from_rparams(self) -> EffParams:
        """Scatter the reduced dequantized params back into full-capacity
        slots (dead slots pis=0) so eval keeps one static shape.

        Decode feed-point override (reference smoe.py:1689, :746-753).
        """
        assert self.rparams is not None, "call quantize first"
        rp = self.rparams
        used = np.asarray(self.qparams["used_kernels"]) if self.qparams \
            else np.ones((rp["pis"].shape[0],), bool)
        cap = self.cfg.capacity
        d, c = self.cfg.dim_domain, self.image.shape[-1]
        A = np.zeros((cap, d, d), np.float32)
        musX = np.zeros((cap, d), np.float32)
        nu = np.zeros((cap, c), np.float32)
        gam = np.zeros((cap, d, c), np.float32)
        pis = np.zeros((cap,), np.float32)
        idx = np.where(used)[0] if used.shape[0] == cap \
            else np.arange(rp["pis"].shape[0])
        A[idx] = rp["A"]
        musX[idx] = rp["musX"]
        nu[idx] = rp["nu_e"]
        gam[idx] = rp["gamma_e"]
        pis[idx] = rp["pis"]
        eff = effective_params(self.params, self.cfg, self.musX_grid)
        return EffParams(A=jnp.asarray(A), musX=jnp.asarray(musX),
                         nu_e=jnp.asarray(nu), gamma_e=jnp.asarray(gam),
                         pis=jnp.asarray(pis), motion=eff.motion)

    # ---------------- training loop ----------------

    def train(self, num_iter, val_iter=100, ukl_iter=None, pis_l1=0.0,
              u_l1=0.0, sv_l1_sub_l2=0.0, sampling_percentage=100,
              callbacks=(), with_inc=False, train_inc=False, train_orig=True,
              use_loss_mask=False, grad_clip_value_abs=None,
              ls_refresh_iter=None):
        """Outer fit loop (reference smoe.py:1485-1603): initial eval,
        per-iteration sweep, validation cadence, kernel-list refresh,
        divergence guard, best-loss snapshot, callbacks.

        ls_refresh_iter (beyond the reference, fit/lsinit.py): every N
        iters re-solve the experts in closed form under the current
        gating (line-searched — cannot regress the blend MSE)."""
        if ukl_iter is None:
            ukl_iter = val_iter
        if grad_clip_value_abs is not None and \
                grad_clip_value_abs != self.opt_cfg.grad_clip_value_abs:
            # the reference rebuilds its optimizers with the clip threaded
            # through (smoe.py:1491); fresh state, same as there
            self.set_optimizer(grad_clip_value_abs=grad_clip_value_abs)
        if self.opt_state is None:
            self.set_optimizer()
        # stitching + pulling the full reconstruction each validation only
        # pays off when someone consumes it (callbacks) or when subsampling
        # needs the refreshed error-proportional probabilities; otherwise
        # get_reconstruction() recomputes lazily on demand
        upd_rec = bool(callbacks) or sampling_percentage < 100

        from smoe_tpu.codec.quantize import quantize_params, rescaler

        def quantize_now():
            self.qparams = quantize_params(self.get_params(), self.cfg,
                                           musX_grid=self.musX_grid)
            return self.qparams

        if self.cfg.quantization_mode >= 1:
            quantize_now()
        if self.cfg.quantization_mode == 1:
            self.rparams = rescaler(
                self.qparams, self.cfg,
                None if self.musX_grid is None else
                np.asarray(self.musX_grid)[
                    np.asarray(self.qparams["used_kernels"])])
            self.best_qloss, self.best_qmse, _, _ = self.run_batched(
                pis_l1, u_l1, sv_l1_sub_l2, train=False,
                update_reconstruction=upd_rec, with_quantized_params=True)
            self.qlosses.append((0, self.best_qloss))
            self.qmses.append((0, self.best_qmse))

        loss_val, mse_val, num_pi, num_sv = self.run_batched(
            pis_l1, u_l1, sv_l1_sub_l2, train=False,
            update_reconstruction=upd_rec, use_loss_mask=use_loss_mask)
        self.best_loss, self.best_mse = loss_val, mse_val
        self._snapshot_best()
        self.losses.append((self.iter, loss_val))
        self.mses.append((self.iter, mse_val))
        self.num_pis.append((self.iter, num_pi))
        self.num_svs.append((self.iter, num_sv))
        for cb in callbacks:
            cb(self)

        first_loss = self.losses[0][1] if self.losses else loss_val
        i = 0
        while i < num_iter:
            # run whole validation / kernel-list intervals as ONE device
            # program (run_batched_chunk) — same iteration semantics as the
            # reference's per-iter loop, minus the dispatch latency.
            boundary = min(((i // val_iter) + 1) * val_iter,
                           ((i // ukl_iter) + 1) * ukl_iter, num_iter)
            if ls_refresh_iter:
                boundary = min(boundary,
                               ((i // ls_refresh_iter) + 1) * ls_refresh_iter)
            chunk = boundary - i
            try:
                with self.phase_timer.phase("train_sweeps"):
                    loss_a, mse_a, npi_a, nsv_a = self.run_batched_chunk(
                        chunk, pis_l1, u_l1, sv_l1_sub_l2,
                        sampling_percentage, train_orig=train_orig,
                        train_inc=train_inc, use_loss_mask=use_loss_mask)
                i = boundary
                self.iter += chunk
                loss_val, mse_val = float(loss_a[-1]), float(mse_a[-1])
                num_pi, num_sv = int(npi_a[-1]), int(nsv_a[-1])
                # always validate the FINAL iterate too: phases whose
                # length is not a val_iter multiple otherwise end in a
                # state the best-snapshot never saw (the CIF reseed
                # recipe's 1200-iter slabs with val 500 left a 34.9 dB
                # state uncaptured, round 3) — the reference shares this
                # blind spot (smoe.py:1539 fires on cadence only)
                validate = i % val_iter == 0 or i == num_iter
                do_ukl = i % ukl_iter == 0

                # divergence guard over every step of the chunk
                # (reference smoe.py:1565-1570)
                if np.any(np.isnan(loss_a)) or np.any(
                        loss_a + 1 > (first_loss + 100) * 10):
                    print("stop: divergence guard")
                    break

                if do_ukl:
                    self.update_kernel_list()
                    if not validate:
                        loss_val, mse_val, num_pi, num_sv = self.run_batched(
                            pis_l1, u_l1, train=False)

                if ls_refresh_iter and i % ls_refresh_iter == 0:
                    # before the validate block so the snapshot sees the
                    # (non-regressing) refreshed experts
                    self.ls_init_experts(mode="kernel")
                    if not validate:     # validate re-evals below anyway
                        loss_val, mse_val, num_pi, num_sv = self.run_batched(
                            pis_l1, u_l1, train=False,
                            use_loss_mask=use_loss_mask)

                if validate:
                    if self.cfg.quantization_mode >= 1:
                        quantize_now()
                    if self.cfg.quantization_mode == 1:
                        self.rparams = rescaler(
                            self.qparams, self.cfg,
                            None if self.musX_grid is None else
                            np.asarray(self.musX_grid)[
                                np.asarray(self.qparams["used_kernels"])])
                        qloss_val, qmse_val, _, _ = self.run_batched(
                            pis_l1, u_l1, sv_l1_sub_l2, train=False,
                            update_reconstruction=upd_rec,
                            with_quantized_params=True,
                            use_loss_mask=use_loss_mask)
                        self.qlosses.append((self.iter, qloss_val))
                        self.qmses.append((self.iter, qmse_val))
                    loss_val, mse_val, num_pi, num_sv = self.run_batched(
                        pis_l1, u_l1, train=False,
                        update_reconstruction=upd_rec,
                        use_loss_mask=use_loss_mask)

                if np.isnan(loss_val):
                    print("stop: divergence guard")
                    break

                if validate:
                    if self.best_loss is None or loss_val < self.best_loss:
                        self.best_loss = loss_val
                        self._snapshot_best(mse=mse_val)
                    self.losses.append((self.iter, loss_val))
                    if self.best_mse is None or mse_val < self.best_mse:
                        self.best_mse = mse_val
                    self.mses.append((self.iter, mse_val))
                    self.num_pis.append((self.iter, num_pi))
                    self.num_svs.append((self.iter, num_sv))
                    for cb in callbacks:
                        cb(self)
            except KeyboardInterrupt:
                break

        self.losses_history.append(self.losses)
        self.mses_history.append(self.mses)
        print(f"end loss/mse: {loss_val} / {mse_val} @iter {i}")
        print(f"best loss/mse: {self.best_loss} / {self.best_mse}")

    # ---------------- params access ----------------

    def get_params(self) -> Dict[str, np.ndarray]:
        """Effective (fake-quantized) params as numpy dict
        (reference smoe.py:1795-1810 returns the q* tensors).

        One batched device->host transfer (called per best-snapshot)."""
        eff = apply_qat(self.params, self.cfg)
        dev = {
            "pis": eff.pis,
            "musX": eff.musX,
            "A_diagonal": eff.a_diag,
            "A_corr": eff.a_corr,
            "gamma_e": eff.gamma_e,
            "nu_e": eff.nu_e,
        }
        if self.params.motion is not None:
            dev["_motion"] = eff.motion
        out = jax.device_get(dev)
        m = out.pop("_motion", None)
        if m is not None:
            for i, name in enumerate(
                    ["h11", "h12", "h13", "h21", "h22", "h23", "h31", "h32"]):
                out[name] = m[i]
        return out

    def _snapshot_best(self, mse=None):
        """mse: the CURRENT validation's mse (the snapshotted state's),
        not the running per-phase min — global_best_mse must describe
        global_best_params (it lagged one validation before round 3)."""
        self.best_params = self.get_params()
        if self.global_best_loss is None or (
                self.best_loss is not None
                and self.best_loss < self.global_best_loss):
            self.global_best_loss = self.best_loss
            self.global_best_mse = self.best_mse if mse is None else mse
            self.global_best_params = self.best_params

    def get_best_params(self) -> Dict[str, np.ndarray]:
        """Best-validation snapshot (reference smoe.py:1835-1849).
        Per-phase like the reference; see get_global_best_params."""
        return self.best_params if self.best_params is not None \
            else self.get_params()

    def get_global_best_params(self) -> Dict[str, np.ndarray]:
        """Best snapshot across ALL train() phases (never reset — unlike
        the reference's per-call best, smoe.py:1508)."""
        return self.global_best_params if self.global_best_params \
            is not None else self.get_best_params()

    # ---------------- reconstructions ----------------

    def get_reconstruction(self):
        if not self.valid:
            self.run_batched(train=False, update_reconstruction=True)
        return self.reconstruction_image

    def get_qreconstruction(self):
        if not self.qvalid:
            self.run_batched(train=False, update_reconstruction=True,
                             with_quantized_params=True)
        return self.qreconstruction_image

    def get_weight_matrix_argmax(self):
        if not self.valid:
            self.run_batched(train=False, update_reconstruction=True)
        return self.weight_matrix_argmax

    def ls_init_experts(self, mode: str = "auto", ridge: float = 1e-6,
                        damp: float = 0.0):
        """Closed-form least-squares (re)fit of the expert surfaces under
        the current gating (fit/lsinit.py) — beyond the reference: starts
        Adam from the best experts the initial gating can express instead
        of the image-sample init (reference smoe.py:2437-2456).  `damp`
        shrinks barely-gated kernels toward their current experts (codec
        range protection; see ls_refresh_experts)."""
        from smoe_tpu.fit.lsinit import ls_refresh_experts
        return ls_refresh_experts(self, mode=mode, ridge=ridge, damp=damp)

    def get_weight_matrix(self):
        """Full (K, *spatial) gating map — computed on demand (the reference
        stitches it every eval, smoe.py:1747-1756; it is large)."""
        eff = effective_params(self.params, self.cfg, self.musX_grid)
        outs = []
        for b in range(self.start_batches):
            out = _forward_eff(eff, self.cfg, self.bset.coords[b],
                               self.kernel_lists[b], self.model_mask)
            outs.append(out.w_e)
        w = jnp.stack(outs)                        # (B, Nb, K)
        full = stitch_blocks(w, self.bset)         # (*spatial, K)
        return np.moveaxis(np.asarray(full), -1, 0)

    def get_original_image(self):
        return np.squeeze(self.image)

    # histories (reference smoe.py:1857-1885)
    def get_losses(self): return self.losses
    def get_qlosses(self): return self.qlosses
    def get_best_loss(self): return self.best_loss
    def get_losses_history(self): return self.losses_history
    def get_mses(self): return self.mses
    def get_qmses(self): return self.qmses
    def get_best_mse(self): return self.best_mse
    def get_mses_history(self): return self.mses_history
    def get_num_pis(self): return self.num_pis
    def get_num_svs(self): return self.num_svs
    def get_iter(self): return self.iter      # reference smoe.py:2142

    # ---------------- checkpoint / restore ----------------

    def checkpoint(self, path: str):
        """Full trainer-state save (reference tf.train.Saver,
        smoe.py:1066-1070)."""
        state = {
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.opt_state)
            if self.opt_state is not None else None,
            "inc_opt_state": jax.tree_util.tree_map(
                np.asarray, self.inc_opt_state)
            if self.inc_opt_state is not None else None,
            "iter": self.iter, "losses": self.losses, "mses": self.mses,
            "num_pis": self.num_pis, "best_loss": self.best_loss,
            "best_mse": self.best_mse, "best_params": self.best_params,
            "global_best_loss": self.global_best_loss,
            "global_best_mse": self.global_best_mse,
            "global_best_params": self.global_best_params,
            "kernel_lists": np.asarray(self.kernel_lists),
            "kernel_count": self.kernel_count,
            "cfg": self.cfg,
        }
        with open(path, "wb") as fd:
            pickle.dump(state, fd)
        print(f"Model saved in file: {path}")

    def restore(self, path: str):
        with open(path, "rb") as fd:
            state = pickle.load(fd)
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        if state["opt_state"] is not None:
            if self.opt_state is None:
                self.set_optimizer()
            self.opt_state = jax.tree_util.tree_map(
                jnp.asarray, state["opt_state"])
        if state["inc_opt_state"] is not None:
            self.inc_opt_state = jax.tree_util.tree_map(
                jnp.asarray, state["inc_opt_state"])
        self.iter = state["iter"]
        self.losses = state["losses"]
        self.mses = state["mses"]
        self.num_pis = state["num_pis"]
        self.best_loss = state["best_loss"]
        self.best_mse = state["best_mse"]
        self.best_params = state["best_params"]
        self.global_best_loss = state.get("global_best_loss", self.best_loss)
        self.global_best_mse = state.get("global_best_mse", self.best_mse)
        self.global_best_params = state.get("global_best_params",
                                            self.best_params)
        self.kernel_lists = jnp.asarray(state["kernel_lists"])
        self.kernel_count = state.get("kernel_count", self.kernel_count)
        self.valid = False
        print(f"Model restored from {path}")

    def reinit(self):
        """Reset params / optimizer state / kernel lists to a fresh init
        while KEEPING the compiled sweep functions (bench + RD sweeps rerun
        fits without paying compile again)."""
        p = init_params(self.image, self.cfg)
        self.params = jax.tree_util.tree_map(jnp.asarray, p)
        if self.cfg.use_diff_center:
            self.params = self.params.replace(
                musX=jnp.zeros_like(self.params.musX))
        self.opt_state = self._compiled.tx_main.init(self.params)
        self.inc_opt_state = self._compiled.tx_inc.init(self.params)
        eff0 = effective_params(self.params, self.cfg, self.musX_grid)
        self.kernel_lists = initialize_kernel_lists(
            eff0.A, eff0.musX, eff0.pis, self.cfg, self.bset)
        self.valid = False
        self.qvalid = False
        self.iter = 0
        self.losses, self.mses, self.num_pis, self.num_svs = [], [], [], []
        self.best_loss = self.best_mse = self.best_params = None
        self._rng = jax.random.PRNGKey(0)

    def re_normalize_pis(self):
        """pis /= sum(active pis) after restore (reference smoe.py:774-775,
        smoe_test.py:101-106)."""
        pis = self.params.pis
        any_list = jnp.any(self.kernel_lists, axis=0)
        mask = any_list & (pis > 0)
        s = jnp.sum(jnp.where(mask, pis, 0.0))
        self.params = self.params.replace(pis=pis / jnp.maximum(s, 1e-30))

    # ---------------- incremental kernels ----------------

    def reinit_nu_from_argmax(self, rows: Optional[np.ndarray] = None):
        """nu_k <- mean image value over kernel k's argmax-gating region,
        0.5 where a kernel never wins (reference smoe.py:320-329,
        smoe_test.py:195-200).  `rows`: restrict the update to these rows."""
        c = self.image.shape[-1]
        cap = self.params.capacity
        w = np.asarray(self.get_weight_matrix_argmax()).reshape(-1)
        w = w.astype(np.int64)
        imgf = self.image.reshape(-1, c).astype(np.float64)
        sums = np.zeros((cap, c))
        np.add.at(sums, w, imgf)
        counts = np.bincount(w, minlength=cap).astype(np.float64)
        means = np.divide(sums, counts[:, None],
                          out=np.full((cap, c), 0.5), where=counts[:, None] > 0)
        nu = np.asarray(self.params.nu_e).copy()
        if rows is None:
            nu[:] = means
        else:
            nu[rows] = means[rows]
        self.params = self.params.replace(
            nu_e=jnp.asarray(nu.astype(np.float32)))
        self.valid = False

    def reseed_time_slab(self, kk: int, rng=None):
        """Activate the kk-th time slab of spare (disabled) kernels at
        error-proportional random pixel positions and re-init their experts
        from the gating argmax (the video driver loop of reference
        smoe_test.py:123-207).  Returns the activated row indices."""
        cfg = self.cfg
        assert cfg.dim_domain == 3, "time-slab reseeding is a video feature"
        rng = np.random.default_rng(rng)
        kpd = cfg.kernels_per_dim
        k2d = int(np.prod(kpd[:2]))
        shape = self.image.shape[:3]

        rec = self.get_reconstruction().reshape(self.image.shape)
        wts = [6 / 8, 1 / 8, 1 / 8] \
            if (cfg.use_yuv and self.image.shape[-1] == 3) else None
        diff = np.average(np.square(255.0 * (self.image - rec)), axis=-1,
                          weights=wts) ** 2
        p = diff.reshape(-1) / diff.sum()
        idx = rng.choice(p.size, p=p, size=k2d, replace=False)
        pos = np.unravel_index(idx, shape)
        mus3 = np.stack([pos[i] / max(shape[i] - 1, 1) for i in range(3)],
                        axis=1).astype(np.float32)

        pis = np.asarray(self.params.pis).copy()
        if self.num_2d_kernels is None or kk == 0:
            self.num_2d_kernels = int(np.sum(pis != 0))
        lo = self.num_2d_kernels + kk * k2d
        hi = min(lo + k2d, cfg.start_pis)
        if hi <= lo:
            raise ValueError("no spare kernel slots left for reseeding")
        rows = np.arange(lo, hi)
        musX = np.asarray(self.params.musX).copy()
        pis[rows] = 1.0
        musX[rows] = mus3[:rows.size]
        self.params = self.params.replace(pis=jnp.asarray(pis),
                                          musX=jnp.asarray(musX))
        self.update_kernel_list()
        self.valid = False
        self.reinit_nu_from_argmax(rows=rows)
        return rows

    def reinit_inc(self, plot_dir=None, threshold_rel=0.2):
        from smoe_tpu.fit.incremental import reinit_inc as _reinit
        _reinit(self, plot_dir=plot_dir, threshold_rel=threshold_rel)

    def apply_inc(self):
        from smoe_tpu.fit.incremental import apply_inc as _apply
        _apply(self)
