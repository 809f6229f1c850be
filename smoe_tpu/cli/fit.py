"""Training CLI — the reference's smoe_test.py main (argparse surface
smoe_test.py:260-356), flag-compatible where it makes sense.

Usage:
    python -m smoe_tpu.cli.fit -i image.png -r results/ [-n 10000 -k 12 ...]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--image_path", type=str, required=True)
    p.add_argument("-r", "--results_path", type=str, required=True)
    p.add_argument("-n", "--iterations", type=int, default=10000)
    p.add_argument("-ni", "--iterations_inc", type=int, default=1000)
    p.add_argument("-na", "--iterations_all", type=int, default=1000)
    p.add_argument("-is", "--inc_steps", type=int, default=0)
    p.add_argument("-tr", "--threshold_rel", type=float, default=0.2)
    p.add_argument("-v", "--validation_iterations", type=int, default=100)
    p.add_argument("-k", "--kernels_per_dim", type=int, default=[12],
                   nargs="+")
    p.add_argument("-p", "--params_file", type=str, default=None)
    p.add_argument("-reg", "--l1reg", type=float, default=0)
    p.add_argument("-lr", "--base_lr", type=float, default=1e-3)
    p.add_argument("-b", "--batches", type=int, default=1)
    p.add_argument("-bz", "--batch_size", type=int, default=None, nargs="+")
    p.add_argument("-c", "--checkpoint_path", type=str, default=None)
    p.add_argument("-d", "--lr_div", type=float, default=100)
    p.add_argument("-m", "--lr_mult", type=float, default=1000)
    p.add_argument("-msv", "--lr_mult_sv", type=float, default=1)
    p.add_argument("-dp", "--disable_train_pis", type=str2bool, default=False)
    p.add_argument("-dg", "--disable_train_gammas", type=str2bool,
                   default=False)
    p.add_argument("-dm", "--disable_train_musx", type=str2bool,
                   default=False)
    p.add_argument("-udc", "--use_diff_center", type=str2bool, default=False)
    p.add_argument("-ra", "--radial_as", type=str2bool, default=False)
    p.add_argument("-ud", "--use_determinant", type=str2bool, default=True)
    p.add_argument("-np", "--normalize_pis", type=str2bool, default=True)
    p.add_argument("-qm", "--quantization_mode", type=int, default=0)
    p.add_argument("-bd", "--bit_depths", type=int, nargs="+",
                   default=[20, 18, 6, 10, 10])
    p.add_argument("-lean", "--lean_bits", type=str2bool, default=False,
                   help="override -bd with the measured lean allocation "
                        "A10/mu12/nu8/pi10/g8: -28%% coded bits at "
                        "equal-or-better decoded PSNR vs the reference "
                        "depths on the 256^2 RD study (round 3; the A "
                        "fields carry far less perceptual information "
                        "than their 20-bit default)")
    p.add_argument("-ulean", "--ultra_lean_bits", type=str2bool,
                   default=False,
                   help="override -bd with the ultra-lean allocation "
                        "A8/mu10/nu8/pi10/g6 — the measured transparency "
                        "knee of EVERY param group (round-3 sweep on "
                        "converged 2D/3D/4D fits: -41%%/-51%%/-57%% coded "
                        "bits vs reference depths at <=0.03 dB; one step "
                        "lower in any group costs 0.2-2.6 dB).  Takes "
                        "precedence over -lean")
    p.add_argument("-lslean", "--ls_lean_bits", type=str2bool,
                   default=False,
                   help="override -bd with the LS-fit transparency knee "
                        "A8/mu10/nu10/pi10/g8 (round-4 probes: LS-refreshed "
                        "fits need nu10 — their experts carry more offset "
                        "information than the Adam-era knee's nu8 — and g8 "
                        "where -ulean's g6 costs ~4 dB).  Use with "
                        "-lsinit/-lsri fits; pairs with -nuanchor 1.  "
                        "Measured: 33.83 dB @ 0.525 bpp on the CIF "
                        "lsri-initial fit (ref depths: 34.19 @ 0.96).  "
                        "Takes precedence over -lean/-ulean")
    p.add_argument("-qp", "--quantize_pis", type=str2bool, default=True)
    p.add_argument("-lb", "--lower_bounds", type=float, nargs="+",
                   default=[-2500, -0.3, -5, 0, -32])
    p.add_argument("-ub", "--upper_bounds", type=float, nargs="+",
                   default=[2500, 1.3, 5, 2, 32])
    p.add_argument("-yuv", "--use_yuv", type=str2bool, default=True)
    p.add_argument("-oyg", "--only_y_gamma", type=str2bool, default=False)
    p.add_argument("-ssim", "--ssim_opt", type=str2bool, default=False)
    p.add_argument("-sp", "--sampling_percentage", type=int, default=100)
    p.add_argument("-ukl", "--update_kernel_list_iterations", type=int,
                   default=None)
    p.add_argument("-ovl", "--overlap_of_batches", type=int, default=0)
    p.add_argument("-pmt", "--probe_maha_threshold", type=float,
                   default=800.0, help="kernel-list probe threshold "
                   "(reference hardcodes 800; 50-150 measured faster at "
                   "unchanged PSNR on 1080p)")
    p.add_argument("-pg", "--probe_grid", type=int, default=3,
                   help="probe points per dim for kernel-list boxes "
                   "(3 = reference; 5 halves the sharp-kernel boundary "
                   "leak)")
    p.add_argument("-iukl", "--in_graph_ukl", type=str2bool, default=False,
                   help="refresh kernel lists in-graph every sweep "
                   "(survivors | probe-near) instead of only every -ukl "
                   "iterations; bounds unlisted-kernel drift at one sweep "
                   "(measured: the drift costs >10 dB decoded PSNR on the "
                   "CIF video recipe at ukl=500)")
    p.add_argument("-nuanchor", "--nu_anchor", type=str2bool, default=False,
                   help="code nu at the decoded kernel CENTER instead of "
                        "the origin (codec-side reparameterization, "
                        "decode-exact; config.nu_anchor).  Use with "
                        "-lsinit/-lsri fits, whose honest steep slopes "
                        "otherwise stretch the data-derived nu bounds")
    p.add_argument("-ganchor", "--gamma_anchor", type=str2bool,
                   default=False,
                   help="code gamma in the steering-whitened basis "
                        "w = M^-1 gamma (M = decoded A, diag floored; "
                        "config.gamma_anchor).  Decode-exact.  Use with "
                        "-lsri fits at d>=3, whose honest steep slopes "
                        "otherwise stretch the shared data-derived gamma "
                        "bounds (measured 3.1 dB train->decode gap on the "
                        "CIF video recipe)")
    p.add_argument("-lfcw", "--lf_corner_weight", type=float, default=0.0,
                   help="4D light fields: include the reference-masked "
                        "corner views in the loss at this linear weight "
                        "(0 = reference behavior, corners excluded; "
                        "config.lf_corner_weight)")
    p.add_argument("--no_canonicalize", action="store_true",
                   help="preserve trained steering signs in the codec "
                   "(reference behavior; default canonicalizes columns to "
                   "positive diag — measured +10.3 dB on CIF video decode)")
    p.add_argument("-svreg", "--svreg", type=float, default=0)
    p.add_argument("-hpc", "--hpc_mode", type=str2bool, default=False)
    p.add_argument("-cis", "--current_inc_step", type=int, default=0)
    p.add_argument("-orfc", "--only_rec_from_checkpoint", type=str2bool,
                   default=False)
    p.add_argument("-kcn", "--kernel_count_norm_l1", type=str2bool,
                   default=False)
    p.add_argument("-tvs", "--train_svs", type=str2bool, default=False)
    p.add_argument("-svg", "--sv_shared_grid", type=str2bool, default=False,
                   help="store ONE SV per image pixel on the global grid "
                        "(overlapping blocks share and co-train it) instead "
                        "of independent per-block-window rows; the "
                        "reference's SV masking under overlap is ambiguous "
                        "(smoe.py:411-426)")
    p.add_argument("-tt", "--train_trafo", type=str2bool, default=False)
    p.add_argument("-npm", "--num_params_model", type=int, default=6)
    p.add_argument("-tiv", "--train_inverse_cov", type=str2bool,
                   default=False)
    p.add_argument("-if", "--init_flag", type=float, default=1)
    p.add_argument("-ri", "--reseed_iterations", type=int, default=1000,
                   help="retrain iterations per video time-slab reseed "
                        "(reference hardcodes 1000, 5x on the last slab)")
    p.add_argument("-lsinit", "--ls_init", type=str, default="",
                   choices=["", "auto", "kernel", "coupled"],
                   help="closed-form least-squares expert init under the "
                        "initial gating before training (fit/lsinit.py; "
                        "beyond the reference)")
    def _nonneg_int(v):
        iv = int(v)
        if iv < 0:
            raise argparse.ArgumentTypeError(
                "ls_refresh_iter must be >= 0 (0 disables)")
        return iv

    p.add_argument("-lsri", "--ls_refresh_iter", type=_nonneg_int, default=0,
                   help="re-solve the experts in closed form every N "
                        "training iterations (line-searched, "
                        "non-regressing; fit/lsinit.py)")
    p.add_argument("-lsrip", "--ls_refresh_phases", type=str, default="all",
                   choices=["all", "initial"],
                   help="which train phases run the -lsri periodic refresh: "
                        "'all' (every phase incl. video reseed retrains and "
                        "inc retrains) or 'initial' (the first fit only — "
                        "the refresh measured NEGATIVE when it perturbs the "
                        "video reseed phases' Adam trajectories, ROADMAP "
                        "6b''')")
    p.add_argument("-lsrs", "--ls_refresh_stop", type=_nonneg_int, default=0,
                   help="stop the -lsri periodic refresh after this many "
                        "iterations of the INITIAL fit (0 = never): lets "
                        "Adam settle from the last refresh before the "
                        "phase ends — the round-5 A/B isolating whether "
                        "the lsri-initial fit's ~0.6 dB train-best loss "
                        "vs lsinit-only comes from the refresh's end-state "
                        "or its mid-fit trajectory (VERDICT r4 #5)")
    p.add_argument("-mask", "--loss_mask_path", type=str, default=None)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the fit into DIR")
    # multi-host runtime (SURVEY §2.2 multi-host row; the TPU-native
    # equivalent of the reference's HPC job arrays, smoe_test.py:112-116)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0; enables jax multi-process "
                        "init (parallel/multihost.py)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    from smoe_tpu.parallel import multihost
    multihost.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
    from smoe_tpu import Smoe
    from smoe_tpu.config import OptConfig
    from smoe_tpu.codec.container import load_params, save_model
    from smoe_tpu.diag.log import JsonlLogger, ModelLogger
    from smoe_tpu.diag.plots import ImagePlotter, LossPlotter
    from smoe_tpu.io.images import read_image

    if len(args.bit_depths) != 5:
        raise ValueError("Number of bit depths must be five!")
    if args.lean_bits:
        args.bit_depths = [10, 12, 8, 10, 8]     # A, musX, nu_e, pis, gamma_e
    if args.ultra_lean_bits:
        args.bit_depths = [8, 10, 8, 10, 6]      # per-group knee (round 3)
    if args.ls_lean_bits:
        args.bit_depths = [8, 10, 10, 10, 8]     # LS-fit knee (round 4)
    if args.num_params_model not in (2, 4, 6, 8):
        raise ValueError(f"num_params_model == {args.num_params_model} "
                         "is not a valid motion parameter model")
    if args.ssim_opt:
        args.sampling_percentage = 100
    if not (0 < args.sampling_percentage <= 100):
        raise ValueError("Sampling percentage must be in (0, 100]")
    quantize_pis = args.quantize_pis or args.quantization_mode >= 2

    orig, precision, affines = read_image(args.image_path, args.use_yuv)
    use_yuv = args.use_yuv and orig.shape[-1] == 3

    init_params_dict = load_params(args.params_file) \
        if args.params_file else None
    loss_mask = None
    if args.loss_mask_path:
        loss_mask = np.load(args.loss_mask_path)["loss_mask"]

    if args.results_path and multihost.primary():
        if os.path.exists(args.results_path):
            shutil.rmtree(args.results_path)
        os.makedirs(args.results_path)

    kpd = args.kernels_per_dim
    if len(kpd) == 1:
        kpd = kpd * (orig.ndim - 1)

    dim = orig.ndim - 1
    if dim >= 3 and not args.in_graph_ukl:
        # measured list-drift pathology (ROADMAP.md): at >=3 dims the
        # reference A-lr recipe sharpens kernels faster than host-cadence
        # list refreshes heal — CIF video decodes >10 dB under its in-list
        # eval, 4D LF fits diverge outright.  -iukl 1 bounds drift at one
        # sweep (impossible in the reference's feed_dict architecture).
        print("WARNING: video/light-field fit without -iukl 1 — "
              "host-cadence kernel lists measurably degrade DECODED "
              "quality (list-drift pathology, see ROADMAP.md); "
              "-iukl 1 is strongly recommended", flush=True)
    smoe = Smoe(
        orig, kernels_per_dim=kpd, init_params_dict=init_params_dict,
        affines=affines, init_flag=args.init_flag,
        start_batches=args.batches,
        batch_size=tuple(args.batch_size) if args.batch_size else None,
        loss_mask=loss_mask,
        opt_cfg=OptConfig(base_lr=args.base_lr, lr_div=args.lr_div,
                          lr_mult=args.lr_mult, lr_mult_sv=args.lr_mult_sv),
        train_pis=not args.disable_train_pis,
        train_gammas=not args.disable_train_gammas,
        train_musx=not args.disable_train_musx,
        use_diff_center=args.use_diff_center, radial_as=args.radial_as,
        use_determinant=args.use_determinant,
        normalize_pis=args.normalize_pis,
        quantization_mode=args.quantization_mode,
        bit_depths=tuple(args.bit_depths), quantize_pis=quantize_pis,
        lower_bounds=tuple(args.lower_bounds),
        upper_bounds=tuple(args.upper_bounds),
        use_yuv=use_yuv, only_y_gamma=args.only_y_gamma and use_yuv,
        ssim_opt=args.ssim_opt, precision=precision,
        add_kernel_slots=args.inc_steps * int(np.prod(kpd)),
        overlap=args.overlap_of_batches,
        kernel_count_as_norm_l1=args.kernel_count_norm_l1,
        train_svs=args.train_svs, sv_shared_grid=args.sv_shared_grid,
        train_trafo=args.train_trafo,
        num_params_model=args.num_params_model,
        train_inverse_cov=args.train_inverse_cov,
        probe_maha_threshold=args.probe_maha_threshold,
        in_graph_ukl=args.in_graph_ukl,
        probe_grid=args.probe_grid,
        canonicalize_steering=not args.no_canonicalize,
        nu_anchor=args.nu_anchor,
        gamma_anchor=args.gamma_anchor,
        lf_corner_weight=args.lf_corner_weight,
    )
    smoe.set_optimizer()

    if args.checkpoint_path:
        smoe.restore(args.checkpoint_path)
        if args.normalize_pis:
            smoe.re_normalize_pis()
        smoe.update_kernel_list()

    if args.only_rec_from_checkpoint:
        # reconstruction-only run from a restored checkpoint
        # (reference smoe_test.py flag only_rec_from_checkpoint)
        smoe.run_batched(train=False, update_reconstruction=True)
        from smoe_tpu.io.images import write_image
        out = write_image(smoe.get_reconstruction(),
                          os.path.join(args.results_path, "reconstruction"),
                          orig.ndim - 1, yuv=use_yuv,
                          precision=smoe.cfg.precision)
        print(f"wrote {out}")
        return smoe

    # HPC job arrays: resume inc insertion at step N
    # (reference smoe_test.py:112-116).  The reference ADDS the offset
    # because its TF checkpoints don't persist kernel_count (it resets to
    # start_pis on rebuild); our full-state checkpoints DO restore it, so
    # set the absolute value the reference's arithmetic produces.
    if args.hpc_mode and args.current_inc_step > 0:
        smoe.kernel_count = smoe.cfg.start_pis + \
            (args.current_inc_step - 1) * smoe.num_inc_kernels
        import jax.numpy as jnp
        smoe.kernel_lists = jnp.ones_like(smoe.kernel_lists)

    if args.ls_init:
        mass = smoe.ls_init_experts(mode=args.ls_init)
        print(f"LS expert init ({args.ls_init}): gated mass {mass:.1f}",
              flush=True)

    # -lsri cadence per phase: later phases (video reseeds, inc retrains)
    # drop the refresh under -lsrip initial (measured: the refresh perturbs
    # reseed trajectories on the CIF recipe, ROADMAP 6b''')
    lsri_first = args.ls_refresh_iter or None
    lsri_later = lsri_first if args.ls_refresh_phases == "all" else None

    # Result-writing callbacks write on process 0 only under multi-host:
    # every process computes identical replicated state, so N hosts
    # writing loss.png/panels/metrics.jsonl would race on shared storage
    # and duplicate records on per-host disks.  The wrapper (rather than
    # an empty list on non-primary) keeps `bool(callbacks)` — and with it
    # the trainer's update_reconstruction programs — identical across
    # processes, so every host runs the same collective device programs.
    def _primary_write(fn):
        return fn if multihost.primary() else (lambda smoe: None)

    callbacks = [_primary_write(cb) for cb in (
        LossPlotter(path=os.path.join(args.results_path, "loss.png")).plot,
        ImagePlotter(path=args.results_path,
                     options=(["orig", "reconstruction", "gating",
                               "supportvectors", "pis_hist"]
                              if args.train_svs else
                              ["orig", "reconstruction", "gating",
                               "pis_hist"])).plot,
        ModelLogger(path=args.results_path).log,
        JsonlLogger(os.path.join(args.results_path, "metrics.jsonl")).log,
    )]

    if args.iterations:
        import contextlib
        from smoe_tpu.diag.profile import trace
        prof = trace(args.profile_dir) if args.profile_dir \
            else contextlib.nullcontext()
        with prof:
            common = dict(val_iter=args.validation_iterations,
                          ukl_iter=args.update_kernel_list_iterations,
                          pis_l1=args.l1reg, sv_l1_sub_l2=args.svreg,
                          sampling_percentage=args.sampling_percentage,
                          use_loss_mask=loss_mask is not None,
                          callbacks=callbacks)
            stop = args.ls_refresh_stop
            if lsri_first and stop and stop < args.iterations:
                # -lsrs: refresh for the first `stop` iters, then let Adam
                # settle refresh-free for the remainder of the initial fit
                smoe.train(stop, ls_refresh_iter=lsri_first, **common)
                smoe.train(args.iterations - stop, ls_refresh_iter=None,
                           **common)
            else:
                smoe.train(args.iterations, ls_refresh_iter=lsri_first,
                           **common)

        # video: per-time-slab kernel reseeding + retrain
        # (reference smoe_test.py:123-207; pis LR x10 for the refits)
        if dim == 3 and affines is not None:
            smoe.set_optimizer(OptConfig(
                base_lr=args.base_lr, lr_div=args.lr_div / 10,
                lr_mult=args.lr_mult, lr_mult_sv=args.lr_mult_sv))
            for kk in range(kpd[2]):
                try:
                    smoe.reseed_time_slab(kk, rng=kk)
                except ValueError as e:
                    print(f"reseed stopped: {e}")
                    break
                if args.ls_init:
                    # refit ALL experts under the post-reseed gating (the
                    # reseeded slab's experts are sample-initialized);
                    # exact line search => cannot regress the blend MSE
                    smoe.ls_init_experts(mode=args.ls_init)
                its = args.reseed_iterations * (5 if kk == kpd[2] - 1 else 1)
                # like the reference, the reseed/inc retrains do NOT thread
                # the loss mask (smoe_test.py:204/239/241 pass no
                # use_loss_mask; only the first train, :119-120, does)
                smoe.train(its, val_iter=args.validation_iterations,
                           ukl_iter=args.update_kernel_list_iterations,
                           pis_l1=args.l1reg, sv_l1_sub_l2=args.svreg,
                           sampling_percentage=args.sampling_percentage,
                           ls_refresh_iter=lsri_later,
                           callbacks=callbacks)

    # incremental kernel loop (reference smoe_test.py:221-245)
    if args.inc_steps and (not args.hpc_mode or args.iterations == 0):
        for i in range(args.inc_steps):
            print(f"[{i}/{args.inc_steps}]")
            smoe.reinit_inc(threshold_rel=args.threshold_rel,
                            plot_dir=args.results_path)
            smoe.apply_inc()
            if args.ls_init:
                smoe.ls_init_experts(mode=args.ls_init)
            smoe.train(args.iterations_inc,
                       val_iter=args.validation_iterations,
                       pis_l1=0, sv_l1_sub_l2=args.svreg,
                       ls_refresh_iter=lsri_later,
                       callbacks=callbacks)
            smoe.train(args.iterations_all,
                       val_iter=args.validation_iterations,
                       pis_l1=args.l1reg, sv_l1_sub_l2=args.svreg,
                       ls_refresh_iter=lsri_later,
                       callbacks=callbacks)
            if args.hpc_mode:
                break

    quant = args.quantization_mode != 0
    if quant and smoe.qparams is None:
        from smoe_tpu.codec.quantize import quantize_params
        smoe.qparams = quantize_params(smoe.get_params(), smoe.cfg,
                                       musX_grid=smoe.musX_grid)
    # process 0 owns all persisted artifacts (multihost.py docstring)
    # GLOBAL best (same snapshot the model_best.smoe bitstream ships —
    # the per-phase get_best_params only covers the final train() call)
    multihost.save_model_primary(
        save_model, os.path.join(args.results_path, "params_best.pkl"),
        smoe.get_global_best_params(), smoe.cfg,
        qparams=smoe.qparams if quant else None,
        losses=smoe.get_losses(), mses=smoe.get_mses(),
        num_pis=smoe.get_num_pis(), musX_grid=smoe.musX_grid,
        model_mask=smoe.model_mask)
    multihost.save_model_primary(
        save_model, os.path.join(args.results_path, "params_last.pkl"),
        smoe.get_params(), smoe.cfg,
        qparams=smoe.qparams if quant else None,
        losses=smoe.get_losses(), mses=smoe.get_mses(),
        num_pis=smoe.get_num_pis(), musX_grid=smoe.musX_grid,
        model_mask=smoe.model_mask)
    if quant and multihost.primary():
        # self-contained entropy-coded bitstreams — decodable by
        # cli/decode or codec/serve.decode_bitstream alone (incl. trained
        # motion + dual-model assignment for video).  Both the LAST and
        # the BEST-validation model are written, mirroring the
        # reference's params_best/params_last pair (smoe_test.py:248-249)
        # — on a diverged tail the receiver wants best, not last.
        from smoe_tpu.codec.bitstream import write_bitstream
        from smoe_tpu.codec.quantize import quantize_params as _qp
        n_pix = int(np.prod(orig.shape[:-1]))

        def _write(name, qparams, pdict):
            extra = {"shape_of_img": list(orig.shape[:-1]),
                     "dim_of_output": orig.shape[-1],
                     "use_yuv": smoe.cfg.use_yuv,
                     "use_determinant": smoe.cfg.use_determinant,
                     "train_gammas": smoe.cfg.train_gammas}
            if smoe.params.motion is not None and "h11" in pdict:
                # each model snapshot carries ITS OWN (quantized) motion
                # rows h11..h32 (get_params applies the 8-bit fake-quant)
                extra["motion"] = np.stack([
                    np.asarray(pdict[kk], np.float32) for kk in
                    ("h11", "h12", "h13", "h21", "h22", "h23",
                     "h31", "h32")]).tolist()
                extra["num_params_model"] = int(smoe.cfg.num_params_model)
                extra["num_frames"] = int(smoe.cfg.num_frames)
                if smoe.model_mask is not None:
                    used = np.asarray(qparams["used_kernels"], bool)
                    extra["model_mask"] = np.asarray(
                        smoe.model_mask)[used].astype(int).tolist()
            bits = write_bitstream(
                os.path.join(args.results_path, name),
                qparams, smoe.cfg, extra=extra)
            print(f"{name}: {bits} bits, bpp {bits / n_pix:.4f}")

        _write("model_last.smoe", smoe.qparams, smoe.get_params())
        # GLOBAL best across all train phases (reseeds/inc): the
        # reference's per-phase best can end worse than an earlier
        # phase's after a diverging retrain (see trainer.py)
        best = smoe.get_global_best_params()
        _write("model_best.smoe", _qp(best, smoe.cfg), best)
    return smoe


if __name__ == "__main__":
    main()
