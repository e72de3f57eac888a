#!/usr/bin/env python
"""Distillation training of the AttentionStudentSteps student.

TPU-native rebuild of the reference training entry point
(``distillation.py``): same model (inplanes 80, 17 heatmaps, 0 AE dims),
same dual attention/detection objective and SGDR hyperparameters, but

* the data path is the fused device pipeline (one-matrix augmentation,
  on-device target rendering) instead of per-channel PIL replay,
* the train step is one jitted XLA program over a data-parallel mesh,
* checkpoints are orbax with automatic latest-step resume (plus the
  reference's per-submodule part snapshots per epoch),
* metrics go to TensorBoard + JSONL.

The reference's module-level UPPER_CASE globals are CLI flags with the
same defaults (reference ``distillation.py:36-101``).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser("distillation")
    home = os.path.expanduser("~")
    p.add_argument("--coco_dir", default=os.path.join(home, "datasets",
                                                      "coco"))
    p.add_argument("--train_dataset", default="val2017",
                   help="the reference trains on val2017-sized sets")
    p.add_argument("--teacher_dir", default=None,
                   help="precomputed teacher .npz dir (HRNET_VAL_DIR)")
    p.add_argument("--model_path",
                   default="models/pose_higher_hrnet_w48_640.pth.tar",
                   help="teacher statedict for the frozen stem")
    p.add_argument("--student", default="attention_steps",
                   choices=["attention_steps", "cam", "refiner",
                            "multistage"],
                   help="attention_steps = the live reference config; "
                        "the others cover the legacy script family "
                        "(SURVEY.md §2.3)")
    p.add_argument("--num_heatmaps", type=int, default=17)
    p.add_argument("--ae_dims", type=int, default=0)
    p.add_argument("--inplanes", type=int, default=80)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatch count: gradients of batch_size/N "
                        "slices are averaged into one optimizer update")
    p.add_argument("--bn_f32", action="store_true",
                   help="compute BatchNorm in fp32 (the reference's "
                        "fp32-BN-in-fp16-model parity policy).  The "
                        "default computes BN in bf16 — batch stats "
                        "stay fp32 — measured 337 vs 334 img/s on the "
                        "TPU chip (r4 ablation; XLA already stores the "
                        "post-BN tensors bf16 either way, so the win "
                        "is small but free)")
    p.add_argument("--remat", dest="remat", action="store_true",
                   default=False,
                   help="recompute CAM-block internals in the backward "
                        "pass instead of streaming them from HBM.  "
                        "MEASURED DEAD END on the real chip (r4): the "
                        "recompute re-reads each block's big input "
                        "tensors, and XLA's own scheduling already "
                        "keeps the cheap internals out of HBM — "
                        "266 vs 337 img/s, bytes/img 2.25 -> 2.66 "
                        "(models/students.py _cam_cls); kept as an "
                        "opt-in for memory-constrained configs")
    p.add_argument("--fused_cam", dest="fused_cam", action="store_true",
                   default=False,
                   help="route train-mode CAM blocks through the fused "
                        "Pallas forward/backward kernels "
                        "(ops/pallas_cam.py): internals are recomputed "
                        "in VMEM instead of materialized in HBM.  "
                        "MEASURED DEAD END on the chip (r4): bytes/img "
                        "2.25 -> 0.93 but 78.4 vs 336.8 img/s — the "
                        "recomputed branch convs are MXU-lane-ceiling "
                        "bound (hc=40 of 128 lanes); kept opt-in for "
                        "memory-constrained configs (identical params, "
                        "bf16-tolerance-identical gradients)")
    p.add_argument("--no_fused_cam", dest="fused_cam",
                   action="store_false")
    p.add_argument("--num_epochs", type=int, default=20000)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--train_hw", type=int, nargs=2, default=[450, 450])
    p.add_argument("--canvas_hw", type=int, nargs=2, default=[640, 640],
                   help="host canvas; must cover the dataset's images")
    p.add_argument("--train_gt_stddev", type=float, default=7.0)
    p.add_argument("--alpha", type=float, default=0.8)
    p.add_argument("--snapshot_dir", default=os.path.join("models",
                                                          "snapshots"))
    p.add_argument("--log_dir", default="log")
    p.add_argument("--tb_dir", default=os.path.join("tb_log", "train"))
    p.add_argument("--minival_file", default=None,
                   help="e.g. assets/coco_minival2017_100.txt")
    p.add_argument("--minival_every", type=int, default=150000)
    p.add_argument("--diagnose_every", type=int, default=500)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--no_resume", dest="resume", action="store_false")
    p.add_argument("--num_workers", type=int,
                   default=max(1, min(8, os.cpu_count() or 1)),
                   help="host loader threads (JPEG/RLE/npz all release "
                        "the GIL)")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state over the data axis "
                        "(ZeRO stage 1) instead of replicating it")
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel size (default: all devices)")
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rtpe_tpu.data import CocoDistillationDataset, read_whitelist
    from rtpe_tpu.data.pipeline import TrainPipeline
    from rtpe_tpu.io.checkpoint import TrainCheckpointer, save_student_parts
    from rtpe_tpu.models import AttentionStudentSteps
    from rtpe_tpu.models.factory import load_pretrained_stem
    from rtpe_tpu.obs import MetricWriter
    from rtpe_tpu.parallel import make_mesh, shard_batch
    from rtpe_tpu.train import (
        DistillConfig,
        DistillTrainState,
        make_distill_train_step,
    )
    from rtpe_tpu.utils import ColorLogger, make_timestamp, model_summary

    from rtpe_tpu.utils.watchdog import CompileWatchdog
    wd = CompileWatchdog(interval=120.0).start()
    timestamp = make_timestamp(with_tz_output=False)
    os.makedirs(args.log_dir, exist_ok=True)
    os.makedirs(args.snapshot_dir, exist_ok=True)
    log = ColorLogger(__file__, os.path.join(
        args.log_dir, f"[distillation.py]_{timestamp}.log"), filemode="w")
    tb = MetricWriter(os.path.join(args.tb_dir,
                                   f"[distillation.py]_{timestamp}"))

    # model -------------------------------------------------------------
    x0 = jnp.zeros((1, 64, 64, 3))
    if args.student == "attention_steps":
        model = AttentionStudentSteps(
            inplanes=args.inplanes, num_heatmaps=args.num_heatmaps,
            ae_dims=args.ae_dims, detach_att_for_det=True,
            dtype=jnp.bfloat16, remat=args.remat,
            fused_cam=args.fused_cam and not args.remat)
        variables = model.init(jax.random.PRNGKey(0), x0, x0,
                               train=False)
    else:
        from rtpe_tpu.models import (
            CamStudent,
            MultistageStudent,
            RefinerStudent,
        )
        cls = {"cam": CamStudent, "refiner": RefinerStudent,
               "multistage": MultistageStudent}[args.student]
        kw = dict(num_heatmaps=args.num_heatmaps, ae_dims=args.ae_dims,
                  dtype=jnp.bfloat16)
        if args.student == "cam":
            kw["inplanes"] = 48
        model = cls(**kw)
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    if args.model_path and os.path.exists(args.model_path):
        variables = load_pretrained_stem(variables, args.model_path)
        log.info(f"loaded pretrained stem from {args.model_path}")
    else:
        log.warning("no teacher statedict found — stem stays random "
                    f"({args.model_path})")
    log.info(model_summary(variables["params"]))
    tb.hparams(vars(args))

    if args.student == "attention_steps":
        cfg = DistillConfig(distillation_alpha=args.alpha)
        state = DistillTrainState.create(variables, cfg)
    else:
        from rtpe_tpu.train.legacy_steps import (
            StudentDistillConfig,
            StudentTrainState,
        )
        # legacy/distillation_pcr.py:278 uses background_factor 0.01
        cfg = StudentDistillConfig(
            distillation_alpha=args.alpha,
            background_factor=0.01 if args.student == "cam" else 0.0)
        state = StudentTrainState.create(variables, cfg)

    # checkpoint/resume -------------------------------------------------
    ckpt = TrainCheckpointer(os.path.join(args.snapshot_dir, "orbax"))
    if args.resume:
        state, step = ckpt.restore(state)
        if step is not None:
            log.info(f"resumed from checkpoint step {step}")
    ckpt.install_sigterm_save(lambda: state)

    # data --------------------------------------------------------------
    whitelist = (read_whitelist(args.minival_file)
                 if args.minival_file else None)
    minival_ds = None
    if whitelist and args.student == "attention_steps":
        minival_ds = CocoDistillationDataset(
            args.coco_dir, args.train_dataset,
            remove_images_without_annotations=False,
            gt_stddevs_pix=[2.0], whitelist_ids=whitelist,
            alt_colorspace="LAB", host_gt_heatmaps=False)  # never read
    train_ds = CocoDistillationDataset(
        args.coco_dir, args.train_dataset, args.teacher_dir,
        remove_images_without_annotations=True,
        gt_stddevs_pix=[args.train_gt_stddev],
        host_gt_heatmaps=False)  # targets render on device
    pipeline = TrainPipeline(train_ds, batch_size=args.batch_size,
                             out_hw=tuple(args.train_hw),
                             sigma=args.train_gt_stddev,
                             canvas_hw=tuple(args.canvas_hw),
                             num_workers=args.num_workers)
    log.info(f"train dataset: {len(train_ds)} images, "
             f"{len(pipeline)} steps/epoch")

    # mesh + step -------------------------------------------------------
    mesh = make_mesh(n_data=args.mesh_data)
    log.info(f"mesh: {mesh}")
    if args.student == "attention_steps":
        import jax.numpy as jnp
        step_fn = make_distill_train_step(
            model, cfg, grad_accum=args.grad_accum,
            bn_dtype=None if args.bn_f32 else jnp.bfloat16,
            donate=True)
    else:
        from rtpe_tpu.train.legacy_steps import make_student_train_step
        raw_step = make_student_train_step(
            model, cfg, out_hw=tuple(args.train_hw))

        def step_fn(state, batch):
            simple = {"img": batch["img"], "gt_hms": batch["gt_hms"],
                      "teacher_hms": batch["teacher_hms"],
                      "mask": batch["mask"]}
            return raw_step(state, simple)

    with mesh:
        if args.zero1 and hasattr(state, "opt_state"):
            from rtpe_tpu.parallel import zero1_state_sharding
            state = jax.device_put(state, zero1_state_sharding(state, mesh))
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        global_step = int(np.asarray(state.step))
        start_step = global_step  # rate must count THIS session's steps
        t_start = time.time()
        for epoch in range(args.num_epochs):
            for batch in pipeline:
                batch.pop("img_id")
                batch = shard_batch(
                    {k: np.asarray(v) for k, v in batch.items()}, mesh)
                state, metrics = step_fn(state, batch)
                wd.alive()
                global_step += 1
                if global_step % 10 == 0 or global_step < 5:
                    m = {k: float(v) for k, v in metrics.items()}
                    rate = (args.batch_size * (global_step - start_step)
                            / (time.time() - t_start))
                    log.info(f"epoch {epoch} step {global_step}: {m} "
                             f"({rate:.1f} img/s)")
                    tb.scalars(m, global_step)
                if (args.diagnose_every
                        and global_step % args.diagnose_every == 0):
                    # images + parameter histograms, like the reference
                    # TB diagnostics (distillation.py:346-389)
                    img0 = np.asarray(batch["img"])[0]
                    img0 = (img0 - img0.min()) / (np.ptp(img0) + 1e-9)
                    tb.image("batch imgs", img0, global_step)
                    tb.image("gradient masks",
                             np.asarray(batch["mask"])[0].max(-1),
                             global_step)
                    tb.image("attention masks",
                             np.asarray(batch["segm_mask"])[0, :, :, 0],
                             global_step)
                    tb.image("GT heatmaps_1",
                             np.asarray(batch["gt_hms"])[0].max(-1),
                             global_step)
                    from flax.traverse_util import flatten_dict
                    for path, p in flatten_dict(
                            jax.device_get(state.params)).items():
                        tb.histogram("/".join(path) + "_PARAMETERS",
                                     np.asarray(p), global_step)
                    tb.flush()
                if (minival_ds is not None and args.minival_every
                        and global_step % args.minival_every == 0):
                    # in-training minival over the whitelist: batched
                    # attention BCE, plus decode+AP when the student
                    # carries AE channels (the reference kept its AP
                    # minival commented out, distillation.py:391-418)
                    from rtpe_tpu.eval.minival import (
                        attention_minival, detection_minival)
                    t0 = time.time()
                    mv = attention_minival(
                        model, state.params, state.batch_stats,
                        minival_ds)
                    log.info(f"MINIVAL att loss: {mv:.5f} "
                             f"({time.time() - t0:.1f}s)")
                    tb.scalar("minival att loss", mv, global_step)
                    if args.ae_dims > 0:
                        stats = detection_minival(
                            model, state.params, state.batch_stats,
                            minival_ds,
                            num_heatmaps=args.num_heatmaps, logger=log)
                        log.info(f"MINIVAL AP: {stats}")
                        for k, v in stats.items():
                            tb.scalar(f"minival {k}", v, global_step)
                    tb.scalar("minival elapsed_seconds",
                              time.time() - t0, global_step)
                if args.max_steps and global_step >= args.max_steps:
                    break
            # per-epoch snapshots (reference distillation.py:422-431)
            ckpt.save(global_step, jax.device_get(state))
            prefix = f"{timestamp}_epoch{epoch}_step{global_step}"
            snap_vars = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
            if args.student == "attention_steps":
                parts = save_student_parts(snap_vars, args.snapshot_dir,
                                           prefix)
            else:
                from rtpe_tpu.io.checkpoint import save_parts_by_toplevel
                parts = save_parts_by_toplevel(snap_vars,
                                               args.snapshot_dir, prefix)
            log.info(f"saved snapshot parts to {args.snapshot_dir} "
                     f"({len(parts)} files)")
            if args.max_steps and global_step >= args.max_steps:
                break
    log.info("PROGRAM FINISHED")


if __name__ == "__main__":
    main()
