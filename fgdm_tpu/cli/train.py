"""Training CLI — flag-compatible with the reference's `main.py:34-133`.

Reproduces the Lightning-runtime behaviors TPU-natively
(`/root/reference/main.py:443-781`):

* ``-b/--base`` config list merged left→right + ``nested.key=value``
  dot-overrides; ``-t`` train; ``-r`` resume; ``--scale_lr``;
* run-dir setup ``logs/<ts>_<name>/{checkpoints,configs}`` with a snapshot
  of the merged config (`main.py:263-310`);
* LR scaling ``lr = accum × ndev × bs × base_lr`` (`main.py:712-732`);
* image logging every ``batch_frequency`` steps (`main.py:313-417`),
  checkpoint-on-signal (SIGUSR1) and checkpoint-on-exception ("melk",
  `main.py:736-761`), val monitor ``val/loss_simple_ema``;
* adapter-only freezing, EMA, distillation cadence from the model config.

The trainer itself is the pjit train step over the device mesh — DDP/NCCL
is replaced by sharding annotations + XLA collectives.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import os
import signal
import sys
import time


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FG-DM training (TPU)")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("-b", "--base", nargs="*", metavar="base_config.yaml",
                   default=[])
    p.add_argument("-t", "--train", action="store_true", default=False)
    p.add_argument("--no-test", action="store_true", default=False)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--scale_lr", action="store_true", default=False)
    p.add_argument("--gpus", type=str, default="",
                   help="accepted for reference parity; devices come from "
                        "jax.devices()")
    p.add_argument("--max_steps", type=int, default=-1)
    p.add_argument("--val_every", type=int, default=0)
    p.add_argument("--ckpt_every", type=int, default=10_000)
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--img_log_freq", type=int, default=0,
                   help="log image diagnostics every N steps (0 = only when "
                        "the config's lightning callbacks request it)")
    p.add_argument("--num_workers", type=int, default=8,
                   help="batch-assembly threads (torch DataLoader "
                        "num_workers equivalent)")
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="ZeRO-3-style sharded storage: params/opt/EMA "
                        "split over the mesh 'data' axis (parallel.fsdp); "
                        "~n_devices x less HBM for state, identical math")
    p.add_argument("--debug", action="store_true")
    return p


def _load_annotator_params(kind: str, ann_dir: str):
    """Find + ingest the frozen annotator checkpoint for a condition kind.

    File names follow the reference's conventions
    (`ldm/models/diffusion/ddpm.py:146-150`: models/table5_pidinet.pth;
    `controlnet/annotator/`: ControlNetHED.pth, dpt_hybrid-midas-501f0c75.pt).
    Returns None when no checkpoint is present (zero-egress hosts)."""
    from fgdm_tpu.checkpoint import annotator_ingest as ai
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    table = {
        "depth": (("dpt_hybrid-midas-501f0c75.pt", "dpt_hybrid.pt"),
                  "ingest_midas"),
        "normal": (("dpt_hybrid-midas-501f0c75.pt", "dpt_hybrid.pt"),
                   "ingest_midas"),
        "sketch": (("table5_pidinet.pth", "pidinet.pth"), "ingest_pidinet"),
        "sketch_hed": (("ControlNetHED.pth", "hed.pth"), "ingest_hed"),
        "sketch_to_normal": (("dpt_hybrid-midas-501f0c75.pt",),
                             "ingest_midas"),
    }
    names, fn_name = table[kind]
    ingest = getattr(ai, fn_name, None)
    if ingest is None:
        return None
    for name in names:
        path = os.path.join(ann_dir, name)
        if os.path.exists(path):
            sd = load_torch_state_dict(path)
            params, missing, unexpected = ingest(sd)
            print(f"[train] annotator {path}: missing={len(missing)} "
                  f"unexpected={len(unexpected)}")
            return params
    return None


def main(argv=None):
    parser = get_parser()
    opt, unknown = parser.parse_known_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import yaml

    from fgdm_tpu.utils.cache import enable_persistent_cache

    # reuse train-step compiles across restarts (FGDM_CACHE_DIR=off disables)
    enable_persistent_cache()

    from fgdm_tpu.checkpoint.orbax_io import CheckpointManager
    from fgdm_tpu.config import (apply_dot_overrides, instantiate_from_config,
                                 load_config, merge_configs)
    from fgdm_tpu.data.dataset import batch_iterator
    from fgdm_tpu.models.clip import CLIPTokenizer
    from fgdm_tpu.parallel.mesh import (create_mesh, local_batch_slice,
                                        maybe_initialize_distributed,
                                        replicate, shard_batch)
    from fgdm_tpu.train.condition import build_condition_synth
    from fgdm_tpu.train.lr_schedules import scaled_lr
    from fgdm_tpu.train.state import (TrainState, adapter_filter, make_adamw,
                                      state_from_pytree, state_to_pytree)
    from fgdm_tpu.train.train_step import make_eval_step, make_train_step

    # multi-host bring-up must precede the first backend touch
    if maybe_initialize_distributed():
        print(f"[train] jax.distributed up: process "
              f"{jax.process_index()}/{jax.process_count()}")

    # -- config assembly (main.py:492-557) ---------------------------------
    if opt.resume:
        if os.path.isfile(opt.resume):
            logdir = os.path.dirname(os.path.dirname(opt.resume))
        else:
            logdir = opt.resume.rstrip("/")
        base = sorted(glob.glob(os.path.join(logdir, "configs/*.yaml")))
        opt.base = base + opt.base
        nowname = os.path.basename(logdir)
    else:
        ts = time.time()
        if jax.process_count() > 1:
            # every host must assemble the SAME run dir (the orbax save is
            # a collective into one directory) — take process 0's clock
            from jax.experimental import multihost_utils

            ts = float(multihost_utils.broadcast_one_to_all(
                np.asarray(ts, np.float64)))
        now = datetime.datetime.fromtimestamp(ts).strftime(
            "%Y-%m-%dT%H-%M-%S")
        cfg_name = (os.path.splitext(os.path.basename(opt.base[0]))[0]
                    if opt.base else "")
        nowname = now + ("_" + (opt.name or cfg_name) if (opt.name or cfg_name)
                         else "")
        logdir = os.path.join(opt.logdir, nowname)

    configs = [load_config(c) for c in opt.base]
    config = merge_configs(*configs)
    config = apply_dot_overrides(config, [u for u in unknown if "=" in u])

    ckptdir = os.path.join(logdir, "checkpoints")
    cfgdir = os.path.join(logdir, "configs")
    imgdir = os.path.join(logdir, "images")
    for d in (ckptdir, cfgdir, imgdir):
        os.makedirs(d, exist_ok=True)
    if jax.process_index() == 0:  # one writer on a shared filesystem
        with open(os.path.join(cfgdir, f"{nowname}-project.yaml"), "w") as f:
            yaml.safe_dump(config, f)

    # -- model -------------------------------------------------------------
    spec = instantiate_from_config(config["model"])
    rng = jax.random.PRNGKey(opt.seed)
    ckpt_path = spec.ckpt_path if spec.ckpt_path and os.path.exists(
        spec.ckpt_path) else None
    if ckpt_path:
        ld = spec.load(ckpt_path)
    else:
        if spec.ckpt_path:
            print(f"[train] ckpt {spec.ckpt_path} missing — random init")
        ld = spec.create(rng)
        if os.environ.get("FGDM_RANDOMIZE_ZERO_HEADS") == "1":
            # scratch smoke runs: a zero-init output head blocks every
            # adapter gradient under freeze_backbone (see
            # train/state.py:randomize_zero_heads)
            from fgdm_tpu.train.state import randomize_zero_heads

            ld = ld.replace(unet_params=randomize_zero_heads(ld.unet_params))
            print("[train] zero-init heads randomized (smoke mode)")

    # -- on-the-fly condition synthesis (ddpm.py:137-150) -------------------
    cond_kind = spec.condition_kind()
    condition = None
    if cond_kind is not None:
        ann_dir = os.environ.get("FGDM_ANNOTATOR_DIR", "models")
        ann_params = _load_annotator_params(cond_kind, ann_dir)
        if ann_params is None:
            if os.environ.get("FGDM_ALLOW_RANDOM_ANNOTATORS") != "1":
                raise SystemExit(
                    f"[train] config needs the frozen {cond_kind!r} annotator "
                    f"but no checkpoint was found under {ann_dir!r}. Set "
                    "FGDM_ANNOTATOR_DIR to the checkpoint directory, or "
                    "FGDM_ALLOW_RANDOM_ANNOTATORS=1 for a smoke run.")
            print(f"[train] WARNING: {cond_kind} annotator random-init "
                  "(smoke mode — targets are meaningless)")
        condition = build_condition_synth(
            cond_kind, rng=jax.random.PRNGKey(0), params=ann_params,
            image_size=spec.image_size * 8)
        print(f"[train] condition synthesis: {cond_kind} (in-graph)")

    # -- data --------------------------------------------------------------
    data_cfg = config["data"]["params"]
    batch_size = data_cfg.get("batch_size", 8)
    train_ds = instantiate_from_config(data_cfg["train"])
    val_ds = (instantiate_from_config(data_cfg["validation"])
              if "validation" in data_cfg else None)
    tokenizer = CLIPTokenizer()
    if ckpt_path:
        tokenizer.check_production("training")

    # -- optimizer / mesh --------------------------------------------------
    mesh = create_mesh(n_data=len(jax.devices()))
    n_dev = len(jax.devices())
    base_lr = config["model"].get("base_learning_rate", 1e-5)
    lr = scaled_lr(base_lr, batch_size, n_dev,
                   opt.accumulate_grad_batches, scale_lr=opt.scale_lr)
    print(f"[train] lr = {lr:.2e} "
          f"({'scaled' if opt.scale_lr else 'base'}), devices={n_dev}")

    sched_fn = (instantiate_from_config(spec.scheduler_config)
                if spec.scheduler_config else None)
    tx = make_adamw(lr, schedule_fn=sched_fn,
                    accumulate_steps=opt.accumulate_grad_batches)
    trainable = adapter_filter() if spec.freeze_backbone else None
    state = TrainState.create(ld.unet_params, tx, trainable_filter=trainable,
                              use_ema=spec.use_ema)

    mgr = CheckpointManager(ckptdir, keep=3,
                            save_interval_steps=opt.ckpt_every)

    # -- resume: restore the FULL train state (params+opt+EMA+step) --------
    start_step = 0
    if opt.resume and mgr.latest_step() is not None:
        # restore to HOST numpy: a device-target restore materializes a
        # full second copy of the state (incl. the frozen backbone) in HBM
        # while the init copy is still live — a guaranteed OOM at SD scale
        # (observed: first image-log after a real resume).  replicate()
        # below device-puts the single live copy.
        restored = mgr.restore_host(template=state_to_pytree(state))
        state = state_from_pytree(state, restored)
        del restored
        start_step = int(state.step)
        print(f"[train] resumed from {ckptdir} at step {start_step}")
    elif opt.resume:
        print(f"[train] -r given but no checkpoints in {ckptdir} — "
              "starting fresh")
    state = replicate(mesh, state)
    if opt.fsdp:
        from fgdm_tpu.parallel.fsdp import count_fsdp, shard_state_fsdp

        fsdp_min = int(os.environ.get("FGDM_FSDP_MIN_SIZE", 2 ** 15))
        state = shard_state_fsdp(mesh, state, min_size=fsdp_min)
        ns, total, frac = count_fsdp(mesh, state, min_size=fsdp_min)
        print(f"[train] fsdp: {ns}/{total} state leaves sharded "
              f"({frac:.0%} of bytes over {mesh.shape['data']} devices)")

    # -- scale_by_std auto-calibration on the first batch (ddpm.py:580-597)
    if spec.scale_by_std and start_step == 0:
        probe = next(batch_iterator(train_ds, batch_size,
                                    tokenizer=tokenizer, seed=opt.seed))
        img = jnp.asarray(probe["image"])
        if condition is not None:
            img = condition.target(img)
            if condition.kind == "sketch_to_normal":
                img = img[..., :3]
        ld = ld.calibrate_scale_by_std(img, jax.random.PRNGKey(0))
        print(f"[train] scale_by_std: scale_factor={ld.scale_factor:.5f}")

    step_fn = make_train_step(ld, mesh=mesh,
                              parameterization=spec.parameterization,
                              condition=condition,
                              infer_state_sharding=opt.fsdp)
    distill_fn = (make_train_step(ld, mesh=mesh, distill=True,
                                  parameterization=spec.parameterization,
                                  condition=condition,
                                  infer_state_sharding=opt.fsdp)
                  if spec.apply_distill_loss else None)
    eval_fn = (make_eval_step(ld, mesh=mesh, condition=condition,
                              infer_state_sharding=opt.fsdp)
               if val_ds is not None else None)

    # -- image diagnostics (reference ImageLogger callback, main.py:313-417)
    from fgdm_tpu.train.metrics import ImageLogger, MetricsWriter, log_images

    # per-step loss curve (reference's TestTube CSVLogger, main.py:566-590)
    metrics_writer = (MetricsWriter(logdir)
                      if jax.process_index() == 0 else None)

    img_logger = None
    for cb in ((config.get("lightning") or {}).get("callbacks") or {}
               ).values():
        if str(cb.get("target", "")).endswith("ImageLogger"):
            img_logger = instantiate_from_config(cb)(logdir)
    if opt.img_log_freq > 0:
        img_logger = ImageLogger(logdir, batch_frequency=opt.img_log_freq,
                                 is_main_process=jax.process_index() == 0)

    def maybe_log_images(step, state, batch, rng):
        if img_logger is None or not img_logger.should_log(step):
            return
        # plotting uses the EMA weights when available (reference ema_scope)
        params = (state.ema_full_params() if state.ema is not None
                  else state.full_params)
        imgs = log_images(
            ld.replace(unet_params=params), batch, rng,
            ddim_steps=20, inpaint=True, plot_denoise_rows=True,
            plot_progressive_rows=True, plot_diffusion_rows=True)
        img_logger.log(step, imgs)

    # -- melk: save on SIGUSR1 / exception (main.py:736-761) ---------------
    state_ref = {"state": state, "step": start_step}

    def melk(*args):
        # Multi-host: an orbax save is a collective (all processes must
        # call it). A SIGNAL delivered to ONE host would deadlock the pod
        # on the save barrier — only proceed when the launcher guarantees
        # every host got the signal (FGDM_MELK_MULTIHOST=1, e.g. SLURM
        # signals the whole job). Direct melk() calls (end of fit,
        # exception path) run on every process and stay collective-safe.
        if args and jax.process_count() > 1 and \
                os.environ.get("FGDM_MELK_MULTIHOST") != "1":
            print("[train] melk skipped: multi-host save needs the signal "
                  "on every host (set FGDM_MELK_MULTIHOST=1 when the "
                  "launcher broadcasts it); interval checkpoints continue")
            return
        print("[train] melk: saving checkpoint")
        mgr.save(state_ref["step"], state_to_pytree(state_ref["state"]),
                 force=True)
        mgr.wait()

    if hasattr(signal, "SIGUSR1"):
        signal.signal(signal.SIGUSR1, melk)

    # -- loop --------------------------------------------------------------
    if not opt.train:
        print("[train] -t not given; config validated, exiting")
        return

    # worker-threaded batch assembly + on-device double buffering: the DMA
    # for batch N+1 streams while the step on batch N computes (the torch
    # DataLoader(num_workers)+CUDA-stream equivalent, main.py:225-242)
    from fgdm_tpu.data.prefetch import ParallelBatchLoader, device_prefetch

    loader = ParallelBatchLoader(
        train_ds, batch_size, tokenizer=tokenizer, seed=opt.seed,
        num_workers=opt.num_workers, prefetch_batches=2 * opt.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    it = device_prefetch(
        ({"image": b["image"], "input_ids": b["input_ids"]}
         for b in loader),
        mesh=mesh, size=2)
    step = start_step
    t0 = time.time()
    # device metric trees buffered here and read back on the print cadence:
    # a per-step float() would block the host on every step's completion and
    # kill the prefetch/dispatch overlap
    pending_metrics = []

    def drain_metrics():
        last = None
        for s, dev_m in pending_metrics:
            last = {k: float(v) for k, v in dev_m.items()}
            if metrics_writer is not None:
                metrics_writer.log(s, last, prefix="train")
        pending_metrics.clear()
        return last

    try:
        for dev_batch in it:
            if opt.max_steps > 0 and step >= opt.max_steps:
                break
            rng, step_rng = jax.random.split(rng)
            use_distill = (distill_fn is not None
                           and step % spec.distill_every_n_step == 0)
            fn = distill_fn if use_distill else step_fn
            state, metrics = fn(state, dev_batch, step_rng)
            state_ref["state"], state_ref["step"] = state, step
            maybe_log_images(step, state, dev_batch,
                             jax.random.PRNGKey(step))
            pending_metrics.append((step, metrics))
            if step % 50 == 0:
                dt = time.time() - t0
                m = drain_metrics()
                done = step - start_step + 1
                print(f"step {step} loss {m['loss']:.4f} "
                      f"simple {m['loss_simple']:.4f} "
                      f"({done * batch_size / max(dt, 1e-9):.1f} img/s)",
                      flush=True)
            if eval_fn is not None and opt.val_every and \
                    step and step % opt.val_every == 0:
                vb = next(batch_iterator(val_ds, batch_size,
                                         tokenizer=tokenizer, shuffle=False))
                vm = eval_fn(state, shard_batch(mesh, local_batch_slice({
                    "image": vb["image"], "input_ids": vb["input_ids"]})),
                    jax.random.PRNGKey(0))
                vm = {k: float(v) for k, v in vm.items()}
                print("  val:", {k: round(v, 4) for k, v in vm.items()})
                if metrics_writer is not None:
                    metrics_writer.log(step, vm, prefix="val")
            mgr.save(step, state_to_pytree(state))
            step += 1
    except (KeyboardInterrupt, Exception):
        # best-effort rescue save: if the save itself fails (e.g. the
        # original error was a device OOM and the transfer needs HBM),
        # don't let it mask the original traceback
        try:
            melk()
        except Exception as save_err:
            print(f"[train] melk failed during crash handling: {save_err!r}")
        raise
    finally:
        # A max_steps break leaves the prefetch generators suspended with
        # worker threads and device-resident batches alive; close releases
        # them before the post-fit test pass.
        it.close()
        drain_metrics()
        if metrics_writer is not None:
            metrics_writer.close()
    melk()
    print(f"[train] done at step {step}")

    # -- post-fit test pass (trainer.test unless --no-test, main.py:762-763)
    if not opt.no_test and eval_fn is not None and val_ds is not None:
        agg: dict = {}
        nb = 0
        for vb in batch_iterator(val_ds, batch_size, tokenizer=tokenizer,
                                 shuffle=False, epochs=1):
            vm = eval_fn(state, shard_batch(mesh, local_batch_slice({
                "image": vb["image"], "input_ids": vb["input_ids"]})),
                jax.random.PRNGKey(0))
            for k, v in vm.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            nb += 1
        if nb:
            print("[test]", {k: round(v / nb, 4) for k, v in agg.items()})


if __name__ == "__main__":
    main()
