#!/usr/bin/env python
"""EALDM-TPU training driver.

CLI/behaviour parity with the reference `main.py` (argparse surface
`/root/reference/main.py:28-127`, orchestration `:472-877`): left-to-right
merged YAML configs + dotlist overrides, timestamped logdir with
checkpoints/ configs/ images/, LR scaling by accumulate x ndevices x bs x
base_lr, periodic image logging with condition CSVs, EMA-monitored
checkpointing, signal/crash checkpoint saves, resume from a logdir or
checkpoint, and the post-fit third-stage data dump + evaluation.

TPU-native execution: one pjit-compiled train step over a Mesh (DP axis; TP
optional), host ETL via the data layer's prefetcher, orbax checkpoints.
"""
from __future__ import annotations

import argparse
import datetime
import glob
import os
import signal
import sys
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="EALDM-TPU trainer")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="resume from logdir or checkpoint dir")
    p.add_argument("-b", "--base", nargs="*", metavar="base_config.yaml",
                   default=[], help="configs, merged left-to-right")
    p.add_argument("-t", "--train", action="store_true", default=False)
    p.add_argument("--no-test", action="store_true", default=False)
    p.add_argument("-d", "--debug", action="store_true", default=False)
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-f", "--postfix", type=str, default="")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("--scale_lr", type=str2bool, default=True)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=1000)
    p.add_argument("--devices", type=int, default=None,
                   help="number of devices for the data axis")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of train steps 2..2+N "
                        "into <logdir>/profile and print a step-time summary")
    p.add_argument("--val_every_epochs", type=int, default=1)
    p.add_argument("--ckpt_every_epochs", type=int, default=1)
    p.add_argument("--third_stage", type=str2bool, default=True)
    p.add_argument("--third_stage_max_batches", type=int, default=None,
                   help="cap the per-split third-stage dump (smoke runs)")
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def nondefault_trainer_args(opt):
    return []


def main():
    parser = get_parser()
    opt, unknown = parser.parse_known_args()

    # multi-host bring-up (JAX_COORDINATOR/JAX_NUM_PROCESSES/JAX_PROCESS_ID
    # env; silent no-op single-host) — the DDP bring-up equivalent
    # (reference main.py:577 accelerator="ddp")
    from ealdm_tpu.serving import maybe_initialize_distributed

    maybe_initialize_distributed()

    now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    if opt.resume:
        paths = opt.resume.split("/")
        if os.path.isdir(opt.resume):
            logdir = opt.resume.rstrip("/")
        else:
            logdir = "/".join(paths[: paths.index("checkpoints")])
        base_configs = sorted(glob.glob(os.path.join(logdir, "configs", "*.yaml")))
        opt.base = base_configs + opt.base
        nowname = os.path.basename(logdir)
        resume_ckpt_dir = os.path.join(logdir, "checkpoints")
    else:
        name = "_" + (opt.name or (os.path.splitext(os.path.basename(opt.base[0]))[0]
                                   if opt.base else "run"))
        nowname = now + name + opt.postfix
        logdir = os.path.join(opt.logdir, nowname)
        resume_ckpt_dir = None

    import jax

    from ealdm_tpu.config import load_config, model_from_config
    from ealdm_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from ealdm_tpu.data import DataModule, DevicePrefetcher
    from ealdm_tpu.parallel import MeshConfig, create_mesh, shard_batch, shard_state
    from ealdm_tpu.training import (
        build_scheduler,
        init_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from ealdm_tpu.training.callbacks import (
        DeviceStatsCallback,
        ImageLogger,
        MetricLogger,
        SetupCallback,
    )
    from ealdm_tpu.training.checkpoint import CheckpointManager
    import jax.numpy as jnp

    config = load_config(opt.base, unknown)
    lightning_cfg = config.get("lightning", {})

    # ---------------------------------------------------------------- model
    dtype = jnp.bfloat16 if opt.dtype == "bfloat16" else jnp.float32
    target = config["model"].get("target", "")
    if target.endswith(("AutoencoderKL", "VQModel", "VQModelInterface")):
        # first-stage autoencoder training (two-optimizer GAN path)
        return train_autoencoder(opt, config, logdir, now)
    model, base_lr = model_from_config(config["model"], dtype=dtype)
    model_params_cfg = config["model"].get("params", {})

    # ----------------------------------------------------------------- data
    data_cfg = dict(config["data"]["params"])
    batch_size = data_cfg.pop("batch_size")
    dataset_cfgs = {
        k: data_cfg.pop(k)
        for k in ("train", "validation", "test", "predict")
        if k in data_cfg
    }
    data = DataModule(
        batch_size=batch_size,
        dataset_configs=dataset_cfgs,
        wrap=data_cfg.get("wrap", False),
        seed=opt.seed,
    )

    # ----------------------------------------------------------------- mesh
    n_dev = opt.devices or len(jax.devices())
    # the per-step batch must divide the data axis; shrink it if needed
    while n_dev > 1 and (batch_size % (n_dev // opt.tp) != 0):
        n_dev -= opt.tp
    mesh = create_mesh(
        MeshConfig(data=n_dev // opt.tp, model=opt.tp),
        devices=jax.devices()[:n_dev],
    )
    if n_dev != (opt.devices or len(jax.devices())):
        print(f"Reduced device count to {n_dev} so batch {batch_size} shards evenly")
    if opt.scale_lr:
        lr = opt.accumulate_grad_batches * n_dev * batch_size * base_lr
        print(
            f"Setting learning rate to {lr:.2e} = {opt.accumulate_grad_batches}"
            f" (accumulate) * {n_dev} (devices) * {batch_size} (bs) * {base_lr:.2e} (base)"
        )
    else:
        lr = base_lr
        print(f"Using base learning rate {lr:.2e} (no scaling)")

    # ---------------------------------------------------------------- setup
    setup = SetupCallback(logdir, config, name="project")
    setup.on_start(now)
    metric_logger = MetricLogger(logdir)
    img_logger_cfg = (
        lightning_cfg.get("callbacks", {}).get("image_logger", {}).get("params", {})
    )
    train_ds_params = dataset_cfgs.get("train", {}).get("params", {})
    image_logger = ImageLogger(
        logdir,
        batch_frequency=img_logger_cfg.get("batch_frequency", 1000),
        max_images=min(img_logger_cfg.get("max_images", 8), batch_size),
        scaler_dir=train_ds_params.get("path_scaler") or train_ds_params.get("path"),
        log_steps=10 if opt.debug else 50,
        tb_writer=metric_logger.tb,
    )
    device_stats = DeviceStatsCallback()
    monitor = model_params_cfg.get("monitor", "val/loss_simple_ema")
    ckpt_mgr = CheckpointManager(
        os.path.join(logdir, "checkpoints"), save_top_k=3, monitor=monitor
    )

    # ---------------------------------------------------------------- state
    rng = jax.random.PRNGKey(opt.seed)
    train_loader = data.train_dataloader()
    assert train_loader is not None, "config.data must define a train dataset"
    example = next(iter(train_loader))

    schedule_fn = None
    if "scheduler_config" in model_params_cfg:
        schedule_fn = build_scheduler(model_params_cfg["scheduler_config"])

    # scale_by_std: set scale_factor = 1/std(z) from the first batch
    # (reference on_train_batch_start, ddpm.py:483-496). Module attrs are
    # static, so rebuild the model with the measured factor before init.
    if model_params_cfg.get("scale_by_std") and not opt.resume:
        assert model.scale_factor == 1.0, (
            "rather not use custom rescaling and std-rescaling simultaneously"
        )
        import dataclasses as _dc

        tmp_vars = jax.jit(
            lambda r: model.init(
                {"params": r, "dropout": r}, example, r, method=model.full_init
            )
        )(jax.random.PRNGKey(0))
        z = model.apply(
            tmp_vars, jnp.asarray(example["img"]), jax.random.PRNGKey(1),
            method=model.encode_first_stage,
        )
        factor = float(1.0 / jnp.std(z))
        print(f"### USING STD-RESCALING: scale_factor={factor:.4f} ###")
        model = _dc.replace(model, scale_factor=factor)

    rng, init_rng = jax.random.split(rng)
    state, optimizer = init_train_state(
        model, init_rng, example, learning_rate=lr,
        use_ema=model_params_cfg.get("use_ema", True),
    )
    if schedule_fn is not None or opt.accumulate_grad_batches > 1:
        optimizer = make_optimizer(
            lr, state.params, schedule_fn=schedule_fn,
            accumulate_grad_batches=opt.accumulate_grad_batches,
        )
        state.opt_state = optimizer.init(state.params)
    if resume_ckpt_dir is not None:
        mgr = CheckpointManager(resume_ckpt_dir, monitor=monitor)
        state = mgr.restore_last(state)
        print(f"Restored state at step {int(state.step)} from {resume_ckpt_dir}")
    state = shard_state(state, mesh)

    train_step = make_train_step(model, optimizer, mesh=mesh, donate=True)
    eval_step = make_eval_step(model)

    # crash/signal checkpointing (reference melk/SIGUSR1)
    def melk(*args, **kwargs):
        print("Saving crash checkpoint...", flush=True)
        ckpt_mgr.save_last(jax.device_get(state), int(state.step))
        if args:
            sys.exit(0)

    signal.signal(signal.SIGUSR1, melk)

    if not opt.train:
        print("No -t/--train flag: setup complete, exiting (use scripts/ for sampling).")
        return logdir, model, state

    # ------------------------------------------------------------ train loop
    from ealdm_tpu.utils.profiling import StepTimer, fence, trace

    timer = StepTimer()
    prof_start, prof_stop = (2, 2 + opt.profile) if opt.profile else (-1, -1)
    prof_ctx = None
    step = int(state.step)
    try:
        for epoch in range(opt.max_epochs):
            device_stats.on_epoch_start()
            train_loader.set_epoch(epoch)
            prefetch = DevicePrefetcher(
                train_loader, put_fn=lambda b: shard_batch(b, mesh)
            )
            for batch in prefetch:
                rng, step_rng = jax.random.split(rng)
                if step == prof_start:
                    prof_ctx = trace(os.path.join(logdir, "profile"))
                    prof_ctx.__enter__()
                with timer.section("train_step"):
                    state, metrics = train_step(state, batch, step_rng)
                    if opt.profile:  # fence so the bucket measures device time
                        fence(metrics["loss"])
                if step == prof_stop and prof_ctx is not None:
                    prof_ctx.__exit__(None, None, None)
                    prof_ctx = None
                    print(f"profiler trace written to {logdir}/profile")
                step += 1
                if step % opt.log_every == 0:
                    metric_logger.log(step, jax.device_get(metrics),
                                      prefix="train/", echo=True)
                if image_logger.check_frequency(step):
                    rng, img_rng = jax.random.split(rng)
                    image_logger.log_img(
                        model, {"params": jax.device_get(state.params)},
                        jax.device_get(batch), step, img_rng, split="train",
                    )
                if opt.max_steps and step >= opt.max_steps:
                    break
            stats = device_stats.on_epoch_end()
            metric_logger.log(step, stats, prefix="sys/")

            # ------------------------------------------------------ validation
            val_loader = data.val_dataloader()
            if val_loader is not None and epoch % opt.val_every_epochs == 0:
                val_metrics = []
                for vbatch in val_loader:
                    rng, vrng = jax.random.split(rng)
                    vm = eval_step(
                        state.params,
                        state.ema.shadow if state.ema is not None else None,
                        shard_batch(vbatch, mesh),
                        vrng,
                    )
                    val_metrics.append(jax.device_get(vm))
                if val_metrics:
                    agg = {
                        f"val/{k}": float(np.mean([m[k] for m in val_metrics]))
                        for k in val_metrics[0]
                    }
                    metric_logger.log(step, agg, echo=True)
                    if epoch % opt.ckpt_every_epochs == 0:
                        ckpt_mgr.save(step, jax.device_get(state), metrics=agg)
            elif epoch % opt.ckpt_every_epochs == 0:
                ckpt_mgr.save_last(jax.device_get(state), step)

            if opt.max_steps and step >= opt.max_steps:
                break
    except KeyboardInterrupt:
        melk()
        raise
    except Exception:
        melk()
        raise
    finally:
        if prof_ctx is not None:  # stop a trace left open by break/raise
            prof_ctx.__exit__(None, None, None)
        timer.report()

    ckpt_mgr.save_last(jax.device_get(state), step)
    print(f"Training done at step {step}; checkpoints in {logdir}/checkpoints")

    # ----------------------------------------------------- third stage
    if opt.third_stage and model.cond_stage_key == "mixed":
        from ealdm_tpu.third_stage import dump_third_stage_data, ThirdStageModel

        rng, ts_rng, ts_rng2 = jax.random.split(rng, 3)
        host_vars = {"params": jax.device_get(state.params)}
        mb = opt.third_stage_max_batches
        dump_third_stage_data(
            model, host_vars, data, logdir, ts_rng, split="train", max_batches=mb
        )
        dump_third_stage_data(
            model, host_vars, data, logdir, ts_rng2, split="test", max_batches=mb
        )
        # smoke runs (capped dumps) use a small CLIP scorer resolution to
        # keep the eval-net compiles cheap; full runs keep CLIP's 224.
        clip_size = 64 if mb is not None else 224
        ThirdStageModel(model, host_vars, clip_image_size=clip_size).run(
            logdir, scaler_dir=train_ds_params.get("path")
        )
    return logdir, model, state


def train_autoencoder(opt, config, logdir, now):
    """First-stage VAE-GAN training (AutoencoderKL / VQModel configs).

    Parity with the reference's Lightning two-optimizer protocol
    (`autoencoder.py:142-162,330-372`); both optimizer updates run fused in
    one jitted step (training/vae_trainer.py).
    """
    import jax
    import jax.numpy as jnp

    from ealdm_tpu.config import instantiate_from_config
    from ealdm_tpu.data import DataModule, DevicePrefetcher
    from ealdm_tpu.models.ddpm import build_first_stage
    from ealdm_tpu.training import (
        init_vae_train_state,
        make_vae_eval_step,
        make_vae_train_step,
    )
    from ealdm_tpu.training.callbacks import (
        DeviceStatsCallback,
        MetricLogger,
        SetupCallback,
        save_png,
        to_uint8_grid,
    )
    from ealdm_tpu.training.checkpoint import CheckpointManager
    from ealdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    mp = config["model"]["params"]
    base_lr = config["model"].get("base_learning_rate", 4.5e-6)

    vae = build_first_stage(config["model"])
    loss_module = instantiate_from_config(mp["lossconfig"])
    assert loss_module is not None, "autoencoder training requires a lossconfig"

    data_cfg = dict(config["data"]["params"])
    batch_size = data_cfg.pop("batch_size")
    dataset_cfgs = {
        k: data_cfg.pop(k)
        for k in ("train", "validation", "test", "predict")
        if k in data_cfg
    }
    data = DataModule(
        batch_size=batch_size, dataset_configs=dataset_cfgs,
        wrap=data_cfg.get("wrap", False), seed=opt.seed,
    )
    n_dev = opt.devices or len(jax.devices())
    lr = (
        opt.accumulate_grad_batches * n_dev * batch_size * base_lr
        if opt.scale_lr
        else base_lr
    )
    print(f"Autoencoder learning rate: {lr:.2e}")

    SetupCallback(logdir, config, name="project").on_start(now)
    metric_logger = MetricLogger(logdir)
    device_stats = DeviceStatsCallback()
    monitor = mp.get("monitor", "val/rec_loss")
    ckpt_mgr = CheckpointManager(
        os.path.join(logdir, "checkpoints"), save_top_k=3, monitor=monitor
    )

    train_loader = data.train_dataloader()
    example = next(iter(train_loader))
    image_key = "image" if "image" in example else "img"
    rng = jax.random.PRNGKey(opt.seed)
    rng, init_rng = jax.random.split(rng)
    state, opt_ae, opt_disc = init_vae_train_state(
        vae, loss_module, init_rng,
        jnp.asarray(example[image_key]), learning_rate=lr,
        lr_g_factor=mp.get("lr_g_factor", 1.0),
    )
    step_fn = make_vae_train_step(vae, loss_module, opt_ae, opt_disc)
    eval_fn = make_vae_eval_step(vae, loss_module)

    if not opt.train:
        print("No -t flag: setup complete.")
        return logdir, vae, state

    step = 0
    for epoch in range(opt.max_epochs):
        device_stats.on_epoch_start()
        train_loader.set_epoch(epoch)
        for batch in DevicePrefetcher(train_loader):
            rng, r = jax.random.split(rng)
            state, metrics = step_fn(state, {"image": batch[image_key]}, r)
            step += 1
            if step % opt.log_every == 0:
                metric_logger.log(step, jax.device_get(metrics), echo=True)
            if opt.max_steps and step >= opt.max_steps:
                break
        metric_logger.log(step, device_stats.on_epoch_end(), prefix="sys/")

        val_loader = data.val_dataloader()
        if val_loader is not None:
            vals = []
            for vbatch in val_loader:
                rng, vr = jax.random.split(rng)
                vals.append(
                    jax.device_get(eval_fn(state, {"image": vbatch[image_key]}, vr))
                )
            if vals:
                agg = {k: float(np.mean([m[k] for m in vals])) for k in vals[0]}
                metric_logger.log(step, agg, echo=True)
                ckpt_mgr.save(step, jax.device_get(state), metrics=agg)
                # reconstruction grid (reference VQModel/AEKL log_images)
                x = jnp.asarray(next(iter(val_loader))[image_key])
                rng, rr = jax.random.split(rng)
                if hasattr(vae, "encode_prequant"):
                    rec = vae.apply({"params": state.ae_params}, x)[0]
                else:
                    rec = vae.apply({"params": state.ae_params}, x, rr)[0]
                save_png(
                    os.path.join(logdir, "images", "val",
                                 f"recon_gs-{step:06d}.png"),
                    to_uint8_grid(np.asarray(rec)),
                )
        else:
            ckpt_mgr.save_last(jax.device_get(state), step)
        if opt.max_steps and step >= opt.max_steps:
            break
    ckpt_mgr.save_last(jax.device_get(state), step)
    print(f"Autoencoder training done at step {step}")
    return logdir, vae, state


if __name__ == "__main__":
    main()
