"""CLIP / DA-CLIP training harness — the `python -m training.main` equivalent
(reference da-clip/src/training/main.py:71-498; flag surface in cli/params.py
mirrors training/params.py:26-459 so reference launch scripts run unchanged;
call stack SURVEY.md §3.3).

TPU-native: one jitted train step over a `data`-sharded global batch on a
('data','fsdp'[,'model']) mesh (--mesh); the frozen CLIP tower lives outside
the optimizer; LiT locking is an optimizer update mask; checkpoints via orbax
with best-by-train-loss tracking (fork behaviour, main.py:443-448) and
optional background remote sync (utils/file_utils.py).

Usage (mirrors da-clip/src/single_train.sh):
  python -m daclip_tpu.cli.train_daclip --train-data data/train.csv --da \
      --model daclip_ViT-B-32 --pretrained pretrained/ViT-B-32.pt \
      --batch-size 128 --epochs 50 --lr 2e-5
"""
from __future__ import annotations

import logging
import math
import os
import time
from functools import partial

import numpy as np

from daclip_tpu.cli.params import parse_args


def _setup_logging(log_base: str, debug: bool, log_local: bool, host0: bool):
    """Console + logs/<name>/out.log (reference setup_logging, logger.py:5-28;
    --log-local logs from every host, main.py:113-118)."""
    level = logging.DEBUG if debug else logging.INFO
    root = logging.getLogger()
    root.setLevel(level)
    # replace only OUR previous handlers (repeat main() calls / tests) — never
    # force-close foreign ones (absl shares its stream with the root handlers;
    # closing it breaks interpreter-shutdown logging)
    for h in [h for h in root.handlers if getattr(h, "_daclip", False)]:
        root.removeHandler(h)
        h.close()
    fmt = logging.Formatter("%(asctime)s | %(levelname)s | %(message)s")
    if host0 or log_local:
        os.makedirs(log_base, exist_ok=True)
        for h in (logging.StreamHandler(),
                  logging.FileHandler(os.path.join(log_base, "out.log"))):
            h.setFormatter(fmt)
            h._daclip = True
            root.addHandler(h)
    return logging.getLogger("daclip")


def _copy_codebase(log_base: str, log):
    """--copy-codebase (main.py:478-498): snapshot the package source next to
    the run so the exact code is recoverable."""
    import shutil

    import daclip_tpu

    dst = os.path.join(log_base, "code", "daclip_tpu")
    if os.path.exists(dst):
        log.warning("code snapshot %s already exists; skipping copy", dst)
        return
    src = os.path.dirname(os.path.abspath(daclip_tpu.__file__))
    shutil.copytree(src, dst,
                    ignore=shutil.ignore_patterns("__pycache__", "*.pyc"))
    log.info("copied codebase to %s", dst)


def main(argv=None):
    args = parse_args(argv)

    # run identity (main.py:90-104): date-stamped name when unset
    if args.name is None:
        args.name = "-".join([
            time.strftime("%Y_%m_%d-%H_%M_%S"),
            f"model_{args.model.replace('/', '-')}",
            f"lr_{args.lr}", f"b_{args.batch_size}", f"p_{args.precision}"])
    log_base = os.path.join(args.logs, args.name)
    ckpt_dir = os.path.join(log_base, "checkpoints")

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from daclip_tpu.data.csv_dataset import CsvDataset, SyntheticDataset
    from daclip_tpu.data.loader import DataLoader
    from daclip_tpu.factory import create_model_and_transforms
    from daclip_tpu.models import DaCLIP
    from daclip_tpu.parallel import initialize_distributed, mesh_from_spec
    from daclip_tpu.parallel.mesh import (fsdp_param_shardings,
                                          tp_param_shardings)
    from daclip_tpu.tokenizer import tokenize
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_accum_train_step,
                                             make_train_step, merge_params,
                                             partition_daclip_params)
    from daclip_tpu.train.locking import build_update_mask
    from daclip_tpu.utils import file_utils
    from daclip_tpu.utils.checkpoint import save_checkpoint
    from daclip_tpu.utils.logging import MetricWriter

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.dist_url and args.dist_url != "env://" and "://" in args.dist_url:
        # --dist-url maps onto the JAX coordinator (distributed.py:43-60)
        os.environ.setdefault("COORDINATOR_ADDRESS",
                              args.dist_url.split("://", 1)[1])
    initialize_distributed()
    host0 = jax.process_index() == 0
    log = _setup_logging(log_base, args.debug, args.log_local, host0)
    if host0:
        os.makedirs(ckpt_dir, exist_ok=True)
        if args.copy_codebase:
            _copy_codebase(log_base, log)

    mesh, (d_data, d_fsdp, d_model) = mesh_from_spec(args.mesh,
                                                     args.batch_size)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    log.info("mesh: data=%d fsdp=%d model=%d (%d devices)",
             d_data, d_fsdp, d_model, mesh.size)

    # DA mode is implied by a daclip_* model (single_train.sh always passes
    # both; keeps `--model daclip_* ` alone working too)
    args.da = args.da or "daclip" in args.model
    force_image_size = (args.force_image_size[0]
                        if args.force_image_size else None)

    model, params, pp_train, pp_val = create_model_and_transforms(
        args.model, pretrained=args.pretrained or None,
        precision=args.precision,
        use_predictor=args.da and not args.uir_variant,
        image_mean=args.image_mean, image_std=args.image_std, seed=args.seed,
        force_quick_gelu=args.force_quick_gelu,
        force_custom_text=args.force_custom_text,
        force_patch_dropout=args.force_patch_dropout,
        force_image_size=force_image_size,
        remat=args.grad_checkpointing)
    clip_cfg = model.cfg
    is_daclip = isinstance(model, DaCLIP)
    if args.pretrained:
        log.info("loaded pretrained weights: %s", args.pretrained)

    # ---- data ---------------------------------------------------------------
    tokenizer = partial(tokenize, context_length=clip_cfg.text.context_length)
    ds_type = args.dataset_type
    if ds_type == "auto":  # get_dataset_fn dispatch (training/data.py:640-660)
        if not args.train_data:
            ds_type = "synthetic"
        elif ("::" in args.train_data or args.train_data.endswith(".tar")
              or "{" in args.train_data):
            ds_type = "webdataset"
        else:
            ds_type = "csv"
    banks = None
    if ds_type == "csv":
        if args.fast_clip_view:
            # opt-in cv2 pipeline for throughput-bound hosts: same crop
            # geometry/rng draws, different resample kernel than the parity
            # PIL path (transforms.image_transform docstring); normalization
            # stats resolved exactly like the factory did for pp_train
            # (explicit args > pretrained-tag stats > OpenAI defaults)
            from pathlib import Path

            from daclip_tpu.models.pretrained import get_pretrained_cfg
            from daclip_tpu.transforms import image_transform
            tag_cfg = (get_pretrained_cfg(args.model, args.pretrained)
                       if args.pretrained
                       and not Path(str(args.pretrained)).exists() else {})
            pp_train = image_transform(
                clip_cfg.vision.image_size, is_train=True,
                mean=args.image_mean or tag_cfg.get("mean"),
                std=args.image_std or tag_cfg.get("std"), backend="cv2")
        ds = CsvDataset(args.train_data, pp_train, args.csv_img_key,
                        args.csv_caption_key, args.csv_separator,
                        tokenizer=tokenizer, da=args.da,
                        crop=args.crop, seed=args.seed,
                        decode="cv2" if args.fast_clip_view else "pil")
        banks = ds.banks()
        loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                            num_workers=args.workers, seed=args.seed)
    elif ds_type == "webdataset":
        from daclip_tpu.data.webdataset import ClipWebLoader, WebDataset
        if args.da:
            raise SystemExit("--da needs the csv pipeline (degradation "
                             "captions; training/data.py:29-156) — webdataset "
                             "sources carry no degradation metadata")
        weights = None
        if args.train_data_upsampling_factors:
            weights = [float(w) for w in
                       args.train_data_upsampling_factors.split("::")]
        wds = WebDataset(args.train_data, shuffle_buffer=5000, seed=args.seed,
                         host_id=jax.process_index(),
                         num_hosts=jax.process_count(),
                         resampled=args.dataset_resampled, weights=weights)
        loader = ClipWebLoader(wds, pp_train, tokenizer, args.batch_size,
                               num_samples=args.train_num_samples or 0)
    else:
        ds = SyntheticDataset(pp_train,
                              dataset_size=args.train_num_samples or 512,
                              tokenizer=tokenizer, da=args.da)
        banks = ds.banks()
        loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                            num_workers=args.workers, seed=args.seed)
    if args.da and banks is None:
        from daclip_tpu.data.csv_dataset import build_banks
        banks = build_banks(tokenizer)

    # ---- trainable/frozen split + optimizer --------------------------------
    if is_daclip:
        trainable, frozen = partition_daclip_params(params)
    else:
        trainable, frozen = dict(params), {}
    # frozen CLIP tree is a jit ARGUMENT (not a baked constant — a ~600 MB HLO
    # otherwise), device-resident and mesh-replicated once up front
    frozen = jax.device_put(jax.tree.map(jnp.asarray, frozen), repl)

    # LiT locking (main.py:261-269) as an optimizer update mask
    update_mask = build_update_mask(
        trainable, lock_image=args.lock_image,
        lock_image_unlocked_groups=args.lock_image_unlocked_groups,
        lock_text=args.lock_text,
        lock_text_unlocked_layers=args.lock_text_unlocked_layers,
        lock_text_freeze_layer_norm=args.lock_text_freeze_layer_norm)
    if update_mask is not None:
        log.info("LiT locking active (image=%s text=%s)",
                 args.lock_image, args.lock_text)

    # distillation teacher (main.py:219-243): frozen model, params per call
    distill_apply, distill_params = None, None
    if args.distill_model:
        from daclip_tpu.factory import create_model
        t_model, t_params = create_model(
            args.distill_model, pretrained=args.distill_pretrained,
            precision=args.precision, seed=args.seed)
        distill_apply = t_model.apply
        distill_params = jax.device_put(
            jax.tree.map(jnp.asarray, t_params), repl)
        log.info("distilling from %s (%s)", args.distill_model,
                 args.distill_pretrained)

    steps_per_epoch = max(len(loader), 1)
    opt_steps_per_epoch = max(steps_per_epoch // args.accum_freq, 1)
    cooldown_steps = (opt_steps_per_epoch * args.epochs_cooldown
                      if args.epochs_cooldown else None)
    variant = ("fork" if args.da and not args.uir_variant
               else "uir" if args.da else "clip")
    cfg = ClipTrainConfig(
        lr=args.lr, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        wd=args.wd, warmup=args.warmup,
        total_steps=args.epochs * opt_steps_per_epoch,
        lr_scheduler=args.lr_scheduler, lr_cooldown_end=args.lr_cooldown_end,
        lr_cooldown_power=args.lr_cooldown_power,
        cooldown_steps=cooldown_steps, skip_scheduler=args.skip_scheduler,
        grad_clip_norm=args.grad_clip_norm, accum_freq=args.accum_freq,
        variant=variant, distill=distill_apply is not None,
        patch_dropout=bool(args.force_patch_dropout))
    # accum_freq > 1 uses the reference-semantic cached-feature two-pass step
    # (train/clip_train.py:make_accum_train_step) — ONE real optimizer update
    # per accum_freq micro-batches, so the optimizer state is the plain one
    import dataclasses as _dc
    use_accum = args.accum_freq > 1
    if use_accum and distill_apply is not None:
        raise SystemExit("--accum-freq > 1 with --distill-model is "
                         "unsupported (the reference only distills at "
                         "accum_freq 1, training/train.py:109-121)")
    state = init_state(trainable,
                       _dc.replace(cfg, accum_freq=1) if use_accum else cfg)

    # parameter placement over the mesh: TP > fsdp > replicated
    if d_model > 1:
        param_sh = tp_param_shardings(state.params, mesh)
    elif d_fsdp > 1:
        param_sh = fsdp_param_shardings(state.params, mesh)
    else:
        param_sh = jax.tree.map(lambda _: repl, state.params)
    state = state._replace(
        params=jax.tree.map(jax.device_put, state.params, param_sh),
        opt_state=jax.device_put(state.opt_state, repl),
        step=jax.device_put(state.step, repl))
    if d_fsdp > 1 and frozen:
        frozen = jax.tree.map(jax.device_put, frozen,
                              fsdp_param_shardings(frozen, mesh))

    # buffer donation deadlocks XLA:CPU collectives AND hit a TPU runtime
    # InvalidArgument on the large 256² training program via axon — default
    # off, opt in with DACLIP_TPU_DONATE=1
    donate = ((0,) if (os.environ.get("DACLIP_TPU_DONATE") == "1"
                       and jax.default_backend() != "cpu") else ())
    if use_accum:
        inner_step = make_accum_train_step(model.apply, frozen, cfg, banks,
                                           update_mask=update_mask)
    else:
        inner_step = make_train_step(model.apply, frozen, cfg, banks,
                                     update_mask=update_mask,
                                     distill_apply=distill_apply)
    step_fn = jax.jit(inner_step, donate_argnums=donate)

    # ---- resume (main.py:131-163 + 426-459) --------------------------------
    start_epoch = 0
    if args.resume:
        from daclip_tpu.utils.checkpoint import latest_step, restore_checkpoint
        rdir = ckpt_dir if args.resume == "latest" else args.resume
        if (args.resume == "latest" and args.remote_sync
                and latest_step(rdir) is None):
            # remote `latest` resolution: mirror the synced checkpoint dir
            # down before resuming (reference reads the remote listing,
            # main.py:140-150; orbax checkpoints are directories so the step
            # dir is downloaded whole)
            remote_ckpts = os.path.join(args.remote_sync, args.name,
                                        "checkpoints")
            if file_utils.list_remote_dir(remote_ckpts):
                file_utils.download_remote_dir(remote_ckpts, rdir)
                log.info("downloaded remote checkpoints from %s", remote_ckpts)
        step = latest_step(rdir)
        if step is not None:
            # optimizer moments + step counter resume too (main.py:426-459
            # parity); structured restore rebuilds the optax pytree, with a
            # params-only fallback for old-format checkpoints
            try:
                restored = restore_checkpoint(
                    rdir, step, target={"params": state.params,
                                        "opt_state": state.opt_state,
                                        "step": state.step, "frozen": frozen,
                                        "epoch": 0})
                state = state._replace(params=restored["params"],
                                       opt_state=restored["opt_state"],
                                       step=jnp.asarray(restored["step"]))
            except Exception:
                restored = restore_checkpoint(rdir, step)
                state = state._replace(params=jax.tree.map(
                    jnp.asarray, restored["params"]))
            # restored arrays come back committed to one device; re-place
            # over the mesh so they don't conflict with the sharded batch
            state = state._replace(
                params=jax.tree.map(jax.device_put, state.params, param_sh),
                opt_state=jax.device_put(state.opt_state, repl),
                step=jax.device_put(state.step, repl))
            start_epoch = int(restored.get("epoch", step))
            log.info("resumed from %s epoch %d", rdir, start_epoch)
        elif args.resume != "latest":
            raise FileNotFoundError(args.resume)

    # ---- reporting + remote sync -------------------------------------------
    report_to = [r for r in args.report_to.split(",") if r]
    writer = None
    if host0 or args.log_local:
        writer = MetricWriter(
            log_base, use_tensorboard="tensorboard" in report_to,
            use_wandb="wandb" in report_to,
            wandb_project=args.wandb_project_name, wandb_name=args.name,
            wandb_notes=args.wandb_notes, wandb_config=vars(args))
    sync_thread = None
    if args.remote_sync and host0:
        remote_base = os.path.join(args.remote_sync, args.name)
        if not file_utils.remote_sync(log_base, remote_base,
                                      args.remote_sync_protocol):
            raise SystemExit("initial remote sync failed (main.py:121-129)")
        sync_thread = file_utils.start_sync_process(
            args.remote_sync_frequency, log_base, remote_base,
            args.remote_sync_protocol)
        sync_thread.start()

    # ---- eval hooks ---------------------------------------------------------
    val_ds = None
    if args.val_data:
        val_ds = CsvDataset(args.val_data, pp_val, args.csv_img_key,
                            args.csv_caption_key, args.csv_separator,
                            tokenizer=tokenizer, da=args.da)

    def run_val(state):
        """val losses + retrieval recall (training/train.py:248-381)."""
        from daclip_tpu.eval.retrieval import evaluate as eval_retrieval
        params = {"params": merge_params(state.params, frozen)}
        metrics = eval_retrieval(model.apply, params, val_ds,
                                 batch_size=args.batch_size, banks=banks,
                                 variant=cfg.variant)
        log.info("val: %s", {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    encode_image_j = jax.jit(lambda p, im: model.apply(
        {"params": p}, im, normalize=True, method=model.encode_image))
    encode_text_j = jax.jit(lambda p, t: model.apply(
        {"params": p}, t, normalize=True, method=model.encode_text))

    def run_zero_shot(state):
        """in-training ImageNet zero-shot (train.py:380 → zero_shot.py)."""
        from daclip_tpu.eval.imagenet_zero_shot import evaluate_with_encoders
        merged = merge_params(state.params, frozen)
        metrics = evaluate_with_encoders(
            partial(encode_image_j, merged), partial(encode_text_j, merged),
            args.imagenet_val, clip_cfg.vision.image_size,
            batch_size=args.batch_size)
        log.info("zero-shot: %s", {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    # ---- train loop ---------------------------------------------------------
    max_to_keep = 1 if args.delete_previous_checkpoint else 3
    best_loss = float("inf")
    global_step = start_epoch * steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        micro = []  # accum_freq micro-batch staging (train.py:125-145)
        for i, batch in enumerate(loader):
            if use_accum:
                micro.append({k: np.asarray(v) for k, v in batch.items()
                              if isinstance(v, np.ndarray)})
                if len(micro) < args.accum_freq:
                    continue
                # (accum_freq, B, ...): micro-batch axis replicated, batch
                # axis data-sharded
                stacked_shard = NamedSharding(mesh, P(None, "data"))
                dev = {k: jax.device_put(
                    np.stack([m_[k] for m_ in micro]), stacked_shard)
                    for k in micro[0]}
                micro = []
            else:
                dev = {k: jax.device_put(np.asarray(v), shard)
                       for k, v in batch.items() if isinstance(v, np.ndarray)}
            sargs = (dev, frozen, distill_params) if distill_apply else \
                (dev, frozen)
            state, m = step_fn(state, *sargs)
            losses.append(float(m["total_loss"]))
            global_step += 1
            if (i + 1) % args.log_every_n_steps == 0 or i + 1 == steps_per_epoch:
                sps = (i + 1) * args.batch_size / (time.time() - t0)
                log.info("epoch %d step %d loss %.4f (%.1f samples/s)",
                         epoch, i + 1, losses[-1], sps)
                if writer:
                    writer.write(global_step,
                                 {"loss": losses[-1],
                                  "grad_norm": float(m["grad_norm"]),
                                  "logit_scale": float(m["logit_scale"]),
                                  "samples_per_s": sps}, prefix="train/")
        epoch_loss = float(np.mean(losses)) if losses else float("nan")
        log.info("epoch %d done: mean loss %.4f", epoch, epoch_loss)

        evals = {}
        if val_ds is not None and (epoch + 1) % args.val_frequency == 0:
            evals.update(run_val(state))
        if (args.imagenet_val and args.zeroshot_frequency
                and ((epoch + 1) % args.zeroshot_frequency == 0
                     or epoch + 1 == args.epochs)):
            evals.update(run_zero_shot(state))
        if writer and evals:
            writer.write(global_step, evals, prefix="val/")

        if host0:
            ckpt_tree = {"params": state.params, "opt_state": state.opt_state,
                         "step": state.step, "frozen": frozen,
                         "epoch": epoch + 1}
            if (epoch + 1) % args.save_frequency == 0:
                save_checkpoint(ckpt_dir, epoch + 1, ckpt_tree,
                                max_to_keep=max_to_keep)
            elif args.save_most_recent:
                # epoch_latest analogue (main.py:448-457): a rolling
                # single-slot save for off-frequency epochs
                save_checkpoint(os.path.join(ckpt_dir, "latest"), epoch + 1,
                                ckpt_tree, max_to_keep=1)
            if epoch_loss < best_loss:  # best-by-train-loss (main.py:443-448)
                best_loss = epoch_loss
                save_checkpoint(os.path.join(ckpt_dir, "best"), epoch + 1,
                                ckpt_tree, max_to_keep=1)
    log.info("training complete; best epoch loss %.4f", best_loss)
    if writer:
        writer.close()
    if sync_thread is not None:
        from daclip_tpu.utils.checkpoint import wait_all
        wait_all()
        sync_thread.stop(final_sync=True)
    return {"best_loss": best_loss}


if __name__ == "__main__":
    main()
