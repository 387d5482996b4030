"""Universal-restoration training CLI — config/daclip-sde/train.py parity
(train.py:46-352, call stack SURVEY.md §3.2), TPU-native:

  * one jitted train step (context extraction + random states + matching loss +
    AdamW/Lion + EMA); batch sharded over the `data` mesh axis,
  * frozen DA-CLIP context extraction fused into the same jit (the reference runs
    it under no_grad/amp per step, train.py:254-257),
  * orbax checkpoints of {params, opt_state, ema, step} + resume,
  * val loop every val_freq: posterior sampling + PSNR with best tracking
    (train.py:282-337).

Usage:
  python -m daclip_tpu.cli.train_restoration -opt options/train.yml
"""
from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np


def _precompute_contexts(ds, context_fn, log, chunk: int = 32):
    """One pass of the frozen DA-CLIP tower over the dataset's deterministic
    full-image CLIP views (datasets.clip_view) → per-sample context cache.
    Chunked + tail-padded so the encoder compiles exactly once."""
    import jax.numpy as jnp

    from daclip_tpu.data.datasets import CachedContextDataset

    n = len(ds)
    img_out, txt_out = [], []
    t0 = time.time()
    for s0 in range(0, n, chunk):
        idx = list(range(s0, min(s0 + chunk, n)))
        views = np.stack([ds.clip_view(i) for i in idx])
        pad = chunk - len(idx)
        if pad:
            views = np.concatenate([views, np.repeat(views[-1:], pad, 0)])
        ic, tc = context_fn(jnp.asarray(views))
        img_out.append(np.asarray(ic, np.float32)[:len(idx)])
        txt_out.append(np.asarray(tc, np.float32)[:len(idx)])
    log.info("cached frozen DA-CLIP contexts for %d samples in %.1fs",
             n, time.time() - t0)
    return CachedContextDataset(ds, np.concatenate(img_out),
                                np.concatenate(txt_out))


def build_dataloaders(opt, num_hosts=1, host_id=0, context_fn=None, log=None):
    from daclip_tpu.data import DataLoader, IterSampler, create_dataset

    train_loader = val_loader = None
    for phase, dataset_opt in (opt["datasets"] or {}).items():
        phase = phase.split("_")[0]
        if phase == "train":
            ds = create_dataset(dataset_opt)
            if (dataset_opt.get("cache_clip_contexts") and context_fn is not None
                    and hasattr(ds, "clip_view")):
                ds = _precompute_contexts(ds, context_fn, log)
            elif dataset_opt.get("cache_clip_contexts"):
                (log or logging).warning(
                    "cache_clip_contexts ignored: %s",
                    "no frozen DA-CLIP tower" if context_fn is None else
                    f"{type(ds).__name__} has no deterministic clip_view "
                    "(MD/MDGT synthesize LQ per epoch)")
            ratio = dataset_opt.get("dataset_enlarge_ratio", 200)
            sampler = IterSampler(len(ds), host_id=host_id, num_hosts=num_hosts,
                                  ratio=ratio)
            train_loader = DataLoader(
                ds, batch_size=dataset_opt.get("batch_size", 16) // num_hosts,
                sampler=sampler,
                num_workers=min(dataset_opt.get("n_workers", 4), 8))
        elif phase == "val":
            val_loader = create_dataset(dataset_opt)
    return train_loader, val_loader


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-opt", required=True)
    p.add_argument("--max-steps", type=int, default=None,
                   help="override niter (smoke runs)")
    p.add_argument("--val-sample-T", type=int, default=-1,
                   help="shorter sampler for validation")
    p.add_argument("--debug-nans", action="store_true",
                   help="jax_debug_nans (the reference's detect_anomaly analogue)")
    p.add_argument("--mesh", default=None,
                   help="device mesh 'data[,fsdp]' — fsdp>1 ZeRO-shards the "
                        "UNet params over the second axis (parallel/mesh.py); "
                        "default: all devices on data")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from daclip_tpu import config as cfg_mod
    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.parallel import (fsdp_param_shardings,
                                     initialize_distributed, mesh_from_spec)
    from daclip_tpu.sde import IRSDE
    from daclip_tpu.train.restoration import (RestorationTrainConfig, init_state,
                                              make_sampler, make_train_step)
    from daclip_tpu.utils import metrics
    from daclip_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                             save_checkpoint)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("train")

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    initialize_distributed()
    opt = cfg_mod.parse(args.opt, is_train=True)
    per_host_batch = (opt["datasets"]["train"].get("batch_size", 16))
    mesh, (d_data, d_fsdp, _) = mesh_from_spec(args.mesh, per_host_batch)
    batch_sharding = NamedSharding(mesh, P("data"))
    log.info("mesh: data=%d fsdp=%d (%d devices)", d_data, d_fsdp, mesh.size)

    train_opt = opt["train"] or {}
    niter = args.max_steps or int(train_opt.get("niter", 700000))
    cfg = RestorationTrainConfig(
        optimizer=train_opt.get("optimizer", "AdamW"),
        lr_G=float(train_opt.get("lr_G", 2e-4)),
        lr_scheme=train_opt.get("lr_scheme", "TrueCosineAnnealingLR"),
        beta1=float(train_opt.get("beta1", 0.9)),
        beta2=float(train_opt.get("beta2", 0.99)),
        niter=niter,
        warmup_iter=int(train_opt.get("warmup_iter", -1) or -1),
        lr_steps=tuple(train_opt.get("lr_steps") or ()),
        lr_gamma=float(train_opt.get("lr_gamma", 0.5)),
        eta_min=float(train_opt.get("eta_min", 1e-6)),
        weight_decay_G=float(train_opt.get("weight_decay_G") or 0.0),
        loss_type=train_opt.get("loss_type", "l1"),
        weight=float(train_opt.get("weight", 1.0)),
        # warm-restart schedule keys (lr_scheduler.py:8-44 parity)
        restarts=tuple(train_opt.get("restarts") or ()),
        restart_weights=tuple(train_opt.get("restart_weights") or ()),
        is_weighted=bool(train_opt.get("is_weighted", False)),
        grad_clip=(float(train_opt["gradient_clipping"])
                   if train_opt.get("gradient_clipping") else None),
        # EMA defaults = reference's EMA(model, beta=0.995, update_every=10)
        # (denoising_model.py:118); overridable for short runs where the
        # ~1000-step effective EMA window would dominate the horizon
        ema_beta=float(train_opt.get("ema_beta", 0.995)),
        ema_update_every=int(train_opt.get("ema_update_every", 10)),
    )
    sde_opt = opt["sde"] or {}
    sde = IRSDE(max_sigma=sde_opt.get("max_sigma", 50), T=sde_opt.get("T", 100),
                schedule=sde_opt.get("schedule", "cosine"),
                eps=sde_opt.get("eps", 0.005))

    net_opt = (opt["network_G"] or {}).get("setting", {}) or {}
    patch = opt["datasets"]["train"].get("patch_size", 256)
    # remat (gradient checkpointing) auto-enables for large patches: the
    # production 256²/B16 training step otherwise exceeds v5e HBM by ~120 MB
    remat = bool(net_opt.get("remat", patch >= 256))
    unet = ConditionalUNet(
        in_nc=net_opt.get("in_nc", 3), out_nc=net_opt.get("out_nc", 3),
        nf=net_opt.get("nf", 64), ch_mult=tuple(net_opt.get("ch_mult", (1, 2, 4, 8))),
        context_dim=net_opt.get("context_dim", 512),
        use_degra_context=bool(net_opt.get("use_degra_context", True)),
        use_image_context=bool(net_opt.get("use_image_context", True)),
        scale=float(net_opt.get("scale", 1.0) or 1.0),
        remat=remat,
        dtype=jnp.bfloat16)

    # frozen DA-CLIP for context extraction (train.py:204-209)
    daclip_apply = None
    daclip_path = (opt["path"] or {}).get("daclip")
    use_ctx = unet.use_degra_context or unet.use_image_context
    if use_ctx and daclip_path and os.path.exists(str(daclip_path)):
        from daclip_tpu.utils.torch_convert import (convert_daclip,
                                                    load_torch_state_dict)
        # wild-ir uses ViT-L-14 contexts (768-d); inferred from context_dim or
        # set explicitly via path.daclip_model (config/wild-ir/options parity)
        daclip_model = ((opt["path"] or {}).get("daclip_model")
                        or ("daclip_ViT-L-14"
                            if (net_opt.get("context_dim") or 512) == 768
                            else "daclip_ViT-B-32"))
        clip_cfg = CLIPCfg.from_dict(get_model_config(daclip_model))
        daclip = DaCLIP(clip_cfg, dtype=jnp.bfloat16)
        daclip_params = jax.tree.map(
            jnp.asarray, convert_daclip(load_torch_state_dict(str(daclip_path))))

        def _daclip_apply(params, clip_view):
            img_f, degra_f = daclip.apply(
                {"params": params}, clip_view, control=True, normalize=True,
                method=daclip.encode_image)
            return (jax.lax.stop_gradient(img_f.astype(jnp.float32)),
                    jax.lax.stop_gradient(degra_f.astype(jnp.float32)))

        # params as jit ARGUMENTS (closure constants blow the remote-compile
        # size limit with real-size checkpoints — see pipeline.py)
        _daclip_jit = jax.jit(_daclip_apply)

        def daclip_apply(clip_view):
            return _daclip_jit(daclip_params, clip_view)
    elif use_ctx:
        log.warning("no daclip checkpoint at %s — training without contexts",
                    daclip_path)

    # init / resume
    B = (opt["datasets"]["train"].get("batch_size", 16))
    x0 = jnp.zeros((1, patch, patch, 3))
    ctx0 = jnp.zeros((1, net_opt.get("context_dim", 512) or 512))
    params = unet.init(jax.random.PRNGKey(train_opt.get("manual_seed", 0) or 0),
                       x0, x0, jnp.ones((1,)),
                       ctx0 if unet.use_degra_context else None,
                       ctx0 if unet.use_image_context else None)
    state = init_state(params, cfg)
    ckpt_dir = opt["path"]["training_state"]
    start_step = 0
    if ckpt_dir and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, target=state)
        start_step = int(state.step)
        log.info("resumed from step %d", start_step)
    # place the state on the mesh so every jit input shares the same device
    # set — mixing committed single-device state with mesh-sharded batches
    # deadlocks the CPU collective path.  fsdp>1 ZeRO-shards the UNet params
    # (and their EMA shadow) over the 'fsdp' axis; everything else replicates.
    repl = NamedSharding(mesh, P())
    if d_fsdp > 1:
        param_sh = fsdp_param_shardings(state.params, mesh)
        state = state._replace(
            params=jax.tree.map(jax.device_put, state.params, param_sh),
            ema=state.ema._replace(
                params=jax.tree.map(jax.device_put, state.ema.params,
                                    param_sh),
                step=jax.device_put(state.ema.step, repl)),
            opt_state=jax.device_put(state.opt_state, repl),
            step=jax.device_put(state.step, repl))
    else:
        state = jax.device_put(state, repl)

    base_step = make_train_step(unet.apply, sde, cfg)

    def full_step(state, batch, key):
        # cached-context batches carry text/image_context directly and no
        # LQ_clip (CachedContextDataset); otherwise extract in-jit
        if daclip_apply is not None and "LQ_clip" in batch:
            img_ctx, degra_ctx = daclip_apply(batch["LQ_clip"])
            batch = dict(batch, text_context=degra_ctx, image_context=img_ctx)
        batch.pop("LQ_clip", None)
        return base_step(state, batch, key)

    # buffer donation deadlocks XLA:CPU collectives AND is unsupported by the
    # axon remote executor: root-caused r2 (tools/repro_donate.py) — a donated
    # step fails with a runtime INVALID_ARGUMENT at EVERY size (128² incl.),
    # and the error wedges the backend (subsequent device_put fails), i.e.
    # the tunnel cannot alias input buffers at all; not a program-size or
    # remat issue.  Default off here; enable via DACLIP_TPU_DONATE=1 on
    # direct-attached TPU runtimes where aliasing works
    import os as _os
    donate = ((0,) if (_os.environ.get("DACLIP_TPU_DONATE") == "1"
                       and jax.default_backend() != "cpu") else ())
    step_fn = jax.jit(full_step, donate_argnums=donate)

    # per-host data sharding: each host feeds a distinct stripe of the global
    # batch (IterSampler host striding; identical feeds would silently
    # replicate samples across the GSPMD global batch)
    ctx_fn = daclip_apply  # already jitted with params as arguments
    train_loader, val_ds = build_dataloaders(
        opt, num_hosts=jax.process_count(), host_id=jax.process_index(),
        context_fn=ctx_fn, log=log)
    val_freq = int(train_opt.get("val_freq", 1e4))
    save_freq = int((opt["logger"] or {}).get("save_checkpoint_freq", 1e4))
    print_freq = int((opt["logger"] or {}).get("print_freq", 200))

    val_sde = IRSDE(max_sigma=sde_opt.get("max_sigma", 50),
                    T=sde_opt.get("T", 100), sample_T=args.val_sample_T,
                    schedule=sde_opt.get("schedule", "cosine"),
                    eps=sde_opt.get("eps", 0.005))
    val_sampler = jax.jit(make_sampler(unet.apply, val_sde))
    best_psnr, best_step = -1.0, -1

    def run_val(state, step):
        nonlocal best_psnr, best_step
        if val_ds is None:
            return
        psnrs = []
        for i in range(min(len(val_ds), 8)):
            s = val_ds[i]
            lq, gt = s["LQ"], s["GT"]
            hh = (lq.shape[0] // 16) * 16
            ww = (lq.shape[1] // 16) * 16
            lq, gt = lq[:hh, :ww], gt[:hh, :ww]
            tctx = ictx = None
            if daclip_apply is not None:
                ictx, tctx = daclip_apply(jnp.asarray(s["LQ_clip"][None]))
            out = val_sampler(state.ema.params, jnp.asarray(lq[None]),
                              jax.random.PRNGKey(i),
                              tctx if unet.use_degra_context else None,
                              ictx if unet.use_image_context else None)
            psnrs.append(metrics.calculate_psnr(
                metrics.array2img(np.asarray(out[0])), metrics.array2img(gt)))
        psnr = float(np.mean(psnrs))
        if psnr > best_psnr:
            best_psnr, best_step = psnr, step
        log.info("# val step %d: psnr %.4f (best %.4f @ %d)",
                 step, psnr, best_psnr, best_step)

    log.info("training from step %d to %d", start_step, niter)
    key = jax.random.PRNGKey(1234)
    step = start_step
    t0 = time.time()
    epoch = 0
    while step < niter:
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            if step >= niter:
                break
            keys = ("LQ", "GT", "image_context", "text_context") + \
                (("LQ_clip",) if daclip_apply is not None else ())
            dev_batch = {k: jax.device_put(v, batch_sharding)
                         for k, v in batch.items() if k in keys}
            state, m = step_fn(state, dev_batch, jax.random.fold_in(key, step))
            step += 1
            if step % print_freq == 0:
                ips = print_freq * B / (time.time() - t0)
                t0 = time.time()
                log.info("step %d loss %.5f lr %.2e %.1f samples/s",
                         step, float(m["loss"]), float(m["lr"]), ips)
            if val_freq and step % val_freq == 0:
                run_val(state, step)
            if ckpt_dir and save_freq and step % save_freq == 0:
                # async: overlaps serialization with the next steps
                save_checkpoint(ckpt_dir, step, state, max_to_keep=5,
                                wait=False)
                log.info("saving checkpoint @ %d (async)", step)
        epoch += 1
    if ckpt_dir:
        save_checkpoint(ckpt_dir, step, state, max_to_keep=5)
    run_val(state, step)
    log.info("done: best psnr %.4f @ step %d", best_psnr, best_step)
    return {"best_psnr": best_psnr, "best_step": best_step, "final_step": step}


if __name__ == "__main__":
    main()
