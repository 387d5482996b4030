"""DA-CLIP training CLI — the `python -m training.main --da` equivalent
(reference da-clip/src/training/main.py:71-498 + params.py flag names kept for
drop-in script compatibility; call stack SURVEY.md §3.3).

TPU-native: one jitted train step over a `data`-sharded global batch; the frozen
CLIP tower lives outside the optimizer; checkpoints via orbax with best-by-train-
loss tracking (fork behaviour, main.py:443-448).

Usage (mirrors da-clip/src/single_train.sh):
  python -m daclip_tpu.cli.train_daclip --train-data data/train.csv --da \
      --model daclip_ViT-B-32 --pretrained pretrained/ViT-B-32.pt \
      --batch-size 128 --epochs 50 --lr 2e-5
"""
from __future__ import annotations

import argparse
import logging
import math
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # data (params.py names)
    p.add_argument("--train-data", default=None)
    p.add_argument("--val-data", default=None)
    p.add_argument("--dataset-type", default="auto",
                   choices=["csv", "synthetic", "auto"])
    p.add_argument("--csv-separator", default="\t")
    p.add_argument("--csv-img-key", default="filepath")
    p.add_argument("--csv-caption-key", default="title")
    p.add_argument("--train-num-samples", type=int, default=512)
    p.add_argument("--workers", type=int, default=4)
    # model
    p.add_argument("--model", default="daclip_ViT-B-32")
    p.add_argument("--pretrained", default="",
                   help="torch CLIP checkpoint to convert (laion2b .pt / .bin)")
    p.add_argument("--resume", default=None)
    p.add_argument("--precision", default="amp_bf16")
    p.add_argument("--da", action="store_true", default=True)
    p.add_argument("--crop", action="store_true")
    p.add_argument("--uir-variant", action="store_true",
                   help="use the original DA-CLIP loss instead of the fork's")
    # optim (params.py:5-11 ViT-B-32 defaults)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=32)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.98)
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--wd", type=float, default=0.2)
    p.add_argument("--warmup", type=int, default=10000)
    p.add_argument("--lr-scheduler", default="cosine")
    p.add_argument("--accum-freq", type=int, default=1)
    p.add_argument("--grad-clip-norm", type=float, default=None)
    # logging / ckpt
    p.add_argument("--logs", default="./logs/")
    p.add_argument("--name", default=None)
    p.add_argument("--save-frequency", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug-nans", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("daclip")

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from daclip_tpu.data.csv_dataset import CsvDataset, SyntheticDataset
    from daclip_tpu.data.loader import DataLoader
    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from daclip_tpu.parallel import initialize_distributed, make_mesh_for_batch
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_train_step,
                                             partition_daclip_params)
    from daclip_tpu.transforms import image_transform
    from daclip_tpu.utils.checkpoint import save_checkpoint

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    initialize_distributed()
    mesh = make_mesh_for_batch(args.batch_size)
    shard = NamedSharding(mesh, P("data"))

    clip_cfg = CLIPCfg.from_dict(get_model_config(args.model))
    dtype = jnp.bfloat16 if "bf16" in args.precision else jnp.float32
    model = DaCLIP(clip_cfg, use_predictor=not args.uir_variant, dtype=dtype)

    # data
    from functools import partial
    from daclip_tpu.tokenizer import tokenize
    tokenizer = partial(tokenize, context_length=clip_cfg.text.context_length)
    tf_train = image_transform(clip_cfg.vision.image_size, is_train=True)
    ds_type = args.dataset_type
    if ds_type == "auto":
        ds_type = "csv" if args.train_data else "synthetic"
    if ds_type == "csv":
        ds = CsvDataset(args.train_data, tf_train, args.csv_img_key,
                        args.csv_caption_key, args.csv_separator,
                        tokenizer=tokenizer, da=args.da,
                        crop=args.crop, seed=args.seed)
    else:
        ds = SyntheticDataset(tf_train, dataset_size=args.train_num_samples,
                              tokenizer=tokenizer, da=args.da)
    banks = ds.banks()
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        num_workers=args.workers, seed=args.seed)

    # params: init, then load converted pretrained CLIP + initial_controller
    img0 = jnp.zeros((1, clip_cfg.vision.image_size, clip_cfg.vision.image_size, 3))
    txt0 = jnp.zeros((1, 2 * clip_cfg.text.context_length), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(args.seed), image=img0, text=txt0, gt_images=img0,
        deg_type=jnp.ones((1, 4)), gt_val=jnp.ones((1, 4)),
        bin_center_bank=jnp.ones((4, 7)),
        all_d_type_tokens=jnp.zeros((28, clip_cfg.text.context_length), jnp.int32))
    params = dict(variables["params"])
    if args.pretrained and os.path.exists(args.pretrained):
        from daclip_tpu.utils.torch_convert import (convert_clip, convert_daclip,
                                                    initial_controller,
                                                    load_torch_state_dict)
        sd = load_torch_state_dict(args.pretrained)
        if any(k.startswith("clip.") for k in sd):
            loaded = convert_daclip(sd)          # full DaCLIP checkpoint
            params.update(loaded)
        else:                                     # plain CLIP → controller init
            params["clip"] = convert_clip(sd)
            params = initial_controller(params)   # factory.py:236-239 parity
        log.info("loaded pretrained weights from %s", args.pretrained)

    trainable, frozen = partition_daclip_params(params)
    # device-resident frozen tree, replicated over the mesh: passed to the
    # step per call (so it is a jit ARGUMENT, not a baked constant) — as host
    # numpy it would re-upload ~600 MB of CLIP weights every single step, and
    # an uncommitted single-device tree conflicts with the mesh-sharded batch
    repl = NamedSharding(mesh, P())
    frozen = jax.device_put(jax.tree.map(jnp.asarray, frozen), repl)
    steps_per_epoch = max(len(loader), 1)
    cfg = ClipTrainConfig(
        lr=args.lr, beta1=args.beta1, beta2=args.beta2, eps=args.eps, wd=args.wd,
        warmup=args.warmup, total_steps=args.epochs * steps_per_epoch,
        lr_scheduler=args.lr_scheduler, grad_clip_norm=args.grad_clip_norm,
        accum_freq=args.accum_freq,
        variant="uir" if args.uir_variant else "fork")
    state = init_state(trainable, cfg)
    # buffer donation deadlocks XLA:CPU collectives AND hit a TPU runtime
    # InvalidArgument on the large 256² training program via axon — default off,
    # opt in with DACLIP_TPU_DONATE=1
    import os as _os
    donate = ((0,) if (_os.environ.get("DACLIP_TPU_DONATE") == "1"
                       and jax.default_backend() != "cpu") else ())
    step_fn = jax.jit(make_train_step(model.apply, frozen, cfg, banks),
                      donate_argnums=donate)

    name = args.name or f"daclip_{time.strftime('%Y%m%d_%H%M%S')}"
    ckpt_dir = os.path.join(args.logs, name, "checkpoints")

    # --resume latest (training/main.py:131-163 parity, local checkpoints)
    start_epoch = 0
    if args.resume:
        from daclip_tpu.utils.checkpoint import latest_step, restore_checkpoint
        rdir = ckpt_dir if args.resume == "latest" else args.resume
        step = latest_step(rdir)
        if step is not None:
            # optimizer moments + step counter resume too (main.py:426-459
            # parity — without these, Adam statistics reset and the warmup
            # replays from step 0 after every resume).  Structured restore
            # (target=) rebuilds the optax state pytree; fall back to a
            # params-only restore for old-format checkpoints.
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
            # restored arrays come back committed to one device; replicate
            # over the mesh so they don't conflict with the sharded batch
            state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
            start_epoch = int(restored.get("epoch", step))
            log.info("resumed from %s epoch %d", rdir, start_epoch)
        elif args.resume != "latest":
            raise FileNotFoundError(args.resume)

    val_ds = None
    if args.val_data:
        from daclip_tpu.transforms import image_transform as _it
        val_ds = CsvDataset(args.val_data, _it(clip_cfg.vision.image_size),
                            args.csv_img_key, args.csv_caption_key,
                            args.csv_separator, tokenizer=tokenizer, da=args.da)

    def run_val(state):
        """val losses + retrieval recall (training/train.py:248-381)."""
        from daclip_tpu.eval.retrieval import evaluate as eval_retrieval
        from daclip_tpu.train.clip_train import merge_params
        params = {"params": merge_params(state.params, frozen)}
        metrics = eval_retrieval(model.apply, params, val_ds,
                                 batch_size=args.batch_size, banks=banks,
                                 variant=cfg.variant)
        log.info("val: %s", {k: round(v, 4) for k, v in metrics.items()})
        return metrics

    best_loss = float("inf")
    for epoch in range(start_epoch, args.epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for i, batch in enumerate(loader):
            dev = {k: jax.device_put(np.asarray(v), shard)
                   for k, v in batch.items() if isinstance(v, np.ndarray)}
            state, m = step_fn(state, dev, frozen)
            losses.append(float(m["total_loss"]))
            if (i + 1) % 10 == 0:
                sps = (i + 1) * args.batch_size / (time.time() - t0)
                log.info("epoch %d step %d loss %.4f (%.1f samples/s)",
                         epoch, i + 1, losses[-1], sps)
        epoch_loss = float(np.mean(losses)) if losses else float("nan")
        log.info("epoch %d done: mean loss %.4f", epoch, epoch_loss)
        if val_ds is not None:
            run_val(state)
        ckpt_tree = {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step, "frozen": frozen, "epoch": epoch + 1}
        if (epoch + 1) % args.save_frequency == 0:
            save_checkpoint(ckpt_dir, epoch + 1, ckpt_tree, max_to_keep=3)
        if epoch_loss < best_loss:   # best-by-train-loss (main.py:443-448)
            best_loss = epoch_loss
            save_checkpoint(os.path.join(ckpt_dir, "best"), epoch + 1,
                            ckpt_tree, max_to_keep=1)
    log.info("training complete; best epoch loss %.4f", best_loss)


if __name__ == "__main__":
    main()
