"""CLIP-harness integration tests on the 8-device CPU mesh: full flag surface
(cli/params.py), LiT locking, distillation, webdataset training, --mesh
sharding, remote sync — the paths wired by cli/train_daclip.py (reference
training/main.py:71-498)."""
import json
import os
import tarfile

import numpy as np
import pytest


def test_params_reference_surface():
    """Reference launch lines parse unchanged (params.py:26-459 names)."""
    from daclip_tpu.cli.params import parse_args
    args = parse_args([
        "--train-data", "a.csv::b.csv",
        "--train-data-upsampling-factors", "1::2",
        "--dataset-type", "webdataset", "--dataset-resampled",
        "--batch-size", "32", "--epochs", "10", "--workers", "2",
        "--model", "ViT-B-32", "--pretrained", "laion2b_s34b_b79k",
        "--precision", "amp", "--lock-image",
        "--lock-image-unlocked-groups", "2", "--lock-text",
        "--grad-checkpointing", "--local-loss", "--gather-with-grad",
        "--force-quick-gelu", "--force-patch-dropout", "0.5",
        "--accum-freq", "2", "--grad-clip-norm", "1.0",
        "--report-to", "wandb,tensorboard", "--wandb-project-name", "x",
        "--zeroshot-frequency", "4", "--val-frequency", "2",
        "--resume", "latest", "--save-most-recent",
        "--delete-previous-checkpoint", "--epochs-cooldown", "2",
        "--lr-scheduler", "const-cooldown", "--lr-cooldown-end", "1e-6",
        "--remote-sync", "s3://bucket/x", "--remote-sync-frequency", "60",
        "--distill-model", "ViT-B-32", "--distill-pretrained", "openai",
        "--aug-cfg", "scale=(0.4, 1.0)", "use_timm=False",
        "--da", "--crop", "--mesh", "4,2",
    ])
    # paper defaults filled for ViT (params.py:5-11,452-457)
    assert args.lr == 5.0e-4 and args.beta2 == 0.98 and args.eps == 1.0e-6
    assert args.aug_cfg == {"scale": (0.4, 1.0), "use_timm": False}
    # RN default branch
    rn = parse_args(["--model", "RN50"])
    assert rn.beta2 == 0.999 and rn.eps == 1.0e-8
    # CUDA-only bitsandbytes flag refuses loudly
    with pytest.raises(SystemExit):
        parse_args(["--use-bnb-linear", "SwitchBackLinearGlobal"])


def test_lit_locking_masks_updates():
    """--lock-image / --lock-text freeze tower updates exactly
    (transformer.py:444-476 lock semantics via the optimizer mask)."""
    import jax
    import jax.numpy as jnp
    from daclip_tpu.factory import create_model
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_train_step)
    from daclip_tpu.train.locking import build_update_mask

    model, params = create_model("test-tiny")
    mask = build_update_mask(params, lock_image=True, lock_text=True)
    cfg = ClipTrainConfig(lr=1e-2, warmup=1, total_steps=10, variant="clip",
                          wd=0.1)
    state = init_state(params, cfg)
    step = jax.jit(make_train_step(model.apply, {}, cfg, update_mask=mask))
    batch = {"images": jnp.ones((8, 32, 32, 3)) * 0.2,
             "texts": (jnp.tile(jnp.arange(8)[:, None], (1, 16))
                       .astype(jnp.int32) % 100)}
    new_state, m = step(state, batch, {})
    assert np.isfinite(float(m["total_loss"]))
    # towers untouched (including weight decay — the mask is post-AdamW)
    for tower in ("visual", "text"):
        before = jax.tree.leaves(state.params[tower])
        after = jax.tree.leaves(new_state.params[tower])
        assert all(np.allclose(b, a) for b, a in zip(before, after)), tower
    # logit_scale still trains
    assert not np.allclose(state.params["logit_scale"],
                           new_state.params["logit_scale"])

    # partial unlock: last vision group (proj) moves, stem stays
    mask2 = build_update_mask(params, lock_image=True,
                              lock_image_unlocked_groups=1)
    step2 = jax.jit(make_train_step(model.apply, {}, cfg, update_mask=mask2))
    s2, _ = step2(state, batch, {})
    assert not np.allclose(state.params["visual"]["proj"],
                           s2.params["visual"]["proj"])
    assert np.allclose(np.asarray(state.params["visual"]["conv1"]),
                       np.asarray(s2.params["visual"]["conv1"]))


def test_lit_locking_timm_tower():
    """--lock-image on a timm-tower CLIP: the trunk freezes, the open_clip
    adapter head stays trainable (TimmModel.lock locks self.trunk only,
    timm_model.py:107-117); partial unlocking refuses like the reference
    (group_matcher needs timm-master, timm_model.py:118-125)."""
    import jax
    import jax.numpy as jnp
    from daclip_tpu.factory import create_model
    from daclip_tpu.models.clip import _MODEL_CONFIGS
    from daclip_tpu.models.convnext import VARIANTS
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_train_step)
    from daclip_tpu.train.locking import build_update_mask

    VARIANTS["convnext_locktest"] = ((2, 2), (16, 32))
    _MODEL_CONFIGS["timm-lock-test"] = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "timm_model_name": "convnext_locktest",
                       "timm_pool": "", "timm_proj": "linear",
                       "layers": 2, "width": 64},
        "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 32,
                     "heads": 2, "layers": 2},
    }
    try:
        model, params = create_model("timm-lock-test")
        mask = build_update_mask(params, lock_image=True)
        cfg = ClipTrainConfig(lr=1e-2, warmup=1, total_steps=10,
                              variant="clip", wd=0.1)
        state = init_state(params, cfg)
        step = jax.jit(make_train_step(model.apply, {}, cfg, update_mask=mask))
        batch = {"images": jnp.ones((8, 32, 32, 3)) * 0.2,
                 "texts": (jnp.tile(jnp.arange(8)[:, None], (1, 16))
                           .astype(jnp.int32) % 100)}
        new_state, m = step(state, batch, {})
        assert np.isfinite(float(m["total_loss"]))
        before = jax.tree.leaves(state.params["visual"]["trunk"])
        after = jax.tree.leaves(new_state.params["visual"]["trunk"])
        assert all(np.allclose(b, a) for b, a in zip(before, after))
        assert not np.allclose(
            np.asarray(state.params["visual"]["proj"]["kernel"]),
            np.asarray(new_state.params["visual"]["proj"]["kernel"]))
        with pytest.raises(ValueError, match="group_matcher"):
            build_update_mask(params, lock_image=True,
                              lock_image_unlocked_groups=1)
    finally:
        del VARIANTS["convnext_locktest"]
        del _MODEL_CONFIGS["timm-lock-test"]


def test_distill_training_step():
    """--distill-model teacher wiring (main.py:219-243 + DistillClipLoss)."""
    import jax
    import jax.numpy as jnp
    from daclip_tpu.factory import create_model
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_train_step)

    model, params = create_model("test-tiny")
    teacher, t_params = create_model("test-tiny", seed=7)
    cfg = ClipTrainConfig(lr=1e-3, warmup=1, total_steps=10, variant="clip",
                          distill=True)
    state = init_state(params, cfg)
    step = jax.jit(make_train_step(model.apply, {}, cfg,
                                   distill_apply=teacher.apply))
    batch = {"images": jnp.ones((8, 32, 32, 3)) * 0.2,
             "texts": (jnp.tile(jnp.arange(8)[:, None], (1, 16))
                       .astype(jnp.int32) % 100)}
    _, m = step(state, batch, {}, t_params)
    assert np.isfinite(float(m["total_loss"]))
    assert "distill_loss" in m or float(m["total_loss"]) > 0


@pytest.fixture()
def wds_shards(tmp_path):
    from PIL import Image
    for s in range(2):
        with tarfile.open(tmp_path / f"shard-{s:03d}.tar", "w") as tf:
            for i in range(8):
                key = f"{s}_{i}"
                img_path = tmp_path / f"{key}.jpg"
                Image.new("RGB", (32, 32), (s * 100, i * 30, 0)).save(img_path)
                tf.add(img_path, arcname=f"{key}.jpg")
                txt_path = tmp_path / f"{key}.txt"
                txt_path.write_text(f"a photo number {key}")
                tf.add(txt_path, arcname=f"{key}.txt")
    return str(tmp_path / "shard-{000..001}.tar")


def test_train_clip_webdataset_full_flags(wds_shards, tmp_path):
    """Plain-CLIP harness over webdataset shards with the wide-flag path:
    LiT lock, grad-checkpointing, patch dropout, fsdp mesh, tensorboard-off
    jsonl metrics, save-most-recent + fsspec remote sync."""
    from daclip_tpu.cli.train_daclip import main
    remote = tmp_path / "remote"
    main(["--train-data", wds_shards, "--dataset-type", "webdataset",
          "--train-num-samples", "16", "--batch-size", "8",
          "--epochs", "1", "--warmup", "1", "--model", "test-tiny",
          "--precision", "fp32", "--logs", str(tmp_path / "logs"),
          "--name", "wds", "--lock-image", "--grad-checkpointing",
          "--force-patch-dropout", "0.25", "--mesh", "4,2",
          "--save-frequency", "10", "--save-most-recent",
          "--log-every-n-steps", "1",
          "--remote-sync", str(remote), "--remote-sync-protocol", "fsspec",
          "--remote-sync-frequency", "3600"])
    base = tmp_path / "logs" / "wds"
    # rolling `latest` slot saved (save_frequency never hit)
    assert (base / "checkpoints" / "latest").exists()
    rows = [json.loads(l) for l in (base / "results.jsonl").open()]
    assert rows and any("train/loss" in r for r in rows)
    # initial remote sync mirrored the run dir
    assert (remote / "wds").exists()


def test_train_daclip_tp_mesh(tmp_path):
    """DA-CLIP via CLI over a 3-D data×fsdp×model mesh (--mesh 2,2,2):
    tensor-parallel tower shardings compile and execute (VERDICT #6)."""
    from daclip_tpu.cli.train_daclip import main
    main(["--dataset-type", "synthetic", "--train-num-samples", "8",
          "--batch-size", "4", "--epochs", "1", "--warmup", "1",
          "--model", "daclip_test-tiny", "--logs", str(tmp_path),
          "--name", "tp", "--precision", "fp32", "--mesh", "2,2,2"])
    assert (tmp_path / "tp" / "checkpoints").exists()


def test_remote_sync_fsspec_roundtrip(tmp_path):
    """The previously egress-untested remote-sync logic, exercised end to end
    with a local directory standing in for the bucket (the fsspec protocol
    treats local paths as a filesystem): sync up (epoch_latest excluded),
    list for --resume latest, mirror back down."""
    from daclip_tpu.utils import file_utils

    local = tmp_path / "logs" / "run" / "checkpoints"
    (local / "step_100").mkdir(parents=True)
    (local / "step_100" / "ckpt.bin").write_bytes(b"A" * 64)
    (local / "step_200").mkdir()
    (local / "step_200" / "ckpt.bin").write_bytes(b"B" * 64)
    (local / "epoch_latest.tmp").write_bytes(b"transient")
    remote = tmp_path / "bucket" / "run" / "checkpoints"

    assert file_utils.remote_sync(str(local), str(remote), "fsspec")
    # epoch_latest artifacts are excluded, checkpoint dirs mirrored
    assert (remote / "step_100" / "ckpt.bin").read_bytes() == b"A" * 64
    assert (remote / "step_200" / "ckpt.bin").read_bytes() == b"B" * 64
    assert not (remote / "epoch_latest.tmp").exists()
    # second sync skips same-size files (no error, still true)
    assert file_utils.remote_sync(str(local), str(remote), "fsspec")

    # --resume latest: list the remote, mirror it down
    names = file_utils.list_remote_dir(str(remote))
    assert "step_100" in names and "step_200" in names
    down = tmp_path / "resume"
    assert file_utils.download_remote_dir(str(remote), str(down)) is not None
    assert (down / "step_200" / "ckpt.bin").read_bytes() == b"B" * 64

    # unknown protocol is a clean failure, not an exception
    assert not file_utils.remote_sync(str(local), str(remote), "nope")
