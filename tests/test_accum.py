"""Reference-semantic gradient accumulation (training/train.py:124-162).

Core claim (VERDICT r2 #2): at accum_freq=A, the cached-feature two-pass must
produce the loss AND gradients of the full A·B-batch contrastive computation —
each micro-batch sees the other A-1 micro-batches' features as negatives.
optax.MultiSteps (per-micro-batch negatives) is NOT that; asserted below.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.factory import create_model
from daclip_tpu.losses import clip_loss
from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                         make_accum_train_step,
                                         make_train_step)

A, B, RES, CTX = 4, 2, 32, 16


@pytest.fixture(scope="module")
def tiny_clip():
    model, params = create_model("test-tiny", seed=0)
    return model, params


def _batches(seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(A, B, RES, RES, 3).astype(np.float32)
    texts = rng.randint(1, 1000, size=(A, B, CTX)).astype(np.int32)
    return {"images": jnp.asarray(images), "texts": jnp.asarray(texts)}


def test_accum_loss_and_grads_match_full_batch(tiny_clip):
    model, params = tiny_clip
    cfg = ClipTrainConfig(variant="clip", accum_freq=A, wd=0.0,
                          skip_scheduler=True, lr=1e-3)
    step = make_accum_train_step(model.apply, {}, cfg)
    total, losses, grads = jax.jit(step.loss_and_grads)(
        params, _batches(), {}, jnp.int32(0))

    # full-batch reference: ONE forward over all A·B samples
    flat = {k: v.reshape((A * B,) + v.shape[2:]) for k, v in _batches().items()}

    def full_loss(p):
        out = model.apply({"params": p}, image=flat["images"],
                          text=flat["texts"])
        return clip_loss(out["image_features"], out["text_features"],
                         out["logit_scale"])

    full, full_grads = jax.value_and_grad(full_loss)(params)

    # each of the A identical per-j losses equals the full-batch loss
    np.testing.assert_allclose(float(total) / A, float(full), rtol=1e-5)

    # grads: every leaf except logit_scale matches the full-batch gradient;
    # logit_scale (live in each of the A passes) gets A× it — the reference's
    # own quirk (train.py:148-162 backwards total_loss per j)
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        fg = full_grads
        for k in path:
            fg = fg[k.key]
        name = "/".join(str(k.key) for k in path)
        scale = A if name == "logit_scale" else 1.0
        np.testing.assert_allclose(np.asarray(g), scale * np.asarray(fg),
                                   rtol=2e-4, atol=2e-6, err_msg=name)


def test_multisteps_is_not_reference_accum(tiny_clip):
    """The MultiSteps path averages per-micro-batch losses with only B
    negatives each — documentedly different from the full-batch loss."""
    model, params = tiny_clip
    batches = _batches()

    def micro_mean_loss(p):
        vals = []
        for j in range(A):
            out = model.apply({"params": p}, image=batches["images"][j],
                              text=batches["texts"][j])
            vals.append(clip_loss(out["image_features"], out["text_features"],
                                  out["logit_scale"]))
        return jnp.mean(jnp.stack(vals))

    flat = {k: v.reshape((A * B,) + v.shape[2:]) for k, v in batches.items()}

    def full_loss(p):
        out = model.apply({"params": p}, image=flat["images"],
                          text=flat["texts"])
        return clip_loss(out["image_features"], out["text_features"],
                         out["logit_scale"])

    assert abs(float(micro_mean_loss(params)) - float(full_loss(params))) > 1e-3


def test_accum_step_trains(tiny_clip):
    """End-to-end: the accum step descends and clamps logit_scale."""
    model, params = tiny_clip
    cfg = ClipTrainConfig(variant="clip", accum_freq=A, wd=0.0,
                          skip_scheduler=True, lr=1e-3)
    state = init_state(params, dataclasses.replace(cfg, accum_freq=1))
    step = jax.jit(make_accum_train_step(model.apply, {}, cfg))
    batches = _batches()
    losses = []
    for _ in range(3):
        state, m = step(state, batches, {})
        losses.append(float(m["total_loss"]))
    assert losses[-1] < losses[0]
    assert float(m["logit_scale"]) <= 100.0 + 1e-3
    assert int(state.step) == 3


def test_accum_fork_variant_runs():
    """Fork (--da) variant through the accum step: FCRC + regression losses
    computed over the spliced A·B batch; finite loss, nonzero grads."""
    from daclip_tpu.data.csv_dataset import build_banks
    from daclip_tpu.tokenizer import tokenize
    from functools import partial

    model, params = create_model("daclip_test-tiny", seed=0,
                                 use_predictor=True)
    banks = build_banks(partial(tokenize, context_length=CTX))
    cfg = ClipTrainConfig(variant="fork", accum_freq=2, wd=0.0,
                          skip_scheduler=True, lr=1e-3)
    from daclip_tpu.train.clip_train import partition_daclip_params
    trainable, frozen = partition_daclip_params(params)
    step = make_accum_train_step(model.apply, frozen, cfg, banks=banks)
    rng = np.random.RandomState(0)
    batches = {
        "images": jnp.asarray(rng.rand(2, B, RES, RES, 3), jnp.float32),
        "texts": jnp.asarray(rng.randint(1, 1000, (2, B, 2 * CTX)), jnp.int32),
        "gt_images": jnp.asarray(rng.rand(2, B, RES, RES, 3), jnp.float32),
        "deg_type": jnp.asarray(rng.randint(0, 2, (2, B, 4)), jnp.float32),
        "gt_val": jnp.asarray(rng.rand(2, B, 4), jnp.float32),
    }
    total, losses, grads = jax.jit(step.loss_and_grads)(
        trainable, batches, frozen, jnp.int32(0))
    assert np.isfinite(float(total))
    assert set(losses) == {"contrastive_loss", "gt_l1_loss", "reg_ls_loss",
                           "fcrc_loss"}
    gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                            for g in jax.tree.leaves(grads))))
    assert gn > 0


def test_cli_accum_smoke(tmp_path):
    """The real harness wires make_accum_train_step for --accum-freq > 1."""
    from daclip_tpu.cli.train_daclip import main
    main(["--dataset-type", "synthetic", "--train-num-samples", "8",
          "--batch-size", "2", "--accum-freq", "2", "--epochs", "1",
          "--warmup", "1", "--model", "daclip_test-tiny",
          "--logs", str(tmp_path), "--name", "accum", "--precision", "fp32"])
    assert (tmp_path / "accum" / "checkpoints").exists()
