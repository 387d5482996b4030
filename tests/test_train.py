"""Training-step tests: restoration + DA-CLIP, EMA, schedules, checkpoint
roundtrip, and the sharded multi-device path."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.models import CLIPCfg, DaCLIP, TextCfg, VisionCfg
from daclip_tpu.models.unet import ConditionalUNet
from daclip_tpu.sde import IRSDE
from daclip_tpu.train import schedules as sched
from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state as clip_init,
                                         make_train_step as make_clip_step,
                                         partition_daclip_params)
from daclip_tpu.train.restoration import (RestorationTrainConfig, init_state,
                                          make_sampler, make_train_step)
from daclip_tpu.utils import ema as ema_lib

TINY = CLIPCfg(
    embed_dim=32,
    vision=VisionCfg(image_size=32, patch_size=16, width=64, layers=2, head_width=32),
    text=TextCfg(context_length=16, vocab_size=128, width=32, heads=2, layers=2),
)


def _unet():
    return ConditionalUNet(nf=16, ch_mult=(1, 2), context_dim=32,
                           use_degra_context=True, use_image_context=True)


@pytest.fixture(scope="module")
def resto_setup():
    net = _unet()
    B, H, W = 4, 16, 16
    lq = jnp.zeros((B, H, W, 3))
    params = net.init(jax.random.PRNGKey(0), lq, lq, jnp.ones((B,)),
                      jnp.zeros((B, 32)), jnp.zeros((B, 32)))
    cfg = RestorationTrainConfig(niter=50, lr_G=1e-3, warmup_iter=5)
    sde = IRSDE(max_sigma=50, T=100)
    return net, params, cfg, sde


def test_restoration_train_step_reduces_loss(resto_setup):
    net, params, cfg, sde = resto_setup
    state = init_state(params, cfg)
    step = jax.jit(make_train_step(net.apply, sde, cfg))
    key = jax.random.PRNGKey(0)
    gt = jax.random.uniform(key, (4, 16, 16, 3))
    batch = {"LQ": gt + 0.1, "GT": gt,
             "text_context": jnp.zeros((4, 32)),
             "image_context": jnp.zeros((4, 32))}
    losses = []
    # fixed key -> deterministic (t, noise) draw, so SGD on the fixed objective
    # must reduce the loss
    for i in range(8):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert int(state.ema.step) == 8


def test_sampler_modes(resto_setup):
    net, params, cfg, sde10 = resto_setup
    sde = IRSDE(max_sigma=50, T=10)
    lq = jnp.ones((1, 16, 16, 3)) * 0.5
    for mode in ["posterior", "sde", "ode"]:
        sample = jax.jit(make_sampler(net.apply, sde, mode))
        out = sample(params, lq, jax.random.PRNGKey(0),
                     jnp.zeros((1, 32)), jnp.zeros((1, 32)))
        assert out.shape == lq.shape and bool(jnp.isfinite(out).all()), mode


def test_ema_semantics():
    p = {"w": jnp.zeros(())}
    st = ema_lib.init(p)
    # before update_after_step(100): every 10th update copies params
    for i in range(100):
        st = ema_lib.update(st, {"w": jnp.asarray(float(i + 1))},
                            update_after_step=10, update_every=10)
    # after warmup, ema lags behind latest params
    assert 0 < float(st.params["w"]) <= 100.0
    st2 = ema_lib.update(st, {"w": jnp.asarray(1000.0)}, update_every=1,
                         update_after_step=10)
    assert float(st2.params["w"]) > float(st.params["w"])


def test_cosine_annealing_matches_torch_formula():
    s = sched.cosine_annealing(1.0, 100, eta_min=0.1)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(100)) == pytest.approx(0.1)
    assert float(s(50)) == pytest.approx(0.55)


def test_multistep_restart():
    s = sched.multistep_restart(1.0, [10, 20], gamma=0.5)
    assert float(s(5)) == 1.0
    assert float(s(10)) == 0.5
    assert float(s(25)) == 0.25


def test_clip_train_step_freezes_clip_and_clamps_scale():
    model = DaCLIP(TINY, use_predictor=True)
    B = 4
    img = jnp.zeros((B, 32, 32, 3))
    txt = jnp.zeros((B, 32), jnp.int32)
    toks = jnp.ones((28, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), image=img, text=txt,
                           gt_images=img, deg_type=jnp.ones((B, 4)),
                           gt_val=jnp.ones((B, 4)),
                           bin_center_bank=jnp.ones((4, 7)),
                           all_d_type_tokens=toks)
    trainable, frozen = partition_daclip_params(variables["params"])
    assert "clip" in frozen and "visual_control" in trainable

    cfg = ClipTrainConfig(lr=1e-3, warmup=2, total_steps=10, variant="fork")
    state = clip_init(trainable, cfg)
    banks = (np.ones((4, 7), np.float32), np.ones((28, 16), np.int32))
    step = jax.jit(make_clip_step(model.apply, frozen, cfg, banks))
    key = jax.random.PRNGKey(1)
    batch = {
        "images": jax.random.uniform(key, (B, 32, 32, 3)),
        "texts": jax.random.randint(key, (B, 32), 1, 127),
        "gt_images": jax.random.uniform(key, (B, 32, 32, 3)),
        "deg_type": jnp.ones((B, 4)),
        "gt_val": jnp.ones((B, 4)) * 2.0,
    }
    s0 = state
    for _ in range(3):
        state, metrics = step(state, batch)
    for k in ["contrastive_loss", "gt_l1_loss", "reg_ls_loss", "fcrc_loss"]:
        assert np.isfinite(float(metrics[k])), k
    # logit scale clamped
    assert float(state.params["logit_scale"]) <= math.log(100.0) + 1e-6
    # controller moved, would-be-frozen clip untouched by construction
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s0.params["visual_control"],
                         state.params["visual_control"])
    assert max(jax.tree.leaves(moved)) > 0


def test_clip_train_step_fork_with_patch_dropout():
    """--force-patch-dropout must be ACTIVE in the --da fork variant too
    (reference model.train() semantics; it used to be a silent no-op)."""
    tiny = dataclasses.replace(
        TINY, vision=dataclasses.replace(TINY.vision, patch_dropout=0.5))
    model = DaCLIP(tiny, use_predictor=True)
    B = 4
    img = jnp.zeros((B, 32, 32, 3))
    txt = jnp.zeros((B, 32), jnp.int32)
    toks = jnp.ones((28, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), image=img, text=txt,
                           gt_images=img, deg_type=jnp.ones((B, 4)),
                           gt_val=jnp.ones((B, 4)),
                           bin_center_bank=jnp.ones((4, 7)),
                           all_d_type_tokens=toks)
    trainable, frozen = partition_daclip_params(variables["params"])
    cfg = ClipTrainConfig(lr=1e-3, warmup=2, total_steps=10, variant="fork",
                          patch_dropout=True)
    state = clip_init(trainable, cfg)
    banks = (np.ones((4, 7), np.float32), np.ones((28, 16), np.int32))
    step = jax.jit(make_clip_step(model.apply, frozen, cfg, banks))
    key = jax.random.PRNGKey(1)
    batch = {
        "images": jax.random.uniform(key, (B, 32, 32, 3)),
        "texts": jax.random.randint(key, (B, 32), 1, 127),
        "gt_images": jax.random.uniform(key, (B, 32, 32, 3)),
        "deg_type": jnp.ones((B, 4)),
        "gt_val": jnp.ones((B, 4)) * 2.0,
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    # dropout actually engaged: train=False forward on the same params gives
    # different features than the train-time forward used in the loss
    merged = {"params": {**state.params, **frozen}}
    f_eval = model.apply(merged, image=batch["images"], text=batch["texts"],
                         deg_type=batch["deg_type"], gt_val=batch["gt_val"],
                         bin_center_bank=jnp.ones((4, 7)),
                         all_d_type_tokens=toks)
    f_train = model.apply(merged, image=batch["images"], text=batch["texts"],
                          deg_type=batch["deg_type"], gt_val=batch["gt_val"],
                          bin_center_bank=jnp.ones((4, 7)),
                          all_d_type_tokens=toks, train=True,
                          rngs={"patch_dropout": jax.random.PRNGKey(3)})
    diff = float(jnp.abs(f_eval["image_features"]
                         - f_train["image_features"]).max())
    assert diff > 1e-6


def test_multidevice_restoration_step():
    """Full train step over the 8-device mesh with fsdp param sharding — the
    same path the driver's dryrun_multichip exercises."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_checkpoint_roundtrip(tmp_path, resto_setup):
    from daclip_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                             save_checkpoint)
    net, params, cfg, sde = resto_setup
    state = init_state(params, cfg)
    tree = {"params": state.params, "step": 7}
    save_checkpoint(str(tmp_path / "ckpt"), 7, tree)
    assert latest_step(str(tmp_path / "ckpt")) == 7
    restored = restore_checkpoint(str(tmp_path / "ckpt"))
    got = jax.tree.leaves(restored["params"])
    want = jax.tree.leaves(state.params)
    assert all(np.allclose(a, b) for a, b in zip(got, want))


def test_multistep_restart_under_jit():
    """Regression: restart lookup must be jnp-indexed (a numpy array indexed
    with a traced step raises TracerArrayConversionError)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.train.schedules import multistep_restart

    sched = multistep_restart(2e-4, milestones=[10, 20], gamma=0.5,
                              restarts=[15], restart_weights=[0.7])
    f = jax.jit(sched)
    np.testing.assert_allclose(float(f(jnp.asarray(0))), 2e-4)
    np.testing.assert_allclose(float(f(jnp.asarray(12))), 1e-4)   # 1 milestone
    np.testing.assert_allclose(float(f(jnp.asarray(16))), 2e-4 * 0.7)  # restart
    np.testing.assert_allclose(float(f(jnp.asarray(25))),
                               2e-4 * 0.7 * 0.5)  # milestone 20 after restart


def test_clip_train_state_checkpoint_roundtrip(tmp_path):
    """Optimizer moments + step survive save/restore (resume parity,
    training/main.py:426-459)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.train.clip_train import ClipTrainConfig, init_state
    from daclip_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    params = {"w": jnp.ones((4, 4)), "logit_scale": jnp.asarray(2.0)}
    cfg = ClipTrainConfig(lr=1e-3, total_steps=100)
    state = init_state(params, cfg)
    # perturb so the roundtrip is non-trivial
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step, "epoch": 3}
    save_checkpoint(str(tmp_path / "ck"), 3, tree)
    restored = restore_checkpoint(
        str(tmp_path / "ck"), 3,
        target={"params": state.params, "opt_state": state.opt_state,
                "step": state.step, "epoch": 0})
    assert int(restored["step"]) == 7
    assert int(restored["epoch"]) == 3
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                        restored["opt_state"], state.opt_state)


def test_sharded_checkpoint_resume_different_mesh(tmp_path):
    """fsdp-sharded orbax save on an 8-device (data4×fsdp2) mesh restores onto
    a 4-device (data2×fsdp2) mesh and continues the EXACT optimization
    trajectory — elastic resume: mesh shape is placement, not state."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from daclip_tpu.parallel import fsdp_param_shardings, make_mesh
    from daclip_tpu.utils.checkpoint import (restore_checkpoint,
                                             save_checkpoint)

    net = _unet()
    B, H, W = 8, 16, 16
    lq0 = jnp.zeros((B, H, W, 3))
    params = net.init(jax.random.PRNGKey(0), lq0, lq0, jnp.ones((B,)),
                      jnp.zeros((B, 32)), jnp.zeros((B, 32)))
    cfg = RestorationTrainConfig(niter=20, lr_G=1e-3)
    sde = IRSDE(max_sigma=50, T=100)
    train_step = make_train_step(net.apply, sde, cfg)

    key = jax.random.PRNGKey(5)
    gt = np.asarray(jax.random.uniform(key, (B, H, W, 3)))
    host_batch = {"LQ": gt + 0.1, "GT": gt,
                  "text_context": np.zeros((B, 32), np.float32),
                  "image_context": np.zeros((B, 32), np.float32)}

    def place(state, mesh):
        repl = NamedSharding(mesh, P())
        psh = fsdp_param_shardings(state.params, mesh, min_size=1024)
        return state._replace(
            params=jax.tree.map(jax.device_put, state.params, psh),
            ema=jax.device_put(state.ema, repl),
            opt_state=jax.device_put(state.opt_state, repl),
            step=jax.device_put(state.step, repl))

    def run(mesh, state, steps, start):
        batch_sh = NamedSharding(mesh, P("data"))
        losses = []
        with mesh:
            batch = {k: jax.device_put(jnp.asarray(v), batch_sh)
                     for k, v in host_batch.items()}
            stepf = jax.jit(train_step)
            for i in range(start, start + steps):
                state, m = stepf(state, batch, jax.random.fold_in(key, i))
                losses.append(float(m["loss"]))
        return state, losses

    mesh8 = make_mesh(data=4, fsdp=2, devices=jax.devices()[:8])
    state = place(init_state(params, cfg), mesh8)
    state, _ = run(mesh8, state, 3, 0)
    save_checkpoint(str(tmp_path / "ck"), 3, state)
    _, ref_losses = run(mesh8, state, 3, 3)  # uninterrupted continuation

    mesh4 = make_mesh(data=2, fsdp=2, devices=jax.devices()[:4])
    target = place(init_state(params, cfg), mesh4)
    restored = restore_checkpoint(str(tmp_path / "ck"), target=target)
    _, got_losses = run(mesh4, restored, 3, 3)

    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-5)
