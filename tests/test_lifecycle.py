"""Train → save → eval/serve lifecycle, torch-free on the serving side.

The reference's own lifecycle is train → save → test.py loads what it trained
(config/daclip-sde/test.py:24-82, models/base_model.py:80-105).  These tests
train tiny models with the REAL CLIs, then run every inference-side entry
point (test_restoration, predict, factory, evaluate_daclip, evaluate_numclip,
pipeline) on the saved orbax dirs with `import torch` FORBIDDEN — proving a
torch-free TPU host can serve what this framework trains.
"""
import os
import textwrap

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def forbid_torch(monkeypatch):
    """Any `import torch` below this point fails the test."""
    import builtins

    real_import = builtins.__import__

    def guard(name, globals=None, locals=None, fromlist=(), level=0):
        if name == "torch" or name.startswith("torch."):
            raise AssertionError(
                f"torch imported on the native serving path: {name}")
        return real_import(name, globals, locals, fromlist, level)

    monkeypatch.setattr(builtins, "__import__", guard)


@pytest.fixture(scope="module")
def md_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("md")
    rng = np.random.RandomState(0)
    for sub in ["GT", "LQ"]:
        d = root / "noisy" / sub
        d.mkdir(parents=True)
        for i in range(4):
            cv2.imwrite(str(d / f"{i}.png"),
                        (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    return root


@pytest.fixture(scope="module")
def restoration_run(md_root, tmp_path_factory):
    """Train the tiny UNet for 4 steps with the real CLI; return (ckpt_dir, yml
    dir).  Module-scoped: several lifecycle tests serve the same run."""
    tmp = tmp_path_factory.mktemp("resto_run")
    yml = tmp / "train.yml"
    yml.write_text(textwrap.dedent(f"""
        name: lifecycle
        model: denoising
        distortion: [noisy]
        gpu_ids: [0]
        sde: {{max_sigma: 50, T: 10, schedule: cosine, eps: 0.005}}
        degradation: {{}}
        datasets:
          train:
            name: T
            mode: MD
            dataroot: {md_root}
            batch_size: 2
            patch_size: 16
            use_shuffle: true
            n_workers: 0
            use_flip: true
            use_rot: true
          val:
            name: V
            mode: MD
            dataroot: {md_root}
        network_G:
          which_model_G: ConditionalUNet
          setting:
            in_nc: 3
            out_nc: 3
            nf: 16
            ch_mult: [1, 2]
            context_dim: ~
            use_degra_context: false
            use_image_context: false
        path: {{pretrain_model_G: ~, root: {tmp}}}
        train:
          optimizer: AdamW
          lr_G: !!float 1e-4
          lr_scheme: TrueCosineAnnealingLR
          beta1: 0.9
          beta2: 0.99
          niter: 4
          warmup_iter: -1
          eta_min: !!float 1e-6
          loss_type: l1
          weight: 1.0
          manual_seed: 0
          val_freq: 1000
        logger: {{print_freq: 10, save_checkpoint_freq: 4}}
    """))
    from daclip_tpu.cli.train_restoration import main
    main(["-opt", str(yml), "--max-steps", "4", "--val-sample-T", "2"])
    ckpt_dir = tmp / "experiments" / "lifecycle" / "training_state"
    assert ckpt_dir.is_dir()
    return str(ckpt_dir), tmp


@pytest.fixture(scope="module")
def daclip_run(tmp_path_factory):
    """Train tiny DA-CLIP (predictor head included) for 1 epoch with the real
    CLI; return the orbax checkpoints dir."""
    tmp = tmp_path_factory.mktemp("daclip_run")
    from daclip_tpu.cli.train_daclip import main
    main(["--dataset-type", "synthetic", "--train-num-samples", "8",
          "--batch-size", "4", "--epochs", "1", "--warmup", "1",
          "--model", "daclip_test-tiny", "--logs", str(tmp),
          "--name", "lifecycle", "--precision", "fp32"])
    ckpts = tmp / "lifecycle" / "checkpoints"
    assert ckpts.is_dir()
    return str(ckpts)


# ---------------------------------------------------------------------------
# restoration side


def test_restorer_from_train_dir_torchfree(restoration_run, forbid_torch):
    from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig
    from daclip_tpu.utils.native_checkpoint import (
        infer_unet_arch_from_params, load_restoration_params)

    ckpt_dir, _ = restoration_run
    params, step = load_restoration_params(ckpt_dir, use_ema=True)
    assert step == 4
    arch = infer_unet_arch_from_params(params)
    assert arch["nf"] == 16 and arch["ch_mult"] == (1, 2)
    assert not arch["use_degra_context"] and not arch["use_image_context"]
    assert arch["scale"] == 1.0 and arch["in_nc"] == 3 and arch["out_nc"] == 3

    r = DACLIPRestorer.from_train_dir(
        ckpt_dir, cfg=RestorerConfig(T=10, sample_T=2))
    img = np.random.RandomState(1).rand(24, 24, 3).astype(np.float32)
    out = r.restore(img, seed=0)
    assert out.shape == (24, 24, 3) and out.dtype == np.uint8


def test_ema_vs_raw_params_differ_or_equal(restoration_run):
    # at 4 steps EMA has not activated (ema_pytorch update_after_step=100):
    # EMA params must equal the INITIAL params, raw params must differ
    from daclip_tpu.utils.native_checkpoint import load_restoration_params
    ckpt_dir, _ = restoration_run
    ema, _ = load_restoration_params(ckpt_dir, use_ema=True)
    raw, _ = load_restoration_params(ckpt_dir, use_ema=False)
    diffs = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(
                 [v for v in _leaves(ema)], [v for v in _leaves(raw)])]
    assert max(diffs) > 0  # training moved the raw params off the EMA shadow


def _leaves(tree):
    import jax
    return jax.tree.leaves(tree)


def test_cli_test_restoration_on_native_checkpoint(restoration_run, md_root,
                                                   tmp_path, forbid_torch,
                                                   capsys):
    ckpt_dir, run_tmp = restoration_run
    yml = tmp_path / "test.yml"
    yml.write_text(textwrap.dedent(f"""
        name: lifecycle-test
        model: denoising
        distortion: [noisy]
        gpu_ids: [0]
        sde: {{max_sigma: 50, T: 10, schedule: cosine, eps: 0.005}}
        datasets:
          test1: {{name: V, mode: MD, dataroot: {md_root}}}
        network_G:
          which_model_G: ConditionalUNet
          setting: {{nf: 16, ch_mult: [1, 2], context_dim: ~,
                     use_degra_context: false, use_image_context: false}}
        path: {{root: {tmp_path}, results_root: {tmp_path / 'results'},
                pretrain_model_G: ~, daclip: ~}}
    """))
    from daclip_tpu.cli.test_restoration import main
    main(["-opt", str(yml), "--checkpoint", ckpt_dir, "--max-images", "1"])
    out = capsys.readouterr().out
    assert "PSNR" in out


def test_cli_predict_on_native_checkpoint(restoration_run, tmp_path,
                                          forbid_torch):
    ckpt_dir, _ = restoration_run
    img_path = tmp_path / "in.png"
    cv2.imwrite(str(img_path),
                (np.random.RandomState(2).rand(24, 24, 3) * 255).astype(np.uint8))
    from daclip_tpu.cli.predict import main
    main(["-i", str(img_path), "-o", str(tmp_path / "out"),
          "--checkpoint", ckpt_dir, "--T", "10", "--sample-T", "2"])
    assert (tmp_path / "out" / "in.png").exists()


def test_npz_export_roundtrip_serves(restoration_run, tmp_path, forbid_torch):
    from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig
    from daclip_tpu.utils.native_checkpoint import (load_restoration_params,
                                                    save_params_npz)
    ckpt_dir, _ = restoration_run
    params, _ = load_restoration_params(ckpt_dir)
    npz = str(tmp_path / "unet.npz")
    save_params_npz(npz, params)
    r = DACLIPRestorer.load(npz, cfg=RestorerConfig(T=10, sample_T=2))
    out = r.restore(np.random.RandomState(3).rand(16, 16, 3).astype(np.float32))
    assert out.shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# DA-CLIP side


def test_factory_loads_native_daclip(daclip_run, forbid_torch):
    import jax.numpy as jnp

    from daclip_tpu.factory import create_model_from_pretrained

    model, params, pp = create_model_from_pretrained(
        "daclip_test-tiny", pretrained=daclip_run)
    assert "clip" in params and "visual_control" in params
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    img_f, degra_f = model.apply({"params": params}, img, control=True,
                                 normalize=True, method=model.encode_image)
    assert img_f.shape == (1, 32) and degra_f.shape == (1, 32)


@pytest.fixture(scope="module")
def class_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("classes")
    rng = np.random.RandomState(0)
    for cname in ["blur05", "noisy25"]:
        d = root / cname / "LQ"
        d.mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(d / f"{i}.png"),
                        (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    return str(root)


def test_evaluate_daclip_on_native_checkpoint(daclip_run, class_dataset,
                                              tmp_path, forbid_torch):
    from daclip_tpu.eval.evaluate_daclip import evaluate_checkpoint
    res = evaluate_checkpoint(daclip_run, class_dataset,
                              model_name="daclip_test-tiny", batch_size=2,
                              out_dir=str(tmp_path), display_name="native")
    assert 0.0 <= res["accuracy"] <= 1.0
    assert (tmp_path / "per_class_accuracy_native.csv").exists()
    assert (tmp_path / "confusion_matrix_native.csv").exists()


def test_evaluate_numclip_on_native_checkpoint(daclip_run, class_dataset,
                                               tmp_path, forbid_torch):
    from daclip_tpu.eval.evaluate_numclip import evaluate_checkpoint
    res = evaluate_checkpoint(daclip_run, class_dataset,
                              model_name="daclip_test-tiny", batch_size=2,
                              out_dir=str(tmp_path), display_name="native")
    assert 0.0 <= res["accuracy"] <= 1.0
    # the trained checkpoint includes the fork's predictor head → regression ran
    assert (tmp_path / "regression_values_native.csv").exists()
    assert res["regression_mae"], "predictor head missing from native checkpoint"


def test_display_name_disambiguates_csvs(daclip_run, class_dataset, tmp_path):
    # ADVICE r2: identical basenames in different dirs must not collide
    from daclip_tpu.eval.evaluate_daclip import evaluate_checkpoint
    evaluate_checkpoint(daclip_run, class_dataset,
                        model_name="daclip_test-tiny", batch_size=2,
                        out_dir=str(tmp_path), display_name="runA",
                        max_per_class=1)
    evaluate_checkpoint(daclip_run, class_dataset,
                        model_name="daclip_test-tiny", batch_size=2,
                        out_dir=str(tmp_path), display_name="runB",
                        max_per_class=1)
    assert (tmp_path / "per_class_accuracy_runA.csv").exists()
    assert (tmp_path / "per_class_accuracy_runB.csv").exists()
