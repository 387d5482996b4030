"""CLI smoke tests: restoration training end-to-end on tiny synthetic data, and
DA-CLIP training on the synthetic dataset."""
import os
import textwrap

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_md_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("md")
    rng = np.random.RandomState(0)
    for t in ["noisy"]:
        for sub in ["GT", "LQ"]:
            d = root / t / sub
            d.mkdir(parents=True)
            for i in range(4):
                cv2.imwrite(str(d / f"{i}.png"),
                            (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    return root


def test_train_restoration_cli_smoke(tiny_md_root, tmp_path, monkeypatch):
    yml = tmp_path / "train.yml"
    yml.write_text(textwrap.dedent(f"""
        name: smoke-test
        model: denoising
        distortion: [noisy]
        gpu_ids: [0]
        sde:
          max_sigma: 50
          T: 100
          schedule: cosine
          eps: 0.005
        datasets:
          train:
            name: T
            mode: MD
            dataroot: {tiny_md_root}
            batch_size: 2
            patch_size: 16
            use_shuffle: true
            n_workers: 0
            use_flip: true
            use_rot: true
          val:
            name: V
            mode: MD
            dataroot: {tiny_md_root}
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
        path:
          pretrain_model_G: ~
          root: {tmp_path}
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
          val_freq: 4
        logger:
          print_freq: 2
          save_checkpoint_freq: 4
    """))
    from daclip_tpu.cli.train_restoration import main
    main(["-opt", str(yml), "--max-steps", "4", "--val-sample-T", "4"])
    # checkpoints landed
    state_dir = tmp_path / "experiments" / "smoke-test" / "training_state"
    assert state_dir.exists() and any(state_dir.iterdir())
    # --mesh data,fsdp: resumes the saved state, places it over a 2×4 mesh
    # (ZeRO path, parallel/mesh.py:fsdp_param_shardings) and re-validates
    main(["-opt", str(yml), "--max-steps", "4", "--val-sample-T", "4",
          "--mesh", "2,4"])


def test_train_daclip_cli_smoke(tmp_path):
    from daclip_tpu.cli.train_daclip import main
    main(["--dataset-type", "synthetic", "--train-num-samples", "8",
          "--batch-size", "4", "--epochs", "1", "--warmup", "1",
          "--model", "daclip_test-tiny", "--logs", str(tmp_path),
          "--name", "smoke", "--precision", "fp32"])
    ckpts = tmp_path / "smoke" / "checkpoints"
    assert ckpts.exists()
    # resume latest continues from epoch 1 -> runs one more epoch
    main(["--dataset-type", "synthetic", "--train-num-samples", "8",
          "--batch-size", "4", "--epochs", "2", "--warmup", "1",
          "--model", "daclip_test-tiny", "--logs", str(tmp_path),
          "--name", "smoke", "--precision", "fp32", "--resume", "latest"])
