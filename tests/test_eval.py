"""Eval module tests: retrieval metrics, zero-shot classifier, and an end-to-end
evaluate_daclip/numclip run on a tiny torch-built checkpoint (reference-only)."""
import os

import numpy as np
import pytest

from daclip_tpu.eval.retrieval import get_clip_metrics
from daclip_tpu.eval.zero_shot import (accuracy, build_zero_shot_classifier,
                                       load_imagenet_metadata)
from tests.conftest import requires_reference

cv2 = pytest.importorskip("cv2")


def test_retrieval_metrics_perfect():
    f = np.eye(8, 16, dtype=np.float32)
    m = get_clip_metrics(f, f, 100.0)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_mean_rank"] == 1.0
    shuffled = np.roll(f, 1, axis=0)
    m2 = get_clip_metrics(f, shuffled, 100.0)
    assert m2["image_to_text_R@1"] == 0.0


def test_zero_shot_metadata_and_classifier():
    names, templates = load_imagenet_metadata()
    assert len(names) == 1000 and len(templates) == 80
    assert any("photo" in t for t in templates)

    import jax.numpy as jnp

    def fake_encode(toks):  # deterministic fake text encoder
        s = jnp.sum(toks, axis=-1, keepdims=True).astype(jnp.float32)
        out = jnp.concatenate([jnp.cos(s * 0.01), jnp.sin(s * 0.01)], axis=-1)
        return out / jnp.linalg.norm(out, axis=-1, keepdims=True)

    from daclip_tpu.tokenizer import tokenize
    w = build_zero_shot_classifier(fake_encode, tokenize, ["cat", "dog", "fish"],
                                   ["a photo of a {}", "an image of a {}"],
                                   num_classes_per_batch=2)
    assert w.shape == (2, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(w), axis=0), 1.0,
                               rtol=1e-5)


def test_accuracy_topk():
    logits = np.asarray([[0.9, 0.05, 0.05], [0.1, 0.2, 0.7], [0.4, 0.5, 0.1]])
    target = np.asarray([0, 2, 0])
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    assert top1 == pytest.approx(2 / 3)
    assert top2 == pytest.approx(1.0)


@requires_reference
def test_evaluate_daclip_end_to_end(tmp_path):
    """Build a tiny torch DaCLIP, save a checkpoint, run our eval CLI over a tiny
    degradation-class dataset tree — exercises checkpoint conversion + the full
    classification flow."""
    import torch
    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import load_ref_openclip_pkg
    pkg = load_ref_openclip_pkg("uir")
    tclip = pkg.model.CLIP(
        embed_dim=32,
        vision_cfg=dict(image_size=32, patch_size=16, width=64, layers=2,
                        head_width=32),
        text_cfg=dict(context_length=16, vocab_size=49408, width=32, heads=2,
                      layers=2))
    tda = pkg.daclip_model.DaCLIP(tclip)
    tda.initial_controller()
    ckpt = tmp_path / "tiny_daclip.pt"
    torch.save({"state_dict": tda.state_dict()}, str(ckpt))

    rng = np.random.RandomState(0)
    root = tmp_path / "ds"
    for cname in ["noisy25", "blur10"]:
        d = root / cname / "LQ"
        d.mkdir(parents=True)
        for i in range(3):
            cv2.imwrite(str(d / f"{i}.png"),
                        (rng.rand(40, 40, 3) * 255).astype(np.uint8))

    from daclip_tpu.eval.evaluate_daclip import evaluate_checkpoint
    res = evaluate_checkpoint(str(ckpt), str(root), model_name="daclip_test-tiny",
                              batch_size=2, out_dir=str(tmp_path / "out"))
    assert 0.0 <= res["accuracy"] <= 1.0
    assert (tmp_path / "out" / "per_class_accuracy_tiny_daclip.csv").exists()
    assert (tmp_path / "out" / "confusion_matrix_tiny_daclip.csv").exists()
    # plot artifacts (evaluate_daclip.py:150-218 parity)
    assert (tmp_path / "out" / "confusion_matrix_tiny_daclip.png").exists()
    assert len(res["full_class_acc"]) == len(res["classes"]) == 2
    # cross-checkpoint comparison artifacts from two (identical) runs
    from daclip_tpu.eval.evaluate_daclip import compare_checkpoints
    compare_checkpoints({"a": res, "b": res}, str(tmp_path / "out"))
    for png in ["base_class_accuracy_table.png",
                "compare_base_class_accuracy.png",
                "compare_full_class_accuracy.png"]:
        assert (tmp_path / "out" / png).exists()


@requires_reference
def test_evaluate_numclip_end_to_end(tmp_path):
    import torch
    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import load_ref_openclip_pkg
    pkg = load_ref_openclip_pkg("daclip")   # fork copy: has predictor
    tclip = pkg.model.CLIP(
        embed_dim=32,
        vision_cfg=dict(image_size=32, patch_size=16, width=64, layers=2,
                        head_width=32),
        text_cfg=dict(context_length=16, vocab_size=49408, width=32, heads=2,
                      layers=2))
    tda = pkg.daclip_model.DaCLIP(tclip)
    tda.initial_controller()
    ckpt = tmp_path / "tiny_numclip.pt"
    torch.save({"state_dict": tda.state_dict()}, str(ckpt))

    rng = np.random.RandomState(0)
    root = tmp_path / "ds"
    for cname in ["noisy25", "jpeg30"]:
        d = root / cname / "LQ"
        d.mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(d / f"{i}.png"),
                        (rng.rand(40, 40, 3) * 255).astype(np.uint8))

    from daclip_tpu.eval.evaluate_numclip import evaluate_checkpoint
    res = evaluate_checkpoint(str(ckpt), str(root), model_name="daclip_test-tiny",
                              batch_size=2, out_dir=str(tmp_path / "out"))
    assert "regression_mae" in res
    emb = tmp_path / "out" / "embeddings" / "all_embeddings.npy"
    assert emb.exists()
    feats = np.load(emb)
    assert feats.shape == (4, 32)
    assert (tmp_path / "out" / "confusion_matrix_tiny_numclip.png").exists()
    assert len(res["base_class_acc"]) == len(res["base_classes"]) == 2


def test_visualize_tool(tmp_path):
    """tools/visualize: embedding projection + heatmap + monotonicity JSON, and
    the model-free residual grid (visualize_img_residual.py behaviour)."""
    pytest.importorskip("matplotlib")
    from daclip_tpu.tools import visualize as viz

    # --- embedding dumps: 3 levels x 2 types, 4 samples each ---
    rng = np.random.default_rng(0)
    feats, labels = [], []
    for b, base in enumerate(("blur", "noisy")):
        for lv in (1.0, 2.0, 3.0):
            # rotate with level so cosine distance from level 1 is monotone
            th = 0.3 * lv
            centre = np.zeros(8)
            centre[2 * b] = np.cos(th)
            centre[2 * b + 1] = np.sin(th)
            feats.append(centre + 0.001 * rng.normal(size=(4, 8)))
            labels += [f"{base}{lv}"] * 4
    emb = tmp_path / "emb"
    emb.mkdir()
    np.save(emb / "all_embeddings.npy", np.concatenate(feats))
    np.save(emb / "labels.npy", np.asarray(labels))
    out = tmp_path / "viz"

    # --- filenames + degraded_prompts.json for the param-colored projection
    # (visualize_diff_param.py behaviour; keys use the generators' ./ prefix)
    fnames = [f"im{i:02d}.png" for i in range(len(labels))]
    np.save(emb / "filenames.npy", np.asarray(fnames))
    prompts = {f"./{f}": f"blur with parameter {1.0 + (i % 3)}"
               for i, f in enumerate(fnames)}
    prompts[f"./{fnames[0]}"] += "."  # sentence-final period must still parse
    import json
    pjson = tmp_path / "degraded_prompts.json"
    pjson.write_text(json.dumps(prompts))

    # --- residual tree: <root>/<prefix><level>/{GT,LQ}/img.png ---
    root = tmp_path / "levels"
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    for lv in ("1.0", "2.0"):
        for sub in ("GT", "LQ"):
            d = root / f"blur{lv}" / sub
            d.mkdir(parents=True)
            noise = 0 if sub == "GT" else int(float(lv) * 10)
            cv2.imwrite(str(d / "img.png"),
                        np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8))

    viz.main(["--embeddings", str(emb), "--out", str(out), "--heatmap",
              "--monotonicity", "--residual-root", str(root),
              "--residual-levels", "1.0,2.0", "--param-json", str(pjson)])
    for name in ("tsne.png", "cosine_heatmap.png", "monotonicity.json",
                 "residual_grid.png", "param_tsne.png"):
        assert (out / name).exists(), name
    mono = json.loads((out / "monotonicity.json").read_text())
    assert mono["blur"]["spearman_rho"] > 0.9  # level-monotone by construction


def test_encode_folder_tool(tmp_path):
    """tools/encode_folder: torch-free DA-CLIP folder encoding into the dump
    layout tools/visualize consumes (the front half of the reference's
    visualize_same_image_diff_level.py workflow), flat + nested layouts."""
    import jax
    import jax.numpy as jnp

    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from daclip_tpu.tools.encode_folder import main as encode_main
    from daclip_tpu.utils.native_checkpoint import save_params_npz

    cfg = CLIPCfg.from_dict(get_model_config("daclip_test-tiny"))
    model = DaCLIP(cfg, use_predictor=False, dtype=jnp.bfloat16)
    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    txt = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), image=img, text=txt)["params"]
    npz = str(tmp_path / "tiny.npz")
    save_params_npz(npz, params)

    rng = np.random.RandomState(0)
    flat = tmp_path / "flat"
    flat.mkdir()
    for name in ("lvl05", "lvl10", "lvl20"):
        cv2.imwrite(str(flat / f"{name}.png"),
                    (rng.rand(40, 40, 3) * 255).astype(np.uint8))
    nested = tmp_path / "nested"
    for cname in ("blur05", "noisy25"):
        d = nested / cname / "LQ"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / "a.png"),
                    (rng.rand(40, 40, 3) * 255).astype(np.uint8))

    out1 = tmp_path / "emb_flat"
    encode_main(["--input", str(flat), "--checkpoint", npz,
                 "--model", "daclip_test-tiny", "--out", str(out1),
                 "--batch-size", "2"])
    feats = np.load(out1 / "all_embeddings.npy")
    labels = np.load(out1 / "labels.npy")
    assert feats.shape == (3, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=2e-2)
    assert list(labels) == ["lvl05", "lvl10", "lvl20"]
    assert (out1 / "image_embeddings.npy").exists()

    out2 = tmp_path / "emb_nested"
    encode_main(["--input", str(nested), "--checkpoint", npz,
                 "--model", "daclip_test-tiny", "--out", str(out2),
                 "--features", "image"])
    labels2 = np.load(out2 / "labels.npy")
    assert list(labels2) == ["blur05", "noisy25"]
    np.testing.assert_array_equal(np.load(out2 / "all_embeddings.npy"),
                                  np.load(out2 / "image_embeddings.npy"))

    # the dump feeds the visualization back half directly
    from daclip_tpu.tools import visualize as viz
    viz.main(["--embeddings", str(out1), "--out", str(tmp_path / "viz"),
              "--heatmap"])
    assert (tmp_path / "viz" / "cosine_heatmap.png").exists()
