"""Tests for round-1 gap fills: distill/coca losses, UNet remat, webdataset
reader, masked-image tool, logging utilities."""
import os
import tarfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def test_distill_clip_loss():
    from daclip_tpu.losses import distill_clip_loss
    f = jax.nn.one_hot(jnp.arange(6), 12)
    out = distill_clip_loss(f, f, 50.0, f, f, 50.0)
    assert set(out) == {"contrastive_loss", "distill_loss"}
    # student == teacher → distill loss equals teacher entropy (near 0 at high T)
    assert float(out["contrastive_loss"]) < 1e-3
    assert np.isfinite(float(out["distill_loss"]))


def test_coca_loss():
    from daclip_tpu.losses import coca_loss
    B, L, V = 2, 5, 11
    logits = jnp.zeros((B, L, V)).at[:, :, 3].set(5.0)
    labels = jnp.full((B, L), 3).at[:, -1].set(0)  # pad last token
    out = coca_loss(jax.nn.one_hot(jnp.arange(B), 8),
                    jax.nn.one_hot(jnp.arange(B), 8), logits, labels, 50.0)
    assert float(out["caption_loss"]) < 0.2  # CE~0.065 x weight 2.0
    labels_bad = jnp.full((B, L), 7)
    out_bad = coca_loss(jax.nn.one_hot(jnp.arange(B), 8),
                        jax.nn.one_hot(jnp.arange(B), 8), logits, labels_bad,
                        50.0)
    assert float(out_bad["caption_loss"]) > 1.0


def test_unet_remat_matches():
    from daclip_tpu.models.unet import ConditionalUNet
    x = jnp.ones((1, 16, 16, 3)) * 0.3
    kw = dict(nf=16, ch_mult=(1, 2), context_dim=None,
              use_degra_context=False, use_image_context=False)
    net = ConditionalUNet(**kw)
    net_r = ConditionalUNet(**kw, remat=True)
    p = net.init(jax.random.PRNGKey(0), x, x, 1.0)
    out = net.apply(p, x, x, 1.0)
    out_r = net_r.apply(p, x, x, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-6)
    # gradient flows through the remat path
    g = jax.grad(lambda pp: net_r.apply(pp, x, x, 1.0).sum())(p)
    assert np.isfinite(jax.tree.leaves(g)[0]).all()


def test_webdataset_reader(tmp_path):
    from daclip_tpu.data.webdataset import WebDataset, brace_expand
    assert brace_expand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar",
                                                "s-002.tar"]
    assert brace_expand("x{a,b}.tar") == ["xa.tar", "xb.tar"]

    # build 2 shards of (jpg, txt) samples
    from PIL import Image
    for s in range(2):
        with tarfile.open(tmp_path / f"shard-{s:03d}.tar", "w") as tf:
            for i in range(3):
                key = f"{s}_{i}"
                img_path = tmp_path / f"{key}.jpg"
                Image.new("RGB", (8, 8), (s * 100, i * 50, 0)).save(img_path)
                tf.add(img_path, arcname=f"{key}.jpg")
                txt_path = tmp_path / f"{key}.txt"
                txt_path.write_text(f"caption {key}")
                tf.add(txt_path, arcname=f"{key}.txt")

    ds = WebDataset(str(tmp_path / "shard-{000..001}.tar"), shuffle_buffer=4,
                    seed=1)
    samples = list(ds)
    assert len(samples) == 6
    assert all("jpg" in s and "txt" in s for s in samples)
    # deterministic given epoch
    assert [s["__key__"] for s in ds] == [s["__key__"] for s in samples]
    ds.set_epoch(1)
    assert [s["__key__"] for s in ds] != [s["__key__"] for s in samples]
    # host striding splits shards
    d0 = WebDataset(str(tmp_path / "shard-{000..001}.tar"), host_id=0,
                    num_hosts=2)
    assert len(list(d0)) == 3


def test_generate_masked_tool(tmp_path):
    from daclip_tpu.tools.generate_masked import generate_masked
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(src / f"{i}.png"), (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    n = generate_masked(str(src), str(tmp_path / "out"))
    assert n == 2
    assert len(os.listdir(tmp_path / "out" / "LQ")) == 2


def test_metric_writer(tmp_path):
    from daclip_tpu.utils.logging import MetricWriter, ThroughputMeter
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"loss": 0.5, "skip": "str"})
    w.write(2, {"loss": 0.25}, prefix="val_")
    w.close()
    import json
    rows = [json.loads(l) for l in open(tmp_path / "results.jsonl")]
    assert rows[0]["loss"] == 0.5 and rows[1]["val_loss"] == 0.25

    m = ThroughputMeter(num_devices=4)
    m.update(64)
    r = m.rates()
    assert r["samples_per_second"] > 0
    assert r["samples_per_second_per_device"] == pytest.approx(
        r["samples_per_second"] / 4)


def test_timm_model_gated():
    import pytest

    from daclip_tpu.models.timm_model import TimmModel
    with pytest.raises(ImportError, match="timm"):
        TimmModel("resnet50")


def test_push_to_hf_hub_payload(tmp_path):
    from daclip_tpu.tools.push_to_hf_hub import build_payload
    import json, os

    ckpt = tmp_path / "model.pt"
    ckpt.write_bytes(b"\x00" * 16)
    out = build_payload(str(ckpt), "daclip_ViT-B-32", str(tmp_path / "up"))
    cfg = json.load(open(os.path.join(out, "config.json")))
    assert cfg["model_name"] == "daclip_ViT-B-32"
    assert cfg["model_cfg"]["embed_dim"] == 512
    assert os.path.exists(os.path.join(out, "README.md"))
    assert os.path.exists(os.path.join(out, "model.pt"))


def test_tensor_parallel_clip_forward_matches_replicated():
    """TP param shardings over the 'model' axis are layout-only: the sharded
    forward must equal the replicated one (GSPMD inserts the collectives)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.factory import create_model
    from daclip_tpu.parallel.mesh import (make_mesh_tp, replicate_tree,
                                          shard_batch, tp_param_shardings)

    model, params = create_model("test-tiny")
    img = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3), jnp.float32)
    txt = jnp.asarray(np.random.RandomState(1).randint(1, 100, (4, 16)),
                      jnp.int32)
    want = model.apply({"params": params}, img, txt)

    mesh = make_mesh_tp(data=2, fsdp=1, model=4)
    specs = tp_param_shardings(params, mesh)
    # at least the attention/MLP kernels must actually shard
    flat = jax.tree.leaves(specs)
    assert any(s.spec != () and any(x is not None for x in s.spec)
               for s in flat)
    sharded = jax.device_put(params, specs)
    bsh = shard_batch(mesh)
    out = jax.jit(lambda p, i, t: model.apply({"params": p}, i, t))(
        sharded, jax.device_put(img, bsh), jax.device_put(txt, bsh))
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               np.asarray(want["image_features"]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["text_features"]),
                               np.asarray(want["text_features"]),
                               atol=1e-5, rtol=1e-5)


def test_webloader_raises_on_no_usable_pairs(tmp_path):
    """A shard that decodes samples but contains no (image, text) PAIRS must
    raise instead of spinning forever (the guard used to key on 'decoded
    anything', which a caption-less tar satisfies)."""
    from PIL import Image

    from daclip_tpu.data.webdataset import ClipWebLoader, WebDataset
    with tarfile.open(tmp_path / "imgs-000.tar", "w") as tf:
        for i in range(3):
            p = tmp_path / f"k{i}.jpg"
            Image.new("RGB", (8, 8), (i, i, i)).save(p)
            tf.add(p, arcname=f"k{i}.jpg")
    ds = WebDataset(str(tmp_path / "imgs-000.tar"))
    loader = ClipWebLoader(ds, transform=lambda im: np.zeros((4, 4, 3)),
                           tokenizer=lambda caps: np.zeros((len(caps), 7)),
                           batch_size=2, num_samples=4)
    with pytest.raises(RuntimeError, match="usable"):
        next(iter(loader))


def test_webloader_refill_passes_are_reshuffled(tmp_path):
    """When num_samples exceeds one pass, fill-up passes advance the shuffle
    epoch (they used to replay the identical order)."""
    from PIL import Image

    from daclip_tpu.data.webdataset import ClipWebLoader, WebDataset
    with tarfile.open(tmp_path / "pairs-000.tar", "w") as tf:
        for i in range(4):
            p = tmp_path / f"p{i}.jpg"
            Image.new("RGB", (8, 8), (40 * i, 0, 0)).save(p)
            tf.add(p, arcname=f"p{i}.jpg")
            t = tmp_path / f"p{i}.txt"
            t.write_text(f"cap {i}")
            tf.add(t, arcname=f"p{i}.txt")
    ds = WebDataset(str(tmp_path / "pairs-000.tar"), shuffle_buffer=4, seed=3)
    seen_epochs = []
    orig = ds.set_epoch

    def spy(e):
        seen_epochs.append(e)
        orig(e)

    ds.set_epoch = spy
    loader = ClipWebLoader(ds, transform=lambda im: np.asarray(im, np.float32),
                           tokenizer=lambda caps: np.zeros((len(caps), 7)),
                           batch_size=4, num_samples=12)   # 3 passes
    batches = list(loader)
    assert len(batches) == 3
    assert seen_epochs == [1, 2]   # two refill passes advanced the epoch


def test_inspect_checkpoint_tool(tmp_path, capsys):
    """tools/inspect_checkpoint: key/shape dump for npz + orbax train dirs
    (parity with the reference's da-clip/src/test.py:1-11 key-dump script),
    torch-free for the native formats."""
    from daclip_tpu.tools.inspect_checkpoint import describe, load_tree, main
    from daclip_tpu.utils.checkpoint import save_checkpoint, wait_all
    from daclip_tpu.utils.native_checkpoint import save_params_npz

    params = {"conv": {"kernel": np.zeros((3, 3, 4, 8), np.float32),
                       "bias": np.zeros((8,), np.float32)},
              "scale": np.float32(2.0)}

    npz = str(tmp_path / "p.npz")
    save_params_npz(npz, params)
    tree, fmt = load_tree(npz)
    assert fmt == "npz"
    stats = describe(tree, fmt, _print=lambda *a: None)
    assert stats == {"leaves": 3, "elements": 3 * 3 * 4 * 8 + 8 + 1}

    ck = str(tmp_path / "run")
    save_checkpoint(ck, 5, {"params": params, "step": 5})
    wait_all()
    tree2, fmt2 = load_tree(ck)
    assert fmt2 == "orbax (step 5)"
    main([ck, "--keys-only", "--limit", "2"])
    out = capsys.readouterr().out
    assert "top-level keys: ['params', 'step']" in out
    assert "... (" in out and "leaves" in out
