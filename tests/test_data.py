"""Data layer tests: IO utils, degradations, datasets, loader, metrics."""
import os

import numpy as np
import pytest

from daclip_tpu.data import util as dutil
from daclip_tpu.data import degradations as deg
from daclip_tpu.data.loader import DataLoader, IterSampler
from daclip_tpu.utils import metrics
from tests.conftest import requires_reference

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img_dirs(tmp_path_factory):
    """Build a tiny MD-style dataset tree <root>/<type>/{GT,LQ}."""
    root = tmp_path_factory.mktemp("mdroot")
    rng = np.random.RandomState(0)
    for deg_type in ["noisy", "rainy"]:
        for sub in ["GT", "LQ"]:
            d = root / deg_type / sub
            d.mkdir(parents=True)
            for i in range(3):
                img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i:03d}.png"), img)
    return str(root)


def test_read_img_and_paths(img_dirs):
    paths = dutil.get_image_paths("img", os.path.join(img_dirs, "noisy", "GT"))
    assert len(paths) == 3
    img = dutil.read_img(None, paths[0])
    assert img.dtype == np.float32 and img.ndim == 3
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_augment_shapes():
    a = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
    outs = dutil.augment([a, a.copy()], True, True)
    assert outs[0].shape in [(2, 4, 3), (4, 2, 3)]
    np.testing.assert_array_equal(outs[0], outs[1])


def test_bgr2ycbcr_range():
    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    y = dutil.bgr2ycbcr(img, only_y=True)
    assert y.shape == (8, 8)
    assert 16 / 255 <= y.min() and y.max() <= 235.5 / 255


@requires_reference
def test_imresize_matches_reference():
    from tests.parity.refload import load_ref_module
    import torch
    ref = load_ref_module("universal-image-restoration/data/util.py", "ref_data_util")
    torch.Tensor.cuda = lambda self, *a, **k: self  # reference hardcodes .cuda()
    img = np.random.RandomState(1).rand(17, 23, 3).astype(np.float32)
    for scale in [0.5, 0.33, 2.0]:
        want = ref.imresize(torch.from_numpy(img.transpose(2, 0, 1)), scale,
                            True).numpy().transpose(1, 2, 0)
        got = dutil.imresize_np(img, scale, True)
        assert got.shape == want.shape
        # full-frame match incl. borders (symmetric fold parity)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_degrade_four_types():
    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    for t, p in [("noisy", 25), ("blur", 9), ("jpeg", 40), ("resize", 2.0)]:
        out = deg.degrade(img.copy(), t, p)
        assert out.ndim == 3 and out.shape[2] == 3, t
        assert np.isfinite(out).all(), t
        if t != "resize":
            assert out.shape == img.shape
            assert np.abs(out - img).mean() > 1e-4, f"{t} did nothing"


def test_random_degrade_pipeline():
    np.random.seed(0)
    img = np.random.RandomState(1).rand(96, 96, 3).astype(np.float32)
    dl = set()
    out = deg.random_degrade(img.copy(), deg_list=dl)
    assert out.shape[2] == 3
    assert np.isfinite(out).all()
    assert 0 <= out.min() and out.max() <= 1


def test_kernels_normalized():
    for k in [deg.predefined_mixed_kernel(13),
              deg.predefined_sinc_kernel(13),
              deg.defocus_kernel(9),
              deg.random_line_kernel(9),
              deg._adjust(deg.psf_kernel(), 21)]:
        assert abs(k.sum() - 1.0) < 1e-6
        assert np.isfinite(k).all()


def test_add_random_mask_assets():
    img = np.ones((32, 32, 3), np.float32) * 0.5
    out = deg.add_random_mask(img, mask_id=3)
    assert out.shape == img.shape
    assert out.max() <= 1.0 and out.min() >= 0.0


def test_md_dataset(img_dirs):
    from daclip_tpu.data import create_dataset
    ds = create_dataset({"mode": "MD", "dataroot": img_dirs, "phase": "train",
                         "patch_size": 16, "distortion": ["noisy", "rainy"],
                         "use_flip": True, "use_rot": True, "color": None,
                         "seed": 0})
    s = ds[0]
    assert s["GT"].shape == (16, 16, 3)
    assert s["LQ"].shape == (16, 16, 3)
    assert s["LQ_clip"].shape == (224, 224, 3)
    assert s["type"] in ("noisy", "rainy")
    # val mode iterates all items deterministically
    ds_val = create_dataset({"mode": "MD", "dataroot": img_dirs, "phase": "val",
                             "distortion": ["noisy", "rainy"], "color": None})
    assert len(ds_val) == 6
    _ = [ds_val[i]["GT_path"] for i in range(6)]


def test_lqgt_dataset(img_dirs):
    from daclip_tpu.data import create_dataset
    ds = create_dataset({"mode": "LQGT", "phase": "test",
                         "dataroot_GT": os.path.join(img_dirs, "noisy", "GT"),
                         "dataroot_LQ": os.path.join(img_dirs, "noisy", "LQ")})
    s = ds[1]
    assert s["GT"].shape == s["LQ"].shape
    assert s["LQ_clip"].shape == (224, 224, 3)


def test_mdgt_dataset_applies_degradation(img_dirs):
    from daclip_tpu.data import create_dataset
    ds = create_dataset({"mode": "MDGT", "phase": "train", "patch_size": 32,
                         "dataroot_GT": os.path.join(img_dirs, "noisy", "GT"),
                         "use_flip": True, "use_rot": True, "seed": 0})
    s = ds[0]
    assert s["GT"].shape[2] == 3 and s["LQ"].shape[2] == 3
    assert np.isfinite(s["LQ"]).all()


def test_iter_sampler_parity_semantics():
    s = IterSampler(dataset_len=10, host_id=0, num_hosts=2, ratio=4)
    idx0 = list(iter(s))
    s1 = IterSampler(dataset_len=10, host_id=1, num_hosts=2, ratio=4)
    idx1 = list(iter(s1))
    assert len(idx0) == len(idx1) == 20  # ceil(10*4/2)
    assert all(0 <= i < 10 for i in idx0 + idx1)
    s.set_epoch(1)
    assert list(iter(s)) != idx0  # reshuffles by epoch


def test_dataloader_batches(img_dirs):
    from daclip_tpu.data import create_dataset
    ds = create_dataset({"mode": "MD", "dataroot": img_dirs, "phase": "train",
                         "patch_size": 16, "distortion": ["noisy", "rainy"],
                         "use_flip": True, "use_rot": True, "color": None,
                         "seed": 0})
    sampler = IterSampler(len(ds), ratio=10)
    dl = DataLoader(ds, batch_size=4, sampler=sampler, num_workers=2)
    batch = next(iter(dl))
    assert batch["GT"].shape == (4, 16, 16, 3)
    assert batch["LQ_clip"].shape == (4, 224, 224, 3)
    assert isinstance(batch["type"], list) and len(batch["type"]) == 4


def test_metrics_psnr_ssim():
    rng = np.random.RandomState(0)
    a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    assert metrics.calculate_psnr(a, a) == float("inf")
    assert metrics.calculate_ssim(a.astype(np.float64), a.astype(np.float64)) == \
        pytest.approx(1.0, abs=1e-6)
    b = np.clip(a.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    p = metrics.calculate_psnr(a, b)
    assert 27 < p < 30  # ~20log10(255/10)=28.1
    assert metrics.psnr_y(a, b) > p - 5


def test_array2img_rounding():
    x = np.array([[[0.4999 / 255, 0.5001 / 255, 1.0]]], np.float32)
    out = metrics.array2img(x)
    assert out.dtype == np.uint8
    assert out[0, 0, 2] == 0 and out[0, 0, 1] == 1  # BGR flip + round-half


def test_random_degrade_seeded_deterministic():
    """A seeded rng must determine ALL stochastic draws (incl. the numpy ones:
    stage permutations, kernel noise, gaussian/poisson noise)."""
    import random

    import numpy as np

    from daclip_tpu.data.degradations import random_degrade

    img = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    a = random_degrade(img.copy(), rng=random.Random(7))
    # perturb the global numpy RNG between runs — must not matter
    np.random.rand(100)
    b = random_degrade(img.copy(), rng=random.Random(7))
    np.testing.assert_array_equal(a, b)
    c = random_degrade(img.copy(), rng=random.Random(8))
    assert not np.array_equal(a, c)


def test_degrade_blur_param_is_sigma():
    """degrade('blur', p): p is the Gaussian sigma on a fixed 21x21 grid
    (deg_util.py:199-211's repurposed argument) — strength monotone in p and
    p<1 valid."""
    import numpy as np

    from daclip_tpu.data.degradations import degrade

    img = np.random.RandomState(0).rand(48, 48, 3).astype(np.float32)
    grads = [float(np.abs(np.diff(degrade(img, "blur", p), axis=0)).mean())
             for p in (0.5, 1.0, 2.0, 4.0)]
    assert grads == sorted(grads, reverse=True)
    assert np.isfinite(degrade(img, "blur", 0.5)).all()


def test_cached_context_dataset(img_dirs):
    """Frozen-context caching (VERDICT r1 #10): clip_view is deterministic,
    _precompute_contexts attaches per-sample contexts, and batches drop
    LQ_clip so the CLIP tower leaves the train step entirely."""
    import logging

    from daclip_tpu.cli.train_restoration import _precompute_contexts
    from daclip_tpu.data import create_dataset

    ds = create_dataset({"mode": "LQGT", "phase": "train", "patch_size": 16,
                         "use_flip": True, "use_rot": True,
                         "dataroot_GT": os.path.join(img_dirs, "noisy", "GT"),
                         "dataroot_LQ": os.path.join(img_dirs, "noisy", "LQ")})
    v0, v1 = ds.clip_view(0), ds.clip_view(0)
    assert v0.shape == (224, 224, 3)
    np.testing.assert_array_equal(v0, v1)

    def fake_ctx(views):  # stand-in frozen DA-CLIP tower
        m = np.asarray(views).mean(axis=(1, 2, 3))
        img = np.stack([m, m + 1], -1)
        return img, img * 2

    cached = _precompute_contexts(ds, fake_ctx, logging.getLogger("t"),
                                  chunk=2)
    assert len(cached) == len(ds)
    s = cached[1]
    assert "LQ_clip" not in s
    assert s["image_context"].shape == (2,)
    np.testing.assert_allclose(s["text_context"], s["image_context"] * 2,
                               rtol=1e-6)
    # context of sample i must match a direct encode of its clip_view
    np.testing.assert_allclose(
        cached.image_ctx[2], fake_ctx(ds.clip_view(2)[None])[0][0], rtol=1e-5)
    # collate through the loader: contexts batch, LQ/GT crops still augment
    dl = DataLoader(cached, batch_size=3, shuffle=False, num_workers=0)
    b = next(iter(dl))
    assert b["image_context"].shape == (3, 2) and "LQ_clip" not in b
    assert b["LQ"].shape == (3, 16, 16, 3)


def test_mdgt_lq_cache(img_dirs):
    """lq_cache bounds synthesis to the refresh rate: after the pool fills,
    only ~refresh of fetches run random_degrade; cached pairs come back under
    fresh flip/rot and stay valid (GT,LQ) shapes."""
    from unittest import mock

    from daclip_tpu.data import create_dataset, degradations as deg

    ds = create_dataset({"mode": "MDGT", "phase": "train", "patch_size": 32,
                         "dataroot_GT": os.path.join(img_dirs, "noisy", "GT"),
                         "use_flip": True, "use_rot": True, "seed": 0,
                         "lq_cache": 4, "lq_cache_refresh": 0.0})
    calls = {"n": 0}
    real = deg.random_degrade

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    with mock.patch.object(deg, "random_degrade", counting):
        for i in range(20):
            s = ds[i % 3]
            assert s["GT"].shape == (32, 32, 3)
            assert s["LQ"].shape == (32, 32, 3)
            assert np.isfinite(s["LQ"]).all()
    # pool fills with the first 4 fetches; refresh=0 → no further synthesis
    assert calls["n"] == 4
    assert len(ds._lq_cache) == 4
