"""Pipeline tests: shape-bucket restore, tiled high-res restore, degradation
classification — tiny config, random weights, CPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daclip_tpu.models import CLIPCfg, DaCLIP, TextCfg, VisionCfg
from daclip_tpu.models.unet import ConditionalUNet
from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig


@pytest.fixture(scope="module")
def tiny_restorer():
    cfg = RestorerConfig(model_name="daclip_test-tiny", nf=16, ch_mult=(1, 2),
                         context_dim=32, T=4, buckets_step=16, tile_size=64,
                         tile_overlap=16, dtype="float32")
    clip_cfg = CLIPCfg.from_dict({"embed_dim": 32,
                                  "vision_cfg": {"image_size": 32, "layers": 2,
                                                 "width": 64, "patch_size": 16,
                                                 "head_width": 32},
                                  "text_cfg": {"context_length": 16,
                                               "vocab_size": 49408, "width": 32,
                                               "heads": 2, "layers": 2}})
    daclip = DaCLIP(clip_cfg)
    img = jnp.zeros((1, 32, 32, 3))
    dparams = daclip.init(jax.random.PRNGKey(0), image=img,
                          text=jnp.zeros((1, 32), jnp.int32))["params"]
    unet = ConditionalUNet(nf=16, ch_mult=(1, 2), context_dim=32,
                           use_degra_context=True, use_image_context=True)
    x0 = jnp.zeros((1, 16, 16, 3))
    uparams = unet.init(jax.random.PRNGKey(1), x0, x0, jnp.ones((1,)),
                        jnp.zeros((1, 32)), jnp.zeros((1, 32)))["params"]

    # tiny model: CLIP view must be 32px not 224 — monkeypatch via cfg override
    r = DACLIPRestorer(cfg, uparams, dparams)
    return r


def test_restore_bucketed(tiny_restorer):
    img = np.random.RandomState(0).rand(30, 45, 3).astype(np.float32)
    out = tiny_restorer.restore(img, seed=0)
    assert out.shape == (30, 45, 3)
    assert out.dtype == np.uint8


def test_restore_tiled_highres(tiny_restorer):
    img = np.random.RandomState(1).rand(100, 80, 3).astype(np.float32)
    out = tiny_restorer.restore(img, seed=0, return_uint8=False)
    assert out.shape == (100, 80, 3)
    assert np.isfinite(out).all()
    assert 0 <= out.min() and out.max() <= 1


def test_restore_batch_mixed_buckets(tiny_restorer):
    rng = np.random.RandomState(3)
    imgs = [rng.rand(16, 16, 3).astype(np.float32),
            rng.rand(16, 16, 3).astype(np.float32),
            rng.rand(30, 20, 3).astype(np.float32)]
    outs = tiny_restorer.restore_batch(imgs, seed=0)
    assert [o.shape for o in outs] == [(16, 16, 3), (16, 16, 3), (30, 20, 3)]
    assert all(o.dtype == np.uint8 for o in outs)


def test_classify_degradation(tiny_restorer):
    img = np.random.RandomState(2).rand(40, 40, 3).astype(np.float32)
    name, probs = tiny_restorer.classify_degradation(img, class_names=["noisy",
                                                                       "rainy"])
    assert name in ("noisy", "rainy")
    assert abs(sum(probs.values()) - 1.0) < 1e-3


def test_restore_tiled_sharded_matches_unsharded(tiny_restorer):
    """Tile batches sharded over the virtual 8-device mesh produce the same
    image as the single-device path (SPMD is a layout, not a math change).

    112×208 with ts=64/ov=16 is EXACTLY 8 tiles (2×4): one full tile_batch on
    both paths, so the per-batch noise draws coincide.  (With a partial last
    batch the unsharded path runs it in a smaller bucket while the sharded
    path pads to the mesh-divisible tile_batch — different batch shape ⇒
    different jax.random draws; that's seed bookkeeping, not math.)"""
    import dataclasses

    import jax
    from jax.sharding import Mesh

    r = tiny_restorer
    rng = np.random.RandomState(0)
    img = rng.rand(112, 208, 3).astype(np.float32)
    a = r.restore(img, seed=3, return_uint8=False)

    r2 = DACLIPRestorer(dataclasses.replace(r.cfg, tile_batch=8),
                        r.unet_params, r.daclip_params)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    r2.shard_tiles(mesh)
    b = r2.restore(img, seed=3, return_uint8=False)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_adaptive_tile_axis_invariants():
    """The adaptive grid always (a) covers the axis, (b) keeps ≥ overlap
    between neighbours, (c) uses the MINIMUM tile count a ts_max-sized grid
    could achieve, and (d) shrinks tiles to the smallest step multiple that
    count allows — e.g. 1024/ts512/ov64 is 3×384, not 3×512 (the serving-
    latency lever measured in BASELINE.md)."""
    from daclip_tpu.pipeline import _adaptive_tile_axis
    import math

    assert _adaptive_tile_axis(1024, 512, 64, 64) == ([0, 320, 640], 384)
    # non-step-multiple ts_max: contract still holds (cap floors to a step
    # multiple; the minimal count is computed from the floored max)
    for D, ts, ov, step in [(1024, 500, 64, 64), (300, 70, 16, 16)]:
        pos, t = _adaptive_tile_axis(D, ts, ov, step)
        eff = ts - ts % step
        assert t <= eff and t % step == 0
        assert pos[0] == 0 and pos[-1] == D - t
        assert len(pos) == math.ceil((D - ov) / (eff - ov))
    # size buckets snap UP (bounded compile shapes), never past ts_max
    assert _adaptive_tile_axis(513, 512, 64, 64, (256, 384, 512)) \
        == ([0, 129], 384)  # raw need is 320 → snapped to 384
    # ... including the single-tile (D <= ts_max) branch: the SMALL axis of a
    # mixed-resolution input must also land on a bucket, or serving
    # 1200x300/1200x340/... compiles one sampler shape per width
    assert _adaptive_tile_axis(300, 512, 64, 64, (256, 384, 512)) \
        == ([0], 384)
    assert _adaptive_tile_axis(200, 512, 64, 64, (256, 384, 512)) \
        == ([0], 256)
    for D in [65, 100, 128, 150, 208, 300, 511, 513, 640, 1000, 1024, 2048]:
        for ts, ov, step in [(512, 64, 64), (64, 16, 16), (256, 32, 64)]:
            for sizes in (None, (ts // 2, 3 * ts // 4, ts)):
                pos, t = _adaptive_tile_axis(D, ts, ov, step, sizes)
                assert t <= max(ts, step) and t % step == 0
                if D > ts:
                    assert pos[0] == 0 and pos[-1] == D - t  # exact coverage
                    for a, b in zip(pos, pos[1:]):
                        assert b - a <= t - ov + 1  # ≥ ov overlap (±rounding)
                    assert len(pos) == math.ceil((D - ov) / (ts - ov))  # minimal
                else:
                    assert pos == [0] and t >= D


def test_tile_size_buckets_wiring(tiny_restorer):
    """Explicit tile_size_buckets force the grid's tile size: (tile_size,)
    reproduces the r2 fixed grid (tiles of exactly ts), while the default
    derived set lets the adaptive grid shrink (100x80 at ts=64/ov=16 uses
    64x48 tiles).  Bounds compiled sampler shapes under mixed-res serving."""
    import dataclasses

    img = np.random.RandomState(1).rand(100, 80, 3).astype(np.float32)
    shapes = {}
    for label, buckets in [("fixed", (64,)), ("default", None)]:
        r = DACLIPRestorer(
            dataclasses.replace(tiny_restorer.cfg, tile_size_buckets=buckets),
            tiny_restorer.unet_params, tiny_restorer.daclip_params)
        seen = []
        orig = r._sample

        def spy(lq, key, tctx, ictx, _seen=seen, _orig=orig):
            _seen.append(tuple(lq.shape[1:3]))
            return _orig(lq, key, tctx, ictx)

        r._sample = spy
        out = r.restore(img, seed=0, return_uint8=False)
        assert out.shape == (100, 80, 3) and np.isfinite(out).all()
        shapes[label] = set(seen)
    assert shapes["fixed"] == {(64, 64)}
    assert shapes["default"] == {(64, 48)}


def test_restore_tiled_batch_buckets(tiny_restorer):
    """Partial tile batches run in descending power-of-two buckets with ZERO
    padded slots (the 1024²/9-tile case burned 7/16 slots before): 150×100 at
    ts=64/ov=16 is 6 tiles → chunks of 4 and 2, every tile sampled once."""
    r = tiny_restorer
    rng = np.random.RandomState(0)
    img = rng.rand(150, 100, 3).astype(np.float32)

    seen = []
    orig = r._sample

    def spy(lq, key, tctx, ictx):
        seen.append(int(lq.shape[0]))
        return orig(lq, key, tctx, ictx)

    r._sample = spy
    try:
        out = r.restore(img, seed=3, return_uint8=False)
    finally:
        r._sample = orig
    assert seen == [4, 2]
    assert out.shape == (150, 100, 3) and np.isfinite(out).all()
