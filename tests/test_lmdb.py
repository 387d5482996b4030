"""Pure-Python lmdb (data/lmdb.py): on-disk format round-trip, overflow pages,
multi-level B+tree, the LQGT lmdb data path (LQGT_dataset.py:33-74 parity) and
the create_lmdb tool."""
import os
import pickle

import numpy as np
import pytest

from daclip_tpu.data.lmdb import NODEMAX, LmdbReader, LmdbWriter


def test_roundtrip_small_and_overflow(tmp_path):
    rng = np.random.RandomState(0)
    items = {f"k{i:04d}".encode(): rng.bytes(rng.randint(1, 64))
             for i in range(50)}
    items[b"big_one"] = rng.bytes(3 * NODEMAX)          # 1 overflow chain
    items[b"bigger"] = rng.bytes(5 * 4096 + 123)        # multi-page overflow
    env = tmp_path / "env"
    with LmdbWriter(str(env)) as w:
        for k, v in items.items():
            w.put(k, v)
    r = LmdbReader(str(env))
    assert r.entries == len(items)
    for k, v in items.items():
        assert bytes(r.get(k)) == v
    assert r.get(b"missing") is None
    assert b"big_one" in r and b"nope" not in r
    assert list(r.keys()) == sorted(items)
    r.close()


def test_multilevel_tree(tmp_path):
    """Enough keys to force branch pages (and verify descent)."""
    items = {f"key_{i:08d}".encode(): (f"value {i}" * 3).encode()
             for i in range(5000)}
    env = tmp_path / "env"
    with LmdbWriter(str(env)) as w:
        for k, v in items.items():
            w.put(k, v)
    with LmdbReader(str(env)) as r:
        # spot-check across the whole range, incl. first/last
        for i in [0, 1, 37, 999, 2500, 4998, 4999]:
            k = f"key_{i:08d}".encode()
            assert bytes(r.get(k)) == items[k]
        assert r.get(b"key_99999999") is None
        assert r.entries == 5000


def test_empty_env(tmp_path):
    env = tmp_path / "env"
    with LmdbWriter(str(env)):
        pass
    with LmdbReader(str(env)) as r:
        assert r.entries == 0
        assert r.get(b"x") is None
        assert list(r.keys()) == []


def test_txn_shim_matches_reference_usage(tmp_path):
    """`with env.begin(write=False) as txn: txn.get(key)` (util.py:60-61)."""
    env = tmp_path / "env"
    with LmdbWriter(str(env)) as w:
        w.put("name", b"payload")
    r = LmdbReader(str(env))
    with r.begin(write=False) as txn:
        assert bytes(txn.get("name")) == b"payload"


@pytest.fixture()
def image_lmdb(tmp_path):
    """Folder of images -> lmdb env via the tool."""
    import cv2

    rng = np.random.RandomState(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    shapes = {}
    for i in range(4):
        img = rng.randint(0, 256, size=(24 + i, 30, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.png"), img)
        shapes[f"im{i}"] = img
    from daclip_tpu.tools.create_lmdb import create_lmdb

    env = tmp_path / "env"
    keys, sizes = create_lmdb(str(img_dir), str(env), verbose=False)
    return env, keys, sizes, shapes


def test_create_lmdb_tool_and_read_img(image_lmdb):
    from daclip_tpu.data import util

    env_dir, keys, sizes, shapes = image_lmdb
    paths, szs = util.get_image_paths("lmdb", str(env_dir))
    assert paths == keys and szs == sizes
    env = util.open_lmdb(str(env_dir))
    for k, s in zip(paths, szs):
        res = [int(x) for x in s.split("_")]
        img = util.read_img(env, k, res)
        assert img.dtype == np.float32 and img.max() <= 1.0
        np.testing.assert_array_equal((img * 255).round().astype(np.uint8),
                                      shapes[k])


def test_lqgt_dataset_lmdb(image_lmdb, tmp_path):
    from daclip_tpu.data.datasets import LQGTDataset

    env_dir, keys, sizes, shapes = image_lmdb
    ds = LQGTDataset({"data_type": "lmdb", "dataroot_GT": str(env_dir),
                      "dataroot_LQ": str(env_dir), "phase": "test"})
    assert len(ds) == 4
    item = ds[0]
    assert item["LQ"].shape == item["GT"].shape
    # values come from the lmdb (BGR float [0,1] -> tensors are finite)
    assert np.isfinite(np.asarray(item["GT"])).all()
