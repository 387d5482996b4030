"""CsvDataset / banks tests (da-clip/src/training/data.py parity)."""
import numpy as np
import pytest

from daclip_tpu.data.csv_dataset import (CsvDataset, SyntheticDataset,
                                         build_banks, parse_degradations)

cv2 = pytest.importorskip("cv2")


def test_parse_degradations():
    d = parse_degradations("blur with parameter 2.5 and noisy with parameter 25")
    assert d == {"blur": 2.5, "noisy": 25.0}


def test_banks_shapes_and_long_truncation():
    centers, tokens = build_banks()
    assert centers.shape == (4, 7)
    assert tokens.shape == (28, 77)
    # torch.long truncation parity: blur centers [0.75,1.25,...] -> [0,1,1,2,2,3,3]
    np.testing.assert_array_equal(centers[0], [0, 1, 1, 2, 2, 3, 3])
    np.testing.assert_array_equal(centers[1], [7, 12, 17, 22, 27, 32, 37])
    exact, _ = build_banks(exact_bins=True)
    np.testing.assert_allclose(exact[0], [0.75, 1.25, 1.75, 2.25, 2.75, 3.25, 3.75])


def test_csv_dataset_da_mode(tmp_path):
    lq = tmp_path / "LQ"
    gt = tmp_path / "GT"
    lq.mkdir(); gt.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(3):
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(lq / f"{i}.png"), img)
        cv2.imwrite(str(gt / f"{i}.png"), img)
        rows.append((str(lq / f"{i}.png"),
                     f"a test image {i}| noisy with parameter 25.0"))
    csv_path = tmp_path / "data.tsv"
    with open(csv_path, "w") as f:
        f.write("filepath\ttitle\n")
        for p, t in rows:
            f.write(f"{p}\t{t}\n")

    from daclip_tpu.transforms import image_transform
    ds = CsvDataset(str(csv_path), image_transform(64, is_train=False), da=True,
                    seed=0)
    assert len(ds) == 3
    s = ds[0]
    assert s["images"].shape == (64, 64, 3)
    assert s["gt_images"].shape == (64, 64, 3)
    assert s["texts"].shape == (154,)
    np.testing.assert_array_equal(s["deg_type"], [0, 1, 0, 0])
    np.testing.assert_array_equal(s["gt_val"], [0, 25, 0, 0])
    centers, tokens = ds.banks()
    assert centers.shape == (4, 7) and tokens.shape == (28, 77)

    # opt-in cv2 decode path: bit-identical pixels for PNG sources
    fast = CsvDataset(str(csv_path), image_transform(64, is_train=False),
                      da=True, seed=0, decode="cv2")
    f = fast[0]
    np.testing.assert_array_equal(f["images"], s["images"])
    np.testing.assert_array_equal(f["gt_images"], s["gt_images"])
    np.testing.assert_array_equal(f["texts"], s["texts"])


def test_random_crop_ndarray_matches_pil():
    import random

    from PIL import Image

    from daclip_tpu.data.csv_dataset import _random_crop_pil

    arr = (np.random.RandomState(5).rand(90, 70, 3) * 255).astype(np.uint8)
    a = _random_crop_pil(Image.fromarray(arr), rng=random.Random(13))
    b = _random_crop_pil(arr, rng=random.Random(13))
    np.testing.assert_array_equal(np.asarray(a), b)


def test_synthetic_dataset():
    ds = SyntheticDataset(dataset_size=5, da=True)
    s = ds[0]
    assert s["texts"].shape == (154,)
    assert len(ds) == 5
