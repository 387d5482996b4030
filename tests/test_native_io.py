"""Native C++ IO core (daclip_tpu/native/dio.cc via data/native_io.py):
decode parity vs cv2, crop-at-decode bit-exactness, batch pool, and the
dataset wiring.  Skipped entirely when the toolchain/libs are unavailable
(the data layer falls back to cv2 in that case)."""
import os
import random

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from daclip_tpu.data import native_io

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native IO toolchain unavailable")


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    img = (rng.random((96, 120, 3)) * 255).astype(np.uint8)
    _, jpg = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    _, png = cv2.imencode(".png", img)
    return jpg.tobytes(), png.tobytes()


def test_probe(images):
    jb, pb = images
    assert native_io.probe(jb) == (120, 96, 3)
    assert native_io.probe(pb) == (120, 96, 3)


def test_full_decode_matches_cv2(images):
    for data in images:
        got = native_io.decode(data)
        ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(got, ref)


def test_crop_at_decode_is_bit_exact(images):
    for data in images:
        full = native_io.decode(data)
        for crop in [(0, 0, 120, 96), (17, 9, 64, 48), (56, 48, 64, 48)]:
            x, y, w, h = crop
            got = native_io.decode(data, crop=crop)
            np.testing.assert_array_equal(got, full[y:y + h, x:x + w])


def test_batch_matches_single(images):
    jb, pb = images
    datas = [jb, pb, jb, pb]
    crops = [None, (8, 8, 32, 32), (3, 5, 50, 40), None]
    outs = native_io.decode_batch(datas, crops=crops, threads=2)
    for d, c, o in zip(datas, crops, outs):
        np.testing.assert_array_equal(o, native_io.decode(d, crop=c))


def test_grayscale_channel_axis():
    g = (np.random.default_rng(1).random((20, 30)) * 255).astype(np.uint8)
    _, pb = cv2.imencode(".png", g)
    out = native_io.decode(pb.tobytes())
    assert out.shape == (20, 30, 1)
    np.testing.assert_array_equal(
        out[:, :, 0],
        cv2.imdecode(np.frombuffer(pb.tobytes(), np.uint8),
                     cv2.IMREAD_UNCHANGED))


def test_read_imgs_cropped_matches_full_path(tmp_path):
    """util.read_imgs_cropped (native crop-at-decode) must equal the cv2
    full-decode + shared-crop reference path bit for bit, with the same rng
    consumption."""
    from daclip_tpu.data import util

    rng = np.random.default_rng(2)
    paths = []
    for i in range(2):
        img = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)

    imgs_native, pos_native = util.read_imgs_cropped(
        paths, 48, random.Random(7))
    os.environ["DACLIP_TPU_NATIVE_IO"] = "0"
    try:
        imgs_ref, pos_ref = util.read_imgs_cropped(paths, 48, random.Random(7))
    finally:
        os.environ["DACLIP_TPU_NATIVE_IO"] = "1"
    assert pos_native == pos_ref
    for a, b in zip(imgs_native, imgs_ref):
        np.testing.assert_array_equal(a, b)


def test_16bit_and_alpha_pngs_fall_back_to_cv2(tmp_path):
    """Native decode must REFUSE PNGs whose cv2 decode differs (16-bit depth,
    alpha color types) so read_img keeps cv2's value semantics per host."""
    rng = np.random.default_rng(1)
    img16 = (rng.random((16, 16, 3)) * 65535).astype(np.uint16)
    ok, png16 = cv2.imencode(".png", img16)
    assert ok
    with pytest.raises(ValueError):
        native_io.decode(png16.tobytes())

    rgba = (rng.random((16, 16, 4)) * 255).astype(np.uint8)
    ok, png_a = cv2.imencode(".png", rgba)
    assert ok
    with pytest.raises(ValueError):
        native_io.decode(png_a.tobytes())

    # read_img end-to-end: same values as the pure-cv2 path
    from daclip_tpu.data.util import read_img
    p16 = tmp_path / "img16.png"
    p16.write_bytes(png16.tobytes())
    got = read_img(None, str(p16))
    want = cv2.imread(str(p16), cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
    np.testing.assert_array_equal(got, want)


def test_read_imgs_cropped_cv2_fallback_on_bad_bytes(tmp_path):
    """A file the native core can't decode must fall back to cv2 (not crash);
    with cv2 also unable to read it, the error surfaces as FileNotFoundError
    from read_img — never a raw native ValueError."""
    from daclip_tpu.data.util import read_imgs_cropped
    good = tmp_path / "a.png"
    rng = np.random.default_rng(2)
    cv2.imwrite(str(good), (rng.random((32, 32, 3)) * 255).astype(np.uint8))
    bad = tmp_path / "b.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\n" + b"garbage" * 4)
    r = random.Random(0)
    with pytest.raises(FileNotFoundError):
        read_imgs_cropped([str(good), str(bad)], size=16, rng=r)
