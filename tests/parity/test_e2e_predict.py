"""End-to-end predict flow with REAL (tiny, random-weight) torch checkpoints:
builds the reference UNet + DaCLIP in torch, saves .pth/.pt, and drives
DACLIPRestorer.from_torch + the predict CLI over them — the full conversion +
restoration path a user of the reference would follow."""
import os

import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = requires_reference

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tiny_checkpoints(tmp_path_factory):
    import torch
    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    tmp = tmp_path_factory.mktemp("ckpts")

    from tests.parity.refload import load_ref_openclip_pkg, load_ref_unet
    unet_pkg = load_ref_unet("daclip-sde")
    tunet = unet_pkg.arch.ConditionalUNet(
        in_nc=3, out_nc=3, nf=32, ch_mult=[1, 2], context_dim=32,
        use_degra_context=True, use_image_context=True)
    torch.save(tunet.state_dict(), str(tmp / "universal-ir.pth"))

    clip_pkg = load_ref_openclip_pkg("uir")
    tclip = clip_pkg.model.CLIP(
        embed_dim=32,
        vision_cfg=dict(image_size=32, patch_size=16, width=64, layers=2,
                        head_width=32),
        text_cfg=dict(context_length=16, vocab_size=49408, width=32, heads=2,
                      layers=2))
    tda = clip_pkg.daclip_model.DaCLIP(tclip)
    tda.initial_controller()
    torch.save({"state_dict": tda.state_dict()}, str(tmp / "daclip.pt"))
    return tmp


def test_restorer_from_torch(tiny_checkpoints):
    from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig

    cfg = RestorerConfig(model_name="daclip_test-tiny", nf=32, ch_mult=(1, 2),
                         context_dim=32, T=4, buckets_step=16, tile_size=128,
                         dtype="float32")
    r = DACLIPRestorer.from_torch(str(tiny_checkpoints / "universal-ir.pth"),
                                  str(tiny_checkpoints / "daclip.pt"), cfg)
    img = np.random.RandomState(0).rand(40, 56, 3).astype(np.float32)
    out = r.restore(img, seed=0)
    assert out.shape == (40, 56, 3) and out.dtype == np.uint8
    name, probs = r.classify_degradation(img, class_names=["noisy", "rainy"])
    assert name in ("noisy", "rainy")


def test_predict_cli(tiny_checkpoints, tmp_path):
    img_path = tmp_path / "in.png"
    cv2.imwrite(str(img_path),
                (np.random.RandomState(1).rand(32, 48, 3) * 255).astype(np.uint8))
    from daclip_tpu.cli.predict import main
    main(["-i", str(img_path), "-o", str(tmp_path / "out"),
          "--unet", str(tiny_checkpoints / "universal-ir.pth"),
          "--daclip", str(tiny_checkpoints / "daclip.pt"),
          "--model-name", "daclip_test-tiny", "--T", "4", "--classify"])
    out_file = tmp_path / "out" / "in.png"
    assert out_file.exists()
    out = cv2.imread(str(out_file))
    assert out.shape == (32, 48, 3)
