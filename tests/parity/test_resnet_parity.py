"""Golden parity: flax ModifiedResNet vs the torch reference with converted
random weights (tiny RN config)."""
import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = requires_reference


def test_modified_resnet_parity():
    import torch
    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import load_ref_module, load_ref_openclip_pkg
    load_ref_openclip_pkg("uir")  # registers open_clip.utils alias
    ref = load_ref_module("universal-image-restoration/open_clip/modified_resnet.py",
                          "ref_modified_resnet")

    layers = (2, 2, 2, 2)
    width, out_dim, image_size = 32, 64, 64
    heads = width * 32 // 64
    tnet = ref.ModifiedResNet(layers=list(layers), output_dim=out_dim,
                              heads=heads, image_size=image_size, width=width)
    tnet.eval()
    # randomize BN running stats so the test actually checks them
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, image_size, image_size).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    import jax.numpy as jnp
    from daclip_tpu.models.resnet import ModifiedResNet
    from daclip_tpu.utils.torch_convert import convert_resnet_visual

    sd = {f"visual.{k}": v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = {"params": convert_resnet_visual(sd, "visual", layers)}
    ours = ModifiedResNet(layers=layers, output_dim=out_dim, heads=heads,
                          image_size=image_size, width=width)
    got = np.asarray(ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_rn50_config_builds():
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models import CLIP, CLIPCfg, get_model_config

    cfg = CLIPCfg.from_dict(get_model_config("RN50"))
    assert cfg.vision.is_resnet and cfg.vision.heads == 32
    # build a scaled-down RN for speed
    tiny = CLIPCfg.from_dict({
        "embed_dim": 64,
        "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 32,
                       "head_width": 32},
        "text_cfg": {"context_length": 16, "vocab_size": 128, "width": 32,
                     "heads": 2, "layers": 2}})
    model = CLIP(tiny)
    img = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), image=img, text=txt)
    out = model.apply(params, image=img, text=txt)
    assert out["image_features"].shape == (1, 64)
