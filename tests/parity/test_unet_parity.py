"""Golden activation parity: flax ConditionalUNet vs the torch reference with the
same converted weights (daclip-sde and wild-ir variants)."""
import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = requires_reference


def _run_pair(which, torch_kwargs, our_kwargs, H=16, W=16, B=2, time=7.0,
              text_ctx=True, image_ctx=True, seed=0):
    import torch
    import jax.numpy as jnp
    from tests.parity.refload import load_ref_unet
    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.utils.torch_convert import convert_unet

    torch.manual_seed(seed)
    pkg = load_ref_unet(which)
    tnet = pkg.arch.ConditionalUNet(**torch_kwargs)
    tnet.eval()

    rng = np.random.RandomState(seed)
    xt = rng.randn(B, 3, H, W).astype(np.float32)
    cond = rng.randn(B, 3, H, W).astype(np.float32)
    cdim = torch_kwargs.get("context_dim", 512)
    tctx = rng.randn(B, cdim).astype(np.float32) if text_ctx else None
    ictx = rng.randn(B, cdim).astype(np.float32) if image_ctx else None

    with torch.no_grad():
        want = tnet(torch.from_numpy(xt), torch.from_numpy(cond),
                    torch.tensor([time]),
                    text_context=None if tctx is None else torch.from_numpy(tctx),
                    image_context=None if ictx is None else torch.from_numpy(ictx))
    want = want.numpy().transpose(0, 2, 3, 1)

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = {"params": convert_unet(sd, depth=len(torch_kwargs["ch_mult"]))}
    ours = ConditionalUNet(**our_kwargs)
    got = np.asarray(ours.apply(
        params, jnp.asarray(xt.transpose(0, 2, 3, 1)),
        jnp.asarray(cond.transpose(0, 2, 3, 1)), jnp.array([time]),
        None if tctx is None else jnp.asarray(tctx),
        None if ictx is None else jnp.asarray(ictx)))
    return got, want


def test_unet_daclip_sde_linear_attention():
    """depth=2 daclip-sde semantics: all LinearAttention levels, Spatial at mid."""
    kwargs = dict(in_nc=3, out_nc=3, nf=32, ch_mult=[1, 2], context_dim=64,
                  use_degra_context=True, use_image_context=True)
    got, want = _run_pair("daclip-sde", kwargs, kwargs)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_unet_no_context():
    kwargs = dict(in_nc=3, out_nc=3, nf=32, ch_mult=[1, 2], context_dim=None,
                  use_degra_context=False, use_image_context=False)
    got, want = _run_pair("daclip-sde", kwargs, kwargs, text_ctx=False,
                          image_ctx=False, seed=1)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_unet_nonmultiple_size_reflect_pad():
    kwargs = dict(in_nc=3, out_nc=3, nf=32, ch_mult=[1, 2], context_dim=64,
                  use_degra_context=True, use_image_context=True)
    got, want = _run_pair("daclip-sde", kwargs, kwargs, H=14, W=18, seed=2)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_unet_wildir_spatial_and_scale05():
    """wild-ir variant: SpatialTransformer at level depth-1 + internal 0.5 scale."""
    tkw = dict(in_nc=3, out_nc=3, nf=32, ch_mult=[1, 2], context_dim=64,
               use_degra_context=True, use_image_context=True, scale=0.5)
    okw = dict(tkw, spatial_attn_min_level=1)
    got, want = _run_pair("wild-ir", tkw, okw, H=16, W=16, seed=3)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_unet_full_size_config_smoke():
    """The production config (nf=64, ch_mult=[1,2,4,8], ctx 512) at 32x32: one
    forward, checks convertibility + spatial attn at level 3 + mid."""
    kwargs = dict(in_nc=3, out_nc=3, nf=64, ch_mult=[1, 2, 4, 8], context_dim=512,
                  use_degra_context=True, use_image_context=True)
    got, want = _run_pair("daclip-sde", kwargs, kwargs, H=32, W=32, B=1, seed=4)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
