"""End-to-end PSNR parity against a COMMITTED reference-generated fixture.

The released daclip_ViT-B-32.pt / universal-ir.pth cannot be downloaded here
(zero egress; tests/parity/EGRESS.md), so the BASELINE.json north-star "PSNR
within 0.1 dB of the PyTorch reference" is executed against the committed
golden fixture produced by tests/parity/make_e2e_fixture.py: a tiny seeded
torch UNet + DaCLIP and the torch reference sampler's restored output
(sde_utils.py:297-313) on a fixed LQ/GT pair with an explicit noise bank.

Unlike tests/parity/test_*_parity.py this does NOT need /root/reference — only
the fixture directory and the baked-in torch-cpu (to read the .pth/.pt)."""
import json
import pathlib

import numpy as np
import pytest

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures" / "e2e"

pytestmark = pytest.mark.skipif(
    not (FIXTURE_DIR / "meta.json").exists(),
    reason="e2e golden fixture not generated (tests/parity/make_e2e_fixture.py)")


def _psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def test_e2e_restoration_psnr_parity():
    import jax
    import jax.numpy as jnp

    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.sde import IRSDE
    from daclip_tpu.utils.torch_convert import (convert_daclip, convert_unet,
                                                infer_unet_arch,
                                                load_torch_state_dict)

    meta = json.loads((FIXTURE_DIR / "meta.json").read_text())
    arrs = np.load(FIXTURE_DIR / "arrays.npz")
    gt, lq = arrs["gt"], arrs["lq"]

    # ---- DA-CLIP contexts through OUR converted model (test.py:113-117) ----
    cfg = CLIPCfg.from_dict(get_model_config(meta["model_name"]))
    daclip = DaCLIP(cfg, dtype=jnp.float32)
    dparams = {"params": convert_daclip(
        load_torch_state_dict(str(FIXTURE_DIR / "daclip.pt")))}
    img_ctx, degra_ctx = daclip.apply(
        dparams, jnp.asarray(arrs["img4clip"][None]), control=True,
        method=daclip.encode_image)
    np.testing.assert_allclose(np.asarray(img_ctx), arrs["image_context"],
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(degra_ctx), arrs["degra_context"],
                               atol=2e-3)

    # ---- UNet from the fixture checkpoint (arch inferred like predict.py) --
    unet_sd = load_torch_state_dict(str(FIXTURE_DIR / "unet.pth"))
    arch = infer_unet_arch(unet_sd)
    net = ConditionalUNet(nf=arch["nf"], ch_mult=tuple(arch["ch_mult"]),
                          context_dim=arch["context_dim"],
                          use_degra_context=arch["use_degra_context"],
                          use_image_context=arch["use_image_context"],
                          scale=arch["scale"], dtype=jnp.float32)
    uparams = {"params": convert_unet(unet_sd, depth=len(arch["ch_mult"]))}

    def noise_fn(x, mu, tb, **ctx):
        return net.apply(uparams, x, mu, tb, ctx.get("text_context"),
                         ctx.get("image_context"))

    # ---- our sampler with the fixture's exact noise bank -------------------
    sde = IRSDE(max_sigma=meta["max_sigma"], T=meta["T"],
                schedule=meta["schedule"], eps=meta["eps"])
    out = jax.jit(lambda xt, mu, zs: sde.reverse_posterior(
        noise_fn, xt, mu, jax.random.PRNGKey(0), noises=zs,
        text_context=degra_ctx.astype(jnp.float32),
        image_context=img_ctx.astype(jnp.float32)))(
        jnp.asarray(arrs["x_T"][None]), jnp.asarray(lq[None]),
        jnp.asarray(arrs["noises"]))
    ours = np.asarray(out[0], np.float32)

    ref = arrs["ref_out"]
    # restored-quality parity: the north-star 0.1 dB criterion
    psnr_ours = _psnr(ours, gt)
    psnr_ref = _psnr(ref, gt)
    assert abs(psnr_ours - psnr_ref) < 0.1, (psnr_ours, psnr_ref)
    assert abs(psnr_ref - meta["ref_psnr_vs_gt"]) < 1e-3  # fixture integrity
    # trajectory parity: outputs agree far beyond quality-level equivalence
    assert _psnr(ours, ref) > 40.0, _psnr(ours, ref)
