"""Generate the committed end-to-end PSNR-parity fixture.

The released `daclip_ViT-B-32.pt` / `universal-ir.pth` weights cannot be
downloaded in this environment (zero egress — see tests/parity/EGRESS.md), so
the BASELINE.json north-star "PSNR within 0.1 dB of the PyTorch reference" is
asserted against a committed small golden fixture instead: a tiny seeded torch
UNet + DaCLIP, and the restored output produced by the REFERENCE's own IR-SDE
posterior sampler (sde_utils.py:297-313 math, explicit noise bank) on a fixed
LQ/GT pair.

Run (dev-only, needs /root/reference):
  python -m tests.parity.make_e2e_fixture

Writes tests/parity/fixtures/e2e/{unet.pth,daclip.pt,arrays.npz,meta.json};
tests/parity/test_e2e_psnr.py then replays the sampler through the public
daclip_tpu API and compares.
"""
import json
import os
import pathlib

import numpy as np

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures" / "e2e"

H = W = 32
T = 100
MAX_SIGMA = 50
SCHEDULE = "cosine"
EPS = 0.005
UNET_CFG = dict(in_nc=3, out_nc=3, nf=32, ch_mult=[1, 2], context_dim=32,
                use_degra_context=True, use_image_context=True)
CLIP_CFG = dict(embed_dim=32,
                vision_cfg=dict(image_size=32, patch_size=16, width=64,
                                layers=2, head_width=32),
                text_cfg=dict(context_length=16, vocab_size=49408, width=32,
                              heads=2, layers=2))


def make_inputs():
    """Deterministic LQ/GT pair + CLIP view + x_T + per-step noise bank (all
    NHWC float32; torch side transposes)."""
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    gt = np.stack([0.5 + 0.4 * np.sin(xx / 5.0),
                   0.5 + 0.4 * np.cos(yy / 7.0),
                   0.5 + 0.3 * np.sin((xx + yy) / 9.0)], -1).astype(np.float32)
    lq = np.clip(gt + rng.randn(H, W, 3).astype(np.float32) * 0.1, 0, 1)
    # CLIP view: the (image_size²) normalized view test.py feeds encode_image
    # (precomputed so transform differences can't leak into the parity check)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    img4clip = ((lq - mean) / std).astype(np.float32)
    x_T = (lq + np.random.RandomState(3).randn(H, W, 3) *
           (MAX_SIGMA / 255.0)).astype(np.float32)
    noises = np.random.RandomState(4).randn(T, 1, H, W, 3).astype(np.float32)
    return gt, lq, img4clip, x_T, noises


def main():
    import torch

    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import (load_ref_openclip_pkg, load_ref_sde,
                                      load_ref_unet)

    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    gt, lq, img4clip, x_T, noises = make_inputs()

    # ---- tiny reference models (seeded) ------------------------------------
    unet_pkg = load_ref_unet("daclip-sde")
    tunet = unet_pkg.arch.ConditionalUNet(**UNET_CFG)
    tunet.eval()
    torch.save(tunet.state_dict(), str(FIXTURE_DIR / "unet.pth"))

    clip_pkg = load_ref_openclip_pkg("uir")
    tclip = clip_pkg.model.CLIP(**CLIP_CFG)
    tda = clip_pkg.daclip_model.DaCLIP(tclip)
    tda.initial_controller()
    tda.eval()
    torch.save({"state_dict": tda.state_dict()}, str(FIXTURE_DIR / "daclip.pt"))

    # ---- contexts (test.py:113-117) ----------------------------------------
    clip_in = torch.from_numpy(img4clip.transpose(2, 0, 1)[None])
    with torch.no_grad():
        image_context, degra_context = tda.encode_image(clip_in, control=True)
    image_context = image_context.float()
    degra_context = degra_context.float()

    # ---- reference IR-SDE posterior sampler (sde_utils.py:297-313) ---------
    sde_mod = load_ref_sde()
    sde = sde_mod.IRSDE(max_sigma=MAX_SIGMA, T=T, schedule=SCHEDULE, eps=EPS,
                        device=torch.device("cpu"))
    mu = torch.from_numpy(lq.transpose(2, 0, 1)[None])
    sde.set_mu(mu)
    x = torch.from_numpy(x_T.transpose(2, 0, 1)[None])
    with torch.no_grad():
        for t in reversed(range(1, T + 1)):
            tt = torch.full((1,), t * sde.sample_scale, dtype=torch.float32)
            eps_hat = tunet(x, mu, tt, text_context=degra_context,
                            image_context=image_context)
            x0 = sde.get_init_state_from_noise(x, eps_hat, t)
            mean = sde.reverse_optimum_step(x, x0, t)
            std = sde.reverse_optimum_std(t)
            z = torch.from_numpy(noises[t - 1].transpose(0, 3, 1, 2))
            x = mean + std * z
    ref_out = x[0].numpy().transpose(1, 2, 0).astype(np.float32)

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    ref_psnr_gt = psnr(ref_out, gt)
    np.savez_compressed(
        FIXTURE_DIR / "arrays.npz", gt=gt, lq=lq, img4clip=img4clip, x_T=x_T,
        noises=noises, ref_out=ref_out,
        image_context=image_context.numpy(), degra_context=degra_context.numpy())
    meta = dict(H=H, W=W, T=T, max_sigma=MAX_SIGMA, schedule=SCHEDULE, eps=EPS,
                unet_cfg=UNET_CFG, model_name="daclip_test-tiny",
                ref_psnr_vs_gt=round(ref_psnr_gt, 4),
                torch_version=torch.__version__)
    (FIXTURE_DIR / "meta.json").write_text(json.dumps(meta, indent=1))
    sizes = {p.name: os.path.getsize(p) for p in FIXTURE_DIR.iterdir()}
    print(f"fixture written: {sizes}; reference PSNR vs GT = {ref_psnr_gt:.4f} dB")


if __name__ == "__main__":
    main()
