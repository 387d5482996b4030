"""Loss tests: unit behaviour + FCRC golden parity vs the fork's torch code +
multi-device GSPMD equivalence of the global contrastive loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.losses import (clip_loss, daclip_loss_fork, daclip_loss_uir,
                               fcrc_loss, matching_loss)
from tests.conftest import requires_reference


def test_clip_loss_perfect_alignment_is_low():
    f = jax.nn.one_hot(jnp.arange(8), 16)
    loss_aligned = clip_loss(f, f, 100.0)
    loss_shuffled = clip_loss(f, jnp.roll(f, 1, axis=0), 100.0)
    assert float(loss_aligned) < 1e-3
    assert float(loss_shuffled) > 1.0


def test_matching_loss_types():
    a = jnp.ones((2, 4, 4, 3))
    b = jnp.zeros((2, 4, 4, 3))
    assert float(matching_loss(a, b, "l1")) == pytest.approx(1.0)
    assert float(matching_loss(2 * a, b, "l2")) == pytest.approx(4.0)
    w = jnp.array([1.0, 0.0])
    assert float(matching_loss(a, b, "l1", weights=w)) == pytest.approx(0.5)


def test_daclip_loss_uir_keys():
    k = jax.random.PRNGKey(0)
    f = lambda i: jax.random.normal(jax.random.fold_in(k, i), (4, 8))
    out = {"image_features": f(0), "text_features": f(1),
           "image_degra_features": f(2), "text_degra_features": f(3),
           "logit_scale": jnp.asarray(50.0)}
    d = daclip_loss_uir(out)
    assert set(d) == {"contrastive_loss", "degra_loss"}
    assert np.isfinite(float(d["contrastive_loss"]))


def test_fcrc_all_types_absent_is_zero():
    B, D = 4, 8
    k = jax.random.PRNGKey(1)
    loss = fcrc_loss(jax.random.normal(k, (B, D)),
                     jax.random.normal(k, (28, D)),
                     jnp.ones((B, 4)), jnp.ones((4, 7)), jnp.zeros((B, 4)))
    assert float(loss) == 0.0


def test_global_clip_loss_matches_single_device():
    """GSPMD parity: loss over a batch sharded across the 8-device mesh equals the
    single-device loss — the TPU-native version of gather_features
    (open_clip/loss.py:19-63)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from daclip_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    k = jax.random.PRNGKey(2)
    img = jax.random.normal(k, (16, 32))
    txt = jax.random.normal(jax.random.fold_in(k, 1), (16, 32))

    want = float(clip_loss(img, txt, 30.0))

    sharding = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, sharding)
    txt_s = jax.device_put(txt, sharding)
    got = float(jax.jit(lambda a, b: clip_loss(a, b, 30.0))(img_s, txt_s))
    assert got == pytest.approx(want, rel=1e-5)


@requires_reference
def test_fcrc_golden_vs_fork():
    import torch
    torch.manual_seed(0)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import load_ref_openclip_pkg
    pkg = load_ref_openclip_pkg("daclip")
    loss_mod = __import__(f"{pkg.__name__}.loss", fromlist=["loss"]) \
        if hasattr(pkg, "loss") else None
    # load loss.py directly
    from tests.parity.refload import load_ref_module
    tl = load_ref_module("da-clip/src/open_clip/loss.py",
                         f"{pkg.__name__}.loss", package=pkg.__name__)
    ref_loss = tl.DaClipLoss()

    rng = np.random.RandomState(0)
    B, D = 6, 16
    feats = rng.randn(B, D).astype(np.float32)
    toks = rng.randn(B, 28, D).astype(np.float32)
    centers = np.broadcast_to(
        np.stack([np.linspace(lo, hi, 7, dtype=np.float32)
                  for lo, hi in [(0.5, 4), (5, 40), (0.5, 4), (10, 80)]]),
        (B, 4, 7)).copy()
    gt_val = np.stack([
        rng.uniform(0.5, 4, B), rng.uniform(5, 40, B),
        rng.uniform(0.5, 4, B), rng.uniform(10, 80, B)], axis=1).astype(np.float32)
    deg_type = (rng.rand(B, 4) < 0.5).astype(np.float32)
    deg_type[0] = [1, 0, 0, 0]  # ensure at least one valid pair

    want = float(ref_loss.compute_fcrc_loss(
        torch.from_numpy(feats), torch.from_numpy(toks),
        torch.from_numpy(gt_val), torch.from_numpy(centers),
        torch.from_numpy(deg_type)))
    got = float(fcrc_loss(jnp.asarray(feats), jnp.asarray(toks),
                          jnp.asarray(gt_val), jnp.asarray(centers),
                          jnp.asarray(deg_type)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


@requires_reference
def test_reg_and_l1_golden_vs_fork():
    import torch
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import load_ref_module, load_ref_openclip_pkg
    pkg = load_ref_openclip_pkg("daclip")
    tl = load_ref_module("da-clip/src/open_clip/loss.py",
                         f"{pkg.__name__}.loss2", package=pkg.__name__)
    ref_loss = tl.DaClipLoss()

    rng = np.random.RandomState(1)
    B, D = 6, 16
    out_np = {
        "image_features": rng.randn(B, D).astype(np.float32),
        "text_features": rng.randn(B, D).astype(np.float32),
        "gt_image_features": rng.randn(B, D).astype(np.float32),
        "image_degra_features": rng.randn(B, D).astype(np.float32),
        "all_d_type_tokens_features": rng.randn(B, 28, D).astype(np.float32),
        "bin_center_features": rng.rand(B, 4, 7).astype(np.float32) * 4 + 0.5,
        "gt_val": rng.rand(B, 4).astype(np.float32) * 3 + 0.5,
        "deg_type": (rng.rand(B, 4) < 0.5).astype(np.float32),
        "pred": rng.rand(B, 4).astype(np.float32),
        "logit_scale": np.float32(30.0),
    }
    tt = {k: torch.from_numpy(np.asarray(v)) for k, v in out_np.items()}
    want = ref_loss(
        tt["image_features"], tt["text_features"], tt["logit_scale"],
        image_degra_features=tt["image_degra_features"],
        gt_image_features=tt["gt_image_features"],
        deg_type=tt["deg_type"], gt_val=tt["gt_val"],
        all_d_type_tokens_features=tt["all_d_type_tokens_features"],
        bin_center_features=tt["bin_center_features"], pred=tt["pred"],
        output_dict=True)
    got = daclip_loss_fork({k: jnp.asarray(v) for k, v in out_np.items()})
    for key_ref, key_ours in [("contrastive_loss", "contrastive_loss"),
                              ("gt_l1_loss", "gt_l1_loss"),
                              ("reg_ls_loss", "reg_ls_loss"),
                              ("fcrc_loss", "fcrc_loss")]:
        np.testing.assert_allclose(float(got[key_ours]), float(want[key_ref]),
                                   rtol=2e-4, err_msg=key_ref)
