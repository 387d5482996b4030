"""ConvNeXt tower math + converter parity vs a torch-functional oracle.

timm itself is not installable here (tests/parity/EGRESS.md), so the oracle is
the ConvNeXt computation written directly in torch.nn.functional — depthwise
7x7 (padding 3, groups=dim), channel-last LayerNorm eps=1e-6, erf GELU, layer
scale, stem 4/4 and downsample 2/2 convs, avg-pool -> head norm -> projection
— i.e. timm's convnext_* with reset_classifier(0) wrapped by open_clip's
TimmModel head (timm_model.py:85-105).  The weights travel through
utils/torch_convert.convert_convnext_visual, so this is a parity test of the
flax module AND the converter key schema at once.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from daclip_tpu.models.convnext import VARIANTS, ConvNeXtTower  # noqa: E402
from daclip_tpu.utils.torch_convert import convert_convnext_visual  # noqa: E402

DEPTHS, DIMS = (2, 2), (16, 32)  # tiny 2-stage net: all structural elements
EMBED = 24


def make_state_dict(rng, proj="linear", mlp_schema="mlp.fc"):
    sd = {}
    r = lambda *s: (rng.standard_normal(s) * 0.2).astype(np.float32)
    t = "visual.trunk"
    sd[f"{t}.stem.0.weight"] = r(DIMS[0], 3, 4, 4)
    sd[f"{t}.stem.0.bias"] = r(DIMS[0])
    sd[f"{t}.stem.1.weight"] = 1 + r(DIMS[0]) * 0.1
    sd[f"{t}.stem.1.bias"] = r(DIMS[0])
    for si, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if si > 0:
            sd[f"{t}.stages.{si}.downsample.0.weight"] = 1 + r(DIMS[si - 1]) * 0.1
            sd[f"{t}.stages.{si}.downsample.0.bias"] = r(DIMS[si - 1])
            sd[f"{t}.stages.{si}.downsample.1.weight"] = r(dim, DIMS[si - 1], 2, 2)
            sd[f"{t}.stages.{si}.downsample.1.bias"] = r(dim)
        for bj in range(depth):
            b = f"{t}.stages.{si}.blocks.{bj}"
            sd[f"{b}.conv_dw.weight"] = r(dim, 1, 7, 7)
            sd[f"{b}.conv_dw.bias"] = r(dim)
            sd[f"{b}.norm.weight"] = 1 + r(dim) * 0.1
            sd[f"{b}.norm.bias"] = r(dim)
            f1, f2 = (f"{b}.mlp.fc1", f"{b}.mlp.fc2") \
                if mlp_schema == "mlp.fc" else (f"{b}.pwconv1", f"{b}.pwconv2")
            sd[f"{f1}.weight"] = r(4 * dim, dim)
            sd[f"{f1}.bias"] = r(4 * dim)
            sd[f"{f2}.weight"] = r(dim, 4 * dim)
            sd[f"{f2}.bias"] = r(dim)
            sd[f"{b}.gamma"] = np.abs(r(dim)) + 0.5  # large: exercises the path
    sd[f"{t}.head.norm.weight"] = 1 + r(DIMS[-1]) * 0.1
    sd[f"{t}.head.norm.bias"] = r(DIMS[-1])
    if proj == "linear":
        sd["visual.head.proj.weight"] = r(EMBED, DIMS[-1])
    else:
        sd["visual.head.mlp.fc1.weight"] = r(2 * EMBED, DIMS[-1])
        sd["visual.head.mlp.fc1.bias"] = r(2 * EMBED)
        sd["visual.head.mlp.fc2.weight"] = r(EMBED, 2 * EMBED)
    return sd


def torch_oracle(sd, x_nchw, proj="linear"):
    import torch.nn.functional as F
    T = lambda k: torch.from_numpy(sd[k])
    EPS = 1e-6

    def ln_cl(x, key):  # LayerNorm over channels of NCHW input
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, (x.shape[-1],), T(f"{key}.weight"),
                         T(f"{key}.bias"), eps=EPS)
        return x.permute(0, 3, 1, 2)

    t = "visual.trunk"
    x = F.conv2d(x_nchw, T(f"{t}.stem.0.weight"), T(f"{t}.stem.0.bias"),
                 stride=4)
    x = ln_cl(x, f"{t}.stem.1")
    for si, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if si > 0:
            x = ln_cl(x, f"{t}.stages.{si}.downsample.0")
            x = F.conv2d(x, T(f"{t}.stages.{si}.downsample.1.weight"),
                         T(f"{t}.stages.{si}.downsample.1.bias"), stride=2)
        for bj in range(depth):
            b = f"{t}.stages.{si}.blocks.{bj}"
            s = x
            x = F.conv2d(x, T(f"{b}.conv_dw.weight"), T(f"{b}.conv_dw.bias"),
                         padding=3, groups=dim)
            x = x.permute(0, 2, 3, 1)
            x = F.layer_norm(x, (dim,), T(f"{b}.norm.weight"),
                             T(f"{b}.norm.bias"), eps=EPS)
            f1 = f"{b}.mlp.fc1" if f"{b}.mlp.fc1.weight" in sd else f"{b}.pwconv1"
            f2 = f"{b}.mlp.fc2" if f"{b}.mlp.fc2.weight" in sd else f"{b}.pwconv2"
            x = F.linear(x, T(f"{f1}.weight"), T(f"{f1}.bias"))
            x = F.gelu(x)  # erf
            x = F.linear(x, T(f"{f2}.weight"), T(f"{f2}.bias"))
            x = x * T(f"{b}.gamma")
            x = s + x.permute(0, 3, 1, 2)
    x = x.mean((2, 3))
    x = F.layer_norm(x, (DIMS[-1],), T(f"{t}.head.norm.weight"),
                     T(f"{t}.head.norm.bias"), eps=EPS)
    if proj == "linear":
        return F.linear(x, torch.from_numpy(sd["visual.head.proj.weight"]))
    x = F.linear(x, T("visual.head.mlp.fc1.weight"),
                 T("visual.head.mlp.fc1.bias"))
    x = F.gelu(x)
    return F.linear(x, torch.from_numpy(sd["visual.head.mlp.fc2.weight"]))


@pytest.fixture()
def tiny_variant():
    VARIANTS["convnext_parity_tiny"] = (DEPTHS, DIMS)
    yield "convnext_parity_tiny"
    del VARIANTS["convnext_parity_tiny"]


@pytest.mark.regression_test
@pytest.mark.parametrize("proj,schema", [("linear", "mlp.fc"),
                                         ("mlp", "mlp.fc"),
                                         ("linear", "pwconv")])
def test_convnext_tower_matches_torch_oracle(tiny_variant, proj, schema):
    rng = np.random.default_rng(0)
    sd = make_state_dict(rng, proj=proj, mlp_schema=schema)
    params = convert_convnext_visual(sd)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

    want = torch_oracle(sd, torch.from_numpy(x), proj=proj).numpy()
    tower = ConvNeXtTower(model_name=tiny_variant, embed_dim=EMBED, proj=proj)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
