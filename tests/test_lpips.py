"""LPIPS math oracle: the jax implementation vs a torch replica of the lpips
package's computation (lpips/lpips.py forward: scaling layer → 5 AlexNet
feature taps → channel-unit-normalize → 1x1 linear heads → spatial mean →
sum), with RANDOM weights shared through the .npz converter layout — the
alex weights themselves are not vendorable (tests/parity/EGRESS.md), but this
pins every operation and the conv{i}_w/b / lin{i}_w HWIO transposes that
convert_lpips_torch produces."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

_ALEX = [(3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
         (384, 256, 3, 1, 1), (256, 256, 3, 1, 1)]
_POOL_AFTER = {0, 1, 4}


def _random_weights(seed=0):
    g = torch.Generator().manual_seed(seed)
    pt = {}
    for i, (cin, cout, k, _, _) in enumerate(_ALEX):
        pt[f"conv{i}_w"] = torch.randn(cout, cin, k, k, generator=g) * 0.05
        pt[f"conv{i}_b"] = torch.randn(cout, generator=g) * 0.05
        pt[f"lin{i}_w"] = torch.randn(1, cout, 1, 1, generator=g).abs()
    return pt


def _torch_lpips(a, b, pt):
    """lpips.LPIPS(net='alex').forward with the weights above; a,b NCHW."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = (x - shift) / scale
        out = []
        for i, (_, _, k, s, p) in enumerate(_ALEX):
            h = F.relu(F.conv2d(h, pt[f"conv{i}_w"], pt[f"conv{i}_b"],
                                stride=s, padding=p))
            out.append(h)
            if i in _POOL_AFTER:
                h = F.max_pool2d(h, 3, 2)
        return out

    total = 0.0
    for i, (xa, xb) in enumerate(zip(feats(a), feats(b))):
        na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = F.conv2d((na - nb) ** 2, pt[f"lin{i}_w"])
        total = total + d.mean(dim=(1, 2, 3))
    return total


def test_lpips_matches_torch_oracle(tmp_path):
    from daclip_tpu.utils.lpips import LPIPS

    pt = _random_weights()
    # write through the converter's npz layout (convert_lpips_torch parity:
    # conv weights OIHW→HWIO via transpose(2,3,1,0))
    npz = {}
    for i in range(5):
        npz[f"conv{i}_w"] = pt[f"conv{i}_w"].numpy().transpose(2, 3, 1, 0)
        npz[f"conv{i}_b"] = pt[f"conv{i}_b"].numpy()
        npz[f"lin{i}_w"] = pt[f"lin{i}_w"].numpy().transpose(2, 3, 1, 0)
    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **npz)

    model = LPIPS.from_npz(str(path))
    rng = np.random.RandomState(3)
    a = (rng.rand(2, 64, 64, 3) * 2 - 1).astype(np.float32)
    b = np.clip(a + rng.randn(2, 64, 64, 3).astype(np.float32) * 0.2, -1, 1)

    got = model(a, b)
    with torch.no_grad():
        want = _torch_lpips(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                            torch.from_numpy(b.transpose(0, 3, 1, 2)),
                            pt).numpy()
    assert got.shape == (2,)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    # identical inputs → exactly zero distance
    np.testing.assert_allclose(model(a, a), 0.0, atol=1e-9)
