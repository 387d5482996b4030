"""Helpers to import individual files from the read-only upstream reference for
golden-value parity tests.  The reference is PUBLIC UNTRUSTED CODE used only as a
test oracle; it is never imported by the framework itself.

Missing heavyweight deps (torchvision, timm, ftfy) are stubbed so that the few
modules we need import cleanly on the test host.
"""
import importlib.machinery
import importlib.util
import pathlib
import sys
import types

REFERENCE = pathlib.Path("/root/reference")


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _ensure_stubs():
    import torch

    tv = _stub("torchvision")
    tv.__path__ = []  # mark as package so submodule imports resolve via sys.modules
    tvu = _stub("torchvision.utils", save_image=lambda *a, **k: None)
    tv.utils = tvu
    class _T:  # minimal transform stand-ins (we never call them through the stub)
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class _IM:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    tvt = _stub("torchvision.transforms", Compose=_T, Resize=_T, CenterCrop=_T,
                ToTensor=_T, Normalize=_T, InterpolationMode=_IM,
                RandomResizedCrop=_T)
    tv.transforms = tvt
    ops = _stub("torchvision.ops")
    ops.misc = _stub("torchvision.ops.misc",
                     FrozenBatchNorm2d=torch.nn.BatchNorm2d)
    tv.ops = ops


def load_ref_module(relpath: str, name: str, package: str | None = None):
    """Load a single reference .py file under a private module name."""
    _ensure_stubs()
    path = REFERENCE / relpath
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    if package is not None:
        mod.__package__ = package
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_sde():
    return load_ref_module("universal-image-restoration/utils/sde_utils.py", "ref_sde_utils")


def load_ref_openclip_pkg(which: str = "uir"):
    """Load the reference open_clip transformer/model files as a package 'refclip'.

    which='uir' -> universal-image-restoration/open_clip (original DA-CLIP)
    which='daclip' -> da-clip/src/open_clip (fork with predictor head)
    Only loads utils + transformer + (attempts) model/daclip_model; timm/hf towers
    are stubbed out.
    """
    _ensure_stubs()
    root = {"uir": "universal-image-restoration/open_clip",
            "daclip": "da-clip/src/open_clip"}[which]
    pkgname = f"refclip_{which}"
    if pkgname in sys.modules:
        return sys.modules[pkgname]
    pkg = types.ModuleType(pkgname)
    pkg.__path__ = [str(REFERENCE / root)]
    pkg.__package__ = pkgname
    sys.modules[pkgname] = pkg

    def sub(modname):
        return load_ref_module(f"{root}/{modname}.py", f"{pkgname}.{modname}", package=pkgname)

    utils_mod = sub("utils")
    # modified_resnet.py uses an absolute `from open_clip.utils import ...`
    if "open_clip" not in sys.modules:
        oc = _stub("open_clip")
        oc.__path__ = []
        sys.modules["open_clip.utils"] = utils_mod
        oc.utils = utils_mod
    transformer = sub("transformer")
    pkg.transformer = transformer

    # model.py imports hf_model (needs transformers) and timm_model (needs timm).
    # Stub timm so timm_model imports; it guards `import timm` in a try in upstream
    # open_clip, but here provide a fake module to be safe.
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", Mlp=object, to_2tuple=lambda x: (x, x))
    _stub("timm.layers", Mlp=object, to_2tuple=lambda x: (x, x))
    try:
        sub("hf_configs")
        sub("hf_model")
        sub("timm_model")
        sub("modified_resnet")
        model = sub("model")
        pkg.model = model
        daclip_model = sub("daclip_model")
        pkg.daclip_model = daclip_model
    except Exception as e:  # pragma: no cover
        pkg.model = None
        pkg.model_error = e
    try:
        pkg.coca_model = sub("coca_model")
    except Exception as e:  # pragma: no cover
        pkg.coca_model = None
        pkg.coca_error = e
    return pkg


def load_ref_unet(which: str = "daclip-sde"):
    """Load the reference ConditionalUNet (+ modules) as package 'refunet'."""
    _ensure_stubs()
    root = f"universal-image-restoration/config/{which}/models/modules"
    pkgname = f"refunet_{which.replace('-', '_')}"
    if pkgname in sys.modules:
        return sys.modules[pkgname]
    pkg = types.ModuleType(pkgname)
    pkg.__path__ = [str(REFERENCE / root)]
    pkg.__package__ = pkgname
    sys.modules[pkgname] = pkg

    def sub(modname):
        return load_ref_module(f"{root}/{modname}.py", f"{pkgname}.{modname}", package=pkgname)

    pkg.module_util = sub("module_util")
    pkg.attention = sub("attention")
    pkg.arch = sub("DenoisingUNet_arch")
    return pkg
