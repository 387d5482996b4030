"""Pretrained-weights registry + cached download.

Reference: universal-image-restoration/open_clip/pretrained.py:227-426 — the
`_PRETRAINED` tag table, sha256-verified URL download and HF-hub fallback.
The table here covers the architectures this framework builds (RN50/101,
ViT-B-32/B-16/L-14) and every tag the reference pipelines actually use
(`openai`, `laion2b_s34b_b79k` for DA-CLIP training per
da-clip/src/single_train.sh:17, `laion2b_s32b_b82k` for wild-ir's ViT-L-14).

Downloaded torch checkpoints are converted with utils/torch_convert on load —
there is no torch dependency at inference time once converted.
"""
from __future__ import annotations

import hashlib
import os
import urllib.request
import warnings
from typing import Dict, Optional


def _pcfg(url: str = "", hf_hub: str = "", mean=None, std=None) -> Dict:
    return {"url": url, "hf_hub": hf_hub, "mean": mean, "std": std}


_OPENAI = "https://openaipublic.azureedge.net/clip/models"
_MLF = "https://github.com/mlfoundations/open_clip/releases/download/v0.2-weights"

_PRETRAINED: Dict[str, Dict[str, Dict]] = {
    "RN50": {
        "openai": _pcfg(f"{_OPENAI}/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt"),
        "yfcc15m": _pcfg(f"{_MLF}/rn50-quickgelu-yfcc15m-455df137.pt"),
        "cc12m": _pcfg(f"{_MLF}/rn50-quickgelu-cc12m-f000538c.pt"),
    },
    "RN101": {
        "openai": _pcfg(f"{_OPENAI}/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt"),
        "yfcc15m": _pcfg(f"{_MLF}/rn101-quickgelu-yfcc15m-3e04b30e.pt"),
    },
    "ViT-B-32": {
        "openai": _pcfg(f"{_OPENAI}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt"),
        "laion400m_e31": _pcfg(f"{_MLF}/vit_b_32-quickgelu-laion400m_e31-d867053b.pt"),
        "laion400m_e32": _pcfg(f"{_MLF}/vit_b_32-quickgelu-laion400m_e32-46683a32.pt"),
        "laion2b_e16": _pcfg(f"{_MLF}/vit_b_32-laion2b_e16-af8dbd0c.pth"),
        "laion2b_s34b_b79k": _pcfg(hf_hub="laion/CLIP-ViT-B-32-laion2B-s34B-b79K/"),
    },
    "ViT-B-16": {
        "openai": _pcfg(f"{_OPENAI}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt"),
        "laion400m_e31": _pcfg(f"{_MLF}/vit_b_16-laion400m_e31-00efa78f.pt"),
        "laion400m_e32": _pcfg(f"{_MLF}/vit_b_16-laion400m_e32-55e67d44.pt"),
    },
    "ViT-L-14": {
        "openai": _pcfg(f"{_OPENAI}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt"),
        "laion400m_e31": _pcfg(f"{_MLF}/vit_l_14-laion400m_e31-69988bb6.pt"),
        "laion400m_e32": _pcfg(f"{_MLF}/vit_l_14-laion400m_e32-3d133497.pt"),
        "laion2b_s32b_b82k": _pcfg(hf_hub="laion/CLIP-ViT-L-14-laion2B-s32B-b82K/",
                                   mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)),
    },
}


def _clean_tag(tag: str) -> str:
    return tag.lower().replace("-", "_")


def list_pretrained(as_str: bool = False):
    return [":".join([k, t]) if as_str else (k, t)
            for k in _PRETRAINED for t in _PRETRAINED[k]]


def list_pretrained_tags_by_model(model: str):
    # daclip_* names resolve tags through the underlying tower
    # (open_clip/factory.py:225-227 strips the prefix before tag lookup)
    model = model.replace("daclip_", "")
    return list(_PRETRAINED.get(model, {}).keys())


def is_pretrained_cfg(model: str, tag: str) -> bool:
    model = model.replace("daclip_", "")
    return _clean_tag(tag) in _PRETRAINED.get(model, {})


def get_pretrained_cfg(model: str, tag: str) -> Dict:
    model = model.replace("daclip_", "")
    return dict(_PRETRAINED.get(model, {}).get(_clean_tag(tag), {}))


def get_pretrained_url(model: str, tag: str) -> str:
    return get_pretrained_cfg(model, tag).get("url", "")


def _expected_sha256(url: str) -> str:
    filename = os.path.basename(url)
    if "openaipublic" in url:
        return url.split("/")[-2]
    if "mlfoundations" in url:
        return os.path.splitext(filename)[0].split("-")[-1]
    return ""


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_pretrained_from_url(url: str,
                                 cache_dir: Optional[str] = None) -> str:
    """sha256-verified cached download (pretrained.py:334-380).  Raises
    URLError in egress-free environments — callers should point `pretrained`
    at a local file instead.  Downloads go to a temp file and are renamed into
    the cache only after (verified) completion, so an interrupted transfer
    never poisons the cache."""
    if not cache_dir:
        cache_dir = os.path.expanduser("~/.cache/clip")
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url)
    expected = _expected_sha256(url)
    target = os.path.join(cache_dir, filename)
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if not expected:
            return target
        if _sha256_file(target).startswith(expected):
            return target
        warnings.warn(f"{target} exists but sha256 mismatches; re-downloading")
    tmp = target + ".part"
    try:
        with urllib.request.urlopen(url) as src, open(tmp, "wb") as out:
            while True:
                buf = src.read(1 << 20)
                if not buf:
                    break
                out.write(buf)
        if expected and not _sha256_file(tmp).startswith(expected):
            raise RuntimeError("downloaded checkpoint fails sha256 verification")
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return target


def download_pretrained(cfg: Dict, cache_dir: Optional[str] = None) -> str:
    """pretrained.py:400-426: URL first, HF-hub fallback."""
    if not cfg:
        return ""
    if cfg.get("url"):
        return download_pretrained_from_url(cfg["url"], cache_dir=cache_dir)
    if cfg.get("hf_hub"):
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:
            raise RuntimeError(
                "HF-hub pretrained tag requested but huggingface_hub is not "
                "installed; download the checkpoint manually and pass its "
                "local path as `pretrained`") from e
        parts = cfg["hf_hub"].rstrip("/").split("/")
        if len(parts) > 2:  # 'org/model/filename.pt' form (pretrained.py:419-424)
            model_id, filename = "/".join(parts[:2]), parts[2]
        else:
            model_id, filename = "/".join(parts), "open_clip_pytorch_model.bin"
        return hf_hub_download(model_id, filename, cache_dir=cache_dir)
    return ""
