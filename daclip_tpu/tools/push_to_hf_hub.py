"""Push a trained checkpoint + config to the Hugging Face Hub.

Reference: open_clip/push_to_hf_hub.py (model card, config.json, weights
upload).  This version uploads the orbax/numpy checkpoint produced by this
framework together with the model config JSON; it is gated on
`huggingface_hub` being installed and credentials being configured (no
network egress exists in the build environment, so this tool is exercised
only by its argument/payload assembly in tests).

Usage:
  python -m daclip_tpu.tools.push_to_hf_hub --checkpoint <dir_or_pt> \
      --model daclip_ViT-B-32 --repo-id user/daclip-vit-b-32
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile


def build_payload(checkpoint: str, model_name: str, out_dir: str):
    """Assemble the upload folder: config.json + README card + weights."""
    from daclip_tpu.models import get_model_config

    os.makedirs(out_dir, exist_ok=True)
    cfg = {"model_cfg": get_model_config(model_name), "model_name": model_name}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(f"---\ntags:\n- daclip-tpu\n- image-restoration\n---\n"
                f"# {model_name}\n\nTrained with the daclip_tpu framework "
                f"(JAX/TPU rebuild of DA-CLIP).\n")
    base = os.path.basename(checkpoint.rstrip("/"))
    link = os.path.join(out_dir, base)
    if not os.path.exists(link):
        if os.path.isdir(checkpoint):
            import shutil

            shutil.copytree(checkpoint, link)
        else:
            import shutil

            shutil.copy2(checkpoint, link)
    return out_dir


def push_to_hf_hub(checkpoint: str, model_name: str, repo_id: str,
                   private: bool = False, token=None):
    try:
        from huggingface_hub import HfApi
    except ImportError as e:
        raise ImportError(
            "push_to_hf_hub requires the huggingface_hub package "
            "(`pip install huggingface_hub`)") from e
    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        folder = build_payload(checkpoint, model_name, tmp)
        api.upload_folder(repo_id=repo_id, folder_path=folder)
    return f"https://huggingface.co/{repo_id}"


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", required=True)
    ap.add_argument("--repo-id", required=True)
    ap.add_argument("--private", action="store_true")
    args = ap.parse_args(argv)
    url = push_to_hf_hub(args.checkpoint, args.model, args.repo_id,
                         args.private)
    print(url)


if __name__ == "__main__":
    main()
