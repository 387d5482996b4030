"""Caption TSV generator — universal-image-restoration/generate_captions.py parity
(:55-93): per degradation-type folder, caption each GT image and write
`daclip_<mode>.csv` rows (filepath=LQ path, title="{caption}| {degradation}").

The reference uses clip-interrogator's BLIP captioner (offline tooling).  BLIP
isn't available in closed environments, so the captioner is pluggable:
  --captioner constant  (default; "an image" — degradation text still exact)
  --captioner filename  (caption from the cleaned-up file name)
  --captioner blip      (transformers BLIP if its weights are available locally)
"""
from __future__ import annotations

import argparse
import json
import os


def make_captioner(kind: str, blip_path: str = None):
    if kind == "constant":
        return lambda img, path: "an image"
    if kind == "filename":
        def cap(img, path):
            stem = os.path.splitext(os.path.basename(path))[0]
            return stem.split("_", 1)[-1].replace("-", " ").replace("_", " ")
        return cap
    if kind == "blip":  # pragma: no cover (weights not vendorable offline)
        from transformers import BlipForConditionalGeneration, BlipProcessor
        proc = BlipProcessor.from_pretrained(blip_path)
        model = BlipForConditionalGeneration.from_pretrained(blip_path)

        def cap(img, path):
            inputs = proc(img, return_tensors="pt")
            out = model.generate(**inputs, max_new_tokens=30)
            return proc.decode(out[0], skip_special_tokens=True)
        return cap
    raise ValueError(kind)


def generate_captions(dataroot: str, captioner, mode: str = "train",
                      deg_types=None):
    from PIL import Image

    deg_types = deg_types or sorted(
        d for d in os.listdir(dataroot)
        if os.path.isdir(os.path.join(dataroot, d)))
    for deg_type in deg_types:
        base = os.path.join(dataroot, deg_type)
        gt_dir, lq_dir = os.path.join(base, "GT"), os.path.join(base, "LQ")
        prompts_path = os.path.join(base, "degraded_prompts.json")
        if not (os.path.isdir(gt_dir) and os.path.isdir(lq_dir)):
            continue
        prompts = json.load(open(prompts_path)) if os.path.exists(prompts_path) \
            else {}
        rows = []
        for fname in sorted(os.listdir(gt_dir)):
            gt_path = os.path.join(gt_dir, fname)
            lq_path = os.path.join(lq_dir, fname)
            if not os.path.exists(lq_path):
                continue
            image = Image.open(gt_path).convert("RGB")
            caption = captioner(image, gt_path)
            degradation = prompts.get("./" + fname, deg_type)
            rows.append((lq_path, f"{caption}| {degradation}"))
        out_csv = os.path.join(base, f"daclip_{mode}.csv")
        with open(out_csv, "w") as f:
            f.write("filepath\ttitle\n")
            for fp, title in rows:
                f.write(f"{fp}\t{title}\n")
        print(f"{deg_type}: {len(rows)} rows -> {out_csv}")


def merge_training_csv(root_dir: str, output_csv: str, csv_name: str,
                       sep: str = "\t"):
    """merge_training_csv.py parity: concat per-type daclip_*.csv files."""
    import csv

    rows = []
    for deg in sorted(os.listdir(root_dir)):
        path = os.path.join(root_dir, deg, csv_name)
        if not os.path.exists(path):
            continue
        with open(path, newline="") as f:
            for row in csv.DictReader(f, delimiter=sep):
                rows.append((row["filepath"], row["title"]))
    with open(output_csv, "w") as f:
        f.write("filepath\ttitle\n")
        for fp, title in rows:
            f.write(f"{fp}\t{title}\n")
    print(f"merged {len(rows)} rows -> {output_csv}")
    return len(rows)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("captions")
    g.add_argument("--dataroot", required=True)
    g.add_argument("--mode", default="train")
    g.add_argument("--captioner", default="constant",
                   choices=["constant", "filename", "blip"])
    g.add_argument("--blip-path", default=None)
    m = sub.add_parser("merge")
    m.add_argument("--root", required=True)
    m.add_argument("--output", required=True)
    m.add_argument("--csv-name", default="daclip_train.csv")
    args = ap.parse_args(argv)
    if args.cmd == "captions":
        generate_captions(args.dataroot,
                          make_captioner(args.captioner, args.blip_path),
                          args.mode)
    else:
        merge_training_csv(args.root, args.output, args.csv_name)


if __name__ == "__main__":
    main()
