"""Offline VinVL object/attribute feature extraction on TPU.

Replaces the reference's scene_graph_benchmark run
(tools/test_sg_net.py + prepare_data_for_okvqa.py, README.md:345-436):
loads the VinVL X152-C4 checkpoint, runs the Flax AttrRCNN over a
directory (or list file) of images, and writes predictions.tsv in the
schema LoadVinVLFeatures consumes.

Usage:
  python scripts/extract_vinvl_features.py \
      --checkpoint vinvl_vg_x152c4.pth \
      --labelmap VG-SGG-dicts-vgoi6-clipped.json \
      --images path/to/coco/val2014 --output test_predictions.tsv \
      [--batch 8] [--canvas 1024 1024] [--limit N]

Image keys are zero-padded COCO ids parsed from filenames
(e.g. COCO_val2014_000000000042.jpg -> 000000000042), matching the
reference's TSV keying (vqa_data_ops.py:78-91).
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ravqa_tpu.data.extraction import (VinVLFeatureExtractor,  # noqa: E402
                                       load_vg_labelmap,
                                       write_predictions_tsv)
from ravqa_tpu.models.detection import (DetectorConfig,  # noqa: E402
                                        convert_vinvl_params)


def image_key(path: str) -> str:
    stem = os.path.splitext(os.path.basename(path))[0]
    m = re.search(r"(\d+)$", stem)
    return m.group(1).zfill(12) if m else stem


def iter_images(images_arg: str):
    if os.path.isdir(images_arg):
        names = sorted(os.listdir(images_arg))
        return [os.path.join(images_arg, n) for n in names
                if n.lower().endswith((".jpg", ".jpeg", ".png"))]
    with open(images_arg) as f:
        return [line.strip() for line in f if line.strip()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--labelmap", required=True)
    ap.add_argument("--images", required=True,
                    help="image directory or a file listing image paths")
    ap.add_argument("--output", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--canvas", type=int, nargs=2, default=(1024, 1024))
    ap.add_argument("--min-size", type=int, default=600)
    ap.add_argument("--max-size", type=int, default=1000)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    import torch
    from PIL import Image

    cfg = DetectorConfig.vinvl_x152c4()
    sd = torch.load(args.checkpoint, map_location="cpu",
                    weights_only=False)
    sd = sd.get("model", sd)
    params = {"params": convert_vinvl_params(sd, cfg)}
    labelmap, attrmap = load_vg_labelmap(args.labelmap)
    ex = VinVLFeatureExtractor(
        cfg, params, labelmap, attrmap, canvas_hw=tuple(args.canvas),
        batch_size=args.batch, min_size=args.min_size,
        max_size=args.max_size)

    paths = iter_images(args.images)
    if args.limit:
        paths = paths[:args.limit]
    keys, preds = [], []
    for start in range(0, len(paths), args.batch):
        chunk = paths[start:start + args.batch]
        images = [np.asarray(Image.open(p).convert("RGB")) for p in chunk]
        preds.extend(ex.predict(images))
        keys.extend(image_key(p) for p in chunk)
        print(f"{min(start + args.batch, len(paths))}/{len(paths)}",
              flush=True)
    write_predictions_tsv(args.output, keys, preds)
    print(f"wrote {len(keys)} predictions to {args.output}")


if __name__ == "__main__":
    main()
