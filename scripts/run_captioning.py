"""Offline Oscar-style caption generation on TPU.

Replaces the reference's Oscar run (oscar/run_captioning.py driven per
README.md:437-466): consumes a VinVL predictions.tsv (features + object
tags, as produced by scripts/extract_vinvl_features.py), greedy-decodes
captions with the Flax OscarCaptioner, and writes the
{image_key: [caption]} JSON LoadOscarCaptionFeatures consumes.

Usage:
  python scripts/run_captioning.py \
      --checkpoint coco_captioning_large_scst/pytorch_model.bin \
      --vocab bert-base-uncased-vocab.txt \
      --predictions test_predictions.tsv --output captions.json \
      [--large] [--batch 16] [--limit N]
"""

import argparse
import base64
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ravqa_tpu.data.extraction import oscar_region_features  # noqa: E402
from ravqa_tpu.models.bert import BertConfig  # noqa: E402
from ravqa_tpu.models.captioner import (CaptionerConfig,  # noqa: E402
                                        OscarCaptioner,
                                        convert_oscar_captioner_params,
                                        decode_captions, greedy_caption,
                                        write_caption_predictions)
from ravqa_tpu.tokenization import WordPieceTokenizer  # noqa: E402


def load_tsv(path, limit=0):
    rows = []
    with open(path) as f:
        for line in f:
            key, pred = line.rstrip("\n").split("\t", 1)
            rows.append((key, json.loads(pred)))
            if limit and len(rows) >= limit:
                break
    return rows


def region_inputs(pred, cfg: CaptionerConfig):
    """One TSV prediction -> (img_feats, img_mask, tag string)."""
    feats, tags = [], []
    for obj in pred.get("objects", [])[:cfg.max_img_seq_len]:
        raw = base64.b64decode(obj["feature"])
        f = np.frombuffer(raw, np.float32)
        if f.size + 6 == cfg.img_feature_dim:      # raw 2048: add geometry
            x1, y1, x2, y2 = obj["rect"]
            w = max(x2, 1e-3)
            h = max(y2, 1e-3)
            f = oscar_region_features(f[None], np.array(
                [[x1, y1, x2, y2]], np.float32), (h, w))[0]
        feats.append(f[:cfg.img_feature_dim])
        tags.append(obj["class"])
    n = len(feats)
    img = np.zeros((cfg.max_img_seq_len, cfg.img_feature_dim), np.float32)
    if n:
        img[:n] = np.stack(feats)
    mask = np.zeros(cfg.max_img_seq_len, np.int32)
    mask[:n] = 1
    return img, mask, " ".join(tags)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--large", action="store_true",
                    help="bert-large geometry (coco_captioning_large_*)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    bert = BertConfig(hidden_size=1024, num_layers=24, num_heads=16,
                      intermediate_size=4096) if args.large else BertConfig()
    cfg = CaptionerConfig(bert=bert)
    sd = torch.load(args.checkpoint, map_location="cpu",
                    weights_only=False)
    sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    params = {"params": convert_oscar_captioner_params(sd, cfg)}
    model = OscarCaptioner(cfg)
    tok = WordPieceTokenizer(args.vocab, lowercase=True)
    decode = jax.jit(lambda p, t, tm, i, im:
                     greedy_caption(model, p, t, tm, i, im))

    rows = load_tsv(args.predictions, args.limit)
    tag_budget = cfg.max_seq_len - cfg.max_seq_a_len
    out = {}
    bs = args.batch
    for start in range(0, len(rows), bs):
        chunk = rows[start:start + bs]
        imgs, img_masks, tag_ids, tag_masks, keys = [], [], [], [], []
        for key, pred in chunk:
            img, imask, tag_str = region_inputs(pred, cfg)
            ids = tok.encode(tag_str)[:tag_budget]
            tids = np.zeros(tag_budget, np.int32)
            tids[:len(ids)] = ids
            tmask = np.zeros(tag_budget, np.int32)
            tmask[:len(ids)] = 1
            imgs.append(img)
            img_masks.append(imask)
            tag_ids.append(tids)
            tag_masks.append(tmask)
            keys.append(key)
        pad = bs - len(chunk)
        if pad:
            imgs += [np.zeros_like(imgs[0])] * pad
            img_masks += [np.zeros_like(img_masks[0])] * pad
            tag_ids += [np.zeros_like(tag_ids[0])] * pad
            tag_masks += [np.zeros_like(tag_masks[0])] * pad
        cap, lengths = decode(params, jnp.asarray(np.stack(tag_ids)),
                              jnp.asarray(np.stack(tag_masks)),
                              jnp.asarray(np.stack(imgs)),
                              jnp.asarray(np.stack(img_masks)))
        captions = decode_captions(
            np.asarray(cap)[:len(chunk)], np.asarray(lengths)[:len(chunk)],
            lambda i: tok.ids_to_tokens.get(i, "[UNK]"))
        out.update(dict(zip(keys, captions)))
        print(f"{min(start + bs, len(rows))}/{len(rows)}", flush=True)
    write_caption_predictions(args.output, out)
    print(f"wrote {len(out)} captions to {args.output}")


if __name__ == "__main__":
    main()
