"""Generate the committed mini-COCO-format dataset (data/mini_coco/).

Real JPEGs + a Karpathy-format ``dataset_coco.json`` laid out exactly like
MS-COCO as both frameworks expect it (reference ``tasks.py:26-28,60,120``:
``{data_dir}/dataset_coco.json``, images at ``{data_dir}/{filepath}/
{filename}``, rows filtered by ``split in filepath``, sentences as dicts
with ``tokens``), so quality-parity runs (scripts/parity_mini_coco.py) work
the moment either framework points ``--data-dir`` here — and the same
command works unchanged on the real COCO when it is on disk.

Content: the synthetic color/object grammar (data/synthetic.py) rendered to
actual JPEG files — background tinted by the caption's color word, a
distinct glyph per object word — so conditional models have learnable
signal.  Deterministic (seed 1008).

Run:  python scripts/make_mini_coco.py  [--out data/mini_coco]
"""

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image, ImageDraw

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.data.synthetic import (  # noqa: E402
    _COLOR_RGB, _COLORS, _OBJECTS, _PLACES, _VERBS)

IMAGE_SIZE = 96
N_TRAIN, N_VAL, N_TEST = 48, 16, 8
SENT_PER_IMAGE = 5


def _draw_object(draw: ImageDraw.ImageDraw, obj: str, cx: int, cy: int,
                 r: int, fill):
    """One distinct glyph per object word so 'what is in the image' is
    learnable from pixels."""
    box = (cx - r, cy - r, cx + r, cy + r)
    if obj == "cat":
        draw.ellipse(box, fill=fill)
        draw.polygon([(cx - r, cy - r), (cx - r // 3, cy - r),
                      (cx - r, cy - r // 3)], fill=fill)  # ear
        draw.polygon([(cx + r, cy - r), (cx + r // 3, cy - r),
                      (cx + r, cy - r // 3)], fill=fill)
    elif obj == "dog":
        draw.rectangle(box, fill=fill)
        draw.ellipse((cx - r, cy - r // 2, cx - r // 2, cy + r // 2), fill=fill)
    elif obj == "ball":
        draw.ellipse(box, fill=fill)
    elif obj == "car":
        draw.rectangle((cx - r, cy - r // 2, cx + r, cy + r // 2), fill=fill)
        draw.ellipse((cx - r // 2, cy, cx, cy + r // 2), fill=(20, 20, 20))
        draw.ellipse((cx, cy, cx + r // 2, cy + r // 2), fill=(20, 20, 20))
    elif obj == "tree":
        draw.rectangle((cx - r // 6, cy, cx + r // 6, cy + r), fill=(90, 60, 20))
        draw.polygon([(cx, cy - r), (cx - r, cy + r // 4), (cx + r, cy + r // 4)],
                     fill=fill)
    elif obj == "house":
        draw.rectangle((cx - r, cy, cx + r, cy + r), fill=fill)
        draw.polygon([(cx, cy - r), (cx - r, cy), (cx + r, cy)], fill=fill)
    elif obj == "bird":
        draw.polygon([(cx - r, cy), (cx, cy - r // 2), (cx + r, cy),
                      (cx, cy + r // 4)], fill=fill)
    else:  # boat
        draw.polygon([(cx - r, cy), (cx + r, cy), (cx + r // 2, cy + r // 2),
                      (cx - r // 2, cy + r // 2)], fill=fill)
        draw.rectangle((cx - r // 8, cy - r, cx + r // 8, cy), fill=fill)


def _render(rng, color: str, obj: str) -> Image.Image:
    s = IMAGE_SIZE
    r_, g_, b_ = (int(c * 180) for c in _COLOR_RGB[color])
    base = rng.normal(0.0, 12.0, size=(s, s, 3))
    base += np.array([r_, g_, b_])
    img = Image.fromarray(np.clip(base, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    cx = int(rng.integers(s // 4, 3 * s // 4))
    cy = int(rng.integers(s // 4, 3 * s // 4))
    glyph_fill = (245, 245, 245) if sum((r_, g_, b_)) < 300 else (25, 25, 25)
    _draw_object(draw, obj, cx, cy, s // 6, glyph_fill)
    return img


def _sentences(rng, color: str, obj: str):
    """5 caption variants per image, all mentioning the grounded color+object
    (mirrors COCO's 5 human captions per image)."""
    sents = []
    for _ in range(SENT_PER_IMAGE):
        verb = _VERBS[rng.integers(len(_VERBS))]
        place = _PLACES[rng.integers(len(_PLACES))]
        tokens = ["a", color, obj, verb, "on", "the", place]
        sents.append({"tokens": tokens, "raw": " ".join(tokens)})
    return sents


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "mini_coco"))
    args = ap.parse_args()

    rng = np.random.default_rng(1008)
    rows = []
    imgid = 0
    for split, n, filepath in (("train", N_TRAIN, "train2014"),
                               ("val", N_VAL, "val2014"),
                               ("test", N_TEST, "test2014")):
        os.makedirs(os.path.join(args.out, filepath), exist_ok=True)
        for i in range(n):
            color = _COLORS[rng.integers(len(_COLORS))]
            obj = _OBJECTS[rng.integers(len(_OBJECTS))]
            filename = f"mini_{split}_{i:04d}.jpg"
            _render(rng, color, obj).save(
                os.path.join(args.out, filepath, filename), quality=90)
            rows.append({
                "filepath": filepath, "filename": filename,
                "imgid": imgid, "split": split,
                "sentences": _sentences(rng, color, obj),
            })
            imgid += 1
    with open(os.path.join(args.out, "dataset_coco.json"), "w") as f:
        json.dump({"images": rows, "dataset": "mini_coco"}, f)
    print(f"wrote {imgid} images + dataset_coco.json under {args.out}")


if __name__ == "__main__":
    main()
