"""Train the REFERENCE code itself (torch-CPU) to produce a genuinely
trained ``pretrained_model.ckpt`` for the greedy bit-match harness.

Runs the reference's own ``src/main.py`` (``/root/reference/src``) on the
committed mini-COCO dataset, unconditional mode, MLE pretraining only
(``--adv-epochs 0``: the reference's adversarial optimize(D, retain_graph)
→ optimize(G) pattern, training.py:167-169, relies on old-torch ``.data``
optimizer writes and raises on torch 2.x; pretraining is one clean
backward, training.py:88, and its best-val checkpoint
``pretrained_model.ckpt``, training.py:116-119, is exactly what the
bit-match consumes).

The environment lacks three of the reference's imports; each is stubbed
with faithful semantics where the reference actually executes it:
  * torchvision.transforms (tasks.py:92-100) — Resize(bilinear)/ToTensor/
    Lambda/Normalize/Compose reimplemented over PIL/torch (REAL work: the
    data pipeline runs these per image);
  * torchvision.models.resnet18 (generator.py:12) — constructed but NEVER
    executed in unconditional mode (training.py:66-68 uses the <S>-token
    embedding); a fc-only stub keeps state_dict keys the converter ignores;
  * torchtext.data.metrics.bleu_score / scipy.misc.imread+imresize —
    imported, never called (training.py:13, tasks.py:9; all uses are
    commented out).

Usage:
    python scripts/train_reference.py --workdir /tmp/ref_train \
        [--pretrain-epochs 12] [--gen-embed-dim 32] ...
Prints the final checkpoint path on stdout.
"""

import argparse
import os
import runpy
import shutil
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"


def install_stubs():
    from PIL import Image

    # --- torchvision (transforms used for real; models never executed) ---
    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        # tasks.py:94 — interpolation=2 is PIL BILINEAR
        def __init__(self, size, interpolation=2):
            self.size = size

        def __call__(self, img):
            return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            a = np.asarray(img, dtype=np.float32) / 255.0
            if a.ndim == 2:
                a = a[:, :, None]
            return torch.from_numpy(a.transpose(2, 0, 1).copy())

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean) / self.std

    transforms = types.ModuleType("torchvision.transforms")
    transforms.Compose, transforms.Resize = Compose, Resize
    transforms.ToTensor, transforms.Lambda = ToTensor, Lambda
    transforms.Normalize = Normalize

    class _StubResNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.stub = torch.nn.Identity()
            self.fc = torch.nn.Linear(512, 1000)  # resnet18 fc.in_features

    models = types.ModuleType("torchvision.models")
    models.resnet18 = lambda pretrained=False: _StubResNet()

    tv = types.ModuleType("torchvision")
    tv.transforms, tv.models = transforms, models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.models"] = models

    # --- torchtext.data.metrics.bleu_score: imported, never called ---
    metrics = types.ModuleType("torchtext.data.metrics")
    metrics.bleu_score = lambda *a, **k: 0.0
    data_mod = types.ModuleType("torchtext.data")
    data_mod.metrics = metrics
    tt = types.ModuleType("torchtext")
    tt.data = data_mod
    sys.modules["torchtext"] = tt
    sys.modules["torchtext.data"] = data_mod
    sys.modules["torchtext.data.metrics"] = metrics

    # --- scipy.misc.imread/imresize: dead imports (tasks.py:9) ---
    import scipy.misc as scipy_misc
    if not hasattr(scipy_misc, "imread"):
        scipy_misc.imread = lambda *a, **k: None
        scipy_misc.imresize = lambda *a, **k: None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ref_train")
    ap.add_argument("--data-dir", default=os.path.join(REPO, "data", "mini_coco"))
    ap.add_argument("--pretrain-epochs", type=int, default=12)
    ap.add_argument("--gen-embed-dim", type=int, default=32)
    ap.add_argument("--gen-hidden-dim", type=int, default=64)
    ap.add_argument("--gen-num-layers", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--pretrain-lr", type=float, default=1e-2)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    # the reference caches {split}_{cpi}.pkl inside data_dir (tasks.py:88):
    # give it a private copy so the committed dataset stays clean
    data_copy = os.path.join(args.workdir, "mini_coco")
    if not os.path.isdir(data_copy):
        shutil.copytree(args.data_dir, data_copy)

    install_stubs()
    sys.path.insert(0, REF_SRC)
    os.chdir(args.workdir)

    save_dir = os.path.join(args.workdir, "save")
    os.makedirs(save_dir, exist_ok=True)
    sys.argv = [
        "main.py",
        "--device", "cpu",
        "--data-dir", data_copy,
        "--save-dir", save_dir,
        "--expt-name", "ref",
        "--conditional-gan", "0",
        "--gen-embed-dim", str(args.gen_embed_dim),
        "--gen-hidden-dim", str(args.gen_hidden_dim),
        "--gen-num-layers", str(args.gen_num_layers),
        "--pretrain-epochs", str(args.pretrain_epochs),
        "--adv-epochs", "0",
        "--pretrain-lr", str(args.pretrain_lr),
        "--pre-train-batch-size", str(args.batch_size),
        "--pre-eval-batch-size", str(args.batch_size),
        "--captions-per-image", "5",
    ]
    runpy.run_path(os.path.join(REF_SRC, "main.py"), run_name="__main__")

    # newest experiment dir's checkpoint
    expts = sorted(os.listdir(save_dir),
                   key=lambda d: os.path.getmtime(os.path.join(save_dir, d)))
    ckpt = os.path.join(save_dir, expts[-1], "models", "pretrained_model.ckpt")
    assert os.path.isfile(ckpt), f"reference training produced no ckpt at {ckpt}"
    print(ckpt)


if __name__ == "__main__":
    main()
