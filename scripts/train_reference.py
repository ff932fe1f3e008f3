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

    # --- torchvision.models.resnet18: a REAL ResNet-18 nn.Module (the
    # standard conv1/bn1/4-stage BasicBlock architecture), with
    # torchvision-compatible state_dict keys and children() order so the
    # reference's ``nn.Sequential(*children[:-1])`` wrap (generator.py:13-14)
    # and our numeric-key converter (models/torch_import.py) both work.  The
    # conditional-GAN parity runs execute this for real; unconditional runs
    # only construct it.
    class _BasicBlock(torch.nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(cout)
            self.relu = torch.nn.ReLU(inplace=True)
            self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = torch.nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = torch.nn.Sequential(
                    torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                    torch.nn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idn)

    class _ResNet18(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = torch.nn.BatchNorm2d(64)
            self.relu = torch.nn.ReLU(inplace=True)
            self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
            widths = (64, 128, 256, 512)
            cin = 64
            for s, cout in enumerate(widths, start=1):
                stride = 1 if s == 1 else 2
                setattr(self, f"layer{s}", torch.nn.Sequential(
                    _BasicBlock(cin, cout, stride), _BasicBlock(cout, cout)))
                cin = cout
            self.avgpool = torch.nn.AdaptiveAvgPool2d((1, 1))
            self.fc = torch.nn.Linear(512, 1000)

    models = types.ModuleType("torchvision.models")
    models.resnet18 = lambda pretrained=False: _ResNet18()

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


def install_adv_patches():
    """Make the reference's ADVERSARIAL path runnable on torch 2.x.

    Two latent issues (SURVEY.md §7 quirk catalogue), patched from outside
    so the reference's own loop code drives everything:

    1. ``optimize(D, retain_graph=True)`` THEN ``optimize(G)``
       (training.py:167-169 + 194-199) only ran on old torch, whose
       optimizers wrote ``p.data`` without bumping version counters;
       torch 2.x rejects the second backward through the just-stepped
       discriminator.  Patch: defer — the D call stashes its loss; the G
       call runs G's backward FIRST (through pre-step D weights — the
       intended semantics; the reference's post-step values were an
       old-torch in-place artifact), then D's ``zero_grad`` + backward
       (the zero_grad clears the dL_g/dD pollution G's backward left in
       D's grads), then clip+step in the reference's D-then-G order.
    2. ``training.py:227`` formats an undefined global ``epoch`` when the
       first best-val adv checkpoint is saved (NameError AFTER the ckpt
       write) — patched by maintaining a module-global ``epoch`` mirroring
       the current adv epoch.
    """
    import training as ref_training  # noqa: E402 (reference module)

    ref_training.epoch = -1  # the :227 log's placeholder (quirk #2)
    pending = []

    def optimize(self, opt, loss, model=None, retain_graph=False):
        ref_training.epoch = getattr(self, "adv_epoch", -1)
        if retain_graph:  # the D call (training.py:167)
            pending.append((opt, loss, model))
            return
        opt.zero_grad()
        loss.backward()
        while pending:
            d_opt, d_loss, d_model = pending.pop()
            d_opt.zero_grad()
            d_loss.backward()
            if d_model is not None:
                torch.nn.utils.clip_grad_norm_(d_model.parameters(),
                                               self.args.clip_norm)
            d_opt.step()
        if model is not None:
            torch.nn.utils.clip_grad_norm_(model.parameters(),
                                           self.args.clip_norm)
        opt.step()

    ref_training.GANInstructor.optimize = optimize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ref_train")
    ap.add_argument("--data-dir", default=os.path.join(REPO, "data", "mini_coco"))
    ap.add_argument("--pretrain-epochs", type=int, default=12)
    ap.add_argument("--adv-epochs", type=int, default=0)
    ap.add_argument("--conditional-gan", type=int, default=0)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--gen-embed-dim", type=int, default=32)
    ap.add_argument("--gen-hidden-dim", type=int, default=64)
    ap.add_argument("--gen-num-layers", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--pretrain-lr", type=float, default=1e-2)
    ap.add_argument("--gen-lr", type=float, default=1e-4)
    ap.add_argument("--disc-lr", type=float, default=1e-4)
    ap.add_argument("--temperature", type=int, default=100)
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
    if args.adv_epochs:
        install_adv_patches()

    save_dir = os.path.join(args.workdir, "save")
    os.makedirs(save_dir, exist_ok=True)
    sys.argv = [
        "main.py",
        "--device", "cpu",
        "--data-dir", data_copy,
        "--save-dir", save_dir,
        "--expt-name", "ref",
        "--conditional-gan", str(args.conditional_gan),
        "--image-size", str(args.image_size),
        "--gen-embed-dim", str(args.gen_embed_dim),
        "--gen-hidden-dim", str(args.gen_hidden_dim),
        "--gen-num-layers", str(args.gen_num_layers),
        "--pretrain-epochs", str(args.pretrain_epochs),
        "--adv-epochs", str(args.adv_epochs),
        "--pretrain-lr", str(args.pretrain_lr),
        "--gen-lr", str(args.gen_lr),
        "--disc-lr", str(args.disc_lr),
        "--temperature", str(args.temperature),
        "--pre-train-batch-size", str(args.batch_size),
        "--pre-eval-batch-size", str(args.batch_size),
        "--adv-train-batch-size", str(args.batch_size),
        "--adv-eval-batch-size", str(args.batch_size),
        "--captions-per-image", "5",
    ]
    runpy.run_path(os.path.join(REF_SRC, "main.py"), run_name="__main__")

    # newest experiment dir's checkpoint(s)
    expts = sorted(os.listdir(save_dir),
                   key=lambda d: os.path.getmtime(os.path.join(save_dir, d)))
    model_dir = os.path.join(save_dir, expts[-1], "models")
    ckpt = os.path.join(model_dir, "pretrained_model.ckpt")
    assert os.path.isfile(ckpt), f"reference training produced no ckpt at {ckpt}"
    print(ckpt)
    if args.adv_epochs:
        adv = os.path.join(model_dir, "adv_model.ckpt")
        assert os.path.isfile(adv), f"no adversarial ckpt at {adv}"
        print(adv)


if __name__ == "__main__":
    main()
