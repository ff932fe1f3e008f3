"""Measure the REFERENCE's adversarial step rate (torch-CPU) to ground
``bench.py``'s ``vs_baseline`` denominator.

The reference publishes no throughput numbers (SURVEY §6).  Round 1 used a
bare 10 steps/s P40 estimate; this harness replaces the guess with
measurements of the reference's OWN code (`/root/reference/src`) on this
machine, plus a dispatch-floor probe that grounds the CPU→P40 scaling
argument (docs/benchmarks.md "Reference baseline" section):

1. ``flagship``: the exact adversarial loop body (training.py:144-169 —
   unconditional features, Gumbel decode sample, detach, one-hot, three
   discriminator passes, get_losses, optimize(D, retain_graph=True),
   optimize(G)) on the canonical sbatch geometry (sbatch_script.s:16:
   2-layer LSTM, hidden 512, embed 512, vocab 11008, B=64, L=36, RelGAN
   CNN disc 3×300 filters), timed end to end.
2. ``dispatch_floor``: the same loop body with near-zero-FLOP dimensions —
   what remains is the eager per-op Python/dispatch overhead, which a GPU
   does NOT remove (it adds kernel-launch latency on top).  1/t_floor is
   therefore an optimistic upper bound on the reference's eager step rate
   on ANY accelerator driven by a comparable host CPU.

Run:  python benchmarks/ref_baseline.py  (writes ref_baseline_results.json
next to this file and prints the JSON).

torchvision is absent in this environment; the unconditional-mode timed
path never calls the ResNet (training.py:146-147 uses the <S>-token
embedding), so a minimal stub satisfies the reference's module imports
(generator.py:4,12-15) without touching the measured work.
"""

import json
import os
import sys
import time
import types

import torch

REF_SRC = "/root/reference/src"
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ref_baseline_results.json")


def _stub_torchvision():
    """Satisfy ``import torchvision.models`` (generator.py:4) — the
    unconditional timed path never runs the encoder (training.py:146-147)."""
    if "torchvision" in sys.modules:
        return

    class _StubResNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.stub = torch.nn.Identity()
            self.fc = torch.nn.Linear(512, 1000)  # resnet18 fc.in_features

    models = types.ModuleType("torchvision.models")
    models.resnet18 = lambda pretrained=False: _StubResNet()
    tv = types.ModuleType("torchvision")
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models


def _args(**overrides):
    """Flagship argparse surface as a namespace (sbatch_script.s:16 +
    args.py defaults), device=cpu."""
    ns = types.SimpleNamespace(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, temperature=10,
        gen_init="uniform", disc_init="uniform", padding_idx=0,
        disc_embed_dim=64, disc_num_rep=64,
        disc_num_filters=[300, 300, 300], disc_filter_sizes=[3, 4, 5],
        adv_loss_type="standard", clip_norm=5.0,
        gen_lr=1e-4, disc_lr=1e-4, device=torch.device("cpu"),
        cgan=False, conditional_gan=False,
    )
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def _measure(args, batch_size, warmup, iters):
    """Time the reference adversarial loop body (training.py:144-169 with
    optimize() = training.py:194-199), using the reference's own modules."""
    sys.path.insert(0, REF_SRC)
    _stub_torchvision()
    from discriminator import Discriminator  # noqa: E402 (reference module)
    from generator import Generator          # noqa: E402 (reference module)
    from utils import get_losses             # noqa: E402 (reference module)

    torch.manual_seed(1008)
    gen = Generator(args).to(args.device)
    disc = Discriminator(args).to(args.device)
    gen_opt = torch.optim.Adam(gen.parameters(), lr=args.gen_lr)
    disc_opt = torch.optim.Adam(disc.parameters(), lr=args.disc_lr)

    seq_len = args.max_seq_len + 2  # collate wraps <S>…<E> (tasks.py:155)
    captions = torch.randint(4, args.vocab_size, (batch_size, seq_len))

    def step():
        # training.py:144-169 (unconditional branch :146-147).  The
        # reference's optimize(D, retain_graph=True) THEN optimize(G)
        # (training.py:167-169 + 194-199) only ran on old torch, whose
        # optimizers wrote p.data without bumping version counters;
        # torch 2.x rejects the stale second backward.  Timing-faithful
        # reorder: both backwards, then both clip+step — identical op
        # count and FLOPs.
        features = gen.decoder.embed(
            torch.ones(batch_size, 1, dtype=torch.long).squeeze(1)
            .to(args.device))
        gen_captions, _ = gen.decoder.sample(features,
                                             max_caption_len=seq_len)
        fake_captions = gen_captions.detach()
        real_captions = torch.nn.functional.one_hot(
            captions, args.vocab_size).float()
        d_out_real = disc(real_captions)
        d_out_fake = disc(fake_captions)
        g_out = disc(gen_captions)
        g_loss, d_loss = get_losses(d_out_real, d_out_fake, g_out,
                                    args.adv_loss_type)
        disc_opt.zero_grad()
        d_loss.backward(retain_graph=True)
        gen_opt.zero_grad()
        g_loss.backward()
        torch.nn.utils.clip_grad_norm_(disc.parameters(), args.clip_norm)
        disc_opt.step()
        torch.nn.utils.clip_grad_norm_(gen.parameters(), args.clip_norm)
        gen_opt.step()
        return float(g_loss), float(d_loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return iters / dt


def _measure_decode(args, batch_size, warmup, iters):
    """Time the reference's own decode loop (generator.py:55-81 ``sample``:
    36 sequential LSTM-cell + linear + gumbel-softmax + argmax + embed
    iterations) under ``torch.no_grad()`` — the serving/eval decode path.

    Returns (captions_per_sec, per_call_latencies_ms)."""
    sys.path.insert(0, REF_SRC)
    _stub_torchvision()
    from generator import Generator  # noqa: E402 (reference module)

    torch.manual_seed(1008)
    gen = Generator(args).to(args.device).eval()
    seq_len = args.max_seq_len + 2

    lat = []
    with torch.no_grad():
        features = gen.decoder.embed(
            torch.ones(batch_size, dtype=torch.long).to(args.device))
        for _ in range(warmup):
            gen.decoder.sample(features, max_caption_len=seq_len)
        t_all0 = time.perf_counter()
        for _ in range(iters):
            t0 = time.perf_counter()
            gen.decoder.sample(features, max_caption_len=seq_len)
            lat.append((time.perf_counter() - t0) * 1e3)
        dt = time.perf_counter() - t_all0
    return iters * batch_size / dt, lat


def main():
    threads = torch.get_num_threads()
    # REF_SKIP_TRAIN=1 reuses the committed train-step numbers (≈13 min of
    # torch-CPU to re-measure) and only runs the decode leg fresh.
    prior = None
    if os.environ.get("REF_SKIP_TRAIN") == "1" and os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            prior = json.load(f)
    if prior is not None:
        flagship = prior["ref_cpu_steps_per_sec"]
        floor = prior["ref_dispatch_floor_steps_per_sec"]
    else:
        flagship = _measure(_args(), batch_size=64, warmup=1,
                            iters=int(os.environ.get("REF_ITERS", "5")))
        # near-zero-FLOP geometry: same op COUNT (36-step loop, 3 disc
        # passes, 2 backwards, 2 Adam steps), negligible math → eager
        # dispatch floor.
        floor = _measure(
            _args(vocab_size=64, gen_embed_dim=16, gen_hidden_dim=16,
                  disc_embed_dim=8, disc_num_rep=8,
                  disc_num_filters=[4, 4, 4]),
            batch_size=4, warmup=2, iters=20)
    # --- decode leg (VERDICT r4 missing #2): the reference's greedy/sample
    # decode loop, measured three ways like the train step ---
    dec_iters = int(os.environ.get("REF_DEC_ITERS", "3"))
    dec_cps, _ = _measure_decode(_args(), batch_size=64, warmup=1,
                                 iters=dec_iters)
    _, dec_lat_b1 = _measure_decode(_args(), batch_size=1, warmup=2,
                                    iters=max(5, dec_iters * 3))
    p50_b1 = sorted(dec_lat_b1)[len(dec_lat_b1) // 2]
    # near-zero-FLOP geometry, same 36-iteration loop with the same op
    # count → the eager per-op dispatch floor of the DECODE loop; a GPU
    # adds kernel-launch latency on top of this host overhead, so
    # floor_cps bounds the reference's eager decode on any accelerator
    # driven by a comparable host.
    floor_cps, floor_lat = _measure_decode(
        _args(vocab_size=64, gen_embed_dim=16, gen_hidden_dim=16),
        batch_size=4, warmup=2, iters=20)
    floor_p50 = sorted(floor_lat)[len(floor_lat) // 2]
    result = {
        "ref_cpu_steps_per_sec": round(flagship, 4),
        "ref_dispatch_floor_steps_per_sec": round(floor, 4),
        "torch_threads": threads,
        "cpu_count": os.cpu_count(),
        "geometry": "B=64 L=36 V=11008 lstm2x512 disc3x300 (sbatch_script.s:16)",
        "timed_path": "training.py:144-169 + optimize 194-199, uncond",
        "decode": {
            "ref_cpu_captions_per_sec_b64": round(dec_cps, 2),
            "ref_cpu_p50_ms_b1": round(p50_b1, 2),
            "ref_dispatch_floor_captions_per_sec": round(floor_cps, 2),
            "ref_dispatch_floor_p50_ms": round(floor_p50, 3),
            "timed_path": "generator.py:55-81 sample(), no_grad, "
                          "B=64 throughput + B=1 latency",
        },
    }
    with open(OUT_PATH, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
