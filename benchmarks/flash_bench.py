"""Flash-attention A/B: dense vs Pallas-flash transformer grad step.

The long-context lever pair for the config-5 stretch geometry (GPT-2-small
depth, SURVEY §7 step 10): GIC_TF_REMAT buys activation MEMORY (measured
82% temp reduction at L=512 on chip, docs/benchmarks.md); this harness
measures what the flash kernel (kernels/flash_attention.py) buys on top —
it removes the [B, H, T, T] score/probability temporaries from BOTH the
memory plan and the HBM traffic of forward AND backward.

Per cell (flash off/on × remat off/on) at GPT-2 depth and long context:
  * XLA ``memory_analysis`` temp bytes of the compiled grad program;
  * interleaved device timing (house rule: A/B within one process —
    chip/tunnel drift ±8% across hours makes cross-run comparison void).

Run: ``python benchmarks/flash_bench.py``
Env: GIC_FB_LAYERS=12 GIC_FB_WIDTH=768 GIC_FB_HEADS=12 GIC_FB_LEN=512
     GIC_FB_BATCH=8 GIC_FB_VOCAB=1024 GIC_FB_ITERS=10 GIC_FB_REPS=3
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYERS = int(os.environ.get("GIC_FB_LAYERS", "12"))
WIDTH = int(os.environ.get("GIC_FB_WIDTH", "768"))
HEADS = int(os.environ.get("GIC_FB_HEADS", "12"))
LEN = int(os.environ.get("GIC_FB_LEN", "512"))
BATCH = int(os.environ.get("GIC_FB_BATCH", "8"))
VOCAB = int(os.environ.get("GIC_FB_VOCAB", "1024"))
ITERS = int(os.environ.get("GIC_FB_ITERS", "10"))
REPS = int(os.environ.get("GIC_FB_REPS", "3"))


def build(flash: str, remat: str):
    """Compile the teacher-forced grad program under the env toggles
    (both are read at TRACE time)."""
    os.environ["GIC_FLASH_ATTN"] = flash
    os.environ["GIC_TF_REMAT"] = remat
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models.transformer import (
        init_transformer_generator_params, teacher_forced)

    dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    config = Config(
        vocab_size=VOCAB, gen_arch="transformer",
        gen_embed_dim=WIDTH, gen_hidden_dim=WIDTH, gen_num_layers=LAYERS,
        gen_num_heads=HEADS, max_seq_len=LEN - 2, dtype=dtype,
    )
    params = init_transformer_generator_params(jax.random.PRNGKey(0), config)
    if dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    captions = jnp.zeros((BATCH, LEN), jnp.int32)
    features = jnp.zeros((BATCH, WIDTH), params["decoder"]["pos"].dtype)
    lengths = jnp.full((BATCH,), LEN - 5, jnp.int32)  # padding masks ON

    def loss_fn(params):
        logits = teacher_forced(params["decoder"], features, captions,
                                config, lengths=lengths)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, captions[..., None], axis=-1)
        return nll.mean()

    compiled = jax.jit(jax.grad(loss_fn)).lower(params).compile()
    return compiled, params


def main():
    import jax

    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    cells = [("0", "0"), ("1", "0"), ("0", "1"), ("1", "1")]
    built, rows = {}, []
    for flash, remat in cells:
        compiled, params = build(flash, remat)
        ma = compiled.memory_analysis()
        rows.append({
            "flash": flash == "1", "remat": remat == "1",
            "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
        })
        built[(flash, remat)] = (compiled, params)
        print(json.dumps(rows[-1]), flush=True)

    # Interleaved timing: all four cells per rep, REPS reps.
    def run(cell):
        compiled, params = built[cell]
        g = compiled(params)
        jax.block_until_ready(g)

    for cell in cells:                          # warm (first-call overhead)
        run(cell)
    times = {c: [] for c in cells}
    for _ in range(REPS):
        for cell in cells:
            t0 = time.perf_counter()
            for _ in range(ITERS):
                run(cell)
            times[cell].append((time.perf_counter() - t0) / ITERS * 1e3)
    print(f"\nflash×remat A/B — {LAYERS}x{WIDTH}/{HEADS}H transformer "
          f"grad, B={BATCH}, T={LEN}+1, V={VOCAB}, best-of-{REPS} "
          f"({jax.default_backend()})")
    print("| flash | remat | temp MB | ms/step (best) |")
    print("|---|---|---|---|")
    for (flash, remat), r in zip(cells, rows):
        print(f"| {flash} | {remat} | {r['temp_mb']} | "
              f"{min(times[(flash, remat)]):.2f} |")


if __name__ == "__main__":
    main()
