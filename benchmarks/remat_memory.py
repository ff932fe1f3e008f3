"""GIC_TF_REMAT memory probe: XLA compiled-memory analysis, remat on vs off.

VERDICT-r2-era TPU queue item, made hardware-independent: instead of a live
``jax.profiler.device_memory_profile`` on the chip, compile the
teacher-forced transformer loss+grad (the activation-heavy program remat
targets) and read ``compiled.memory_analysis()`` — XLA's static peak/temp
allocation plan, deterministic and backend-portable.  Reports GPT-2-small
depth (12 x 768, the config-5 stretch geometry) at caption length and at a
long-context length, remat off vs on.

Run: ``python benchmarks/remat_memory.py`` (``GIC_RM_LAYERS/WIDTH/LENS/
BATCH`` to vary).  Prints one JSON line per (length, remat) cell plus a
markdown table.

MEASURED NEGATIVE ON CPU (2026-08-18): XLA-CPU's optimizer folds the
checkpoint recompute back into the forward values — compiled dot count is
IDENTICAL with/without ``jax.checkpoint`` on a minimal 12-block MLP (48 vs
48 dots; only dead tanh recomputes remain) and the temp-buffer plan does
not move (39.5 MB both) even though liveness is modeled (a 40-matmul
forward chain plans 2 buffers).  So this harness can only validate the
remat lever ON TPU, where the backend respects the optimization barriers;
it stays on the TPU work queue (NEXT_STEPS.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYERS = int(os.environ.get("GIC_RM_LAYERS", "12"))
WIDTH = int(os.environ.get("GIC_RM_WIDTH", "768"))
LENS = [int(x) for x in os.environ.get("GIC_RM_LENS", "36,512").split(",")]
BATCH = int(os.environ.get("GIC_RM_BATCH", "8"))
VOCAB = int(os.environ.get("GIC_RM_VOCAB", "1024"))


def analyze(seq_len: int, remat: bool):
    os.environ["GIC_TF_REMAT"] = "1" if remat else "0"
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models.transformer import (
        init_transformer_generator_params, teacher_forced)

    config = Config(
        vocab_size=VOCAB, gen_arch="transformer",
        gen_embed_dim=WIDTH, gen_hidden_dim=WIDTH, gen_num_layers=LAYERS,
        gen_num_heads=12, max_seq_len=seq_len - 2,
    )
    params = init_transformer_generator_params(jax.random.PRNGKey(0), config)
    captions = jnp.zeros((BATCH, seq_len), jnp.int32)
    features = jnp.zeros((BATCH, WIDTH), jnp.float32)

    def loss_fn(params):
        # [B, T+1, V]; output position i predicts captions[:, i]
        logits = teacher_forced(params["decoder"], features, captions, config)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, captions[..., None], axis=-1)
        return nll.mean()

    # GIC_TF_REMAT is read at TRACE time (remat_block_apply), so lowering
    # under the env toggle captures the on/off program exactly.
    compiled = jax.jit(jax.grad(loss_fn)).lower(params).compile()
    ma = compiled.memory_analysis()
    row = {
        "seq_len": seq_len, "remat": remat,
        "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
        "output_mb": round(ma.output_size_in_bytes / 2**20, 1),
        "argument_mb": round(ma.argument_size_in_bytes / 2**20, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = [analyze(n, r) for n in LENS for r in (False, True)]
    print(f"\nGIC_TF_REMAT static memory plan — {LAYERS}x{WIDTH} "
          f"transformer generator, B={BATCH}, V={VOCAB} "
          f"(XLA memory_analysis of the teacher-forced grad program)")
    print("| seq_len | temp MB (off) | temp MB (on) | saving |")
    print("|---|---|---|---|")
    for n in LENS:
        off = next(x for x in rows if x["seq_len"] == n and not x["remat"])
        on = next(x for x in rows if x["seq_len"] == n and x["remat"])
        save = 1 - on["temp_mb"] / max(off["temp_mb"], 1e-9)
        print(f"| {n} | {off['temp_mb']} | {on['temp_mb']} | "
              f"{save * 100:.0f}% |")


if __name__ == "__main__":
    main()
