"""Interleaved A/B: beam-4 decode with sort-based lax.top_k vs the
iterative argmax top-k (eval/decode.py:beam_topk, GIC_BEAM_TOPK).

VERDICT r4 weak #5: beam is the unkernelized/unquantized decode path
(743-1740 cps band).  XLA TopK on TPU lowers to a full variadic sort of
the [B, K·V] candidate row (44k lanes at flagship beam-4) every step —
the iterative variant replaces it with K argmax+mask sweeps.

    python benchmarks/beam_topk_ab.py           # bf16 flagship, B=64
    GIC_BEAM_B=64 GIC_BEAM_K=4 python benchmarks/beam_topk_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("GIC_AB_REPS", "5"))
CALLS = int(os.environ.get("GIC_AB_CALLS", "3"))
B = int(os.environ.get("GIC_BEAM_B", "64"))
K = int(os.environ.get("GIC_BEAM_K", "4"))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    import jax
    import jax.numpy as jnp

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.eval import decode as dec_lib
    from gan_image_captioning_tpu.models import api

    config = Config(
        vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
        gen_num_layers=2, max_seq_len=34, dtype="bfloat16")
    gp = api.init_generator(jax.random.PRNGKey(0), config)
    gp = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, gp)
    if os.environ.get("GIC_BEAM_QUANT") == "1":
        # int8-resident decoder: beam routes the quantized stepper
        # automatically (eval/decode.py:make_stepper)
        from gan_image_captioning_tpu.ops.quantize import quantize_generator

        gp = quantize_generator(gp, config)
        print("[ab] int8-resident decoder (quantized stepper)",
              file=sys.stderr)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 512), jnp.bfloat16)

    progs = {}
    for impl in ("sort", "iter"):
        os.environ["GIC_BEAM_TOPK"] = impl

        @jax.jit
        def prog(f):
            ids, scores = dec_lib.beam_search(gp, f, config, beam_size=K)
            return ids, scores
        t0 = time.perf_counter()
        ids, sc = prog(feats)
        jax.block_until_ready(sc)
        float(jnp.sum(sc))
        print(f"[ab] {impl}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        progs[impl] = prog
    os.environ.pop("GIC_BEAM_TOPK", None)

    # parity check on-device before timing
    i_s, s_s = progs["sort"](feats)
    i_i, s_i = progs["iter"](feats)
    import numpy as np
    ids_match = bool((np.asarray(i_s) == np.asarray(i_i)).all())

    times = {"sort": [], "iter": []}
    for rep in range(REPS):
        for impl in ("sort", "iter"):
            t0 = time.perf_counter()
            out = None
            for _ in range(CALLS):
                out = progs[impl](feats)
            float(jnp.sum(out[1]))
            times[impl].append((time.perf_counter() - t0) / CALLS * 1e3)
        print(f"[ab] rep {rep+1}/{REPS}: sort={times['sort'][-1]:.1f}ms "
              f"iter={times['iter'][-1]:.1f}ms", file=sys.stderr)

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    print(json.dumps({
        "metric": "beam_topk_ab", "B": B, "K": K, "ids_match": ids_match,
        "ms_per_call": {k: round(v, 2) for k, v in med.items()},
        "captions_per_sec": {k: round(B / (v / 1e3), 1)
                             for k, v in med.items()},
        "speedup_pct": round(100.0 * (med["sort"] / med["iter"] - 1.0), 1),
        "reps": {k: [round(x, 2) for x in v] for k, v in times.items()}}))


if __name__ == "__main__":
    main()
