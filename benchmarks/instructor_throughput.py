"""In-run instructor throughput: adversarial steps/s THROUGH the training
engine (loader → device feed → fused step → metric collection), not the
bare-step bench.

The gap between ``bench.py`` (~105 steps/s back-to-back fused steps) and
the instructor's in-run rate is host-side: per-batch host→device transfer
latency (on a tunneled chip, a full RTT per batch) and metric fetches.
Round 3 removed the metric syncs (deferred fetches, commit 35e052a:
9.5 → 15.4 steps/s); this harness measures the remaining feed path and
the ``--device-prefetch`` overlap stage (data/loader.py
``device_prefetch``).

Usage:  python benchmarks/instructor_throughput.py
Env:    GIC_PREFETCH   device_prefetch depth (default 2; 0 = sync feed)
        GIC_IT_EPOCHS  timed adversarial sweeps (default 3)
        GIC_IT_ITEMS   synthetic train items (default 6400 → 100 steps/sweep)
        GIC_SPC        --steps-per-call K (default 1): K scanned steps per
                       device program — amortizes the per-dispatch RTT that
                       dominates this measurement on tunneled chips
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gan_image_captioning_tpu.utils.runtime import setup

    setup()
    import jax

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.ops import gumbel as gumbel_ops

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        os.environ.setdefault("GIC_DISC_KERNEL", "3")
        os.environ.setdefault("GIC_BF16_MU", "1")
    gumbel_ops.set_use_pallas(on_tpu)

    prefetch = int(os.environ.get("GIC_PREFETCH", "2"))
    epochs = int(os.environ.get("GIC_IT_EPOCHS", "3"))
    items = int(os.environ.get("GIC_IT_ITEMS", "6400"))
    spc = int(os.environ.get("GIC_SPC", "1"))

    tmp = tempfile.mkdtemp(prefix="gic_itp_")
    config = Config(
        vocab_size=11008,
        gen_embed_dim=512, gen_hidden_dim=512, gen_num_layers=2,
        max_seq_len=34,
        disc_embed_dim=64, disc_num_rep=64,
        disc_filter_sizes=(3, 4, 5), disc_num_filters=(300, 300, 300),
        adv_train_batch_size=64, adv_eval_batch_size=64,
        conditional_gan=0,
        adv_epochs=max(epochs + 1, 2), pretrain_epochs=0,
        dtype="bfloat16" if on_tpu else "float32",
        decode_impl="kernel" if on_tpu else "fused",
        device_prefetch=prefetch,
        steps_per_call=spc,
        precollate=os.environ.get("GIC_IT_PRECOLLATE", "auto"),
        save_dir=tmp, model_dir=os.path.join(tmp, "models"),
        log_file=os.path.join(tmp, "log"),
    )

    train = SyntheticCaptions("train", num_items=items, conditional=False,
                              seed=config.seed)
    val = SyntheticCaptions("val", num_items=64, conditional=False,
                            seed=config.seed)

    from gan_image_captioning_tpu.train.instructor import GANInstructor

    inst = GANInstructor(config, train, val, silent=True)
    steps_per_sweep = len(inst.adv_train_loader)

    inst.adv_loop("train", 0)          # compile + warm the feed path
    t0 = time.perf_counter()
    for e in range(epochs):
        inst.adv_loop("train", min(e + 1, config.adv_epochs - 1))
    dt = time.perf_counter() - t0

    sps = epochs * steps_per_sweep / dt
    print(json.dumps({
        "metric": "instructor_adv_steps_per_sec",
        "value": round(sps, 2),
        "unit": "steps/s",
        "device_prefetch": prefetch,
        "steps_per_call": spc,
        "steps": epochs * steps_per_sweep,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
