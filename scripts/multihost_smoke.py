"""Multi-host smoke worker: one PROCESS of a real jax.distributed cluster.

Validates the multi-host path end-to-end with REAL separate processes
(Gloo collectives over localhost — the same wiring a TPU pod uses over
DCN), not just virtual devices in one process:

  * ``parallel/distributed.py:maybe_initialize`` (coordinator env vars)
  * per-host epoch sharding (``Batcher(host_shard=…)``)
  * global-batch assembly from process-local rows
    (``shard_batch`` → ``jax.make_array_from_process_local_data``)
  * the fused train steps under a cross-process ``data`` mesh
  * process-0-only checkpoint/sidecar writes

Launch one per process (tests/test_multihost.py does; by hand):

    JAX_COORDINATOR_ADDRESS=127.0.0.1:29541 JAX_NUM_PROCESSES=2 \
    JAX_PROCESS_ID=0 python scripts/multihost_smoke.py --out /tmp/p0.json &
    … JAX_PROCESS_ID=1 … --out /tmp/p1.json

Writes a JSON result: per-step MLE losses, a param checksum (replicated —
must be identical across processes), one adversarial step's losses, and
instructor counters from a 1+1-epoch run.
"""

import argparse
import json
import os
import sys

# CPU with 2 virtual devices per process, BEFORE jax import; never dial
# the TPU relay from a smoke worker.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--save-dir", default="")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gan_image_captioning_tpu.parallel.distributed import maybe_initialize

    assert maybe_initialize(), "coordinator env vars must be set"
    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])

    import numpy as np

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.data.loader import Batcher
    from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
    from gan_image_captioning_tpu.parallel.mesh import make_mesh
    from gan_image_captioning_tpu.parallel.sharding import (shard_batch,
                                                            shard_train_state)
    from gan_image_captioning_tpu.train.state import create_train_state
    from gan_image_captioning_tpu.train.steps import (make_adv_step,
                                                      make_mle_step)

    n_dev = jax.device_count()
    pid, nproc = jax.process_index(), jax.process_count()
    ds = SyntheticCaptions("train", num_items=32)
    cfg = Config(vocab_size=ds.vocab_size, gen_embed_dim=12,
                 gen_hidden_dim=16, max_seq_len=9, disc_embed_dim=8,
                 disc_num_rep=4, disc_filter_sizes=(2, 3),
                 disc_num_filters=(6, 6), pre_train_batch_size=8,
                 adv_train_batch_size=8)

    mesh = make_mesh(f"data:{n_dev}", jax.devices())
    state = shard_train_state(create_train_state(cfg, jax.random.PRNGKey(0)),
                              mesh)
    # per-host loader: batch_size = LOCAL rows; the global batch is
    # nproc × local assembled by shard_batch
    loader = Batcher(ds, 8 // nproc, cfg.seq_len, shuffle=True, seed=0,
                     drop_last=True, num_workers=1, host_shard=(pid, nproc))
    mle = make_mle_step(cfg)
    losses = []
    it = iter(loader)
    for _ in range(args.steps):
        batch = shard_batch(next(it), mesh)
        state, m = mle(state, batch)
        losses.append(float(np.asarray(
            jax.device_get(m["gen_pretrain_loss"]))))
    w = state.gen_params["decoder"]["linear"]["w"]
    checksum = float(np.abs(np.asarray(jax.device_get(w))).sum())

    adv = make_adv_step(cfg)
    batch = shard_batch(next(it), mesh)
    state, am = adv(state, batch, 2.0)
    adv_g = float(np.asarray(jax.device_get(am["gen_adv_loss"])))
    adv_d = float(np.asarray(jax.device_get(am["disc_adv_loss"])))

    out = {"process": pid, "processes": nproc, "devices": n_dev,
           "mle_losses": losses, "checksum": checksum,
           "adv_g": adv_g, "adv_d": adv_d}

    if args.save_dir:
        # instructor end-to-end under the cross-process mesh: per-host
        # loaders, shared save_dir (process 0 writes, others must not)
        from gan_image_captioning_tpu.train.instructor import GANInstructor

        icfg = Config(vocab_size=ds.vocab_size, gen_embed_dim=12,
                      gen_hidden_dim=16, max_seq_len=9, disc_embed_dim=8,
                      disc_num_rep=4, disc_filter_sizes=(2, 3),
                      disc_num_filters=(6, 6),
                      pre_train_batch_size=8 // nproc,
                      pre_eval_batch_size=8 // nproc,
                      adv_train_batch_size=8 // nproc,
                      adv_eval_batch_size=8 // nproc,
                      pretrain_epochs=1, adv_epochs=1, num_workers=1,
                      mesh=f"data:{n_dev}", save_dir=args.save_dir,
                      model_dir=os.path.join(args.save_dir, "models"),
                      log_file=os.path.join(args.save_dir, f"log_p{pid}"))
        val = SyntheticCaptions("val", num_items=16)
        inst = GANInstructor(icfg, ds, val, silent=True)
        inst._run()
        out["instructor"] = {
            "pretrain_steps": inst.pretrain_steps,
            "gen_steps": int(inst.state.gen_steps),
            "ckpt_exists": os.path.isdir(os.path.join(
                icfg.model_dir, "adv_model.ckpt")),
        }

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"p{pid} done", flush=True)


if __name__ == "__main__":
    main()
