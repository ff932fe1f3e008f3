"""Per-device TrainState memory: --zero1 off vs on, flagship geometry.

ZeRO-1 shards the Adam moments (mu/nu of all three optimizer chains) over
the ``data`` axis (parallel/sharding.py).  At the reference sbatch geometry
(V=11008, 2x512 LSTM) the generator carries two full Adam chains (pretrain +
adversarial, mirroring the reference's separate optimizers training.py:24-26),
so the moment trees are ~4x the generator params — the dominant replicated
state.  This harness measures the ACTUAL per-device bytes held by device 0
for every TrainState component (leaf shard bytes via addressable_shards),
zero1 off vs on, on a data:N mesh.

No compile needed — placement alone determines the answer.  Runs on the
virtual 8-device CPU mesh (the sharding layout is identical on real chips):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python benchmarks/zero1_memory.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("_GIC_Z1_CHILD"):
    # re-exec with the virtual-device CPU backend before jax initializes
    env = dict(os.environ, _GIC_Z1_CHILD="1", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    os.execve(sys.executable, [sys.executable] + sys.argv, env)

import jax  # noqa: E402

from gan_image_captioning_tpu.config import Config  # noqa: E402
from gan_image_captioning_tpu.parallel.mesh import make_mesh  # noqa: E402
from gan_image_captioning_tpu.parallel.sharding import (  # noqa: E402
    shard_train_state)
from gan_image_captioning_tpu.train.state import create_train_state  # noqa: E402


def device0_bytes(tree) -> int:
    """Bytes device 0 holds for every array leaf (its addressable shards)."""
    total = 0
    d0 = jax.devices()[0]
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for sh in leaf.addressable_shards:
            if sh.device == d0:
                total += sh.data.nbytes
    return total


def main():
    cfg = Config(vocab_size=11008, gen_embed_dim=512, gen_hidden_dim=512,
                 gen_num_layers=2, max_seq_len=34, disc_embed_dim=64,
                 disc_num_rep=64, conditional_gan=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh("data:8", jax.devices())

    rows = []
    for zero1 in (False, True):
        placed = shard_train_state(state, mesh, zero1=zero1)
        params = (device0_bytes(placed.gen_params)
                  + device0_bytes(placed.disc_params))
        opt = (device0_bytes(placed.pretrain_opt_state)
               + device0_bytes(placed.gen_opt_state)
               + device0_bytes(placed.disc_opt_state))
        rows.append((zero1, params, opt, params + opt))

    mb = 1024 * 1024
    print(f"Flagship geometry V={cfg.vocab_size} H={cfg.gen_hidden_dim} "
          f"x{cfg.gen_num_layers}, mesh data:{mesh.shape['data']}")
    print(f"{'zero1':>6} {'params MB/dev':>14} {'opt-state MB/dev':>17} "
          f"{'total MB/dev':>13}")
    for zero1, params, opt, total in rows:
        print(f"{str(zero1):>6} {params / mb:14.1f} {opt / mb:17.1f} "
              f"{total / mb:13.1f}")
    off, on = rows[0][3], rows[1][3]
    opt_off, opt_on = rows[0][2], rows[1][2]
    print(f"opt-state per device: {opt_off / mb:.1f} -> {opt_on / mb:.1f} MB "
          f"({opt_off / max(opt_on, 1):.2f}x smaller); "
          f"TrainState total {off / mb:.1f} -> {on / mb:.1f} MB "
          f"({(off - on) / mb:.1f} MB freed per device)")


if __name__ == "__main__":
    main()
