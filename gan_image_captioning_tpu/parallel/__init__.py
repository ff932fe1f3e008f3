"""Parallelism layer: device mesh, sharding rules, distributed init.

The reference is strictly single-process single-GPU (SURVEY §2.3: no
torch.distributed/NCCL anywhere; Slurm requests exactly 1 GPU).  This layer
is the rebuild's new first-class scaling path: ``jax.sharding.Mesh`` +
GSPMD-partitioned jitted steps, with XLA inserting the collectives (psum for
DP grad reduction, all-gather/reduce-scatter for the TP vocab dim) over ICI.
"""

from gan_image_captioning_tpu.parallel.mesh import make_mesh, parse_mesh_spec  # noqa: F401
from gan_image_captioning_tpu.parallel.sharding import (  # noqa: F401
    shard_batch, shard_train_state, train_state_shardings,
    generator_param_spec, discriminator_param_spec)
