"""Device-mesh construction.

Mesh axes:
  ``data``  — batch-dim data parallelism (per-host sharded loading feeds it),
  ``model`` — tensor parallelism over the vocab dimension (the dominant dim:
              the [B,L,V] softmaxes and the discriminator's V→E embedding
              matmul dominate FLOPs at V≈11k, SURVEY §7 "hard parts").

A spec string like ``data:4,model:2`` (the ``--mesh`` flag) selects the
layout; empty spec = all devices on ``data``.  Device order follows
``jax.devices()``, which on TPU enumerates so that adjacent mesh coordinates
ride ICI neighbors.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def parse_mesh_spec(spec: str, num_devices: int) -> Tuple[Tuple[str, ...], Tuple[int, ...]]:
    """``"data:4,model:2"`` → (('data','model'), (4, 2)).

    One axis may be ``-1`` (inferred).  Empty spec → all devices on 'data'.
    """
    if not spec:
        return ("data",), (num_devices,)
    names: List[str] = []
    sizes: List[int] = []
    for part in spec.split(","):
        name, _, size = part.partition(":")
        names.append(name.strip())
        sizes.append(int(size) if size else -1)
    n_infer = sizes.count(-1)
    if n_infer > 1:
        raise ValueError(f"at most one inferred (-1) axis: {spec!r}")
    if n_infer == 1:
        known = int(np.prod([s for s in sizes if s != -1]))
        if num_devices % known:
            raise ValueError(
                f"mesh {spec!r} does not divide {num_devices} devices")
        sizes[sizes.index(-1)] = num_devices // known
    if int(np.prod(sizes)) != num_devices:
        raise ValueError(
            f"mesh {spec!r} = {int(np.prod(sizes))} devices, have {num_devices}")
    return tuple(names), tuple(sizes)


def make_mesh(spec: str = "", devices: Optional[list] = None) -> Mesh:
    """Build a ``jax.sharding.Mesh`` from a ``--mesh`` spec string."""
    devices = list(devices if devices is not None else jax.devices())
    names, sizes = parse_mesh_spec(spec, len(devices))
    mesh_devices = np.asarray(devices).reshape(sizes)
    return Mesh(mesh_devices, names)


def inference_mesh_setup(config):
    """``--mesh`` for the inference CLIs (evaluate / caption / serve).

    Builds the mesh and gates the Pallas decode path exactly as the
    training instructor does (train/instructor.py): on a data-only mesh
    the decode kernel runs per-shard via ``shard_map``
    (``kernels/decode_sample.set_mesh``); any model/pp/sp axis forces the
    GSPMD-sharded scan implementations instead (the weights-resident
    kernel holds whole vocab/stack blocks).  Returns ``(mesh, config)``
    with ``config.decode_impl`` rewritten when it had to fall back.
    """
    from gan_image_captioning_tpu.kernels import decode_sample as dsk

    mesh = make_mesh(config.mesh)
    other_axes = any(n not in ("data", "model") and s > 1
                     for n, s in mesh.shape.items())
    mp = mesh.shape.get("model", 1)
    if other_axes or (mp > 1 and config.vocab_size
                      and config.vocab_size % mp != 0):
        dsk.set_mesh(None)
        if config.decode_impl == "kernel":
            config = config.replace(decode_impl="decoupled")
    else:
        # data-only → per-shard kernel replication; data×model → the
        # vocab-parallel TP decode (decode_sample._decode_sample_tp)
        dsk.set_mesh(mesh)
    return mesh, config
