"""Context-parallel attention: ring (blockwise) and Ulysses (all-to-all).

The reference caps sequences at 34 tokens and has no attention at all in its
committed code (SURVEY §5 "long-context": it scales by not having long
sequences).  For the transformer variants the rebuild provides two
sequence-parallel attention modes over a mesh axis (default name ``sp``):

* :func:`ring_attention` — the sequence dim is sharded; K/V blocks rotate
  around the ICI ring via ``ppermute`` while each device accumulates
  flash-style (running max / normalizer), so no device ever holds the full
  sequence.  Communication: (n-1) ppermute steps of the local K/V block.
* :func:`ulysses_attention` — ``all_to_all`` re-shards from
  sequence-sharded/full-heads to head-sharded/full-sequence, runs standard
  attention locally, and all-to-alls back.  Communication: two all-to-alls
  of the activations; needs ``num_heads % axis_size == 0``.

Both support causal masking via global position offsets and are exact
(equivalence tests vs single-device attention on the CPU mesh).  At COCO's
L=34 these are exercised by tests; they exist for the long-context stretch
configs (SURVEY §2.3 CP/Ulysses rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_scores(q, k, scale):
    return jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale


def _ring_body(q, k_blk, v_blk, m, l, acc, q_off, k_off, causal, scale):
    """One flash-accumulation step against a remote K/V block."""
    s = _local_scores(q, k_blk, scale)  # [B, h, Tq, Tk]
    if causal:
        tq, tk = q.shape[1], k_blk.shape[1]
        qpos = q_off + jnp.arange(tq)[:, None]
        kpos = k_off + jnp.arange(tk)[None, :]
        s = jnp.where((kpos <= qpos)[None, None], s, NEG_INF)
    blk_max = jnp.max(s, axis=-1)                        # [B, h, Tq]
    new_m = jnp.maximum(m, blk_max)
    corr = jnp.exp(m - new_m)
    p = jnp.exp(s - new_m[..., None])
    l = l * corr + jnp.sum(p, axis=-1)
    acc = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, v_blk)
    return new_m, l, acc


def ring_attention_local(q, k, v, axis_name: str, causal: bool = False):
    """Per-shard ring attention body (call inside ``shard_map``).

    Args:
      q, k, v: [B, T_local, H, D] — the local sequence shard.
      axis_name: mesh axis the sequence is sharded over.
    Returns [B, T_local, H, D].
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, t_local, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    q_off = idx * t_local

    # pvary: the accumulators differ per shard (they depend on the local q),
    # so mark them device-varying for shard_map's varying-axes tracking.
    m = jax.lax.pvary(jnp.full((b, h, t_local), NEG_INF, jnp.float32),
                      axis_name)
    l = jax.lax.pvary(jnp.zeros((b, h, t_local), jnp.float32), axis_name)
    acc = jax.lax.pvary(jnp.zeros((b, h, t_local, d), jnp.float32), axis_name)

    def body(i, carry):
        k_blk, v_blk, m, l, acc = carry
        src = (idx - i) % n  # whose block we hold at step i
        m, l, acc = _ring_body(q, k_blk.astype(q.dtype), v_blk.astype(q.dtype),
                               m, l, acc, q_off, src * t_local, causal, scale)
        # rotate K/V one hop around the ring (device p → p+1)
        perm = [(p, (p + 1) % n) for p in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return k_blk, v_blk, m, l, acc

    _, _, m, l, acc = jax.lax.fori_loop(0, n, body, (k, v, m, l, acc))
    out = acc / jnp.maximum(l, 1e-30)[..., None]         # [B, h, Tq, D]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ulysses_attention_local(q, k, v, axis_name: str, causal: bool = False):
    """Per-shard Ulysses attention body (call inside ``shard_map``).

    Re-shard [B, T_local, H, D] → [B, T_full, H_local, D] with one
    all-to-all, run exact attention, re-shard back.
    """
    # split heads (axis 2) across devices, concatenate sequence (axis 1)
    q = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1, tiled=True)
    k = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1, tiled=True)
    v = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1, tiled=True)
    t = q.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    s = _local_scores(q, k, scale)
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    # back: split sequence, concatenate heads
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def _sharded_attention(q, k, v, mesh: Mesh, axis_name: str, causal: bool,
                       mode: str):
    body = (ring_attention_local if mode == "ring"
            else ulysses_attention_local)
    fn = jax.shard_map(
        functools.partial(body, axis_name=axis_name, causal=causal),
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None),) * 3,
        out_specs=P(None, axis_name, None, None),
    )
    spec = NamedSharding(mesh, P(None, axis_name, None, None))
    return fn(jax.device_put(q, spec), jax.device_put(k, spec),
              jax.device_put(v, spec))


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "sp",
                   causal: bool = False):
    """Driver: shard [B, T, H, D] over ``axis_name`` and run ring attention."""
    return _sharded_attention(q, k, v, mesh, axis_name, causal, "ring")


def ulysses_attention(q, k, v, mesh: Mesh, axis_name: str = "sp",
                      causal: bool = False):
    """Driver: shard [B, T, H, D] over ``axis_name`` and run Ulysses."""
    return _sharded_attention(q, k, v, mesh, axis_name, causal, "ulysses")


def reference_attention(q, k, v, causal: bool = False):
    """Single-device exact attention (the equivalence oracle)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    s = _local_scores(q, k, scale)
    if causal:
        t = q.shape[1]
        s = jnp.where(jnp.tril(jnp.ones((t, t), bool))[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
