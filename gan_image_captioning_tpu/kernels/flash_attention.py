"""Blocked (flash) multi-head attention kernel for the transformer family.

The transformer blocks (models/transformer.py:attention) materialize the
full ``[B, H, T, T]`` score/probability tensors through softmax — at the
reference's L=34 XLA fuses this for free, but at the config-5 stretch
geometries (GPT-2 depth, L=512+; SURVEY §2.2 transformer variants,
NLP_Report.pdf §3.2.2) those temporaries dominate both HBM traffic and
the activation memory ``GIC_TF_REMAT`` fights (measured on-chip: 2.55 GB
of grad-program temps at L=512, docs/benchmarks.md "rematerialization").

This kernel computes attention with the online-softmax recurrence
(standard flash attention): each (batch·head, query-block) program keeps
a running row-max ``m``, normalizer ``l`` and f32 accumulator in
VMEM/registers while streaming key/value blocks, so the ``[T, T]`` score
matrix never exists in HBM in either direction.  The backward recomputes
probabilities from the saved logsumexp (the flash backward), also as
Pallas kernels — residuals are just (q, k, v, out, lse).

Supported masks — exactly the three the transformer stack uses:
  * full bidirectional (transformer discriminator, `causal=False`);
  * causal (generator MLE pass / AR discriminator, `causal=True`);
  * either of the above AND a per-row key-length mask (`lengths`) — the
    report's "padding attention masks" (teacher_forced key_ok /
    discriminator key_ok), so the real training paths are eligible.

Layouts (chosen so no operand needs a relayout inside the loops): q/k/v
enter as ``[BH, T, D]`` with D = head_dim on lanes; scores/probabilities
are ``[BQ, BK]`` with queries on sublanes; every dot_general contracts
natural dims (lse/delta are carried as ``[*, 1]`` column vectors so the
``exp(s - lse)`` broadcast is along lanes).  f32 accumulation throughout
(``preferred_element_type``), inputs/outputs stay in the caller's dtype.

Off-TPU the same kernels run in interpret mode (tests); model-side
routing lives in models/transformer.py (`GIC_FLASH_ATTN=1`, opt-in).

Measured role (docs/benchmarks.md "flash attention", real v5e): a
MEMORY lever — grad-program temps at 4×768/12H, T=2048+1: dense 2417 MB
→ flash 845 MB (−65%), flash+remat 276 MB (8.7× total) — at a ~15%
per-step time cost vs XLA's fully-fused dense attention, which wins on
speed at every length measured (T≤2k).  Enable it to FIT a geometry
(longer T / bigger B per chip), not to accelerate one that already fits.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # mask fill; finite so a fully-masked block cannot NaN


def _interpret() -> bool:
    return (jax.default_backend() != "tpu"
            or os.environ.get("GIC_KERNEL_INTERPRET") == "1")


def pick_block(t: int) -> int:
    """Kernel block size for a sequence of T rows: 128 (the MXU tile) once
    T reaches it, else the next power of two ≥ T (≥ 8).  The wrapper pads
    T up to a multiple of this, so every T is blockable."""
    if t >= 128:
        return 128
    b = 8
    while b < t:
        b *= 2
    return b


def supported(t: int, d: int) -> bool:
    """Shape eligibility: lane-friendly head_dim (T is handled by padding)."""
    return t >= 1 and d % 8 == 0 and d <= 256


# ------------------------------------------------------------------ forward

def _fwd_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                block: int, nk: int, causal: bool, scale: float):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)                      # [BQ, D]
    length = len_ref[pl.program_id(0)]
    d = q.shape[-1]
    rows = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            + qi * block)

    def body(j, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]
        cols = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
                + j * block)
        mask = cols < length
        if causal:
            mask = mask & (cols <= rows)
        s = jnp.where(mask, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    init = (jnp.zeros((block, d), jnp.float32),
            jnp.full((block, 1), _NEG, jnp.float32),
            jnp.zeros((block, 1), jnp.float32))
    upper = (qi + 1) if causal else nk
    acc, m, l = jax.lax.fori_loop(0, upper, body, init)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)


def _forward(q, k, v, lengths, causal: bool):
    """q/k/v: [BH, T, D]; lengths: [BH] int32.  → (out, lse [BH, T, 1])."""
    bh, t, d = q.shape
    block = pick_block(t)
    nk = t // block
    scale = 1.0 / (d ** 0.5)
    grid = (bh, nk)
    row = lambda i, j: (i, 0, 0)            # full T row of this batch·head
    blk = lambda i, j: (i, j, 0)            # this query block
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block=block, nk=nk, causal=causal,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, 1), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(lengths, q, k, v)
    return out, lse


# ----------------------------------------------------------------- backward

def _dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
               dq_ref, *, block: int, nk: int, causal: bool, scale: float):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                      # [BQ, 1] f32
    dlt = dlt_ref[0]                                      # [BQ, 1] f32
    length = len_ref[pl.program_id(0)]
    rows = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            + qi * block)

    def body(j, dq):
        k_blk = k_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(j * block, block), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        cols = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
                + j * block)
        mask = cols < length
        if causal:
            mask = mask & (cols <= rows)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, BK]
        ds = p * (dp - dlt)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    upper = (qi + 1) if causal else nk
    dq = jax.lax.fori_loop(0, upper, body,
                           jnp.zeros_like(q, jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                dk_ref, dv_ref, *, block: int, nq: int, causal: bool,
                scale: float):
    j = pl.program_id(1)
    k_blk = k_ref[0].astype(jnp.float32)                  # [BK, D]
    v_blk = v_ref[0].astype(jnp.float32)
    length = len_ref[pl.program_id(0)]
    cols = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            + j * block)

    def body(i, carry):
        dk, dv = carry
        q_i = q_ref[0, pl.ds(i * block, block), :].astype(jnp.float32)
        do_i = do_ref[0, pl.ds(i * block, block), :].astype(jnp.float32)
        lse_i = lse_ref[0, pl.ds(i * block, block), :]    # [BQ, 1]
        dlt_i = dlt_ref[0, pl.ds(i * block, block), :]
        s = jax.lax.dot_general(
            q_i, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [BQ, BK]
        rows = (jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
                + i * block)
        mask = cols < length
        if causal:
            mask = mask & (cols <= rows)
        p = jnp.where(mask, jnp.exp(s - lse_i), 0.0)
        dv = dv + jax.lax.dot_general(
            p, do_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BK, D]
        dp = jax.lax.dot_general(
            do_i, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [BQ, BK]
        ds = p * (dp - dlt_i)
        dk = dk + jax.lax.dot_general(
            ds, q_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    d = k_blk.shape[-1]
    init = (jnp.zeros((block, d), jnp.float32),
            jnp.zeros((block, d), jnp.float32))
    lower = j if causal else 0
    dk, dv = jax.lax.fori_loop(lower, nq, body, init)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _backward(q, k, v, out, lse, lengths, g, causal: bool):
    bh, t, d = q.shape
    block = pick_block(t)
    n = t // block
    scale = 1.0 / (d ** 0.5)
    # delta_i = Σ_d dout·out — tiny elementwise reduce, XLA fuses it
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)               # [BH, T, 1]
    row = lambda i, j: (i, 0, 0)
    blk = lambda i, j: (i, j, 0)
    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block=block, nk=n, causal=causal,
                          scale=scale),
        grid=(bh, n),
        in_specs=[
            len_spec,
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        interpret=_interpret(),
    )(lengths, q, k, v, g, lse, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block=block, nq=n, causal=causal,
                          scale=scale),
        grid=(bh, n),
        in_specs=[
            len_spec,
            pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, d), blk, memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((bh, t, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, t, d), v.dtype)),
        interpret=_interpret(),
    )(lengths, q, k, v, g, lse, delta)
    return dq, dk, dv


# --------------------------------------------------------------- public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_bhtd(q, k, v, lengths, causal: bool):
    out, _ = _forward(q, k, v, lengths, causal)
    return out


def _flash_fwd(q, k, v, lengths, causal):
    out, lse = _forward(q, k, v, lengths, causal)
    return out, (q, k, v, out, lse, lengths)


def _flash_bwd(causal, res, g):
    q, k, v, out, lse, lengths = res
    dq, dk, dv = _backward(q, k, v, out, lse, lengths, g, causal)
    return dq, dk, dv, None


_flash_bhtd.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, causal: bool, lengths=None):
    """Blocked attention over ``[B, T, H, D]`` tensors (bqhd layout —
    models/transformer.py:_split_heads).

    Args:
      q, k, v: [B, T, H, D]; self-attention (Tq == Tkv).
      causal: lower-triangular mask when True, full attention when False.
      lengths: optional [B] int32 — per-sequence number of VALID key
        positions (keys at index ≥ lengths[b] are masked for every query
        row, matching the teacher_forced / discriminator ``key_ok``
        semantics).  None = all T keys valid.
    Returns: [B, T, H, D] in the input dtype.
    """
    b, t, h, d = q.shape
    if not supported(t, d):
        raise ValueError(f"flash_attention: unsupported shape T={t} D={d}")
    # Pad T to a block multiple: padded KEYS are masked via the length
    # clamp below; padded QUERY rows compute (valid-key) attention whose
    # output is sliced off, and their zero cotangent keeps them out of
    # dk/dv in the backward.
    block = pick_block(t)
    t_pad = -(-t // block) * block

    # [B, T, H, D] -> [B*H, T_pad, D] (head-major rows so lengths
    # broadcast per-batch with a plain repeat)
    def to_rows(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    if lengths is None:
        lens = jnp.full((b * h,), t, jnp.int32)
    else:
        lens = jnp.repeat(jnp.minimum(lengths.astype(jnp.int32), t), h)
    out = _flash_bhtd(to_rows(q), to_rows(k), to_rows(v), lens, causal)
    return jnp.transpose(out[:, :t].reshape(b, h, t, d), (0, 2, 1, 3))


def attention_reference(q, k, v, causal: bool, lengths=None):
    """Dense jnp twin (the oracle for parity tests)."""
    b, t, h, d = q.shape
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d * 1.0)
    mask = jnp.ones((1, 1, t, t), bool)
    if causal:
        mask = mask & jnp.tril(jnp.ones((t, t), bool))[None, None]
    if lengths is not None:
        key_ok = jnp.arange(t)[None, :] < lengths[:, None]
        mask = mask & key_ok[:, None, None, :]
    s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
