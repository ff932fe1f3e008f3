"""Fused conv → ReLU → max-over-time kernel for the RelGAN discriminator.

THE HBM byte sink of the adversarial step (measured, docs/benchmarks.md):
the discriminator's conv banks expand each embedded sequence
``[B, L, E]`` (~0.3 MB) into activation maps ``[B, 300, L', num_rep]``
(~83 MB each, three filter sizes) that are immediately ReLU'd and
max-pooled over time (reference ``discriminator.py:42-45``).  XLA
materializes every map in HBM — forward ×3 passes ×3 banks, plus their
backward residuals and the max-pool scatter — ≈6 GB of the step's ~11 GB.

This kernel never lets the maps leave VMEM: per batch element it computes
each bank's convolution, bias, ReLU and max+argmax over time in one pass,
writing only the pooled features ``[B, R, n]`` per bank and the argmax
indices (for the backward).  The custom VJP rebuilds the (one-hot-sparse)
pooled gradient in VMEM and contracts it directly into ``dW``, ``db``,
``d_emb`` — the activation map never exists in HBM in either direction.

Mosaic notes (learned from lowering failures):
  * no lane-dim concatenation at non-tile offsets → banks are processed
    separately in-kernel (per-bank scalar time bounds, per-bank outputs;
    the feature concat happens outside in jnp-land);
  * buffers stay 3-D ``[L', R, n]`` with the reduction on the LEADING
    (untiled) axis — max/argmax lower to per-step elementwise max, no
    relayouts;
  * argmax = min-index-of-max via iota compare (reduce-argmax is not
    relied on);
  * the [Lp, E] → [Lp, R, eds] lane-split reshape relayouts on TPU, so the
    TPU path is gated to ``eds == 1`` (the flagship and every report
    config: E = num_rep = 64); other shapes fall back to the XLA conv path
    (and are covered in interpret mode by tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def kernel_supported(eds: int) -> bool:
    """TPU Mosaic path requires eds == 1 (see module docstring); interpret
    mode (CPU tests) handles any eds."""
    return _interpret() or eds == 1


def _emb_tap(emb2, j: int, e: int, L: int, R: int, eds: int):
    """[L, R] float32 slice of the (time-padded) embedding at filter tap
    (j, e): ``emb[t + j, r·eds + e]`` for t in [0, L)."""
    sl = emb2[j:j + L, :]
    if eds == 1:
        return sl.astype(jnp.float32)
    return sl.reshape(L, R, eds)[:, :, e].astype(jnp.float32)


def _fwd_kernel(emb_ref, w_ref, b_ref, pooled_ref, idx_ref, *, lv, R, eds,
                f):
    """One bank: conv [L', R, n] in VMEM → +bias → relu → max/argmax over t.

    ``lv`` = L - f + 1 valid time positions.  ``w_ref``: this bank's
    [n, f·eds] weights (sliced outside the kernel — Mosaic rejects
    non-tile-aligned sublane offsets in-kernel).
    """
    n = pooled_ref.shape[2]
    emb2 = emb_ref[0]
    w = w_ref[:]                                            # [n, f·eds]
    conv = jnp.zeros((lv, R, n), jnp.float32)
    for j in range(f):
        for e in range(eds):
            x = _emb_tap(emb2, j, e, lv, R, eds)            # [L', R]
            wc = w[:, j * eds + e].astype(jnp.float32)
            conv = conv + x[:, :, None] * wc[None, None, :]
    b = b_ref[:].astype(jnp.float32)
    z = jnp.maximum(conv + b[None, None, :], 0.0)
    m = jnp.max(z, axis=0)                                  # [R, n]
    t_iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    idx = jnp.min(jnp.where(z == m[None], t_iota, lv), axis=0)
    pooled_ref[0] = m.astype(pooled_ref.dtype)
    idx_ref[0] = idx.astype(jnp.int32)


def _bwd_kernel(emb_ref, w_ref, pooled_ref, idx_ref, dpool_ref,
                demb_ref, dw_ref, db_ref, *, lv, R, eds, f):
    lp = emb_ref.shape[1]
    n = pooled_ref.shape[2]
    emb2 = emb_ref[0]
    # compare in f32 — Mosaic rejects bf16 vector comparisons on this target
    mask = pooled_ref[0].astype(jnp.float32) > 0.0          # [R, n]
    dp = jnp.where(mask, dpool_ref[0].astype(jnp.float32), 0.0)
    # one-hot-sparse conv-output gradient over the FULL padded time range
    # (rows ≥ lv are structurally zero: argmax indices are < lv) — working
    # at length lp lets the tap shift below be a pltpu.roll (Mosaic has no
    # TC lowering for scatter-add / dynamic_update_slice on values).
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (lp, R, n), 0)
    dc = jnp.where(t_iota == idx_ref[0][None], dp[None], 0.0)  # [lp, R, n]

    db_ref[0] = jnp.sum(dc, axis=(0, 1)).astype(db_ref.dtype)[None, :]

    demb_e = [jnp.zeros((lp, R), jnp.float32) for _ in range(eds)]
    dw_rows = []
    for j in range(f):
        for e in range(eds):
            x = _emb_tap(emb2, j, e, lv, R, eds)            # [L', R]
            # dW row (j·eds+e): Σ_{t,r} dc[t,r,:] · x[t,r] → [n]
            dw_rows.append(jnp.sum(dc[:lv] * x[:, :, None], axis=(0, 1)))
            # d_emb[t+j, r, e] += Σ_n dc[t,r,n] · w[n, j·eds+e]; the +j
            # shift is a circular roll — the wrapped tail rows are zero
            # (j ≤ f-1 ≤ lp - lv).
            wc = w_ref[:, j * eds + e].astype(jnp.float32)
            add = jnp.sum(dc * wc[None, None, :], axis=2)    # [lp, R]
            roll = jnp.roll if _interpret() else pltpu.roll
            demb_e[e] = demb_e[e] + roll(add, j, axis=0)
    dw_ref[0] = jnp.stack(dw_rows, axis=0).astype(dw_ref.dtype)  # [f·eds, n]
    if eds == 1:
        demb_ref[0] = demb_e[0].astype(demb_ref.dtype)
    else:
        demb = jnp.stack(demb_e, axis=-1)                    # [lp, R, eds]
        demb_ref[0] = demb.reshape(lp, R * eds).astype(demb_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_relu_maxpool(emb_pad, w_all, b_all, banks, R: int, eds: int):
    """Per-bank pooled discriminator features, concatenated → ``[B, R, F]``.

    Args:
      emb_pad: [B, L + maxf - 1, E] embedded tokens, zero-padded in time
        (the padding taps are never read: each bank only evaluates its
        L - f + 1 valid positions).
      w_all:   [F, maxf·eds] fused bank weights (:func:`fuse_bank_params`).
      b_all:   [F] biases.
      banks:   static tuple of (num_filters, filter_size) per bank.
      R, eds:  static num_rep / emb_dim_single.
    """
    pooled, _ = _forward(emb_pad, w_all, b_all, banks, R, eds)
    return jnp.concatenate(pooled, axis=-1)


def _bank_call(kern_fn, emb_pad, w_bank, extra_inputs, out_shapes, out_specs,
               R, eds, lv, f):
    """pallas_call plumbing for one bank (grid over batch)."""
    b_sz, lp, e_dim = emb_pad.shape
    return pl.pallas_call(
        functools.partial(kern_fn, lv=lv, R=R, eds=eds, f=f),
        grid=(b_sz,),
        in_specs=[
            pl.BlockSpec((1, lp, e_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [spec for _, spec in extra_inputs],
        out_specs=out_specs,
        out_shape=out_shapes,
        # the f32 [L', R, n] working set slightly exceeds the default 16M
        # scoped-vmem budget in the backward — v5e has 128M VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(emb_pad, w_bank, *[arr for arr, _ in extra_inputs])


def _forward(emb_pad, w_all, b_all, banks, R, eds):
    maxf = max(f for _, f in banks)
    b_sz, lp, _ = emb_pad.shape
    L = lp - maxf + 1
    pooled, idxs = [], []
    n_off = 0
    for n, f in banks:
        lv = L - f + 1
        w_k = jax.lax.dynamic_slice_in_dim(w_all, n_off, n, 0)[:, :f * eds]
        b_k = jax.lax.dynamic_slice_in_dim(b_all, n_off, n, 0)
        p, ix = _bank_call(
            _fwd_kernel, emb_pad, w_k,
            extra_inputs=[(b_k, pl.BlockSpec(memory_space=pltpu.VMEM))],
            out_shapes=(
                jax.ShapeDtypeStruct((b_sz, R, n), emb_pad.dtype),
                jax.ShapeDtypeStruct((b_sz, R, n), jnp.int32),
            ),
            out_specs=(
                pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            R=R, eds=eds, lv=lv, f=f)
        pooled.append(p)
        idxs.append(ix)
        n_off += n
    return pooled, idxs


def _vjp_fwd(emb_pad, w_all, b_all, banks, R, eds):
    pooled, idxs = _forward(emb_pad, w_all, b_all, banks, R, eds)
    return jnp.concatenate(pooled, axis=-1), (emb_pad, w_all, pooled, idxs)


def _vjp_bwd(banks, R, eds, res, d_pooled_cat):
    emb_pad, w_all, pooled, idxs = res
    maxf = max(f for _, f in banks)
    b_sz, lp, e_dim = emb_pad.shape
    L = lp - maxf + 1
    f_total = w_all.shape[0]

    demb = jnp.zeros(emb_pad.shape, jnp.float32)
    dw = jnp.zeros((f_total, w_all.shape[1]), jnp.float32)
    db_parts = []
    n_off = 0
    for k, (n, f) in enumerate(banks):
        lv = L - f + 1
        dp_k = jax.lax.dynamic_slice_in_dim(d_pooled_cat, n_off, n, axis=2)
        w_k = jax.lax.dynamic_slice_in_dim(w_all, n_off, n, 0)[:, :f * eds]
        d_emb_k, dw_k, db_k = _bank_call(
            _bwd_kernel, emb_pad, w_k,
            extra_inputs=[
                (pooled[k], pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)),
                (idxs[k], pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)),
                (dp_k, pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            ],
            out_shapes=(
                jax.ShapeDtypeStruct((b_sz, lp, e_dim), emb_pad.dtype),
                jax.ShapeDtypeStruct((b_sz, f * eds, n), jnp.float32),
                jax.ShapeDtypeStruct((b_sz, 1, n), jnp.float32),
            ),
            out_specs=(
                pl.BlockSpec((1, lp, e_dim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f * eds, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            R=R, eds=eds, lv=lv, f=f)
        demb = demb + d_emb_k.astype(demb.dtype)
        # dW rows for this bank: kernel emits [f·eds, n] per batch element
        dw_bank = jnp.sum(dw_k, axis=0)                      # [f·eds, n]
        dw_bank = jnp.pad(dw_bank.T, ((0, 0), (0, (maxf - f) * eds)))
        dw = jax.lax.dynamic_update_slice_in_dim(dw, dw_bank, n_off, axis=0)
        db_parts.append(jnp.sum(db_k, axis=0)[0])
        n_off += n
    db = jnp.concatenate(db_parts).astype(w_all.dtype)
    return demb.astype(emb_pad.dtype), dw.astype(w_all.dtype), db


conv_relu_maxpool.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------------------------ wrappers

def fuse_bank_params(convs, eds: int):
    """Fuse per-bank torch-layout conv params [n, 1, f, eds] into
    ``(w_all [F, maxf·eds], b_all [F], banks)``; shorter filters' missing
    taps are zero-padded (never read: each bank evaluates only its own
    f·eds taps).  Pure jnp — gradients flow back through the pad/concat to
    each bank automatically.
    """
    banks = tuple((int(c["w"].shape[0]), int(c["w"].shape[2]))
                  for c in convs)
    maxf = max(f for _, f in banks)
    ws = []
    for c in convs:
        n, _, f, _ = c["w"].shape
        flat = c["w"].reshape(n, f * eds)
        ws.append(jnp.pad(flat, ((0, 0), (0, (maxf - f) * eds))))
    w_all = jnp.concatenate(ws, axis=0)
    b_all = jnp.concatenate([c["b"] for c in convs])
    return w_all, b_all, banks


def pooled_features(convs, emb, eds: int):
    """``[B, R, F]`` pooled conv features from embedded tokens [B, L, E] —
    the fused twin of the jnp conv/relu/maxpool path in
    ``models/discriminator.py:apply_embedded``."""
    w_all, b_all, banks = fuse_bank_params(convs, eds)
    maxf = max(f for _, f in banks)
    r = emb.shape[-1] // eds
    emb_pad = jnp.pad(emb, ((0, 0), (0, maxf - 1), (0, 0)))
    return conv_relu_maxpool(emb_pad, w_all, b_all, banks, r, eds)
