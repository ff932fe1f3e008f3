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
``d_emb`` — the activation map never exists in HBM in either direction
(fused adversarial step: 10.9 → 3.3 GB).

Layout discipline (the difference between a win and a loss): every tensor
the tap loop touches lives in the conv map's natural layout — leading
time, sublane ``R``, lane ``n``:

  * the embedding enters as ``[B, Lp, R, eds]`` (a free HBM reshape of
    [B, Lp, E]), so a filter tap is a LEADING-dim slice
    ``emb[j:j+L, :, e:e+1]`` already shaped [L, R, 1] — no per-tap
    lane→sublane relayout (a [Lp, E] 2-D layout puts R on lanes and makes
    every tap a transpose);
  * weights enter transposed ``[f·eds, n]`` so a tap's coefficients are a
    LANE vector broadcast over [L, R, n];
  * reductions: max/argmax over the leading axis, dW/db over
    (leading, sublane) → lane vectors, d_emb over lanes (keepdims) →
    [L, R, 1] — each lands in the layout its consumer needs.

Mosaic constraints encoded here (learned from lowering failures): no
lane concat at non-tile offsets (banks processed separately, per-bank
outputs); comparisons in f32/int32 only; 16 M default scoped-VMEM raised
via CompilerParams.

Two engines (selected by models/discriminator.py via GIC_DISC_KERNEL):
``1`` = Pallas forward + backward (:func:`conv_relu_maxpool`); ``2`` =
HYBRID (:func:`conv_relu_maxpool_hybrid`): XLA's fused conv/relu/max
forward (faster than the VPU tap loop) + this module's Pallas backward
(faster than XLA's cotangent-map backward) — they compose exactly because
the backward's only residuals are the pooled values and argmax indices.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _data_mesh():
    """Shared mesh registry (kernels/decode_sample.py:set_mesh)."""
    from gan_image_captioning_tpu.kernels.decode_sample import (
        _data_mesh as dm)

    return dm()


def kernel_supported(eds: int) -> bool:
    """All shapes supported: the [B, Lp, R, eds] input layout removed the
    eds == 1 restriction of the first formulation."""
    return True


def _fwd_kernel(emb_ref, w_ref, b_ref, pooled_ref, idx_ref, *, lv, R, eds,
                f):
    """One bank: conv → +bias → relu → running max/argmax over t, fully
    register-blocked.

    ``emb_ref``: [1, Lp, R, eds];  ``w_ref``: [f·eds, n] (transposed);
    ``b_ref``: [1, n];  ``lv`` = L - f + 1 valid time positions.

    The time loop is unrolled with ONLY [R, n]-sized live values (one conv
    row + running max + running argmax) — the [L', R, n] map never exists,
    not even in VMEM: a materialized accumulator costs a VMEM
    read-modify-write per tap (~20 GB/step of VMEM traffic at flagship
    shapes, measured slower than the HBM it saved).
    """
    n = pooled_ref.shape[2]
    emb3 = emb_ref[0]                                       # [Lp, R, eds]
    bias = b_ref[0].astype(jnp.float32)[None, :]            # [1, n]
    wcs = [w_ref[j * eds + e, :].astype(jnp.float32)[None, :]
           for j in range(f) for e in range(eds)]           # [1, n] each
    # ReLU output is ≥ 0, so -1 guarantees t=0 wins the first compare; the
    # strictly-greater update keeps the FIRST argmax (torch/jnp tie rule).
    m = jnp.full((R, n), -1.0, jnp.float32)
    idx = jnp.zeros((R, n), jnp.int32)
    for t in range(lv):
        row = bias
        k = 0
        for j in range(f):
            for e in range(eds):
                x = emb3[t + j, :, e:e + 1].astype(jnp.float32)  # [R, 1]
                row = row + x * wcs[k]
                k += 1
        z = jnp.maximum(row, 0.0)
        better = z > m
        m = jnp.where(better, z, m)
        idx = jnp.where(better, t, idx)
    pooled_ref[0] = m.astype(pooled_ref.dtype)
    idx_ref[0] = idx


def _bwd_kernel(emb_ref, w_ref, pooled_ref, idx_ref, dpool_ref,
                demb_ref, dw_ref, db_ref, *, lv, R, eds, f):
    """Register-blocked backward: per time step only the [R, n] one-hot
    gradient row is live; dW accumulates in per-tap [R, n] registers, d_emb
    rows in [R, eds] registers — the [L', R, n] gradient map never exists.
    """
    lp = emb_ref.shape[1]
    n = pooled_ref.shape[2]
    emb3 = emb_ref[0]                                       # [Lp, R, eds]
    # compare in f32 — Mosaic rejects bf16 vector comparisons on this target
    mask = pooled_ref[0].astype(jnp.float32) > 0.0          # [R, n]
    dp = jnp.where(mask, dpool_ref[0].astype(jnp.float32), 0.0)
    idx = idx_ref[0]                                        # [R, n]

    # each (r, n) has exactly one live time row (its argmax), so the bias
    # gradient needs no time loop at all: Σ_t dc[t] == dp.
    db_ref[0] = jnp.sum(dp, axis=0).astype(db_ref.dtype)[None, :]

    wcs = [w_ref[j * eds + e, :].astype(jnp.float32)[None, :]
           for j in range(f) for e in range(eds)]           # [1, n] each
    dw_acc = [jnp.zeros((R, n), jnp.float32) for _ in range(f * eds)]
    demb_rows = [jnp.zeros((R, eds), jnp.float32) for _ in range(lp)]
    for t in range(lv):
        dc_row = jnp.where(idx == t, dp, 0.0)               # [R, n]
        k = 0
        for j in range(f):
            cols = []
            for e in range(eds):
                x = emb3[t + j, :, e:e + 1].astype(jnp.float32)  # [R, 1]
                dw_acc[k] = dw_acc[k] + dc_row * x
                # d_emb[t+j, r, e] += Σ_n dc_row[r, n] · w[j·eds+e, n]
                cols.append(jnp.sum(dc_row * wcs[k], axis=1, keepdims=True))
                k += 1
            add = cols[0] if eds == 1 else jnp.concatenate(cols, axis=1)
            demb_rows[t + j] = demb_rows[t + j] + add
    dw_rows = [jnp.sum(acc, axis=0) for acc in dw_acc]      # [n] each
    dw_ref[0] = jnp.stack(dw_rows, axis=0).astype(dw_ref.dtype)  # [f·eds, n]
    demb = jnp.stack(demb_rows, axis=0)                     # [Lp, R, eds]
    demb_ref[0] = demb.astype(demb_ref.dtype)


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


def _bank_call(kern_fn, emb4, w_t, extra_inputs, out_shapes, out_specs,
               R, eds, lv, f):
    """pallas_call plumbing for one bank (grid over batch).

    Under an installed data mesh (``--mesh data:N``, see
    ``decode_sample.set_mesh``) the call is wrapped in ``shard_map`` over
    the batch grid — every input/output is batch-leading or replicated, so
    each shard runs the identical kernel on its local rows with no
    collectives (the callers' cross-batch reductions, e.g. the dW sums in
    ``_vjp_bwd``, happen OUTSIDE in GSPMD land, which inserts the psum)."""
    b_sz = emb4.shape[0]
    extra_specs = [spec for _, spec in extra_inputs]

    def _invoke(emb4_, w_t_, *extras):
        b_l, lp = emb4_.shape[0], emb4_.shape[1]
        shapes_l = tuple(
            jax.ShapeDtypeStruct((b_l,) + tuple(s.shape[1:]), s.dtype)
            for s in out_shapes)
        return pl.pallas_call(
            functools.partial(kern_fn, lv=lv, R=R, eds=eds, f=f),
            grid=(b_l,),
            in_specs=[
                pl.BlockSpec((1, lp, R, eds), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ] + extra_specs,
            out_specs=out_specs,
            out_shape=shapes_l,
            # the f32 [L', R, n] working set slightly exceeds the default
            # 16M scoped-vmem budget in the backward — v5e has 128M VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=_interpret(),
        )(emb4_, w_t_, *extras)

    arrs = [arr for arr, _ in extra_inputs]
    mesh = _data_mesh()
    if mesh is None or b_sz % mesh.shape["data"]:
        return _invoke(emb4, w_t, *arrs)

    from jax.sharding import PartitionSpec as P

    def _in_spec(a):
        # batch-leading arrays shard; per-bank constants replicate
        if a.ndim and a.shape[0] == b_sz and b_sz > 1:
            return P("data", *([None] * (a.ndim - 1)))
        return P(*([None] * a.ndim))

    in_specs = ((P("data", None, None, None), P(None, None))
                + tuple(_in_spec(a) for a in arrs))
    out_sm = tuple(P("data", *([None] * (len(s.shape) - 1)))
                   for s in out_shapes)
    return jax.shard_map(_invoke, mesh=mesh, in_specs=in_specs,
                         out_specs=out_sm if len(out_sm) > 1 else out_sm[0],
                         check_vma=False)(emb4, w_t, *arrs)


def _as_nat(emb_pad, R, eds):
    """[B, Lp, E] → [B, Lp, R, eds] — a free row-major reshape putting R on
    sublanes / eds on lanes, the conv map's natural layout."""
    b_sz, lp, _ = emb_pad.shape
    return emb_pad.reshape(b_sz, lp, R, eds)


def _forward(emb_pad, w_all, b_all, banks, R, eds):
    maxf = max(f for _, f in banks)
    b_sz, lp, _ = emb_pad.shape
    L = lp - maxf + 1
    emb4 = _as_nat(emb_pad, R, eds)
    pooled, idxs = [], []
    n_off = 0
    for n, f in banks:
        lv = L - f + 1
        w_t = jax.lax.dynamic_slice_in_dim(w_all, n_off, n, 0)[:, :f * eds].T
        b_k = jax.lax.dynamic_slice_in_dim(b_all, n_off, n, 0)[None, :]
        p, ix = _bank_call(
            _fwd_kernel, emb4, w_t,
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
    emb4 = _as_nat(emb_pad, R, eds)

    demb = jnp.zeros((b_sz, lp, R, eds), jnp.float32)
    dw = jnp.zeros((f_total, w_all.shape[1]), jnp.float32)
    db_parts = []
    n_off = 0
    for k, (n, f) in enumerate(banks):
        lv = L - f + 1
        dp_k = jax.lax.dynamic_slice_in_dim(d_pooled_cat, n_off, n, axis=2)
        w_t = jax.lax.dynamic_slice_in_dim(w_all, n_off, n, 0)[:, :f * eds].T
        d_emb_k, dw_k, db_k = _bank_call(
            _bwd_kernel, emb4, w_t,
            extra_inputs=[
                (pooled[k], pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)),
                (idxs[k], pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)),
                (dp_k, pl.BlockSpec((1, R, n), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            ],
            out_shapes=(
                jax.ShapeDtypeStruct((b_sz, lp, R, eds), emb_pad.dtype),
                jax.ShapeDtypeStruct((b_sz, f * eds, n), jnp.float32),
                jax.ShapeDtypeStruct((b_sz, 1, n), jnp.float32),
            ),
            out_specs=(
                pl.BlockSpec((1, lp, R, eds), lambda i: (i, 0, 0, 0),
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
    demb = demb.reshape(b_sz, lp, e_dim)
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


def pooled_features(convs, emb, eds: int, impl: str = "pallas"):
    """``[B, R, F]`` pooled conv features from embedded tokens [B, L, E] —
    the fused twin of the jnp conv/relu/maxpool path in
    ``models/discriminator.py:apply_embedded``.

    ``impl``: 'pallas' = register-blocked Pallas forward + backward;
    'hybrid' = XLA conv forward + Pallas backward; 'mxu' = MXU-matmul
    Pallas forward + backward (engine 3 — see the mxu-engine section).
    """
    w_all, b_all, banks = fuse_bank_params(convs, eds)
    maxf = max(f for _, f in banks)
    r = emb.shape[-1] // eds
    emb_pad = jnp.pad(emb, ((0, 0), (0, maxf - 1), (0, 0)))
    if impl == "mxu":
        # XT columns are batch-major, so a data mesh shard_maps the bank
        # calls per-shard (see _mxu_bank_call); the row-alignment check
        # applies to each shard's local rows.  Anything else (odd per-shard
        # row counts, batch not divisible) falls back to the hybrid engine.
        mesh = _data_mesh()
        shards = 1 if mesh is None else mesh.shape["data"]
        if emb.shape[0] % shards == 0 and _mxu_rows_ok(
                emb.shape[0] // shards, r):
            return conv_relu_maxpool_mxu(emb_pad, w_all, b_all, banks, r,
                                         eds)
        impl = "hybrid"
    fn = conv_relu_maxpool_hybrid if impl == "hybrid" else conv_relu_maxpool
    return fn(emb_pad, w_all, b_all, banks, r, eds)


# ------------------------------------------------------------------- hybrid

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_relu_maxpool_hybrid(emb_pad, w_all, b_all, banks, R: int, eds: int):
    """Best-of-both engines: XLA conv forward + Pallas backward.

    Measured (docs/benchmarks.md): the Pallas FORWARD is ~0.8 ms slower
    than XLA's conv+relu+max (the tap loop is VPU-bound where XLA's conv
    fuses better), but the Pallas BACKWARD is ~2.5 ms faster (no [B, N,
    L', R] cotangent maps in HBM).  The backward kernel's only residuals
    are the pooled values and their argmax indices — which the XLA forward
    produces directly (channels-last conv → max+argmax over time), so the
    two engines compose exactly: ``_vjp_bwd`` is shared verbatim.

    Same contract as :func:`conv_relu_maxpool`.
    """
    pooled, _ = _hybrid_forward(emb_pad, w_all, b_all, banks, R, eds)
    return jnp.concatenate(pooled, axis=-1)


def _hybrid_forward(emb_pad, w_all, b_all, banks, R, eds):
    maxf = max(f for _, f in banks)
    b_sz, lp, _ = emb_pad.shape
    L = lp - maxf + 1
    pooled, idxs = [], []
    n_off = 0
    for n, f in banks:
        w = w_all[n_off:n_off + n, :f * eds]               # [n, f*eds]
        kern = jnp.transpose(w.reshape(n, f, eds), (1, 2, 0))  # [f, eds, n]
        # channels-last conv over the REAL rows only (a tap into the zero
        # time-padding could win the relu'd max): spatial dims (time, E)
        # with stride eds over E → one output column per rep; VALID over
        # L rows gives exactly the kernel's lv = L - f + 1 positions
        src = emb_pad[:, :L, :, None]                      # [B, L, E, 1]
        con = jax.lax.conv_general_dilated(
            src, kern[:, :, None, :],                      # [f, eds, 1, n]
            window_strides=(1, eds), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))    # [B, lv, R, n]
        con = jax.nn.relu(con + b_all[n_off:n_off + n][None, None, None, :])
        pooled.append(jnp.max(con, axis=1))                # [B, R, n]
        idxs.append(jnp.argmax(con, axis=1).astype(jnp.int32))
        n_off += n
    return pooled, idxs


def _hybrid_vjp_fwd(emb_pad, w_all, b_all, banks, R, eds):
    pooled, idxs = _hybrid_forward(emb_pad, w_all, b_all, banks, R, eds)
    return jnp.concatenate(pooled, axis=-1), (emb_pad, w_all, pooled, idxs)


conv_relu_maxpool_hybrid.defvjp(_hybrid_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------- mxu engine

# Engine 3 ("mxu"): the round-3 trace (docs/benchmarks.md r3c5) attributed
# over half the 8.8 ms flagship adv step to the disc conv chain — the hybrid
# engine's XLA forward materializes each bank's [B, lv, R, n] map in HBM
# (~88 MB × 9 bank-passes written by the conv, read back by the
# max/argmax iota_reduce fusions: ~2.2 ms), and the Pallas backward's
# register-blocked tap loop is VPU-bound (9 × ~0.26 ms = 2.33 ms).  This
# engine reformulates BOTH passes as per-timestep MXU matmuls over a
# transposed VMEM-resident layout:
#
#   XT[(t·eds + e), (b·R + r)] = emb_pad[b, t, r·eds + e]        [Lp·eds, Q]
#
# Forward, per valid t (Python-unrolled, lv ≤ 36):
#   z_t = XTᵀ[t·eds : t·eds+f·eds] · W  (MXU, K = f·eds)  → [Q, n]
#   running relu'd max/argmax in VMEM — the [lv, Q, n] map never exists.
# Backward, per t:
#   dc_t = where(idx == t, dp_masked, 0)                          [Q, n]
#   dW  += XT_slice · dc_t               (MXU, K = Q — one matmul, not
#                                         f·eds VPU FMA sweeps)
#   DXS[t] = dc_t · Wᵀ                   (MXU)               [Q, f·eds]
# The tap-overlap scatter of DXS into d_emb (f shifted adds on ~3 MB) and
# db (a masked sum of d_pooled) run outside in XLA where they are trivial.
#
# The tap loops' VPU work drops to one `where` (bwd) / one select pair
# (fwd) per timestep; everything O(f) rides the MXU.

# Row-tile (columns of XT) per grid step.  The bwd kernel's unrolled time
# loop keeps an O(tile·n) f32 cotangent slice live per step — at 4096 the
# Mosaic stack plan exceeded the 96 MB scoped-VMEM limit on v5e (98.03M);
# 1024 bounds the plan to ~1/4 of that with grid=4 at flagship Q=4096.
# GIC_MXU_TILE overrides for A/B (2048 = half the grid steps, double the
# per-matmul K; measured round 5 — see docs/benchmarks.md).
def _mxu_row_tile() -> int:
    # read per-call (trace time), NOT at import: A/Bs set the env between
    # program builds in one process
    return int(os.environ.get("GIC_MXU_TILE", "1024"))


def _mxu_rows_ok(b_sz: int, R: int) -> bool:
    q = b_sz * R
    tile = _mxu_row_tile()
    return q % 8 == 0 and (q <= tile or q % tile == 0)


def _mxu_fwd_kernel(xt_ref, w_ref, b_ref, pooled_ref, idx_ref, *, lv, eds, f):
    n = pooled_ref.shape[1]
    q = pooled_ref.shape[0]
    bias = b_ref[0].astype(jnp.float32)[None, :]            # [1, n]
    w = w_ref[...].astype(jnp.float32)                      # [f·eds, n]
    m = jnp.full((q, n), -1.0, jnp.float32)
    idx = jnp.zeros((q, n), jnp.int32)
    for t in range(lv):
        xs = xt_ref[t * eds:t * eds + f * eds, :].astype(jnp.float32)
        z = jax.lax.dot_general(xs, w, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        z = jnp.maximum(z + bias, 0.0)
        better = z > m
        m = jnp.where(better, z, m)
        idx = jnp.where(better, t, idx)
    pooled_ref[...] = m.astype(pooled_ref.dtype)
    idx_ref[...] = idx


def _mxu_bwd_kernel(xt_ref, w_ref, idx_ref, dpm_ref, dw_ref, dxs_ref, *,
                    lv, eds, f):
    """dW (row-reduced) + per-timestep tap gradients DXS [lv, Q, f·eds]."""
    w = w_ref[...].astype(jnp.float32)                      # [f·eds, n]
    idx = idx_ref[...]
    dpm = dpm_ref[...].astype(jnp.float32)                  # [Q, n] masked
    dw = jnp.zeros(dw_ref.shape, jnp.float32)
    for t in range(lv):
        dc = jnp.where(idx == t, dpm, 0.0)                  # [Q, n]
        xs = xt_ref[t * eds:t * eds + f * eds, :].astype(jnp.float32)
        dw = dw + jax.lax.dot_general(
            xs, dc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [f·eds, n]
        dxs_ref[t] = jax.lax.dot_general(
            dc, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [Q, f·eds]
    dw_ref[...] = dw


def _mxu_bwd_dx_kernel(xt_ref, w_ref, idx_ref, dpm_ref, dw_ref, dx_ref, *,
                       lv, eds, f):
    """dW (row-reduced) + overlap-added input gradient DX in XT layout.

    Instead of emitting the per-timestep tap tensor DXS [lv, Q, f·eds]
    (f× the input's bytes, which XLA then layout-copies and overlap-adds
    outside — the dominant `copy` phase in the flagship trace), the tap
    gradients are accumulated HERE into ``DX[lp·eds, Q]`` — rows
    ``t·eds … t·eds + f·eds`` receive ``w · dcᵀ`` per valid t.  The output
    is the exact transpose layout of XT, so the caller inverts `_as_xt`
    with one small transpose and the f shifted adds disappear."""
    w = w_ref[...].astype(jnp.float32)                      # [f·eds, n]
    idx = idx_ref[...]
    dpm = dpm_ref[...].astype(jnp.float32)                  # [Q, n] masked
    dw = jnp.zeros(dw_ref.shape, jnp.float32)
    dx_ref[...] = jnp.zeros(dx_ref.shape, jnp.float32)
    for t in range(lv):
        dc = jnp.where(idx == t, dpm, 0.0)                  # [Q, n]
        xs = xt_ref[t * eds:t * eds + f * eds, :].astype(jnp.float32)
        dw = dw + jax.lax.dot_general(
            xs, dc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [f·eds, n]
        dxt = jax.lax.dot_general(
            w, dc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [f·eds, Q]
        dx_ref[t * eds:t * eds + f * eds, :] = (
            dx_ref[t * eds:t * eds + f * eds, :] + dxt)
    dw_ref[...] = dw


def _as_xt(emb_pad, R, eds):
    """[B, Lp, E] → XT [Lp·eds, B·R] (time-major/eds-minor rows, b-major
    columns) — one small XLA transpose (~0.7 MB at flagship shapes)."""
    b_sz, lp, _ = emb_pad.shape
    return (emb_pad.reshape(b_sz, lp, R, eds)
            .transpose(1, 3, 0, 2).reshape(lp * eds, b_sz * R))


def _mxu_bank_call(kern_fn, xt, extras, out_builder, out_pspecs, *,
                   eds, lv, f):
    """pallas_call plumbing for one MXU bank: grid over row (column-of-XT)
    tiles; the bwd dW output is PER-TILE partials (leading grid dim) summed
    by the caller — no cross-tile accumulation state.

    Under an installed data mesh (``decode_sample.set_mesh``) the call is
    ``shard_map``-ped over XT's column axis — columns are batch-major
    ``(b·R + r)`` rows, so a data shard's columns are exactly its batch
    rows' and each shard runs the identical kernel locally; cross-shard
    reductions (the dW partial sums) happen OUTSIDE in GSPMD land.

    ``extras``: (array, shard_pspec, block_spec_builder) triples —
    ``block_spec_builder(tile)`` returns the BlockSpec, or None for a
    whole-array VMEM spec.  ``out_builder(q_local, tile, grid)`` returns
    (out_shapes, out_specs) for the local call; ``out_pspecs`` are the
    shard_map output partition specs."""

    def _invoke(xt_, *arrs):
        q_l = xt_.shape[1]
        tile = min(q_l, _mxu_row_tile())
        grid = q_l // tile
        out_shapes, out_specs = out_builder(q_l, tile, grid)
        return pl.pallas_call(
            functools.partial(kern_fn, lv=lv, eds=eds, f=f),
            grid=(grid,),
            in_specs=[pl.BlockSpec((xt_.shape[0], tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)]
            + [(pl.BlockSpec(memory_space=pltpu.VMEM) if build is None
                else build(tile)) for _, _, build in extras],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=_interpret(),
        )(xt_, *arrs)

    arrs = [a for a, _, _ in extras]
    mesh = _data_mesh()
    if mesh is None:
        return _invoke(xt, *arrs)

    from jax.sharding import PartitionSpec as P

    in_specs = (P(None, "data"),) + tuple(ps for _, ps, _ in extras)
    return jax.shard_map(_invoke, mesh=mesh, in_specs=in_specs,
                         out_specs=out_pspecs, check_vma=False)(xt, *arrs)


def _mxu_forward(emb_pad, w_all, b_all, banks, R, eds):
    from jax.sharding import PartitionSpec as P

    maxf = max(f for _, f in banks)
    b_sz, lp, _ = emb_pad.shape
    L = lp - maxf + 1
    xt = _as_xt(emb_pad, R, eds)
    pooled, idxs = [], []
    n_off = 0
    for n, f in banks:
        lv = L - f + 1
        w_t = jax.lax.dynamic_slice_in_dim(w_all, n_off, n, 0)[:, :f * eds].T
        b_k = jax.lax.dynamic_slice_in_dim(b_all, n_off, n, 0)[None, :]

        def out_builder(q_l, tile, grid, n=n):
            return ((jax.ShapeDtypeStruct((q_l, n), emb_pad.dtype),
                     jax.ShapeDtypeStruct((q_l, n), jnp.int32)),
                    (pl.BlockSpec((tile, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((tile, n), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)))

        p, ix = _mxu_bank_call(
            _mxu_fwd_kernel, xt,
            extras=[(w_t, P(None, None), None),
                    (b_k, P(None, None), None)],
            out_builder=out_builder,
            out_pspecs=(P("data", None), P("data", None)),
            eds=eds, lv=lv, f=f)
        pooled.append(p.reshape(b_sz, R, n))
        idxs.append(ix.reshape(b_sz, R, n))
        n_off += n
    return pooled, idxs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv_relu_maxpool_mxu(emb_pad, w_all, b_all, banks, R: int, eds: int):
    """Engine 3: MXU-formulated Pallas forward AND backward (see the
    module-section comment).  Same contract as :func:`conv_relu_maxpool`."""
    pooled, _ = _mxu_forward(emb_pad, w_all, b_all, banks, R, eds)
    return jnp.concatenate(pooled, axis=-1)


def _mxu_vjp_fwd(emb_pad, w_all, b_all, banks, R, eds):
    pooled, idxs = _mxu_forward(emb_pad, w_all, b_all, banks, R, eds)
    return jnp.concatenate(pooled, axis=-1), (emb_pad, w_all, pooled, idxs)


def _dx_in_kernel() -> bool:
    """In-kernel overlap-add backward (default): the bank kernel emits the
    input gradient already accumulated in XT layout instead of the f×-bigger
    per-timestep DXS tensor (whose XLA-side layout copies + shifted adds
    were ~1 ms of the flagship step).  ``GIC_MXU_DX=0`` restores the DXS
    variant for A/B."""
    return os.environ.get("GIC_MXU_DX", "1") == "1"


def _mxu_vjp_bwd(banks, R, eds, res, d_pooled_cat):
    from jax.sharding import PartitionSpec as P

    emb_pad, w_all, pooled, idxs = res
    maxf = max(f for _, f in banks)
    b_sz, lp, e_dim = emb_pad.shape
    L = lp - maxf + 1
    q = b_sz * R
    xt = _as_xt(emb_pad, R, eds)
    dx_kernel = _dx_in_kernel()

    demb4 = jnp.zeros((b_sz, lp, R, eds), jnp.float32)
    dxt_sum = jnp.zeros((lp * eds, q), jnp.float32)
    dw = jnp.zeros((w_all.shape[0], w_all.shape[1]), jnp.float32)
    db_parts = []
    n_off = 0
    for k, (n, f) in enumerate(banks):
        lv = L - f + 1
        dp_k = jax.lax.dynamic_slice_in_dim(d_pooled_cat, n_off, n, axis=2)
        # relu mask + bias grad in XLA (elementwise on the small pooled
        # tensors); the kernel consumes the masked cotangent directly
        mask = pooled[k].astype(jnp.float32) > 0.0
        dpm = jnp.where(mask, dp_k.astype(jnp.float32), 0.0)  # [B, R, n]
        db_parts.append(jnp.sum(dpm, axis=(0, 1)))
        w_t = jax.lax.dynamic_slice_in_dim(w_all, n_off, n, 0)[:, :f * eds].T

        def row_block(tile, n=n):
            return pl.BlockSpec((tile, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        if dx_kernel:
            def out_builder(q_l, tile, grid, n=n, f=f):
                return ((jax.ShapeDtypeStruct((grid, f * eds, n),
                                              jnp.float32),
                         jax.ShapeDtypeStruct((lp * eds, q_l), jnp.float32)),
                        (pl.BlockSpec((1, f * eds, n), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((lp * eds, tile), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)))
            kern = _mxu_bwd_dx_kernel
        else:
            def out_builder(q_l, tile, grid, n=n, f=f, lv=lv):
                return ((jax.ShapeDtypeStruct((grid, f * eds, n),
                                              jnp.float32),
                         jax.ShapeDtypeStruct((lv, q_l, f * eds),
                                              jnp.float32)),
                        (pl.BlockSpec((1, f * eds, n), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM),
                         pl.BlockSpec((lv, tile, f * eds),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)))
            kern = _mxu_bwd_kernel

        # dw_k is per-tile partials: under a mesh each shard contributes its
        # grid's tiles on the leading dim; the axis-0 sum below reduces over
        # tiles AND shards (GSPMD inserts the cross-shard psum).
        dw_k, dxs = _mxu_bank_call(
            kern, xt,
            extras=[(w_t, P(None, None), None),
                    (idxs[k].reshape(q, n), P("data", None), row_block),
                    (dpm.reshape(q, n), P("data", None), row_block)],
            out_builder=out_builder,
            out_pspecs=(P("data", None, None),
                        P(None, "data") if dx_kernel
                        else P(None, "data", None)),
            eds=eds, lv=lv, f=f)
        dw_bank = jnp.sum(dw_k, axis=0)                     # [f·eds, n]
        dw_bank = jnp.pad(dw_bank.T, ((0, 0), (0, (maxf - f) * eds)))
        dw = jax.lax.dynamic_update_slice_in_dim(dw, dw_bank, n_off, axis=0)
        if dx_kernel:
            # dxs IS the overlap-added input gradient in XT layout
            dxt_sum = dxt_sum + dxs
        else:
            # overlap-add the per-timestep tap grads into d_emb: DXS[t, q,
            # j·eds + e] lands at emb_pad[b, t + j, r, e] — f shifted adds
            dxs5 = (dxs.reshape(lv, b_sz, R, f, eds)
                    .transpose(1, 0, 2, 3, 4))              # [B, lv, R, f, e]
            for j in range(f):
                demb4 = demb4.at[:, j:j + lv].add(dxs5[:, :, :, j, :])
        n_off += n
    db = jnp.concatenate(db_parts).astype(w_all.dtype)
    if dx_kernel:
        # invert `_as_xt`: [lp·eds, b·R] → [b, lp, R, eds]
        demb4 = (dxt_sum.reshape(lp, eds, b_sz, R)
                 .transpose(2, 0, 3, 1))
    demb = demb4.reshape(b_sz, lp, e_dim)
    return demb.astype(emb_pad.dtype), dw.astype(w_all.dtype), db


conv_relu_maxpool_mxu.defvjp(_mxu_vjp_fwd, _mxu_vjp_bwd)
