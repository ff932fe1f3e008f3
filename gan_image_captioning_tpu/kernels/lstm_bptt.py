"""Weights-resident LSTM BPTT reverse-scan kernel.

The deferred-gradient LSTM backward (models/lstm.py:_layer_seq_bwd) is a
reverse ``lax.scan`` whose per-step body is ~10 small VPU ops on [B, 4H]
plus ONE [B, 4H] × [4H, H] recurrent matmul — XLA re-reads the [H, 4H]
recurrent weight from HBM every step and dispatches the small kernels
per iteration.  This kernel runs the whole reverse loop as one
``pallas_call`` with the grid over time REVERSED via the index maps:
the recurrent weight is DMA'd into VMEM once and stays resident, the
(dh, dc) carry lives in VMEM scratch, and each step emits only its
``d_pre`` [B, 4H] gate-gradient row.  The weight/input gradients stay
where they were: single large MXU matmuls over the stacked ``d_pre``
OUTSIDE the kernel (the deferred-gradient trick, unchanged).

Math is identical to ``_layer_seq_bwd``'s ``rstep`` (float32
throughout); gradient-equivalence tested in tests/test_lstm_bptt_kernel.py.
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


def available() -> bool:
    """GIC_BPTT_KERNEL=1 opts in.  Default OFF: measured NEUTRAL on v5e
    (102.6 vs 103.0 steps/s interleaved A/B, benchmarks/ab_bptt.py) — the
    reverse scan's per-step weight re-reads overlap well enough under
    XLA's scheduling that weight residency buys nothing here; kept as a
    tested alternative for backends with weaker scan codegen."""
    if os.environ.get("GIC_BPTT_KERNEL", "0") != "1":
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("GIC_KERNEL_INTERPRET") == "1")


def chain_available() -> bool:
    """GIC_BPTT_CHAIN=1 opts into the CHAINED multi-layer reverse kernel
    (one pallas_call for the whole stacked-LSTM backward recurrence —
    VERDICT r4 item 1's fwd+bwd-resident program attempt: the decode
    backward's T-step recurrence never re-crosses a program boundary).
    See docs/benchmarks.md for the measured verdict at the current
    operating point."""
    if os.environ.get("GIC_BPTT_CHAIN", "0") != "1":
        return False
    return (jax.default_backend() == "tpu"
            or os.environ.get("GIC_KERNEL_INTERPRET") == "1")


def _chain_kernel(whh_ref, wih_ref, dhs_ref, gates_ref, cs_ref, csm1_ref,
                  dpre_ref, dh_scr, dc_scr, *, T, H, NL):
    """One reverse step of ALL NL layers (grid g: t = T-1-g).

    Layer nl-1 consumes the external cotangent d_hs[t]; each lower layer
    consumes the inter-layer input gradient ``d_pre_upper @ w_ih_upper^T``
    computed IN the same grid step (both recurrences run t = T-1 → 0 in
    lockstep, so chaining them costs nothing).  All weights stay VMEM-
    resident across the whole grid; carries live in scratch."""
    g = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(g == 0)
    def _init():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    first_t = (g == T - 1)  # t == 0: c_prev is the zero initial state
    d_x_upper = None
    for l in range(NL - 1, -1, -1):
        gates = gates_ref[0, l].astype(f32)                # [B, 4H]
        i_g = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f_g = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g_g = jnp.tanh(gates[:, 2 * H:3 * H])
        o_g = jax.nn.sigmoid(gates[:, 3 * H:4 * H])

        dh_in = dhs_ref[0].astype(f32) if l == NL - 1 else d_x_upper
        dh = dh_scr[l] + dh_in                             # [B, H]
        tc = jnp.tanh(cs_ref[0, l].astype(f32))
        do_pre = dh * tc * o_g * (1.0 - o_g)
        dc = dc_scr[l] + dh * o_g * (1.0 - tc * tc)
        cprev = jnp.where(first_t, f32(0.0), csm1_ref[0, l].astype(f32))
        di_pre = dc * g_g * i_g * (1.0 - i_g)
        df_pre = dc * cprev * f_g * (1.0 - f_g)
        dg_pre = dc * i_g * (1.0 - g_g * g_g)
        d_pre = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        dpre_ref[0, l] = d_pre

        dh_scr[l] = jax.lax.dot_general(
            d_pre, whh_ref[l].astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dc_scr[l] = dc * f_g
        if l > 0:
            d_x_upper = jax.lax.dot_general(
                d_pre, wih_ref[l - 1].astype(f32), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)


def lstm_bptt_chain(w_hhs, w_ihs_upper, d_hs, gates, cs):
    """Whole stacked-LSTM decode backward recurrence as ONE kernel.

    Specialization of the per-layer reverse loop for the decode VJP
    (models/generator.py:_lstm_bptt_from_dhs): zero initial states, the
    inter-layer input gradients chained in-kernel, and ``c_prev`` served
    as a second (t-1)-shifted view of ``cs`` instead of a materialized
    [T, NL, B, H] concatenation.

    Args:
      w_hhs:      [NL, H, 4H] recurrent weights (``lp["w_hh"].T``).
      w_ihs_upper:[NL-1, H, 4H] input weights of layers 1..NL-1
                  (``lp["w_ih"].T`` — upper-layer inputs have width H).
      d_hs:       [T, B, H] top-layer hidden cotangents.
      gates:      [T, NL, B, 4H] saved pre-activation gates (any float
                  dtype; cast to f32 per-block in-core).
      cs:         [T, NL, B, H] cell states leaving each step.
    Returns:
      d_pre [T, NL, B, 4H] float32 — gate gradients for the deferred
      dW/db/dx matmuls outside.
    """
    T, NL, B, H4 = gates.shape
    H = H4 // 4
    f32 = jnp.float32
    rev = lambda g: (T - 1 - g, 0, 0)      # noqa: E731
    rev4 = lambda g: (T - 1 - g, 0, 0, 0)  # noqa: E731
    revm1 = lambda g: (jnp.maximum(T - 2 - g, 0), 0, 0, 0)  # noqa: E731

    if NL == 1:  # degenerate stack: no inter-layer weights
        w_ihs_upper = jnp.zeros((1, H, 4 * H), w_hhs.dtype)

    d_pre = pl.pallas_call(
        functools.partial(_chain_kernel, T=T, H=H, NL=NL),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_hhs
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_ihs_upper
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL, B, 4 * H), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL, B, H), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL, B, H), revm1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NL, B, 4 * H), rev4,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, NL, B, 4 * H), f32),
        scratch_shapes=[
            pltpu.VMEM((NL, B, H), f32),                      # dh carries
            pltpu.VMEM((NL, B, H), f32),                      # dc carries
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(w_hhs, w_ihs_upper, d_hs, gates, cs, cs)
    return d_pre


def _kernel(whh_ref, dhs_ref, gates_ref, cprev_ref, cs_ref,
            dpre_ref, dh0_ref, dc0_ref, dh_ref, dc_ref, *, T, H):
    """One reverse step (grid index g runs 0..T-1; index maps serve the
    arrays at t = T-1-g).  Carries (dh, dc) in VMEM scratch."""
    g = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(g == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    gates = gates_ref[0].astype(f32)                      # [B, 4H]
    i_g = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    f_g = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    g_g = jnp.tanh(gates[:, 2 * H:3 * H])
    o_g = jax.nn.sigmoid(gates[:, 3 * H:4 * H])

    dh = dh_ref[:] + dhs_ref[0].astype(f32)               # [B, H]
    tc = jnp.tanh(cs_ref[0].astype(f32))
    do_pre = dh * tc * o_g * (1.0 - o_g)
    dc = dc_ref[:] + dh * o_g * (1.0 - tc * tc)
    di_pre = dc * g_g * i_g * (1.0 - i_g)
    df_pre = dc * cprev_ref[0].astype(f32) * f_g * (1.0 - f_g)
    dg_pre = dc * i_g * (1.0 - g_g * g_g)
    d_pre = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
    dpre_ref[0] = d_pre.astype(dpre_ref.dtype)

    # recurrent-path gradient: dh_prev = d_pre @ w_hh^T
    # (w_hh [H, 4H] resident in VMEM; contract the 4H dim)
    dh_ref[:] = jax.lax.dot_general(
        d_pre, whh_ref[:].astype(f32), (((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dc_ref[:] = dc * f_g

    @pl.when(g == T - 1)
    def _emit():
        dh0_ref[:] = dh_ref[:]
        dc0_ref[:] = dc_ref[:]


def lstm_bptt_reverse(w_hh, d_hs, gates, c_prev, cs):
    """Run the reverse gate-gradient loop on-core.

    Args (all float32, time-major):
      w_hh:   [H, 4H] recurrent weight (the ``w_fused[in_dim:]`` slice).
      d_hs:   [T, B, H] incoming per-step hidden cotangents.
      gates:  [T, B, 4H] saved pre-activation gates.
      c_prev: [T, B, H] cell states entering each step.
      cs:     [T, B, H] cell states leaving each step.
    Returns:
      (d_pre [T, B, 4H] f32, dh0 [B, H], dc0 [B, H])
    """
    T, B, H = d_hs.shape
    f32 = jnp.float32
    rev = lambda g: (T - 1 - g, 0, 0)  # noqa: E731 — reverse-time maps

    d_pre, dh0, dc0 = pl.pallas_call(
        functools.partial(_kernel, T=T, H=H),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # w_hh
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 4 * H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((B, H), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), f32),                          # dh carry
            pltpu.VMEM((B, H), f32),                          # dc carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(w_hh.astype(f32), d_hs.astype(f32), gates.astype(f32),
      c_prev.astype(f32), cs.astype(f32))
    return d_pre, dh0, dc0
