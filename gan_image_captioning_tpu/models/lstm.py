"""Multi-layer LSTM as pure functions.

Replaces the reference's cuDNN ``nn.LSTM`` (``generator.py:32``).  Weight
layout and gate order (i, f, g, o) match ``torch.nn.LSTM`` so parameters
convert 1:1 (``w_ih``=[4H, in], ``w_hh``=[4H, H], ``b_ih``/``b_hh``=[4H]),
enabling the bit-match tests against the PyTorch oracle.

On TPU the per-step math is two MXU matmuls plus VPU gate nonlinearities; the
whole sequence runs inside a single ``lax.scan`` under ``jit`` — one compiled
program instead of the reference's 34 sequential kernel launches per batch
(``generator.py:60-76``).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def init_lstm_params(rng, input_dim: int, hidden_dim: int, num_layers: int,
                     dtype=jnp.float32) -> List[dict]:
    """Torch-default initialization: U(-k, k) with k = 1/sqrt(hidden_dim).

    (The reference immediately overwrites these with its own init sweep,
    ``generator.py:116-123``; torch-default init is kept for standalone use.)
    """
    k = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, dtype=jnp.float32))
    params = []
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else hidden_dim
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        params.append({
            "w_ih": jax.random.uniform(k1, (4 * hidden_dim, in_dim), dtype, -k, k),
            "w_hh": jax.random.uniform(k2, (4 * hidden_dim, hidden_dim), dtype, -k, k),
            "b_ih": jax.random.uniform(k3, (4 * hidden_dim,), dtype, -k, k),
            "b_hh": jax.random.uniform(k4, (4 * hidden_dim,), dtype, -k, k),
        })
    return params


def fuse_layer_params(params: List[dict]) -> List[dict]:
    """Pre-fuse each layer's input+recurrent weights into one ``[in+H, 4H]``
    matrix and one bias — done ONCE per call, outside any scan (fusing
    inside the step body would copy the weight matrix every timestep)."""
    return [{"w": jnp.concatenate([lp["w_ih"], lp["w_hh"]], axis=1).T,
             "b": lp["b_ih"] + lp["b_hh"]} for lp in params]


def lstm_cell(layer_params: dict, x, h, c):
    """One LSTM cell step.  ``x``: [B, in], ``h``/``c``: [B, H].

    Accepts either raw torch-layout params (w_ih/w_hh/b_ih/b_hh) or
    pre-fused ones from :func:`fuse_layer_params` — the fused form runs the
    input and recurrent matmuls as one ``[B, in+H] @ [in+H, 4H]`` MXU pass
    (same sums as torch's two-matmul formulation)."""
    if "w" in layer_params:
        gates = (jnp.concatenate([x, h], axis=-1) @ layer_params["w"]
                 + layer_params["b"])
    else:
        gates = (x @ layer_params["w_ih"].T + layer_params["b_ih"]
                 + h @ layer_params["w_hh"].T + layer_params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(params: List[dict], x, state: Tuple[jnp.ndarray, jnp.ndarray]):
    """Advance the full stack one timestep.

    Args:
      params: list of per-layer param dicts.
      x: [B, input_dim] input at this step.
      state: ``(h, c)`` each [num_layers, B, H].
    Returns:
      ``(h_top [B, H], (h, c))``.
    """
    h_all, c_all = state
    new_h, new_c = [], []
    inp = x
    for layer, lp in enumerate(params):
        h_new, c_new = lstm_cell(lp, inp, h_all[layer], c_all[layer])
        new_h.append(h_new)
        new_c.append(c_new)
        inp = h_new
    return inp, (jnp.stack(new_h), jnp.stack(new_c))


def zero_state(num_layers: int, batch: int, hidden_dim: int, dtype=jnp.float32):
    """Zero (h, c) — torch's default when ``states=None`` (generator.py:61)."""
    shape = (num_layers, batch, hidden_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def lstm_forward(params: List[dict], xs, state=None):
    """Run the stack over a whole sequence with ``lax.scan``.

    Args:
      xs: [B, T, input_dim].
      state: optional initial ``(h, c)``.
    Returns:
      ``(outputs [B, T, H], (h, c))``.
    """
    batch = xs.shape[0]
    hidden_dim = params[0]["w_hh"].shape[1]
    if state is None:
        state = zero_state(len(params), batch, hidden_dim, xs.dtype)
    fused = fuse_layer_params(params)

    def step(carry, x_t):
        h_top, carry = lstm_step(fused, x_t, carry)
        return carry, h_top

    state, outs = jax.lax.scan(step, state, jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(outs, 0, 1), state


# ------------------------------------------------- deferred-gradient BPTT

def _gate_activations(gates):
    """Split pre-activations into activated (i, f, g, o) — torch gate order
    (matches :func:`lstm_cell`'s math exactly)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    return jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g), jax.nn.sigmoid(o)


def _layer_seq_scan(w_fused, b_fused, xs, h0, c0):
    """One layer over the full sequence (time-major), saving residuals."""

    def step(carry, x_t):
        h, c = carry
        gates = jnp.concatenate([x_t, h], axis=-1) @ w_fused + b_fused
        i, f, g, o = _gate_activations(gates)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), (h_new, c_new, gates)

    _, (hs, cs, gates) = jax.lax.scan(step, (h0, c0), xs)
    return hs, cs, gates


@jax.custom_vjp
def _layer_seq(w_fused, b_fused, xs, h0, c0):
    """Teacher-forced single-layer LSTM, time-major ``xs`` [T, B, in] →
    ``hs`` [T, B, H].

    Forward math is identical to scanning :func:`lstm_cell` with fused
    weights.  The custom VJP is the TPU point: XLA's autodiff of the scan
    accumulates the [in+H, 4H] weight gradient in HBM at EVERY timestep
    (read-modify-write of a float32 buffer the size of the weights — the
    dominant traffic of the decode backward, docs/benchmarks.md roofline).
    Here the reverse scan only carries (dh, dc) [B, H] and emits the small
    per-step gate gradients; every weight gradient then falls out of ONE
    large MXU matmul over the stacked sequence.
    """
    hs, _, _ = _layer_seq_scan(w_fused, b_fused, xs, h0, c0)
    return hs


def _layer_seq_fwd(w_fused, b_fused, xs, h0, c0):
    hs, cs, gates = _layer_seq_scan(w_fused, b_fused, xs, h0, c0)
    return hs, (w_fused, xs, h0, c0, hs, cs, gates)


def _layer_seq_bwd(res, d_hs):
    w_fused, xs, h0, c0, hs, cs, gates = res
    in_dim = xs.shape[-1]
    w_hh = w_fused[in_dim:]  # [H, 4H]
    h_prev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)

    from gan_image_captioning_tpu.kernels import lstm_bptt

    if lstm_bptt.available():
        # weights-resident Pallas reverse loop: w_hh DMA'd into VMEM once
        # instead of re-read per step, one kernel instead of T small-op
        # dispatches; d_pre stacks for the same deferred dW matmuls below
        d_pre, dh0, dc0 = lstm_bptt.lstm_bptt_reverse(
            w_hh, d_hs, gates, c_prev, cs)
        t, b = d_pre.shape[0], d_pre.shape[1]
        d2 = d_pre.reshape(t * b, -1)
        xh = jnp.concatenate([xs, h_prev], axis=-1).reshape(t * b, -1)
        dw = xh.T @ d2
        db = d2.sum(axis=0)
        dxs = (d2 @ w_fused[:in_dim].T).reshape(xs.shape)
        return dw, db, dxs, dh0, dc0

    def rstep(carry, inp):
        dh, dc = carry
        d_h_t, gates_t, c_prev_t, c_t = inp
        dh = dh + d_h_t
        i, f, g, o = _gate_activations(gates_t)
        tc = jnp.tanh(c_t)
        do_pre = dh * tc * o * (1.0 - o)
        dc = dc + dh * o * (1.0 - tc * tc)
        di_pre = dc * g * i * (1.0 - i)
        df_pre = dc * c_prev_t * f * (1.0 - f)
        dg_pre = dc * i * (1.0 - g * g)
        d_pre = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        # Recurrent-path gradient per step (reads only the [H, 4H] slice);
        # the input-path gradient is deferred to one big matmul below.
        dh_prev = d_pre @ w_hh.T
        dc_prev = dc * f
        return (dh_prev, dc_prev), d_pre

    zero = jnp.zeros_like(h0)
    (dh0, dc0), d_pre = jax.lax.scan(
        rstep, (zero, zero), (d_hs, gates, c_prev, cs), reverse=True)

    t, b = d_pre.shape[0], d_pre.shape[1]
    d2 = d_pre.reshape(t * b, -1)
    xh = jnp.concatenate([xs, h_prev], axis=-1).reshape(t * b, -1)
    dw = xh.T @ d2                    # ONE [in+H, 4H] matmul, not T RMWs
    db = d2.sum(axis=0)
    dxs = (d2 @ w_fused[:in_dim].T).reshape(xs.shape)
    return dw, db, dxs, dh0, dc0


_layer_seq.defvjp(_layer_seq_fwd, _layer_seq_bwd)


def lstm_seq_tm(params: List[dict], xs_tm, state=None):
    """Teacher-forced multi-layer LSTM over a time-major sequence.

    ``xs_tm``: [T, B, in] → [T, B, H] (top-layer outputs).  Numerically the
    same forward as :func:`lstm_forward`; the deferred-gradient VJP of
    :func:`_layer_seq` makes its backward pass a handful of large matmuls
    instead of per-step weight-gradient accumulation.  Gradients w.r.t. the
    torch-layout params flow through the (cheap, one-time) concat/transpose
    that builds the fused weights.
    """
    batch = xs_tm.shape[1]
    hidden_dim = params[0]["w_hh"].shape[1]
    if state is None:
        state = zero_state(len(params), batch, hidden_dim, xs_tm.dtype)
    h0, c0 = state
    x = xs_tm
    for layer, lp in enumerate(params):
        w = jnp.concatenate([lp["w_ih"], lp["w_hh"]], axis=1).T
        b = lp["b_ih"] + lp["b_hh"]
        x = _layer_seq(w, b, x, h0[layer], c0[layer])
    return x


def bilstm_forward(fwd_params: List[dict], bwd_params: List[dict], xs):
    """Bidirectional LSTM over a sequence (teacher-forced scoring only —
    a free-running decoder cannot be bidirectional).

    The report explored bidirectional LSTMs (NLP_Report.pdf §4.2); the
    committed reference exposes only stacked unidirectional ones
    (``--gen-num-layers``, args.py:22-25).  Used by the ``--disc-arch
    bilstm`` sequence discriminator (models/discriminator_bilstm.py).
    Returns ``[B, T, 2H]`` (forward ∥ backward concatenation, torch
    convention).
    """
    fwd_out, _ = lstm_forward(fwd_params, xs)
    bwd_out, _ = lstm_forward(bwd_params, jnp.flip(xs, axis=1))
    return jnp.concatenate([fwd_out, jnp.flip(bwd_out, axis=1)], axis=-1)
