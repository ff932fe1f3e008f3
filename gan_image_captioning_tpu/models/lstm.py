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
