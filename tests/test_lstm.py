"""LSTM stack vs. torch.nn.LSTM oracle (weight-for-weight)."""

import jax.numpy as jnp
import jax
import numpy as np
import pytest
import torch

from gan_image_captioning_tpu.models import lstm


def _to_torch_lstm(params, input_dim, hidden_dim):
    """Load our params into a torch.nn.LSTM (batch_first)."""
    num_layers = len(params)
    m = torch.nn.LSTM(input_dim, hidden_dim, num_layers, batch_first=True)
    with torch.no_grad():
        for layer, lp in enumerate(params):
            getattr(m, f"weight_ih_l{layer}").copy_(torch.tensor(np.asarray(lp["w_ih"])))
            getattr(m, f"weight_hh_l{layer}").copy_(torch.tensor(np.asarray(lp["w_hh"])))
            getattr(m, f"bias_ih_l{layer}").copy_(torch.tensor(np.asarray(lp["b_ih"])))
            getattr(m, f"bias_hh_l{layer}").copy_(torch.tensor(np.asarray(lp["b_hh"])))
    return m


@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_forward_matches_torch(num_layers):
    rng = jax.random.PRNGKey(0)
    B, T, E, H = 3, 7, 5, 11
    params = lstm.init_lstm_params(rng, E, H, num_layers)
    xs = jax.random.normal(jax.random.PRNGKey(1), (B, T, E))

    ours, (h, c) = lstm.lstm_forward(params, xs)

    m = _to_torch_lstm(params, E, H)
    with torch.no_grad():
        ref, (h_ref, c_ref) = m(torch.tensor(np.asarray(xs)))

    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_ref.numpy(), atol=1e-5)


def test_lstm_step_equals_forward():
    rng = jax.random.PRNGKey(2)
    B, T, E, H, L = 2, 5, 4, 6, 2
    params = lstm.init_lstm_params(rng, E, H, L)
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, T, E))

    full, state_full = lstm.lstm_forward(params, xs)

    state = lstm.zero_state(L, B, H)
    outs = []
    for t in range(T):
        h_top, state = lstm.lstm_step(params, xs[:, t], state)
        outs.append(h_top)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_full[0]), np.asarray(state[0]), atol=1e-6)


def test_lstm_carried_state():
    # Splitting a sequence in half and carrying (h, c) must equal one pass.
    rng = jax.random.PRNGKey(4)
    B, T, E, H = 2, 8, 3, 5
    params = lstm.init_lstm_params(rng, E, H, 1)
    xs = jax.random.normal(jax.random.PRNGKey(5), (B, T, E))
    full, _ = lstm.lstm_forward(params, xs)
    first, st = lstm.lstm_forward(params, xs[:, : T // 2])
    second, _ = lstm.lstm_forward(params, xs[:, T // 2:], st)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(jnp.concatenate([first, second], axis=1)),
        atol=1e-6)


def test_bilstm_forward():
    rng = jax.random.PRNGKey(6)
    B, T, E, H = 2, 6, 4, 5
    fwd = lstm.init_lstm_params(rng, E, H, 1)
    bwd = lstm.init_lstm_params(jax.random.PRNGKey(7), E, H, 1)
    xs = jax.random.normal(jax.random.PRNGKey(8), (B, T, E))
    out = lstm.bilstm_forward(fwd, bwd, xs)
    assert out.shape == (B, T, 2 * H)
    # forward half equals the plain forward pass; backward half equals the
    # reversed pass re-reversed
    f, _ = lstm.lstm_forward(fwd, xs)
    b, _ = lstm.lstm_forward(bwd, jnp.flip(xs, 1))
    np.testing.assert_allclose(np.asarray(out[..., :H]), np.asarray(f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[..., H:]),
                               np.asarray(jnp.flip(b, 1)), atol=1e-6)
