"""Int8-resident serve-mode decode kernel (VERDICT r3 item 4).

Exactness strategy: in f32 interpret mode the quantized kernel dequantizes
each weight once and then runs the IDENTICAL serve body as ``decode_sample``
mode='serve' — so running the dense kernel on the explicitly dequantized
weights must be bit-equal (same dot shapes, same f32 accumulation order).
The stepper-vs-kernel comparison is separate (different scale-application
order → argmax equality, not bit equality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.kernels.decode_sample import (
    decode_sample, decode_sample_q_serve, pack_int4_rows)
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.ops import quantize as q_lib

B, T, V, H, E = 4, 8, 256, 32, 32


@pytest.fixture(autouse=True)
def _env(monkeypatch):
    monkeypatch.setenv("GIC_KERNEL_INTERPRET", "1")


def _cfg():
    return Config(vocab_size=V, gen_embed_dim=E, gen_hidden_dim=H,
                  gen_num_layers=2, max_seq_len=T - 2, quantize="int8")


def _setup(seed=3):
    config = _cfg()
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    dec = gen_lib.init_decoder_params(k1, config)
    qdec = q_lib.quantize_lstm_decoder(dec, bits=8)
    features = jax.random.normal(k2, (B, E), jnp.float32)
    return config, dec, qdec, features


def _dense_from_qdec(qdec, bits=8):
    """Dequantize a quantized decoder back into the dense serve-kernel
    argument layout — the exactness reference (see module docstring)."""
    lstm = []
    for lq in qdec["lstm_q"]:
        w = np.asarray(q_lib.dequantize(lq["w"], jnp.float32))
        in_l = w.shape[0] - H
        lstm.append({"w_ih": jnp.asarray(w[:in_l].T),
                     "w_hh": jnp.asarray(w[in_l:].T),
                     "b_ih": jnp.asarray(lq["b"], jnp.float32),
                     "b_hh": jnp.zeros_like(jnp.asarray(lq["b"]))})
    w_proj = q_lib.dequantize(qdec["linear"]["w"], jnp.float32).T  # [V, H]
    b_proj = jnp.asarray(qdec["linear"]["b"], jnp.float32)
    embed = q_lib.dequantize(qdec["embed"], jnp.float32)
    return lstm, w_proj, b_proj, embed


def test_q_serve_bitmatches_dense_kernel_on_dequant():
    _, _, qdec, features = _setup()
    ids_q, lps_q = decode_sample_q_serve(features, qdec, T)
    lstm, w_proj, b_proj, embed = _dense_from_qdec(qdec)
    ids_d, lps_d = decode_sample(features, lstm, w_proj, b_proj, embed, T,
                                 mode="serve")
    np.testing.assert_array_equal(np.asarray(ids_q), np.asarray(ids_d))
    np.testing.assert_allclose(np.asarray(lps_q), np.asarray(lps_d),
                               atol=1e-5, rtol=1e-5)


def test_q_serve_ids_match_quantized_stepper():
    config, _, qdec, features = _setup(seed=7)
    ids_q, _ = decode_sample_q_serve(features, qdec, T)
    stepper = decode_lib.quantized_lstm_stepper(qdec, config,
                                                dtype=jnp.float32)
    ids_s = decode_lib._stepper_greedy(stepper, features, T)
    np.testing.assert_array_equal(np.asarray(ids_q), np.asarray(ids_s))


def test_q_serve_carry_chunks_equal_full():
    """K-step chunks chained through carried (h, c, x) == one full pass."""
    _, _, qdec, features = _setup(seed=11)
    ids_full, lps_full = decode_sample_q_serve(features, qdec, T)

    K = 4
    h = jnp.zeros((2, B, H), jnp.float32)
    c = jnp.zeros((2, B, H), jnp.float32)
    x = features
    ids_chunks, lps_chunks = [], []
    for _ in range(T // K):
        ids_k, lps_k, (h, c, x) = decode_sample_q_serve(
            x, qdec, K, init_state=(h, c, x))
        ids_chunks.append(np.asarray(ids_k))
        lps_chunks.append(np.asarray(lps_k))
    np.testing.assert_array_equal(np.concatenate(ids_chunks, axis=1),
                                  np.asarray(ids_full))
    np.testing.assert_allclose(np.concatenate(lps_chunks, axis=1),
                               np.asarray(lps_full), atol=1e-5)


def test_int4_packed_carrier_bitmatches_dense():
    """bits=4: row-packed int8 carrier == dense kernel on the dequantized
    int4 weights (and the carrier never materializes a jnp.int4 array on
    device — the axon device_put workaround)."""
    config, dec, _, features = _setup(seed=5)
    q4 = q_lib.quantize_lstm_decoder(dec, bits=4)

    packed = {
        "lstm_q": [{"w": q_lib.QTensor(pack_int4_rows(lq["w"].q.astype(
            jnp.int8)), lq["w"].scale), "b": lq["b"]}
            for lq in q4["lstm_q"]],
        "linear": {"w": q_lib.QTensor(
            pack_int4_rows(q4["linear"]["w"].q.astype(jnp.int8)),
            q4["linear"]["w"].scale), "b": q4["linear"]["b"]},
        "embed": q_lib.QTensor(pack_int4_rows(q4["embed"].q.astype(jnp.int8)),
                               q4["embed"].scale),
    }
    ids_p, lps_p = decode_sample_q_serve(features, packed, T, bits=4)

    lstm, w_proj, b_proj, embed = _dense_from_qdec(q4)
    ids_d, lps_d = decode_sample(features, lstm, w_proj, b_proj, embed, T,
                                 mode="serve")
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_d))
    np.testing.assert_allclose(np.asarray(lps_p), np.asarray(lps_d),
                               atol=1e-5, rtol=1e-5)


def test_greedy_with_logprobs_routes_quantized_kernel():
    config, dec, qdec, features = _setup(seed=9)
    qparams = {"decoder": qdec}
    ids, lp = decode_lib.greedy_with_logprobs(qparams, features, config)
    stepper = decode_lib.quantized_lstm_stepper(qdec, config,
                                                dtype=jnp.float32)
    ids_s = decode_lib._stepper_greedy(stepper, features, config.seq_len)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_s))
    assert np.isfinite(np.asarray(lp)).all()


def test_adaptive_quantized_kernel_matches_full():
    config, _, qdec, features = _setup(seed=13)
    qparams = {"decoder": qdec}
    ids_f, lp_f = decode_lib.greedy_with_logprobs(qparams, features, config)
    ids_a, lp_a = decode_lib.greedy_with_logprobs_adaptive(
        qparams, features, config, chunk=4)
    # adaptive voids the post-<E> tail; compare up to each row's first <E>
    from gan_image_captioning_tpu.data.vocab import END
    ids_f = np.asarray(ids_f)
    ids_a = np.asarray(ids_a)
    for r in range(ids_f.shape[0]):
        ends = np.nonzero(ids_f[r] == END)[0]
        upto = (ends[0] + 1) if len(ends) else ids_f.shape[1]
        np.testing.assert_array_equal(ids_a[r, :upto], ids_f[r, :upto])
    np.testing.assert_allclose(np.asarray(lp_a), np.asarray(lp_f),
                               atol=1e-4)


def test_continuous_batcher_quantized_kernel_path():
    """Slot engine rides the int8-resident kernel (interpret mode) and
    matches batch greedy on the same quantized params."""
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.models.generator import start_token_features
    from gan_image_captioning_tpu.serving import ContinuousBatcher

    config = _cfg()
    params = api.init_generator(jax.random.PRNGKey(21), config)
    qparams = q_lib.quantize_generator(params, config)
    eng = ContinuousBatcher(qparams, config, num_slots=4, chunk_steps=4)
    try:
        feats = np.asarray(start_token_features(params["decoder"], 3))
        futs = [eng.submit(feats[i]) for i in range(3)]
        outs = [f.result(timeout=60) for f in futs]
        batch_ids = np.asarray(decode_lib.greedy(
            qparams, jnp.asarray(feats), config))
        for (ids, _lp), want in zip(outs, batch_ids):
            np.testing.assert_array_equal(ids, want)
    finally:
        eng.close()


def test_int4_pack_auto_wiring(monkeypatch):
    """--quantize int4 with the packed carrier (GIC_INT4_PACK=1): the
    generator quantizes to row-packed int8 payloads, routes through the
    serve kernel, and the stepper fallback (GIC_Q_KERNEL=0) unpacks to
    the same ids."""
    from gan_image_captioning_tpu.models import api

    monkeypatch.setenv("GIC_INT4_PACK", "1")
    config = _cfg().replace(quantize="int4")
    params = api.init_generator(jax.random.PRNGKey(31), config)
    qparams = q_lib.quantize_generator(params, config)
    dec = qparams["decoder"]
    assert q_lib.payload_bits(dec) == 4
    assert dec["linear"]["w"].q.dtype == jnp.int8   # carrier, not jnp.int4

    feats = jax.random.normal(jax.random.PRNGKey(32), (B, E), jnp.float32)
    ids_k, lp_k = decode_lib.greedy_with_logprobs(qparams, feats, config)

    monkeypatch.setenv("GIC_Q_KERNEL", "0")         # stepper fallback
    ids_s, lp_s = decode_lib.greedy_with_logprobs(qparams, feats, config)
    np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_s))
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_s),
                               atol=1e-4)

    # and the packed carrier must equal the NATIVE int4 quantization
    monkeypatch.setenv("GIC_INT4_PACK", "0")
    nparams = q_lib.quantize_generator(params, config)
    ids_n = decode_lib.greedy(nparams, feats, config)
    np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_n))
