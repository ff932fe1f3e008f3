"""Int8 weight-only quantization for the decode/serving path.

The reference has no quantization (nor any inference path at all —
``main.py:49`` leaves evaluation commented out); this is a framework
capability aimed at the serving leg of the north star.  TPU-specific
rationale:

* Small-batch autoregressive decode is **HBM-bandwidth bound on weight
  reads**: every timestep re-reads the LSTM stack and the ``[V, H]``
  vocab projection.  Storing them int8 halves the bytes vs bfloat16
  (4x vs float32) at a cost of one cheap in-register upcast that XLA
  fuses into the matmul's operand load.
* The weights-resident Pallas decode kernel sidesteps the re-read by
  parking weights in VMEM — but VMEM is ~16 MB/core, so the *resident*
  path caps model size.  Int8 halves the VMEM footprint too, doubling
  the geometry that stays resident (the flagship ``[11008, 512]`` vocab
  projection alone is 11.3 MB bf16 vs 5.6 MB int8).
* Per-output-channel symmetric scales keep the scale application OUT of
  the matmul: ``x @ W ≈ (x @ Q) * s`` with ``Q`` int8 and ``s`` a
  ``[out]`` row vector — one fused VPU multiply after the MXU pass.

Layout:  :func:`quantize` / :func:`dequantize` are the per-tensor
primitives; :func:`quantize_generator` rewrites a generator pytree's
decoder into the quantized form that :func:`~eval.decode.make_stepper`
recognizes (key ``"lstm_q"``); transformer decoders get fake-quant
(quantize→dequantize at load: same storage savings on disk/export, MXU
math unchanged).  Quality impact is measured, not assumed — see
``tests/test_quantize.py`` and docs/benchmarks.md.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Symmetric per-channel int8 quantized tensor.

    ``q``: int8 payload, same shape as the original.
    ``scale``: float32 per-channel scales, broadcastable against ``q``
    (size-1 axes everywhere except the channel axis).
    """

    q: jnp.ndarray
    scale: jnp.ndarray


def quantize(w, channel_axis: int = -1, bits: int = 8) -> QTensor:
    """Symmetric per-channel intN: ``scale = max|w| / qmax`` along every
    axis except ``channel_axis``; zero channels get scale 1 (q = 0).

    ``bits``: 8 (int8 payload, qmax 127) or 4 (native ``jnp.int4``
    payload, qmax 7 — XLA bit-packs it on TPU, quartering HBM weight
    reads vs bf16; per-channel 4-bit is lossier, measure per model)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qmax = (1 << (bits - 1)) - 1
    dtype = jnp.int8 if bits == 8 else jnp.int4
    w = jnp.asarray(w, jnp.float32)
    axes = tuple(a for a in range(w.ndim) if a != channel_axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(dtype)
    return QTensor(q, scale)


def dequantize(qt: QTensor, dtype=jnp.float32):
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


def quantize_packed_int4(w, channel_axis: int = -1,
                         pad_odd: bool = False) -> QTensor:
    """Symmetric per-channel int4 with the payload PACKED two-per-int8
    along axis 0: rows ``[0:r)`` in the low nibbles, rows ``[r:2r)`` in
    the high nibbles (``kernels/decode_sample.py:pack_int4_rows`` layout,
    unpacked on-core by the quantized serve kernel's ``bits=4`` path).

    Built entirely in numpy — no ``jnp.int4`` array ever exists, so this
    survives backends whose client cannot transfer int4 (the axon
    ``device_put`` RecursionError, docs/benchmarks.md r3).  Row count
    must be even; ``pad_odd`` appends one zero row first — safe ONLY for
    selection tensors (the embedding table: a never-selected row changes
    nothing), never for matmul operands whose row count is a contraction
    dim."""
    import numpy as np

    w = np.asarray(jax.device_get(w), np.float32)
    if pad_odd and w.shape[0] % 2:
        w = np.concatenate([w, np.zeros((1,) + w.shape[1:], w.dtype)])
    axes = tuple(a for a in range(w.ndim) if a != channel_axis % w.ndim)
    amax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
    r = q.shape[0] // 2
    if 2 * r != q.shape[0]:
        raise ValueError(f"packed int4 needs an even row count, got "
                         f"{q.shape[0]}")
    packed = ((q[r:].astype(np.int16) << 4)
              | (q[:r].astype(np.int16) & 0x0F)).astype(np.int8)
    return QTensor(jnp.asarray(packed), jnp.asarray(scale))


def unpack_int4_rows(q):
    """jnp inverse of the packed-int4 row layout: int8 [r, C] → int8
    [2r, C] nibble values in [-7, 7] (stepper fallback path)."""
    p = q.astype(jnp.int32)
    low = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 28), 28)
    high = jax.lax.shift_right_arithmetic(jax.lax.shift_left(p, 24), 28)
    return jnp.concatenate([low, high], axis=0).astype(jnp.int8)


def payload_bits(qdec: dict) -> int:
    """4 iff the decoder's payloads are row-packed int4 carriers, else 8.
    Inferred from shape (a packed ``linear.w`` has H/2 rows), so the
    params pytree needs no sidecar metadata."""
    h = qdec["lstm_q"][0]["w"].q.shape[1] // 4
    return 4 if qdec["linear"]["w"].q.shape[0] * 2 == h else 8


def qmatmul(x, qt: QTensor, dtype=None, t=None):
    """``x @ W`` with ``W`` stored int8, scales applied post-matmul.

    ``qt.q`` is ``[in, out]`` with per-out-column scales ``[1, out]``.
    The int8 operand upcasts to ``x.dtype`` in-register (HBM traffic
    stays int8); the scale is one fused row-vector multiply.

    ``t`` (a loop counter) makes the int8 payload loop-DEPENDENT inside a
    scan, pinning the dequant to the matmul's operand read instead of
    letting the compiler restructure it — −4% on the isolated
    vocab-projection scan (benchmarks/int8_hoist_probe.py), but within
    tunnel noise on the full decode (benchmarks/int8_ab.py), so the
    stepper leaves it off unless ``GIC_INT8_LOOPDEP=1``.
    """
    dtype = dtype or x.dtype
    q = qt.q
    if t is not None:
        q = q + (jnp.asarray(t) * 0).astype(q.dtype)
    y = x @ q.astype(dtype)
    return y * qt.scale.reshape(1, -1).astype(dtype)


def fake_quantize_tree(tree, channel_axis: int = -1, min_size: int = 4096,
                       bits: int = 8):
    """Quantize→dequantize every float matrix leaf with ≥ ``min_size``
    elements (biases/small vectors stay exact).  Simulates intN storage
    for paths that keep full-precision compute (transformer decoder,
    checkpoint export)."""

    def fq(leaf):
        if (hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                and leaf.ndim >= 2 and leaf.size >= min_size):
            return dequantize(quantize(leaf, channel_axis, bits=bits),
                              leaf.dtype)
        return leaf

    return jax.tree_util.tree_map(fq, tree)


def config_bits(config) -> int:
    """``--quantize int8|int4`` → payload bits (int8 when quantization is
    requested implicitly, e.g. the speculative draft under
    ``--quantize none``)."""
    return 4 if getattr(config, "quantize", "none") == "int4" else 8


def quantize_lstm_decoder(dec: dict, bits: int = 8,
                          pack_int4: bool = False) -> dict:
    """LSTM decoder pytree → quantized form.

    Input (models/generator.py layout): ``{"embed": [V, E],
    "lstm": [{w_ih, w_hh, b_ih, b_hh}, …], "linear": {"w": [V, H], "b"}}``.
    Output: ``{"embed": QTensor (per-dim scales), "lstm_q": [{"w":
    QTensor [in+H, 4H], "b": [4H]}, …], "linear": {"w": QTensor [H, V]
    (pre-transposed), "b"}}`` — the fused layout the decode stepper
    consumes (models/lstm.py:fuse_layer_params), quantized once at load.
    """
    from gan_image_captioning_tpu.models import lstm as lstm_lib

    fused = lstm_lib.fuse_layer_params(dec["lstm"])
    if bits == 4 and pack_int4:
        # row-packed int8 carrier (kernel unpacks on-core; no jnp.int4);
        # the embedding pads an odd vocab with one never-selected row
        qfn = quantize_packed_int4
        qembed = lambda w, channel_axis: quantize_packed_int4(  # noqa: E731
            w, channel_axis=channel_axis, pad_odd=True)
    else:
        qfn = qembed = lambda w, channel_axis: quantize(  # noqa: E731
            w, channel_axis=channel_axis, bits=bits)
    out = {
        # per-embedding-dim scales: rows are looked up, columns scaled
        "embed": qembed(dec["embed"], channel_axis=-1),
        "lstm_q": [{"w": qfn(lp["w"], channel_axis=-1),
                    "b": jnp.asarray(lp["b"], jnp.float32)}
                   for lp in fused],
        # pre-transpose to [H, V] so decode is qmatmul(h, w) directly
        "linear": {"w": qfn(dec["linear"]["w"].T, channel_axis=-1),
                   "b": jnp.asarray(dec["linear"]["b"], jnp.float32)},
    }
    return out


def quantize_generator(gen_params: dict, config) -> dict:
    """Generator pytree → decode-quantized twin (params elsewhere —
    encoder, BN — shared by reference, not copied).

    * ``gen_arch == "lstm"``: decoder replaced by the intN-resident form
      (:func:`quantize_lstm_decoder`, bits from ``--quantize``);
      steppers detect ``"lstm_q"`` and are payload-dtype agnostic.
    * transformer: decoder fake-quantized (intN storage fidelity,
      full-precision compute — the KV-cache decode step's weight reads
      are amortized across layers and the win is smaller; measured
      before kernelizing, per the round-2 lesson).
    """
    import os

    bits = config_bits(config)
    # int4 payload form: native jnp.int4 (XLA bit-packs it) unless the
    # backend's client cannot transfer int4 — the axon TPU tunnel's
    # device_put recurses on S4 arrays (docs/benchmarks.md r3) — in which
    # case the row-packed int8 carrier rides the quantized serve kernel
    # instead.  GIC_INT4_PACK=1/0 forces either way.
    env = os.environ.get("GIC_INT4_PACK", "")
    pack = (env == "1" if env else jax.default_backend() == "tpu")
    out = dict(gen_params)
    if "lstm" in gen_params["decoder"]:
        out["decoder"] = quantize_lstm_decoder(gen_params["decoder"], bits,
                                               pack_int4=pack)
    else:
        out["decoder"] = fake_quantize_tree(gen_params["decoder"], bits=bits)
    return out


def is_quantized(dec: dict) -> bool:
    return "lstm_q" in dec


def quantized_lstm_step(qdec: dict, x, state, t=None):
    """One stacked-LSTM step against int8-resident weights.

    Mirrors models/lstm.py:lstm_step's fused formulation with
    :func:`qmatmul` in place of the dense matmul.
    """
    h_all, c_all = state
    new_h, new_c = [], []
    inp = x
    for layer, lq in enumerate(qdec["lstm_q"]):
        gates = qmatmul(jnp.concatenate([inp, h_all[layer]], axis=-1),
                        lq["w"], t=t) + lq["b"].astype(x.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_all[layer] + (
            jax.nn.sigmoid(i) * jnp.tanh(g))
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        new_h.append(h_new)
        new_c.append(c_new)
        inp = h_new
    return inp, (jnp.stack(new_h), jnp.stack(new_c))


def quantized_embed(qdec: dict, ids):
    """Embedding lookup from the int8 table: gather rows, scale columns."""
    qe = qdec["embed"]
    return qe.q[ids].astype(jnp.float32) * qe.scale.reshape(1, -1)
