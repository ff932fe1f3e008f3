"""Weights-resident LSTM decode sampling kernel.

The sequential free-running decode (reference ``generator.py:55-81``: LSTM →
vocab projection → [+Gumbel] → argmax → embedding feedback) is the latency
core of both training and serving.  As a ``lax.scan`` XLA re-reads the LSTM
weights, the [H, V] projection and the [V, E] embedding from HBM every step
and interleaves ~10 small kernels per token — measured 2.8 ms for T=36 at
flagship geometry vs a ~0.9 ms weight-bandwidth bound.

This kernel runs the WHOLE T-step loop as one ``pallas_call`` with the grid
over time: TPU grid steps execute sequentially, so VMEM scratch carries the
LSTM state (h, c, x) across steps while every weight block's index map is
constant — Mosaic DMAs each weight into VMEM ONCE and keeps it resident for
all T steps.  Per step, everything happens on-core:

  gates  = x @ Wx_l + h_l @ Wh_l + b_l          (MXU, per layer)
  logits = h_top @ Wp + bp                      (MXU)
  g      ~ Gumbel(0,1)                          (on-core PRNG, sample mode)
  ids    = argmax(logits [+ g])                 (VPU)
  x'     = one_hot(ids) @ embed                 (MXU — a gather would leave
                                                 the vector unit idle; the
                                                 one-hot contraction rides
                                                 the MXU and stays in VMEM)

Modes (static):
  greedy    → ids only (serving / eval decode; zero noise)
  sample    → ids + the per-step Gumbel noise [T, B, V] (adversarial
              decoupled training: phase 2 re-scores the sampled ids
              differentiably and needs the SAME noise as a constant —
              the kernel's PRNG stream is hardware-defined and cannot be
              replayed host-side, so it is emitted once here)
  pretrain  → ids + raw logits [T, B, V] (the reference's free-running
              MLE forward, no noise)

Off-TPU (and under tests) the ``interpret=True`` path runs the same kernel
body with the PRNG stubbed to zeros — greedy/pretrain modes are exact there
and are tested against the jnp scan; sample-mode noise is TPU-only and
covered by distribution tests.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-10  # reference add_gumbel eps (generator.py:84)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------- mesh support

_MESH = None


def set_mesh(mesh) -> None:
    """Install the device mesh the decode kernels shard over (``--mesh``
    with a ``data`` axis; the instructor wires this).  Every kernel tensor
    is batch-leading or replicated, so the kernel partitions over ``data``
    via ``shard_map`` with no cross-shard communication; ``None`` clears."""
    global _MESH
    _MESH = mesh


def get_mesh():
    """The currently installed kernel mesh (``None`` = single-device)."""
    return _MESH


def _data_mesh():
    """The installed mesh when it is DATA-only (every non-``data`` axis has
    size 1) — the per-shard kernel replication path.  A mesh with a live
    ``model`` axis routes through :func:`_tp_mesh` instead (vocab-parallel
    decode); returning it here would let the data-axis shard_maps silently
    claim model-sharded weights as replicated."""
    m = _MESH
    if (m is not None and "data" in m.shape and m.shape["data"] > 1
            and all(s == 1 for n, s in m.shape.items() if n != "data")):
        return m
    return None


def _tp_mesh():
    """The installed mesh when it carries a live ``model`` (vocab) axis and
    no other non-data axis — the vocab-parallel decode path."""
    m = _MESH
    if (m is not None and m.shape.get("model", 1) > 1
            and all(s == 1 for n, s in m.shape.items()
                    if n not in ("data", "model"))):
        return m
    return None


def _shard_seed(seed_arr):
    """Decorrelate the per-shard PRNG streams: each data shard samples its
    own rows, so shards must not replay one another's noise.  (Forward and
    backward both derive the per-shard seed this way, so the backward's
    noise REPLAY stays exact per shard.)"""
    idx = jax.lax.axis_index("data").astype(jnp.int32)
    return seed_arr + idx * jnp.int32(1000003)


def _avalanche(seed):
    """murmur3-style finalizer: adjacent seeds → uncorrelated streams."""
    seed = seed.astype(jnp.uint32)
    seed = seed ^ (seed >> 16)
    seed = seed * jnp.uint32(0x85EBCA6B)
    seed = seed ^ (seed >> 13)
    seed = seed * jnp.uint32(0xC2B2AE35)
    seed = seed ^ (seed >> 16)
    return seed


def _kernel(seed_ref, temp_ref, feat_ref, wp_ref, bp_ref, emb_ref,
            *layer_and_out_refs, nl, mode, T, interpret, carry=False):
    layer_refs = layer_and_out_refs[:3 * nl]
    rest = layer_and_out_refs[3 * nl:]
    if mode == "sample_embed":
        # disc-embedding weight (transposed [V, Ed]) rides along so the
        # soft sample can be contracted on-core — the [T, B, V] tensor
        # never leaves VMEM (docs/benchmarks.md round-3 fusion)
        wd_ref, rest = rest[0], rest[1:]
    if carry:
        # chunked serving decode: resume from carried (h, c, x) and emit
        # the post-chunk state (serving.ContinuousBatcher advance chunks)
        h0_ref, c0_ref, x0_ref, rest = rest[0], rest[1], rest[2], rest[3:]
        hT_ref, cT_ref, xT_ref = rest[-6], rest[-5], rest[-4]
    out_refs = rest
    ids_ref = out_refs[0]
    x_ref, h_ref, c_ref = out_refs[-3:]

    t = pl.program_id(0)
    B = feat_ref.shape[0]
    H = h_ref.shape[2]
    V = wp_ref.shape[1]

    @pl.when(t == 0)
    def _init():
        if carry:
            x_ref[:] = x0_ref[:]
            h_ref[:] = h0_ref[:]
            c_ref[:] = c0_ref[:].astype(c_ref.dtype)
        else:
            x_ref[:] = feat_ref[:]
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

    # ---- stacked LSTM cells (torch gate order i, f, g, o) ----
    x = x_ref[:]
    for l in range(nl):
        wx, wh, b = layer_refs[3 * l:3 * l + 3]
        gates = (jnp.dot(x, wx[:], preferred_element_type=jnp.float32)
                 + jnp.dot(h_ref[l], wh[:],
                           preferred_element_type=jnp.float32)
                 + b[:].astype(jnp.float32))            # [B, 4H] f32
        i_g = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f_g = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g_g = jnp.tanh(gates[:, 2 * H:3 * H])
        o_g = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c = f_g * c_ref[l].astype(jnp.float32) + i_g * g_g
        h = o_g * jnp.tanh(c)
        c_ref[l] = c.astype(c_ref.dtype)
        h_ref[l] = h.astype(h_ref.dtype)
        x = h.astype(x_ref.dtype)
        if mode in ("sample_resid", "sample_embed"):
            # BPTT residuals for the manual backward (generator.py
            # _sample_kernel_vjp): pre-activation gates + post-step (h, c)
            off = 3 if mode == "sample_embed" else 2
            hs_ref, cs_ref, gates_ref = (out_refs[off], out_refs[off + 1],
                                         out_refs[off + 2])
            hs_ref[0, l] = h.astype(hs_ref.dtype)
            cs_ref[0, l] = c.astype(cs_ref.dtype)
            gates_ref[0, l] = gates.astype(gates_ref.dtype)

    logits = (jnp.dot(x, wp_ref[:], preferred_element_type=jnp.float32)
              + bp_ref[:].astype(jnp.float32))          # [B, V] f32

    if mode in ("sample", "sample_resid", "sample_embed"):
        if interpret:
            # the interpreter has no on-core PRNG — zero-noise stand-in
            # (plumbing tests only; the real stream is TPU hardware)
            u = jnp.zeros((B, V), jnp.float32)
        else:
            pltpu.prng_seed(_avalanche(seed_ref[0] + t))
            bits = pltpu.bitcast(pltpu.prng_random_bits((B, V)), jnp.uint32)
            top24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
            u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
        g = -jnp.log(-jnp.log(u + _EPS) + _EPS)
        scores = logits + g
        if mode == "sample":
            out_refs[1][0] = g.astype(out_refs[1].dtype)
        else:
            # soft sample (the discriminator's input) computed on-core:
            # softmax(temperature · scores) — reference generator.py:68-69
            sc = scores * temp_ref[0]
            e = jnp.exp(sc - jnp.max(sc, axis=-1, keepdims=True))
            soft = e / jnp.sum(e, axis=-1, keepdims=True)
            if mode == "sample_embed":
                # fuse the discriminator's embedding contraction
                # (soft @ Wd.T, reference discriminator.py:20,40) on-core,
                # AND save the soft sample as the backward's residual — a
                # bf16 write is ~10× cheaper than regenerating the
                # softmax+Gumbel per backward step (measured: the
                # regeneration variant lost 8%, docs/benchmarks.md r3)
                de = jnp.dot(soft.astype(out_refs[1].dtype), wd_ref[:],
                             preferred_element_type=jnp.float32)
                out_refs[1][0] = de.astype(out_refs[1].dtype)
                out_refs[2][0] = soft.astype(out_refs[2].dtype)
            else:
                out_refs[1][0] = soft.astype(out_refs[1].dtype)
    else:
        scores = logits
        if mode == "pretrain":
            logits_ref = out_refs[1]
            logits_ref[0] = logits.astype(logits_ref.dtype)
        elif mode == "serve":
            # per-token greedy log-probability: the chosen logit IS the max,
            # so logp = max − logsumexp = −log Σ exp(l − max)
            m = jnp.max(logits, axis=-1, keepdims=True)
            lp = -jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1))   # [B]
            out_refs[1][pl.ds(t, 1), :] = lp[None, :].astype(
                out_refs[1].dtype)

    ids = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B]
    # ids is one full [T, B] VMEM block (a (1, B) per-step block violates
    # Mosaic's sublane tiling); store the row at the dynamic grid index
    ids_ref[pl.ds(t, 1), :] = ids[None, :]

    # ---- feedback: x_{t+1} = embed[ids] as a one-hot MXU contraction ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    onehot = (lane == ids[:, None]).astype(emb_ref.dtype)
    x_ref[:] = jnp.dot(onehot, emb_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(x_ref.dtype)

    if carry:
        @pl.when(t == T - 1)
        def _emit_state():
            hT_ref[:] = h_ref[:]
            cT_ref[:] = c_ref[:].astype(cT_ref.dtype)
            xT_ref[:] = x_ref[:]       # = embed(last ids): the next input


def _decode_sample_tp(features, lstm_layers, w_proj, b_proj, embed,
                      seq_len: int, mode: str, seed, temperature, mesh):
    """Vocab-parallel (tensor-parallel) decode under a ``data×model`` mesh
    (VERDICT r4 item 4: the kernel path must not silently downgrade under
    TP).

    The weights-resident single-grid kernel cannot span chips — the
    per-step argmax feedback needs a cross-shard combine EVERY step, and
    collectives cannot run inside one ``pallas_call`` grid.  The
    TPU-native TP formulation is therefore a ``lax.scan`` over the same
    per-step math (bit-mirroring ``_kernel``: f32 gates, f32 cell carry,
    compute-dtype h/x, one-hot MXU embedding feedback) inside
    ``shard_map``, with the vocab dimension sharded over ``model``:

      * projection [H, V/mp], bias, embedding [V/mp, E] live per-shard;
      * per-step local argmax → global winner via the
        pmax + index-offset + pmin combine (first-index tie-break, the
        torch/jnp rule the kernel follows);
      * the winner's embedding row returns as a masked one-hot
        contraction ``psum``-ed over ``model`` (one owner, exact);
      * ``sample_resid``'s soft sample is a GLOBAL softmax from
        pmax(max) + psum(denominator); the [T, B, V] output stays
        vocab-sharded (out_spec ``P(None, 'data', 'model')``) so the
        backward's big matmuls shard under GSPMD without a gather.

    Noise: the kernel's PRNG stream is TPU-hardware; here the stream is
    ``jax.random`` folded per (step, model-shard) — deterministic and
    backend-portable, but a DIFFERENT stream than the single-chip kernel
    (exactly like the decoupled implementation's stream differs).  In
    interpret/test mode both paths use zero noise, making
    sharded==single exact (tests/test_kernel_mesh.py).

    At flagship scale (V=11008 fits one chip) this path trades weight
    residency for per-step collectives and is SLOWER than the data-only
    kernel — it exists for vocab/embedding sizes that exceed a chip and
    to keep ``--mesh …,model:N`` on the kernel path; docs/benchmarks.md
    round 5 records the honest comparison.
    """
    from jax.sharding import PartitionSpec as P

    nl = len(lstm_layers)
    H = lstm_layers[0]["w_hh"].shape[1]
    V = embed.shape[0]
    mp = mesh.shape["model"]
    dt = features.dtype
    Vs = V // mp
    f32 = jnp.float32
    interp = _interpret()

    wp = w_proj.T                                    # [H, V]
    bp = b_proj[None, :]                             # [1, V]
    layer_ins = []
    for p in lstm_layers:
        layer_ins += [p["w_ih"].T, p["w_hh"].T,
                      (p["b_ih"] + p["b_hh"])[None, :]]

    has_data = mesh.shape.get("data", 1) > 1
    dax = "data" if has_data else None

    def body(seed_arr, temp_arr, feats, wp_, bp_, emb_, *lws):
        B = feats.shape[0]
        v_off = jax.lax.axis_index("model").astype(jnp.int32) * Vs
        base_seed = seed_arr[0]
        if has_data:
            base_seed = base_seed + (jax.lax.axis_index("data")
                                     .astype(jnp.int32) * jnp.int32(1000003))
        temp = temp_arr[0]

        def step(carry, t):
            x, h, c = carry                          # [B,E] dt, [nl,B,H] dt,
            hs_t, cs_t, gates_t = [], [], []         # [nl,B,H] f32
            xi = x
            new_h, new_c = [], []
            for l in range(nl):
                wx, wh, b = lws[3 * l:3 * l + 3]
                gates = (jnp.dot(xi, wx, preferred_element_type=f32)
                         + jnp.dot(h[l], wh, preferred_element_type=f32)
                         + b.astype(f32))            # [B, 4H]
                i_g = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
                f_g = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
                g_g = jnp.tanh(gates[:, 2 * H:3 * H])
                o_g = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
                cl = f_g * c[l] + i_g * g_g
                hl = o_g * jnp.tanh(cl)
                new_c.append(cl)
                new_h.append(hl.astype(dt))
                xi = hl.astype(dt)
                hs_t.append(hl.astype(dt))
                cs_t.append(cl.astype(dt))
                gates_t.append(gates.astype(dt))
            logits = (jnp.dot(xi, wp_, preferred_element_type=f32)
                      + bp_.astype(f32))             # [B, Vs] local

            outs = {}
            if mode in ("sample", "sample_resid"):
                if interp:
                    u = jnp.zeros_like(logits)
                else:
                    key = jax.random.fold_in(
                        jax.random.fold_in(jax.random.PRNGKey(base_seed), t),
                        v_off)
                    u = jax.random.uniform(key, logits.shape, f32)
                g = -jnp.log(-jnp.log(u + _EPS) + _EPS)
                scores = logits + g
                if mode == "sample":
                    outs["noise"] = g.astype(dt)
                else:
                    sc = scores * temp
                    m = jax.lax.pmax(jnp.max(sc, axis=-1), "model")  # [B]
                    e = jnp.exp(sc - m[:, None])
                    s = jax.lax.psum(jnp.sum(e, axis=-1), "model")
                    outs["soft"] = (e / s[:, None]).astype(dt)   # [B, Vs]
            else:
                scores = logits
                if mode == "pretrain":
                    outs["logits"] = logits.astype(dt)

            # ---- global argmax (first-index tie-break across shards) ----
            lidx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B]
            lval = jnp.take_along_axis(scores, lidx[:, None],
                                       axis=-1)[:, 0]
            gval = jax.lax.pmax(lval, "model")
            cand = jnp.where(lval >= gval, lidx + v_off,
                             jnp.int32(2 ** 31 - 1))
            ids = jax.lax.pmin(cand, "model")                     # [B]

            # ---- feedback: winner's embedding row, one owner per id ----
            lid = ids - v_off
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, Vs), 1)
            onehot = (lane == lid[:, None]).astype(emb_.dtype)
            x_next = jax.lax.psum(
                jnp.dot(onehot, emb_, preferred_element_type=f32),
                "model").astype(dt)

            outs["ids"] = ids
            if mode == "sample_resid":
                outs["hs"] = jnp.stack(hs_t)         # [nl, B, H]
                outs["cs"] = jnp.stack(cs_t)
                outs["gates"] = jnp.stack(gates_t)
            return (x_next, new_h, new_c), outs

        h0 = [jnp.zeros((B, H), dt) for _ in range(nl)]
        c0 = [jnp.zeros((B, H), f32) for _ in range(nl)]
        _, outs = jax.lax.scan(step, (feats, h0, c0),
                               jnp.arange(seq_len, dtype=jnp.int32))
        return outs

    in_specs = ((P(None), P(None), P(dax, None))
                + (P(None, "model"), P(None, "model"), P("model", None))
                + (P(None, None),) * (3 * nl))
    out_specs = {"ids": P(None, dax)}
    if mode == "sample":
        out_specs["noise"] = P(None, dax, "model")
    elif mode == "pretrain":
        out_specs["logits"] = P(None, dax, "model")
    elif mode == "sample_resid":
        out_specs["soft"] = P(None, dax, "model")
        for k in ("hs", "cs", "gates"):
            out_specs[k] = P(None, None, dax, None)

    outs = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray(temperature, jnp.float32).reshape(1),
        features, wp, bp, embed, *layer_ins)

    ids = outs["ids"].T                              # [B, T]
    if mode == "greedy":
        return ids
    if mode == "sample":
        return ids, outs["noise"]
    if mode == "pretrain":
        return ids, outs["logits"]
    return ids, outs["soft"], outs["hs"], outs["cs"], outs["gates"]


def decode_sample(features, lstm_layers: Sequence[dict], w_proj, b_proj,
                  embed, seq_len: int, mode: str = "greedy",
                  seed=0, temperature=1.0, disc_embed=None,
                  init_state=None):
    """Run the full T-step sampling decode on-core.

    Args:
      features: [B, E] t=0 input (image features / <S> embedding).
      lstm_layers: per-layer dicts with torch-layout ``w_ih [4H, In]``,
        ``w_hh [4H, H]``, ``b_ih [4H]``, ``b_hh [4H]``.
      w_proj: [V, H] torch-layout output projection weight.
      b_proj: [V].
      embed: [V, E] embedding table.
      seq_len: static decode length T.
      mode: 'greedy' | 'sample' | 'pretrain' | 'sample_resid' |
        'sample_embed' (see module docstring).
      seed: int32 scalar for the on-core PRNG (sample mode).
      temperature: unused by the kernel itself (argmax is scale-invariant);
        kept for signature parity with the jnp sampler.
      disc_embed: [Ed, V] discriminator embedding (torch bias-free Linear
        layout) — required by mode 'sample_embed' only.
      init_state: optional ``(h0 [nl,B,H], c0 [nl,B,H], x0 [B,E])`` carried
        decode state (serve mode: chunked continuous-batching decode
        resumes from it and the post-chunk state is returned).
    Returns:
      greedy:       ids [B, T]
      sample:       (ids [B, T], noise [T, B, V] in features.dtype)
      pretrain:     (ids [B, T], logits [T, B, V] in features.dtype)
      sample_resid: (ids, soft [T,B,V], hs, cs, gates)
      sample_embed: (ids, emb [T,B,Ed], soft [T,B,V], hs, cs, gates) —
        the soft sample contracted into the disc embedding on-core; soft
        saved (bf16) as the matmul-only backward's residual
      serve:        (ids [B, T], logprobs [B, T] f32) — greedy decode with
        per-token greedy log-probability in the same program; with
        ``init_state`` also ``(hT, cT, xT)``
    """
    # temperature only affects the SOFT output (argmax is scale-invariant);
    # greedy/sample/pretrain modes ignore it, sample_resid softmaxes with it
    nl = len(lstm_layers)
    H = lstm_layers[0]["w_hh"].shape[1]
    V = embed.shape[0]
    dt = features.dtype

    tp_mesh = _tp_mesh()
    if (tp_mesh is not None and init_state is None
            and mode in ("greedy", "sample", "pretrain", "sample_resid")
            and V % tp_mesh.shape["model"] == 0):
        # vocab-parallel path: model axis shards the projection/embedding
        return _decode_sample_tp(features, lstm_layers, w_proj, b_proj,
                                 embed, seq_len, mode, seed, temperature,
                                 tp_mesh)

    # kernel-friendly layouts: inputs-on-rows so every matmul is x @ W
    wp = w_proj.T                                   # [H, V]
    bp = b_proj[None, :]                            # [1, V]
    layer_ins = []
    for p in lstm_layers:
        layer_ins += [p["w_ih"].T, p["w_hh"].T,
                      (p["b_ih"] + p["b_hh"])[None, :]]

    n_extra = {"greedy": 0, "sample": 1, "pretrain": 1, "sample_resid": 4,
               "sample_embed": 4, "serve": 1}[mode]
    carry = init_state is not None

    extra_ins = []
    if mode == "sample_embed":
        extra_ins.append(disc_embed.T.astype(dt))        # wdT [V, Ed]
    if carry:
        h0, c0, x0 = init_state
        extra_ins += [h0.astype(dt), c0.astype(jnp.float32), x0.astype(dt)]

    def _invoke(seed_arr, temp_arr, feats, *weights):
        """The pallas_call, shaped by the (possibly per-shard) batch."""
        B, E = feats.shape
        weight_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shapes = [jax.ShapeDtypeStruct((seq_len, B), jnp.int32)]
        out_specs = [pl.BlockSpec((seq_len, B), lambda t: (0, 0),
                                  memory_space=pltpu.VMEM)]
        if n_extra:
            if mode == "sample_embed":
                ed = disc_embed.shape[0]
                out_shapes.append(jax.ShapeDtypeStruct((seq_len, B, ed), dt))
                out_specs.append(pl.BlockSpec((1, B, ed),
                                              lambda t: (t, 0, 0),
                                              memory_space=pltpu.VMEM))
                # soft residual for the matmul-only backward
                out_shapes.append(jax.ShapeDtypeStruct((seq_len, B, V), dt))
                out_specs.append(pl.BlockSpec((1, B, V),
                                              lambda t: (t, 0, 0),
                                              memory_space=pltpu.VMEM))
            elif mode == "serve":
                # per-token greedy logprobs: same full-block layout as ids
                out_shapes.append(
                    jax.ShapeDtypeStruct((seq_len, B), jnp.float32))
                out_specs.append(pl.BlockSpec((seq_len, B),
                                              lambda t: (0, 0),
                                              memory_space=pltpu.VMEM))
            else:
                # noise/logits/soft in the COMPUTE dtype (bf16 in mixed
                # precision): this is the kernel's dominant HBM write
                # (T·B·V) and the consumers cast to it anyway
                out_shapes.append(jax.ShapeDtypeStruct((seq_len, B, V), dt))
                out_specs.append(pl.BlockSpec((1, B, V),
                                              lambda t: (t, 0, 0),
                                              memory_space=pltpu.VMEM))
        if mode in ("sample_resid", "sample_embed"):
            for width in (H, H, 4 * H):                  # hs, cs, gates
                out_shapes.append(
                    jax.ShapeDtypeStruct((seq_len, nl, B, width), dt))
                out_specs.append(pl.BlockSpec(
                    (1, nl, B, width), lambda t: (t, 0, 0, 0),
                    memory_space=pltpu.VMEM))
        if carry:
            for shape, odt in (((nl, B, H), dt), ((nl, B, H), jnp.float32),
                               ((B, E), dt)):           # hT, cT, xT
                out_shapes.append(jax.ShapeDtypeStruct(shape, odt))
                out_specs.append(pl.BlockSpec(
                    shape, (lambda t: (0, 0, 0)) if len(shape) == 3
                    else (lambda t: (0, 0)),
                    memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(_kernel, nl=nl, mode=mode, T=seq_len,
                              interpret=_interpret(), carry=carry),
            grid=(seq_len,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),   # temp
                weight_spec,                             # features
                weight_spec, weight_spec, weight_spec,   # wp, bp, embed
            ] + [weight_spec] * (3 * nl + len(extra_ins)),
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            scratch_shapes=[
                pltpu.VMEM((B, E), dt),                  # x carry
                pltpu.VMEM((nl, B, H), dt),              # h carry
                pltpu.VMEM((nl, B, H), jnp.float32),     # c carry (f32:
                                                         # accumulating)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interpret(),
        )(seed_arr, temp_arr, feats, *weights)

    args = (jnp.asarray([seed], jnp.int32),
            jnp.asarray(temperature, jnp.float32).reshape(1),
            features, wp, bp, embed, *layer_ins, *extra_ins)
    mesh = _data_mesh()
    if mesh is None or mode == "serve":     # serving runs single-chip
        outs = _invoke(*args)
    else:
        # --mesh data:N with the kernel path: every kernel tensor is
        # batch-leading or replicated, so the per-shard call runs the
        # identical program on its local slice (VERDICT r2 item 2 — the
        # silent kernel→decoupled downgrade is gone for data-only meshes).
        from jax.sharding import PartitionSpec as P

        n_weights = 3 + 3 * nl + len(extra_ins)
        in_specs = ((P(None), P(None), P("data", None))
                    + (P(None, None),) * n_weights)
        out_specs = [P(None, "data")]
        if n_extra:
            out_specs.append(P(None, "data", None))
        if mode == "sample_embed":
            out_specs.append(P(None, "data", None))      # soft residual
        if mode in ("sample_resid", "sample_embed"):
            out_specs += [P(None, None, "data", None)] * 3
        out_specs = (tuple(out_specs) if len(out_specs) > 1
                     else out_specs[0])

        def body(seed_arr, *rest):
            return _invoke(_shard_seed(seed_arr), *rest)

        outs = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)(*args)

    if not isinstance(outs, (tuple, list)):
        return outs.T
    ids = outs[0].T
    if mode == "serve":
        lps = outs[1].T                   # [B, T] f32
        if carry:
            return ids, lps, tuple(outs[2:5])   # (hT, cT, xT)
        return ids, lps
    if mode in ("sample_resid", "sample_embed"):
        return (ids,) + tuple(outs[1:])   # soft|emb, hs, cs, gates (t-major)
    if n_extra:
        return ids, outs[1]
    return ids


# ---------------------------------------------------------------------------
# Quantized (int8-resident) serve-mode decode kernel (VERDICT r3 item 4)
# ---------------------------------------------------------------------------

def _qserve_kernel(feat_ref, *refs, nl, T, carry, bits):
    """Serve-mode greedy decode with INT-quantized weights resident.

    Same per-step body as ``_kernel``'s serve mode, but the weights arrive
    as int8 payloads (+f32 per-output-channel scales) and are dequantized
    ONCE at t==0 into bf16 VMEM scratch — int8 is the only HBM weight
    traffic (half of bf16), which is exactly what weight-only
    quantization can buy a weights-resident kernel: the prior int8 path
    ran the per-step ``lax.scan`` stepper and LOST 44% to the bf16 kernel
    at B=64 (docs/artifacts/tpu_queue_r3c4/decode_bench.json) because it
    re-read weights from HBM every step.

    ``bits=4``: payloads are int4 packed two-per-int8 along the ROW axis
    — rows [0:r) in the low nibbles, rows [r:2r) in the high nibbles
    (``pack_int4_rows``) — so unpack is two shifts + a concat, no
    interleave.  The packed carrier also dodges the axon-client
    ``jnp.int4`` device_put RecursionError (docs/benchmarks.md r3).
    """
    i = 0
    layer_refs = refs[i:i + 3 * nl]; i += 3 * nl            # (wq, ws, b)*nl
    wpq_ref, wps_ref, bp_ref, embq_ref, embs_ref = refs[i:i + 5]; i += 5
    if carry:
        h0_ref, c0_ref, x0_ref = refs[i:i + 3]; i += 3
    ids_ref, lps_ref = refs[i:i + 2]; i += 2
    if carry:
        hT_ref, cT_ref, xT_ref = refs[i:i + 3]; i += 3
    x_ref, h_ref, c_ref = refs[i:i + 3]; i += 3
    wbuf_refs = refs[i:i + nl]; i += nl
    wp_ref, emb_ref = refs[i], refs[i + 1]

    t = pl.program_id(0)
    f32 = jnp.float32
    H = h_ref.shape[2]
    dt = x_ref.dtype

    def _dq(q_ref, s_ref):
        if bits == 8:
            return (q_ref[:].astype(f32) * s_ref[:])
        # packed int4: sign-extend each nibble via int32 shifts
        p = q_ref[:].astype(jnp.int32)
        low = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p, 28), 28).astype(f32)
        high = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(p, 24), 28).astype(f32)
        return jnp.concatenate([low, high], axis=0) * s_ref[:]

    @pl.when(t == 0)
    def _init():
        for l in range(nl):
            wq, ws, _ = layer_refs[3 * l:3 * l + 3]
            wbuf_refs[l][:] = _dq(wq, ws).astype(dt)
        wp_ref[:] = _dq(wpq_ref, wps_ref).astype(dt)
        emb_ref[:] = _dq(embq_ref, embs_ref).astype(dt)
        if carry:
            x_ref[:] = x0_ref[:]
            h_ref[:] = h0_ref[:]
            c_ref[:] = c0_ref[:].astype(c_ref.dtype)
        else:
            x_ref[:] = feat_ref[:]
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

    # ---- stacked LSTM cells against the fused [in+H, 4H] weight ----
    x = x_ref[:]
    for l in range(nl):
        b = layer_refs[3 * l + 2]
        w = wbuf_refs[l]
        in_l = w.shape[0] - H
        gates = (jnp.dot(x, w[0:in_l, :], preferred_element_type=f32)
                 + jnp.dot(h_ref[l], w[in_l:, :],
                           preferred_element_type=f32)
                 + b[:].astype(f32))                     # [B, 4H] f32
        i_g = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
        f_g = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
        g_g = jnp.tanh(gates[:, 2 * H:3 * H])
        o_g = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
        c = f_g * c_ref[l].astype(f32) + i_g * g_g
        h = o_g * jnp.tanh(c)
        c_ref[l] = c.astype(c_ref.dtype)
        h_ref[l] = h.astype(h_ref.dtype)
        x = h.astype(dt)

    logits = (jnp.dot(x, wp_ref[:], preferred_element_type=f32)
              + bp_ref[:].astype(f32))                   # [B, V] f32

    # per-token greedy log-probability (same math as _kernel serve mode)
    m = jnp.max(logits, axis=-1, keepdims=True)
    lp = -jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1))
    lps_ref[pl.ds(t, 1), :] = lp[None, :].astype(lps_ref.dtype)

    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ids_ref[pl.ds(t, 1), :] = ids[None, :]

    V = emb_ref.shape[0]
    B = feat_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    onehot = (lane == ids[:, None]).astype(dt)
    x_ref[:] = jnp.dot(onehot, emb_ref[:],
                       preferred_element_type=f32).astype(dt)

    if carry:
        @pl.when(t == T - 1)
        def _emit_state():
            hT_ref[:] = h_ref[:]
            cT_ref[:] = c_ref[:].astype(cT_ref.dtype)
            xT_ref[:] = x_ref[:]


def pack_int4_rows(q):
    """Pack an int4-valued int8/int4 array two-per-byte along axis 0:
    rows ``[0:r)`` in the low nibbles, rows ``[r:2r)`` in the high
    nibbles (row count must be even).  The split-half layout makes the
    kernel's unpack two shifts + one concat (no sublane interleave)."""
    q = jnp.asarray(q, jnp.int8)
    r = q.shape[0] // 2
    assert 2 * r == q.shape[0], "pack_int4_rows needs an even row count"
    low = q[:r] & jnp.int8(0x0F)
    high = jax.lax.shift_left(q[r:], jnp.int8(4))
    return (high | low).astype(jnp.int8)


def decode_sample_q_serve(features, qdec: dict, seq_len: int,
                          init_state=None, bits: int = 8):
    """Serve-mode decode (greedy ids + per-token logprobs [+ carried
    state]) against an int8-quantized decoder (``ops/quantize.py``
    ``quantize_lstm_decoder`` layout: fused ``lstm_q`` ``[in+H, 4H]``
    QTensors, pre-transposed ``linear.w`` ``[H, V]``, ``embed``
    ``[V, E]``).

    Same return contract as :func:`decode_sample` mode='serve'.
    ``bits=4``: payloads must be row-packed via :func:`pack_int4_rows`
    (scales unchanged); HBM weight reads drop to a quarter of bf16.
    """
    nl = len(qdec["lstm_q"])
    H = qdec["lstm_q"][0]["w"].q.shape[1] // 4
    embed_q = qdec["embed"]
    V, E = embed_q.q.shape
    dt = features.dtype
    carry = init_state is not None

    ins = [features]
    for lq in qdec["lstm_q"]:
        ins += [lq["w"].q, lq["w"].scale.reshape(1, -1).astype(jnp.float32),
                lq["b"].reshape(1, -1).astype(jnp.float32)]
    lin = qdec["linear"]
    ins += [lin["w"].q, lin["w"].scale.reshape(1, -1).astype(jnp.float32),
            jnp.asarray(lin["b"], jnp.float32).reshape(1, -1),
            embed_q.q, embed_q.scale.reshape(1, -1).astype(jnp.float32)]
    if carry:
        h0, c0, x0 = init_state
        ins += [h0.astype(dt), c0.astype(jnp.float32), x0.astype(dt)]

    B = features.shape[0]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((seq_len, B), jnp.int32),
                  jax.ShapeDtypeStruct((seq_len, B), jnp.float32)]
    out_specs = [pl.BlockSpec((seq_len, B), lambda t: (0, 0),
                              memory_space=pltpu.VMEM)] * 2
    if carry:
        for shape, odt in (((nl, B, H), dt), ((nl, B, H), jnp.float32),
                           ((B, E), dt)):
            out_shapes.append(jax.ShapeDtypeStruct(shape, odt))
            out_specs.append(pl.BlockSpec(
                shape, (lambda t: (0, 0, 0)) if len(shape) == 3
                else (lambda t: (0, 0)), memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((B, E), dt),                   # x carry
               pltpu.VMEM((nl, B, H), dt),               # h carry
               pltpu.VMEM((nl, B, H), jnp.float32)]      # c carry
    for lq in qdec["lstm_q"]:
        rows = lq["w"].q.shape[0] * (2 if bits == 4 else 1)
        scratch.append(pltpu.VMEM((rows, 4 * H), dt))    # dequant w
    wp_rows = lin["w"].q.shape[0] * (2 if bits == 4 else 1)
    emb_rows = V * (2 if bits == 4 else 1)
    scratch += [pltpu.VMEM((wp_rows, lin["w"].q.shape[1]), dt),
                pltpu.VMEM((emb_rows, E), dt)]
    # (bits=4 with an odd vocab: the packed embed carries one zero pad
    # row — emb_rows = V+1; ids never select it, logits use the exact-V
    # projection, so the one-hot feedback contraction is unaffected)

    outs = pl.pallas_call(
        functools.partial(_qserve_kernel, nl=nl, T=seq_len, carry=carry,
                          bits=bits),
        grid=(seq_len,),
        in_specs=[spec] * len(ins),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(*ins)

    ids = outs[0].T
    lps = outs[1].T
    if carry:
        return ids, lps, tuple(outs[2:5])
    return ids, lps


# ---------------------------------------------------------------------------
# Fused backward for mode 'sample_embed' (generator._kernel_sample_embed VJP)
# ---------------------------------------------------------------------------

def _embed_bwd_kernel(temp_ref, htop_ref, soft_ref, demb_ref, wp_ref,
                      wd_ref, dwp_ref, dbp_ref, dhtop_ref, *, interpret):
    """Matmul-only backward of softmax(temp·(logits+g)) @ WdT from the
    forward's saved bf16 soft residual — no PRNG replay, no exp/log: the
    regeneration variant measured 8% SLOWER end-to-end (docs/benchmarks.md
    round-3 matrix); a bf16 [B, V] read per step is ~10× cheaper than
    recomputing the softmax+Gumbel on the VPU.

    Per grid step (all in VMEM):
      d_soft   = d_emb @ WdT^T                      (MXU)
      d_logits = temp · soft · (d_soft − Σ d_soft·soft)   (VPU, cheap)
      dWp     += h_top^T @ d_logits                 (MXU accumulator)
      dbp     += Σ_B d_logits
      d_htop   = d_logits @ Wp^T                    (MXU)
    The [T, B, V] float32 intermediates XLA materializes for the same math
    (d_soft, d_logits — written and re-read from HBM around each consumer)
    never exist here.
    """
    t = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(t == 0)
    def _init():
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)

    h = htop_ref[0]                                       # [B, H] compute dt
    soft = soft_ref[0].astype(f32)                        # [B, V]
    de = demb_ref[0]                                      # [B, Ed]
    d_soft = jax.lax.dot_general(
        de, wd_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)                       # [B, V]
    inner = jnp.sum(d_soft * soft, axis=-1, keepdims=True)
    d_logits = temp_ref[0] * soft * (d_soft - inner)      # [B, V] f32

    dt = htop_ref.dtype
    dl_c = d_logits.astype(dt)
    dwp_ref[:] += jax.lax.dot_general(
        h, dl_c, (((0,), (0,)), ((), ())),
        preferred_element_type=f32).astype(dwp_ref.dtype)       # [H, V]
    dbp_ref[:] += jnp.sum(d_logits, axis=0).astype(
        dbp_ref.dtype)[None, :]
    dhtop_ref[0] = jax.lax.dot_general(
        dl_c, wp_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(dhtop_ref.dtype)     # [B, H]


def decode_sample_embed_bwd(h_top_tm, soft_tm, d_emb_tm, w_proj,
                            disc_embed, temperature):
    """Run the fused sample_embed backward kernel (generator-side grads).

    Args:
      h_top_tm: [T, B, H] top-layer LSTM outputs (forward residual).
      soft_tm:  [T, B, V] saved soft samples (forward residual, bf16).
      d_emb_tm: [T, B, Ed] cotangent of the fused disc embedding.
      w_proj:   [V, H] torch-layout projection weight.
      disc_embed: [Ed, V] disc embedding (torch layout).
      temperature: the forward's Gumbel temperature.
    Returns:
      (dwp [H, V] f32, dbp [V] f32, d_htop [T, B, H])
    """
    T, _, H = h_top_tm.shape
    ed = disc_embed.shape[0]
    V = w_proj.shape[0]
    dt = h_top_tm.dtype

    wp = w_proj.T.astype(dt)                               # [H, V]
    wdT = disc_embed.T.astype(dt)                          # [V, Ed]

    def _invoke(temp_arr, htop, soft, demb, wp_, wd_):
        B = htop.shape[1]
        return pl.pallas_call(
            functools.partial(_embed_bwd_kernel, interpret=_interpret()),
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),        # temp
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # h_top
                pl.BlockSpec((1, B, V), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # soft
                pl.BlockSpec((1, B, ed), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),        # d_emb
                pl.BlockSpec(memory_space=pltpu.VMEM),        # wp
                pl.BlockSpec(memory_space=pltpu.VMEM),        # wdT
            ],
            out_specs=(
                pl.BlockSpec((H, V), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, V), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, H), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((H, V), jnp.float32),
                jax.ShapeDtypeStruct((1, V), jnp.float32),
                jax.ShapeDtypeStruct((T, B, H), dt),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=_interpret(),
        )(temp_arr, htop, soft, demb, wp_, wd_)

    args = (jnp.asarray(temperature, jnp.float32).reshape(1),
            h_top_tm, soft_tm, d_emb_tm.astype(dt), wp, wdT)
    mesh = _data_mesh()
    if mesh is None:
        dwp, dbp, d_htop = _invoke(*args)
    else:
        from jax.sharding import PartitionSpec as P

        in_specs = (P(None), P(None, "data", None), P(None, "data", None),
                    P(None, "data", None), P(None, None), P(None, None))
        out_specs = (P(None, None), P(None, None), P(None, "data", None))

        def body(temp_arr, htop, soft, demb, wp_, wd_):
            dwp, dbp, d_htop = _invoke(temp_arr, htop, soft, demb, wp_, wd_)
            # weight grads are partial sums over the local batch
            return (jax.lax.psum(dwp, "data"), jax.lax.psum(dbp, "data"),
                    d_htop)

        dwp, dbp, d_htop = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False)(*args)
    return dwp, dbp[0], d_htop
