"""Speculative greedy decoding: int8 draft + deferred-projection verify.

The reference decodes greedily one full step at a time
(``generator.py:60-76``: every token pays an LSTM step AND the
``[H, V]`` vocab projection).  On TPU the projection is the dominant
cost of the sequential scan path — at flagship geometry (H=512,
V=11008) it is ~11 MB of bf16 weight re-read from HBM per step, vs
~4 MB for the stacked LSTM gates.  Speculative decoding restructures
the loop so that projection cost is paid ONCE per block of K tokens:

1. **Draft**: a cheap twin of the generator (the int8 weight-only
   quantized decoder, ``ops/quantize.py`` — measured greedy token match
   1.0 at flagship geometry, docs/benchmarks.md) proposes ``K`` tokens
   sequentially at halved weight bandwidth.
2. **Verify**: the full-precision target runs ONLY its hidden-state
   recurrence over the ``K+1`` proposed inputs (cheap ``[B, E+H] @
   [E+H, 4H]`` gate matmuls inside a ``lax.scan``), then projects ALL
   ``K+1`` hidden states in ONE batched ``[ (K+1)·B, H ] @ [H, V]``
   matmul — an MXU-shaped contraction that reads the projection weights
   once per block instead of once per token.
3. **Accept**: the longest prefix of draft tokens matching the target's
   argmax survives; the first mismatch position yields the target's own
   corrected token (and a full match yields a bonus K+1-th token), so
   every block emits between 1 and K+1 tokens.

The output is **exactly** the target's greedy decode — for ANY draft —
because every emitted token is an argmax of target logits computed on
the accepted prefix; the draft only decides how many tokens each block
emits.  (Lossless speculative decoding, Leviathan et al. 2023 /
Chen et al. 2023, specialized to greedy argmax acceptance.)

Scope: the target must be a full-precision LSTM decoder (the deferred
projection exploits ``models/lstm.py:lstm_step``'s hidden/projection
split); the draft may be the int8 twin or any LSTM-family decoder.  The
weights-resident Pallas decode kernel already avoids per-step HBM
weight re-reads by parking weights in VMEM — speculation targets the
scan backends (CPU, large-vocab geometries past the VMEM budget,
quantized serving).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import lstm as lstm_lib


def speculative_greedy(gen_params: dict, draft_params: dict, features,
                       config: Config, seq_len: int = None,
                       draft_len: int = 4, early_stop: bool = False,
                       return_stats: bool = False):
    """Greedy ids ``[B, T]`` — bit-identical to the target's greedy decode,
    produced draft-first.

    Args:
      gen_params: full-precision generator (LSTM decoder — the target).
      draft_params: the proposal generator (e.g.
        ``ops.quantize.quantize_generator(gen_params, config)``); must be
        LSTM-family (lstm or lstm_q) — transformer drafts would need
        per-row KV positions.
      features: ``[B, E]`` t=0 inputs (image features / <S> embedding).
      draft_len: K — tokens proposed per block (static).
      return_stats: also return ``{"accepted": draft tokens accepted,
        "proposed": draft tokens proposed}`` (live rows only) — the
        acceptance-rate numerator/denominator for benchmarks.
      early_stop: end the while_loop once every row has committed an
        ``<E>`` instead of filling all T positions.  The caption (tokens
        through the first ``<E>``) and its masked logprob are unchanged;
        the tail beyond the ending block becomes ``<PAD>`` instead of the
        greedy continuation, so only full-T bit-compare consumers should
        leave this off (the serving/caption paths strip at ``<E>``).
    """
    from gan_image_captioning_tpu.eval.decode import make_stepper

    dec = gen_params["decoder"]
    if "lstm" not in dec:
        raise ValueError("speculative target must be a full-precision "
                         "LSTM decoder (got %s)" % sorted(dec))
    ddec = draft_params["decoder"]
    if not ("lstm" in ddec or "lstm_q" in ddec):
        raise ValueError("speculative draft must be LSTM-family")
    T = seq_len or config.seq_len
    K = int(draft_len)
    if K < 1:
        raise ValueError("draft_len must be >= 1")

    fused = lstm_lib.fuse_layer_params(dec["lstm"])
    layers = len(dec["lstm"])
    hidden = dec["lstm"][0]["w_hh"].shape[1]
    W, bb = dec["linear"]["w"], dec["linear"]["b"]  # [V, H], [V]
    tgt_embed = dec["embed"]
    draft = make_stepper(draft_params, config)

    B = features.shape[0]
    Tbuf = T + K + 1  # junk region for writes past T + one scratch column
    rows = jnp.arange(B)[:, None]
    jidx = jnp.arange(K + 1)

    # -- token 0: no speculation (both models consume the t=0 features)
    S = lstm_lib.zero_state(layers, B, hidden)
    h0, S = lstm_lib.lstm_step(fused, features, S)
    y = jnp.argmax(h0 @ W.T + bb, axis=-1).astype(jnp.int32)
    D = draft.init_state(B)
    _, D = draft.step(D, features, jnp.asarray(0, jnp.int32))
    buf = jnp.zeros((B, Tbuf), jnp.int32).at[:, 0].set(y)
    pos = jnp.ones((B,), jnp.int32)
    from gan_image_captioning_tpu.data.vocab import END
    ended = y == END

    def body(carry):
        S, D, y, pos, buf, ended, stats = carry

        # 1. draft proposes: K+1 sequential cheap steps from y
        def dstep(dc, _):
            Dst, prev = dc
            logits, Dst = draft.step(Dst, draft.embed(prev),
                                     jnp.asarray(0, jnp.int32))
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (Dst, nxt), (nxt, Dst)

        (_, _), (d_toks, Dstates) = jax.lax.scan(
            dstep, (D, y), None, length=K + 1)
        # d_toks [K+1, B]: d_1..d_{K+1}; Dstates[j] = state after
        # consuming y, d_1..d_j

        # 2. target verify: hidden recurrence over [y, d_1..d_K], then ONE
        #    batched projection of all K+1 hidden states
        xs = jnp.concatenate([tgt_embed[y][None], tgt_embed[d_toks[:K]]],
                             axis=0)  # [K+1, B, E]

        def vstep(St, x):
            h_top, St = lstm_lib.lstm_step(fused, x, St)
            return St, (h_top, St)

        _, (hs, Ss) = jax.lax.scan(vstep, S, xs)
        logits = hs @ W.T + bb                       # [K+1, B, V]
        p = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # p[j] = p_{j+1}

        # 3. accept the longest matching prefix; slot n gets the target's
        #    corrected (or bonus) token
        match = (d_toks[:K] == p[:K])                       # [K, B]
        acc = jnp.cumprod(match.astype(jnp.int32), axis=0)
        n = jnp.sum(acc, axis=0).astype(jnp.int32)          # [B] in 0..K
        block = jnp.where(jidx[:, None] < n[None], d_toks, p)  # [K+1, B]
        valid = (jidx[:, None] <= n[None])                  # [K+1, B]

        # 4. roll both models' states to the accepted prefix (per row)
        def sel_state(stacked):  # leaf [K+1, L, B, H] → [L, B, H] at n[b]
            m = jnp.moveaxis(stacked, 2, 0)          # [B, K+1, L, H]
            return jnp.moveaxis(m[jnp.arange(B), n], 0, 1)

        S2 = jax.tree_util.tree_map(sel_state, Ss)
        D2 = jax.tree_util.tree_map(sel_state, Dstates)
        y2 = jnp.take_along_axis(block, n[None], axis=0)[0]  # p at slot n

        # 5. emit: per-row positions pos..pos+n; invalid slots → scratch
        #    col; under early_stop rows that already committed <E> freeze
        positions = pos[:, None] + jidx[None, :]             # [B, K+1]
        if early_stop:
            live = valid.T & ~ended[:, None]
            pos2 = jnp.where(ended, pos, jnp.minimum(pos + n + 1, T))
        else:
            live = valid.T
            pos2 = jnp.minimum(pos + n + 1, T)
        wpos = jnp.where(live, jnp.minimum(positions, Tbuf - 2), Tbuf - 1)
        buf2 = buf.at[rows, wpos].set(block.T)
        ended2 = ended | (valid.T & (block.T == END)).any(axis=1)
        # acceptance stats over rows still decoding this block
        live_rows = pos < T
        if early_stop:
            live_rows &= ~ended
        stats2 = stats + jnp.asarray(
            [jnp.sum(jnp.where(live_rows, n, 0)),
             K * jnp.sum(live_rows.astype(jnp.int32))], jnp.int32)
        return S2, D2, y2, pos2, buf2, ended2, stats2

    def cond(carry):
        live = carry[3] < T
        if early_stop:
            live &= ~carry[5]
        return jnp.any(live)

    stats0 = jnp.zeros((2,), jnp.int32)
    *_, buf, _, stats = jax.lax.while_loop(
        cond, body, (S, D, y, pos, buf, ended, stats0))
    if return_stats:
        return buf[:, :T], {"accepted": stats[0], "proposed": stats[1]}
    return buf[:, :T]
