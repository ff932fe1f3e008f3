"""Coalescing + continuous-batching serving engine.

Correctness bar: a slot-decoded caption must be IDENTICAL to the batch
greedy decode of the same feature row, regardless of when it joined the
pool; coalescing must merge concurrent requests into fewer device
programs without changing any result.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.serving import (CoalescingBatcher,
                                              ContinuousBatcher,
                                              _masked_logprob_sum)


def _setup(b=6):
    config = Config(vocab_size=128, gen_embed_dim=16, gen_hidden_dim=32,
                    gen_num_layers=2, max_seq_len=7)
    params = gen_lib.init_generator_params(jax.random.PRNGKey(11), config)
    rng = jax.random.normal(jax.random.PRNGKey(3), (b, 16))
    feats = rng * 0.5
    return config, params, np.asarray(feats)


def test_continuous_matches_batch_greedy():
    config, params, feats = _setup(b=6)
    ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats), config))
    ref_lp = np.asarray(decode_lib.sequence_logprob(
        params, jnp.asarray(feats), jnp.asarray(ref_ids), config))

    eng = ContinuousBatcher(params, config, num_slots=3, chunk_steps=4)
    try:
        # staggered submission: more requests than slots, arriving over time
        futs = []
        for i in range(feats.shape[0]):
            futs.append(eng.submit(feats[i]))
            if i == 2:
                time.sleep(0.1)  # let the pool start mid-flight
        for i, fut in enumerate(futs):
            ids, lp = fut.result(timeout=30)
            np.testing.assert_array_equal(ids, ref_ids[i])
            np.testing.assert_allclose(lp, ref_lp[i], atol=1e-4)
    finally:
        eng.close()


def test_continuous_reuses_slots():
    config, params, feats = _setup(b=8)
    eng = ContinuousBatcher(params, config, num_slots=2, chunk_steps=7)
    try:
        futs = [eng.submit(feats[i]) for i in range(8)]
        ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                               config))
        for i, fut in enumerate(futs):
            ids, _ = fut.result(timeout=60)
            np.testing.assert_array_equal(ids, ref_ids[i])
    finally:
        eng.close()


def test_coalescing_merges_requests():
    config, params, feats = _setup(b=8)

    calls = []

    def decode_fn(f):
        time.sleep(0.15)  # make the device "busy" so later requests queue
        calls.append(f.shape[0])
        ids = decode_lib.greedy(params, f, config)
        lps = decode_lib.sequence_logprob(params, f, ids, config)
        return ids, lps

    eng = CoalescingBatcher(decode_fn, batch_size=4, feat_dim=16)
    try:
        futs = [eng.submit(feats[i:i + 1]) for i in range(8)]
        ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                               config))
        for i, fut in enumerate(futs):
            ids, _ = fut.result(timeout=60)
            np.testing.assert_array_equal(ids[0], ref_ids[i])
        assert eng.device_calls < 8, calls  # burst of 8 coalesced
        assert eng.requests == 8
    finally:
        eng.close()


def _end_rigged(config, params):
    """Decoder twin whose vocab projection bias makes <E> the argmax at
    every step — every greedy caption is [<E>, …] deterministically."""
    from gan_image_captioning_tpu.data.vocab import END

    b = np.asarray(params["decoder"]["linear"]["b"]).copy()
    b[END] += 100.0
    dec = dict(params["decoder"])
    dec["linear"] = dict(dec["linear"], b=jnp.asarray(b))
    return dict(params, decoder=dec)


def test_continuous_early_exit_releases_slots():
    """A slot whose chunk emitted <E> frees at that chunk boundary: with a
    1-slot pool and captions ending at t=0, N requests cost ~N chunks, not
    N * ceil(T/K); the returned tail is <PAD> and the logprob matches the
    reference mask semantics."""
    from gan_image_captioning_tpu.data.vocab import END

    config, params, feats = _setup(b=3)
    rig = _end_rigged(config, params)
    ref_lp = np.asarray(decode_lib.sequence_logprob(
        rig, jnp.asarray(feats),
        jnp.asarray(decode_lib.greedy(rig, jnp.asarray(feats), config)),
        config))

    eng = ContinuousBatcher(rig, config, num_slots=1, chunk_steps=2)
    try:
        futs = [eng.submit(feats[i]) for i in range(3)]
        for i, fut in enumerate(futs):
            ids, lp = fut.result(timeout=30)
            assert ids[0] == END
            np.testing.assert_array_equal(ids[1:], 0)
            np.testing.assert_allclose(lp, ref_lp[i], atol=1e-4)
        # full-T would need ceil(7/2)=4 chunks per caption (12 total);
        # early release needs 1 each (+ scheduling slack)
        assert eng.device_calls <= 6, eng.stats()
        assert eng.stats()["completed"] == 3
    finally:
        eng.close()


def test_continuous_exact_mode_bit_identity():
    """early_exit=False runs every slot the full T steps — ids are
    bit-identical to the batch greedy decode even when <E> fires at t=0."""
    config, params, feats = _setup(b=2)
    rig = _end_rigged(config, params)
    ref_ids = np.asarray(decode_lib.greedy(rig, jnp.asarray(feats), config))

    eng = ContinuousBatcher(rig, config, num_slots=2, chunk_steps=3,
                            early_exit=False)
    try:
        futs = [eng.submit(feats[i]) for i in range(2)]
        for i, fut in enumerate(futs):
            ids, _ = fut.result(timeout=30)
            np.testing.assert_array_equal(ids, ref_ids[i])
    finally:
        eng.close()


def test_coalescing_buckets():
    """With bucket_sizes, a lone request runs the smallest program that
    fits and a burst drains at mixed shapes; results are unchanged and
    padding_frac reflects only the final chunk's pad."""
    config, params, feats = _setup(b=8)
    shapes = []

    def decode_fn(f):
        shapes.append(f.shape[0])
        ids = decode_lib.greedy(params, f, config)
        return ids, decode_lib.sequence_logprob(params, f, ids, config)

    ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                           config))
    eng = CoalescingBatcher(decode_fn, batch_size=8, feat_dim=16,
                            bucket_sizes=[1, 2, 4])
    try:
        # lone request → the B=1 program
        ids, _ = eng.submit(feats[:1]).result(timeout=30)
        np.testing.assert_array_equal(ids[0], ref_ids[0])
        assert shapes[0] == 1
        # a 3-row request → the 4-bucket (pad 1), not the full-8 program
        ids, _ = eng.submit(feats[:3]).result(timeout=30)
        np.testing.assert_array_equal(ids, ref_ids[:3])
        assert shapes[1] == 4
        # a 5-row request → ONE program at the smallest fitting bucket (8):
        # a single dispatch beats splitting into 4+1 two-program drains
        ids, _ = eng.submit(feats[:5]).result(timeout=30)
        np.testing.assert_array_equal(ids, ref_ids[:5])
        assert shapes[2] == 8
        st = eng.stats()
        assert st["rows_requested"] == 9 and st["rows_dispatched"] == 13
        assert 0.30 < st["padding_frac"] < 0.31
    finally:
        eng.close()


def test_coalescing_bucket_validation():
    import pytest

    with pytest.raises(ValueError):
        CoalescingBatcher(lambda f: f, batch_size=4, feat_dim=8,
                          bucket_sizes=[2, 16])


def test_masked_logprob_sum():
    from gan_image_captioning_tpu.data.vocab import END

    ids = np.array([[5, END, 7, END], [3, 4, 5, 6]])
    lps = np.array([[-1.0, -2.0, -4.0, -8.0], [-1.0, -1.0, -1.0, -1.0]])
    out = _masked_logprob_sum(ids, lps)
    np.testing.assert_allclose(out, [-3.0, -4.0])


# --------------------------------------------- speculative continuous slots

def test_speculative_slots_match_batch_greedy():
    """Slot-based speculation is target-exact for ANY draft: a perfect
    draft (the target itself) and a garbage draft (random params) must
    both serve the batch-greedy captions."""
    import jax as _jax

    from gan_image_captioning_tpu.models import generator as gen_lib

    config, params, feats = _setup(b=6)
    ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                           config))
    ref_lp = np.asarray(decode_lib.sequence_logprob(
        params, jnp.asarray(feats), jnp.asarray(ref_ids), config))

    bad_draft = {"decoder": gen_lib.init_decoder_params(
        _jax.random.PRNGKey(99), config)}
    for draft in (params, bad_draft):
        eng = ContinuousBatcher(params, config, num_slots=3, chunk_steps=3,
                                early_exit=False, draft_params=draft)
        try:
            futs = []
            for i in range(feats.shape[0]):
                futs.append(eng.submit(feats[i]))
                if i == 2:
                    time.sleep(0.1)  # join mid-flight
            for i, fut in enumerate(futs):
                ids, lp = fut.result(timeout=60)
                np.testing.assert_array_equal(ids, ref_ids[i])
                np.testing.assert_allclose(lp, ref_lp[i], atol=1e-4)
        finally:
            eng.close()


def test_speculative_slots_perfect_draft_accepts_all():
    """With the target as its own draft every block commits K+1 tokens —
    the stat the speculation win is measured by."""
    config, params, feats = _setup(b=4)
    eng = ContinuousBatcher(params, config, num_slots=4, chunk_steps=2,
                            early_exit=False, draft_params=params)
    try:
        futs = [eng.submit(feats[i]) for i in range(4)]
        for fut in futs:
            fut.result(timeout=60)
        st = eng.stats()
        assert st["tokens_per_slot_chunk"] == 3.0  # K+1 every block
    finally:
        eng.close()


def test_speculative_slots_int8_draft():
    """The production pairing: int8 quantized twin drafts, full-precision
    target verifies (early exit on)."""
    from gan_image_captioning_tpu.ops.quantize import quantize_generator

    config, params, feats = _setup(b=5)
    draft = quantize_generator(params, config)
    ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                           config))
    eng = ContinuousBatcher(params, config, num_slots=2, chunk_steps=4,
                            draft_params=draft)
    try:
        futs = [eng.submit(feats[i]) for i in range(5)]
        from gan_image_captioning_tpu.data.vocab import END
        for i, fut in enumerate(futs):
            ids, _ = fut.result(timeout=60)
            want = ref_ids[i].copy()
            hits = np.flatnonzero(want == END)
            if hits.size:
                want[hits[0] + 1:] = 0
            np.testing.assert_array_equal(ids, want)
    finally:
        eng.close()


def test_close_fails_stranded_requests():
    """close() resolves undispatched/in-flight requests with an error —
    a client blocked on submit().result() must not hang to its timeout."""
    import concurrent.futures
    import pytest

    config, params, feats = _setup(b=2)

    block = threading.Event()

    def slow_decode(f):
        block.wait(timeout=10)
        ids = decode_lib.greedy(params, f, config)
        return ids, decode_lib.sequence_logprob(params, f, ids, config)

    eng = CoalescingBatcher(slow_decode, batch_size=2, feat_dim=16)
    f1 = eng.submit(feats[:1])      # dispatcher picks this up and blocks
    time.sleep(0.2)
    f2 = eng.submit(feats[:1])      # stays queued
    eng._stop = True
    block.set()
    eng.close()
    f1.result(timeout=10)           # was in flight: completes
    with pytest.raises(RuntimeError):
        f2.result(timeout=10)

    cb = ContinuousBatcher(params, config, num_slots=1, chunk_steps=2)
    f3 = cb.submit(feats[0])
    cb.close()
    with pytest.raises((RuntimeError, concurrent.futures.TimeoutError)):
        # either failed by close() or (rarely) already finished — only a
        # HANG is a bug; a completed result is fine
        r = f3.exception(timeout=10)
        if r is None:
            raise concurrent.futures.TimeoutError  # completed fine
        raise r


def test_submit_after_close_raises_immediately():
    """A submit() racing past close()'s queue drain would strand its
    future until the client's own 120 s timeout — both engines must
    reject post-close submits synchronously instead."""
    import pytest

    config, params, feats = _setup(b=2)

    def decode_fn(f):
        ids = decode_lib.greedy(params, f, config)
        return ids, decode_lib.sequence_logprob(params, f, ids, config)

    eng = CoalescingBatcher(decode_fn, batch_size=2, feat_dim=16)
    eng.submit(feats[:1]).result(timeout=60)
    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(feats[:1])

    cb = ContinuousBatcher(params, config, num_slots=1, chunk_steps=2)
    cb.submit(feats[0]).result(timeout=60)
    cb.close()
    with pytest.raises(RuntimeError, match="closed"):
        cb.submit(feats[0])


def test_close_races_live_dispatcher_commit():
    """close() while the dispatcher is mid-_advance: the slot lock keeps
    _fail_active_slots and the commit loop from double-resolving (or
    resolving through a nulled future) — the dispatcher thread must
    survive to process nothing further, and the request must resolve
    exactly once (result or error, never a hang or thread crash)."""
    config, params, feats = _setup(b=2)

    release = threading.Event()
    base_advance = {}

    cb = ContinuousBatcher(params, config, num_slots=1, chunk_steps=2)
    base_advance["fn"] = cb._advance

    def slow_advance(state, x, tvec):
        release.wait(timeout=10)   # hold the dispatcher mid-chunk
        return base_advance["fn"](state, x, tvec)

    cb._advance = slow_advance
    fut = cb.submit(feats[0])
    time.sleep(0.3)                # dispatcher enters slow_advance
    t = threading.Thread(target=cb.close)
    t.start()
    time.sleep(0.2)
    release.set()                  # dispatcher finishes while close() runs
    t.join(timeout=30)
    assert not t.is_alive()
    # exactly-once resolution: the future must be settled (result by the
    # commit loop or error by close) — never left pending, and reading it
    # must not surface InvalidStateError/AttributeError from the threads
    fut.exception(timeout=10)
    assert fut.done()


def test_admission_control_rejects_fast():
    """max_pending: a full pending queue rejects new submits immediately
    (EngineOverloaded) instead of queueing them toward a client timeout;
    already-admitted requests still complete."""
    import pytest

    from gan_image_captioning_tpu.serving import EngineOverloaded

    config, params, feats = _setup(b=2)

    block = threading.Event()

    def slow_decode(f):
        block.wait(timeout=10)
        ids = decode_lib.greedy(params, f, config)
        return ids, decode_lib.sequence_logprob(params, f, ids, config)

    eng = CoalescingBatcher(slow_decode, batch_size=2, feat_dim=16,
                            max_pending=2)
    f1 = eng.submit(feats[:1])      # dispatcher picks this up and blocks
    time.sleep(0.2)
    f2 = eng.submit(feats[:1])      # queued (1)
    f3 = eng.submit(feats[:1])      # queued (2) — at max_pending
    with pytest.raises(EngineOverloaded):
        eng.submit(feats[:1])
    assert eng.stats()["rejected"] == 1
    block.set()
    for f in (f1, f2, f3):
        f.result(timeout=20)        # admitted work completes
    eng.close()

    # continuous engine: the whole multi-row request admits atomically
    cb = ContinuousBatcher(params, config, num_slots=1, chunk_steps=2,
                           max_pending=2)
    rows = [feats[0]] * 3
    with pytest.raises(EngineOverloaded):
        cb.submit_many(rows)        # 3 rows > max_pending=2: none queued
    assert cb.stats()["queue_depth"] == 0 and cb.stats()["rejected"] == 3
    futs = cb.submit_many(rows[:2])
    for f in futs:
        f.result(timeout=30)
    cb.close()


def test_streaming_callback_progress():
    """on_tokens streams per-chunk progress: the sequence of ids_so_far
    snapshots is prefix-monotone, the final snapshot equals the resolved
    caption (through its first <E>), and with T > chunk_steps at least one
    INTERMEDIATE (done=False) event fires.  Callback errors never touch
    the future."""
    from gan_image_captioning_tpu.data.vocab import END

    config, params, feats = _setup(b=2)
    eng = ContinuousBatcher(params, config, num_slots=2, chunk_steps=2)
    try:
        events = []

        def on_tokens(j, ids, done):
            events.append((j, np.asarray(ids).copy(), done))
            raise RuntimeError("stream consumer bug")  # must be swallowed

        futs = eng.submit_many([feats[0], feats[1]], on_tokens=on_tokens)
        results = [f.result(timeout=30) for f in futs]
        for j in range(2):
            evs = [(ids, done) for (r, ids, done) in events if r == j]
            assert evs, f"row {j} streamed nothing"
            assert any(not done for _, done in evs) or len(evs[0][0]) >= \
                config.seq_len, "no intermediate event despite chunk < T"
            # prefix-monotone snapshots
            for (a, _), (b, _) in zip(evs, evs[1:]):
                np.testing.assert_array_equal(a, b[:len(a)])
            assert evs[-1][1] is True
            final_ids, _ = results[j]
            ends = np.flatnonzero(np.asarray(final_ids) == END)
            upto = int(ends[0]) + 1 if ends.size else len(final_ids)
            np.testing.assert_array_equal(evs[-1][0],
                                          np.asarray(final_ids)[:upto])
    finally:
        eng.close()


def test_streaming_service_request(tmp_path):
    """{"stream": true} through the service: intermediate partial lines
    then the standard final response; coalescing-only service refuses."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=16, gen_hidden_dim=32,
                 gen_num_layers=2, max_seq_len=5)
    params = gen_lib.init_generator_params(jax.random.PRNGKey(4), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    args = parse_args([
        "--checkpoint", ckpt, "--dataset", "synthetic", "--max-seq-len", "5",
        "--gen-embed-dim", "16", "--gen-hidden-dim", "32",
        "--gen-num-layers", "2", "--serve-batch-size", "2",
        "--serve-continuous", "--serve-chunk-steps", "2"])
    svc = CaptionService(args)
    try:
        lines = []
        resp = svc.handle_request({"n": 2, "stream": True},
                                  emit=lines.append)
        assert len(resp["captions"]) == 2
        partials = [l for l in lines if "partial" in l]
        assert partials, "no streamed lines"
        assert {l["row"] for l in partials} == {0, 1}
        # each row's final streamed partial IS the final caption (both are
        # words of the stripped ids through the first <E>)
        for j in range(2):
            row_parts = [l for l in partials if l["row"] == j]
            assert row_parts[-1]["done"] is True
            assert row_parts[-1]["partial"] == resp["captions"][j]
        # no emit channel → clear refusal
        assert "error" in svc.handle_request({"n": 1, "stream": True})
    finally:
        svc.continuous.close()
        svc.batcher.close()


def test_streaming_single_submit_two_arg_callback():
    """submit()'s documented on_tokens(ids, done) arity works (regression:
    it used to be invoked with three args and silently never fire)."""
    config, params, feats = _setup(b=1)
    eng = ContinuousBatcher(params, config, num_slots=1, chunk_steps=2)
    try:
        events = []
        fut = eng.submit(feats[0],
                         on_tokens=lambda ids, done: events.append(done))
        fut.result(timeout=30)
        assert events and events[-1] is True
    finally:
        eng.close()
