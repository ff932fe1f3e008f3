"""Serving-engine soak: randomized concurrent traffic against invariants.

The targeted race/fault tests (test_serving_engine.py) each pin one
scenario; this fuzz drives BOTH engines with a seeded random mix of
concurrent submitters, hot swaps and stats polls and checks the global
invariants: every admitted future resolves (correctly), nothing hangs,
the dispatcher survives, and counters stay consistent.
"""

import concurrent.futures
import os
import sys
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.models import generator as gen_lib
from gan_image_captioning_tpu.serving import (CoalescingBatcher,
                                              ContinuousBatcher,
                                              EngineOverloaded)


def _setup(n_feats=32):
    config = Config(vocab_size=96, gen_embed_dim=12, gen_hidden_dim=24,
                    gen_num_layers=1, max_seq_len=6)
    params = gen_lib.init_generator_params(jax.random.PRNGKey(7), config)
    feats = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (n_feats, 12))) * 0.5
    ref_ids = np.asarray(decode_lib.greedy(params, jnp.asarray(feats),
                                           config))
    return config, params, feats, ref_ids


def test_fuzz_continuous_concurrent_traffic():
    """8 concurrent clients × seeded random request sizes/pauses through a
    small slot pool with admission control: every admitted row's ids match
    the batch greedy decode; rejected+completed accounts for everything."""
    config, params, feats, ref_ids = _setup()
    eng = ContinuousBatcher(params, config, num_slots=3, chunk_steps=2,
                            max_pending=16)
    submitted, lock = [], threading.Lock()

    def client(cid):
        rng = np.random.default_rng(100 + cid)
        got = []
        for _ in range(12):
            idx = [int(i) for i in rng.integers(0, feats.shape[0],
                                                size=rng.integers(1, 4))]
            try:
                futs = eng.submit_many([feats[i] for i in idx])
            except EngineOverloaded:
                continue
            with lock:
                submitted.extend(zip(idx, futs))
            got.extend(zip(idx, futs))
            if rng.random() < 0.3:
                import time

                time.sleep(float(rng.random()) * 0.02)
        return got

    try:
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            list(pool.map(client, range(8)))
        for idx, fut in submitted:
            ids, lp = fut.result(timeout=60)   # nothing hangs
            np.testing.assert_array_equal(ids, ref_ids[idx])
            assert np.isfinite(lp)
        st = eng.stats()
        assert st["completed"] == len(submitted)
        assert st["queue_depth"] == 0 and st["active_slots"] == 0
    finally:
        eng.close()


def test_fuzz_coalescing_with_param_swaps():
    """Concurrent submitters while another thread hot-swaps the param tree
    (the coalescing reload mechanism): every caption matches ONE of the two
    models' greedy decodes — a swap mid-queue is allowed, a corrupted or
    hung result is not."""
    config, params, feats, ref_a = _setup()
    params_b = gen_lib.init_generator_params(jax.random.PRNGKey(8), config)
    ref_b = np.asarray(decode_lib.greedy(params_b, jnp.asarray(feats),
                                         config))
    current = {"params": params}

    def decode_fn(f):
        p = current["params"]
        ids = decode_lib.greedy(p, f, config)
        return ids, decode_lib.sequence_logprob(p, f, ids, config)

    eng = CoalescingBatcher(decode_fn, batch_size=4, feat_dim=12)
    stop = threading.Event()

    def swapper():
        rng = np.random.default_rng(0)
        while not stop.is_set():
            current["params"] = params_b if rng.random() < 0.5 else params
            stop.wait(0.01)

    t = threading.Thread(target=swapper)
    t.start()
    try:
        futs = [(i % feats.shape[0], eng.submit(feats[i % feats.shape[0]][None]))
                for i in range(64)]
        for idx, fut in futs:
            ids, _ = fut.result(timeout=60)
            ok_a = np.array_equal(ids[0], ref_a[idx])
            ok_b = np.array_equal(ids[0], ref_b[idx])
            assert ok_a or ok_b, f"row {idx}: ids from neither model"
        assert eng.requests == 64
    finally:
        stop.set()
        t.join()
        eng.close()


def test_fuzz_streaming_under_load():
    """Streaming callbacks under concurrent traffic: every streamed
    snapshot chain is prefix-monotone and ends with the resolved caption,
    even when rows from other requests interleave in the pool."""
    from gan_image_captioning_tpu.data.vocab import END

    config, params, feats, ref_ids = _setup()
    eng = ContinuousBatcher(params, config, num_slots=2, chunk_steps=2)
    events, lock = {}, threading.Lock()

    def on_tokens_for(key):
        def cb(j, ids, done):
            with lock:
                events.setdefault((key, j), []).append(
                    (np.asarray(ids).copy(), done))
        return cb

    try:
        futs = {}
        for k in range(10):
            idx = k % feats.shape[0]
            futs[(k, idx)] = eng.submit_many([feats[idx]],
                                             on_tokens=on_tokens_for(k))[0]
        for (k, idx), fut in futs.items():
            ids, _ = fut.result(timeout=60)
            evs = events.get((k, 0))
            assert evs, f"request {k} streamed nothing"
            for (a, _), (b, _) in zip(evs, evs[1:]):
                np.testing.assert_array_equal(a, b[:len(a)])
            ends = np.flatnonzero(np.asarray(ids) == END)
            upto = int(ends[0]) + 1 if ends.size else len(ids)
            np.testing.assert_array_equal(evs[-1][0], np.asarray(ids)[:upto])
    finally:
        eng.close()
