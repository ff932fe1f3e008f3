"""Distributed serving: decode programs sharded over a data-axis mesh.

The reference has no serving and no parallelism; here the serving leg
composes with the mesh layer — params replicate, batch/slot dims shard
over ``data``, and because decode rows are independent GSPMD inserts no
collectives (embarrassingly-parallel decode over ICI).  Equivalence is
the test: sharded == single-device, ids exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.models.generator import start_token_features
from gan_image_captioning_tpu.parallel.mesh import make_mesh
from gan_image_captioning_tpu.serving import ContinuousBatcher


def _cfg(**kw):
    ds = SyntheticCaptions("train", num_items=16)
    base = dict(vocab_size=ds.vocab_size, gen_embed_dim=8, gen_hidden_dim=12,
                max_seq_len=8, conditional_gan=0)
    base.update(kw)
    return Config(**base)


def _mesh(n=4):
    return make_mesh(f"data:{n}", devices=jax.devices()[:n])


def test_sharded_greedy_matches_single_device():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    feats = start_token_features(params["decoder"], 8)
    want_ids, want_lp = jax.jit(
        lambda p, f: decode_lib.greedy_with_logprobs(p, f, cfg))(params,
                                                                 feats)

    mesh = _mesh(4)
    p_rep = jax.device_put(params, NamedSharding(mesh, P()))
    f_sh = jax.device_put(feats, NamedSharding(mesh, P("data")))
    got_ids, got_lp = jax.jit(
        lambda p, f: decode_lib.greedy_with_logprobs(p, f, cfg))(p_rep, f_sh)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                               rtol=1e-5, atol=1e-5)


def test_sharded_beam_matches_single_device():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(1), cfg)
    feats = start_token_features(params["decoder"], 8)
    want, _ = jax.jit(lambda p, f: decode_lib.beam_search(
        p, f, cfg, beam_size=3))(params, feats)
    mesh = _mesh(4)
    p_rep = jax.device_put(params, NamedSharding(mesh, P()))
    f_sh = jax.device_put(feats, NamedSharding(mesh, P("data")))
    got, _ = jax.jit(lambda p, f: decode_lib.beam_search(
        p, f, cfg, beam_size=3))(p_rep, f_sh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("quantized", [False, True])
def test_continuous_batcher_under_mesh(quantized):
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    dparams = params
    if quantized:
        from gan_image_captioning_tpu.ops.quantize import quantize_generator

        dparams = quantize_generator(params, cfg)
    feats = np.asarray(start_token_features(params["decoder"], 6))
    want = np.asarray(decode_lib.greedy(dparams, jnp.asarray(feats), cfg))

    eng = ContinuousBatcher(dparams, cfg, num_slots=8, chunk_steps=4,
                            mesh=_mesh(4))
    try:
        futs = [eng.submit(feats[i]) for i in range(6)]
        for fut, want_row in zip(futs, want):
            ids, _lp = fut.result(timeout=120)
            np.testing.assert_array_equal(ids, want_row)
    finally:
        eng.close()


def test_continuous_batcher_rejects_indivisible_slots():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(3), cfg)
    with pytest.raises(ValueError):
        ContinuousBatcher(params, cfg, num_slots=6, mesh=_mesh(4))


def test_tp_sharded_greedy_matches_single_device():
    """Model-axis TP serving: vocab-dim-sharded params (training layout)
    through the scan decode == single-device, ids exactly."""
    from gan_image_captioning_tpu.serving import shard_serving_params

    cfg = _cfg(vocab_size=36)   # padded: TP shards V over model
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    feats = start_token_features(params["decoder"], 8)
    want_ids, want_lp = jax.jit(
        lambda p, f: decode_lib.greedy_with_logprobs(p, f, cfg))(params,
                                                                 feats)

    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    p_sh = shard_serving_params(params, mesh)
    # the vocab-dim tensors actually shard over model
    spec = p_sh["decoder"]["linear"]["w"].sharding.spec
    assert spec[0] == "model", spec
    f_sh = jax.device_put(feats, NamedSharding(mesh, P("data")))
    got_ids, got_lp = jax.jit(
        lambda p, f: decode_lib.greedy_with_logprobs(
            p, f, cfg, allow_kernel=False))(p_sh, f_sh)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_allclose(np.asarray(got_lp), np.asarray(want_lp),
                               rtol=1e-5, atol=1e-5)


def test_tp_sharded_beam_matches_single_device():
    """Beam search over TP-sharded (vocab-dim) params: the per-step top-K
    runs over GSPMD-partitioned logits — ids must still match exactly."""
    from gan_image_captioning_tpu.serving import shard_serving_params

    cfg = _cfg(vocab_size=36)   # padded: TP shards V over model
    params = api.init_generator(jax.random.PRNGKey(8), cfg)
    feats = start_token_features(params["decoder"], 4)
    want, want_sc = jax.jit(lambda p, f: decode_lib.beam_search(
        p, f, cfg, beam_size=3))(params, feats)

    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    p_sh = shard_serving_params(params, mesh)
    f_sh = jax.device_put(feats, NamedSharding(mesh, P("data")))
    got, got_sc = jax.jit(lambda p, f: decode_lib.beam_search(
        p, f, cfg, beam_size=3))(p_sh, f_sh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                               rtol=1e-5, atol=1e-5)


def test_continuous_batcher_under_tp_mesh():
    cfg = _cfg(vocab_size=36)   # padded: TP shards V over model
    params = api.init_generator(jax.random.PRNGKey(6), cfg)
    feats = np.asarray(start_token_features(params["decoder"], 6))
    want = np.asarray(decode_lib.greedy(params, jnp.asarray(feats), cfg))

    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    eng = ContinuousBatcher(params, cfg, num_slots=8, chunk_steps=4,
                            mesh=mesh)
    try:
        futs = [eng.submit(feats[i]) for i in range(6)]
        for fut, want_row in zip(futs, want):
            ids, _lp = fut.result(timeout=120)
            np.testing.assert_array_equal(ids, want_row)
    finally:
        eng.close()


def test_tp_sharded_int8_greedy_matches_single_device():
    """Int8 decoders shard under TP too: the [H, V] int8 projection (q and
    its [1, V] scales) and the [V, E] int8 embedding rows split over
    ``model``; ids must match the single-device int8 decode exactly."""
    from gan_image_captioning_tpu.ops.quantize import quantize_generator
    from gan_image_captioning_tpu.serving import shard_serving_params

    cfg = _cfg(vocab_size=36)   # padded: TP shards V over model
    params = api.init_generator(jax.random.PRNGKey(9), cfg)
    qparams = quantize_generator(params, cfg)
    feats = start_token_features(params["decoder"], 8)
    want = jax.jit(lambda p, f: decode_lib.greedy(p, f, cfg))(qparams, feats)

    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    q_sh = shard_serving_params(qparams, mesh)
    lw = q_sh["decoder"]["linear"]["w"]
    assert lw.q.sharding.spec[1] == "model", lw.q.sharding.spec
    assert lw.scale.sharding.spec[1] == "model", lw.scale.sharding.spec
    assert q_sh["decoder"]["embed"].q.sharding.spec[0] == "model"
    f_sh = jax.device_put(feats, NamedSharding(mesh, P("data")))
    got = jax.jit(lambda p, f: decode_lib.greedy(p, f, cfg))(q_sh, f_sh)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_continuous_batcher_int8_under_tp_mesh():
    from gan_image_captioning_tpu.ops.quantize import quantize_generator

    cfg = _cfg(vocab_size=36)   # padded: TP shards V over model
    params = api.init_generator(jax.random.PRNGKey(10), cfg)
    qparams = quantize_generator(params, cfg)
    feats = np.asarray(start_token_features(params["decoder"], 6))
    want = np.asarray(decode_lib.greedy(qparams, jnp.asarray(feats), cfg))

    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    eng = ContinuousBatcher(qparams, cfg, num_slots=8, chunk_steps=4,
                            mesh=mesh)
    try:
        futs = [eng.submit(feats[i]) for i in range(6)]
        for fut, want_row in zip(futs, want):
            ids, _lp = fut.result(timeout=120)
            np.testing.assert_array_equal(ids, want_row)
    finally:
        eng.close()


def test_model_only_mesh_slots_replicate():
    """A model-only mesh must NOT shard the slot axis (TP shards vocab,
    slots replicate) — any num_slots is accepted."""
    cfg = _cfg(vocab_size=36)   # padded: TP shards V over model
    params = api.init_generator(jax.random.PRNGKey(7), cfg)
    feats = np.asarray(start_token_features(params["decoder"], 3))
    want = np.asarray(decode_lib.greedy(params, jnp.asarray(feats), cfg))
    mesh = make_mesh("model:4", devices=jax.devices()[:4])
    eng = ContinuousBatcher(params, cfg, num_slots=3, chunk_steps=4,
                            mesh=mesh)
    try:
        futs = [eng.submit(feats[i]) for i in range(3)]
        for fut, want_row in zip(futs, want):
            ids, _lp = fut.result(timeout=120)
            np.testing.assert_array_equal(ids, want_row)
    finally:
        eng.close()


def test_inference_mesh_setup_gates_kernel():
    """The single decode-path gate for inference CLIs: TP axes rewrite
    --decode-impl kernel → decoupled and clear the kernel mesh; data-only
    meshes keep the kernel and install shard_map sharding."""
    from gan_image_captioning_tpu.kernels import decode_sample as dsk
    from gan_image_captioning_tpu.parallel.mesh import inference_mesh_setup

    cfg = _cfg(decode_impl="kernel", mesh="data:4,model:2")
    try:
        mesh, cfg2 = inference_mesh_setup(cfg)
        assert cfg2.decode_impl == "decoupled"
        assert dsk.get_mesh() is None

        cfg = _cfg(decode_impl="kernel", mesh="data:8")
        mesh, cfg2 = inference_mesh_setup(cfg)
        assert cfg2.decode_impl == "kernel"
        assert dsk.get_mesh() is mesh
    finally:
        dsk.set_mesh(None)


def test_evaluate_cli_under_tp_mesh(tmp_path, capsys):
    """src/evaluate.py --mesh data:4,model:2: sharded evaluation returns
    the same metrics as the single-device run."""
    import json

    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.evaluate import main

    cfg = _cfg(vocab_size=36)
    params = api.init_generator(jax.random.PRNGKey(11), cfg)
    ckpt = str(tmp_path / "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    argv = ["--checkpoint", ckpt, "--dataset", "synthetic",
            "--max-seq-len", "6", "--vocab-multiple", "2",
            "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
            "--conditional-gan", "0", "--pre-eval-batch-size", "8",
            "--num-workers", "1", "--max-batches", "2"]
    main(argv)
    want = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(argv + ["--mesh", "data:4,model:2"])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got == want


def test_transformer_slots_under_mesh():
    cfg = _cfg(gen_arch="transformer", gen_num_heads=2, gen_num_layers=2,
               gen_embed_dim=16, gen_hidden_dim=32)
    params = api.init_generator(jax.random.PRNGKey(4), cfg)
    feats = np.asarray(start_token_features(
        {"embed": params["decoder"]["embed"]}, 4))
    want = np.asarray(decode_lib.greedy(params, jnp.asarray(feats), cfg))
    eng = ContinuousBatcher(params, cfg, num_slots=4, chunk_steps=3,
                            mesh=_mesh(2))
    try:
        futs = [eng.submit(feats[i]) for i in range(4)]
        for fut, want_row in zip(futs, want):
            ids, _lp = fut.result(timeout=120)
            np.testing.assert_array_equal(ids, want_row)
    finally:
        eng.close()


def test_evaluate_adaptive_under_meshes(tmp_path, capsys):
    """--adaptive-chunk under a data-only mesh AND under a TP mesh (which
    must force the scan chunks off the kernel path) matches the
    single-device fixed-T metrics."""
    import json

    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.evaluate import main

    cfg = _cfg(vocab_size=36)
    params = api.init_generator(jax.random.PRNGKey(17), cfg)
    ckpt = str(tmp_path / "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    argv = ["--checkpoint", ckpt, "--dataset", "synthetic",
            "--max-seq-len", "6", "--vocab-multiple", "2",
            "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
            "--conditional-gan", "0", "--pre-eval-batch-size", "8",
            "--num-workers", "1", "--max-batches", "2"]
    main(argv)
    want = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for mesh in ("data:8", "data:4,model:2"):
        main(argv + ["--adaptive-chunk", "3", "--mesh", mesh])
        got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert got["nll_gen"] == want["nll_gen"], mesh
        assert got["bleu4"] == want["bleu4"], mesh


def test_serve_buckets_filtered_under_data_mesh(tmp_path):
    """--serve-buckets under a data mesh keeps only bucket shapes that
    divide the data axis (every dispatched batch splits over 'data');
    requests still serve correctly at the filtered shapes."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import pytest

    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = _cfg(vocab_size=36)
    params = api.init_generator(jax.random.PRNGKey(23), cfg)
    ckpt = str(tmp_path / "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    base = ["--checkpoint", ckpt, "--dataset", "synthetic",
            "--max-seq-len", "6", "--vocab-multiple", "2",
            "--gen-embed-dim", "8", "--gen-hidden-dim", "12",
            "--conditional-gan", "0", "--serve-batch-size", "8",
            "--num-workers", "1"]
    svc = CaptionService(parse_args(
        base + ["--serve-buckets", "auto", "--mesh", "data:4,model:2"]))
    assert svc.batcher.bucket_sizes == [4, 8]   # 1,2 dropped (data axis 4)
    resp = svc.handle_request({"n": 2})         # pads to the 4-bucket
    assert len(resp["captions"]) == 2
    st = svc.handle_request({"stats": True})
    assert st["coalescing"]["rows_dispatched"] % 4 == 0
    svc.batcher.close()

    # every bucket incompatible → explicit error, not silent fallback
    with pytest.raises(SystemExit):
        CaptionService(parse_args(
            base + ["--serve-buckets", "1,2", "--mesh", "data:4,model:2"]))
