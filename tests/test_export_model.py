"""AOT export (gan_image_captioning_tpu/export_api.py): the serialized
StableHLO decode program + bundled params must reproduce the direct decode
exactly after a save→load round trip, including with a symbolic batch
dimension, beam mode, conditional conditioning and the transformer arch.
The reference has no deployment path at all (inference commented out,
``main.py:49``)."""

import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu import export_api
from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.models import api


def _cfg(**kw):
    base = dict(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                max_seq_len=9)
    base.update(kw)
    return Config(**base)


def _roundtrip(tmp_path, cfg, params, anchor, **export_kw):
    exported = export_api.export_caption_program(params, cfg, **export_kw)
    path = os.path.join(str(tmp_path), "m.gic")
    export_api.save_artifact(path, exported, params,
                             {"mode": export_kw.get("mode", "greedy")})
    return export_api.load_artifact(path)


def test_greedy_roundtrip_matches_direct(tmp_path):
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    anchor = np.zeros((4,), np.int32)
    fn = export_api.build_caption_fn(cfg)
    ids_ref, sc_ref = fn(params, anchor)

    cap = _roundtrip(tmp_path, cfg, params, anchor, batch_size=4)
    ids, sc = cap(anchor)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc_ref), rtol=1e-6)


def test_symbolic_batch_serves_any_size(tmp_path):
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(1), cfg)
    cap = _roundtrip(tmp_path, cfg, params, None, batch_size=4,
                     symbolic_batch=True)
    fn = export_api.build_caption_fn(cfg)
    for b in (2, 5, 8):
        anchor = np.zeros((b,), np.int32)
        ids, _ = cap(anchor)
        ids_ref, _ = fn(params, anchor)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_beam_roundtrip_matches_direct(tmp_path):
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    anchor = np.zeros((3,), np.int32)
    fn = export_api.build_caption_fn(cfg, mode="beam", beam_size=3)
    ids_ref, sc_ref = fn(params, anchor)

    cap = _roundtrip(tmp_path, cfg, params, anchor, mode="beam",
                     beam_size=3, batch_size=3)
    ids, sc = cap(anchor)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc_ref), rtol=1e-5)


def test_conditional_export(tmp_path):
    cfg = _cfg(conditional_gan=1, image_size=32)
    params = api.init_generator(jax.random.PRNGKey(3), cfg)
    images = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    fn = export_api.build_caption_fn(cfg)
    ids_ref, _ = fn(params, images)

    cap = _roundtrip(tmp_path, cfg, params, images, batch_size=2)
    ids, _ = cap(images)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_transformer_export(tmp_path):
    cfg = _cfg(gen_arch="transformer", gen_embed_dim=16, gen_hidden_dim=32,
               gen_num_layers=2, gen_num_heads=2)
    params = api.init_generator(jax.random.PRNGKey(4), cfg)
    anchor = np.zeros((4,), np.int32)
    fn = export_api.build_caption_fn(cfg)
    ids_ref, _ = fn(params, anchor)

    cap = _roundtrip(tmp_path, cfg, params, anchor, batch_size=4)
    ids, _ = cap(anchor)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_param_flatten_roundtrip():
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    flat = export_api._flatten_params(params)
    rebuilt = export_api._unflatten_params(flat, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # missing leaf → clear error
    flat.pop(sorted(flat)[0])
    with pytest.raises(KeyError):
        export_api._unflatten_params(flat, params)


def test_newer_format_rejected(tmp_path):
    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(6), cfg)
    exported = export_api.export_caption_program(params, cfg, batch_size=2)
    path = os.path.join(str(tmp_path), "m.gic")
    export_api.save_artifact(path, exported, params,
                             {"format_version": export_api.FORMAT_VERSION + 1})
    with pytest.raises(ValueError, match="newer"):
        export_api.load_artifact(path)


def test_export_cli_and_exported_caption_cli(tmp_path):
    """End-to-end: export a checkpoint via the CLI (with --check), then
    decode from the artifact via `caption.py --exported` — captions match
    the checkpoint-driven caption CLI."""
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.caption import main as caption_main
    from src.export_model import main as export_main

    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(7), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)

    dims = ["--dataset", "synthetic", "--max-seq-len", "9",
            "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
            "--num-workers", "1"]
    artifact = os.path.join(str(tmp_path), "model.gic")
    export_main(["--checkpoint", ckpt, "--output", artifact,
                 "--symbolic-batch", "--check", *dims])
    assert os.path.isfile(artifact)

    # --check at a FIXED batch size uses the exported shape (regression:
    # it used to hardcode batch 2 and crash for any other fixed size)
    fixed = os.path.join(str(tmp_path), "fixed.gic")
    export_main(["--checkpoint", ckpt, "--output", fixed,
                 "--export-batch-size", "4", "--check", *dims])

    out_a = os.path.join(str(tmp_path), "a.jsonl")
    caption_main(["--exported", artifact, "--num-samples", "4",
                  "--output", out_a, *dims])
    lines = [json.loads(l) for l in open(out_a)]
    assert len(lines) == 4
    assert all("caption" in l and "logprob" in l for l in lines)

    # unconditional greedy is deterministic: artifact captions == ckpt ones
    out_b = os.path.join(str(tmp_path), "b.jsonl")
    caption_main(["--checkpoint", ckpt, "--num-samples", "4",
                  "--output", out_b, "--pre-eval-batch-size", "8", *dims])
    caps_a = [json.loads(l)["caption"] for l in open(out_a)]
    caps_b = [json.loads(l)["caption"] for l in open(out_b)]
    assert caps_a == caps_b


def test_exported_caption_cli_conditional(tmp_path):
    """caption.py --exported on a CONDITIONAL artifact: the artifact meta
    drives the dataset geometry (conditional batches with images at the
    exported image size) — regression for the missing meta plumbing."""
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.caption import main as caption_main
    from src.export_model import main as export_main

    cfg = _cfg(conditional_gan=1, image_size=32)
    params = api.init_generator(jax.random.PRNGKey(9), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)

    dims = ["--dataset", "synthetic", "--max-seq-len", "9",
            "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
            "--conditional-gan", "1", "--image-size", "32",
            "--num-workers", "1"]
    artifact = os.path.join(str(tmp_path), "cond.gic")
    export_main(["--checkpoint", ckpt, "--output", artifact,
                 "--symbolic-batch", "--check", *dims])

    out = os.path.join(str(tmp_path), "caps.jsonl")
    # NOTE: no --conditional-gan flag here — meta must supply it
    caption_main(["--exported", artifact, "--dataset", "synthetic",
                  "--num-samples", "3", "--num-workers", "1",
                  "--output", out])
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 3 and all("caption" in l for l in lines)


def test_serve_exported_matches_checkpoint_serving(tmp_path):
    """serve.py --exported: the coalescing engine dispatching the
    deserialized AOT program returns the same captions as checkpoint-driven
    serving; stats/chunking/reload work; mismatched artifacts are refused."""
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.export_model import main as export_main
    from src.serve import CaptionService, parse_args

    cfg = _cfg()
    params = api.init_generator(jax.random.PRNGKey(8), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)

    dims = ["--dataset", "synthetic", "--max-seq-len", "9",
            "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
            "--num-workers", "1"]
    artifact = os.path.join(str(tmp_path), "serve.gic")
    export_main(["--checkpoint", ckpt, "--output", artifact,
                 "--anchor", "features", "--symbolic-batch", "--check",
                 *dims])

    ref = CaptionService(parse_args(
        ["--checkpoint", ckpt, "--serve-batch-size", "4", *dims]))
    svc = CaptionService(parse_args(
        ["--exported", artifact, "--serve-batch-size", "4"]))
    try:
        a = svc.handle_request({"n": 3})
        b = ref.handle_request({"n": 3})
        assert a["captions"] == b["captions"]
        np.testing.assert_allclose(a["logprobs"], b["logprobs"], atol=1e-3)
        # chunking beyond the batch size
        big = svc.handle_request({"n": 6})
        assert len(big["captions"]) == 6
        # stats + reload (same artifact re-loaded)
        assert svc.handle_request({"stats": True})["coalescing"]["requests"] > 0
        out = svc.handle_request({"reload": artifact})
        assert out["reloaded"] == artifact
        assert svc.handle_request({"n": 1})["captions"] == a["captions"][:1]
        # a mismatched reload raises a CATCHABLE error (the transports map
        # it to an error response) and leaves the service serving
        wrong = os.path.join(str(tmp_path), "wrong.gic")
        export_main(["--checkpoint", ckpt, "--output", wrong,
                     "--anchor", "features", "--symbolic-batch",
                     "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
                     "--dataset", "synthetic", "--max-seq-len", "7",
                     "--num-workers", "1"])
        with pytest.raises(ValueError, match="geometry"):
            svc.handle_request({"reload": wrong})
        auto = os.path.join(str(tmp_path), "auto.gic")
        export_main(["--checkpoint", ckpt, "--output", auto,
                     "--symbolic-batch", *dims])
        with pytest.raises(ValueError, match="anchor features"):
            svc.handle_request({"reload": auto})
        assert svc.handle_request({"n": 1})["captions"] == a["captions"][:1]
    finally:
        svc.batcher.close()
        ref.batcher.close()

    # a non-serving artifact (anchor=auto) is refused AT STARTUP with a
    # clear SystemExit (inside requests the same validation is a
    # catchable ValueError — tested above)
    auto = os.path.join(str(tmp_path), "auto.gic")
    with pytest.raises(SystemExit, match="anchor features"):
        CaptionService(parse_args(["--exported", auto]))


def test_quantized_export_roundtrip_and_serving(tmp_path):
    """--quantize int8 artifacts: the exported program runs the
    int8-resident decoder with the fp <S>-feature row baked in —
    caption.py --exported and serve.py --exported reproduce the
    checkpoint-driven --quantize int8 paths exactly; int4 is refused."""
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models.generator import (
        start_token_features)
    from gan_image_captioning_tpu.ops.quantize import quantize_generator
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.export_model import main as export_main
    from src.serve import CaptionService, parse_args

    cfg = _cfg(quantize="int8")
    params = api.init_generator(jax.random.PRNGKey(10), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)

    dims = ["--dataset", "synthetic", "--max-seq-len", "9",
            "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
            "--quantize", "int8", "--num-workers", "1"]

    # self-contained artifact: ids == production quantized greedy
    # (fp start features + int8 decode, the src/caption.py convention)
    artifact = os.path.join(str(tmp_path), "q.gic")
    export_main(["--checkpoint", ckpt, "--output", artifact,
                 "--symbolic-batch", "--check", *dims])
    cap = export_api.load_artifact(artifact)
    assert cap.meta["quantize"] == "int8"
    ids, _ = cap(np.zeros((3,), np.int32))
    qp = quantize_generator(params, cfg)
    feats = start_token_features(params["decoder"], 3)
    ids_ref, _ = decode_lib.greedy_with_logprobs(qp, feats, cfg,
                                                 allow_kernel=False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))

    # serving artifact: quantized program + baked start row through the
    # engine == checkpoint-driven --quantize int8 serving
    sart = os.path.join(str(tmp_path), "qs.gic")
    export_main(["--checkpoint", ckpt, "--output", sart,
                 "--anchor", "features", "--symbolic-batch", *dims])
    ref = CaptionService(parse_args(
        ["--checkpoint", ckpt, "--serve-batch-size", "4", *dims]))
    svc = CaptionService(parse_args(
        ["--exported", sart, "--serve-batch-size", "4"]))
    try:
        a = svc.handle_request({"n": 2})
        b = ref.handle_request({"n": 2})
        assert a["captions"] == b["captions"]
    finally:
        svc.batcher.close()
        ref.batcher.close()

    # int4 NATIVE payloads cannot npz-round-trip — clear refusal with
    # GIC_INT4_PACK=0; the default exports via the packed int8 carrier
    os.environ["GIC_INT4_PACK"] = "0"
    try:
        with pytest.raises(SystemExit, match="int4"):
            export_main(["--checkpoint", ckpt, "--output",
                         os.path.join(str(tmp_path), "x.gic"),
                         "--symbolic-batch", "--dataset", "synthetic",
                         "--max-seq-len", "9", "--gen-embed-dim", "12",
                         "--gen-hidden-dim", "16", "--quantize", "int4",
                         "--num-workers", "1"])
    finally:
        os.environ.pop("GIC_INT4_PACK", None)


def test_int4_packed_export_roundtrip(tmp_path):
    """--quantize int4 exports via the row-packed int8 carrier and the
    artifact reproduces the checkpoint-driven packed-int4 greedy ids."""
    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models.generator import (
        start_token_features)
    from gan_image_captioning_tpu.ops.quantize import quantize_generator
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.export_model import main as export_main

    os.environ["GIC_INT4_PACK"] = "1"
    try:
        cfg = _cfg(quantize="int4")
        params = api.init_generator(jax.random.PRNGKey(11), cfg)
        ckpt = os.path.join(str(tmp_path), "gen4.ckpt")
        ckpt_lib.save_params(ckpt, params)
        dims = ["--dataset", "synthetic", "--max-seq-len", "9",
                "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
                "--quantize", "int4", "--num-workers", "1"]
        artifact = os.path.join(str(tmp_path), "q4.gic")
        export_main(["--checkpoint", ckpt, "--output", artifact,
                     "--symbolic-batch", "--check", *dims])
        cap = export_api.load_artifact(artifact)
        ids, _ = cap(np.zeros((3,), np.int32))
        qp = quantize_generator(params, cfg)
        feats = start_token_features(params["decoder"], 3)
        ids_ref, _ = decode_lib.greedy_with_logprobs(qp, feats, cfg,
                                                     allow_kernel=False)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    finally:
        os.environ.pop("GIC_INT4_PACK", None)
