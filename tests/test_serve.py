"""Caption service (in-process): request handling, chunking, error paths."""

import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    # make a tiny checkpoint on disk
    tmp = str(tmp_path_factory.mktemp("serve"))
    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(0), cfg)
    ckpt = os.path.join(tmp, "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)

    args = parse_args([
        "--checkpoint", ckpt, "--dataset", "synthetic", "--max-seq-len", "9",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--serve-batch-size", "4", "--beam-size", "2"])
    return CaptionService(args)


def test_unconditional_request(service):
    resp = service.handle_request({"n": 3})
    assert len(resp["captions"]) == 3 and len(resp["logprobs"]) == 3
    assert all(isinstance(c, str) for c in resp["captions"])
    assert resp["latency_ms"] > 0


def test_chunked_request_exceeds_batch(service):
    resp = service.handle_request({"n": 9})  # 9 > serve_batch_size=4
    assert len(resp["captions"]) == 9
    # deterministic decode → duplicate feature rows give duplicate captions
    assert resp["captions"][0] == resp["captions"][4]


def test_image_request_on_unconditional_checkpoint(service):
    resp = service.handle_request({"image": "/nonexistent.jpg"})
    assert "error" in resp


def test_image_requests_conditional(tmp_path):
    """Conditional serving: single path and multi-image list requests
    through the real image-preprocess + encoder-conditioning path."""
    import sys

    import PIL.Image

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        p = os.path.join(str(tmp_path), f"im{i}.jpg")
        PIL.Image.fromarray(
            rng.randint(0, 255, (40, 32, 3), np.uint8)).save(p)
        paths.append(p)

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9, conditional_gan=1, image_size=32)
    params = api.init_generator(jax.random.PRNGKey(2), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params, sync=True)
    svc = CaptionService(parse_args([
        "--checkpoint", ckpt, "--dataset", "synthetic",
        "--conditional-gan", "1", "--image-size", "32",
        "--max-seq-len", "9", "--gen-embed-dim", "12",
        "--gen-hidden-dim", "16", "--serve-batch-size", "4"]))
    one = svc.handle_request({"image": paths[0]})
    assert len(one["captions"]) == 1
    many = svc.handle_request({"image": paths})
    assert len(many["captions"]) == 3 and len(many["logprobs"]) == 3
    # row 0 of the batched request matches the single-path request
    assert many["captions"][0] == one["captions"][0]
    assert "error" in svc.handle_request({"image": []})


def test_speculative_mode_matches_greedy(tmp_path):
    """--decode-mode speculative serves the SAME captions/logprobs as
    greedy serving (lossless speculation through the coalescing engine)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(3), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    base = ["--checkpoint", ckpt, "--dataset", "synthetic",
            "--max-seq-len", "9", "--gen-embed-dim", "12",
            "--gen-hidden-dim", "16", "--serve-batch-size", "4"]
    greedy_svc = CaptionService(parse_args(base + ["--decode-mode",
                                                   "greedy"]))
    want = greedy_svc.handle_request({"n": 4})
    spec_svc = CaptionService(parse_args(base + ["--decode-mode",
                                                 "speculative",
                                                 "--draft-len", "3"]))
    got = spec_svc.handle_request({"n": 4})
    assert got["captions"] == want["captions"]
    np.testing.assert_allclose(got["logprobs"], want["logprobs"], atol=1e-3)


def test_stats_request_and_buckets(tmp_path):
    """{"stats": true} reports dispatcher counters; --serve-buckets auto
    serves a lone request at the 1-row program instead of the full batch."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(5), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    svc = CaptionService(parse_args([
        "--checkpoint", ckpt, "--dataset", "synthetic", "--max-seq-len", "9",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--serve-batch-size", "4", "--serve-buckets", "auto",
        "--serve-continuous"]))
    assert svc.batcher.bucket_sizes == [1, 2, 4]

    resp = svc.handle_request({"n": 1})      # continuous path (1 slot)
    assert len(resp["captions"]) == 1
    st = svc.handle_request({"stats": True})
    assert "coalescing" in st and "continuous" in st
    # with --serve-continuous every caption request (warmup included)
    # takes the slot pool; the coalescing dispatcher stays idle
    assert st["coalescing"]["rows_dispatched"] == 0
    assert st["continuous"]["completed"] >= 2
    assert 0.0 < st["continuous"]["occupancy"] <= 1.0


def test_adaptive_chunk_serves_same_captions(tmp_path):
    """--serve-adaptive-chunk K serves the same captions/logprobs as the
    fixed full-T greedy program (early-stopping while_loop decode)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(9), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    base = ["--checkpoint", ckpt, "--dataset", "synthetic",
            "--max-seq-len", "9", "--gen-embed-dim", "12",
            "--gen-hidden-dim", "16", "--serve-batch-size", "4"]
    want = CaptionService(parse_args(base)).handle_request({"n": 4})
    got = CaptionService(parse_args(
        base + ["--serve-adaptive-chunk", "4"])).handle_request({"n": 4})
    assert got["captions"] == want["captions"]
    np.testing.assert_allclose(got["logprobs"], want["logprobs"], atol=1e-3)


def test_speculative_continuous_service(tmp_path):
    """--serve-continuous --decode-mode speculative: slot-based int8-draft
    speculation serves the same captions as greedy serving."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(13), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    base = ["--checkpoint", ckpt, "--dataset", "synthetic",
            "--max-seq-len", "9", "--gen-embed-dim", "12",
            "--gen-hidden-dim", "16", "--serve-batch-size", "4"]
    want = CaptionService(parse_args(base)).handle_request({"n": 4})
    svc = CaptionService(parse_args(base + [
        "--decode-mode", "speculative", "--draft-len", "3",
        "--serve-continuous"]))
    got = svc.handle_request({"n": 4})
    assert got["captions"] == want["captions"]
    np.testing.assert_allclose(got["logprobs"], want["logprobs"], atol=1e-3)
    st = svc.handle_request({"stats": True})
    assert st["continuous"]["tokens_per_slot_chunk"] >= 1.0


def _tiny_service_ckpts(tmp_path, continuous=False):
    """Two differently-initialized checkpoints + a service on the first."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    paths = []
    for i, seed in enumerate((0, 21)):
        params = api.init_generator(jax.random.PRNGKey(seed), cfg)
        p = os.path.join(str(tmp_path), f"gen{i}.ckpt")
        ckpt_lib.save_params(p, params)
        paths.append(p)
    base = ["--checkpoint", paths[0], "--dataset", "synthetic",
            "--max-seq-len", "9", "--gen-embed-dim", "12",
            "--gen-hidden-dim", "16", "--serve-batch-size", "4"]
    if continuous:
        base += ["--serve-continuous", "--serve-chunk-steps", "4"]
    svc = CaptionService(parse_args(base))
    return svc, paths, base


def test_hot_reload_swaps_model(tmp_path):
    """{"reload": ckpt}: the service serves the NEW checkpoint's captions
    with zero downtime; a bad path fails the request but not the service;
    an independently-started service on ckpt B is the reference."""
    from src.serve import CaptionService, parse_args

    svc, (p0, p1), base = _tiny_service_ckpts(tmp_path)
    before = svc.handle_request({"n": 3})
    want = CaptionService(parse_args(
        [a if a != p0 else p1 for a in base])).handle_request({"n": 3})

    # a failed reload leaves the old model serving
    bad = os.path.join(str(tmp_path), "missing.ckpt")
    try:
        svc.handle_request({"reload": bad})
        assert False, "missing checkpoint must raise"
    except FileNotFoundError:
        pass
    assert svc.handle_request({"n": 3})["captions"] == before["captions"]

    resp = svc.handle_request({"reload": p1})
    assert resp["reloaded"] == p1
    after = svc.handle_request({"n": 3})
    assert after["captions"] == want["captions"]
    assert after["captions"] != before["captions"]  # distinct inits differ
    np.testing.assert_allclose(after["logprobs"], want["logprobs"],
                               atol=1e-4)
    assert svc.handle_request({"stats": True})["checkpoint"] == p1


def test_hot_reload_continuous_engine(tmp_path):
    """Reload under --serve-continuous: the slot engine is rebuilt and
    swapped; the old engine drains and closes; captions match a fresh
    service on the new checkpoint."""
    from src.serve import CaptionService, parse_args

    svc, (p0, p1), base = _tiny_service_ckpts(tmp_path, continuous=True)
    old_engine = svc.continuous
    want = CaptionService(parse_args(
        [a if a != p0 else p1 for a in base])).handle_request({"n": 4})
    svc.handle_request({"reload": p1})
    assert svc.continuous is not old_engine
    # the superseded engine is closed: new submits must be refused
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        old_engine.submit(np.zeros((12,), np.float32))
    got = svc.handle_request({"n": 4})
    assert got["captions"] == want["captions"]


def test_serve_watch_auto_reloads(tmp_path):
    """--serve-watch: overwriting the serving checkpoint on disk hot-swaps
    the model within a few poll intervals (stability-gated)."""
    import time

    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

    svc, (p0, _), _ = _tiny_service_ckpts(tmp_path)
    before = svc.handle_request({"n": 2})["captions"]
    svc.start_watch(0.05)

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    ckpt_lib.save_params(p0, api.init_generator(jax.random.PRNGKey(21), cfg),
                         sync=True)
    deadline = time.time() + 20
    after = before
    try:
        while after == before and time.time() < deadline:
            time.sleep(0.1)
            after = svc.handle_request({"n": 2})["captions"]
    finally:
        svc.stop_watch()   # don't leave a 20 Hz poller for the whole suite
    assert after != before, "watcher never reloaded the rewritten checkpoint"


def test_http_front_end(tmp_path):
    """--http-port: POST / caption requests, GET /stats and /healthz."""
    import json as _json
    import sys
    import threading
    import urllib.error
    import urllib.request

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, make_http_server, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(21), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    svc = CaptionService(parse_args([
        "--checkpoint", ckpt, "--dataset", "synthetic", "--max-seq-len", "9",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--serve-batch-size", "4"]))
    srv = make_http_server(svc, 0)          # ephemeral port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert _json.load(r)["status"] == "ok"
        req = urllib.request.Request(
            base + "/", data=_json.dumps({"n": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _json.load(r)
        assert len(out["captions"]) == 2 and len(out["logprobs"]) == 2
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            st = _json.load(r)
        assert "coalescing" in st
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            prom = r.read().decode()
        assert 'gic_serving_requests{engine="coalescing"}' in prom
        assert 'gic_serving_rejected{engine="coalescing"}' in prom
        # malformed body → 400 with an error payload
        bad = urllib.request.Request(base + "/", data=b"{nope",
                                     headers={"Content-Type":
                                              "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_error_codes_and_dual_ports(service):
    """Server-side faults are 500 (not 400); GET handlers never abort the
    connection replyless; --port and --http-port compose (both front ends
    share one service)."""
    import json as _json
    import socket
    import socketserver
    import threading
    import urllib.error
    import urllib.request

    from src.serve import make_http_server

    srv = make_http_server(service, 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    real_handle = service.handle_request
    try:
        # an engine fault (anything handle_request raises) is a 500
        def boom(req):
            raise RuntimeError("engine fault")
        service.handle_request = boom
        req = urllib.request.Request(
            base + "/", data=_json.dumps({"n": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 500
        assert "engine fault" in _json.load(e.value)["error"]
        # GET /stats with a raising handler: a 500 RESPONSE, not a dropped
        # connection
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(base + "/stats", timeout=30)
        assert e.value.code == 500
    finally:
        service.handle_request = real_handle
        srv.shutdown()
        srv.server_close()

    # --port + --http-port compose: mirror main()'s wiring — TCP in a
    # daemon thread next to the HTTP server, both over the same service
    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                resp = service.handle_request(_json.loads(line))
                self.wfile.write((_json.dumps(resp) + "\n").encode())
                self.wfile.flush()

    tcp = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    http = make_http_server(service, 0)
    threading.Thread(target=tcp.serve_forever, daemon=True).start()
    threading.Thread(target=http.serve_forever, daemon=True).start()
    try:
        with socket.create_connection(("127.0.0.1",
                                       tcp.server_address[1]), 30) as s:
            s.sendall(b'{"n": 1}\n')
            line = s.makefile().readline()
        assert len(_json.loads(line)["captions"]) == 1
        req = urllib.request.Request(
            f"http://127.0.0.1:{http.server_address[1]}/",
            data=_json.dumps({"n": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert len(_json.load(r)["captions"]) == 1
    finally:
        tcp.shutdown(); tcp.server_close()
        http.shutdown(); http.server_close()


def test_http_streaming_chunked(tmp_path):
    """{"stream": true} over HTTP: chunked NDJSON — partial lines per
    decode chunk, then the standard final response; non-stream requests
    and error codes unaffected."""
    import json as _json
    import sys
    import threading
    import urllib.request

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train import checkpoint as ckpt_lib
    from src.serve import CaptionService, make_http_server, parse_args

    cfg = Config(vocab_size=35, gen_embed_dim=12, gen_hidden_dim=16,
                 gen_num_layers=1, max_seq_len=9)
    params = api.init_generator(jax.random.PRNGKey(22), cfg)
    ckpt = os.path.join(str(tmp_path), "gen.ckpt")
    ckpt_lib.save_params(ckpt, params)
    svc = CaptionService(parse_args([
        "--checkpoint", ckpt, "--dataset", "synthetic", "--max-seq-len", "9",
        "--gen-embed-dim", "12", "--gen-hidden-dim", "16",
        "--gen-num-layers", "1", "--serve-batch-size", "2",
        "--serve-continuous", "--serve-chunk-steps", "2"]))
    srv = make_http_server(svc, 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        req = urllib.request.Request(
            base, data=_json.dumps({"n": 1, "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers.get("Content-Type") == "application/x-ndjson"
            lines = [_json.loads(l) for l in r.read().decode().splitlines()]
        partials = [l for l in lines if "partial" in l]
        assert partials and partials[-1]["done"] is True
        final = lines[-1]
        assert final["captions"] == [partials[-1]["partial"]]
        # plain requests still use Content-Length responses
        req2 = urllib.request.Request(
            base, data=_json.dumps({"n": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=60) as r:
            assert "captions" in _json.loads(r.read())
    finally:
        srv.shutdown()
        svc.continuous.close()
        svc.batcher.close()
