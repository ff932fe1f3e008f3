"""Caption serving entry point.

A minimal production-style serving loop around the batched jitted decoder:
requests arrive as JSON lines (stdin or TCP), are micro-batched up to
``--serve-batch-size``, decoded in one device program (greedy or beam), and
answered as JSON lines.  The decode program is compiled once at startup
(warm), so steady-state latency is the device decode + transfer only.

    # stdin/stdout mode:
    echo '{"n": 3}' | python src/serve.py --checkpoint …/pretrained_model.ckpt \
        --dataset synthetic --beam-size 4

    # TCP mode:
    python src/serve.py --checkpoint … --port 7777 &
    printf '{"image": "/path/img.jpg"}\n' | nc localhost 7777

Request forms:
  {"n": k}              → k unconditional captions
  {"image": "<path>"}   → caption for one image (conditional checkpoints)
  {"image": [p1, …]}    → one caption per image, one batched request
  {"stats": true}       → dispatcher counters (occupancy, padding, queue)
  {"reload": "<ckpt>"}  → hot-swap to a new checkpoint, zero downtime
                          (e.g. the training run's latest best-val file)
  {"n": k, "stream": true} → (--serve-continuous) intermediate
                          {"row": j, "partial": "...", "done": bool} lines
                          per decode chunk, then the final response — over
                          stdin/TCP as JSON lines, over HTTP as chunked
                          NDJSON
Response: {"captions": [...], "logprobs": [...], "latency_ms": t}
"""

import json
import os
import socketserver
import sys
import time

_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_PKG_ROOT, "gan_image_captioning_tpu")):
    # Running from a checkout (src/ next to the package): make the package
    # importable.  When pip-installed (this file ships as
    # gan_image_captioning_tpu.scripts.*) the package is already on the
    # path and _PKG_ROOT would be the package dir itself -- do NOT add it
    # (its modules would shadow top-level names like `config`).
    sys.path.insert(0, _PKG_ROOT)

import jax
import numpy as np

from gan_image_captioning_tpu.config import (apply_device_flag,
                                             build_parser,
                                             config_from_args)


def parse_args(argv=None):
    parser = build_parser()
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--exported", type=str, default="",
                        help="serve an AOT .gic artifact (src/export_model.py "
                             "--anchor features --symbolic-batch) instead of "
                             "a checkpoint: the coalescing engine dispatches "
                             "the DESERIALIZED compiled program — no model "
                             "tracing at startup; vocab comes from the "
                             "artifact")
    parser.add_argument("--port", type=int, default=0,
                        help="TCP port (0 = stdin/stdout loop)")
    parser.add_argument("--http-port", type=int, default=0,
                        help="HTTP port: POST / with a request JSON body "
                        "({'n': k} | {'image': path} | {'stats': true}) "
                        "→ JSON response; GET /stats and GET /healthz "
                        "also served (0 = off)")
    parser.add_argument("--serve-batch-size", type=int, default=8)
    parser.add_argument("--serve-continuous", action="store_true",
                        help="slot-based continuous batching (greedy LSTM "
                        "decode): new requests join the decode pool at "
                        "chunk boundaries instead of waiting for whole "
                        "batches (gan_image_captioning_tpu/serving.py)")
    parser.add_argument("--serve-chunk-steps", type=int, default=8,
                        help="decode steps per device program in "
                        "--serve-continuous mode")
    parser.add_argument("--serve-buckets", type=str, default="",
                        help="coalescing batch-shape buckets: 'auto' = "
                        "powers of two up to --serve-batch-size, or an "
                        "explicit comma list (e.g. '1,4,16'); low-load "
                        "requests run the smallest program that fits "
                        "instead of padding to the full batch")
    parser.add_argument("--serve-adaptive-chunk", type=int, default=0,
                        help="greedy coalescing decode: run K-step blocks "
                        "in a while_loop that stops once every row in the "
                        "batch has emitted <E> (0 = fixed full-T program); "
                        "the post-<E> tail is <PAD>")
    parser.add_argument("--serve-max-pending", type=int, default=0,
                        help="admission control: reject a request "
                        "immediately (HTTP 503) when the engine's pending "
                        "queue holds this many entries, instead of letting "
                        "it block toward timeout (0 = unbounded)")
    parser.add_argument("--serve-watch", type=float, default=0.0,
                        help="poll the serving checkpoint path every N "
                        "seconds and hot-reload when its contents change "
                        "(0 = off) — point --checkpoint at a training "
                        "run's best-val file and the server tracks every "
                        "improvement; a reload that catches a write "
                        "mid-flight fails harmlessly and retries next poll")
    parser.add_argument("--serve-exact", action="store_true",
                        help="--serve-continuous: disable early slot "
                        "release so returned ids are bit-identical to the "
                        "full-T batch greedy decode (by default a slot "
                        "frees at the first chunk containing <E> and the "
                        "void tail is <PAD>)")
    parser.add_argument("--decode-mode", type=str, default="auto",
                        choices=["auto", "greedy", "beam", "sample",
                                 "speculative"],
                        help="'auto' = beam when --beam-size > 1 else greedy; "
                             "'sample' serves stochastic captions from the "
                             "temperature/top-k/top-p filtered distribution "
                             "(coalescing engine; not --serve-continuous); "
                             "'speculative' serves greedy-exact captions via "
                             "the int8-draft block decoder "
                             "(eval/speculative.py, LSTM only)")
    parser.add_argument("--draft-len", type=int, default=4,
                        help="speculative mode: tokens proposed per draft "
                             "block (K)")
    parser.add_argument("--top-k", type=int, default=0,
                        help="sample mode: per-step top-k filter (0 = off)")
    parser.add_argument("--top-p", type=float, default=1.0,
                        help="sample mode: nucleus mass (1.0 = off)")
    parser.add_argument("--sample-temperature", type=float, default=1.0,
                        help="sample mode: softmax temperature")
    parser.add_argument("--repetition-penalty", type=float, default=1.0,
                        help="sample mode: CTRL-style penalty on already-"
                             "emitted tokens (>1)")
    parser.add_argument("--no-repeat-ngram", type=int, default=0,
                        choices=[0, 2, 3],
                        help="sample mode: forbid completing an n-gram the "
                             "caption already contains")
    parser.add_argument("--min-length", type=int, default=0,
                        help="beam/sample modes: forbid <E> until this many "
                             "tokens stand (selection-only)")
    parser.add_argument("--sample-seed", type=int, default=0,
                        help="base PRNG seed for sample mode (each decode "
                             "program folds in a call counter)")
    args = parser.parse_args(argv)
    if not args.checkpoint and not args.exported:
        parser.error("one of --checkpoint or --exported is required")
    apply_device_flag(args)
    return args


def _parse_buckets(spec: str, batch_size: int):
    """--serve-buckets: 'auto' = powers of two below batch_size, or an
    explicit comma list; None when unset."""
    if spec == "auto":
        buckets, b = [], 1
        while b < batch_size:
            buckets.append(b)
            b *= 2
        return buckets
    if spec:
        return [int(x) for x in spec.split(",")]
    return None


class CaptionService:
    def __init__(self, args):
        from gan_image_captioning_tpu.utils.runtime import setup

        setup()
        self._exported = None
        if getattr(args, "exported", ""):
            self._init_exported(args)
            return
        from src.main import build_datasets, inject_vocab_size

        train_ds, _ = build_datasets(args)
        inject_vocab_size(args, train_ds)
        self.index_to_word = train_ds.index_to_word
        self.config = config_from_args(args)
        self.batch_size = args.serve_batch_size

        from gan_image_captioning_tpu.eval import decode as decode_lib
        from gan_image_captioning_tpu.models import api
        from gan_image_captioning_tpu.models.generator import (
            start_token_features)
        from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

        config = self.config
        self._speculative_mode = getattr(args, "decode_mode",
                                         "auto") == "speculative"
        if self._speculative_mode and config.gen_arch != "lstm":
            raise SystemExit("--decode-mode speculative requires the "
                             "LSTM generator")
        # --mesh — distributed serving.  Data axis: every decode program
        # shards its batch/slot dim over ``data`` (GSPMD inserts nothing
        # for the scan — rows are independent — so this is embarrassingly-
        # parallel decode over ICI).  Model axis: vocab-dim TP with the
        # training-side layout (parallel/sharding.py) — the scan's vocab
        # matmul/softmax/argmax partition over ``model`` with the same
        # collectives as the TP train step.
        self.mesh = None
        self._feat_sharding = None
        self._tp_serving = False
        if config.mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gan_image_captioning_tpu.parallel.mesh import (
                inference_mesh_setup)

            # inference_mesh_setup gates the Pallas decode path exactly as
            # the instructor/evaluate/caption do: a data-only mesh keeps
            # the kernels per-shard via shard_map (decode_sample.set_mesh);
            # any model/pp/sp axis forces the GSPMD-partitioned scan
            # (rewriting --decode-impl kernel → decoupled, since the
            # weights-resident kernel holds whole vocab/stack blocks).
            self.mesh, config = inference_mesh_setup(config)
            self.config = config
            n_data = dict(self.mesh.shape).get("data", 1)
            self._tp_serving = any(
                n != "data" and s > 1 for n, s in self.mesh.shape.items())
            if n_data > 1 and args.serve_batch_size % n_data:
                raise SystemExit(f"--serve-batch-size "
                                 f"{args.serve_batch_size} must divide by "
                                 f"the data axis ({n_data})")
            self._feat_sharding = NamedSharding(
                self.mesh, P("data" if n_data > 1 else None))
        # quantize + (mesh-)place the checkpoint params; hot reload
        # ({"reload": path}) re-runs the same pipeline on a new checkpoint
        raw_params, _ = ckpt_lib.load_generator_checkpoint(
            args.checkpoint, self.config)
        self.gen_params, self.dec_params = self._prepare_params(raw_params)
        self.checkpoint_path = args.checkpoint
        beam = max(1, config.beam_size)
        mode = getattr(args, "decode_mode", "auto")
        if mode == "auto":
            mode = "beam" if beam > 1 else "greedy"
        self.mode = mode

        if mode == "sample":
            temp = float(getattr(args, "sample_temperature", 1.0))
            top_k = int(getattr(args, "top_k", 0))
            top_p = float(getattr(args, "top_p", 1.0))

            sample_exact = getattr(args, "serve_exact", False)

            rep_pen = float(getattr(args, "repetition_penalty", 1.0))
            nrn = int(getattr(args, "no_repeat_ngram", 0))

            def decode(params, feats, key):
                # early_stop: live rows draw the same tokens (positional
                # key chain); the discarded tail is <PAD> (stripped anyway)
                return decode_lib.sample_decode(
                    params, feats, config, key, temperature=temp,
                    top_k=top_k, top_p=top_p,
                    early_stop=not sample_exact,
                    repetition_penalty=rep_pen, no_repeat_ngram=nrn,
                    min_length=int(getattr(args, "min_length", 0)))

            self._sample_base = jax.random.PRNGKey(
                int(getattr(args, "sample_seed", 0)))
            self._sample_calls = 0
        elif mode == "speculative":
            from gan_image_captioning_tpu.eval.speculative import (
                speculative_greedy)

            spec_k = int(getattr(args, "draft_len", 4))

            spec_exact = getattr(args, "serve_exact", False)

            def decode(target, draft, feats):
                # greedy-exact ids from the draft/verify block decoder +
                # one rescore pass for the per-sequence logprobs; the
                # block loop ends once every row committed <E> (the
                # rescore's mask makes the <PAD> tail logprob-neutral)
                ids = speculative_greedy(target, draft, feats, config,
                                         draft_len=spec_k,
                                         early_stop=not spec_exact)
                return ids, decode_lib.sequence_logprob(target, feats, ids,
                                                        config)
        else:
            adaptive = int(getattr(args, "serve_adaptive_chunk", 0))

            min_len = int(getattr(args, "min_length", 0))

            def decode(params, feats):
                if beam > 1:
                    return decode_lib.beam_search(
                        params, feats, config, beam_size=beam,
                        length_penalty=config.length_penalty,
                        min_length=min_len)
                if adaptive > 0:
                    # early-stopping program: K-step blocks until every
                    # row has emitted <E> (tail = <PAD>)
                    return decode_lib.greedy_with_logprobs_adaptive(
                        params, feats, config, chunk=adaptive,
                        allow_kernel=not self._tp_serving)
                # ONE device program: serve-mode decode kernel on TPU (greedy
                # ids + per-token logprobs), two-scan fallback elsewhere;
                # TP-sharded params force the scan (GSPMD partitions it)
                return decode_lib.greedy_with_logprobs(
                    params, feats, config,
                    allow_kernel=not self._tp_serving)

        self._decode = jax.jit(decode)
        self._start_features = start_token_features

        # Cross-connection batching engines (serving.py): every request —
        # from any TCP connection or stdin — flows through ONE dispatcher
        # that owns the device.
        from gan_image_captioning_tpu.serving import (CoalescingBatcher,
                                                      ContinuousBatcher)

        feat_dim = config.gen_embed_dim
        # continuous-engine constructor knobs, kept for hot reload (the
        # slot engine bakes params into its jitted closures, so a reload
        # rebuilds it — _build_continuous)
        self._want_continuous = (getattr(args, "serve_continuous", False)
                                 and beam == 1 and mode != "sample")
        self._chunk_steps = getattr(args, "serve_chunk_steps", 8)
        self._spec_chunk = getattr(args, "draft_len", 4)
        self._early_exit = not getattr(args, "serve_exact", False)
        self._max_pending = int(getattr(args, "serve_max_pending", 0))
        if (self._want_continuous and mode == "speculative"
                and self.mesh is not None):
            raise SystemExit("--serve-continuous --decode-mode speculative "
                             "does not compose with --mesh")
        self.continuous = self._build_continuous()

        def place(f):
            return (f if self._feat_sharding is None
                    else jax.device_put(f, self._feat_sharding))

        if mode == "sample":
            # per-program key: fold the dispatcher's call counter into the
            # base seed (only the single dispatcher thread calls this)
            def run_decode(f):
                key = jax.random.fold_in(self._sample_base,
                                         self._sample_calls)
                self._sample_calls += 1
                return self._decode(self.dec_params, place(f), key)
        elif mode == "speculative":
            def run_decode(f):
                return self._decode(self.gen_params, self.dec_params,
                                    place(f))
        else:
            def run_decode(f):
                return self._decode(self.dec_params, place(f))

        # --serve-buckets: shape buckets for the coalescing dispatcher.
        # Under a data mesh every dispatched shape must divide by the data
        # axis, so buckets are filtered to its multiples.
        spec = getattr(args, "serve_buckets", "") or ""
        buckets = _parse_buckets(spec, self.batch_size)
        if buckets and self.mesh is not None:
            n_data = dict(self.mesh.shape).get("data", 1)
            kept = [b for b in buckets if b % n_data == 0]
            if not kept and n_data > 1:
                raise SystemExit(
                    f"--serve-buckets {spec}: no bucket divides the mesh "
                    f"data axis ({n_data}) — every dispatched shape must "
                    f"split over 'data'; use multiples of {n_data}")
            buckets = kept
        import threading

        self._reload_lock = threading.Lock()   # serialize hot reloads
        self.batcher = CoalescingBatcher(run_decode, self.batch_size,
                                         feat_dim, bucket_sizes=buckets,
                                         max_pending=self._max_pending)
        # warm through the REAL request path so the first client request
        # hits the compiled program (requests pad to serve_batch_size)
        self.handle_request({"n": 1})
        # with buckets, compile EVERY program shape up front — otherwise
        # the first request that lands in a cold bucket eats its compile
        # (moot under --serve-continuous: captions take the slot pool)
        if self.continuous is None:
            for b in self.batcher.bucket_sizes[1:]:
                self.handle_request({"n": b})

    def _init_exported(self, args):
        """Serve an AOT artifact (gan_image_captioning_tpu/export_api.py):
        the coalescing dispatcher runs the DESERIALIZED compiled decode
        program — no model construction or tracing at startup.  Requires a
        feature-anchored, symbolic-batch artifact (the engine dispatches
        variable [B, E] feature batches); config geometry comes from the
        artifact's meta, vocab from its bundled index_to_word.  Hot reload
        ({"reload": other.gic}) swaps program+params together."""
        import threading

        from gan_image_captioning_tpu.models.generator import (
            start_token_features)
        from gan_image_captioning_tpu.serving import CoalescingBatcher

        for bad, name in (
                (getattr(args, "mesh", ""), "--mesh"),
                (getattr(args, "serve_continuous", False),
                 "--serve-continuous"),
                (getattr(args, "quantize", "none") not in ("", "none"),
                 "--quantize"),
                (getattr(args, "decode_mode", "auto") in ("sample",
                                                          "speculative"),
                 "--decode-mode sample/speculative"),
                (getattr(args, "serve_watch", 0.0) > 0, "--serve-watch"),
                (getattr(args, "serve_adaptive_chunk", 0) > 0,
                 "--serve-adaptive-chunk")):
            if bad:
                raise SystemExit(f"{name} does not compose with --exported "
                                 "(the artifact IS the decode program; "
                                 "re-export with the options baked in or "
                                 "serve the checkpoint directly)")
        try:
            cap, meta = self._load_artifact(args.exported)
        except ValueError as exc:
            raise SystemExit(str(exc))
        # artifact meta drives the service geometry (vocab for word
        # mapping, cgan/image_size for the host-side conditioning path)
        args.vocab_size = meta["vocab_size"]
        args.max_seq_len = meta["seq_len"] - 2
        args.gen_embed_dim = meta["feat_dim"]
        args.conditional_gan = 1 if meta.get("conditional") else 0
        if meta.get("image_size"):
            args.image_size = meta["image_size"]
        if meta.get("gen_arch"):
            args.gen_arch = meta["gen_arch"]
        if meta.get("encoder_arch"):
            args.encoder_arch = meta["encoder_arch"]
        self.config = config_from_args(args)
        self.index_to_word = cap.index_to_word
        if self.index_to_word is None:
            from src.main import build_datasets

            train_ds, _ = build_datasets(args)
            self.index_to_word = train_ds.index_to_word
        self.batch_size = args.serve_batch_size
        self.mesh = None
        self._feat_sharding = None
        self._tp_serving = False
        self._speculative_mode = False
        self._want_continuous = False
        self.continuous = None
        self.mode = meta["mode"]
        self._exported = cap
        self.gen_params = self.dec_params = cap.params
        self.checkpoint_path = args.exported
        self._start_features = start_token_features
        # quantized artifacts bake the fp <S>-feature row into meta (the
        # int8 embed payload can't be indexed by start_token_features)
        sf = meta.get("start_features")
        self._start_row = None if sf is None else np.asarray(sf, np.float32)
        self._max_pending = int(getattr(args, "serve_max_pending", 0))
        self._reload_lock = threading.Lock()

        def run_decode(f):
            # read the refs per call so a hot artifact reload takes effect
            return self._exported.exported.call(self.dec_params, f)

        buckets = _parse_buckets(getattr(args, "serve_buckets", "") or "",
                                 self.batch_size)
        self.batcher = CoalescingBatcher(run_decode, self.batch_size,
                                         meta["feat_dim"],
                                         bucket_sizes=buckets,
                                         max_pending=self._max_pending)
        self.handle_request({"n": 1})
        for b in self.batcher.bucket_sizes[1:]:
            self.handle_request({"n": b})

    @staticmethod
    def _load_artifact(path: str):
        """Load + validate a serving artifact: must be feature-anchored
        (the engines dispatch [B, E] feature batches) and symbolic-batch
        (bucketed programs specialize per shape at call time)."""
        from gan_image_captioning_tpu import export_api

        cap = export_api.load_artifact(path)
        meta = cap.meta
        if meta.get("anchor") != "features":
            raise ValueError(
                f"{path}: serving needs a feature-anchored artifact — "
                "re-export with `--anchor features`")
        if not meta.get("symbolic_batch"):
            raise ValueError(
                f"{path}: serving needs a symbolic batch dimension — "
                "re-export with `--symbolic-batch`")
        return cap, meta

    def _prepare_params(self, raw_gen_params: dict):
        """Checkpoint params → serving params: int8-quantize the decode
        copy when configured (always for the speculative draft) and place
        both trees on the mesh.  Shared by ``__init__`` and hot reload."""
        config = self.config
        gen_params = raw_gen_params
        dec_params = gen_params
        if config.quantize != "none" or self._speculative_mode:
            # --quantize int8: decode programs read the int8 decoder; the
            # encoder/conditioning path stays full-precision
            # (ops/quantize.py).  Speculative mode: the int8 twin plays
            # the dec_params role as the DRAFT; full-precision gen_params
            # stay the verify target (built before any mesh placement so
            # the QTensor TP specs apply).
            from gan_image_captioning_tpu.ops.quantize import (
                quantize_generator)

            dec_params = quantize_generator(gen_params, config)
        if self.mesh is not None:
            from gan_image_captioning_tpu.serving import shard_serving_params

            shared = dec_params is gen_params
            gen_params = shard_serving_params(gen_params, self.mesh)
            dec_params = (gen_params if shared else
                          shard_serving_params(dec_params, self.mesh))
        return gen_params, dec_params

    def _build_continuous(self, gen_params=None, dec_params=None):
        """A fresh slot-pool engine over the given (default: current)
        params — None when the service runs coalescing-only."""
        if not self._want_continuous:
            return None
        from gan_image_captioning_tpu.serving import ContinuousBatcher

        gen_params = self.gen_params if gen_params is None else gen_params
        dec_params = self.dec_params if dec_params is None else dec_params
        if self.mode == "speculative":
            # slot-based speculation: the int8 twin drafts per slot, the
            # target verifies per chunk — target-exact captions
            return ContinuousBatcher(
                gen_params, self.config, num_slots=self.batch_size,
                chunk_steps=self._spec_chunk, early_exit=self._early_exit,
                draft_params=dec_params,
                max_pending=self._max_pending)
        return ContinuousBatcher(
            dec_params, self.config, num_slots=self.batch_size,
            chunk_steps=self._chunk_steps, mesh=self.mesh,
            early_exit=self._early_exit, max_pending=self._max_pending)

    def reload_checkpoint(self, path: str) -> dict:
        """Hot checkpoint reload ({"reload": path}) — zero downtime.

        The coalescing path threads params as jit ARGUMENTS, so swapping
        ``self.gen_params``/``self.dec_params`` reuses the compiled
        programs as-is.  The continuous engine bakes params into its
        jitted closures, so a successor engine is built and warmed over
        the NEW params while every ``self.*`` attribute still serves the
        old checkpoint; only after the warm decode succeeds do params,
        engine, and checkpoint_path swap together.  Any failure — load,
        build, or warm — closes the half-built engine and raises with
        the service state untouched.
        """
        from gan_image_captioning_tpu.train import checkpoint as ckpt_lib

        if self._exported is not None:
            # artifact-serving mode: the reload target is another .gic —
            # program and params swap together (the dispatcher's run_decode
            # reads self._exported/self.dec_params per call); a mismatched
            # artifact fails the validation with the service untouched
            cap, meta = self._load_artifact(path)
            if meta["vocab_size"] != self.config.vocab_size or \
                    meta["seq_len"] != self.config.seq_len or \
                    meta["feat_dim"] != self.config.gen_embed_dim:
                raise ValueError(
                    f"{path}: artifact geometry (V={meta['vocab_size']}, "
                    f"T={meta['seq_len']}, E={meta['feat_dim']}) does not "
                    "match the serving geometry")
            if bool(meta.get("conditional")) != bool(self.config.cgan):
                raise ValueError(
                    f"{path}: artifact conditionality "
                    f"({bool(meta.get('conditional'))}) does not match the "
                    f"serving service ({bool(self.config.cgan)})")
            if meta["mode"] != self.mode:
                raise ValueError(
                    f"{path}: artifact decode mode ({meta['mode']}) does "
                    f"not match the serving mode ({self.mode})")
            with self._reload_lock:
                self._exported = cap
                self.gen_params = self.dec_params = cap.params
                self.checkpoint_path = path
                if cap.index_to_word is not None:
                    self.index_to_word = cap.index_to_word
                sf = meta.get("start_features")
                self._start_row = (None if sf is None
                                   else np.asarray(sf, np.float32))
            return {"reloaded": path}

        with self._reload_lock:
            raw, _ = ckpt_lib.load_generator_checkpoint(path, self.config)
            gen_params, dec_params = self._prepare_params(raw)
            old = self.continuous
            new = None
            if old is not None:
                new = self._build_continuous(gen_params, dec_params)
                try:
                    # warm: compile the successor's advance/reset programs
                    # now, not on the first post-swap client request
                    dec = gen_params["decoder"]
                    feats = np.asarray(self._start_features(
                        dec if self.config.gen_arch == "lstm"
                        else {"embed": dec["embed"]}, 1))
                    new.submit(feats[0]).result(timeout=120)
                except BaseException:
                    new.close()     # don't leak its dispatcher/params
                    raise
            # point of no return: swap everything together
            self.gen_params, self.dec_params = gen_params, dec_params
            if new is not None:
                self.continuous = new
            self.checkpoint_path = path
            if getattr(self, "_watch_fp", None) is not None:
                # a manual reload must not look like a disk change to the
                # watcher (it would redundantly reload the same file)
                self._watch_fp = self._ckpt_fingerprint(path)
                self._watch_pending = None
            if old is not None:
                self._drain_and_close(old)
            return {"reloaded": path}

    @staticmethod
    def _ckpt_fingerprint(path: str):
        """Content fingerprint of a checkpoint directory (or file): the
        set of (relative name, size, mtime_ns) — any rewrite changes it."""
        if not os.path.exists(path):
            return None
        if os.path.isfile(path):
            st = os.stat(path)
            return ((path, st.st_size, st.st_mtime_ns),)
        out = []
        for root, _, names in os.walk(path):
            for n in names:
                p = os.path.join(root, n)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                out.append((os.path.relpath(p, path), st.st_size,
                            st.st_mtime_ns))
        return tuple(sorted(out))

    def start_watch(self, interval_s: float):
        """--serve-watch: a daemon thread polls the serving checkpoint's
        content fingerprint and hot-reloads on change.  The fingerprint
        must be STABLE across two consecutive polls before reloading (a
        best-val save overwrites the directory in place; reloading
        mid-write would load a torn tree — Orbax would raise and the next
        poll retries, but waiting for stability avoids the noise)."""
        import threading

        self._watch_fp = self._ckpt_fingerprint(self.checkpoint_path)
        self._watch_pending = None
        self._watch_stop = threading.Event()   # stop_watch() / tests

        def loop():
            while not self._watch_stop.wait(interval_s):
                try:
                    fp = self._ckpt_fingerprint(self.checkpoint_path)
                    if fp is None or fp == self._watch_fp:
                        self._watch_pending = None
                        continue
                    if fp != self._watch_pending:
                        self._watch_pending = fp   # changed; await stability
                        continue
                    self.reload_checkpoint(self.checkpoint_path)
                    self._watch_fp = fp
                    self._watch_pending = None
                    print(json.dumps({"reloaded": self.checkpoint_path,
                                      "watch": True}), flush=True)
                except Exception as exc:
                    # torn write / transient IO: retry on the next poll
                    print(json.dumps({"watch_error": str(exc)}), flush=True)

        threading.Thread(target=loop, daemon=True,
                         name="ckpt-watch").start()

    def stop_watch(self):
        """End the --serve-watch polling thread (tests / shutdown)."""
        if getattr(self, "_watch_stop", None) is not None:
            self._watch_stop.set()

    @staticmethod
    def _drain_and_close(engine, timeout_s: float = 60.0):
        """Let a superseded slot engine finish its in-flight captions
        (new submissions already go to the successor), then close it."""
        deadline = time.perf_counter() + timeout_s
        while time.perf_counter() < deadline:
            s = engine.stats()
            if s["active_slots"] == 0 and s["queue_depth"] == 0:
                break
            time.sleep(0.02)
        engine.close()

    def _features_unconditional(self, n):
        row = getattr(self, "_start_row", None)
        if row is not None:     # exported artifact with a baked fp row
            return np.broadcast_to(row[None], (n, row.shape[-1]))
        dec = self.gen_params["decoder"]
        return self._start_features(
            dec if self.config.gen_arch == "lstm" else {"embed": dec["embed"]},
            n)

    def _features_image(self, paths):
        from gan_image_captioning_tpu.data.images import load_and_preprocess
        from gan_image_captioning_tpu.models import api

        imgs = np.stack([load_and_preprocess(p, self.config.image_size)
                         for p in paths])
        batch = {"captions": np.zeros((len(paths), self.config.seq_len),
                                      np.int32),
                 "images": imgs}
        cond, _ = api.generator_condition(self.config, self.gen_params, batch,
                                          train=False)
        return cond["features"]

    def handle_request(self, req: dict, emit=None) -> dict:
        """One request → one response dict.

        ``emit`` (optional): a callable the line-based transports pass to
        enable STREAMING — with ``{"stream": true}`` on a
        ``--serve-continuous`` service, every decode chunk that commits
        tokens for this request emits an intermediate
        ``{"row": j, "partial": "<caption so far>", "done": bool}`` line
        before the standard final response."""
        from gan_image_captioning_tpu.eval.metrics import (ids_to_words,
                                                           strip_caption)

        t0 = time.perf_counter()
        if req.get("stats"):
            out = {"coalescing": self.batcher.stats(),
                   "checkpoint": self.checkpoint_path}
            if self.continuous is not None:
                out["continuous"] = self.continuous.stats()
            return out
        if "reload" in req:
            out = self.reload_checkpoint(str(req["reload"]))
            out["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
            return out
        if "image" in req:
            if not self.config.cgan:
                return {"error": "checkpoint is unconditional; use {'n': k}"}
            paths = req["image"]
            if isinstance(paths, str):
                paths = [paths]
            if not paths:
                return {"error": "'image' must be a path or non-empty list"}
            feats = self._features_image(list(paths))
            n = len(paths)
        else:
            n = int(req.get("n", 1))
            feats = self._features_unconditional(n)
        feats = np.asarray(feats)
        stream = bool(req.get("stream"))
        if stream and (self.continuous is None or emit is None):
            return {"error": "streaming needs --serve-continuous (and a "
                             "streaming transport: stdin, --port TCP, or "
                             "HTTP chunked)"}
        if self.continuous is not None:
            # continuous batching: each row takes a decode slot; rows join
            # the pool at the next chunk boundary (submit_many: admission
            # control accepts or rejects the whole request atomically).
            # Retry once on a closed engine: a hot reload can swap+close
            # the engine between this thread reading the reference and
            # submitting — the retry lands on the successor.
            rows = [feats[i] for i in range(feats.shape[0])]
            events = None
            on_tokens = None
            if stream:
                import queue as _queue

                events = _queue.Queue()
                on_tokens = lambda j, ids, done: events.put((j, ids, done))  # noqa: E731
            for attempt in (0, 1):
                engine = self.continuous
                try:
                    futs = engine.submit_many(rows, on_tokens=on_tokens)
                    break
                except RuntimeError as exc:
                    if "closed" not in str(exc) or attempt == 1:
                        raise
            if stream:
                # relay chunk progress until every row's future resolves;
                # a failed slot simply stops producing events (its error
                # surfaces from f.result below)
                import queue as _queue

                deadline = time.monotonic() + 120
                def _emit_event(ev):
                    j, ids_now, done = ev
                    emit({"row": j, "done": bool(done),
                          "partial": " ".join(ids_to_words(
                              strip_caption(ids_now), self.index_to_word))})
                while (any(not f.done() for f in futs)
                       and time.monotonic() < deadline):
                    try:
                        _emit_event(events.get(timeout=0.1))
                    except _queue.Empty:
                        pass
                while True:   # flush events landed after the last future
                    try:
                        _emit_event(events.get_nowait())
                    except _queue.Empty:
                        break
            results = [f.result(timeout=120) for f in futs]
            ids = np.stack([r[0] for r in results])
            lps = np.asarray([r[1] for r in results])
        else:
            # coalescing dispatcher: this request shares fixed-shape decode
            # programs with whatever else is in flight
            ids, lps = self.batcher.submit(feats).result(timeout=120)
        ids, lps = ids[:n], lps[:n]
        captions = [" ".join(ids_to_words(strip_caption(row),
                                          self.index_to_word))
                    for row in ids]
        return {"captions": captions,
                "logprobs": [round(float(x), 4) for x in lps],
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2)}


def make_http_server(service, port: int):
    """HTTP front end over the same dispatcher engines: POST / with a
    request JSON body; GET /stats and GET /healthz.  ThreadingHTTPServer —
    concurrent requests coalesce in the engines like TCP/stdin ones."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj, content_type="application/json"):
            body = (obj if isinstance(obj, bytes)
                    else (json.dumps(obj) + "\n").encode())
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                elif self.path == "/stats":
                    self._send(200, service.handle_request({"stats": True}))
                elif self.path == "/metrics":
                    # Prometheus text exposition of the engine counters —
                    # scrape-ready (gauge semantics for depths/fractions,
                    # counter for the rest)
                    stats = service.handle_request({"stats": True})
                    lines = []
                    for engine, vals in stats.items():
                        if not isinstance(vals, dict):
                            continue
                        for k, v in vals.items():
                            if isinstance(v, (int, float)):
                                lines.append(
                                    f'gic_serving_{k}{{engine="{engine}"}}'
                                    f" {v}")
                    self._send(200, ("\n".join(lines) + "\n").encode(),
                               content_type="text/plain; version=0.0.4")
                else:
                    self._send(404, {"error": "GET /stats | /healthz | "
                                              "/metrics, POST /"})
            except Exception as exc:  # never abort the connection replyless
                self._send(500, {"error": str(exc)})

        def do_POST(self):
            # 400 = the CLIENT's fault (unparseable body); anything the
            # engine raises (decode crash, queue timeout, closed batcher)
            # is a 500 so balancers/monitoring retry and alert server-side
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as exc:
                self._send(400, {"error": f"malformed request: {exc}"})
                return
            if req.get("stream"):
                self._do_stream(req)
                return
            try:
                resp = service.handle_request(req)
            except Exception as exc:
                from gan_image_captioning_tpu.serving import EngineOverloaded

                # 503 = shed load (balancers retry elsewhere); 500 = bug
                self._send(503 if isinstance(exc, EngineOverloaded) else 500,
                           {"error": str(exc)})
                return
            self._send(200 if "error" not in resp else 400, resp)

        def _do_stream(self, req):
            """{"stream": true} over HTTP: chunked transfer encoding —
            one NDJSON line per decode chunk ({"row", "partial", "done"}),
            then the standard final response line.  Errors BEFORE the
            first byte get a status code; after that the stream ends with
            an {"error": ...} line (the status is already on the wire)."""
            started = []

            def emit(obj):
                if not started:
                    started.append(True)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()
                data = (json.dumps(obj) + "\n").encode()
                self.wfile.write(f"{len(data):x}\r\n".encode() + data
                                 + b"\r\n")
                self.wfile.flush()

            try:
                resp = service.handle_request(req, emit=emit)
            except Exception as exc:
                from gan_image_captioning_tpu.serving import EngineOverloaded

                if started:
                    emit({"error": str(exc)})
                else:
                    self._send(503 if isinstance(exc, EngineOverloaded)
                               else 500, {"error": str(exc)})
                    return
            else:
                if "error" in resp and not started:
                    self._send(400, resp)
                    return
                emit(resp)
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()

        def log_message(self, *a):  # quiet: the service logs via metrics
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None):
    args = parse_args(argv)
    service = CaptionService(args)
    if getattr(args, "serve_watch", 0.0) > 0:
        service.start_watch(args.serve_watch)
    print(json.dumps({"status": "ready",
                      "vocab_size": service.config.vocab_size}), flush=True)

    servers = []
    if getattr(args, "http_port", 0):
        servers.append(make_http_server(service, args.http_port))
    if args.port:
        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                def emit(obj):
                    self.wfile.write((json.dumps(obj) + "\n").encode())
                    self.wfile.flush()

                for line in self.rfile:
                    try:
                        resp = service.handle_request(json.loads(line),
                                                      emit=emit)
                    except Exception as exc:  # malformed request
                        resp = {"error": str(exc)}
                    emit(resp)

        servers.append(socketserver.ThreadingTCPServer(
            ("127.0.0.1", args.port), Handler))
    if servers:
        # --port and --http-port compose: extra servers run in daemon
        # threads, the last holds the foreground (both share the engines)
        import threading

        for srv in servers[:-1]:
            threading.Thread(target=srv.serve_forever, daemon=True).start()
        with servers[-1] as srv:
            srv.serve_forever()
    else:
        def emit(obj):
            print(json.dumps(obj), flush=True)

        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                resp = service.handle_request(json.loads(line), emit=emit)
            except Exception as exc:
                resp = {"error": str(exc)}
            emit(resp)


if __name__ == "__main__":
    main()
