"""AOT model export: a deployable decode artifact (StableHLO + params).

The reference has no deployment story at all — inference was a commented-out
line (``main.py:49``).  Serving here normally re-traces and re-compiles the
decode program at startup; this module instead serializes the **compiled
program itself** via ``jax.export`` so a server (or a non-Python runtime
that speaks StableHLO) loads a versioned artifact and never traces:

* compile once, serve many — no Python model code, no tracing, no
  checkpoint-template construction at startup;
* multi-platform lowering (``platforms=["cpu", "tpu"]``) — one artifact
  runs on the dev box and the TPU fleet;
* optional **symbolic batch dimension** — one exported program serves any
  batch size (XLA specializes at call time);
* jax.export's calling-convention versioning gives a forward-compat
  window across jax upgrades.

Artifact layout (a single ``.gic`` zip):

    decode.bin    jax.export.Exported.serialize() bytes
    params.npz    generator params, flattened ('/'-joined tree paths)
    meta.json     mode, shapes, platforms, vocab (index_to_word), config
                  essentials for reconstruction-free decoding

The exported callable has signature ``fn(gen_params, anchor)`` where
``anchor`` is ``images [B, 3, S, S]`` (conditional) or an int32 ``[B]``
placeholder carrying only the batch dimension (unconditional — the t=0
input is the ``<S>`` embedding from the params, reference
``generator.py:109-112``), returning ``(ids [B, T], scores [B])``.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np

FORMAT_VERSION = 1


_REGISTERED = False


def _ensure_serialization_registrations():
    """jax.export serializes pytree structure by node type: custom nodes
    (the int8 QTensor NamedTuple, ops/quantize.py) must be registered
    before serialize() AND deserialize().  Idempotent."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jax_export

    from gan_image_captioning_tpu.ops.quantize import QTensor

    try:
        jax_export.register_namedtuple_serialization(
            QTensor, serialized_name="gan_image_captioning_tpu.QTensor")
    except ValueError:
        pass   # already registered in this process
    _REGISTERED = True


# ------------------------------------------------------------------ pytree io

def _flatten_params(params) -> Dict[str, np.ndarray]:
    """Pytree → {'/'-joined path: ndarray}; list indices become digits."""
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(_path_token(p) for p in path)
        flat[key] = np.asarray(jax.device_get(leaf))
    return flat


def _path_token(entry) -> str:
    import jax

    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return str(entry.name)
    return str(entry)


def _unflatten_params(flat: Dict[str, np.ndarray], template) -> Any:
    """Rebuild the template's pytree structure from '/'-joined keys."""
    import jax

    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, tmpl_leaf in leaves_with_path:
        key = "/".join(_path_token(p) for p in path)
        if key not in flat:
            raise KeyError(f"exported params are missing leaf {key!r}")
        leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ------------------------------------------------------------------- building

def build_caption_fn(config, mode: str = "greedy", beam_size: int = 1,
                     length_penalty: float = 0.0, anchor_kind: str = "auto",
                     start_row=None):
    """The export target: ``fn(gen_params, anchor) -> (ids, scores)``.

    ``anchor_kind``:

    * ``"auto"`` — anchor is images (conditional) or an int32 ``[B]``
      batch-size placeholder (unconditional); conditioning runs INSIDE
      the exported program (self-contained captioning).
    * ``"features"`` — anchor is the ``[B, E]`` feature/start-token batch
      the serving engines coalesce; conditioning stays outside.  This is
      the program ``serve.py --exported`` plugs into its dispatchers.

    Always takes the scan/stepper decode path (``allow_kernel=False``) —
    the weights-resident Pallas kernel is a runtime optimization that does
    not lower to portable StableHLO; the scan program is what multi-
    platform artifacts need (and what TP-sharded serving uses anyway).
    """
    import jax.numpy as jnp

    from gan_image_captioning_tpu.eval import decode as decode_lib
    from gan_image_captioning_tpu.models import api

    def decode(gen_params, features, context):
        if mode == "beam":
            return decode_lib.beam_search(
                gen_params, features, config, beam_size=beam_size,
                context=context, length_penalty=length_penalty)
        return decode_lib.greedy_with_logprobs(
            gen_params, features, config, context=context,
            allow_kernel=False)

    if anchor_kind == "features":
        return lambda gen_params, anchor: decode(gen_params, anchor, None)

    def uncond_features(gen_params, n):
        # Unconditional t=0 input = the <S> embedding.  Quantized decoders
        # (ops/quantize.py) ship int8 embed payloads; production serving
        # computes start features from the FULL-precision embed (the
        # service keeps both trees, src/caption.py) — so a quantized
        # export bakes that fp row in as a constant (``start_row``,
        # supplied by the export CLI before quantization); fallback: the
        # dequantized row.
        if start_row is not None:
            return jnp.broadcast_to(jnp.asarray(start_row, jnp.float32),
                                    (n, np.shape(start_row)[-1]))
        dec = gen_params["decoder"]
        if "lstm_q" in dec or hasattr(dec.get("embed"), "q"):
            from gan_image_captioning_tpu.models.generator import START_TOKEN
            from gan_image_captioning_tpu.ops.quantize import quantized_embed

            ids = jnp.full((n,), START_TOKEN, jnp.int32)
            return quantized_embed(dec, ids).astype(jnp.float32)
        from gan_image_captioning_tpu.models.generator import (
            start_token_features)

        return start_token_features(
            dec if config.gen_arch == "lstm" else {"embed": dec["embed"]}, n)

    def fn(gen_params, anchor):
        if config.cgan:
            batch = {"captions": jnp.zeros((anchor.shape[0], 1), jnp.int32),
                     "images": anchor}
            cond, _ = api.generator_condition(config, gen_params, batch,
                                              train=False)
            return decode(gen_params, cond["features"], cond["context"])
        return decode(gen_params, uncond_features(gen_params,
                                                  anchor.shape[0]), None)

    return fn


def export_caption_program(gen_params, config, mode: str = "greedy",
                           beam_size: int = 1, batch_size: int = 8,
                           symbolic_batch: bool = False,
                           platforms: Optional[Tuple[str, ...]] = None,
                           length_penalty: float = 0.0,
                           anchor_kind: str = "auto", start_row=None):
    """jax.export the decode program → ``jax.export.Exported``.

    ``symbolic_batch=True`` exports with a symbolic leading dim ``b`` so
    one artifact serves any batch size; ``batch_size`` then only shapes
    the example spec.  ``platforms`` lowers for several backends in one
    artifact (default: the current backend).
    """
    import jax
    from jax import export as jax_export

    _ensure_serialization_registrations()
    fn = build_caption_fn(config, mode, beam_size, length_penalty,
                          anchor_kind, start_row=start_row)

    if anchor_kind == "features":
        anchor_shape = (batch_size, config.gen_embed_dim)
        anchor_dtype = jax.numpy.float32
    elif config.cgan:
        anchor_shape = (batch_size, 3, config.image_size, config.image_size)
        anchor_dtype = jax.numpy.float32
    else:
        anchor_shape = (batch_size,)
        anchor_dtype = jax.numpy.int32
    if symbolic_batch:
        b = jax_export.symbolic_shape("b")
        anchor_spec = jax.ShapeDtypeStruct((*b, *anchor_shape[1:]),
                                           anchor_dtype)
    else:
        anchor_spec = jax.ShapeDtypeStruct(anchor_shape, anchor_dtype)

    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        gen_params)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    return jax_export.export(jax.jit(fn), **kwargs)(params_spec, anchor_spec)


# ------------------------------------------------------------------- artifact

def save_artifact(path: str, exported, gen_params, meta: Dict[str, Any]):
    """Write the ``.gic`` zip: decode.bin + params.npz + meta.json."""
    flat = _flatten_params(gen_params)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    meta = dict(meta)
    meta.setdefault("format_version", FORMAT_VERSION)
    meta["platforms"] = list(getattr(exported, "platforms", ()) or ())
    meta["calling_convention"] = int(
        getattr(exported, "calling_convention_version", 0))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("decode.bin", bytes(exported.serialize()))
        zf.writestr("params.npz", buf.getvalue())
        zf.writestr("meta.json", json.dumps(meta, indent=1))


class ExportedCaptioner:
    """A loaded artifact: ``captioner(anchor) -> (ids, scores)``.

    No model code, templates, or tracing — ``jax.export.deserialize``
    rebuilds the compiled program; params load from the bundled npz and
    are passed through the exported calling convention.
    """

    def __init__(self, exported, flat_params: Dict[str, np.ndarray],
                 meta: Dict[str, Any]):
        self.exported = exported
        self.meta = meta
        # Rebuild the params pytree from the Exported's own input treedef:
        # in_tree is ((params, anchor), {}) — recover the params subtree
        # template by unflattening placeholder leaves.
        import jax

        n_leaves = exported.in_tree.num_leaves
        skeleton = jax.tree_util.tree_unflatten(exported.in_tree,
                                                list(range(n_leaves)))
        params_skeleton = skeleton[0][0]
        self.params = _unflatten_params(flat_params, params_skeleton)

    def __call__(self, anchor):
        return self.exported.call(self.params, np.asarray(anchor))

    @property
    def index_to_word(self):
        vocab = self.meta.get("index_to_word")
        return {i: w for i, w in enumerate(vocab)} if vocab else None

    def captions(self, anchor):
        """Decoded word lists (requires a bundled vocab)."""
        from gan_image_captioning_tpu.eval.metrics import (ids_to_words,
                                                           strip_caption)

        i2w = self.index_to_word
        if i2w is None:
            raise ValueError("artifact has no bundled vocab "
                             "(exported without a dataset)")
        ids, scores = self(anchor)
        ids = np.asarray(ids)
        if ids.ndim == 3:          # diverse beam [B, G, T]: first group
            ids = ids[:, 0]
        return ([" ".join(ids_to_words(strip_caption(row), i2w))
                 for row in ids], np.asarray(scores))


def load_artifact(path: str) -> ExportedCaptioner:
    from jax import export as jax_export

    _ensure_serialization_registrations()

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        if meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {meta['format_version']} is newer than "
                f"this library ({FORMAT_VERSION})")
        exported = jax_export.deserialize(bytearray(zf.read("decode.bin")))
        with np.load(io.BytesIO(zf.read("params.npz"))) as npz:
            flat = {k: npz[k] for k in npz.files}
    return ExportedCaptioner(exported, flat, meta)
