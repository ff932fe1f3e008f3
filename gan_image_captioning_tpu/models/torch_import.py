"""PyTorch checkpoint converters.

Weight-for-weight import of the reference's ``state_dict`` checkpoints
(``pretrained_model.ckpt``: generator; ``adv_model.ckpt``: dict of
generator + discriminator, ``training.py:118,225-226``) and of torchvision
``resnet18`` weights into this framework's param trees.  All our layouts
were chosen torch-compatible, so conversion is pure key-mapping.

The reference wraps the backbone in ``nn.Sequential(*children[:-1])``
(``generator.py:13-14``), so its keys are numeric: index 0=conv1, 1=bn1,
4..7=layer1..4.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _a(t) -> jnp.ndarray:
    return jnp.asarray(np.asarray(t.detach().cpu() if hasattr(t, "detach") else t))


# ------------------------------------------------------------------- resnet18

def resnet18_from_torch(sd: Dict, prefix: str = "") -> Tuple[dict, dict]:
    """torchvision-style resnet18 state_dict → (weights, stats) trees."""

    def bn(name):
        return ({"scale": _a(sd[f"{prefix}{name}.weight"]),
                 "bias": _a(sd[f"{prefix}{name}.bias"])},
                {"mean": _a(sd[f"{prefix}{name}.running_mean"]),
                 "var": _a(sd[f"{prefix}{name}.running_var"])})

    weights = {"conv1": {"w": _a(sd[f"{prefix}conv1.weight"])}}
    stats = {}
    weights["bn1"], stats["bn1"] = bn("bn1")
    for s in range(1, 5):
        wblocks, sblocks = [], []
        for b in range(2):
            base = f"layer{s}.{b}"
            bw = {"conv1": {"w": _a(sd[f"{prefix}{base}.conv1.weight"])},
                  "conv2": {"w": _a(sd[f"{prefix}{base}.conv2.weight"])}}
            bs = {}
            bw["bn1"], bs["bn1"] = bn(f"{base}.bn1")
            bw["bn2"], bs["bn2"] = bn(f"{base}.bn2")
            if f"{prefix}{base}.downsample.0.weight" in sd:
                bw["downsample"] = {
                    "w": _a(sd[f"{prefix}{base}.downsample.0.weight"])}
                bw["downsample_bn"], bs["downsample_bn"] = bn(
                    f"{base}.downsample.1")
            wblocks.append(bw)
            sblocks.append(bs)
        weights[f"layer{s}"] = wblocks
        stats[f"layer{s}"] = sblocks
    return weights, stats


def _sequential_to_named(sd: Dict, prefix: str) -> Dict:
    """Remap the reference's numeric nn.Sequential backbone keys
    (``encoder.resnet.0.*`` …) to torchvision names."""
    idx_map = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3", "7": "layer4"}
    out = {}
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        rest = key[len(prefix):]
        head, _, tail = rest.partition(".")
        if head in idx_map:
            out[idx_map[head] + ("." + tail if tail else "")] = val
    return out


# ------------------------------------------------------------------ generator

def generator_from_torch(sd: Dict, num_lstm_layers: int,
                         with_encoder: bool = True) -> dict:
    """Reference generator ``state_dict`` → our params tree
    (``generator.py:98-123`` module structure)."""
    decoder = {
        "embed": _a(sd["decoder.embed.weight"]),
        "lstm": [
            {"w_ih": _a(sd[f"decoder.lstm.weight_ih_l{k}"]),
             "w_hh": _a(sd[f"decoder.lstm.weight_hh_l{k}"]),
             "b_ih": _a(sd[f"decoder.lstm.bias_ih_l{k}"]),
             "b_hh": _a(sd[f"decoder.lstm.bias_hh_l{k}"])}
            for k in range(num_lstm_layers)],
        "linear": {"w": _a(sd["decoder.linear.weight"]),
                   "b": _a(sd["decoder.linear.bias"])},
    }
    params = {"decoder": decoder}
    if with_encoder and "encoder.linear.weight" in sd:
        backbone_sd = _sequential_to_named(sd, "encoder.resnet.")
        backbone, stats = resnet18_from_torch(backbone_sd)
        params["encoder"] = {
            "backbone": backbone,
            "proj": {"w": _a(sd["encoder.linear.weight"]),
                     "b": _a(sd["encoder.linear.bias"])},
            "head_bn": {"scale": _a(sd["encoder.bn.weight"]),
                        "bias": _a(sd["encoder.bn.bias"])},
            "bn_stats": {"backbone": stats,
                         "head": {"mean": _a(sd["encoder.bn.running_mean"]),
                                  "var": _a(sd["encoder.bn.running_var"])}},
        }
    return params


# -------------------------------------------------------------- discriminator

def discriminator_from_torch(sd: Dict, num_conv_banks: int) -> dict:
    """Reference discriminator ``state_dict`` → our params tree
    (``discriminator.py:9-33`` module structure)."""
    return {
        "embeddings": {"w": _a(sd["embeddings.weight"])},
        "convs": [{"w": _a(sd[f"convs.{i}.weight"]),
                   "b": _a(sd[f"convs.{i}.bias"])}
                  for i in range(num_conv_banks)],
        "highway": {"w": _a(sd["highway.weight"]),
                    "b": _a(sd["highway.bias"])},
        "feature2out": {"w": _a(sd["feature2out.weight"]),
                        "b": _a(sd["feature2out.bias"])},
        "out2logits": {"w": _a(sd["out2logits.weight"]),
                       "b": _a(sd["out2logits.bias"])},
    }


# ------------------------------------------------------------------- gpt2

def gpt2_decoder_from_torch(sd: Dict, seq_len_plus_1: int,
                            num_specials: int = 4,
                            specials_seed: int = 0) -> dict:
    """HF GPT-2 ``state_dict`` → our transformer decoder params
    (models/transformer.py layout) — BASELINE.json config 5's pretrained
    generator.

    Layout notes (transformers ``GPT2LMHeadModel``):
      * HF ``Conv1D`` stores weights [in, out] — exactly our dense layout,
        so ``c_attn``/``c_proj``/``c_fc`` convert WITHOUT transposes;
        ``c_attn`` [d, 3d] splits into q/k/v by column.
      * ``wte`` [V, d] doubles as the (tied) LM head; our separate
        ``linear`` {w [V, d]} takes the same matrix.
      * BPE ids are offset by ``num_specials`` (data/bpe.py), so
        ``num_specials`` fresh N(0, 0.02²) rows are PREPENDED to wte (and
        to the head) for <PAD>/<S>/<E>/<UNK>.
      * ``wpe`` is truncated/used from row 0; the caption's feature token
        occupies position 0 (our captioning adaptation — one-position
        shift vs a pure LM).
      * cross-attention blocks (``cross``/``ln_cross``/``ctx_proj``) have
        no GPT-2 counterpart and are NOT returned — callers graft them
        from a freshly initialized tree (src/import_gpt2.py does this).

    Accepts keys with or without the ``transformer.`` prefix.
    """
    import numpy as np

    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):]: v for k, v in sd.items()
              if k.startswith("transformer.")}
    wte = np.asarray(_a(sd["wte.weight"]))
    d = wte.shape[1]
    rng = np.random.RandomState(specials_seed)
    specials = (rng.standard_normal((num_specials, d)) * 0.02).astype(
        wte.dtype)
    wte_x = np.concatenate([specials, wte], axis=0)

    wpe = np.asarray(_a(sd["wpe.weight"]))
    L = min(seq_len_plus_1, wpe.shape[0])
    pos = np.zeros((seq_len_plus_1, d), wpe.dtype)
    pos[:L] = wpe[:L]

    def ln(name):
        return {"scale": _a(sd[f"{name}.weight"]),
                "bias": _a(sd[f"{name}.bias"])}

    blocks = []
    i = 0
    while f"h.{i}.ln_1.weight" in sd:
        base = f"h.{i}"
        ca_w = _a(sd[f"{base}.attn.c_attn.weight"])   # [d, 3d]
        ca_b = _a(sd[f"{base}.attn.c_attn.bias"])     # [3d]
        blocks.append({
            "ln1": ln(f"{base}.ln_1"),
            "attn": {
                "wq": {"w": ca_w[:, 0 * d:1 * d], "b": ca_b[0 * d:1 * d]},
                "wk": {"w": ca_w[:, 1 * d:2 * d], "b": ca_b[1 * d:2 * d]},
                "wv": {"w": ca_w[:, 2 * d:3 * d], "b": ca_b[2 * d:3 * d]},
                "wo": {"w": _a(sd[f"{base}.attn.c_proj.weight"]),
                       "b": _a(sd[f"{base}.attn.c_proj.bias"])},
            },
            "ln2": ln(f"{base}.ln_2"),
            "mlp": {"fc1": {"w": _a(sd[f"{base}.mlp.c_fc.weight"]),
                            "b": _a(sd[f"{base}.mlp.c_fc.bias"])},
                    "fc2": {"w": _a(sd[f"{base}.mlp.c_proj.weight"]),
                            "b": _a(sd[f"{base}.mlp.c_proj.bias"])}},
        })
        i += 1

    return {
        "embed": jnp.asarray(wte_x),
        "pos": jnp.asarray(pos),
        "blocks": blocks,
        "ln_f": ln("ln_f"),
        # tied head (lm_head == wte), torch Linear layout [V, d]
        "linear": {"w": jnp.asarray(wte_x),
                   "b": jnp.zeros((wte_x.shape[0],), wte_x.dtype)},
    }


def vit_from_torch(sd: Dict, image_size: int = 224) -> Tuple[dict, dict]:
    """HF ``ViTModel`` state_dict → ``(weights, stats)`` for
    ``models/vit.py`` — BASELINE.json config 5's pretrained image encoder
    (mirrors :func:`gpt2_decoder_from_torch` for the generator side).

    Layout notes (transformers ``ViTModel``, e.g. google/vit-base-patch16):
      * HF uses ``nn.Linear`` ([out, in]) everywhere — every dense weight
        transposes into our [in, out] layout (unlike GPT-2's Conv1D);
      * the patch projection is a stride-16 Conv2d [d, 3, 16, 16]; our
        patchify flattens patches in (ph, pw, c) order, so the kernel
        permutes to (kh, kw, in_c, out) before flattening;
      * q/k/v are separate Linears (no fused c_attn split);
      * position embeddings [1, P+1, d]: row 0 is CLS; when the target
        ``image_size`` implies a different patch grid, the patch rows are
        bilinearly resized on the 2-D grid (standard ViT fine-tuning
        practice) and CLS kept as-is;
      * ViT has no BatchNorm — ``stats`` is the empty dict vit.py threads.

    Activation caveat: HF ViT uses exact (erf) GELU while our shared block
    stack uses the tanh approximation (GPT-2's gelu_new) — features differ
    by O(1e-3), irrelevant for transfer; the oracle test fabricates its
    checkpoint with ``hidden_act='gelu_new'`` for an exact comparison.

    Accepts keys with or without the ``vit.`` prefix.
    """
    import numpy as np

    if any(k.startswith("vit.") for k in sd):
        sd = {k[len("vit."):]: v for k, v in sd.items()
              if k.startswith("vit.")}

    cls = np.asarray(_a(sd["embeddings.cls_token"]))            # [1, 1, d]
    d = cls.shape[-1]
    pw = np.asarray(_a(sd["embeddings.patch_embeddings.projection.weight"]))
    patch = pw.shape[-1]
    # [d, 3, kh, kw] → [(kh, kw, c), d] matching vit._patchify's order
    patch_w = np.transpose(pw, (2, 3, 1, 0)).reshape(-1, d)
    patch_b = np.asarray(
        _a(sd["embeddings.patch_embeddings.projection.bias"]))

    pos = np.asarray(_a(sd["embeddings.position_embeddings"]))[0]  # [P+1, d]
    src_grid = int(round((pos.shape[0] - 1) ** 0.5))
    dst_grid = image_size // patch
    if dst_grid != src_grid:
        import jax

        grid = pos[1:].reshape(src_grid, src_grid, d)
        grid = np.asarray(jax.image.resize(
            jnp.asarray(grid), (dst_grid, dst_grid, d), method="linear"))
        pos = np.concatenate([pos[:1], grid.reshape(dst_grid * dst_grid, d)],
                             axis=0)

    def lin(name):  # HF nn.Linear [out, in] → ours [in, out]
        return {"w": jnp.asarray(np.asarray(_a(sd[f"{name}.weight"])).T),
                "b": _a(sd[f"{name}.bias"])}

    def ln(name):
        return {"scale": _a(sd[f"{name}.weight"]),
                "bias": _a(sd[f"{name}.bias"])}

    blocks = []
    i = 0
    while f"encoder.layer.{i}.layernorm_before.weight" in sd:
        base = f"encoder.layer.{i}"
        blocks.append({
            "ln1": ln(f"{base}.layernorm_before"),
            "attn": {
                "wq": lin(f"{base}.attention.attention.query"),
                "wk": lin(f"{base}.attention.attention.key"),
                "wv": lin(f"{base}.attention.attention.value"),
                "wo": lin(f"{base}.attention.output.dense"),
            },
            "ln2": ln(f"{base}.layernorm_after"),
            "mlp": {"fc1": lin(f"{base}.intermediate.dense"),
                    "fc2": lin(f"{base}.output.dense")},
        })
        i += 1

    weights = {
        "patch_embed": {"w": jnp.asarray(patch_w), "b": patch_b},
        "cls": jnp.asarray(cls),
        "pos": jnp.asarray(pos),
        "blocks": blocks,
        "ln_f": ln("layernorm"),
    }
    return weights, {}
