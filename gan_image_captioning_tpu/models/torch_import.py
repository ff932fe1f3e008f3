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
