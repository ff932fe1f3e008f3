"""Export params back to the reference's PyTorch ``state_dict`` format.

The inverse of :mod:`torch_import` — TPU-trained weights flow back into the
reference codebase: exported dicts use the reference's exact module names
(generator ``encoder.resnet.{0..7}.* / encoder.linear / encoder.bn /
decoder.embed / decoder.lstm / decoder.linear``, generator.py:8-36 +
nn.Sequential numbering generator.py:13-14; discriminator ``embeddings /
convs.{i} / highway / feature2out / out2logits``, discriminator.py:9-33),
so ``Generator(args).load_state_dict(...)`` / ``torch.load`` on the
reference side work unchanged.

Round-trip guarantee (tested): ``torch_import.generator_from_torch(
generator_to_torch(params)) == params`` exactly, and the exported key set
matches the reference layout including BatchNorm ``num_batches_tracked``
rows (zeros) for strict loading.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x):
    """Framework array → torch tensor (torch is a host-side dependency of
    the export path only)."""
    import torch

    return torch.from_numpy(np.array(x))


def _bn(out: Dict, name: str, weights: dict, stats: dict):
    out[f"{name}.weight"] = _t(weights["scale"])
    out[f"{name}.bias"] = _t(weights["bias"])
    out[f"{name}.running_mean"] = _t(stats["mean"])
    out[f"{name}.running_var"] = _t(stats["var"])
    import torch

    out[f"{name}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)


def resnet18_to_torch(weights: dict, stats: dict,
                      prefix: str = "") -> Dict:
    """(weights, stats) trees → torchvision-style resnet18 state_dict
    (inverse of ``torch_import.resnet18_from_torch``)."""
    out: Dict = {f"{prefix}conv1.weight": _t(weights["conv1"]["w"])}
    _bn(out, f"{prefix}bn1", weights["bn1"], stats["bn1"])
    for s in range(1, 5):
        for b in range(2):
            bw, bs = weights[f"layer{s}"][b], stats[f"layer{s}"][b]
            base = f"{prefix}layer{s}.{b}"
            out[f"{base}.conv1.weight"] = _t(bw["conv1"]["w"])
            out[f"{base}.conv2.weight"] = _t(bw["conv2"]["w"])
            _bn(out, f"{base}.bn1", bw["bn1"], bs["bn1"])
            _bn(out, f"{base}.bn2", bw["bn2"], bs["bn2"])
            if "downsample" in bw:
                out[f"{base}.downsample.0.weight"] = _t(bw["downsample"]["w"])
                _bn(out, f"{base}.downsample.1", bw["downsample_bn"],
                    bs["downsample_bn"])
    return out


def _named_to_sequential(sd: Dict, prefix: str) -> Dict:
    """torchvision names → the reference's numeric nn.Sequential keys
    (inverse of ``torch_import._sequential_to_named``)."""
    name_map = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                "layer3": "6", "layer4": "7"}
    out = {}
    for key, val in sd.items():
        head, _, tail = key.partition(".")
        out[prefix + name_map[head] + ("." + tail if tail else "")] = val
    return out


def generator_to_torch(params: dict) -> Dict:
    """Our generator params tree → the reference generator ``state_dict``
    (inverse of ``torch_import.generator_from_torch``)."""
    dec = params["decoder"]
    out: Dict = {"decoder.embed.weight": _t(dec["embed"]),
                 "decoder.linear.weight": _t(dec["linear"]["w"]),
                 "decoder.linear.bias": _t(dec["linear"]["b"])}
    for k, layer in enumerate(dec["lstm"]):
        out[f"decoder.lstm.weight_ih_l{k}"] = _t(layer["w_ih"])
        out[f"decoder.lstm.weight_hh_l{k}"] = _t(layer["w_hh"])
        out[f"decoder.lstm.bias_ih_l{k}"] = _t(layer["b_ih"])
        out[f"decoder.lstm.bias_hh_l{k}"] = _t(layer["b_hh"])
    if "encoder" in params and params["encoder"] is not None \
            and "backbone" in params["encoder"]:
        enc = params["encoder"]
        backbone_named = resnet18_to_torch(enc["backbone"],
                                           enc["bn_stats"]["backbone"])
        out.update(_named_to_sequential(backbone_named, "encoder.resnet."))
        out["encoder.linear.weight"] = _t(enc["proj"]["w"])
        out["encoder.linear.bias"] = _t(enc["proj"]["b"])
        out["encoder.bn.weight"] = _t(enc["head_bn"]["scale"])
        out["encoder.bn.bias"] = _t(enc["head_bn"]["bias"])
        out["encoder.bn.running_mean"] = _t(enc["bn_stats"]["head"]["mean"])
        out["encoder.bn.running_var"] = _t(enc["bn_stats"]["head"]["var"])
        import torch

        out["encoder.bn.num_batches_tracked"] = torch.zeros(
            (), dtype=torch.long)
    return out


def discriminator_to_torch(params: dict) -> Dict:
    """Our discriminator params tree → the reference discriminator
    ``state_dict`` (inverse of ``torch_import.discriminator_from_torch``)."""
    out: Dict = {"embeddings.weight": _t(params["embeddings"]["w"]),
                 "highway.weight": _t(params["highway"]["w"]),
                 "highway.bias": _t(params["highway"]["b"]),
                 "feature2out.weight": _t(params["feature2out"]["w"]),
                 "feature2out.bias": _t(params["feature2out"]["b"]),
                 "out2logits.weight": _t(params["out2logits"]["w"]),
                 "out2logits.bias": _t(params["out2logits"]["b"])}
    for i, conv in enumerate(params["convs"]):
        out[f"convs.{i}.weight"] = _t(conv["w"])
        out[f"convs.{i}.bias"] = _t(conv["b"])
    return out
