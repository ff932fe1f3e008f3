"""TPU-native GAN image-captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference ``kawshik8/GAN-Image-Captioning`` (mounted read-only at
``/root/reference``): a GAN captioner for MS-COCO with

* a CNN (ResNet-18) or ViT image encoder,
* an LSTM or transformer caption generator sampling via Gumbel-softmax
  relaxation (RelGAN-style),
* a RelGAN multi-representation CNN / transformer / autoregressive
  discriminator,
* MLE pre-training followed by alternating adversarial G/D training with a
  temperature schedule,
* a six-variant GAN loss zoo and seven temperature policies,
* greedy and beam caption decoding as batched ``lax.scan`` loops,
* BLEU-4 / NLL_gen evaluation,
* pjit/GSPMD data- and tensor-parallelism over a ``jax.sharding.Mesh``.

The design is TPU-first (fused jitted train steps, static shapes, scan-based
decoding, sharded vocab-dim projections) rather than a port of the reference's
eager PyTorch structure.  Where semantics matter for output fidelity (loss
definitions, init strategies, sampling math, CLI flags) the docstrings cite
the reference as ``file:line``.
"""

__version__ = "0.3.0"  # kept in sync with pyproject.toml

from gan_image_captioning_tpu.config import Config, build_parser, config_from_args  # noqa: F401
