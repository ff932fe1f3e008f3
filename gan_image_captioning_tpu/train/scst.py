"""Self-critical sequence training (SCST): metric-reward finetuning.

The reference's quality loop is MLE then adversarial (``training.py:201-
235``); the captioning literature's standard *quality* finetune is SCST
(Rennie et al., CVPR 2017): REINFORCE on a sentence-level metric reward
(CIDEr-D on the COCO leaderboard) with the model's OWN greedy decode as
the baseline, so the advantage is "did sampling beat what I would have
said anyway".  This module adds that phase, flag-gated as
``--scst-epochs`` between MLE pretraining and adversarial training.

Device/host split (TPU-first):

* **Rollout** (jitted): one program samples a caption per image
  (categorical via the shared Gumbel-max stepper machinery,
  ``eval/decode.sample_decode``) AND greedy-decodes the baseline —
  conditioning runs once, both decodes share it.
* **Reward** (host): CIDEr-D / smoothed sentence BLEU are sparse n-gram
  hash-map arithmetic — anti-XLA shapes.  They price the *fetched ids*
  on host while the device is free; the reward enters the update as a
  ``stop_gradient`` coefficient so no gradient crosses the host boundary.
  CIDEr idf is FIT ONCE over the training references
  (:class:`eval.cider.CiderScorer`) — per-batch idf would make the
  reward non-stationary.
* **Update** (jitted): ``loss = -mean(advantage * log pi(sampled))``
  where the log-probability is a teacher-forced differentiable rescore
  of the sampled ids (``eval/decode.sequence_logprob`` — the decoupled-
  rescore structure: big MXU matmuls, masked at the first ``<E>``).
  The update reuses the adversarial generator optimizer chain
  (``state.gen_opt_state`` — optax Adam state is LR-independent, so
  ``--scst-lr`` can differ from ``--gen-lr`` without a new state field,
  and resume/checkpoint shapes are unchanged).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.eval import decode as decode_lib
from gan_image_captioning_tpu.eval.metrics import strip_caption
from gan_image_captioning_tpu.models import api
from gan_image_captioning_tpu.train.state import make_optimizer
from gan_image_captioning_tpu.train.steps import (_ema_update,
                                                  _merge_bn_stats)


def make_scst_programs(config: Config):
    """Build the two jitted device programs: ``rollout`` and ``update``.

    ``rollout(gen_params, batch, rng) -> (sampled_ids, greedy_ids)``
    ``update(state, batch, sampled_ids, advantage, rng) -> (state, loss)``
    ``greedy_only(gen_params, batch) -> greedy_ids`` (val sweeps)
    """
    lr = config.scst_lr if config.scst_lr > 0 else config.gen_lr
    tx = make_optimizer(lr, config.clip_norm, config)

    def rollout(gen_params, batch, rng):
        cond, _ = api.generator_condition(config, gen_params, batch,
                                          train=False)
        sampled, _ = decode_lib.sample_decode(
            gen_params, cond["features"], config, rng,
            context=cond["context"])
        greedy = decode_lib.greedy(gen_params, cond["features"], config,
                                   context=cond["context"])
        return sampled, greedy

    def greedy_only(gen_params, batch):
        # val sweeps score the greedy decode only — don't pay the
        # stochastic rollout's second full decode there
        cond, _ = api.generator_condition(config, gen_params, batch,
                                          train=False)
        return decode_lib.greedy(gen_params, cond["features"], config,
                                 context=cond["context"])

    def update(state, batch, sampled_ids, advantage, rng):
        def loss_fn(gp):
            cond, new_stats = api.generator_condition(config, gp, batch,
                                                      train=True)
            lp = decode_lib.sequence_logprob(gp, cond["features"],
                                             sampled_ids, config,
                                             cond["context"])
            return -jnp.mean(advantage * lp), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.gen_params)
        updates, gen_opt_state = tx.update(grads, state.gen_opt_state,
                                           state.gen_params)
        gen_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.gen_params, updates)
        gen_params = _merge_bn_stats(gen_params, new_stats)
        state = state._replace(
            gen_params=gen_params,
            gen_opt_state=gen_opt_state,
            gen_steps=state.gen_steps + 1,
            rng=rng,
            ema_gen_params=_ema_update(config, state.ema_gen_params,
                                       gen_params),
        )
        return state, loss

    return jax.jit(rollout), jax.jit(update), jax.jit(greedy_only)


def build_row_references(dataset, multi_ref: bool) -> List[List[list]]:
    """Per-dataset-row reference sets (stripped token lists).

    ``multi_ref`` groups rows by ``dataset.image_key`` — row i's reward is
    scored against ALL of its image's captions (the coco-caption pairing;
    the dataset is flattened per-caption).  Without it each row pairs with
    its own caption only.  Uses ``caption_ids`` when the dataset offers it
    (skips image decode on conditional data).
    """
    get = getattr(dataset, "caption_ids", None)
    if get is None:
        get = lambda i: dataset.sample(i)[0]  # noqa: E731
    caps = [strip_caption(get(i)) for i in range(len(dataset))]
    if not multi_ref:
        return [[c] for c in caps]
    key_of = getattr(dataset, "image_key", None)
    if key_of is None:
        return [[c] for c in caps]
    groups: dict = {}
    for i in range(len(dataset)):
        groups.setdefault(key_of(i), []).append(caps[i])
    return [groups[key_of(i)] for i in range(len(dataset))]


def build_reward_fn(config: Config, train_dataset, row_refs=None):
    """Resolve ``--scst-reward`` into ``reward(cand_ids_row, refs) ->
    float`` over STRIPPED token lists.

    For CIDEr the idf corpus is the training set's reference sets (one
    document per image under ``--scst-multi-ref``, else one per row —
    coco-caption fits idf over its reference sets the same way).
    """
    if config.scst_reward == "bleu":
        from gan_image_captioning_tpu.eval.bleu import sentence_bleu

        return lambda cand, refs: sentence_bleu(cand, refs)
    from gan_image_captioning_tpu.eval.cider import CiderScorer

    if row_refs is None:
        row_refs = build_row_references(train_dataset,
                                        config.scst_multi_ref)
    # one idf document per distinct reference set (per image)
    if config.scst_multi_ref:
        seen, corpus = set(), []
        for refs in row_refs:
            key = tuple(tuple(r) for r in refs)
            if key not in seen:
                seen.add(key)
                corpus.append(refs)
    else:
        corpus = row_refs
    scorer = CiderScorer(corpus)
    return scorer.score


def batch_advantage(reward_fn, sampled_ids: np.ndarray,
                    greedy_ids: np.ndarray, ref_rows: np.ndarray,
                    row_refs=None, index=None) -> np.ndarray:
    """Self-critical advantage per row: r(sampled) - r(greedy).

    References: the row's image's full set when ``row_refs``/``index``
    are given (multi-ref), else the row's own caption from the batch.
    """
    B = sampled_ids.shape[0]
    adv = np.zeros((B,), np.float32)
    for i in range(B):
        if row_refs is not None and index is not None:
            refs = row_refs[int(index[i])]
        else:
            refs = [strip_caption(ref_rows[i])]
        r = reward_fn(strip_caption(sampled_ids[i]), refs)
        b = reward_fn(strip_caption(greedy_ids[i]), refs)
        adv[i] = r - b
    return adv


def batch_reward(reward_fn, ids: np.ndarray, ref_rows: np.ndarray,
                 row_refs=None, index=None, weights=None):
    """Weighted (sum, count) of metric rewards over real rows — pad rows
    (weight 0) are excluded so partial final batches don't skew val means."""
    B = ids.shape[0]
    tot, cnt = 0.0, 0
    for i in range(B):
        if weights is not None and weights[i] == 0:
            continue
        if row_refs is not None and index is not None:
            refs = row_refs[int(index[i])]
        else:
            refs = [strip_caption(ref_rows[i])]
        tot += reward_fn(strip_caption(ids[i]), refs)
        cnt += 1
    return tot, cnt
