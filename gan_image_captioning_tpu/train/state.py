"""Full training state as one pytree.

The reference keeps three separate Adam optimizers over two models plus three
step counters as instance attributes (``training.py:24-26,40-42``) and
checkpoints only ``state_dict``s (no optimizer/step/RNG state, no resume —
``training.py:116-119,223-226``).  Here everything needed to resume
bit-exactly lives in one :class:`TrainState` pytree: params, all three
optimizer states, step counters, the Gumbel temperature, and the PRNG key.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gan_image_captioning_tpu.config import Config


class TrainState(NamedTuple):
    """Everything mutable about a training run, as one pytree."""

    gen_params: Any
    disc_params: Any
    # Three independent Adam chains, mirroring training.py:24-26 (the
    # pretrain and adversarial generator optimizers are distinct instances
    # with distinct moments over the same parameters).
    pretrain_opt_state: Any
    gen_opt_state: Any
    disc_opt_state: Any
    pretrain_steps: jnp.ndarray  # int32 scalar — training.py:40
    gen_steps: jnp.ndarray       # int32 scalar — training.py:41
    disc_steps: jnp.ndarray      # int32 scalar — training.py:42
    temperature: jnp.ndarray     # float32 scalar — generator.py:35 / training.py:190
    rng: jax.Array               # PRNG key threaded through sampling/dropout
    # EMA shadow of gen_params (``--ema-decay`` > 0), else None.  A new
    # trailing field with a default keeps positional construction of the
    # original 10-field state working.
    ema_gen_params: Any = None


def lr_schedule_fn(base_lr: float, config: Optional[Config]):
    """Resolve ``--lr-schedule`` into an optax schedule (or the plain float
    for the constant/no-warmup default, keeping the optimizer state pytree
    identical to the original stateless form).

    All three optimizer chains share the shape, each scaled by its own base
    LR: linear warmup over ``lr_warmup_steps``, then over ``lr_decay_steps``
    a cosine / linear / exponential descent to ``base_lr * lr_min_ratio``.
    """
    if config is None or (config.lr_schedule == "constant"
                          and config.lr_warmup_steps <= 0):
        return base_lr
    warmup = max(int(config.lr_warmup_steps), 0)
    decay = int(config.lr_decay_steps)
    if config.lr_schedule != "constant" and decay <= 0:
        raise ValueError("--lr-schedule %r needs --lr-decay-steps > 0"
                         % config.lr_schedule)
    end = base_lr * config.lr_min_ratio
    if config.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(base_lr, decay,
                                           alpha=config.lr_min_ratio)
    elif config.lr_schedule == "linear":
        main = optax.linear_schedule(base_lr, end, decay)
    elif config.lr_schedule == "exponential":
        rate = config.lr_min_ratio
        if not 0.0 < rate < 1.0:
            raise ValueError("--lr-schedule exponential needs "
                             "0 < --lr-min-ratio < 1 (the per-horizon rate)")
        main = optax.exponential_decay(base_lr, decay, rate)
    else:
        main = optax.constant_schedule(base_lr)
    if warmup == 0:
        return main
    ramp = optax.linear_schedule(0.0, base_lr, warmup)
    return optax.join_schedules([ramp, main], [warmup])


def make_optimizer(lr: float, clip_norm: float,
                   config: Optional[Config] = None
                   ) -> optax.GradientTransformation:
    """Adam preceded by global-norm clipping.

    Matches the reference update order — ``clip_grad_norm_(params, 5.0)``
    then ``Adam.step()`` (``training.py:194-199``) — and torch Adam defaults
    (betas 0.9/0.999, eps 1e-8), which optax.adam shares.

    GIC_BF16_MU=1 stores Adam's FIRST moment in bfloat16 (optax
    ``mu_dtype``): the fused step is HBM-bound and the optimizer phase is
    pure moment/param traffic, so halving the mu stream saves real step
    time; the variance accumulator stays float32 (its dynamic range —
    grad² — does not survive bf16).  Off by default: the reference-parity
    numerics keep full-precision state.
    """
    import os

    mu_dtype = (jnp.bfloat16 if os.environ.get("GIC_BF16_MU", "0") == "1"
                else None)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(lr_schedule_fn(lr, config), mu_dtype=mu_dtype),
    )


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside the clip→adam chain state and
    return (adam_state, rebuild) where rebuild(new_adam) reconstructs the
    full chain state pytree unchanged everywhere else."""
    # chain(clip, adam) state = (EmptyState, (ScaleByAdamState, lr_state))
    inner = opt_state[1]
    adam = inner[0]
    assert isinstance(adam, optax.ScaleByAdamState), type(adam)

    def rebuild(new_adam):
        return (opt_state[0], (new_adam,) + tuple(inner[1:]))
    return adam, rebuild


def fused_adam_active() -> bool:
    """GIC_FUSED_ADAM=1 routes the adversarial/pretrain updates through
    :func:`fused_clip_adam_apply` — the clip→Adam→apply elementwise chain
    written as ONE expression per leaf so no intermediate update tree
    (optax materializes clipped-grads and updates trees, plus the separate
    ``p + u`` pass) ever touches HBM.  Measured A/B:
    benchmarks/opt_fuse.py; numerics pinned vs the optax chain in
    tests/test_fused_adam.py."""
    import os

    return os.environ.get("GIC_FUSED_ADAM", "0") == "1"


def make_fused_update(lr: float, clip_norm: float,
                      config: Optional[Config] = None):
    """Fused replacement for ``tx.update(...)`` + ``apply_updates`` of
    :func:`make_optimizer`'s chain, for the CONSTANT-lr case (the
    flagship/bench path).  Returns ``fn(grads, opt_state, params) ->
    (new_params, new_opt_state, None)`` matching optax numerics:

      gnorm  = global_norm(g)
      g'     = g * min(1, clip/gnorm)        [optax.clip_by_global_norm]
      mu'    = b1·mu + (1−b1)·g'             [optax.scale_by_adam]
      nu'    = b2·nu + (1−b2)·g'²
      p'     = p − lr · (mu'/bc1) / (√(nu'/bc2) + eps)

    or None when the config uses an lr schedule (the optax chain handles
    those — schedules carry their own count state).  GIC_BF16_MU is
    honored (mu stored bf16, computed f32).
    """
    import os

    sched = lr_schedule_fn(lr, config)
    if not isinstance(sched, (int, float)):
        return None
    lr_f = float(sched)
    b1, b2, eps = 0.9, 0.999, 1e-8
    bf16_mu = os.environ.get("GIC_BF16_MU", "0") == "1"
    f32 = jnp.float32

    def update(grads, opt_state, params):
        adam, rebuild = _find_adam_state(opt_state)
        gnorm = optax.global_norm(grads)
        # optax.clip_by_global_norm: u * clip/max(gnorm, clip)
        scale = (clip_norm / jnp.maximum(gnorm, clip_norm)).astype(f32)
        count = optax.safe_int32_increment(adam.count)
        bc1 = 1.0 - b1 ** count.astype(f32)
        bc2 = 1.0 - b2 ** count.astype(f32)

        def leaf(p, g, mu, nu):
            g = g.astype(f32) * scale
            mu_n = b1 * mu.astype(f32) + (1.0 - b1) * g
            nu_n = b2 * nu.astype(f32) + (1.0 - b2) * (g * g)
            u = lr_f * (mu_n / bc1) / (jnp.sqrt(nu_n / bc2) + eps)
            p_n = (p.astype(f32) - u).astype(p.dtype)
            mu_out = mu_n.astype(jnp.bfloat16) if bf16_mu else mu_n
            return p_n, mu_out, nu_n

        out = jax.tree_util.tree_map(leaf, params, grads, adam.mu, adam.nu)
        is_triple = lambda x: (isinstance(x, tuple)  # noqa: E731
                               and len(x) == 3)
        pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
            lambda o: o[i], out, is_leaf=is_triple)
        new_p, new_mu, new_nu = pick(0), pick(1), pick(2)
        new_adam = optax.ScaleByAdamState(count=count, mu=new_mu, nu=new_nu)
        return new_p, rebuild(new_adam)

    return update


def create_train_state(config: Config, rng, gen_params=None, disc_params=None,
                       dtype=jnp.float32) -> TrainState:
    """Build models (if not given) and fresh optimizer/counter state."""
    from gan_image_captioning_tpu.models import api

    k_gen, k_disc, k_state = jax.random.split(rng, 3)
    if gen_params is None:
        gen_params = api.init_generator(k_gen, config, dtype)
    if disc_params is None:
        disc_params = api.init_discriminator(k_disc, config, dtype)

    pretrain_tx = make_optimizer(config.pretrain_lr, config.clip_norm, config)
    gen_tx = make_optimizer(config.gen_lr, config.clip_norm, config)
    disc_tx = make_optimizer(config.disc_lr, config.clip_norm, config)

    return TrainState(
        gen_params=gen_params,
        disc_params=disc_params,
        pretrain_opt_state=pretrain_tx.init(gen_params),
        gen_opt_state=gen_tx.init(gen_params),
        disc_opt_state=disc_tx.init(disc_params),
        pretrain_steps=jnp.zeros((), jnp.int32),
        gen_steps=jnp.zeros((), jnp.int32),
        disc_steps=jnp.zeros((), jnp.int32),
        temperature=jnp.asarray(1.0, jnp.float32),
        rng=k_state,
        ema_gen_params=(jax.tree_util.tree_map(jnp.copy, gen_params)
                        if config.ema_decay > 0.0 else None),
    )
