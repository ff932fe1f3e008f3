"""Fused disc conv→relu→maxpool Pallas kernel vs the jnp/XLA path.

The kernel (kernels/disc_conv.py) must be numerics-equivalent to the
reference formulation — values AND gradients — across bank shapes, eds > 1,
and dtypes.  On CPU it runs in Pallas interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.config import Config
from gan_image_captioning_tpu.kernels.disc_conv import pooled_features
from gan_image_captioning_tpu.models import discriminator as disc


def jnp_pooled(params, emb, config):
    """The plain XLA path (conv_general + relu + max) as oracle."""
    eds = config.emb_dim_single
    emb4 = emb[:, None, :, :]
    pools = []
    for conv_params in params["convs"]:
        con = jax.nn.relu(disc._conv_bank(conv_params, emb4, eds))
        pools.append(jnp.max(con, axis=2))
    pred = jnp.concatenate(pools, axis=1)
    return jnp.transpose(pred, (0, 2, 1)).reshape(-1, config.disc_feature_dim)


CONFIGS = [
    # (vocab, E, num_rep, filter_sizes, num_filters, L) — eds = E/num_rep
    dict(disc_embed_dim=16, disc_num_rep=16, disc_filter_sizes=(2, 3, 4),
         disc_num_filters=(5, 6, 7), max_seq_len=8),           # eds = 1
    dict(disc_embed_dim=24, disc_num_rep=6, disc_filter_sizes=(3, 5),
         disc_num_filters=(4, 8), max_seq_len=10),             # eds = 4
    dict(disc_embed_dim=8, disc_num_rep=8, disc_filter_sizes=(3,),
         disc_num_filters=(9,), max_seq_len=5),                # single bank
]


@pytest.mark.parametrize("overrides", CONFIGS)
def test_kernel_matches_xla_forward(overrides):
    config = Config(vocab_size=50, **overrides)
    params = disc.init_discriminator_params(jax.random.PRNGKey(0), config)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (3, config.seq_len, config.disc_embed_dim))
    ref = np.asarray(jnp_pooled(params, emb, config))
    out = pooled_features(params["convs"], emb, config.emb_dim_single)
    out = np.asarray(out.reshape(-1, config.disc_feature_dim))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("overrides", CONFIGS)
def test_kernel_matches_xla_gradients(overrides):
    config = Config(vocab_size=50, **overrides)
    params = disc.init_discriminator_params(jax.random.PRNGKey(2), config)
    emb = jax.random.normal(
        jax.random.PRNGKey(3), (2, config.seq_len, config.disc_embed_dim))
    probe = jax.random.normal(
        jax.random.PRNGKey(4),
        (2 * config.disc_num_rep, config.disc_feature_dim))

    def loss_ref(convs, emb):
        p = dict(params, convs=convs)
        return jnp.sum(jnp_pooled(p, emb, config) * probe)

    def loss_ker(convs, emb):
        out = pooled_features(convs, emb, config.emb_dim_single)
        return jnp.sum(out.reshape(-1, config.disc_feature_dim) * probe)

    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        params["convs"], emb)
    v_k, g_k = jax.value_and_grad(loss_ker, argnums=(0, 1))(
        params["convs"], emb)
    np.testing.assert_allclose(float(v_k), float(v_r), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(g_r)
    flat_k, _ = jax.tree_util.tree_flatten(g_k)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_full_discriminator_path_with_kernel(monkeypatch):
    """apply() routed through the kernel equals the jnp path end-to-end."""
    config = Config(vocab_size=40, disc_embed_dim=16, disc_num_rep=16,
                    disc_filter_sizes=(2, 3), disc_num_filters=(4, 5),
                    max_seq_len=6)
    params = disc.init_discriminator_params(jax.random.PRNGKey(5), config)
    ids = jax.random.randint(jax.random.PRNGKey(6), (3, config.seq_len),
                             0, config.vocab_size)
    monkeypatch.setenv("GIC_DISC_KERNEL", "0")
    ref = np.asarray(disc.apply(params, ids, config))
    monkeypatch.setenv("GIC_DISC_KERNEL", "1")
    out = np.asarray(disc.apply(params, ids, config))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_adv_gradients_with_kernel(monkeypatch):
    """Full adversarial d-grad equality: kernel vs jnp conv path."""
    from gan_image_captioning_tpu.models import api
    from gan_image_captioning_tpu.train.steps import adv_losses

    config = Config(vocab_size=47, gen_embed_dim=8, gen_hidden_dim=12,
                    gen_num_layers=1, max_seq_len=6, disc_embed_dim=8,
                    disc_num_rep=8, disc_filter_sizes=(2, 3),
                    disc_num_filters=(4, 4))
    gp = api.init_generator(jax.random.PRNGKey(7), config)
    dp = api.init_discriminator(jax.random.PRNGKey(8), config)
    caps = jax.random.randint(jax.random.PRNGKey(9), (4, config.seq_len),
                              0, config.vocab_size)

    def d_grad():
        def loss(d):
            _, dl, _ = adv_losses(config, gp, d, {"captions": caps},
                                  jax.random.PRNGKey(10), 2.0, train=False)
            return dl
        return jax.grad(loss)(dp)

    monkeypatch.setenv("GIC_DISC_KERNEL", "0")
    g_ref = d_grad()
    monkeypatch.setenv("GIC_DISC_KERNEL", "1")
    g_ker = d_grad()
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten(g_ker)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_hybrid_matches_xla(monkeypatch):
    """GIC_DISC_KERNEL=2 (XLA conv forward + Pallas backward): values and
    all parameter gradients equal the pure-XLA path."""
    from gan_image_captioning_tpu.config import Config
    from gan_image_captioning_tpu.models import discriminator as d

    config = Config(vocab_size=64, disc_embed_dim=12, disc_num_rep=4,
                    max_seq_len=7, disc_filter_sizes=(2, 3, 4),
                    disc_num_filters=(4, 5, 6))
    params = d.init_discriminator_params(jax.random.PRNGKey(2), config)
    emb = jax.random.normal(jax.random.PRNGKey(3), (3, config.seq_len, 12))

    def run(env):
        monkeypatch.setenv("GIC_DISC_KERNEL", env)

        def loss(p):
            return jnp.sum(d.conv_pooled(p, emb, config) ** 2)

        return jax.value_and_grad(loss)(params)

    l0, g0 = run("")
    l2, g2 = run("2")
    np.testing.assert_allclose(float(l0), float(l2), rtol=1e-5)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g0, g2)


# ------------------------------------------------------------- mxu engine

MXU_CONFIGS = [CONFIGS[0], CONFIGS[2]]  # B·R % 8 == 0 at B ∈ {2, 3, 4}


@pytest.mark.parametrize("overrides", MXU_CONFIGS)
def test_mxu_matches_xla_forward(overrides):
    config = Config(vocab_size=50, **overrides)
    params = disc.init_discriminator_params(jax.random.PRNGKey(0), config)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (3, config.seq_len, config.disc_embed_dim))
    ref = np.asarray(jnp_pooled(params, emb, config))
    out = pooled_features(params["convs"], emb, config.emb_dim_single,
                          impl="mxu")
    out = np.asarray(out.reshape(-1, config.disc_feature_dim))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("overrides", MXU_CONFIGS)
@pytest.mark.parametrize("dx_mode", ["0", "1"])
def test_mxu_matches_xla_gradients(overrides, dx_mode, monkeypatch):
    # dx_mode "1" = in-kernel overlap-add backward (default), "0" = the
    # per-timestep DXS tensor + XLA overlap-add variant
    monkeypatch.setenv("GIC_MXU_DX", dx_mode)
    config = Config(vocab_size=50, **overrides)
    params = disc.init_discriminator_params(jax.random.PRNGKey(2), config)
    emb = jax.random.normal(
        jax.random.PRNGKey(3), (4, config.seq_len, config.disc_embed_dim))
    probe = jax.random.normal(
        jax.random.PRNGKey(4),
        (4 * config.disc_num_rep, config.disc_feature_dim))

    def loss(convs, emb, impl):
        out = pooled_features(convs, emb, config.emb_dim_single, impl=impl)
        return jnp.sum(out.reshape(-1, config.disc_feature_dim) * probe)

    v_r, g_r = jax.value_and_grad(loss, argnums=(0, 1))(
        params["convs"], emb, "hybrid")
    v_k, g_k = jax.value_and_grad(loss, argnums=(0, 1))(
        params["convs"], emb, "mxu")
    np.testing.assert_allclose(float(v_k), float(v_r), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(g_r)
    flat_k, _ = jax.tree_util.tree_flatten(g_k)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mxu_env_routing_full_disc(monkeypatch):
    """GIC_DISC_KERNEL=3 routes apply() through the mxu engine with the
    same values and d-gradients as the pure-XLA path."""
    config = Config(vocab_size=64, disc_embed_dim=16, disc_num_rep=8,
                    max_seq_len=7, disc_filter_sizes=(2, 3, 4),
                    disc_num_filters=(4, 5, 6))
    params = disc.init_discriminator_params(jax.random.PRNGKey(2), config)
    emb = jax.random.normal(jax.random.PRNGKey(3), (3, config.seq_len, 16))

    def run(env):
        monkeypatch.setenv("GIC_DISC_KERNEL", env)

        def loss(p):
            return jnp.sum(disc.conv_pooled(p, emb, config) ** 2)

        return jax.value_and_grad(loss)(params)

    l0, g0 = run("")
    l3, g3 = run("3")
    np.testing.assert_allclose(float(l0), float(l3), rtol=1e-5)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g0, g3)


def test_mxu_odd_rows_falls_back():
    """B·R not divisible by 8 → the mxu branch silently uses the hybrid
    engine (same numerics, no crash)."""
    config = Config(vocab_size=50, disc_embed_dim=24, disc_num_rep=6,
                    disc_filter_sizes=(3, 5), disc_num_filters=(4, 8),
                    max_seq_len=10)
    params = disc.init_discriminator_params(jax.random.PRNGKey(0), config)
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (3, config.seq_len, config.disc_embed_dim))
    ref = np.asarray(jnp_pooled(params, emb, config))
    out = pooled_features(params["convs"], emb, config.emb_dim_single,
                          impl="mxu")
    out = np.asarray(out.reshape(-1, config.disc_feature_dim))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


# -------------------------------------------------------- --disc-engine flag

def test_disc_engine_flag_routing(monkeypatch):
    """--disc-engine drives _use_conv_kernel when the env knob is unset;
    GIC_DISC_KERNEL overrides the flag; 'auto' is XLA off-TPU; Pallas
    engines require the kernel mesh when --mesh is configured."""
    monkeypatch.delenv("GIC_DISC_KERNEL", raising=False)
    base = dict(vocab_size=50, **CONFIGS[0])

    # auto off-TPU (this suite runs on CPU) → pure XLA
    assert disc._use_conv_kernel(Config(**base)) == ""
    # explicit engines honored
    for eng in ("pallas", "hybrid", "mxu"):
        assert disc._use_conv_kernel(Config(disc_engine=eng, **base)) == eng
    assert disc._use_conv_kernel(Config(disc_engine="xla", **base)) == ""
    # env var wins over the flag
    monkeypatch.setenv("GIC_DISC_KERNEL", "2")
    assert disc._use_conv_kernel(
        Config(disc_engine="mxu", **base)) == "hybrid"
    monkeypatch.setenv("GIC_DISC_KERNEL", "0")
    assert disc._use_conv_kernel(Config(disc_engine="mxu", **base)) == ""
    # --mesh without an installed kernel mesh → engines off (GSPMD cannot
    # partition the opaque Mosaic custom-calls)
    monkeypatch.delenv("GIC_DISC_KERNEL", raising=False)
    meshed = Config(disc_engine="mxu", mesh="data:4", **base)
    assert disc._use_conv_kernel(meshed) == ""
    from gan_image_captioning_tpu.kernels import decode_sample as dsk
    from gan_image_captioning_tpu.parallel.mesh import make_mesh

    dsk.set_mesh(make_mesh("data:4", devices=jax.devices()[:4]))
    try:
        assert disc._use_conv_kernel(meshed) == "mxu"
    finally:
        dsk.set_mesh(None)


def test_disc_engine_flag_e2e(monkeypatch):
    """Config(disc_engine='mxu') produces the same values/gradients as the
    pure-XLA default through the full discriminator apply path."""
    monkeypatch.delenv("GIC_DISC_KERNEL", raising=False)
    base = dict(vocab_size=64, disc_embed_dim=16, disc_num_rep=8,
                max_seq_len=7, disc_filter_sizes=(2, 3, 4),
                disc_num_filters=(4, 5, 6))
    params = disc.init_discriminator_params(
        jax.random.PRNGKey(2), Config(**base))
    emb = jax.random.normal(jax.random.PRNGKey(3), (3, Config(**base).seq_len, 16))

    def run(config):
        def loss(p):
            return jnp.sum(disc.conv_pooled(p, emb, config) ** 2)

        return jax.value_and_grad(loss)(params)

    l0, g0 = run(Config(disc_engine="xla", **base))
    l1, g1 = run(Config(disc_engine="mxu", **base))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g0, g1)
