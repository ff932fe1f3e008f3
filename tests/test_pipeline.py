"""GPipe-style pipeline parallelism: pipelined == sequential."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_image_captioning_tpu.parallel.mesh import make_mesh
from gan_image_captioning_tpu.parallel.pipeline import (
    pipeline_apply, sequential_apply)


def _mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def _stacked_mlp(n_stages, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return {
        "w1": jax.random.normal(ks[0], (n_stages, d, 2 * d)) * 0.3,
        "b1": jax.random.normal(ks[1], (n_stages, 2 * d)) * 0.1,
        "w2": jax.random.normal(ks[2], (n_stages, 2 * d, d)) * 0.3,
        "b2": jax.random.normal(ks[3], (n_stages, d)) * 0.1,
    }


@pytest.mark.parametrize("n_stages,microbatches", [(2, 4), (4, 4), (4, 8)])
def test_pipeline_matches_sequential(devices8, n_stages, microbatches):
    mesh = make_mesh(f"pp:{n_stages}", devices8[:n_stages])
    d, b = 16, 16
    params = _stacked_mlp(n_stages, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d))

    ref = np.asarray(sequential_apply(params, x, _mlp_stage))
    out = np.asarray(jax.device_get(pipeline_apply(
        params, x, _mlp_stage, mesh, num_microbatches=microbatches)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pipeline_transformer_blocks(devices8):
    """Pipeline the transformer trunk itself (the stretch-config use case)."""
    from gan_image_captioning_tpu.models.transformer import (
        block_apply, init_block)

    n_stages, d, heads = 2, 16, 4
    blocks = [init_block(jax.random.PRNGKey(i), d, 2 * d, jnp.float32)
              for i in range(n_stages)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    def stage(params, x):
        return block_apply(params, x, heads)

    mesh = make_mesh("pp:2", devices8[:2])
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 6, d))
    ref = np.asarray(sequential_apply(stacked, x, stage))
    out = np.asarray(jax.device_get(
        pipeline_apply(stacked, x, stage, mesh, num_microbatches=4)))
    np.testing.assert_allclose(out, ref, atol=1e-5)
