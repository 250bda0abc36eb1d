"""Pipeline parallelism on the virtual CPU mesh: forward equivalence with
sequential stage application, gradients, quantized-wire hops, and a tiny
quantized-MLP stack end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from piquant_tpu.parallel.pipeline import pipeline_apply, stack_stage_params

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

PP = 4
M, MB, D = 8, 2, 16


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:PP])
    return Mesh(devs, ("pp",))


def _stage_fn(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _make_stages(key):
    stages = []
    for i in range(PP):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        w = jax.random.normal(k1, (D, D), jnp.float32) * 0.5
        b = jax.random.normal(k2, (D,), jnp.float32) * 0.1
        stages.append((w, b))
    return stages


def _sequential(stages, x):
    for s in stages:
        x = jax.vmap(lambda mb: _stage_fn(s, mb))(x)
    return x


def test_pipeline_matches_sequential(mesh):
    stages = _make_stages(jax.random.key(0))
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.key(1), (M, MB, D), jnp.float32)

    f = shard_map(
        lambda p, v: pipeline_apply(_stage_fn, p, v, "pp"),
        mesh=mesh, in_specs=(P("pp"), P()), out_specs=P())
    # shard_map slices the stacked [P, ...] leaves; stage_fn sees [1, ...]
    got = f(jax.tree.map(lambda a: a, stacked), x)
    # NB: shard_map keeps the sliced leading axis of size 1
    want = _sequential(stages, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_quantized_wire(mesh):
    stages = _make_stages(jax.random.key(2))
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.key(3), (M, MB, D), jnp.float32)

    f = shard_map(
        lambda p, v: pipeline_apply(_stage_fn, p, v, "pp",
                                    wire_quant="uint8"),
        mesh=mesh, in_specs=(P("pp"), P()), out_specs=P())
    got = f(stacked, x)
    want = _sequential(stages, x)
    # int8 activation hops: bounded relative error, not exactness
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 0.1, err


def test_pipeline_grad(mesh):
    stages = _make_stages(jax.random.key(4))
    stacked = stack_stage_params(stages)
    x = jax.random.normal(jax.random.key(5), (M, MB, D), jnp.float32)

    def loss_pp(p, v):
        f = shard_map(
            lambda pp_, v_: pipeline_apply(_stage_fn, pp_, v_, "pp"),
            mesh=mesh, in_specs=(P("pp"), P()), out_specs=P())
        return jnp.mean(f(p, v) ** 2)

    def loss_seq(stages_, v):
        return jnp.mean(_sequential(stages_, v) ** 2)

    g_pp = jax.grad(loss_pp)(stacked, x)
    g_seq = jax.grad(loss_seq)(stages, x)
    g_seq_stacked = stack_stage_params(g_seq)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
