"""Ring attention (sequence parallelism) on the virtual 8-device CPU mesh:
the ring online-softmax must reproduce single-device causal attention
exactly (float tolerance), including the quantized-wire variant within
int8-KV accuracy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from piquant_tpu.parallel.ring_attention import sp_prefill_attention

SEED = 0x9032002
SP = 4


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < SP:
        pytest.skip("needs virtual devices")
    return Mesh(np.array(devs[:SP]), ("sp",))


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bhtd,bhsd->bhts", q.astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) * scale
    t = q.shape[2]
    mask = jnp.arange(t)[None, :] >= jnp.arange(t)[:, None]  # causal: s<=t
    s = jnp.where(mask.T[None, None], s, -jnp.inf)
    pr = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", pr.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("qwire", [False, True])
def test_ring_matches_single_device(mesh, qwire):
    b, h, t, d = 2, 4, 64, 32  # t sharded 4-ways -> 16 per device
    key = jax.random.key(SEED)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (b, h, t, d),
                                 jnp.float32) for i in range(3))
    scale = d ** -0.5
    want = np.asarray(_ref_attention(q, k, v, scale))

    tl = t // SP
    pos = jnp.arange(t, dtype=jnp.int32)

    def shard_fn(qs, ks, vs, ps):
        out = sp_prefill_attention(qs, ks, vs, ps, "sp", scale=scale,
                                   quantized_wire=qwire)
        return out

    f = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None, "sp", None), P(None, None, "sp", None),
                  P(None, None, "sp", None), P("sp")),
        out_specs=P(None, None, "sp", None)))
    got = np.asarray(f(q, k, v, pos))

    if qwire:
        # int8 K/V wire: same tolerance class as the INT8 KV cache
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 0.06
    else:
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_ring_attention_one_ppermute_set_per_hop(mesh):
    """P hops -> P ppermute 'rounds'; the quantized wire rides the SAME
    rotation (no extra collectives beyond the K/V block rotation)."""
    b, h, t, d = 1, 2, 32, 16
    tl = t // SP
    pos = jnp.arange(t, dtype=jnp.int32)

    def shard_fn(qs, ks, vs, ps):
        return sp_prefill_attention(qs, ks, vs, ps, "sp")

    f = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3 + (P("sp"),),
        out_specs=P(None, None, "sp", None))
    q = jnp.zeros((b, h, t, d))
    jaxpr = str(jax.make_jaxpr(f)(q, q, q, pos))
    # 3 rotated leaves (k, v, positions) x SP hops
    assert jaxpr.count("ppermute") == 3 * SP
