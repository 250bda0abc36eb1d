"""Flash-decoding INT8-KV attention kernel vs the jnp reference path
(interpret mode, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from piquant_tpu.ops.pallas.attention import decode_attention

SEED = 0x9032002


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _jnp_reference(q, kc, ks, vc, vs, positions, scale):
    b, hkv, rep, d = q.shape
    s = kc.shape[2]
    kf = kc.astype(jnp.float32) * ks
    vf = vc.astype(jnp.float32) * vs
    scores = jnp.einsum("bhrd,bhsd->bhrs", q.astype(jnp.float32), kf) * scale
    idx = jnp.arange(s)[None, None, None, :]
    mask = idx <= positions[:, None, None, None]
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhrs,bhsd->bhrd", probs, vf)


@pytest.mark.parametrize("b,hkv,rep,s,d", [(2, 4, 2, 64, 128), (1, 2, 4, 256, 128)])
def test_decode_attention_matches_reference(b, hkv, rep, s, d):
    rng = np.random.default_rng(SEED)
    q = jnp.asarray(rng.normal(0, 1, (b, hkv, rep, d)), jnp.float32)
    kc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s, d)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (b, hkv, s, 1)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (b, hkv, s, 1)), jnp.float32)
    positions = jnp.asarray(rng.integers(0, s, (b,)), jnp.int32)
    scale = d ** -0.5

    got = decode_attention(q, kc, ks, vc, vs, positions, scale)
    assert got is not None
    want = _jnp_reference(q, kc, ks, vc, vs, positions, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)


def test_decode_attention_masks_first_position():
    # position 0: only kv index 0 participates
    b, hkv, rep, s, d = 1, 2, 2, 64, 128
    rng = np.random.default_rng(SEED + 1)
    kc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s, d)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s, d)), jnp.int8)
    ks = jnp.full((b, hkv, s, 1), 0.01, jnp.float32)
    vs = jnp.full((b, hkv, s, 1), 0.01, jnp.float32)
    q = jnp.asarray(rng.normal(0, 1, (b, hkv, rep, d)), jnp.float32)
    got = decode_attention(q, kc, ks, vc, vs, jnp.asarray([0], jnp.int32), d ** -0.5)
    want = (vc[:, :, 0].astype(jnp.float32) * 0.01)[:, :, None, :]
    want = jnp.broadcast_to(want, got.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-2)
