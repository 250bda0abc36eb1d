"""QAT fake-quant STE tests: forward equals requantize, backward is the
clipped identity, and a tiny QAT training loop reduces loss."""

import numpy as np
import jax
import jax.numpy as jnp

from piquant_tpu.api import requantize
from piquant_tpu.quant.qat import fake_quant

SEED = 0x9032002


def test_forward_matches_requantize():
    rng = np.random.default_rng(SEED)
    x = jnp.asarray(rng.uniform(-2, 2, 4096), jnp.float32)
    y = fake_quant(x, 0.01, 127, "uint8")
    want = requantize(x, 0.01, 127, "uint8")
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)


def test_ste_gradient_clipped_identity():
    # representable range for uint8, scale .01, zp 127: x in ~[-1.27, 1.28]
    x = jnp.asarray([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0], jnp.float32)
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, 0.01, 127, "uint8")))(x)
    np.testing.assert_array_equal(np.asarray(g), [0.0, 1.0, 1.0, 1.0, 1.0, 0.0])


def test_qat_training_reduces_loss():
    # fit y = x @ w under int4 fake-quant of w
    rng = np.random.default_rng(SEED)
    xs = jnp.asarray(rng.normal(0, 1, (256, 16)), jnp.float32)
    w_true = jnp.asarray(rng.normal(0, 0.5, (16, 4)), jnp.float32)
    ys = xs @ w_true

    def loss(w):
        wq = fake_quant(w, 0.1, 8, "uint4")
        return jnp.mean((xs @ wq - ys) ** 2)

    w = jnp.zeros((16, 4), jnp.float32)
    l0 = float(loss(w))
    for _ in range(60):
        w = w - 0.1 * jax.grad(loss)(w)
    l1 = float(loss(w))
    assert l1 < l0 * 0.2, (l0, l1)


def test_fake_quant_weight_group_ste():
    """Group-wise weight fake-quant: forward equals dequant(quantize(w)),
    gradient is identity (STE)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from piquant_tpu.quant.linear import quantize_linear_weight
    from piquant_tpu.quant.qat import fake_quant_weight

    w = jax.random.normal(jax.random.key(0), (64, 32), jnp.float32) * 0.1
    y = fake_quant_weight(w, 2, group_size=16)
    want = quantize_linear_weight(w, 2, group_size=16).dequantize(jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-6)

    g = jax.grad(lambda v: jnp.sum(fake_quant_weight(v, 2, group_size=16) ** 2))(w)
    # STE: d/dw sum(fq(w)^2) = 2*fq(w) (identity through the rounding)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(want), atol=1e-5)
