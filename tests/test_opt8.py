"""8-bit Adam (quant/opt8.py): convergence parity with fp32 Adam and the
~4x state-memory cut."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from piquant_tpu.quant.opt8 import adam8bit, state_nbytes

SEED = 0x9032002


def _run(opt, loss_fn, p0, steps):
    p, st = p0, opt.init(p0)
    step = jax.jit(lambda p, st: (lambda l, g: (l, *opt.update(g, st, p)))(
        *jax.value_and_grad(loss_fn)(p)))
    last = None
    for _ in range(steps):
        last, upd, st = step(p, st)
        p = optax.apply_updates(p, upd)
    return float(last)


def test_adam8_matches_fp32_on_quadratic():
    rng = np.random.default_rng(SEED)
    a = jnp.asarray(rng.normal(0, 1, (64, 64)).astype(np.float32))
    t = jnp.asarray(rng.normal(0, 1, (64,)).astype(np.float32))

    def loss_fn(p):
        return jnp.mean((a @ p["w"] - t) ** 2)

    p0 = {"w": jnp.zeros((64,), jnp.float32)}
    l32 = _run(optax.adam(1e-2), loss_fn, p0, 300)
    l8 = _run(adam8bit(1e-2), loss_fn, p0, 300)
    assert l8 < l32 * 1.5 + 1e-4, (l8, l32)


def test_adam8_trains_the_tiny_model():
    """30 steps of LM training: the 8-bit state trajectory tracks fp32."""
    from piquant_tpu.models import llama as M

    cfg = M.LlamaConfig.tiny(vocab=64, dtype=jnp.float32)
    rng = np.random.default_rng(SEED + 1)
    batch = jnp.asarray(rng.integers(0, 64, (4, 33)), jnp.int32)

    def loss_fn(p):
        logits, _ = M.forward(cfg, p, batch[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(lp, batch[:, 1:, None], axis=-1).mean()

    p0 = M.init_params(cfg, jax.random.key(0))
    l32 = _run(optax.adam(3e-3), loss_fn, p0, 30)
    l8 = _run(adam8bit(3e-3), loss_fn, p0, 30)
    assert abs(l8 - l32) / l32 < 0.1, (l8, l32)


def test_adam8_state_memory():
    opt = adam8bit(1e-3)
    st = opt.init({"w": jnp.zeros((100_000,), jnp.float32),
                   "b": jnp.zeros((333,), jnp.float32)})
    per_param = state_nbytes(st) / 100_333
    assert per_param < 2.3, per_param  # vs 8.0 for fp32 Adam


def test_adam8_weight_decay_path():
    opt = adam8bit(1e-2, weight_decay=0.01)
    p = {"w": jnp.ones((256,), jnp.float32)}
    st = opt.init(p)
    upd, st = opt.update({"w": jnp.zeros((256,), jnp.float32)}, st, p)
    # zero grads + decay: update pulls weights toward zero
    assert float(upd["w"].mean()) < 0
