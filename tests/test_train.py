"""Quantized-gradient training on the virtual CPU mesh: loss must track the
plain-psum baseline, and the quantized wire must not bias the updates."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from piquant_tpu.models import llama as M
from piquant_tpu.train import make_train_step

DP = 4


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:DP]), ("dp",))


def _setup(mesh):
    cfg = M.LlamaConfig.tiny(vocab=64, dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(0))
    params = jax.device_put(params, NamedSharding(mesh, P()))

    def loss_fn(p, batch):
        logits, _ = M.forward(cfg, p, batch[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, batch[:, 1:, None], axis=-1)
        return nll.mean()

    rng = np.random.default_rng(1)
    one = jnp.asarray(rng.integers(0, 64, (DP * 2, 17)), jnp.int32)
    batch = jax.device_put(one, NamedSharding(mesh, P("dp", None)))
    batches = [batch] * 8  # repeated batch: clear overfitting signal
    return cfg, params, loss_fn, batches


def test_quantized_train_tracks_baseline(mesh):
    cfg, params0, loss_fn, batches = _setup(mesh)
    opt = optax.adam(3e-3)

    def run(grad_wire):
        step = jax.jit(make_train_step(loss_fn, opt, mesh, "dp",
                                       grad_wire=grad_wire))
        params = params0
        opt_state = opt.init(params)
        losses = []
        for i, b in enumerate(batches):
            params, opt_state, loss = step(params, opt_state, b,
                                           jax.random.key(100 + i))
            losses.append(float(loss))
        return losses, params

    base_losses, base_params = run(None)
    q_losses, q_params = run("uint8")

    assert base_losses[-1] < base_losses[0]  # actually learning
    # per-step losses track closely (uint8 grads, stochastic rounding)
    np.testing.assert_allclose(q_losses, base_losses, rtol=0.05, atol=0.05)
    # final params in the same neighborhood (Adam's per-param normalization
    # amplifies wire noise on tiny-magnitude grads, so this is a sanity
    # bound, not a tight one — loss tracking above is the real invariant)
    for a, b in zip(jax.tree.leaves(q_params), jax.tree.leaves(base_params)):
        denom = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / denom < 0.3


def test_checkpoint_restart_recovers_training(mesh, tmp_path):
    """Elastic-recovery contract (SURVEY §5): save (params, opt_state, step)
    mid-run, throw the live state away ("crash"), restore from disk into
    fresh templates, continue — final params must be BIT-IDENTICAL to an
    uninterrupted run."""
    from piquant_tpu.utils.checkpoint import (restore_checkpoint,
                                              save_checkpoint)

    cfg, params0, loss_fn, batches = _setup(mesh)
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step(loss_fn, opt, mesh, "dp", grad_wire=None))

    # uninterrupted run
    p, s = params0, opt.init(params0)
    for b in batches[:6]:
        p, s, _ = step(p, s, b)
    want = jax.tree.leaves(p)

    # interrupted run: checkpoint after 3 steps, "crash", restore, continue
    p, s = params0, opt.init(params0)
    for b in batches[:3]:
        p, s, _ = step(p, s, b)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, {"params": p, "opt": s}, step=3)
    del p, s  # crash: live state gone

    restored, at = restore_checkpoint(
        ck, {"params": params0, "opt": opt.init(params0)})
    assert at == 3
    p, s = restored["params"], restored["opt"]
    for b in batches[3:6]:
        p, s, _ = step(p, s, b)

    for a, w in zip(jax.tree.leaves(p), want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(w))


def test_checkpoint_rejects_mismatched_template(tmp_path):
    from piquant_tpu.utils.checkpoint import (restore_checkpoint,
                                              save_checkpoint)

    save_checkpoint(str(tmp_path / "c"), {"a": jnp.zeros(3)})
    with pytest.raises(ValueError, match="mismatch"):
        restore_checkpoint(str(tmp_path / "c"),
                           {"a": jnp.zeros(3), "b": jnp.zeros(2)})


# ---------------------------------------------------------------------------
# ZeRO-sharded optimizer (train.make_zero_train_step)
# ---------------------------------------------------------------------------

def test_zero_exact_matches_unsharded(mesh):
    """grad_wire=None ZeRO must reproduce the plain optax trajectory
    bit-closely: sharding the optimizer is a pure reorganization."""
    from piquant_tpu.train import make_zero_train_step

    cfg, params0, loss_fn, batches = _setup(mesh)
    opt = optax.adam(3e-3)

    # baseline: replicated optax
    step = jax.jit(make_train_step(loss_fn, opt, mesh, "dp", grad_wire=None))
    params_b, st_b = params0, opt.init(params0)
    for b in batches[:4]:
        params_b, st_b, _ = step(params_b, st_b, b)

    init_z, step_z = make_zero_train_step(loss_fn, opt, mesh, "dp",
                                          grad_wire=None)
    params_z, st_z = params0, init_z(params0)
    step_z = jax.jit(step_z)
    for b in batches[:4]:
        params_z, st_z, _ = step_z(params_z, st_z, b)

    for a, want in zip(jax.tree.leaves(params_z), jax.tree.leaves(params_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                   atol=2e-5, rtol=2e-4)


def test_zero_state_is_sharded(mesh):
    """The point of ZeRO: moment leaves live as 1/dp shards per device."""
    from piquant_tpu.train import make_zero_train_step

    cfg, params0, loss_fn, batches = _setup(mesh)
    opt = optax.adam(3e-3)
    init_z, _ = make_zero_train_step(loss_fn, opt, mesh, "dp",
                                     grad_wire=None)
    st = init_z(params0)
    sharded = [l for l in jax.tree.leaves(st)
               if hasattr(l, "sharding") and l.ndim == 1 and l.size >= DP]
    assert sharded, "no shardable moment leaves found"
    for l in sharded:
        shard_bytes = max(d.data.nbytes for d in l.addressable_shards)
        assert shard_bytes * DP <= l.nbytes + 1, (
            f"moment not sharded: {shard_bytes}B/device x {DP} > {l.nbytes}")


def test_zero_quantized_wire_learns(mesh):
    """uint8 grad wire + 8-bit Adam moments, both sharded: loss falls and
    tracks the exact-ZeRO run."""
    from piquant_tpu.quant.opt8 import adam8bit
    from piquant_tpu.train import make_zero_train_step

    cfg, params0, loss_fn, batches = _setup(mesh)
    opt = adam8bit(3e-3)

    init_z, step_z = make_zero_train_step(loss_fn, opt, mesh, "dp",
                                          grad_wire="uint8")
    params, st = params0, init_z(params0)
    step_z = jax.jit(step_z)
    losses = []
    for i, b in enumerate(batches):
        params, st, loss = step_z(params, st, b, jax.random.key(7 + i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
