"""Mixed-precision auto-planner (quant/mixed.py): budget discipline,
floor/ceiling behavior, and quality vs the floor on a briefly-trained
tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from piquant_tpu.models import llama as M
from piquant_tpu.quant.mixed import CANDIDATES, plan_bytes, plan_mixed_precision

SEED = 0x9032002


@pytest.fixture(scope="module")
def trained():
    """A tiny model with ~80 steps of real structure (arithmetic
    progressions mod vocab) so quantization damage is measurable."""
    cfg = M.LlamaConfig.tiny(vocab=64, dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(SEED))
    rng = np.random.default_rng(3)

    def batch():
        starts = rng.integers(0, 64, 8)
        steps = rng.integers(1, 5, 8)
        seq = (starts[:, None] + steps[:, None]
               * np.arange(33)[None, :]) % 64
        return jnp.asarray(seq, jnp.int32)

    def loss_fn(p, b):
        logits, _ = M.forward(cfg, p, b[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, b[:, 1:, None], -1).mean()

    opt = optax.adam(3e-3)
    st = opt.init(params)
    step = jax.jit(lambda p, s, b: _step(loss_fn, opt, p, s, b))
    for _ in range(80):
        params, st, _ = step(params, st, batch())
    calib = batch()
    return cfg, params, calib, loss_fn


def _step(loss_fn, opt, p, s, b):
    loss, g = jax.value_and_grad(loss_fn)(p, b)
    upd, s = opt.update(g, s, p)
    return optax.apply_updates(p, upd), s, loss


def _nll(cfg, qp, calib):
    logits, _ = M.forward(cfg, qp, calib[:, :-1], attend_in_layer=True)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    return float(-jnp.take_along_axis(lp, calib[:, 1:, None], -1).mean())


def test_plan_respects_budget_and_improves_on_floor(trained):
    cfg, params, calib, _ = trained
    floor_bytes = plan_bytes(params, {})
    ceil_bytes = plan_bytes(params, {
        f"{li}.{k}": CANDIDATES[-1]
        for li, layer in enumerate(params["layers"])
        for k in ("wq", "wk", "wv", "wo", "w1", "w2", "w3") if k in layer})
    budget = (floor_bytes + ceil_bytes) / 2

    plan = plan_mixed_precision(cfg, params, calib, budget)
    assert plan_bytes(params, plan) <= budget

    q_floor = M.quantize_params(params, *CANDIDATES[0][:1],
                                group_size=CANDIDATES[0][1])
    q_plan = M.quantize_params(params, overrides=plan)
    nll_floor = _nll(cfg, q_floor, calib)
    nll_plan = _nll(cfg, q_plan, calib)
    assert nll_plan <= nll_floor + 1e-4, (nll_plan, nll_floor)
    # the budget headroom was actually used
    assert plan_bytes(params, plan) > floor_bytes


def test_plan_floor_and_ceiling_budgets(trained):
    cfg, params, calib, _ = trained
    floor_bytes = plan_bytes(params, {})

    tight = plan_mixed_precision(cfg, params, calib, floor_bytes + 1)
    assert all(v == CANDIDATES[0] for v in tight.values())

    huge = plan_mixed_precision(cfg, params, calib, floor_bytes * 100)
    # generous budget: every projection with positive gain is maxed;
    # at minimum SOME projection must leave the floor
    assert any(v != CANDIDATES[0] for v in huge.values())

    with pytest.raises(ValueError, match="floor plan"):
        plan_mixed_precision(cfg, params, calib, floor_bytes * 0.5)


def test_per_layer_overrides_apply(trained):
    cfg, params, _, _ = trained
    qp = M.quantize_params(params, bits=8,
                           overrides={"0.w1": (2, 32), "w2": (4, 32)})
    l0, l1 = qp["layers"][0], qp["layers"][1]
    assert l0["w1"].bits == 2 and l0["w1"].group_size == 32
    assert l1["w1"].bits == 8                      # bare default
    assert l0["w2"].bits == 4 and l1["w2"].bits == 4  # name-level override
