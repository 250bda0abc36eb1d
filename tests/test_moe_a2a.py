"""Token-routed expert parallelism (llama._moe_a2a): Switch-style
fixed-capacity dispatch + quantized all_to_all, validated against the
single-device dense MoE on the virtual CPU mesh.

Three contracts: (1) with a float wire and ample capacity the a2a path is
numerically the dense path; (2) the int8 wire stays within its ~0.4%/elem
budget; (3) capacity overflow drops assignments without corrupting kept
ones (finite outputs, exact again once capacity covers the load)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from piquant_tpu.models import llama as M

SEED = 0xA2A


def _tiny_moe(**kw):
    return M.LlamaConfig.tiny(n_experts=8, moe_top_k=2, dtype=jnp.float32,
                              **kw)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), ("ep",))


def _run_ep(cfg_ep, layer, x, mesh):
    moe_keys = ("moe_w1", "moe_w2", "moe_w3")
    stacked = {k: layer[k] for k in moe_keys}
    rest = {k: v for k, v in layer.items() if k not in moe_keys}

    @jax.jit
    def run(stacked_, rest_, x_):
        def inner(st, rt, xv):
            return M._mlp(cfg_ep, {**rt, **st}, xv)
        return shard_map(
            inner, mesh=mesh,
            in_specs=({k: P("ep", None, None) for k in moe_keys},
                      jax.tree.map(lambda _: P(), rest_), P()),
            out_specs=P(),
        )(stacked_, rest_, x_)

    return np.asarray(run(stacked, rest, x))


@pytest.mark.parametrize("ntok", [8, 32])   # 1 and 4 tokens per device
def test_a2a_float_wire_matches_dense(ntok):
    mesh = _mesh(8)
    cfg = _tiny_moe()
    cfg_ep = _tiny_moe(ep_axis="ep", moe_a2a=True, moe_wire_bits=None,
                       moe_capacity_factor=float(cfg.n_experts))
    params = M.init_params(cfg, jax.random.key(SEED))
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(1), (2, ntok // 2, cfg.d_model),
                          jnp.float32)
    want = np.asarray(M._mlp(cfg, layer, x))
    got = _run_ep(cfg_ep, layer, x, mesh)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_a2a_quantized_wire_close_to_dense():
    mesh = _mesh(8)
    cfg = _tiny_moe()
    cfg_ep = _tiny_moe(ep_axis="ep", moe_a2a=True, moe_wire_bits=8,
                       moe_capacity_factor=float(cfg.n_experts))
    params = M.init_params(cfg, jax.random.key(SEED + 1))
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(2), (4, 8, cfg.d_model), jnp.float32)
    want = np.asarray(M._mlp(cfg, layer, x))
    got = _run_ep(cfg_ep, layer, x, mesh)
    # int8 wire both ways: small relative error vs the float path
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.02
    assert np.isfinite(got).all()


def test_a2a_quantized_expert_stacks():
    """a2a over QuantizedExpertStack weights (the serving configuration)."""
    mesh = _mesh(8)
    cfg = _tiny_moe()
    cfg_ep = _tiny_moe(ep_axis="ep", moe_a2a=True, moe_wire_bits=None,
                       moe_capacity_factor=float(cfg.n_experts))
    params = M.quantize_params(M.init_params(cfg, jax.random.key(SEED + 2)),
                               bits=4)
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(3), (2, 8, cfg.d_model), jnp.float32)
    want = np.asarray(M._mlp(cfg, layer, x))
    got = _run_ep(cfg_ep, layer, x, mesh)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_a2a_capacity_overflow_drops_cleanly():
    mesh = _mesh(8)
    cfg = _tiny_moe()
    # factor 0.25: guaranteed overflow for any skewed routing
    cfg_ep = _tiny_moe(ep_axis="ep", moe_a2a=True, moe_wire_bits=None,
                       moe_capacity_factor=0.25)
    params = M.init_params(cfg, jax.random.key(SEED + 3))
    layer = params["layers"][0]
    x = jax.random.normal(jax.random.key(4), (2, 16, cfg.d_model),
                          jnp.float32)
    got = _run_ep(cfg_ep, layer, x, mesh)
    assert np.isfinite(got).all()
    # dropped assignments shrink the output towards zero, never corrupt it
    want = np.asarray(M._mlp(cfg, layer, x))
    assert np.abs(got).mean() <= np.abs(want).mean() * 1.5


def test_a2a_full_forward_in_model():
    """cfg.moe_a2a threads through the whole forward under shard_map."""
    mesh = _mesh(8)
    cfg = _tiny_moe()
    cfg_ep = _tiny_moe(ep_axis="ep", moe_a2a=True, moe_wire_bits=None,
                       moe_capacity_factor=float(cfg.n_experts))
    params = M.init_params(cfg, jax.random.key(SEED + 4))
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 8)), jnp.int32)
    want, _ = M.forward(cfg, params, toks)

    moe_keys = ("moe_w1", "moe_w2", "moe_w3")

    def split(p):
        st = {"layers": [{k: l[k] for k in moe_keys} for l in p["layers"]]}
        rest = {k: v for k, v in p.items() if k != "layers"}
        rest["layers"] = [{k: v for k, v in l.items() if k not in moe_keys}
                          for l in p["layers"]]
        return st, rest

    st, rest = split(params)

    @jax.jit
    def run(st_, rest_, tk):
        def inner(s_, r_, tv):
            merged = dict(r_)
            merged["layers"] = [{**rl, **sl} for rl, sl
                                in zip(r_["layers"], s_["layers"])]
            out, _ = M.forward(cfg_ep, merged, tv)
            return out
        return shard_map(
            inner, mesh=mesh,
            in_specs=(jax.tree.map(lambda a: P("ep", None, None), st_),
                      jax.tree.map(lambda _: P(), rest_), P()),
            out_specs=P(),
        )(st_, rest_, tk)

    got = np.asarray(run(st, rest, toks))
    np.testing.assert_allclose(got, np.asarray(want), atol=5e-4, rtol=5e-4)
