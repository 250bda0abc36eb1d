"""Tensor-parallel scaling measurement (tokens/s at tp = 1, 2, 4, 8).

BASELINE asks for host-scaling >= 0.85 at >= 2 hosts on a v5e pod; this
environment has ONE chip, so this harness (a) validates the sharded decode
path end-to-end on the virtual CPU mesh, and (b) is the exact script to run
on a real slice (`JAX_PLATFORMS=tpu python benchmarks/scaling.py` under
`jax.distributed` does the same over ICI/DCN).

CPU-mesh numbers measure SPMD overhead structure, not silicon speed.
"""

import os
import sys
import time

if os.environ.get("PIQUANT_TPU_SCALING_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=8"

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("PIQUANT_TPU_SCALING_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from piquant_tpu.models import llama as M
from piquant_tpu.parallel import make_mesh


def tokens_per_s(cfg, params, mesh=None, batch=8, steps=24, warm=8):
    if mesh is not None:
        params = M.shard_params(params, mesh, "tp")
    cache = M.init_kv_cache(cfg, batch, max_len=128)

    @jax.jit
    def run(p, tok, pos, c, k):
        def body(i, carry):
            tok, pos, c = carry
            logits, c = M.decode_step(cfg, p, tok, pos, c)
            return logits.argmax(-1).astype(jnp.int32), pos + 1, c
        tok, pos, c = jax.lax.fori_loop(0, k, body, (tok, pos, c))
        return tok

    tok = jnp.zeros((batch,), jnp.int32)
    pos = jnp.zeros((batch,), jnp.int32)
    runs = {k: jax.jit(lambda p, t, q, c, k=k: run(p, t, q, c, k)) for k in (warm, steps)}
    for k in (warm, steps):
        np.asarray(runs[k](params, tok, pos, cache)[:1])

    def t_of(k, reps=3):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(runs[k](params, tok, pos, cache)[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = (t_of(steps) - t_of(warm)) / (steps - warm)
    return batch / per_step


def main():
    cfg = M.LlamaConfig(vocab_size=512, d_model=512, n_layers=4, n_heads=8,
                        n_kv_heads=8, d_ff=1024, max_seq_len=128)
    params = M.quantize_params(M.init_params(cfg, jax.random.key(0)), bits=4)

    base = tokens_per_s(cfg, params)
    print(f"tp=1: {base:.1f} tok/s")
    for tp in (2, 4, 8):
        if tp > len(jax.devices()):
            break
        mesh = make_mesh([("tp", tp)], devices=jax.devices()[:tp])
        tps = tokens_per_s(cfg, params, mesh)
        print(f"tp={tp}: {tps:.1f} tok/s (efficiency {tps/base/1:.2f}x of tp=1)")


if __name__ == "__main__":
    main()
