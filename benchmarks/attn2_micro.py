"""decode_attn2 kernel vs the XLA int8-cache attention, 8B decode shapes.

Long-chain slope protocol (NOTES.md): K1/K2 chained iterations with real
data dependence (q perturbed by the previous context), delta >= 20 ms of
device time.  Reports us/layer and effective cache-stream GB/s for:
  * XLA full-read attention (the in-model path today)  — kv8
  * decode_attn2, kv8  (live-length reads)
  * decode_attn2, kv4  (live-length + half bytes)
at live=1024 within max_len=2048 (the VERDICT #1 geometry).

Usage: python benchmarks/attn2_micro.py [live] [max_len]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from piquant_tpu.ops.pallas.decode_attn2 import decode_attention_state
from piquant_tpu.quant.kv_cache import pack4_pairs, split_scale_pairs

B, HKV, REP, D = 8, 8, 4, 128
SM = D ** -0.5


def build(s, kv_bits, key):
    ks = jax.random.split(key, 4)
    kc = jax.random.randint(ks[0], (B, HKV, s, D), -7, 8, jnp.int32).astype(jnp.int8)
    vc = jax.random.randint(ks[1], (B, HKV, s, D), -7, 8, jnp.int32).astype(jnp.int8)
    ksc = jax.random.uniform(ks[2], (B, HKV, s, 1), jnp.float32, 0.005, 0.02)
    vsc = jax.random.uniform(ks[3], (B, HKV, s, 1), jnp.float32, 0.005, 0.02)
    if kv_bits == 4:
        kc, vc = jax.jit(pack4_pairs)(kc), jax.jit(pack4_pairs)(vc)
        ksc = jax.jit(split_scale_pairs)(ksc)
        vsc = jax.jit(split_scale_pairs)(vsc)
    return kc, ksc, vc, vsc


def measure(name, fn, q0, arrays, bytes_per_iter):
    """NOTES session-4: cache arrays MUST be jit ARGUMENTS, not closures —
    closed-over device arrays lower as MLIR constants through the relay."""
    def chain(q0, iters, *arrs):
        def body(i, q):
            ctx = fn(q, *arrs)
            # data dependence: next q = normalized ctx (prevents hoisting)
            return (ctx / (jnp.abs(ctx).max() + 1.0)).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q0)

    f = jax.jit(chain, static_argnums=(1,))
    for k1, k2 in [(16, 272)]:
        r1 = jax.block_until_ready(f(q0, k1, *arrays))
        t0 = time.perf_counter()
        r1 = jax.block_until_ready(f(q0, k1, *arrays))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        r2 = jax.block_until_ready(f(q0, k2, *arrays))
        t2 = time.perf_counter() - t0
        dt = (t2 - t1) / (k2 - k1)
        gbs = bytes_per_iter / dt / 1e9
        print(f"{name}: {dt*1e6:.1f} us/layer-call  {gbs:.0f} GB/s cache-stream",
              flush=True)


def main(live=1024, max_len=2048):
    key = jax.random.key(0)
    q0 = jax.random.normal(jax.random.key(9), (B, HKV, REP, D), jnp.float32)
    pos = jnp.full((B,), live, jnp.int32)

    def xla_attn(q, kc, ksc, vc, vsc, pos):
        qb = q.astype(jnp.bfloat16)
        scores = jnp.einsum("bhrd,bhsd->bhrs", qb, kc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores * ksc[:, :, None, :, 0] * SM
        valid = jnp.arange(max_len, dtype=jnp.int32)[None] < pos[:, None]
        scores = jnp.where(valid[:, None, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        pv = (p * vsc[:, :, None, :, 0]).astype(jnp.bfloat16)
        return jnp.einsum("bhrs,bhsd->bhrd", pv, vc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def k2_attn(q, kc, ksc, vc, vsc, pos):
        acc, m, l = decode_attention_state(q, kc, ksc, vc, vsc, pos, SM)
        return acc / l

    full_bytes = 2 * B * HKV * max_len * (D + 4)
    live_bytes8 = 2 * B * HKV * live * (D + 4)
    live_bytes4 = 2 * B * HKV * live * (D // 2 + 4)
    arrays8 = build(max_len, 8, key)
    measure(f"xla kv8 full-{max_len}", xla_attn, q0,
            (*arrays8, pos), full_bytes)
    measure(f"attn2 kv8 live-{live}", k2_attn, q0,
            (*arrays8, pos), live_bytes8)
    arrays4 = build(max_len, 4, key)
    measure(f"attn2 kv4 live-{live}", k2_attn, q0,
            (*arrays4, pos), live_bytes4)


if __name__ == "__main__":
    live = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ml = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    main(live, ml)
