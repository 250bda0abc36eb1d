"""Micro-benchmark: INT8-KV decode attention variants (v5e).

One 8B layer's decode attention: B=8, Hkv=8, rep=4, S=2048, D=128.
Slope-timed chains (see NOTES.md for why absolute timing lies here).

Run:  python benchmarks/attn_variants.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import os

B, HKV, REP, S, D = 8, 8, 4, 2048, 128
SCALE = D ** -0.5
# live position (cache reads cover [0, POS+1)); kv4's halved cache HBM
# should pay off as the live window approaches the full cache
POS = int(os.environ.get("PIQUANT_ATTN_POS", "1023"))


def make_inputs():
    kq = jax.random.split(jax.random.key(0), 6)
    q = jax.random.normal(kq[0], (B, HKV, REP, D), jnp.bfloat16)
    kc = jax.random.randint(kq[1], (B, HKV, S, D), -127, 128, jnp.int32).astype(jnp.int8)
    vc = jax.random.randint(kq[2], (B, HKV, S, D), -127, 128, jnp.int32).astype(jnp.int8)
    ks = jax.random.uniform(kq[3], (B, HKV, S, 1), jnp.float32, 0.01, 0.02)
    vs = jax.random.uniform(kq[4], (B, HKV, S, 1), jnp.float32, 0.01, 0.02)
    pos = jnp.full((B,), POS, jnp.int32)
    return q, kc, ks, vc, vs, pos


def xla_attn(q, kc, ks, vc, vs, pos):
    """The llama.py XLA path, extracted."""
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, None, :]
    mask = jnp.where(kv_pos <= pos[:, None, None, None], 0.0, -1e9)
    ksb = ks[:, :, None, None, :, 0]
    vsb = vs[:, :, :, 0]
    scores = jnp.einsum("bhrd,bhsd->bhrs", q, kc.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    scores = scores[:, :, None] * ksb * SCALE + mask[:, None]
    probs = jax.nn.softmax(scores, axis=-1)[:, :, 0]
    pscaled = (probs * vsb[:, :, None, :]).astype(jnp.bfloat16)
    return jnp.einsum("bhrs,bhsd->bhrd", pscaled, vc.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def pallas_attn(q, kc, ks, vc, vs, pos):
    from piquant_tpu.ops.pallas.attention import decode_attention
    return decode_attention(q, kc, ks, vc, vs, pos, SCALE)


def attn2(q, kc, ks, vc, vs, pos):
    """flash-decode v2: live-length reads (pos+1 semantics differ by one
    position from xla_attn's <=pos — negligible for the perf compare)."""
    from piquant_tpu.ops.pallas.decode_attn2 import decode_attention_state
    acc, m, l = decode_attention_state(q, kc, ks, vc, vs, pos + 1, SCALE)
    return acc / l


def attn2_kv4(q, kc, ks, vc, vs, pos):
    from piquant_tpu.ops.pallas.decode_attn2 import decode_attention_state
    acc, m, l = decode_attention_state(q, kc, ks, vc, vs, pos + 1, SCALE)
    return acc / l


def bench(name, fn, k1=16, k2=96, mk_inputs=None):
    q, kc, ks, vc, vs, pos = (mk_inputs or make_inputs)()

    def mk(iters):
        @jax.jit
        def chain(q0):
            def step(q_, _):
                o = fn(q_, kc, ks, vc, vs, pos)
                return q_ + o.astype(q_.dtype) * 1e-6, None
            qf, _ = jax.lax.scan(step, q0, None, length=iters)
            return qf[:1, :1, :1, :1]
        return chain

    f1, f2 = mk(k1), mk(k2)
    np.asarray(f1(q)); np.asarray(f2(q))

    def t_of(f, salt):
        best = 1e9
        for i in range(5):
            qi = q + (salt * 8 + i) * 1e-7
            np.asarray(qi[:1, :1, :1, :1])
            t0 = time.perf_counter()
            np.asarray(f(qi))
            best = min(best, time.perf_counter() - t0)
        return best

    t_iter = (t_of(f2, 1) - t_of(f1, 0)) / (k2 - k1)
    traffic = kc.size * kc.dtype.itemsize * 2  # K+V code bytes (kv4: half)
    print(f"{name:18s} {t_iter*1e6:8.1f} us/layer  "
          f"({t_iter*32*1e3:5.2f} ms/32-layer step, cache-stream "
          f"{traffic/t_iter/1e9:6.1f} GB/s)", flush=True)
    return t_iter


def check(fn_a, fn_b, tag):
    q, kc, ks, vc, vs, pos = make_inputs()
    # xla_attn masks <= pos; attn2 uses strict < (pos+1 passed inside)
    a = np.asarray(fn_a(q, kc, ks, vc, vs, pos), np.float32)
    b = np.asarray(fn_b(q, kc, ks, vc, vs, pos), np.float32)
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"{tag}: rel err {err:.2e}")


def make_inputs_kv4():
    # pair-packed layout: [B,H,S/2,D] codes + [B,H,2,S/2] scales
    from piquant_tpu.quant.kv_cache import pack4_pairs, split_scale_pairs
    q, kc, ks, vc, vs, pos = make_inputs()
    return (q, jax.jit(pack4_pairs)(kc), jax.jit(split_scale_pairs)(ks),
            jax.jit(pack4_pairs)(vc), jax.jit(split_scale_pairs)(vs), pos)


if __name__ == "__main__":
    import os
    which = os.environ.get("PIQUANT_ATTN_VARIANTS", "xla,attn2,attn2_kv4")
    fns = {"xla": (xla_attn, make_inputs),
           "pallas": (pallas_attn, make_inputs),
           "attn2": (attn2, make_inputs),
           "attn2_kv4": (attn2_kv4, make_inputs_kv4)}
    check(xla_attn, attn2, "attn2 vs xla")
    for name in which.split(","):
        fn, mk_in = fns[name]
        bench(name, fn, mk_inputs=mk_in)
