"""Grouped-INT2 production-path weight-stream benchmark (dynamic-chain protocol).

Measures quant/linear.quantized_matmul on the w1/w3 decode shape with the
int2-g32 chunk-grid kernel (weight-only bf16 dots, and the W2A8-g int8-dot
variant via act_quant="all").  Dynamic trip-count fori_loop (one Mosaic
compile); compare only against numbers taken under the SAME protocol
(channelwise int2: 275; the retired strided-layout grouped kernel: 187 —
NOTES.md session-3).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from piquant_tpu.quant.linear import quantize_linear_weight, quantized_matmul

M_, K_, N_ = 8, 4096, 14336

def main():
    # host-side weight build: XLA u8 pack programs stall the remote backend
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, (K_, N_)).astype(np.float32))
    ql = quantize_linear_weight(w, bits=2, group_size=32)
    jax.block_until_ready(ql.data)
    print("packed:", ql.data.shape, ql.data.dtype, "scale:", ql.scale.shape,
          ql.scale.dtype, flush=True)
    x = jnp.asarray(rng.standard_normal((M_, K_)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    code_bytes = K_ * N_ // 4

    def t_of(chain, q_, x_, k):
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(chain(q_, x_, k))
            best = min(best, time.perf_counter() - t0)
        return best

    for label, aq in (("weight-only", False), ("w2a8-g", "all")):
        @jax.jit
        def chain(q_, x_, k, aq=aq):
            def body(i, xv):
                y = quantized_matmul(xv, q_, jnp.bfloat16, act_quant=aq)
                return xv + y[:, :K_] * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, k, body, x_)[:1, :1]

        np.asarray(chain(ql, x, 1))
        print(f"{label}: compiled", flush=True)
        per = (t_of(chain, ql, x, 96) - t_of(chain, ql, x, 16)) / 80
        print(f"{label}: {per*1e3:.3f} ms/iter -> "
              f"{code_bytes/per/1e9:.0f} GB/s code-stream", flush=True)

main()
