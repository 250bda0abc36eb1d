"""Demo: distributed training with quantized gradients + ZeRO-sharded
8-bit Adam on a dp mesh.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_zero.py

On a real slice drop the env overrides — the same code jits over TPU
devices.  What it exercises:
  * uint8 quantized ring reduce-scatter for gradients (bits/32 of the
    f32 wire traffic, stochastic rounding keeps sums unbiased)
  * optimizer state sharded 1/dp per device (ZeRO-1/2), stored as
    blockwise-INT8 Adam moments (quant/opt8): 2.06/dp bytes per param
  * exact ring all-gather of updated parameter shards
"""

import os
import sys

sys.path.insert(0, "/root/repo")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def main(steps: int = 20):
    from piquant_tpu.models import llama as M
    from piquant_tpu.quant.opt8 import adam8bit
    from piquant_tpu.train import make_zero_train_step

    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("dp",))
    print(f"mesh: dp={len(devs)} on {devs[0].platform}")

    cfg = M.LlamaConfig.tiny(vocab=128, dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(0))

    def loss_fn(p, batch):
        logits, _ = M.forward(cfg, p, batch[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(lp, batch[:, 1:, None], -1).mean()

    init, step = make_zero_train_step(loss_fn, adam8bit(3e-3), mesh, "dp",
                                      grad_wire="uint8")
    state = init(params)
    n_params = sum(l.size for l in jax.tree.leaves(params))
    st_bytes = sum(l.nbytes for l in jax.tree.leaves(state)
                   if hasattr(l, "nbytes"))
    print(f"params: {n_params/1e6:.2f}M; optimizer state "
          f"{st_bytes/n_params:.2f} B/param total, "
          f"{st_bytes/n_params/len(devs):.3f} B/param/device (sharded)")

    step = jax.jit(step)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 128, (len(devs) * 2, 33)), jnp.int32)
    for i in range(steps):
        params, state, loss = step(params, state, batch, jax.random.key(i))
        if i % 5 == 0 or i == steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
