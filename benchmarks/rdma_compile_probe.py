"""Single-chip Mosaic compile probe for the RDMA ring kernel (VERDICT r3 #9).

Runs `rdma_ring_selftest` COMPILED on the real chip: a P=2 loopback ring
(all RDMAs target self) that exercises the exact lowering a multi-chip
slice will use — make_async_remote_copy descriptors, DMA semaphore arrays,
per-hop landing slots, collective_id — and checks the quantized sum
numerically.  If Mosaic refuses the lowering, the error is the deliverable:
record it in NOTES.md so the first real slice isn't a cold debug.

Run: python benchmarks/rdma_compile_probe.py
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/piquant_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    from piquant_tpu.parallel.rdma_ring import rdma_ring_selftest

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    try:
        err = rdma_ring_selftest(rows=256, interpret=False)
    except Exception:
        print("MOSAIC COMPILE/RUN FAILED — record this in NOTES.md:",
              flush=True)
        traceback.print_exc()
        return 1
    print(f"rdma ring loopback: COMPILED AND RAN, max abs err {err:.3e} "
          f"(int8-quantization bounded)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
