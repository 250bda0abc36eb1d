"""Shared helpers for the Pallas TPU kernels.

Empirically established Mosaic/v5e facts these kernels are built on
(probed on hardware, see git history):
  * lane-strided slicing (x[:, 0::2]) does NOT lower -> sub-byte packing is
    done on the MXU with constant selection matrices (exact in bf16 because
    all operands are integers <= 255 < 256);
  * f32 -> uint8 casts need an int32 hop; uint8 -> f32 likewise;
  * pltpu.prng_random_bits returns int32; build uniforms by masking the low
    23 bits (exact float32 in [0,1));
  * grids may be ragged (array dims need not divide the block), but block
    shapes must be multiples of (8, 128) (or (16, 128) for bf16).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANES = 128
# Rows per grid block (f32 VMEM use: 1024*128*4 = 512 KiB in + out).
BLOCK_ROWS = 4096   # r5 sweep on the production f32->u8 quantize kernel:
# 2048 rows (1 MB f32 in) = 665 GB/s, 4096 (2 MB) = 722-770 across runs,
# 4608-5760 lower, 8192+ = Mosaic compile crash.  4096 wins every run;
# matches the hbm_sol finding that the streaming sweet spot sits near
# 2-4 MB per buffer and the old default sat below it.


def supports_dtype(name: str) -> bool:
    return name in ("f32", "bf16")


def min_fast_numel(pack: int) -> int:
    """Fast path processes multiples of one lane row of packed bytes."""
    return LANES * pack


def split_tail(numel: int, pack: int) -> Tuple[int, int]:
    """Split numel into (pallas_body, jnp_tail); body % (LANES*pack) == 0."""
    unit = LANES * pack
    body = (numel // unit) * unit
    return body, numel - body


def scalar_smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def seed_from_key(key: Optional[Array]) -> Array:
    """Derive a deterministic int32 seed array from a JAX PRNG key."""
    if key is None:
        return jnp.zeros((1,), jnp.int32)
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    folded = data[0] ^ (data[-1] << 1)
    return folded.astype(jnp.int32).reshape(1)


def uniform_from_bits(shape) -> Array:
    """Inside-kernel helper: uniform [0,1) f32 from the hardware PRNG."""
    bits = pltpu.prng_random_bits(shape)
    return (bits & jnp.int32(0x007FFFFF)).astype(jnp.float32) * (1.0 / (1 << 23))


@lru_cache(maxsize=None)
def pack_matrix_np(bits: int) -> np.ndarray:
    """(LANES*pack, LANES) selection matrix: packed_byte = codes_row @ M.

    M[pack*l + j, l] = 2**(bits*j): adjacent lane groups collapse into one
    byte with LSB-first fields — the reference wire bit order
    (quantize.inl:37-50) — as a matmul.
    """
    pack = 8 // bits
    m = np.zeros((LANES * pack, LANES), np.float32)
    for l in range(LANES):
        for j in range(pack):
            m[pack * l + j, l] = float(1 << (bits * j))
    return m


@lru_cache(maxsize=None)
def unpack_matrices_np(bits: int) -> np.ndarray:
    """(pack*LANES, LANES*pack) vertical stack of interleave matrices: block
    j (rows j*LANES..) scatters field plane j to lanes pack*l + j."""
    pack = 8 // bits
    ms = np.zeros((pack * LANES, LANES * pack), np.float32)
    for l in range(LANES):
        for j in range(pack):
            ms[j * LANES + l, pack * l + j] = 1.0
    return ms


def pack_matrix(bits: int) -> Array:
    return jnp.asarray(pack_matrix_np(bits), jnp.bfloat16)


def unpack_matrices(bits: int) -> Array:
    return jnp.asarray(unpack_matrices_np(bits), jnp.bfloat16)


def _block_rows() -> int:
    """Streaming block rows for elementwise kernels (trace-time).

    Block size is worth ~16% of streaming rate on the headline quantize
    kernel (see BLOCK_ROWS comment).  Overridable per trace via
    PIQUANT_BLOCK_ROWS for sweeps."""
    import os
    try:
        v = int(os.environ.get("PIQUANT_BLOCK_ROWS", "0"))
    except ValueError:
        v = 0
    return v - v % 8 if v >= 8 else BLOCK_ROWS


def grid_rows(n_rows: int, *, aliased: bool, bf16: bool) -> Tuple[int, int]:
    """(padded_rows, block_rows) for an elementwise kernel grid.

    SET-store kernels tolerate a ragged last grid block (stores are masked),
    so rows stay as given and the block adapts.  ALIASED kernels
    (input_output_aliases accumulators) must match the donated buffer to the
    out_shape exactly — rows round up to a whole number of blocks."""
    q = 16 if bf16 else 8
    block_rows = _block_rows()
    if aliased:
        rows = n_rows + (-n_rows) % q
        if rows <= block_rows:
            return rows, rows
        rows += (-rows) % block_rows
        return rows, block_rows
    br = min(block_rows, max(8, n_rows - n_rows % 8 or 8))
    if bf16:
        br = max(16, br - br % 16)
    return n_rows, br
