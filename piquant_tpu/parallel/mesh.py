"""Mesh construction helpers.

The reference is single-process (SURVEY §2.3: its only parallelism is a host
thread pool, src/piquant.cpp:132-176); on TPU the equivalent scale-out axis is
a `jax.sharding.Mesh` over chips, with collectives riding ICI.  These helpers
standardize mesh creation for the serving/training slices and the tests
(which run on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axes: Sequence[Tuple[str, int]],
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh from (name, size) pairs; size -1 means "the rest".

    Example: make_mesh([("dp", 2), ("tp", -1)]) on 8 devices -> 2x4 mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = [n for n, _ in axes]
    sizes = [s for _, s in axes]
    n = len(devices)
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis size may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total != n:
        raise ValueError(f"mesh wants {total} devices, have {n}")
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))
