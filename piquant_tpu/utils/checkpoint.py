"""Training-state checkpoint/restore for crash recovery.

SURVEY §5 failure-detection/elastic: the recovery story is "recomputable
state" — (params, opt_state, step) fully determine the run, so restart =
restore + continue.  This module makes that concrete: any pytree (params
with QuantizedLinear leaves, optax states with nested namedtuples) is
flattened with jax.tree, leaves go to one npz, and restore rebuilds INTO a
caller-supplied template of the same structure (the template is free to
construct: `optimizer.init(params)` / `init_params(cfg, key)`), so no
treedef serialization is needed.  Cf. utils/weight_cache.py for the
serving-side packed-weight cache with self-describing manifests.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

FORMAT_VERSION = 1


def _to_numpy(leaf) -> np.ndarray:
    arr = np.asarray(leaf)
    if arr.dtype.kind == "V" or str(arr.dtype) == "bfloat16":
        # npz cannot hold ml_dtypes; persist raw bits + logical dtype
        return arr.view(np.uint16 if arr.dtype.itemsize == 2 else np.uint8)
    return arr


def save_checkpoint(path: str, state: Any, *, step: int = 0) -> None:
    """Write `state` (any pytree) + step counter to directory `path`.

    The write is atomic-ish: leaves land in a temp file renamed into place
    last, so a crash mid-save leaves the previous checkpoint loadable."""
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree.leaves(state)
    arrays = {}
    dtypes = []
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        dtypes.append(str(arr.dtype))
        arrays[f"leaf_{i}"] = _to_numpy(leaf)
    tmp = os.path.join(path, "leaves_tmp.npz")  # np.savez appends .npz to
    np.savez(tmp, **arrays)                     # names without the suffix
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"format_version": FORMAT_VERSION, "step": step,
                   "n_leaves": len(leaves), "dtypes": dtypes}, f)
    os.replace(tmp, os.path.join(path, "leaves.npz"))


def restore_checkpoint(path: str, template: Any) -> tuple[Any, int]:
    """Rebuild a state pytree with `template`'s structure from `path`.

    Returns (state, step).  Raises if the leaf count doesn't match the
    template (wrong model/optimizer geometry)."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint format {meta['format_version']} != "
                         f"supported {FORMAT_VERSION}")
    data = np.load(os.path.join(path, "leaves.npz"))
    tdef = jax.tree.structure(template)
    if tdef.num_leaves != meta["n_leaves"]:
        raise ValueError(
            f"checkpoint has {meta['n_leaves']} leaves but the template "
            f"needs {tdef.num_leaves} — model/optimizer mismatch")
    import jax.numpy as jnp

    leaves = []
    for i, logical in enumerate(meta["dtypes"]):
        arr = data[f"leaf_{i}"]
        if logical != str(arr.dtype):
            import ml_dtypes

            arr = arr.view(getattr(ml_dtypes, logical, logical))
        leaves.append(jnp.asarray(arr))
    return jax.tree.unflatten(tdef, leaves), meta["step"]
