"""Quantized-weight disk cache (serving checkpoint/resume).

SURVEY §5 plan: "quantized weight cache on disk (scale/zp + packed ints),
versioned".  Quantizing an 8B checkpoint takes minutes; serving restarts
should not repeat it.  Format: one .npz of flattened leaves + a JSON
manifest carrying the pytree structure, dtypes and a format version —
self-contained, no pickle.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from piquant_tpu.quant.linear import (QuantizedExpertStack,
                                      QuantizedLinear)

FORMAT_VERSION = 2  # v2: natural-layout grouped INT2 + cached side streams
# (QuantizedLinear.s_chunk/z_chunk pytree leaves) — v1 caches used the old
# strided-group packed layout and must re-quantize


def _flatten_with_meta(params) -> Tuple[Dict[str, np.ndarray], list]:
    leaves_out: Dict[str, np.ndarray] = {}
    meta = []

    def visit(path, node):
        if isinstance(node, (QuantizedLinear, QuantizedExpertStack)):
            base = f"{path}"
            leaves_out[base + ".data"] = np.asarray(node.data)
            leaves_out[base + ".scale"] = np.asarray(node.scale)
            leaves_out[base + ".zp"] = np.asarray(node.zero_point)
            kind = ("qexperts" if isinstance(node, QuantizedExpertStack)
                    else "qlinear")
            meta.append({"path": path, "kind": kind, "bits": node.bits,
                         "k": node.k, "group_size": node.group_size,
                         "codebook": node.codebook})
        elif isinstance(node, dict):
            meta.append({"path": path, "kind": "dict",
                         "keys": sorted(node.keys())})
            for k in sorted(node.keys()):
                visit(f"{path}/{k}", node[k])
        elif isinstance(node, (list, tuple)):
            meta.append({"path": path, "kind": "list", "n": len(node)})
            for i, v in enumerate(node):
                visit(f"{path}/{i}", v)
        else:
            arr = np.asarray(node)
            logical = str(arr.dtype)
            if arr.dtype.kind == "V" or logical == "bfloat16":
                # npz cannot store ml_dtypes (bf16 etc.); persist the raw bits
                arr = arr.view(np.uint16 if arr.dtype.itemsize == 2 else np.uint8)
            leaves_out[path] = arr
            meta.append({"path": path, "kind": "array", "dtype": logical})

    visit("", params)
    return leaves_out, meta


def save_quantized(path: str, params: Any) -> None:
    """Write params (pytree with QuantizedLinear leaves) to `path` (dir)."""
    os.makedirs(path, exist_ok=True)
    leaves, meta = _flatten_with_meta(params)
    np.savez(os.path.join(path, "leaves.npz"), **{k: v for k, v in leaves.items()})
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump({"format_version": FORMAT_VERSION, "nodes": meta}, f)


def load_quantized(path: str) -> Any:
    """Inverse of save_quantized; returns jnp-backed pytree."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(
            f"weight cache format {manifest['format_version']} != "
            f"supported {FORMAT_VERSION}")
    data = np.load(os.path.join(path, "leaves.npz"))
    nodes = {m["path"]: m for m in manifest["nodes"]}

    def build(path):
        m = nodes[path]
        if m["kind"] in ("qlinear", "qexperts"):
            cls = QuantizedExpertStack if m["kind"] == "qexperts" else QuantizedLinear
            scale = jnp.asarray(data[path + ".scale"])
            zp = jnp.asarray(data[path + ".zp"])
            gs = m.get("group_size")
            codebook = m.get("codebook")
            s_chunk = z_chunk = None
            if m["bits"] in (2, 4) and gs is not None and codebook is None:
                # rebuild the kernel-ready grouped side streams (derived
                # state, cheaper to recompute than to persist)
                from piquant_tpu.quant.linear import _grouped_cache
                if m["kind"] == "qlinear":
                    s_chunk, z_chunk = _grouped_cache(scale, zp, m["k"], gs,
                                                   m["bits"])
                else:
                    per = [_grouped_cache(scale[e], zp[e], m["k"], gs,
                                          m["bits"])
                           for e in range(scale.shape[0])]
                    if per and per[0][0] is not None:
                        s_chunk = jnp.stack([p[0] for p in per])
                        z_chunk = jnp.stack([p[1] for p in per])
            return cls(
                data=jnp.asarray(data[path + ".data"]),
                scale=scale,
                zero_point=zp,
                bits=m["bits"], k=m["k"],
                group_size=gs,
                s_chunk=s_chunk, z_chunk=z_chunk,
                codebook=codebook,
            )
        if m["kind"] == "dict":
            return {k: build(f"{path}/{k}") for k in m["keys"]}
        if m["kind"] == "list":
            return [build(f"{path}/{i}") for i in range(m["n"])]
        arr = data[path]
        logical = m.get("dtype", str(arr.dtype))
        if logical != str(arr.dtype):
            import ml_dtypes

            arr = arr.view(np.dtype(getattr(ml_dtypes, logical, logical)))
        return jnp.asarray(arr)

    return build("")
