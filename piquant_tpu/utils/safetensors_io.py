"""safetensors export/import of quantized param pytrees.

`utils/weight_cache.py` is the framework's own disk format (npz + JSON
manifest); this module writes the SAME flattened representation into a
single `.safetensors` file so packed checkpoints interoperate with the
HF ecosystem's tooling (zero-copy mmap loaders, hub uploads, external
inspectors).  The pytree structure, quantization metadata (bits / k /
group_size / codebook per leaf) and dtype fixups ride in the
safetensors header's `__metadata__` JSON — one self-contained file, no
pickle.

    save_safetensors("model.safetensors", qparams)
    qparams = load_safetensors("model.safetensors")

Round-trips QuantizedLinear / QuantizedExpertStack (affine and NF4),
float leaves (incl. bf16 via a uint16-bits fixup — safetensors-numpy has
no ml_dtypes support), dicts, and lists.  Derived grouped side streams
(s_chunk/z_chunk) are rebuilt at load like weight_cache does.

Reference anchor: extends the reference's persistence story (it had
none — SURVEY §5 checkpoint row) the same way weight_cache.py does, on
the ecosystem's container instead of ours.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from piquant_tpu.quant.linear import QuantizedExpertStack, QuantizedLinear

__all__ = ["save_safetensors", "load_safetensors"]

FORMAT_VERSION = 1


def _flatten(params) -> tuple:
    """Same walk as weight_cache._flatten_with_meta, kept separate so the
    two formats can evolve independently."""
    leaves: Dict[str, np.ndarray] = {}
    meta = []

    def fixdtype(arr: np.ndarray):
        logical = str(arr.dtype)
        if arr.dtype.kind == "V" or logical == "bfloat16":
            arr = arr.view(np.uint16 if arr.dtype.itemsize == 2 else np.uint8)
        return arr, logical

    def visit(path, node):
        if isinstance(node, (QuantizedLinear, QuantizedExpertStack)):
            kind = ("qexperts" if isinstance(node, QuantizedExpertStack)
                    else "qlinear")
            leaves[path + ".data"] = np.asarray(node.data)
            leaves[path + ".scale"] = np.asarray(node.scale)
            leaves[path + ".zp"] = np.asarray(node.zero_point)
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
            arr, logical = fixdtype(np.asarray(node))
            leaves[path] = arr
            meta.append({"path": path, "kind": "array", "dtype": logical})

    visit("", params)
    return leaves, meta


def save_safetensors(path: str, params: Any) -> None:
    from safetensors.numpy import save_file

    leaves, meta = _flatten(params)
    # safetensors keys must be non-empty; the root path is "" for scalars —
    # prefix every key
    save_file({"t" + k: np.ascontiguousarray(v) for k, v in leaves.items()},
              path,
              metadata={"piquant_format": str(FORMAT_VERSION),
                        "piquant_tree": json.dumps(meta)})


def load_safetensors(path: str) -> Any:
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        md = f.metadata() or {}
        if md.get("piquant_format") != str(FORMAT_VERSION):
            raise ValueError(
                f"{path}: piquant_format {md.get('piquant_format')!r} != "
                f"supported {FORMAT_VERSION} (not a piquant-tpu checkpoint?)")
        meta = json.loads(md["piquant_tree"])
        data = {k[1:]: f.get_tensor(k) for k in f.keys()}

    nodes = {m["path"]: m for m in meta}

    def build(path):
        m = nodes[path]
        if m["kind"] in ("qlinear", "qexperts"):
            cls = (QuantizedExpertStack if m["kind"] == "qexperts"
                   else QuantizedLinear)
            scale = jnp.asarray(data[path + ".scale"])
            zp = jnp.asarray(data[path + ".zp"])
            gs = m.get("group_size")
            codebook = m.get("codebook")
            s_chunk = z_chunk = None
            if m["bits"] in (2, 4) and gs is not None and codebook is None:
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
            return cls(data=jnp.asarray(data[path + ".data"]), scale=scale,
                       zero_point=zp, bits=m["bits"], k=m["k"],
                       group_size=gs, s_chunk=s_chunk, z_chunk=z_chunk,
                       codebook=codebook)
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
