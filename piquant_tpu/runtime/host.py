"""ctypes binding to the native host runtime (csrc/piquant_host.cpp).

TPU-framework analogue of the reference's Python bootstrap + Context
(python/src/piquant/_bootstrap.py:9-101, python/src/piquant/__init__.py:64-142):
locates/builds `libpiquant_host.so`, wraps the C ABI with a numpy-facing
`HostContext`.  Used for host-side checkpoint packing (multi-GB weight
quantization before upload to chips) and as the CPU fallback path; the TPU
compute path never touches it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _lib_names():
    """Platform shared-library names, most specific first (the CMake build
    on Windows produces piquant_host.dll; the Makefile libpiquant_host.so;
    macOS clang emits .dylib under CMake, .so under the Makefile)."""
    import sys
    if sys.platform == "win32":
        return ("piquant_host.dll",)
    if sys.platform == "darwin":
        return ("libpiquant_host.so", "libpiquant_host.dylib")
    return ("libpiquant_host.so",)

_FP_CODES = {"f32": 0, "bf16": 1, "f64": 2}
_Q_CODES = {
    "uint2": 0, "uint4": 1, "uint8": 2, "int4": 3, "int8": 4,
    "uint16": 5, "int16": 6, "uint32": 7, "int32": 8, "uint64": 9, "int64": 10,
}
_ROUND = {"nearest": 0, "stochastic": 1}
_REDUCE = {"set": 0, "add": 1}

_NP_FP = {"f32": np.float32, "f64": np.float64, "bf16": np.uint16}
_NP_STORAGE = {
    "uint2": np.uint8, "uint4": np.uint8, "int4": np.uint8, "uint8": np.uint8,
    "int8": np.int8, "uint16": np.uint16, "int16": np.int16,
    "uint32": np.uint32, "int32": np.int32, "uint64": np.uint64, "int64": np.int64,
}

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    import sys
    try:
        if sys.platform == "win32":
            # MSVC path: csrc/CMakeLists.txt (the Makefile is gcc/clang)
            bdir = os.path.join(_CSRC, "build")
            subprocess.run(["cmake", "-B", bdir, "-S", _CSRC,
                            "-DCMAKE_BUILD_TYPE=Release"],
                           check=True, capture_output=True)
            subprocess.run(["cmake", "--build", bdir, "--config", "Release"],
                           check=True, capture_output=True)
        else:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        return True
    except Exception:
        return False


def _find_lib() -> Optional[str]:
    # wheel installs ship the prebuilt library next to this module
    # (setup.py BuildWithNative); source checkouts build csrc/ in-tree
    # (Windows CMake drops it under csrc/build/[Release/])
    here = os.path.dirname(os.path.abspath(__file__))
    for name in _lib_names():
        for d in (here, _CSRC, os.path.join(_CSRC, "build"),
                  os.path.join(_CSRC, "build", "Release")):
            p = os.path.join(d, name)
            if os.path.exists(p):
                return p
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _find_lib()
        if so is None:
            if not _build():
                return None
            so = _find_lib()
            if so is None:
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        c = ctypes
        lib.pqh_quantize.argtypes = [c.c_void_p, c.c_int32, c.c_void_p, c.c_int32,
                                     c.c_int64, c.c_float, c.c_int64, c.c_int32,
                                     c.c_uint64, c.c_int32]
        lib.pqh_dequantize.argtypes = [c.c_void_p, c.c_int32, c.c_void_p, c.c_int32,
                                       c.c_int64, c.c_float, c.c_int64, c.c_int32,
                                       c.c_int32]
        lib.pqh_requantize.argtypes = [c.c_void_p, c.c_int32, c.c_void_p, c.c_int64,
                                       c.c_int32, c.c_float, c.c_int64, c.c_int32,
                                       c.c_int32, c.c_uint64, c.c_int32]
        lib.pqh_min_max.argtypes = [c.c_void_p, c.c_int32, c.c_int64, c.c_int32,
                                    c.POINTER(c.c_float), c.POINTER(c.c_float)]
        lib.pqh_compute_quant_params.argtypes = [
            c.c_void_p, c.c_int32, c.c_int64, c.c_int32, c.c_int32,
            c.POINTER(c.c_float), c.POINTER(c.c_int64)]
        lib.pqh_quantize_nf4.argtypes = [c.c_void_p, c.c_int32, c.c_void_p,
                                         c.c_int64, c.c_float, c.c_int32]
        lib.pqh_dequantize_nf4.argtypes = [c.c_void_p, c.c_void_p, c.c_int32,
                                           c.c_int64, c.c_float, c.c_int32,
                                           c.c_int32]
        lib.pqh_version.restype = c.c_int32
        _lib = lib
        return _lib


def host_available() -> bool:
    return _load() is not None


def _fp_name(a: np.ndarray) -> str:
    if a.dtype == np.float32:
        return "f32"
    if a.dtype == np.float64:
        return "f64"
    if a.dtype == np.uint16 or a.dtype.name == "bfloat16":
        return "bf16"
    raise ValueError(f"unsupported float dtype {a.dtype}")


def _packed_bytes(numel: int, qdtype: str) -> int:
    bits = {"uint2": 2, "uint4": 4, "int4": 4}.get(qdtype)
    if bits is None:
        return numel
    per = 8 // bits
    return (numel + per - 1) // per


class HostContext:
    """Multithreaded host-side quantization (numpy in/out).

    Mirrors the reference `piquant.Context` surface on the host, with the
    same per-tensor affine semantics as the TPU path.
    """

    def __init__(self, num_threads: Optional[int] = None) -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native host runtime unavailable (csrc build failed)")
        self._lib = lib
        self.num_threads = num_threads or max(1, (os.cpu_count() or 2) - 1)

    @staticmethod
    def _as_c(a: np.ndarray):
        return a.ctypes.data_as(ctypes.c_void_p)

    def quantize(self, x: np.ndarray, scale: float, zero_point: int, qdtype: str,
                 round_mode: str = "nearest", seed: int = 0) -> np.ndarray:
        x = np.ascontiguousarray(x).reshape(-1)
        fp = _fp_name(x)
        if x.dtype.name == "bfloat16":
            x = x.view(np.uint16)
        out = np.empty(_packed_bytes(x.size, qdtype), _NP_STORAGE[qdtype])
        self._lib.pqh_quantize(self._as_c(x), _FP_CODES[fp], self._as_c(out),
                               _Q_CODES[qdtype], x.size, float(scale),
                               int(zero_point), _ROUND[round_mode], seed,
                               self.num_threads)
        return out

    def dequantize(self, q: np.ndarray, numel: int, scale: float, zero_point: int,
                   qdtype: str, out_dtype: str = "f32", reduce_op: str = "set",
                   out: Optional[np.ndarray] = None) -> np.ndarray:
        q = np.ascontiguousarray(q).reshape(-1)
        if q.size != _packed_bytes(numel, qdtype):
            raise ValueError(
                f"packed buffer has {q.size} elements, numel={numel} {qdtype} "
                f"needs exactly {_packed_bytes(numel, qdtype)}")
        if out is None:
            if reduce_op == "add":
                raise ValueError("reduce_op='add' requires out=")
            out = np.zeros(numel, _NP_FP[out_dtype])
        else:
            out = np.ascontiguousarray(out).reshape(-1)
            if out.size != numel:
                raise ValueError("out.size != numel")
            if out.dtype.name == "bfloat16":
                out = out.view(np.uint16)
        self._lib.pqh_dequantize(self._as_c(q), _Q_CODES[qdtype], self._as_c(out),
                                 _FP_CODES[out_dtype], numel, float(scale),
                                 int(zero_point), _REDUCE[reduce_op],
                                 self.num_threads)
        return out

    def requantize(self, x: np.ndarray, scale: float, zero_point: int, qdtype: str,
                   round_mode: str = "nearest", reduce_op: str = "set",
                   out: Optional[np.ndarray] = None, seed: int = 0) -> np.ndarray:
        x = np.ascontiguousarray(x).reshape(-1)
        fp = _fp_name(x)
        xv = x.view(np.uint16) if x.dtype.name == "bfloat16" else x
        if out is None:
            if reduce_op == "add":
                raise ValueError("reduce_op='add' requires out=")
            out = np.zeros_like(xv)
        else:
            out = np.ascontiguousarray(out).reshape(-1)
            if out.dtype.name == "bfloat16":
                out = out.view(np.uint16)
        self._lib.pqh_requantize(self._as_c(xv), _FP_CODES[fp], self._as_c(out),
                                 xv.size, _Q_CODES[qdtype], float(scale),
                                 int(zero_point), _ROUND[round_mode],
                                 _REDUCE[reduce_op], seed, self.num_threads)
        return out

    def quantize_nf4(self, x: np.ndarray, scale: Optional[float] = None
                     ) -> Tuple[np.ndarray, float]:
        """NF4 (QLoRA codebook) quantize: absmax scaling, adjacent-nibble
        wire (low first).  Returns (packed bytes, scale); scale=None
        derives absmax here."""
        x = np.ascontiguousarray(x).reshape(-1)
        fp = _fp_name(x)
        if scale is None:
            lo, hi = self.min_max(x)
            scale = max(abs(lo), abs(hi)) or 1.0
        xv = x.view(np.uint16) if x.dtype.name == "bfloat16" else x
        out = np.empty((x.size + 1) // 2, np.uint8)
        self._lib.pqh_quantize_nf4(self._as_c(xv), _FP_CODES[fp],
                                   self._as_c(out), x.size, float(scale),
                                   self.num_threads)
        return out, float(scale)

    def dequantize_nf4(self, q: np.ndarray, numel: int, scale: float,
                       out_dtype: str = "f32", reduce_op: str = "set",
                       out: Optional[np.ndarray] = None) -> np.ndarray:
        q = np.ascontiguousarray(q).reshape(-1)
        if q.size != (numel + 1) // 2:
            raise ValueError(f"packed buffer has {q.size} bytes, numel="
                             f"{numel} nf4 needs {(numel + 1) // 2}")
        if out is None:
            if reduce_op == "add":
                raise ValueError("reduce_op='add' requires out=")
            out = np.zeros(numel, _NP_FP[out_dtype])
        else:
            out = np.ascontiguousarray(out).reshape(-1)
            if out.size != numel:
                raise ValueError("out.size != numel")
            if out.dtype.name == "bfloat16":
                out = out.view(np.uint16)
        self._lib.pqh_dequantize_nf4(self._as_c(q), self._as_c(out),
                                     _FP_CODES[out_dtype], numel,
                                     float(scale), _REDUCE[reduce_op],
                                     self.num_threads)
        return out

    def min_max(self, x: np.ndarray) -> Tuple[float, float]:
        x = np.ascontiguousarray(x).reshape(-1)
        fp = _fp_name(x)
        if x.dtype.name == "bfloat16":
            x = x.view(np.uint16)
        lo = ctypes.c_float()
        hi = ctypes.c_float()
        self._lib.pqh_min_max(self._as_c(x), _FP_CODES[fp], x.size,
                              self.num_threads, ctypes.byref(lo), ctypes.byref(hi))
        return lo.value, hi.value

    def compute_quant_params(self, x: np.ndarray, qdtype: str) -> Tuple[float, int]:
        x = np.ascontiguousarray(x).reshape(-1)
        fp = _fp_name(x)
        if x.dtype.name == "bfloat16":
            x = x.view(np.uint16)
        scale = ctypes.c_float()
        zp = ctypes.c_int64()
        self._lib.pqh_compute_quant_params(self._as_c(x), _FP_CODES[fp], x.size,
                                           _Q_CODES[qdtype], self.num_threads,
                                           ctypes.byref(scale), ctypes.byref(zp))
        return scale.value, int(zp.value)
