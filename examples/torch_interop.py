"""Torch-adapter walkthrough: bfloat16 -> uint4 -> bfloat16 round trip.

Mirrors the reference's minimal torch usage example
(/root/reference/python/example/example_torch.py:1-23) on the drop-in
adapter `piquant_tpu.interop.torch` — same function names and kwargs,
torch.quint4x2 meaning two 4-bit codes per byte.

Run: python examples/torch_interop.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch

from piquant_tpu.interop import torch as pq


def main() -> None:
    tensor = torch.rand(1000, dtype=torch.bfloat16, device="cpu")

    # quant params for uint4 (used for both directions)
    scale, zero_point = pq.compute_quant_params(tensor, dtype=torch.quint4x2)
    print(f"scale={scale:.6f} zero_point={zero_point}")

    quantized = pq.quantize(tensor, scale=scale, zero_point=zero_point,
                            dtype=torch.quint4x2)
    print(f"packed storage: {tuple(quantized.shape)} {quantized.dtype}")

    dequantized = pq.dequantize(quantized, scale=scale,
                                zero_point=zero_point, dtype=torch.bfloat16)

    # nearest rounding bounds the round-trip error by scale/2
    assert torch.allclose(dequantized, tensor, atol=scale / 2 + 1e-3), \
        "dequantized tensor strayed past the rounding bound"

    print("original  (first 10):", tensor[:10].tolist())
    print("dequant   (first 10):", dequantized[:10].tolist())
    print("max |err|:", (dequantized - tensor).abs().max().item())


if __name__ == "__main__":
    main()
