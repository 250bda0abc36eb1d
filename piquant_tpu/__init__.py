"""piquant-tpu: a TPU-native per-tensor affine quantization framework.

Brand-new JAX/XLA/Pallas re-design of PrimeIntellect's pi-quant CPU library
(see SURVEY.md): quantize / dequantize / fused-requantize across
f32/f64/bf16 <-> uint2 + (u)int4/8/16/32/64 with sub-byte packing, nearest and
per-element stochastic rounding, SET/ADD dequantization store operators, and
on-device min/max derivation of scale and zero-point — plus what the ADD
store operator was designed for: quantized collectives over ICI, weight-only
INT4/INT8 serving with fused dequant+matmul, and an INT8 KV-cache.
"""

from piquant_tpu.dtypes import (  # noqa: F401
    DTYPES,
    FLOAT_DTYPES,
    QUANT_DTYPES,
    QDType,
    dtype_of,
    packed_numel,
    tail_mask,
)
from piquant_tpu.api import (  # noqa: F401
    Context,
    QuantizedTensor,
    ReduceOp,
    RoundMode,
    compute_quant_params,
    dequantize,
    dequantize_tensor,
    quantize,
    quantize_dequantize_fused,
    quantize_tensor,
    requantize,
)

__version__ = "0.1.0"
