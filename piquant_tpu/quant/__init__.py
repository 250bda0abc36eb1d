"""piquant_tpu.quant — tensor-level quantization building blocks for models:
weight-only quantized linears (split-half packed INT4 / INT8) and the INT8
KV-cache. These sit between the raw ops and the model/serving layers."""

from piquant_tpu.quant.linear import (  # noqa: F401
    NF4_CODEBOOK,
    QuantizedLinear,
    codebook_decode,
    codebook_encode,
    quantize_linear_weight,
    quantized_matmul,
    pack_split_half,
    unpack_split_half,
    wire_to_split_half,
    split_half_to_wire,
)
from piquant_tpu.quant.lora import (  # noqa: F401
    LoraLinear,
    MultiLoraLinear,
    add_lora,
    lora_params,
    merge_lora,
    set_adapter_ids,
    stack_adapters,
    with_lora,
)
from piquant_tpu.quant.mixed import (  # noqa: F401
    plan_bytes,
    plan_mixed_precision,
)
from piquant_tpu.quant.smooth import (  # noqa: F401
    apply_smooth_scales,
    smooth_quantize_params,
    smooth_scales,
)
from piquant_tpu.quant.rotate import (  # noqa: F401
    fold_norms,
    rotate_params,
    rotation_matrix,
)
from piquant_tpu.quant.kv_cache import (  # noqa: F401
    KVCache,
    kv_cache_init,
    kv_cache_append,
    kv_cache_read,
)
