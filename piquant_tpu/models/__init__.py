"""piquant_tpu.models — quantized transformer model families."""

from piquant_tpu.models.llama import (  # noqa: F401
    LlamaConfig,
    init_params,
    quantize_params,
    forward,
    prefill,
    decode_step,
    init_kv_cache,
)
