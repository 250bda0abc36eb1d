"""piquant_tpu.utils — profiling, weight cache, observability."""

from piquant_tpu.utils.profiling import measure_throughput, slope_time  # noqa: F401
from piquant_tpu.utils.weight_cache import load_quantized, save_quantized  # noqa: F401
