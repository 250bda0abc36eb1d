"""piquant_tpu.parallel — meshes and quantized collectives over ICI."""

from piquant_tpu.parallel.collectives import (  # noqa: F401
    quantized_all_gather,
    quantized_all_reduce,
    quantized_psum,
    quantized_reduce_scatter,
)
from piquant_tpu.parallel.mesh import make_mesh  # noqa: F401
from piquant_tpu.parallel.rdma_ring import (  # noqa: F401
    rdma_all_reduce_shard,
    rdma_quantized_all_reduce,
)
from piquant_tpu.parallel.ring_attention import (  # noqa: F401
    ring_attention,
    sp_prefill_attention,
)
