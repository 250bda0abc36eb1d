"""piquant_tpu.ops — quantization compute kernels (jnp reference + Pallas)."""

from piquant_tpu.ops import reference  # noqa: F401
