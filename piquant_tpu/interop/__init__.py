"""piquant_tpu.interop — adapters for external tensor libraries."""
