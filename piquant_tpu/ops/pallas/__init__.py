"""piquant_tpu.ops.pallas — Mosaic/Pallas TPU kernels for the hot op paths."""
