"""piquant_tpu.interop — adapters for external tensor libraries
(torch drop-in quantize API; GGUF/llama.cpp checkpoints)."""
