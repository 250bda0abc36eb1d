"""piquant_tpu.eval — model-quality evaluation (perplexity harness)."""

from piquant_tpu.eval.ppl import perplexity  # noqa: F401
