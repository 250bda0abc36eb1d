"""piquant_tpu.eval — model-quality evaluation: perplexity harness +
loglikelihood multiple-choice task scoring (lm-eval style)."""

from piquant_tpu.eval.ppl import perplexity  # noqa: F401
from piquant_tpu.eval.tasks import (  # noqa: F401
    ChoiceResult,
    choice_loglikelihoods,
    evaluate_choices,
)
