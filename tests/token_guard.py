"""Near-tie-aware greedy token comparison across two numerics paths.

On random weights the top-2 logit gap at some greedy steps is ~5e-3 —
the same scale as legitimate cross-path numeric noise (NOTES.md
batch-shape finding), so strict token identity flakes.  Contract:
tokens must agree up to the first step whose reference margin is below
MARGIN; a divergence at a DECISIVE step is a real bug, a fork at a
near-tie step is accepted (and later tokens are incomparable).
"""

import numpy as np
import jax.numpy as jnp

MARGIN = 0.02  # ~4x the observed ~5e-3 cross-path logit noise


def assert_tokens_match_guarded(forward_fn, prompt, got, want, tag=""):
    """forward_fn(tokens_2d) -> logits [1, T, V] on the REFERENCE path."""
    if list(got) == list(want):
        return
    seq = list(prompt) + [int(t) for t in want[:-1]]
    logits = forward_fn(jnp.asarray([seq], jnp.int32))
    lg = np.asarray(logits[0], np.float32)
    for t, (a, b) in enumerate(zip(got, want)):
        if a != b:
            row = np.sort(lg[len(prompt) - 1 + t])
            margin = float(row[-1] - row[-2])
            assert margin < MARGIN, (
                f"{tag} diverged at step {t} ({a} != {b}) with a decisive "
                f"reference margin {margin:.4f}")
            return
    # equal prefix, different length: only legitimate via an EOS near-tie
    t = min(len(got), len(want))
    row = np.sort(lg[len(prompt) - 1 + t]) if t < len(want) else None
    assert row is not None and float(row[-1] - row[-2]) < MARGIN, (
        f"{tag} length mismatch {len(got)} vs {len(want)}")
