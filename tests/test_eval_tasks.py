"""Loglikelihood task evaluation (eval/tasks.py): multiple-choice scoring
vs a hand-computed oracle, padding/bucketing invariance, and a learnable
synthetic task where a trained model beats chance and the quantized model
tracks it."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from piquant_tpu.eval.tasks import choice_loglikelihoods, evaluate_choices
from piquant_tpu.models import llama as M

SEED = 0xE7A1


@pytest.fixture(scope="module")
def tiny():
    cfg = M.LlamaConfig(vocab_size=32, d_model=64, n_layers=2, n_heads=2,
                        n_kv_heads=1, d_ff=128, max_seq_len=64,
                        dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(SEED))
    return cfg, params


def _oracle_ll(cfg, params, prompt, choice):
    """Direct forward: sum log p(choice tokens | prefix) (no padding)."""
    seq = jnp.asarray([prompt + choice], jnp.int32)
    logits, _ = M.forward(cfg, params, seq)
    lp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    total = 0.0
    for j, tok in enumerate(choice):
        total += float(lp[len(prompt) - 1 + j, tok])
    return total


def test_loglikelihood_matches_oracle(tiny):
    cfg, params = tiny
    prompt = [3, 7, 1, 9]
    choices = [[4, 5], [11], [2, 2, 8]]
    got = choice_loglikelihoods(cfg, params, prompt, choices)
    want = [_oracle_ll(cfg, params, prompt, c) for c in choices]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_padding_invariance(tiny):
    """Scores must not depend on the pad bucket (causal masking contract):
    the same (prompt, choice) in a batch with a much longer row gets the
    identical loglikelihood."""
    cfg, params = tiny
    prompt, choice = [3, 7, 1], [4, 5]
    alone = choice_loglikelihoods(cfg, params, prompt, [choice])[0]
    long_prompt = list(np.random.default_rng(0).integers(1, 32, 40))
    ex = [(prompt, [choice, [9]], 0),
          (long_prompt, [[1, 2, 3], [4]], 0)]
    res = evaluate_choices(cfg, params, ex, batch_size=4)
    np.testing.assert_allclose(res.loglikelihoods[0][0], alone,
                               rtol=1e-4, atol=1e-5)


def test_trained_model_beats_chance_and_quantized_tracks():
    """Synthetic copy task: the correct choice repeats the prompt's first
    token.  A briefly trained model must score far above chance; INT8
    quantization must not destroy it."""
    import optax

    cfg = M.LlamaConfig(vocab_size=16, d_model=64, n_layers=2, n_heads=2,
                        n_kv_heads=1, d_ff=128, max_seq_len=32,
                        dtype=jnp.float32)
    params = M.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(2)

    def make_seq():
        a = int(rng.integers(1, 16))
        filler = rng.integers(1, 16, 6).tolist()
        return [a] + filler + [a]          # answer = first token repeated

    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o, batch):
        def loss_fn(p_):
            logits, _ = M.forward(cfg, p_, batch[:, :-1])
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            # train only the final prediction (the copy position)
            return -jnp.take_along_axis(
                lp[:, -1], batch[:, -1:], axis=-1).mean()
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    for _ in range(120):
        batch = jnp.asarray([make_seq() for _ in range(32)], jnp.int32)
        params, ost, loss = step(params, ost, batch)

    def make_examples(n):
        out = []
        for _ in range(n):
            seq = make_seq()
            prompt, ans_tok = seq[:-1], seq[-1]
            wrong = [t for t in range(1, 16) if t != ans_tok][:3]
            choices = [[ans_tok]] + [[w] for w in wrong]
            out.append((prompt, choices, 0))
        return out

    ex = make_examples(50)
    res = evaluate_choices(cfg, params, ex, batch_size=16)
    assert res.n == 50 and res.accuracy > 0.8, res.accuracy  # chance = 0.25
    q = M.quantize_params(params, bits=8)
    res_q = evaluate_choices(cfg, q, ex, batch_size=16)
    assert res_q.accuracy >= res.accuracy - 0.1, (res.accuracy,
                                                  res_q.accuracy)


def test_validation(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError, match="non-empty"):
        choice_loglikelihoods(cfg, params, [], [[1]])
    with pytest.raises(ValueError, match="non-empty"):
        choice_loglikelihoods(cfg, params, [1], [[]])
