"""Sampling op: top-k / top-p filters under jit (ops/sampling.py).

The reference's decode paths sample with bare multinomial(softmax(logits/T))
(model_components.py:252); top-k/top-p are serving-standard extensions the
framework adds on top, shared by generate() and the continuous batcher."""

import numpy as np

import jax
import jax.numpy as jnp

from ctpa.ops.sampling import sample_logits


def _draws(logits, n=256, **kw):
    keys = jax.random.split(jax.random.key(0), n)
    f = jax.jit(lambda k: sample_logits(jnp.asarray(logits), k, **kw))
    return np.asarray(jax.vmap(f)(keys))


def test_greedy_is_argmax():
    logits = np.asarray([0.1, 2.0, -1.0, 0.5], np.float32)
    out = sample_logits(jnp.asarray(logits), jax.random.key(1), greedy=True)
    assert int(out) == 1


def test_top_k_restricts_support():
    logits = np.asarray([5.0, 4.0, 3.0, 2.0, 1.0], np.float32)
    draws = _draws(logits, top_k=2, temperature=1.0)
    assert set(np.unique(draws)) <= {0, 1}
    # k=1 degenerates to greedy
    assert set(np.unique(_draws(logits, top_k=1))) == {0}


def test_top_p_keeps_smallest_nucleus():
    # probs ~ [0.5, 0.3, 0.1, 0.1]: nucleus at p=0.6 is {0, 1} (cumulative
    # mass before token 1 is 0.5 < 0.6; before token 2 is 0.8 >= 0.6)
    probs = np.asarray([0.5, 0.3, 0.1, 0.1])
    logits = np.log(probs).astype(np.float32)
    draws = _draws(logits, top_p=0.6, temperature=1.0)
    assert set(np.unique(draws)) <= {0, 1}
    assert set(np.unique(draws)) == {0, 1}          # both survivors reachable
    # tiny p keeps only the argmax
    assert set(np.unique(_draws(logits, top_p=1e-6))) == {0}
    # p=1.0 is a no-op: every token reachable
    assert set(np.unique(_draws(logits, top_p=1.0))) == {0, 1, 2, 3}


def test_filters_compose_and_batch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 16)).astype(np.float32)
    out = jax.jit(lambda k: sample_logits(
        jnp.asarray(logits), k, temperature=0.7, top_k=8, top_p=0.9))(
            jax.random.key(2))
    assert out.shape == (3,)
    assert out.dtype == jnp.int32
    # each row's draw is within that row's top-8
    top8 = np.argsort(logits, axis=-1)[:, -8:]
    for b in range(3):
        assert int(out[b]) in top8[b]


def test_generate_accepts_sampling_knobs():
    from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
    from ctpa.models.report_generator import CTReportGenerator

    llm, vit = LLMConfig.tiny(), CTViTConfig.tiny()
    model = CTReportGenerator(llm, vit, ReportGenConfig(vision_dim=32))
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(1, 1, vit.temporal_size, vit.image_size, vit.image_size)),
        jnp.float32)
    ids = jnp.asarray(rng.integers(1, llm.vocab_size, size=(1, 6)), jnp.int32)
    mask = jnp.ones((1, 6), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, mask)
    res = model.apply(params, video, ids, mask, 6, eos_token_id=-1,
                      top_k=4, top_p=0.9, rng=jax.random.key(3),
                      method=CTReportGenerator.generate)
    toks = np.asarray(res.tokens[0])
    assert toks.shape == (6,)
    assert (toks >= 0).all() and (toks < llm.vocab_size).all()


def test_top_p_degenerate_and_ties():
    """Review regressions: top_p<=0 must still emit the argmax (never an
    all--inf support), and logit TIES at the nucleus boundary must not leak
    extra tokens in (rank-based cut, not value threshold)."""
    logits = np.asarray([1.0, 3.0, 2.0, 0.0], np.float32)
    assert set(np.unique(_draws(logits, top_p=0.0))) == {1}
    assert set(np.unique(_draws(logits, top_p=-1.0))) == {1}
    # uniform logits: nucleus at p=0.3 is the smallest 2 of 4 equal tokens
    # (ceil(0.3/0.25) = 2 by prefix mass), ties broken by index order
    uni = np.zeros(4, np.float32)
    assert set(np.unique(_draws(uni, top_p=0.3))) == {0, 1}
