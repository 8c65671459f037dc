"""Prompt-lookup speculative decoding (models/report_generator.py
generate_speculative): exact greedy parity with generate(greedy=True) in
fewer model forwards.  Reference decode loop being accelerated:
model_components.py:193-269."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
from ctpa.models.report_generator import CTReportGenerator, _draft_lookup

EOS, PAD = 2, 0


def _tiny_model(**llm_overrides):
    llm_cfg = dataclasses.replace(LLMConfig.tiny(), **llm_overrides)
    vit_cfg = CTViTConfig.tiny()
    gen_cfg = ReportGenConfig(vision_dim=32)
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 1, vit_cfg.temporal_size,
                                         vit_cfg.image_size,
                                         vit_cfg.image_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, llm_cfg.vocab_size, size=(2, 10)),
                      jnp.int32)
    # different real prompt lengths across lanes
    mask = jnp.asarray([[1] * 10, [1] * 7 + [0] * 3], jnp.int32)
    ids = ids * mask
    params = model.init(jax.random.PRNGKey(0), video, ids, mask)
    return model, params, video, ids, mask


def test_draft_lookup_proposes_repeated_continuation():
    # history ... 5 6 7 8 ... 5 6 -> the most recent earlier (5, 6) is
    # followed by (7, 8); drafting must propose exactly that
    buf = jnp.asarray([1, 5, 6, 7, 8, 9, 4, 5, 6, 0, 0, 0], jnp.int32)
    d = _draft_lookup(buf, jnp.asarray(9), jnp.asarray(6), ngram=2,
                      draft_len=3)
    assert d.tolist() == [7, 8, 9]


def test_draft_lookup_falls_back_to_pending_token():
    buf = jnp.asarray([1, 3, 4, 5, 6, 0, 0, 0], jnp.int32)
    d = _draft_lookup(buf, jnp.asarray(5), jnp.asarray(6), ngram=2,
                      draft_len=3)
    assert d.tolist() == [6, 6, 6]


def test_draft_lookup_picks_most_recent_match():
    # (5, 6) occurs twice with different continuations; the later one wins
    buf = jnp.asarray([5, 6, 9, 1, 5, 6, 7, 1, 5, 6, 0, 0], jnp.int32)
    d = _draft_lookup(buf, jnp.asarray(10), jnp.asarray(6), ngram=2,
                      draft_len=1)
    assert d.tolist() == [7]


@pytest.mark.parametrize("draft_len", [1, 4])
def test_speculative_matches_greedy_generate(draft_len):
    model, params, video, ids, mask = _tiny_model()
    ref = model.apply(params, video, ids, mask, max_new_tokens=12,
                      eos_token_id=EOS, pad_token_id=PAD, greedy=True,
                      method=CTReportGenerator.generate)
    spec = model.apply(params, video, ids, mask, max_new_tokens=12,
                       eos_token_id=EOS, pad_token_id=PAD,
                       draft_len=draft_len,
                       method=CTReportGenerator.generate_speculative)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(spec.lengths))
    # an exact spec decode never takes MORE verify forwards than plain
    # decode takes single-token steps
    assert int(spec.steps) <= 11


@pytest.mark.parametrize("kv_quant", ["int8", "int4"])
def test_speculative_matches_greedy_with_quantized_kv_cache(kv_quant):
    model, params, video, ids, mask = _tiny_model(kv_quant=kv_quant)
    ref = model.apply(params, video, ids, mask, max_new_tokens=10,
                      eos_token_id=EOS, pad_token_id=PAD, greedy=True,
                      method=CTReportGenerator.generate)
    spec = model.apply(params, video, ids, mask, max_new_tokens=10,
                       eos_token_id=EOS, pad_token_id=PAD, draft_len=3,
                       method=CTReportGenerator.generate_speculative)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


def test_speculative_accepts_on_repetitive_output():
    """A constant-argmax model (zeroed lm_head -> all logits equal -> argmax
    deterministically 0) must reach full acceptance: the repeat-pending-token
    fallback drafts are always right, so the loop finishes in
    ~max_new / (draft_len + 1) verifies instead of max_new steps."""
    model, params, video, ids, mask = _tiny_model()
    flat = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    head = np.zeros(np.asarray(
        params["params"]["llm"]["lm_head"]["kernel"]).shape, np.float32)
    flat["params"]["llm"]["lm_head"]["kernel"] = jnp.asarray(head)
    max_new, K = 24, 4
    spec = model.apply(flat, video, ids, mask, max_new_tokens=max_new,
                       eos_token_id=EOS, pad_token_id=PAD, draft_len=K,
                       method=CTReportGenerator.generate_speculative)
    ref = model.apply(flat, video, ids, mask, max_new_tokens=max_new,
                      eos_token_id=EOS, pad_token_id=PAD, greedy=True,
                      method=CTReportGenerator.generate)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))
    # 23 post-first tokens at up to K+1=5/verify, constant output: the
    # bigram repeats from the 3rd token on -> far fewer steps than 23
    assert int(spec.steps) <= 10


# ---- rejection-sampling speculation (greedy=False) --------------------------
#
# Exactness claim: generate_speculative(greedy=False) emits tokens with
# EXACTLY the distribution of generate() at the same temperature/top-k/top-p
# (standard speculative sampling specialized to point-mass prompt-lookup
# drafts, report_generator._spec_accept).  The reference's production decode
# is sampled at temperature 0.7 (model_components.py:249-252), so this is the
# mode that serves it.


def test_spec_accept_marginals_match_plain_sampling():
    """Unit-level distribution test: over many keys, _spec_accept's emission
    at position 0 must be distributed as softmax(filtered logits_0), and its
    emission at position 1 (when draft 0 accepted) as softmax(filtered
    logits_1) — the exact sequential-sampling law, draft-independent."""
    from ctpa.models.report_generator import _spec_accept
    from ctpa.ops.sampling import filter_logits

    V, K, N = 8, 2, 40000
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, K + 1, V)), jnp.float32)
    # draft position 0 = the mode of p_0 so acceptance happens often enough
    # to estimate the position-1 conditional; position 1 an arbitrary token
    d0 = int(np.argmax(np.asarray(logits)[0, 0]))
    draft = jnp.asarray([[d0, 1]], jnp.int32)
    kw = dict(greedy=False, temperature=1.1, top_p=0.98)

    keys = jax.random.split(jax.random.key(0), N)
    e, a = jax.vmap(lambda k: _spec_accept(logits, draft, k, **kw))(keys)
    e, a = np.asarray(e[:, 0]), np.asarray(a[:, 0])

    p = np.asarray(jax.nn.softmax(filter_logits(
        logits, temperature=1.1, top_p=0.98), axis=-1))[0]

    # position 0 marginal == p_0 (accept draft w.p. p_0[d]; else residual)
    emp0 = np.bincount(e[:, 0], minlength=V) / N
    assert np.abs(emp0 - p[0]).sum() < 0.02
    # position 1 conditional on draft-0 acceptance == p_1
    acc0 = e[:, 0] == d0
    # acceptance rate of a point-mass draft IS p_0[draft_0]
    assert abs(acc0.mean() - p[0, d0]) < 0.02
    assert acc0.sum() > 1000  # the conditional below is estimable
    emp1 = np.bincount(e[acc0, 1], minlength=V) / acc0.sum()
    assert np.abs(emp1 - p[1]).sum() < 0.04
    # accepted prefix is always the draft prefix; rejection never re-emits
    # the rejected draft token
    rej0 = ~acc0
    assert (a[acc0] >= 1).all() and (a[rej0] == 0).all()
    assert (e[rej0, 0] != d0).all()


def test_spec_accept_greedy_mode_is_argmax():
    from ctpa.models.report_generator import _spec_accept

    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(2, 4, 16)), jnp.float32)
    draft = jnp.asarray(rng.integers(0, 16, size=(2, 3)), jnp.int32)
    e, a = _spec_accept(logits, draft, jax.random.key(0), greedy=True)
    g = np.asarray(jnp.argmax(logits, axis=-1))
    np.testing.assert_array_equal(np.asarray(e), g)
    match = np.cumprod(np.asarray(draft) == g[:, :3], axis=1).sum(axis=1)
    np.testing.assert_array_equal(np.asarray(a), match)


def test_speculative_sampling_near_zero_temperature_matches_greedy():
    """temperature -> 0 collapses sampling onto the argmax, so the sampled
    speculative path must reproduce the greedy speculative path (same
    machinery, acceptance probability ~1 on argmax drafts)."""
    model, params, video, ids, mask = _tiny_model()
    ref = model.apply(params, video, ids, mask, max_new_tokens=12,
                      eos_token_id=EOS, pad_token_id=PAD, greedy=True,
                      method=CTReportGenerator.generate)
    spec = model.apply(params, video, ids, mask, max_new_tokens=12,
                       eos_token_id=EOS, pad_token_id=PAD, draft_len=4,
                       greedy=False, temperature=1e-4,
                       rng=jax.random.key(7),
                       method=CTReportGenerator.generate_speculative)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(spec.tokens))


@pytest.mark.slow
def test_speculative_sampling_distribution_matches_plain_generate():
    """End-to-end distribution equality: per-position marginals of 3 sampled
    tokens from generate() vs generate_speculative(greedy=False) agree over
    N independent keys (tiny vocab so empirical TV noise is small)."""
    model, params, video, ids, mask = _tiny_model(vocab_size=16)
    N, max_new = 4000, 3
    kw = dict(max_new_tokens=max_new, eos_token_id=-1, pad_token_id=PAD,
              temperature=0.8)

    def plain(key):
        return model.apply(params, video, ids, mask, greedy=False, rng=key,
                           method=CTReportGenerator.generate, **kw).tokens

    def spec(key):
        return model.apply(params, video, ids, mask, greedy=False, rng=key,
                           draft_len=3,
                           method=CTReportGenerator.generate_speculative,
                           **kw).tokens

    keys = jax.random.split(jax.random.key(11), N)
    tp = np.asarray(jax.jit(jax.vmap(plain))(keys))   # (N, b, max_new)
    ts = np.asarray(jax.jit(jax.vmap(spec))(keys))
    assert (tp >= 0).all() and (ts >= 0).all()
    for lane in range(tp.shape[1]):
        for pos in range(max_new):
            fp = np.bincount(tp[:, lane, pos], minlength=16) / N
            fs = np.bincount(ts[:, lane, pos], minlength=16) / N
            tv = 0.5 * np.abs(fp - fs).sum()
            assert tv < 0.05, (lane, pos, tv)
