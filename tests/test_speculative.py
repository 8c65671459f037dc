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


def test_speculative_matches_greedy_with_int8_kv_cache():
    model, params, video, ids, mask = _tiny_model(kv_quant="int8")
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
