"""Report generation / VQA head: frozen CT-CLIP vision features conditioning a
Meditron-class LLM via cross-attention, with a KV-cached jitted decode loop.

Parity targets:
  * VisionFeatureExtractor — CTViT patch-embed (+ optional spatial encode) ->
    mean-pool over (h, w) then t -> Linear proj + LN + GELU
    (reference model_components.py:15-79 RobustVisionFeatureExtractor;
    vqa_meditron.py:26-131 adds an adaptive-avg-pool variant).  The reference's
    `torch.randn` silent-failure fallback (vqa_meditron.py:127) is deliberately
    NOT reproduced — bad inputs fail loudly (SURVEY.md §7 quirks: fix).
  * CrossAttentionLayer — Q from LLM hidden states, K/V from the single vision
    feature token, residual + LayerNorm (model_components.py:82-138).
  * CTReportGenerator.forward — LLM hidden states -> cross-attention ->
    lm_head -> logits (model_components.py:166-191).
  * generate — the reference decodes by re-running the full prefix per token
    with no KV cache (model_components.py:193-269, O(n²·L)).  Here: one
    prefill + a `lax.while_loop` of single-token cached steps, temperature
    sampling, EOS early-exit — one compiled program, O(n·L).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctpa.core.config import CTViTConfig, LLMConfig, LoRAConfig, ReportGenConfig
from ctpa.models.ctvit import CTViT
from ctpa.models.llm import KVCache, LlamaForCausalLM
from ctpa.ops.sampling import filter_logits, sample_logits


class VisionFeatureExtractor(nn.Module):
    """CTViT trunk -> pooled vision feature (b, vision_dim).

    `use_encoder=False` reproduces the reference's patch-embed-only extractor
    (model_components.py:41-71: patch emb -> mean over (h, w) -> mean over t);
    True runs the full axial encoder first (the stronger variant the reference
    gestures at in vqa_meditron.py:96-110)."""

    vit_cfg: CTViTConfig
    out_dim: int = 512
    use_encoder: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jax.Array) -> jax.Array:
        vit = CTViT(self.vit_cfg, dtype=self.dtype, name="ctvit")
        if self.use_encoder:
            tokens, _ = vit(video, None)
        else:
            tokens = vit.patch_embed(video)
        pooled = tokens.mean(axis=(2, 3)).mean(axis=1)      # (b, dim)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(pooled)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        # reference projection ends in nn.GELU() == exact erf (model_components.py:33)
        return nn.gelu(x, approximate=False)


class CrossAttentionLayer(nn.Module):
    """Text-to-vision multi-head attention: Q from LLM hidden (b, n, llm_dim),
    K/V from one vision token (b, vision_dim); residual + LN
    (model_components.py:82-138)."""

    llm_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array, vision: jax.Array) -> jax.Array:
        b, n, d = hidden.shape
        h = self.num_heads
        hd = d // h
        ctx = vision[:, None, :]                            # (b, 1, dv)
        q = nn.Dense(d, dtype=self.dtype, name="q")(hidden).reshape(b, n, h, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k")(ctx).reshape(b, 1, h, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v")(ctx).reshape(b, 1, h, hd)
        # single kv token -> attention degenerates to a content-dependent gate
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)   # == 1.0, kept for parity
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
        out = nn.Dense(d, dtype=self.dtype, name="out")(out)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(hidden + out)


class GenerateResult(NamedTuple):
    tokens: jax.Array       # (b, max_new) generated ids, pad_id after EOS
    lengths: jax.Array      # (b,) number of real generated tokens


class SpecGenerateResult(NamedTuple):
    tokens: jax.Array       # (b, max_new) generated ids, pad_id after EOS
    lengths: jax.Array      # (b,) number of real generated tokens
    steps: jax.Array        # scalar: verify forwards taken (<= max_new - 1)


def _draft_lookup(buf: jax.Array, cur_len: jax.Array, fallback: jax.Array,
                  ngram: int, draft_len: int) -> jax.Array:
    """Prompt-lookup drafting for one lane: propose the `draft_len` tokens
    that followed the most recent earlier occurrence of the trailing
    `ngram`-gram of `buf[:cur_len]` (prompt + emitted history).  Radiology
    reports are highly formulaic, so the continuation of a repeated bigram
    is right often enough to pay for a free verify (see
    generate_speculative).  No match -> repeat `fallback` (the pending
    token), which itself wins on digit/unit runs."""
    L = buf.shape[0]
    tail = jax.lax.dynamic_slice(
        buf, (jnp.maximum(cur_len - ngram, 0),), (ngram,))
    pos = jnp.arange(L)
    m = jnp.ones((L,), bool)
    for i in range(ngram):
        m = m & (jnp.roll(buf, -i) == tail[i])
    # the matched gram plus >= 1 continuation token must lie strictly inside
    # the real history (this also excludes matching the tail against itself)
    m = m & (pos + ngram <= cur_len - 1)
    j = jnp.max(jnp.where(m, pos, -1))
    found = j >= 0
    d = jax.lax.dynamic_slice(buf, (jnp.where(found, j + ngram, 0),),
                              (draft_len,))
    return jnp.where(found, d, jnp.full((draft_len,), fallback))


def _spec_accept(logits_v: jax.Array, draft: jax.Array, key: jax.Array, *,
                 greedy: bool, temperature: float = 0.7,
                 top_k: Optional[int] = None, top_p: Optional[float] = None):
    """Speculative acceptance for point-mass (prompt-lookup) drafts.

    greedy=True: accept while draft == argmax; emissions ARE the argmaxes —
    token-exact vs greedy decode.

    greedy=False: standard speculative-sampling acceptance specialized to a
    point-mass draft q = delta(draft_i): accept draft_i with probability
    min(1, p_i(draft_i)/q) = p_i(draft_i); on the first rejection resample
    from the residual (p_i - q)_+ — p_i with draft_i masked out,
    renormalized.  All K accepted -> bonus token from p_K.  Marginal per
    position: P(emit = t) = p(d)·1[t=d] + (1-p(d)) · p(t)·1[t≠d]/(1-p(d))
    = p(t), so the emitted prefix has EXACTLY the law of sequential
    sampling — and `p` is softmax(filter_logits(...)), the same function
    `sample_logits` draws through, so temperature/top-k/top-p semantics are
    shared by construction (the reference's production decode is sampled at
    temperature 0.7, model_components.py:249-252; this makes speculation
    apply to that mode, not just greedy).

    Returns (e, a): e (b, K+1) emission tokens (positions > a are
    don't-care), a (b,) accepted-draft counts; committed tokens = a + 1,
    emissions e[:, :a+1]."""
    b, k1, vocab = logits_v.shape
    K = k1 - 1
    if greedy:
        g = jnp.argmax(logits_v, axis=-1).astype(jnp.int32)
        match = (draft == g[:, :K]).astype(jnp.int32)
        return g, jnp.cumprod(match, axis=1).sum(axis=1)
    fl = filter_logits(logits_v, temperature=temperature, top_k=top_k,
                       top_p=top_p)                       # (b, K+1, V)
    logp = jax.nn.log_softmax(fl, axis=-1)
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (b, K))
    p_draft = jnp.exp(jnp.take_along_axis(
        logp[:, :K], draft[..., None], axis=-1)[..., 0])  # (b, K)
    acc = (u < p_draft).astype(jnp.int32)
    a = jnp.cumprod(acc, axis=1).sum(axis=1)              # (b,) in [0, K]
    # resample at position a: residual (draft_a masked) if a < K, full p_K
    # if a == K.  If the filtered support is exactly {draft_a} then
    # p_draft == 1 and rejection has probability zero, so the all--inf
    # residual row is never selected.
    fl_a = jnp.take_along_axis(fl, a[:, None, None], axis=1)[:, 0]   # (b, V)
    d_pad = jnp.concatenate([draft, draft[:, :1]], axis=1)           # (b, K+1)
    d_a = jnp.take_along_axis(d_pad, a[:, None], axis=1)[:, 0]
    mask_d = (a < K)[:, None] & (jnp.arange(vocab)[None, :] == d_a[:, None])
    t_r = jax.random.categorical(
        kr, jnp.where(mask_d, -jnp.inf, fl_a), axis=-1).astype(jnp.int32)
    e = jnp.where(jnp.arange(K + 1)[None, :] == a[:, None],
                  t_r[:, None], d_pad)
    return e, a


class CTReportGenerator(nn.Module):
    """LLM + vision cross-attention conditioning (model_components.py:140-269)."""

    llm_cfg: LLMConfig
    vit_cfg: CTViTConfig
    gen_cfg: ReportGenConfig = ReportGenConfig()
    lora: Optional[LoRAConfig] = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.llm = LlamaForCausalLM(self.llm_cfg, lora=self.lora, dtype=self.dtype,
                                    remat=self.remat, name="llm")
        self.vision_feature_extractor = VisionFeatureExtractor(
            self.vit_cfg, out_dim=self.gen_cfg.vision_dim, dtype=self.dtype,
            name="vision_feature_extractor",
        )
        self.cross_attention = CrossAttentionLayer(
            llm_dim=self.llm_cfg.hidden_size, dtype=self.dtype, name="cross_attention",
        )

    def extract_vision(self, video: jax.Array) -> jax.Array:
        # frozen CT-CLIP trunk in the reference (no_grad, train_module.py:324);
        # freezing here is an optimizer mask, not a stop_gradient, so full
        # fine-tuning remains available.
        return self.vision_feature_extractor(video)

    def __call__(self, video, input_ids, attention_mask):
        """Training forward: logits (b, n, vocab) with vision conditioning."""
        vision = self.extract_vision(video)
        _, hidden, _ = self.llm(input_ids, attention_mask)
        fused = self.cross_attention(hidden, vision)
        return self.llm.apply_lm_head(fused)

    def loss(self, video, input_ids, attention_mask, label_mask=None):
        """Shifted-label CE, pad-masked (train_module.py:87-101).  `label_mask`
        optionally restricts the loss to answer tokens (VQA fine-tune)."""
        logits = self(video, input_ids, attention_mask)
        return self._ce(logits, input_ids, attention_mask, label_mask)

    def loss_from_vision(self, vision, input_ids, attention_mask,
                         label_mask=None):
        """Same CE but over PRECOMPUTED vision features (b, vision_dim).
        For LoRA fine-tuning the vision trunk is frozen, so extracting
        features in a separate program keeps the big video tensor and the
        trunk's activations out of the training step — at 7B that's the
        difference between fitting one chip and a ~270 MB HBM OOM."""
        _, hidden, _ = self.llm(input_ids, attention_mask)
        fused = self.cross_attention(hidden, vision)
        logits = self.llm.apply_lm_head(fused)
        return self._ce(logits, input_ids, attention_mask, label_mask)

    def _ce(self, logits, input_ids, attention_mask, label_mask=None):
        targets = input_ids[:, 1:]
        logits = logits[:, :-1]
        mask = attention_mask[:, 1:].astype(jnp.float32)
        if label_mask is not None:
            mask = mask * label_mask[:, 1:].astype(jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    # ----- KV-cached generation ----------------------------------------------

    def _fused_logits(self, hidden, vision):
        fused = self.cross_attention(hidden, vision)
        return self.llm.apply_lm_head(fused)

    def generate(
        self,
        video: jax.Array,
        input_ids: jax.Array,         # (b, n) right-padded prompt
        attention_mask: jax.Array,    # (b, n)
        max_new_tokens: int,
        eos_token_id: int,
        pad_token_id: int = 0,
        temperature: float = 0.7,
        rng: Optional[jax.Array] = None,
        greedy: bool = False,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> GenerateResult:
        """Jit-friendly autoregressive decode.  Prefill once, then a
        while_loop of single-token cached steps; stops early when every
        sequence has emitted EOS."""
        b, n = input_ids.shape
        vision = self.extract_vision(video)
        cache = KVCache.create(
            self.llm_cfg, b, max_len=n + max_new_tokens, dtype=self.dtype,
        )
        # prefill (lanes advance in lockstep from right-padded prompts, so
        # the KV write offset is batch-shared: single DUS, no scatter)
        _, hidden, cache = self.llm(input_ids, attention_mask, cache=cache,
                                    shared_kv_offset=True)
        # logits at each sequence's last real token
        last_idx = jnp.maximum(attention_mask.sum(axis=-1) - 1, 0)        # (b,)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None].astype(jnp.int32), axis=1
        )                                                                  # (b, 1, d)
        logits0 = self._fused_logits(last_hidden, vision)[:, 0]

        rng = rng if rng is not None else jax.random.key(0)

        def sample(logits, key):
            return sample_logits(logits, key, temperature=temperature,
                                 top_k=top_k, top_p=top_p, greedy=greedy)

        k0, rng = jax.random.split(rng)
        tok0 = sample(logits0, k0)
        done0 = tok0 == eos_token_id
        out0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
        out0 = out0.at[:, 0].set(jnp.where(done0, eos_token_id, tok0))

        def cond(carry):
            i, _, _, done, _, _ = carry
            return (i < max_new_tokens) & ~jnp.all(done)

        def body(carry):
            i, cache, tok, done, out, rng = carry
            _, hidden, cache = self.llm(tok[:, None], None, cache=cache,
                                        shared_kv_offset=True)
            logits = self._fused_logits(hidden, vision)[:, 0]
            key, rng = jax.random.split(rng)
            nxt = sample(logits, key)
            nxt = jnp.where(done, pad_token_id, nxt)
            new_done = done | (nxt == eos_token_id)
            out = out.at[:, i].set(jnp.where(done, pad_token_id, nxt))
            return (i + 1, cache, nxt, new_done, out, rng)

        _, _, _, done, out, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(1, jnp.int32), cache, tok0, done0, out0, rng)
        )
        real = (out != pad_token_id) & (out != eos_token_id)
        return GenerateResult(tokens=out, lengths=real.sum(axis=-1))

    def generate_speculative(
        self,
        video: jax.Array,
        input_ids: jax.Array,         # (b, n) right-padded prompt
        attention_mask: jax.Array,    # (b, n)
        max_new_tokens: int,
        eos_token_id: int,
        pad_token_id: int = 0,
        draft_len: int = 8,
        ngram: int = 2,
        greedy: bool = True,
        temperature: float = 0.7,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        rng: Optional[jax.Array] = None,
    ) -> SpecGenerateResult:
        """Decode with prompt-lookup speculative drafting — exact: greedy
        mode emits the SAME tokens as generate(greedy=True); sampling mode
        (greedy=False) emits tokens with EXACTLY the distribution of
        generate(temperature/top_k/top_p) via rejection sampling
        (_spec_accept; tested in tests/test_speculative.py).

        Each loop step drafts `draft_len` tokens from the most recent
        `ngram`-gram match in the token history (_draft_lookup; the
        train-free 'prompt lookup decoding' scheme), then runs ONE cached
        forward over (pending_token, draft) — `draft_len + 1` positions.
        Single-token decode at serving batch sizes is weight-read-bound, so
        that verify costs roughly the HBM traffic of a 1-token step, and
        `a` accepted drafts let the step emit `a + 1` tokens.  Rejected
        rows are rolled back by resetting write_offset/true_len and
        re-invalidating their slots — the next verify simply overwrites
        them (the cache carries `draft_len + 1` slots of slack for this).

        Per-lane offsets (acceptance lengths diverge across lanes), so this
        path never uses the lockstep/ring fast path; the serving analog is
        ContinuousBatcher(spec_lookup=K) in pipelines/streaming.py.
        Reference decode loop: model_components.py:193-269; its production
        sampling mode (multinomial at temperature 0.7,
        model_components.py:249-252) maps to greedy=False here."""
        b, n = input_ids.shape
        K = draft_len
        vision = self.extract_vision(video)
        # K + 1 slots of slack: a fully-rejected verify writes K + 1 rows
        # past the committed history before rollback
        cache = KVCache.create(
            self.llm_cfg, b, max_len=n + max_new_tokens + K + 1,
            dtype=self.dtype,
        )
        _, hidden, cache = self.llm(input_ids, attention_mask, cache=cache,
                                    shared_kv_offset=True)
        last_idx = jnp.maximum(attention_mask.sum(axis=-1) - 1, 0)
        last_hidden = jnp.take_along_axis(
            hidden, last_idx[:, None, None].astype(jnp.int32), axis=1)
        logits0 = self._fused_logits(last_hidden, vision)[:, 0]
        rng = rng if rng is not None else jax.random.key(0)
        k0, rng = jax.random.split(rng)
        tok0 = sample_logits(logits0, k0, temperature=temperature,
                             top_k=top_k, top_p=top_p, greedy=greedy)
        done0 = tok0 == eos_token_id
        out0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
        out0 = out0.at[:, 0].set(tok0)

        # token history (prompt + emissions), contiguous from 0 per lane:
        # right-padded prompts keep real tokens in [0, plen)
        L = n + max_new_tokens + 1
        plen = attention_mask.sum(axis=-1).astype(jnp.int32)
        buf0 = jnp.zeros((b, L), jnp.int32)
        buf0 = jax.lax.dynamic_update_slice(buf0, input_ids.astype(jnp.int32),
                                            (0, 0))
        buf0 = buf0.at[jnp.arange(b), plen].set(tok0)
        cur_len0 = plen + 1
        cnt0 = jnp.ones((b,), jnp.int32)
        rows = jnp.arange(b)[:, None]
        idx = jnp.arange(K + 1)[None, :]

        def cond(carry):
            _, _, done, *_ = carry
            return ~jnp.all(done)

        def body(carry):
            cache, cur_tok, done, out, buf, cur_len, cnt, steps, rng = carry
            draft = jax.vmap(
                lambda bf, cl, fb: _draft_lookup(bf, cl, fb, ngram, K)
            )(buf, cur_len, cur_tok)
            tokens_in = jnp.concatenate([cur_tok[:, None], draft], axis=1)
            pre_off, pre_tl = cache.write_offset, cache.true_len
            _, hidden, c2 = self.llm(tokens_in, None, cache=cache,
                                     shared_kv_offset=False)
            key, rng = jax.random.split(rng)
            # e (b, K+1): the emission tokens (accepted drafts then a
            # resample/bonus); a (b,): accepted-draft count
            g, a = _spec_accept(self._fused_logits(hidden, vision), draft,
                                key, greedy=greedy, temperature=temperature,
                                top_k=top_k, top_p=top_p)
            eos_hit = (g == eos_token_id) & (idx <= a[:, None])
            has_eos = jnp.any(eos_hit, axis=1)
            first_eos = jnp.argmax(eos_hit, axis=1)
            c = jnp.where(has_eos, first_eos + 1, a + 1)        # tokens to emit
            c = jnp.where(done, 0, c)
            c_emit = jnp.minimum(c, max_new_tokens - cnt)
            emit_ok = (idx < c_emit[:, None]) & ~done[:, None]
            out = out.at[rows, jnp.where(emit_ok, cnt[:, None] + idx,
                                         max_new_tokens)].set(g, mode="drop")
            buf = buf.at[rows, jnp.where(emit_ok, cur_len[:, None] + idx,
                                         L)].set(g, mode="drop")
            # roll back the rejected rows: committed history grows by c
            # (pending token + c - 1 accepted drafts stay; emitted g[c-1]
            # becomes the next pending token and is written next step)
            m_slots = c2.k.shape[3]
            sl = jnp.arange(m_slots)[None, :]
            rolled = ((sl >= (pre_off + c)[:, None])
                      & (sl < (pre_off + K + 1)[:, None]))
            cache = KVCache(
                k=c2.k, v=c2.v, write_offset=pre_off + c,
                true_len=pre_tl + c, valid=c2.valid & ~rolled,
                k_scale=c2.k_scale, v_scale=c2.v_scale,
            )
            nxt = jnp.take_along_axis(
                g, jnp.clip(c - 1, 0, K)[:, None], axis=1)[:, 0]
            cur_tok = jnp.where(done, cur_tok, nxt)
            cnt = cnt + c_emit
            done = done | has_eos | (cnt >= max_new_tokens)
            return (cache, cur_tok, done, out, buf, cur_len + c_emit, cnt,
                    steps + 1, rng)

        carry = (cache, tok0, done0, out0, buf0, cur_len0, cnt0,
                 jnp.asarray(0, jnp.int32), rng)
        _, _, _, out, _, _, _, steps, _ = jax.lax.while_loop(cond, body, carry)
        real = (out != pad_token_id) & (out != eos_token_id)
        return SpecGenerateResult(tokens=out, lengths=real.sum(axis=-1),
                                  steps=steps)
