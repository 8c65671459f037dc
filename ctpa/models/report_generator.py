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
            if greedy:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return jax.random.categorical(
                key, logits.astype(jnp.float32) / temperature, axis=-1
            ).astype(jnp.int32)

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
