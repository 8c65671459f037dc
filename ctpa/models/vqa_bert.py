"""BERT-decoder VQA variant — MedicalVQAModel parity (reference vqa.py:76-158).

CXR-BERT encodes the question; a cross-attention layer attends the text hidden
states to the projected vision feature; a concat-fusion MLP merges the two
streams; an lm_head over the BERT vocab scores answer tokens, trained with
shifted CE masked on padding.  `lora_rank`/`lora_alpha` put LoRA deltas on the
BERT q/k/v projections (vqa.py:359-366: peft r=16 α=32 on query/key/value);
`vqa_trainable_mask` reproduces the peft freeze semantics (BERT base frozen,
LoRA + cross-attn + projections + fusion + lm_head trainable, CTViT trunk
no_grad).  SimpleVisionFeatureExtractor is the patch-embed mean-pooling parity
path (vqa.py:25-74)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ctpa.core.config import BertConfig, CTViTConfig
from ctpa.models.bert import BertEncoder
from ctpa.models.ctvit import CTViT
from ctpa.models.report_generator import CrossAttentionLayer


class SimpleVisionFeatureExtractor(nn.Module):
    """Patch-embed -> mean over (t, h, w) -> Linear (vqa.py:25-74)."""

    vit_cfg: CTViTConfig
    out_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video):
        vit = CTViT(self.vit_cfg, dtype=self.dtype, name="ctvit")
        tokens = vit.patch_embed(video)                 # (b, t, h, w, d)
        pooled = tokens.mean(axis=(1, 2, 3))
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(pooled)


class MedicalVQAModel(nn.Module):
    bert_cfg: BertConfig
    vit_cfg: CTViTConfig
    vision_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    # reference fine-tune config: LoRA r=16 α=32 on BERT query/key/value
    # (vqa.py:359-366).  rank=0 disables the overlay (pure inference parity).
    lora_rank: int = 0
    lora_alpha: float = 32.0

    def setup(self):
        self.text_encoder = BertEncoder(self.bert_cfg, dtype=self.dtype,
                                        lora_rank=self.lora_rank,
                                        lora_alpha=self.lora_alpha,
                                        name="text_encoder")
        self.vision_extractor = SimpleVisionFeatureExtractor(
            self.vit_cfg, out_dim=self.vision_dim, dtype=self.dtype,
            name="vision_extractor")
        self.vision_proj = nn.Dense(self.bert_cfg.hidden_size, dtype=self.dtype,
                                    name="vision_proj")
        self.cross_attention = CrossAttentionLayer(
            llm_dim=self.bert_cfg.hidden_size, dtype=self.dtype,
            name="cross_attention")
        h = self.bert_cfg.hidden_size
        self.fusion = nn.Sequential([
            nn.Dense(h, dtype=self.dtype),
            lambda x: nn.gelu(x, approximate=False),   # torch nn.GELU() (vqa.py:99)
            nn.Dense(h, dtype=self.dtype),
        ])
        self.lm_head = nn.Dense(self.bert_cfg.vocab_size, dtype=self.dtype,
                                name="lm_head")

    def __call__(self, video, input_ids, attention_mask):
        """(b, n, vocab) logits over answer tokens."""
        hidden, _ = self.text_encoder(input_ids, attention_mask)
        vision = self.vision_proj(self.vision_extractor(video))      # (b, hidden)
        attended = self.cross_attention(hidden, vision)
        fused = self.fusion(jnp.concatenate(
            [attended, jnp.broadcast_to(vision[:, None, :], attended.shape)], axis=-1))
        return self.lm_head(fused)

    def loss(self, video, input_ids, attention_mask, pad_token_id: int = 0):
        """Shifted CE masked on pad (vqa.py:130-158)."""
        logits = self(video, input_ids, attention_mask)[:, :-1]
        targets = input_ids[:, 1:]
        mask = (targets != pad_token_id).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def generate(self, video, input_ids, attention_mask, max_new_tokens: int,
                 sep_token_id: int, temperature: float = 0.7,
                 rng: Optional[jax.Array] = None, greedy: bool = True):
        """Sampling loop with SEP-token stop (inference_vqa.py:271-300).  BERT
        is bidirectional, so each step re-encodes the grown sequence inside a
        lax.scan over a static padded buffer — shapes stay fixed under jit."""
        b, n0 = input_ids.shape
        total = n0 + max_new_tokens
        ids = jnp.zeros((b, total), jnp.int32).at[:, :n0].set(input_ids)
        mask = jnp.zeros((b, total), jnp.int32).at[:, :n0].set(attention_mask)
        lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
        done = jnp.zeros((b,), bool)
        rng = rng if rng is not None else jax.random.key(0)

        def body(carry, _):
            ids, mask, lengths, done, rng = carry
            logits = self(video, ids, mask)                          # (b, total, V)
            last = jnp.take_along_axis(
                logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
            key, rng = jax.random.split(rng)
            if greedy:
                nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            else:
                nxt = jax.random.categorical(
                    key, last.astype(jnp.float32) / temperature).astype(jnp.int32)
            nxt = jnp.where(done, 0, nxt)
            ids = jax.vmap(lambda r, i, v: r.at[i].set(v))(ids, lengths, nxt)
            mask = jax.vmap(lambda r, i, v: r.at[i].set(v))(
                mask, lengths, jnp.where(done, 0, 1).astype(jnp.int32))
            lengths = lengths + jnp.where(done, 0, 1)
            done = done | (nxt == sep_token_id)
            return (ids, mask, lengths, done, rng), None

        (ids, mask, lengths, done, _), _ = jax.lax.scan(
            body, (ids, mask, lengths, done, rng), None, length=max_new_tokens)
        return ids, lengths


def vqa_trainable_mask(params: Any) -> Any:
    """peft-equivalent freeze semantics for MedicalVQAModel fine-tuning
    (vqa.py:366 `get_peft_model` freezes the BERT base; vqa.py:369-373 then
    optimizes all remaining params): True for BERT LoRA deltas and every module
    outside the two frozen trunks (cross_attention, vision_proj, fusion,
    lm_head, the extractor projection); False for BERT base weights and the
    CTViT patch trunk (run under no_grad in the reference, vqa.py:50)."""

    def label(path, _):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if any(n.endswith(("lora_a", "lora_b")) for n in names):
            return True
        if "ctvit" in names or "text_encoder" in names:
            return False
        return True

    return jax.tree_util.tree_map_with_path(label, params)


def make_vqa_optimizer(params: Any, lr: float = 2e-5, weight_decay: float = 0.01,
                       t_max: int = 10) -> optax.GradientTransformation:
    """AdamW(lr=2e-5, wd=0.01) + CosineAnnealingLR(T_max=10) over the
    `vqa_trainable_mask` set (vqa.py:369-376); frozen params get zero updates."""
    schedule = optax.cosine_decay_schedule(lr, decay_steps=max(t_max, 1))
    mask = vqa_trainable_mask(params)
    return optax.multi_transform(
        {True: optax.adamw(schedule, weight_decay=weight_decay),
         False: optax.set_to_zero()},
        mask,
    )
