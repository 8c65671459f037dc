"""BERT text encoder (flax.linen), geometry-compatible with HF BertModel so
`microsoft/BiomedVLP-CXR-BERT-specialized` weights import 1:1
(reference pretrained_model.py:7-9 uses it as the CLIP text tower; the VQA
BERT-decoder variant in vqa.py:76-158 reuses the same trunk).

Parameter tree mirrors HF module paths (embeddings / encoder.layer.N.attention
...) so the converter in `ctpa/data/hf_import.py` is a pure rename.  Attention
is plain scaled-dot-product over 512-token sequences — XLA fuses the
scale+mask+softmax chain; at this length a custom kernel buys nothing on TPU.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ctpa.core.config import BertConfig


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None, deterministic=True):
        c = self.cfg
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[-1])[None]
        # OOB gather is silent garbage under XLA — clamp so over-long inputs
        # degrade gracefully instead of NaN-ing the loss
        position_ids = jnp.minimum(position_ids, c.max_position_embeddings - 1)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        we = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(input_ids)
        pe = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings")(position_ids)
        te = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype, name="token_type_embeddings")(token_type_ids)
        x = we + pe + te
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        return nn.Dropout(c.dropout, deterministic=deterministic)(x)


class BertSelfAttention(nn.Module):
    """Scaled-dot-product self-attention.  `lora_rank > 0` adds LoRA deltas on
    the q/k/v projections (reference vqa.py:359-366: peft r=16 α=32 on
    query/key/value).  The LoRA params live NEXT TO the Dense modules
    (`query_lora_a` / `query_lora_b`, ...) rather than nesting the Dense under
    a wrapper, so the HF import path (`hf_import.import_bert` ->
    layer_i/attention_self/query/kernel) is unchanged and `overlay_base`
    preserves the fresh LoRA leaves."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0

    def _proj(self, x, name: str):
        c = self.cfg
        y = nn.Dense(c.hidden_size, dtype=self.dtype, name=name)(x)
        if self.lora_rank > 0:
            a = self.param(f"{name}_lora_a",
                           nn.initializers.normal(1.0 / self.lora_rank),
                           (x.shape[-1], self.lora_rank), jnp.float32)
            b = self.param(f"{name}_lora_b", nn.initializers.zeros,
                           (self.lora_rank, c.hidden_size), jnp.float32)
            scale = self.lora_alpha / self.lora_rank
            y = y + (x @ a.astype(x.dtype)) @ b.astype(x.dtype) * scale
        return y

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        h, dh = c.num_heads, c.hidden_size // c.num_heads
        q = self._proj(x, "query")
        k = self._proj(x, "key")
        v = self._proj(x, "value")
        q, k, v = (t.reshape(*t.shape[:-1], h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(dh).astype(sim.dtype) + attn_bias
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(*x.shape)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        c = self.cfg
        attn_out = BertSelfAttention(
            c, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, name="attention_self")(x, attn_bias)
        attn_out = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output_dense")(attn_out)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="attention_output_LayerNorm")(x + attn_out)
        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_LayerNorm")(x + out)


class BertEncoder(nn.Module):
    """Returns (last_hidden_state, cls_embedding).

    The CLIP text path takes hidden[:, 0] (CLS) -> Linear 768->512 -> l2norm
    (ct_clip.py:685-686, 762-765); CLS extraction lives in CTCLIP, this module
    returns the full sequence so the MLM head and VQA decoder can share it.
    """

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    lora_rank: int = 0
    lora_alpha: float = 1.0

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None, deterministic=True):
        c = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic
        )
        neg = jnp.finfo(jnp.float32).min
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg).astype(jnp.float32)
        layer_cls = nn.remat(BertLayer) if self.remat else BertLayer
        for i in range(c.num_layers):
            x = layer_cls(c, dtype=self.dtype, lora_rank=self.lora_rank,
                          lora_alpha=self.lora_alpha, name=f"layer_{i}")(
                x, bias, deterministic)
        return x, x[:, 0]


class BertMLMHead(nn.Module):
    """Masked-LM prediction head (transform + decoder tied-or-free), for the
    MLM SSL capability (reference mlm.py:36-109)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        c = self.cfg
        x = nn.Dense(c.hidden_size, dtype=self.dtype, name="transform_dense")(hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="transform_LayerNorm")(x)
        return nn.Dense(c.vocab_size, dtype=self.dtype, name="decoder")(x)
