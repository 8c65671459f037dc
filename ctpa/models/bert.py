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
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        h, dh = c.num_heads, c.hidden_size // c.num_heads
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x)
        q, k, v = (t.reshape(*t.shape[:-1], h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(dh).astype(sim.dtype) + attn_bias
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(*x.shape)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        c = self.cfg
        attn_out = BertSelfAttention(c, dtype=self.dtype, name="attention_self")(x, attn_bias)
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
            x = layer_cls(c, dtype=self.dtype, name=f"layer_{i}")(x, bias, deterministic)
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
