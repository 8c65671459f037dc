"""Pretrained-model factory — the reference's `pretrained_model.py` surface
without the import-time side effects.

The reference builds tokenizer + CXR-BERT + CTViT + CTCLIP and loads
`CT-CLIP_v2.pt` AT IMPORT TIME as a module-level singleton
(pretrained_model.py:7-52), which every ctpa_report script then imports.
Here the same assembly is an explicit factory: shipped-parity configs, flax
init, optional checkpoint/tokenizer loading from LOCAL paths (this environment
has zero egress — pass snapshot directories, not hub names)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ctpa.core.config import BertConfig, CTCLIPConfig, CTViTConfig
from ctpa.models.ctclip import CTCLIP
from ctpa.ops.vq import VQState, vq_init


@dataclass
class PretrainedCTCLIP:
    model: CTCLIP
    params: Any
    vq_state: VQState
    tokenizer: Any
    vit_cfg: CTViTConfig
    bert_cfg: BertConfig
    clip_cfg: CTCLIPConfig


def shipped_configs() -> tuple[CTViTConfig, BertConfig, CTCLIPConfig]:
    """Exact shipped geometry (pretrained_model.py:17-42)."""
    return CTViTConfig(), BertConfig(), CTCLIPConfig()


def build_ctclip(
    checkpoint_path: Optional[str] = None,
    tokenizer_path: Optional[str] = None,
    bert_weights: Optional[str] = None,
    vit_cfg: Optional[CTViTConfig] = None,
    bert_cfg: Optional[BertConfig] = None,
    clip_cfg: Optional[CTCLIPConfig] = None,
    dtype=jnp.float32,
    seed: int = 0,
) -> PretrainedCTCLIP:
    """Assemble CTCLIP.

    checkpoint_path: a reference `CT-CLIP_v2.pt` torch checkpoint OR an orbax
    directory produced by this framework's trainers.
    tokenizer_path: local HF tokenizer snapshot (CXR-BERT); falls back to the
    deterministic SimpleWordTokenizer.
    bert_weights: local HF BertModel snapshot to initialize the text tower
    when no full CLIP checkpoint is given.
    """
    import os

    explicit_vit_cfg = vit_cfg is not None
    vit_cfg = vit_cfg or CTViTConfig()
    bert_cfg = bert_cfg or BertConfig()
    clip_cfg = clip_cfg or CTCLIPConfig()

    if (checkpoint_path and not os.path.isdir(checkpoint_path)
            and not explicit_vit_cfg and not vit_cfg.peg_reference_layout):
        # A torch .pt checkpoint is a REFERENCE artifact: its weights were
        # trained with the reference PEG's temporal-fold scramble
        # (attention.py:56-84), so reproduce that layout or the imported
        # weights silently diverge from reference activations/AUROCs.
        # Pass an explicit vit_cfg to override.
        from dataclasses import replace

        vit_cfg = replace(vit_cfg, peg_reference_layout=True)

    model = CTCLIP(clip_cfg, vit_cfg, bert_cfg, dtype=dtype)
    vq_state = vq_init(jax.random.key(seed), vit_cfg.codebook_size, vit_cfg.dim)

    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    video = jnp.zeros((1, vit_cfg.channels, vit_cfg.temporal_size,
                       vit_cfg.image_size, vit_cfg.image_size), jnp.float32)
    params = model.init(jax.random.key(seed), ids, mask, video, vq_state,
                        method=CTCLIP.init_all)

    if checkpoint_path:
        from ctpa.data.hf_import import import_ctclip, load_torch_checkpoint, overlay_base

        if os.path.isdir(checkpoint_path):
            from ctpa.core.checkpoint import CheckpointManager

            state = CheckpointManager(checkpoint_path).restore()
            if state is not None:
                params = state["params"] if isinstance(state, dict) else state.params
                restored_vq = (state.get("vq_state") if isinstance(state, dict)
                               else state.vq_state)
                if restored_vq is not None:
                    vq_state = jax.tree.map(jnp.asarray, restored_vq)
        else:
            sd = load_torch_checkpoint(checkpoint_path)
            imported, extras = import_ctclip(
                sd, bert_cfg, vit_cfg.spatial_depth, vit_cfg.temporal_depth)
            # strict=False load parity (ct_clip.py:593-597): tolerate missing
            params = {"params": overlay_base(params["params"], imported,
                                             allow_missing=True)}
            if "vq_codebook" in extras:
                vq_state = vq_state._replace(
                    codebook=jnp.asarray(extras["vq_codebook"]),
                    embed_avg=jnp.asarray(extras["vq_codebook"]).copy())
    elif bert_weights:
        from ctpa.data.hf_import import import_bert, load_hf_snapshot

        sd = load_hf_snapshot(bert_weights)
        prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
        imported = import_bert(sd, bert_cfg, prefix=prefix)
        params = {"params": {**params["params"], "text_transformer": jax.tree.map(
            jnp.asarray, imported)}}

    if tokenizer_path:
        from ctpa.data.tokenizer import HFTokenizer

        tokenizer = HFTokenizer(tokenizer_path)
    else:
        from ctpa.data.tokenizer import SimpleWordTokenizer

        tokenizer = SimpleWordTokenizer(vocab_size=bert_cfg.vocab_size)

    return PretrainedCTCLIP(model=model, params=params, vq_state=vq_state,
                            tokenizer=tokenizer, vit_cfg=vit_cfg,
                            bert_cfg=bert_cfg, clip_cfg=clip_cfg)
