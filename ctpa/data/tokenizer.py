"""Tokenization: HF tokenizer wrapper + a self-contained WordPiece fallback.

Production uses the CXR-BERT tokenizer via `transformers` from a LOCAL path
(this environment has zero egress; pass a downloaded snapshot directory).
Tests and offline smoke paths use `SimpleWordTokenizer`, a deterministic
whitespace+hash tokenizer exposing the same (input_ids, attention_mask)
interface with BERT-style CLS/SEP framing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class SimpleWordTokenizer:
    """Deterministic hash-bucket tokenizer with BERT special-token layout:
    [CLS] tok ... tok [SEP] pad...   (pad=0, cls=101, sep=102 like BERT)."""

    pad_token_id = 0

    def __init__(self, vocab_size: int = 30522, max_length: int = 512):
        self.vocab_size = vocab_size
        self.max_length = max_length
        # BERT-style special ids for realistic vocabs; compact ids for tiny
        # test vocabs (reserved must stay well under vocab_size or hashed ids
        # would land out of range -> garbage embeddings / NaN losses)
        if vocab_size >= 1100:
            self.cls_token_id, self.sep_token_id, self._reserved = 101, 102, 999
        else:
            self.cls_token_id, self.sep_token_id, self._reserved = 1, 2, 4

    def _tok(self, word: str) -> int:
        return self._reserved + (hash(word) % (self.vocab_size - self._reserved))

    def __call__(
        self,
        texts: Sequence[str] | str,
        max_length: Optional[int] = None,
        padding: str = "max_length",
    ) -> dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        L = max_length or self.max_length
        ids = np.zeros((len(texts), L), np.int32)
        mask = np.zeros((len(texts), L), np.int32)
        rows = []
        for text in texts:
            toks = [self.cls_token_id] + [self._tok(w) for w in text.lower().split()]
            toks = toks[: L - 1] + [self.sep_token_id]
            rows.append(toks)
        if padding != "max_length":
            L = max(len(r) for r in rows)
            ids = np.zeros((len(texts), L), np.int32)
            mask = np.zeros((len(texts), L), np.int32)
        for i, toks in enumerate(rows):
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(f"<{i}>" for i in ids
                        if i not in (self.pad_token_id, self.cls_token_id, self.sep_token_id))


class HFTokenizer:
    """Thin wrapper over a local `transformers` tokenizer snapshot, exposing
    the same call contract (numpy arrays, fixed max_length padding) the
    trainers expect (tokenization call parity: CTCLIPTrainer.py:333-339)."""

    def __init__(self, path_or_name: str, max_length: int = 512):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(path_or_name)
        self.max_length = max_length
        self.pad_token_id = self.tok.pad_token_id or 0
        self.cls_token_id = getattr(self.tok, "cls_token_id", None)
        self.sep_token_id = getattr(self.tok, "sep_token_id", None)
        self.eos_token_id = getattr(self.tok, "eos_token_id", None)

    def __call__(self, texts, max_length=None, padding="max_length"):
        out = self.tok(
            list(texts) if not isinstance(texts, str) else [texts],
            padding=padding, truncation=True,
            max_length=max_length or self.max_length,
            return_tensors="np",
        )
        return {"input_ids": out["input_ids"].astype(np.int32),
                "attention_mask": out["attention_mask"].astype(np.int32)}

    def decode(self, ids):
        return self.tok.decode([i for i in ids if i != self.pad_token_id],
                               skip_special_tokens=True)
