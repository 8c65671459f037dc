"""Zero-shot pathology classification from prompt pairs.

Parity with reference ctclip_inference.py:261-338: for each pathology, score
the pair ("X is present.", "X is not present.") against the volume embedding
and softmax over the pair.  TPU-native redesign of the hot loop (SURVEY.md
§3.2): the reference re-encodes the image for every one of the 36 prompts;
here the volume is encoded ONCE and all 2*P prompt latents are computed in a
single batched text forward (they are input-independent, so they are computed
once per run and cached).  This turns 36 full CTCLIP forwards per volume into
1 image encode + 1 dot product.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# reference pathology list, verbatim order (ctclip_inference.py:286-290):
# 18 entries, 'Pulmonary Embolism' at position 12.  Label npz matrices,
# aurocs.xlsx columns, and any by-position consumer depend on this order.
PATHOLOGIES: tuple[str, ...] = (
    "Medical material", "Arterial wall calcification", "Cardiomegaly",
    "Pericardial effusion", "Coronary artery wall calcification",
    "Hiatal hernia", "Lymphadenopathy", "Emphysema", "Atelectasis",
    "Lung nodule", "Lung opacity", "Pulmonary Embolism", "Pleural effusion",
    "Mosaic attenuation pattern", "Peribronchial thickening", "Consolidation",
    "Bronchiectasis", "Interlobular septal thickening",
)


def prompt_pairs(pathologies: Sequence[str] = PATHOLOGIES) -> list[str]:
    """Flat list [p0_pos, p0_neg, p1_pos, ...] (ctclip_inference.py:306)."""
    out = []
    for p in pathologies:
        out.append(f"{p} is present.")
        out.append(f"{p} is not present.")
    return out


def score_prompt_pairs(
    image_latents: jax.Array,       # (b, d) l2-normalised volume latents
    prompt_latents: jax.Array,      # (2P, d) l2-normalised prompt latents
    temperature: jax.Array,         # scalar: exp(learned temp)
) -> jax.Array:
    """(b, P) probability of 'present': softmax over each (pos, neg) pair of
    temp-scaled cosine similarities (apply_softmax at ctclip_inference.py:312-315)."""
    sim = jnp.einsum("bd,pd->bp", image_latents, prompt_latents,
                     preferred_element_type=jnp.float32) * temperature
    pairs = sim.reshape(sim.shape[0], -1, 2)        # (b, P, 2): [present, absent]
    probs = jax.nn.softmax(pairs, axis=-1)
    return probs[..., 0]


class ZeroShotClassifier:
    """Caches prompt latents once; scores batches of volume latents.

    encode_text: (input_ids, attention_mask) -> (n, d) latents
    tokenize: list[str] -> (input_ids, attention_mask) host-side
    """

    def __init__(
        self,
        encode_text: Callable,
        tokenize: Callable,
        temperature: float | jax.Array,
        pathologies: Sequence[str] = PATHOLOGIES,
    ):
        self.pathologies = tuple(pathologies)
        self.temperature = jnp.asarray(temperature, jnp.float32)
        ids, mask = tokenize(prompt_pairs(self.pathologies))
        self.prompt_latents = jax.device_get(encode_text(ids, mask))  # host copy
        self._prompt_dev = jnp.asarray(self.prompt_latents)

    def score(self, image_latents: jax.Array) -> jax.Array:
        return score_prompt_pairs(image_latents, self._prompt_dev, self.temperature)

    def predict(self, image_latents: jax.Array) -> np.ndarray:
        return np.asarray(self.score(image_latents))
