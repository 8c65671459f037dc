"""2D convolutional discriminator + perceptual feature net for the CTViT
VQGAN-style generative path.

Parity with reference ctvit.py:198-224 (Discriminator over middle-slice 2D
frames with optional attention at given resolutions) and the VGG16 perceptual
loss (ctvit.py:202, 499-514).  The VGG16-pretrained dependency is replaced by
`PerceptualNet`, a conv feature pyramid whose weights can be random (LPIPS-
style random-feature perceptual distance is a recognised baseline) or imported
from a local VGG snapshot via `import_vgg_features`."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class DiscriminatorBlock(nn.Module):
    filters: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x):
        res = nn.Conv(self.filters, (1, 1),
                      strides=(2, 2) if self.downsample else (1, 1))(x)
        x = nn.Conv(self.filters, (3, 3))(x)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(self.filters, (3, 3))(x)
        x = nn.leaky_relu(x, 0.1)
        if self.downsample:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return (x + res) / jnp.sqrt(2.0)


class Discriminator(nn.Module):
    """Patch-style conv discriminator over 2D slices (ctvit.py:198-224)."""

    base_dim: int = 16
    max_dim: int = 256
    num_layers: int = 4
    channels: int = 1

    @nn.compact
    def __call__(self, x):                      # (b, h, w, c)
        dim = self.base_dim
        x = nn.Conv(dim, (3, 3))(x)
        for i in range(self.num_layers):
            dim = min(dim * 2, self.max_dim)
            x = DiscriminatorBlock(dim)(x)
        x = nn.Conv(dim, (3, 3))(x)
        x = nn.leaky_relu(x, 0.1)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(dim)(x)
        x = nn.leaky_relu(x, 0.1)
        return nn.Dense(1)(x)[:, 0]             # (b,) logits


class PerceptualNet(nn.Module):
    """Conv feature pyramid for perceptual distance.  VGG16-shaped stages so
    `hf_import.import_vgg_features` can graft torchvision
    `vgg16(pretrained=True).features` weights (ctvit.py:202).

    `convs_per_stage` defaults to 2 convs per stage; `PerceptualNet.vgg16()`
    builds the full torchvision geometry (stages 64/128/256/512/512 with
    2/2/3/3/3 convs, 3x3 SAME, relu, 2x2 max-pool between stages).  Returns
    the per-stage pre-pool feature maps; `feats[-1]` after the final stage is
    the torchvision `features` output up to the last pool (the trailing
    MaxPool is distance-irrelevant up to a constant subsampling)."""

    stages: Sequence[int] = (64, 128, 256)
    channels_in: int = 3
    convs_per_stage: Optional[Sequence[int]] = None

    @classmethod
    def vgg16(cls) -> "PerceptualNet":
        return cls(stages=(64, 128, 256, 512, 512),
                   convs_per_stage=(2, 2, 3, 3, 3))

    @nn.compact
    def __call__(self, x):                      # (b, h, w, c)
        feats = []
        cps = self.convs_per_stage or (2,) * len(self.stages)
        for i, (ch, n_convs) in enumerate(zip(self.stages, cps)):
            for j in range(n_convs):
                x = nn.Conv(ch, (3, 3), name=f"conv_{i}{'abcdef'[j]}")(x)
                x = nn.relu(x)
            feats.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def perceptual_loss(params, net: PerceptualNet, real: jax.Array,
                    fake: jax.Array, final_only: bool = False) -> jax.Array:
    """Perceptual distance (VGG parity, ctvit.py:499-523).  Inputs are
    (b, h, w, 1) slices; replicated to 3 channels like the reference's repeat
    for VGG (ctvit.py:502-506).

    final_only=True is the reference's exact formulation — a single MSE on the
    full feature-stack output (F.mse_loss(vgg(x), vgg(y)), ctvit.py:523);
    False averages MSE over all pyramid stages (multi-scale variant)."""
    def prep(x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    fr = net.apply(params, prep(real))
    ff = net.apply(params, prep(fake))
    if final_only:
        return jnp.mean(jnp.square(fr[-1] - ff[-1]))
    return sum(jnp.mean(jnp.square(a - b)) for a, b in zip(fr, ff)) / len(fr)
