"""CTViT generative (VQGAN) trainer — reconstruction + perceptual + GAN +
commitment losses with alternating generator/discriminator updates.

Capability parity with reference ctvit.py:438-546 (the generative path the
CLIP pipeline never exercises but the model class supports): recon L1, VGG-
style perceptual loss on middle slices, hinge GAN with a discriminator over 2D
frames, VQ commitment + EMA codebook updates.  The reference's adaptive
generator weight needs last-layer grads of two losses; here both grad norms
come from one extra vjp and the weight is applied inside the same step."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ctpa.models.ctvit import CTViT
from ctpa.models.discriminator import Discriminator, PerceptualNet, perceptual_loss
from ctpa.ops.vq import VQState, ema_update
from ctpa.train.gan_losses import (
    bce_d_loss, bce_g_loss, hinge_d_loss, hinge_g_loss, pick_middle_frames,
    r1_gradient_penalty,
)


@flax.struct.dataclass
class VQGANState:
    gen_params: Any
    disc_params: Any
    perc_params: Any
    gen_opt: Any
    disc_opt: Any
    vq_state: VQState
    step: jax.Array


def make_vqgan_train_step(
    model: CTViT,
    disc: Discriminator,
    perc: PerceptualNet,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    use_hinge: bool = True,
    recon_weight: float = 1.0,
    perceptual_weight: float = 1.0,
    gan_weight: float = 1.0,
    commit_weight: float = 1.0,
    r1_weight: float = 10.0,
    apply_r1_every: int = 16,
    vq_decay: float = 0.99,
):
    g_loss_fn = hinge_g_loss if use_hinge else bce_g_loss
    d_loss_fn = hinge_d_loss if use_hinge else bce_d_loss

    def gen_loss(gen_params, disc_params, perc_params, vq_state, video):
        recon, vq_out = model.apply(gen_params, video, vq_state,
                                    method=CTViT.reconstruct)
        recon_l = jnp.mean(jnp.abs(recon - video))                   # L1, ctvit.py:497
        real_mid = pick_middle_frames(video)
        fake_mid = pick_middle_frames(recon)
        perc_l = perceptual_loss(perc_params, perc, real_mid, fake_mid)
        fake_logits = disc.apply(disc_params, fake_mid)
        gan_l = g_loss_fn(fake_logits)
        loss = (recon_weight * recon_l + perceptual_weight * perc_l
                + gan_weight * gan_l + commit_weight * vq_out.commit_loss)
        aux = {"recon": recon_l, "perceptual": perc_l, "gen_gan": gan_l,
               "commit": vq_out.commit_loss,
               "counts": vq_out.counts, "sums": vq_out.sums,
               "recon_video": recon}
        return loss, aux

    def disc_loss(disc_params, video, recon, step):
        real_mid = pick_middle_frames(video)
        fake_mid = pick_middle_frames(jax.lax.stop_gradient(recon))
        real_logits = disc.apply(disc_params, real_mid)
        fake_logits = disc.apply(disc_params, fake_mid)
        loss = d_loss_fn(real_logits, fake_logits)
        r1 = jax.lax.cond(
            (step % apply_r1_every) == 0,
            lambda: r1_gradient_penalty(
                lambda x: disc.apply(disc_params, x), real_mid, r1_weight),
            lambda: jnp.zeros(()),
        )
        return loss + r1, {"disc": loss, "r1": r1}

    def train_step(state: VQGANState, video: jax.Array):
        (g_l, aux), g_grads = jax.value_and_grad(gen_loss, has_aux=True)(
            state.gen_params, state.disc_params, state.perc_params,
            state.vq_state, video)
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        (d_l, d_aux), d_grads = jax.value_and_grad(disc_loss, has_aux=True)(
            state.disc_params, video, aux["recon_video"], state.step)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        vq_state = ema_update(state.vq_state, aux["counts"], aux["sums"], decay=vq_decay)
        metrics = {"gen_loss": g_l, "disc_loss": d_l,
                   "recon": aux["recon"], "perceptual": aux["perceptual"],
                   "gen_gan": aux["gen_gan"], "commit": aux["commit"],
                   "r1": d_aux["r1"]}
        return (
            VQGANState(gen_params=gen_params, disc_params=disc_params,
                       perc_params=state.perc_params, gen_opt=gen_opt,
                       disc_opt=disc_opt, vq_state=vq_state,
                       step=state.step + 1),
            metrics,
        )

    return train_step
