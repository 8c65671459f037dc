"""CTViT generative (VQGAN) training CLI — reconstruction + perceptual +
hinge/BCE GAN + VQ commitment, alternating generator/discriminator updates.

Script entry point for the reference's generative path (ctvit.py:438-546),
which ships as model capability there but has no runnable trainer script;
here one compiled step does both updates plus the EMA codebook update
(train/vqgan_trainer.py) and the batch is data-parallel over the mesh.

    python -m ctpa.cli.train_vqgan --data-dir preprocessed/ \
        --checkpoint-dir vqgan_ckpts --num-steps 10000
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ctpa.core.config import CTViTConfig, MeshConfig
from ctpa.core.checkpoint import CheckpointManager
from ctpa.core.mesh import batch_sharding, create_mesh
from ctpa.data.datasets import VolumeDataset, batch_iterator
from ctpa.data.prefetch import PrefetchIterator
from ctpa.models.ctvit import CTViT
from ctpa.models.discriminator import Discriminator, PerceptualNet
from ctpa.ops.vq import vq_init
from ctpa.train.vqgan_trainer import VQGANState, make_vqgan_train_step


def main(argv=None) -> int:
    from ctpa.core.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True,
                   help="preprocessed .npz volumes (canonical grid)")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--num-steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--disc-lr", type=float, default=3e-4)
    p.add_argument("--bce", action="store_true",
                   help="BCE GAN losses instead of hinge (ctvit.py:67-77)")
    p.add_argument("--gan-weight", type=float, default=1.0)
    p.add_argument("--perceptual-weight", type=float, default=1.0)
    p.add_argument("--vgg", action="store_true",
                   help="full VGG16-geometry perceptual net (import real "
                        "torchvision weights via data/hf_import.py); default "
                        "is a small random-feature pyramid")
    p.add_argument("--checkpoint-dir", default="vqgan_checkpoints")
    p.add_argument("--save-every", type=int, default=1000)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--tiny", action="store_true", help="tiny config smoke mode")
    args = p.parse_args(argv)

    import dataclasses

    vit_cfg = dataclasses.replace(
        CTViTConfig.tiny() if args.tiny else CTViTConfig(), use_decoder=True)
    # data-parallel over as many devices as the batch divides into
    import math

    dp = math.gcd(args.batch_size, len(jax.devices()))
    mesh = create_mesh(MeshConfig(data_parallel=dp, model_parallel=1),
                       devices=jax.devices()[:dp])
    model = CTViT(vit_cfg)
    disc = (Discriminator(base_dim=8, num_layers=2) if args.tiny
            else Discriminator())
    perc = (PerceptualNet(stages=(8, 16)) if args.tiny
            else (PerceptualNet.vgg16() if args.vgg else PerceptualNet()))

    dataset = VolumeDataset(args.data_dir)
    print(f"dataset: {len(dataset)} volumes", file=sys.stderr)

    def collate(samples):
        vols = np.stack([s.volume for s in samples]).astype(np.float32)
        if vols.ndim == 4:                       # (b, D, H, W) -> add channel
            vols = vols[:, None]
        return {"video": vols}

    loader = PrefetchIterator(
        batch_iterator(dataset, args.batch_size, collate),
        sharding=batch_sharding(mesh))

    first = next(loader)
    video0 = jnp.asarray(first["video"])
    vq_state = vq_init(jax.random.key(0), vit_cfg.codebook_size, vit_cfg.dim)
    gen_params = model.init(jax.random.key(1), video0, vq_state,
                            method=CTViT.reconstruct)
    mid = jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 1))
    disc_params = disc.init(jax.random.key(2), mid)
    perc_params = perc.init(jax.random.key(3), jnp.repeat(mid, 3, axis=-1))
    gen_tx = optax.adam(args.lr, b1=0.5, b2=0.9)
    disc_tx = optax.adam(args.disc_lr, b1=0.5, b2=0.9)
    state = VQGANState(
        gen_params=gen_params, disc_params=disc_params,
        perc_params=perc_params, gen_opt=gen_tx.init(gen_params),
        disc_opt=disc_tx.init(disc_params), vq_state=vq_state,
        step=jnp.zeros((), jnp.int32))

    mgr = CheckpointManager(args.checkpoint_dir)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(target=jax.device_get(state))
        print(f"resumed at step {int(state.step)}", file=sys.stderr)

    step_fn = jax.jit(make_vqgan_train_step(
        model, disc, perc, gen_tx, disc_tx, use_hinge=not args.bce,
        gan_weight=args.gan_weight,
        perceptual_weight=args.perceptual_weight))

    batch = first
    while int(state.step) < args.num_steps:
        state, metrics = step_fn(state, jnp.asarray(batch["video"]))
        step = int(state.step)
        if step % args.log_every == 0 or step == 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"step {step}: {m}", file=sys.stderr)
        if step % args.save_every == 0 or step == args.num_steps:
            mgr.save(step, jax.device_get(state))
        try:
            batch = next(loader)
        except StopIteration:
            break
    if mgr.latest_step() != int(state.step):
        mgr.save(int(state.step), jax.device_get(state), force=True)
    mgr.wait()
    print(f"done at step {int(state.step)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
