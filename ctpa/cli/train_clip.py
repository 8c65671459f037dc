"""CT-CLIP contrastive training / fine-tuning CLI.

Replaces ct_clip/CTCLIPTrainer.py script usage + fine_tuning_ctclip.py: builds
the mesh, datasets, prefetched loader, optimizer (wd-grouped AdamW, cosine-
warmup-restarts), and runs the pjit'd trainer with periodic zero-shot eval and
orbax checkpointing."""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ctpa.core.config import (
    BertConfig, CTCLIPConfig, CTViTConfig, MeshConfig, OptimizerConfig,
    PreprocessConfig, TrainConfig,
)
from ctpa.core.mesh import batch_sharding, create_mesh
from ctpa.data.datasets import CTReportDataset, batch_iterator, collate_clip
from ctpa.data.prefetch import PrefetchIterator
from ctpa.data.tokenizer import HFTokenizer, SimpleWordTokenizer
from ctpa.models.ctclip import CTCLIP
from ctpa.ops.preprocess import preprocess_batch
from ctpa.ops.vq import vq_init
from ctpa.train.clip_trainer import CTClipTrainer
from ctpa.train.optim import get_optimizer
from ctpa.train.train_state import CLIPTrainState


def build_loader(dataset, tokenizer, batch_size, pre_cfg, mesh, max_length=512,
                 preprocessed=False, process_local=False):
    """Host loader; device-side preprocessing happens here (outside the train
    step so the volume pipeline overlaps the model step via async dispatch).

    process_local=True (multi-host): `dataset` is this process's ProcessShard
    slice, `batch_size` is the PER-PROCESS row count, and batches are
    assembled into global arrays (PrefetchIterator process_local mode)."""
    raw_iter = batch_iterator(
        dataset, batch_size, lambda s: collate_clip(s, tokenizer, max_length))

    def device_side():
        for batch in raw_iter:
            if preprocessed:
                video = jnp.asarray(batch["video"])[:, None]   # already canonical
            else:
                video = preprocess_batch(
                    jnp.asarray(batch["video"]), jnp.asarray(batch["slope"]),
                    jnp.asarray(batch["intercept"]), jnp.asarray(batch["spacing"]),
                    cfg=pre_cfg)
            yield {"input_ids": batch["input_ids"],
                   "attention_mask": batch["attention_mask"],
                   "video": np.asarray(video)}

    return PrefetchIterator(device_side(),
                            sharding=batch_sharding(mesh) if mesh else None,
                            process_local=process_local)


def main(argv=None):
    from ctpa.core.compilation_cache import enable_compilation_cache
    enable_compilation_cache()   # serving/train cold-start: reuse compiled programs
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--reports-csv", required=True)
    p.add_argument("--metadata-csv", default=None)
    p.add_argument("--valid-data-dir", default=None,
                   help="preprocessed volumes for periodic zero-shot eval")
    p.add_argument("--valid-labels-csv", default=None)
    p.add_argument("--eval-every", type=int, default=2000)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-steps", type=int, default=100001)
    p.add_argument("--lr", type=float, default=1.25e-6)
    p.add_argument("--results-dir", default="results")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--preprocessed", action="store_true",
                   help="volumes already on the canonical grid")
    p.add_argument("--tiny", action="store_true", help="tiny config smoke mode")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler device trace here (§5.1)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host training: jax.distributed coordinator "
                        "address (pass on every host, with --num-processes "
                        "and --process-id); each host then reads a disjoint "
                        "ProcessShard of the dataset and --batch-size is the "
                        "GLOBAL batch (must divide by the process count)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)
    if args.coordinator:
        from ctpa.core.mesh import initialize_distributed

        initialize_distributed(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    elif args.num_processes is not None or args.process_id is not None:
        # loud guard: without the coordinator each host would silently train
        # single-process on the FULL dataset — the duplicated-stream DDP bug
        # (CTCLIPTrainer.py:260-275) that ProcessShard exists to fix
        p.error("--num-processes/--process-id require --coordinator")

    if args.tiny:
        import dataclasses

        vit_cfg, bert_cfg = CTViTConfig.tiny(), BertConfig.tiny()
        clip_cfg = CTCLIPConfig.tiny(vit_cfg, bert_cfg)
        pre_cfg = dataclasses.replace(
            PreprocessConfig.train(),
            target_shape=(vit_cfg.temporal_size, vit_cfg.image_size,
                          vit_cfg.image_size))
    else:
        import dataclasses

        # flash_axial: pallas flash attention on the 576-token spatial fold,
        # differentiable end-to-end (pallas bias-backward for the CPB bias);
        # TPU only — the CPU path keeps the XLA attention
        vit_cfg = dataclasses.replace(
            CTViTConfig(),
            flash_axial=jax.default_backend() not in ("cpu",))
        bert_cfg, clip_cfg = BertConfig(), CTCLIPConfig()
        pre_cfg = PreprocessConfig.train()

    mesh = create_mesh(MeshConfig())
    model = CTCLIP(clip_cfg, vit_cfg, bert_cfg)
    vq_state = vq_init(jax.random.key(0), vit_cfg.codebook_size, vit_cfg.dim)
    tokenizer = HFTokenizer(args.tokenizer) if args.tokenizer else SimpleWordTokenizer(
        vocab_size=bert_cfg.vocab_size)

    dataset = CTReportDataset(args.data_dir, args.reports_csv,
                              metadata_csv=args.metadata_csv)
    print(f"dataset: {len(dataset)} volumes", file=sys.stderr)
    # cap tokenization at the text tower's position table (an OOB position
    # lookup is a silent NaN under XLA)
    max_length = min(512, bert_cfg.max_position_embeddings)
    multihost = jax.process_count() > 1
    local_batch = args.batch_size
    if multihost:
        from ctpa.data.datasets import ProcessShard

        if args.batch_size % jax.process_count():
            p.error(f"--batch-size {args.batch_size} must divide by the "
                    f"process count {jax.process_count()}")
        local_batch = args.batch_size // jax.process_count()
        dataset = ProcessShard(dataset)
    loader = build_loader(dataset, tokenizer, local_batch, pre_cfg, mesh,
                          max_length=max_length, preprocessed=args.preprocessed,
                          process_local=multihost)

    first = next(loader)
    params = model.init(jax.random.key(0), jnp.asarray(first["input_ids"]),
                        jnp.asarray(first["attention_mask"]),
                        jnp.asarray(first["video"]), vq_state)
    opt_cfg = OptimizerConfig(lr=args.lr, schedule="cosine_warmup_restarts",
                              total_steps=args.num_steps)
    tx = get_optimizer(opt_cfg, params)
    state = CLIPTrainState.create(params, tx, vq_state)

    # periodic zero-shot eval (CTCLIPTrainer.py:356-453 parity): encode each
    # validation volume once, score all pathology prompt pairs, write AUROC
    # artifacts under results_dir/step_N/
    eval_fn = None
    if args.valid_data_dir and args.valid_labels_csv:
        from ctpa.cli.zeroshot_infer import run_zeroshot
        from ctpa.data.datasets import CTReportInferenceDataset
        from ctpa.eval.zeroshot import PATHOLOGIES

        valid_ds = CTReportInferenceDataset(
            args.valid_data_dir, args.reports_csv, args.valid_labels_csv,
            PATHOLOGIES)
        import dataclasses

        # eval uses the inference windowing (data_inference.py:82-85 parity)
        # on the model's input grid
        eval_pre_cfg = dataclasses.replace(
            PreprocessConfig.inference(), target_shape=pre_cfg.target_shape)

        def eval_fn(state, step):
            return run_zeroshot(
                model, state.params, state.vq_state, valid_ds, tokenizer,
                out_dir=f"{args.results_dir}/zeroshot_step{step}",
                pre_cfg=eval_pre_cfg)

    import itertools
    trainer = CTClipTrainer(
        model, state, itertools.chain([first], loader),
        cfg=TrainConfig(batch_size=args.batch_size, num_train_steps=args.num_steps,
                        save_results_every=args.eval_every,
                        results_dir=args.results_dir,
                        checkpoint_dir=args.checkpoint_dir),
        opt_cfg=opt_cfg, mesh=mesh, eval_fn=eval_fn,
    )
    if args.resume:
        trainer.load()
    from ctpa.core.profiling import trace

    with trace(args.profile_dir):
        final = trainer.train()
    trainer.close()
    print("final:", final, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
