"""Report-generation / VQA fine-tuning CLI.

Replaces ctpa_report/main.py + train_module.setup_training + vqa_meditron.py
train path: frozen CT-CLIP vision trunk + Meditron-class LLM with LoRA +
cross-attention head, two-LR-group AdamW + OneCycle, per-epoch NLG eval,
best-by-loss / best-by-val checkpoints."""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ctpa.core.config import (
    CTViTConfig, LLMConfig, LoRAConfig, ReportGenConfig, TrainConfig,
)
from ctpa.data.datasets import ReportGenDataset, VQADataset
from ctpa.data.tokenizer import HFTokenizer, SimpleWordTokenizer
from ctpa.eval.nlg import NLGEvaluator
from ctpa.models.report_generator import CTReportGenerator
from ctpa.train.report_trainer import ReportTrainer, make_report_optimizer
from ctpa.train.train_state import SimpleTrainState


def collate_report(items, tokenizer, max_length):
    texts = [f"{it['prompt']} {it['report']}" if "report" in it
             else f"{it['question']} {it['answer']}" for it in items]
    toks = tokenizer(texts, max_length=max_length)
    return {
        "video": np.stack([it["volume"] for it in items])[:, None].astype(np.float32),
        "input_ids": toks["input_ids"],
        "attention_mask": toks["attention_mask"],
    }


def main(argv=None):
    from ctpa.core.compilation_cache import enable_compilation_cache
    enable_compilation_cache()   # serving/train cold-start: reuse compiled programs
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-jsonl", required=True)
    p.add_argument("--val-jsonl", default=None)
    p.add_argument("--mode", default="report", choices=["report", "vqa"])
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--llm-weights", default=None, help="local HF llama snapshot dir")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--max-length", type=int, default=512)
    p.add_argument("--lora-rank", type=int, default=16)
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--results-dir", default="report_results")
    p.add_argument("--checkpoint-dir", default="report_checkpoints")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--flash-prefill", action="store_true",
                   help="route the full training forward through the pallas "
                        "flash kernel (TPU; needs max-length >= 512)")
    args = p.parse_args(argv)

    if args.tiny:
        llm_cfg, vit_cfg = LLMConfig.tiny(), CTViTConfig.tiny()
    else:
        llm_cfg, vit_cfg = LLMConfig(), CTViTConfig()
    if args.flash_prefill:
        import dataclasses

        llm_cfg = dataclasses.replace(llm_cfg, flash_prefill=True)
    lora = LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
    gen_cfg = ReportGenConfig(lora=lora)
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg, lora=lora,
                              dtype=jnp.bfloat16 if not args.tiny else jnp.float32)
    tokenizer = HFTokenizer(args.tokenizer) if args.tokenizer else SimpleWordTokenizer(
        vocab_size=llm_cfg.vocab_size, max_length=args.max_length)

    ds_cls = ReportGenDataset if args.mode == "report" else VQADataset
    train_ds = ds_cls(args.train_jsonl)
    val_ds = ds_cls(args.val_jsonl) if args.val_jsonl else None
    print(f"train: {len(train_ds)} samples", file=sys.stderr)

    first = collate_report([train_ds[0]], tokenizer, args.max_length)
    params = model.init(jax.random.key(0), jnp.asarray(first["video"]),
                        jnp.asarray(first["input_ids"]),
                        jnp.asarray(first["attention_mask"]))
    if args.llm_weights:
        from ctpa.data.hf_import import import_llama, load_hf_snapshot, overlay_base

        sd = load_hf_snapshot(args.llm_weights)
        imported = import_llama(sd, llm_cfg)
        params = {"params": {**params["params"],
                             "llm": overlay_base(params["params"]["llm"], imported)}}
        print("loaded LLM weights from", args.llm_weights, file=sys.stderr)

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epochs
    if args.tiny:
        tx = make_report_optimizer(params, gen_cfg, total_steps=total_steps)
        state = SimpleTrainState.create(params, tx)
        step_fn = None
    else:
        # LoRA-scale: gradients only for trainable leaves — a full-tree grad
        # at 7B is another 13.5 GB and OOMs the chip
        from ctpa.train.report_trainer import make_partitioned_report_step

        step_fn, opt0 = make_partitioned_report_step(
            model, params, gen_cfg, total_steps=total_steps)
        tx = make_report_optimizer(params, gen_cfg, total_steps=total_steps)
        state = SimpleTrainState(params=params, opt_state=opt0,
                                 step=jnp.zeros((), jnp.int32))

    def eval_fn(state):
        if val_ds is None:
            return {}
        ev = NLGEvaluator()
        refs, hyps = [], []
        for i in range(min(len(val_ds), 16)):
            item = val_ds[i]
            batch = collate_report([item], tokenizer, gen_cfg.max_prompt_len)
            res = model.apply(
                state.params, jnp.asarray(batch["video"]),
                jnp.asarray(batch["input_ids"]), jnp.asarray(batch["attention_mask"]),
                64, eos_token_id=tokenizer.sep_token_id or 2, greedy=True,
                method=CTReportGenerator.generate)
            hyps.append(tokenizer.decode(np.asarray(res.tokens[0]).tolist()))
            refs.append(item.get("report", item.get("answer", "")))
        return ev.evaluate(refs, hyps)

    trainer = ReportTrainer(
        model, state, tx,
        cfg=TrainConfig(results_dir=args.results_dir,
                        checkpoint_dir=args.checkpoint_dir),
        eval_fn=eval_fn,
        step_fn=step_fn,
    )

    def loader():
        order = np.random.default_rng(0).permutation(len(train_ds))
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            items = [train_ds[int(j)] for j in order[i : i + args.batch_size]]
            yield collate_report(items, tokenizer, args.max_length)

    for epoch in range(args.epochs):
        out = trainer.train_epoch(loader(), epoch)
        print(f"epoch {epoch}: {out}", file=sys.stderr)
    trainer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
