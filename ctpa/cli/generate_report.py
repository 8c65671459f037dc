"""Report-generation / VQA inference CLI.

Replaces ctpa_report/vqa_inference.py + inference_vqa.py + ct_scan_inference.py:
loads the latest checkpoint (step-indexed, not mtime-scanning), preprocesses
scans on device, and decodes with the KV-cached continuous batcher; writes
JSON/CSV results and optional per-sample tri-plane visualizations.  The
reference's vision features were computed but unused during generation
(vqa_inference.py:120 — text-only decoding); here the cross-attention
conditioning is always active."""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ctpa.core.checkpoint import CheckpointManager
from ctpa.core.config import (
    CTViTConfig, LLMConfig, LoRAConfig, PreprocessConfig, ReportGenConfig,
)
from ctpa.data.datasets import ReportGenDataset, VQADataset
from ctpa.data.tokenizer import HFTokenizer, SimpleWordTokenizer
from ctpa.eval.artifacts import visualize_sample, write_nlg_results
from ctpa.eval.nlg import NLGEvaluator
from ctpa.models.report_generator import CTReportGenerator
from ctpa.ops.preprocess import preprocess_volume_inference
from ctpa.pipelines.streaming import ContinuousBatcher, Request


def generate_responses(
    model: CTReportGenerator,
    params,
    tokenizer,
    items: list[dict],
    pre_cfg: PreprocessConfig,
    max_new_tokens: int = 128,
    num_lanes: int = 4,
    prompt_len: int = 64,
    temperature: float = 0.7,
    greedy: bool = False,
    spec_lookup: int = 0,
    spec_serve: int = 0,
    visualize_dir: str | None = None,
    top_k: int | None = None,
    top_p: float | None = None,
) -> list[dict]:
    """Batched KV-cached generation over dataset items (vqa_inference.py
    generate_responses parity, minus the unused-vision bug).

    ``spec_lookup > 0`` switches to the latency tier: one request at a time
    through prompt-lookup speculative decoding with that many draft tokens
    (CTReportGenerator.generate_speculative — exact: token-identical to
    greedy decode under --greedy, distribution-identical to plain sampling
    otherwise via rejection-sampling acceptance; formulaic report text
    accepts often).  ``spec_serve > 0`` keeps the batched serving path but
    speculates INSIDE the batcher (ContinuousBatcher(spec_lookup=...), same
    exactness)."""
    if spec_lookup:
        eos = tokenizer.sep_token_id or 2

        @jax.jit
        def spec_gen(p, video, ids, mask, key):
            return model.apply(p, video, ids, mask, max_new_tokens,
                               eos_token_id=eos, draft_len=spec_lookup,
                               greedy=greedy, temperature=temperature,
                               top_k=top_k, top_p=top_p, rng=key,
                               method=CTReportGenerator.generate_speculative)

        records = []
        for i, item in enumerate(items):
            video = preprocess_volume_inference(jnp.asarray(item["volume"]),
                                                cfg=pre_cfg)
            prompt = item.get("prompt", item.get("question", ""))
            toks = tokenizer([prompt], max_length=prompt_len)
            t0 = time.time()
            r = spec_gen(params, video[None].astype(jnp.float32),
                         jnp.asarray(toks["input_ids"][:1], jnp.int32),
                         jnp.asarray(toks["attention_mask"][:1], jnp.int32),
                         jax.random.fold_in(jax.random.key(0), i))
            n_tok = int(r.lengths[0])
            records.append({
                "id": i,
                "prompt": prompt,
                "reference": item.get("report", item.get("answer", "")),
                "prediction": tokenizer.decode(
                    np.asarray(r.tokens[0])[:n_tok].tolist()),
                "tokens": n_tok,
                "latency_s": round(time.time() - t0, 4),
                "verify_steps": int(r.steps),
            })
        return records

    @jax.jit
    def encode(video):
        return model.apply(params, video, method=CTReportGenerator.extract_vision)

    batcher = ContinuousBatcher(
        model, params, num_lanes=num_lanes,
        max_len=prompt_len + max_new_tokens + max(8, spec_serve + 1),
        eos_token_id=tokenizer.sep_token_id or 2,
        temperature=temperature, greedy=greedy,
        top_k=top_k, top_p=top_p, spec_lookup=spec_serve or None,
    )
    records = []
    for i, item in enumerate(items):
        vol = jnp.asarray(item["volume"])
        video = preprocess_volume_inference(vol, cfg=pre_cfg)
        vision = encode(video[None].astype(jnp.float32))[0]
        prompt = item.get("prompt", item.get("question", ""))
        toks = tokenizer([prompt], max_length=prompt_len)
        batcher.submit(Request(
            request_id=i, input_ids=toks["input_ids"][0],
            attention_mask=toks["attention_mask"][0], vision=vision,
            max_new_tokens=max_new_tokens))
        batcher.step()
        if visualize_dir:
            visualize_sample(visualize_dir, np.asarray(video), prompt,
                             item.get("report", item.get("answer", "")),
                             "(pending)", f"sample_{i}")
    results = batcher.run_until_done()
    for i, item in enumerate(items):
        res = results[i]
        records.append({
            "id": i,
            "prompt": item.get("prompt", item.get("question", "")),
            "reference": item.get("report", item.get("answer", "")),
            "prediction": tokenizer.decode(res.tokens),
            "tokens": len(res.tokens),
            "latency_s": round(res.latency_s, 4),
        })
    return records


def main(argv=None):
    from ctpa.core.compilation_cache import enable_compilation_cache
    enable_compilation_cache()   # serving/train cold-start: reuse compiled programs
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--jsonl", required=True, help="dataset manifest")
    p.add_argument("--mode", default="report", choices=["report", "vqa"])
    p.add_argument("--checkpoint-dir", default=None,
                   help="training checkpoints (or pass --serving-bundle)")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--out-dir", default="generation_results")
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--num-lanes", type=int, default=4)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-k", type=int, default=0,
                   help="sample from the k highest-probability tokens "
                        "(0 = off)")
    p.add_argument("--top-p", type=float, default=0.0,
                   help="nucleus sampling: smallest token set with "
                        "cumulative probability >= p (0 = off)")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="latency tier: prompt-lookup speculative decoding "
                        "with K draft tokens, one request at a time — "
                        "token-exact under --greedy, distribution-exact "
                        "under sampling (rejection-sampling acceptance)")
    p.add_argument("--spec-serve", type=int, default=0, metavar="K",
                   help="throughput tier: speculative verify chunks INSIDE "
                        "the continuous batcher (same exactness as "
                        "--speculative)")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--max-samples", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--quant", choices=["none", "int8", "int4"], default="none",
                   help="weight-only serving quantization of the LLM "
                        "(ops/quant.py): int8 ~halves the weight HBM; int4 "
                        "halves it again (group-128 scales, latency tier)")
    p.add_argument("--serving-bundle", default=None, metavar="DIR",
                   help="load a pre-quantized bundle written by "
                        "cli/export_serving.py instead of a training "
                        "checkpoint — skips the startup quantize_tree pass; "
                        "the bundle's metadata sets the serving config")
    p.add_argument("--act-quant", action="store_true",
                   help="with --quant int8: w8a8 — per-token int8 "
                        "activations, native int8 MXU dots (quant_act)")
    p.add_argument("--quant-impl", choices=["pallas", "xla"], default="pallas",
                   help="quantized-matmul backend: the pallas kernels on "
                        "TPU, or the XLA reference path (CPU debugging)")
    p.add_argument("--lora-rank", type=int, default=16,
                   help="LoRA rank the checkpoint was trained with (0 = no "
                        "LoRA); must match cli/train_report.py")
    p.add_argument("--lora-alpha", type=float, default=32.0)
    args = p.parse_args(argv)
    if args.act_quant and args.quant == "none":
        p.error("--act-quant requires quantized weights (--quant int8 -> "
                "w8a8, --quant int4 -> w4a8)")
    if args.spec_serve and args.speculative:
        p.error("pass at most one of --speculative (latency tier) / "
                "--spec-serve (throughput tier)")
    if bool(args.serving_bundle) == bool(args.checkpoint_dir):
        p.error("pass exactly one of --checkpoint-dir / --serving-bundle")
    if args.serving_bundle and (args.quant != "none" or args.act_quant):
        p.error("--serving-bundle already fixes the quantization config; "
                "drop --quant/--act-quant")

    if args.serving_bundle:
        from ctpa.core.checkpoint import CheckpointManager as _Mgr

        bundle_meta = _Mgr(args.serving_bundle).restore_metadata()
        if not bundle_meta or bundle_meta.get("kind") != "ctpa-serving-bundle":
            p.error(f"{args.serving_bundle} is not a serving bundle "
                    "(write one with cli/export_serving.py)")
        args.quant = bundle_meta["weight_quant"]
        args.act_quant = bool(bundle_meta.get("quant_act"))

    if args.tiny:
        llm_cfg, vit_cfg = LLMConfig.tiny(), CTViTConfig.tiny()
    else:
        llm_cfg, vit_cfg = LLMConfig(), CTViTConfig()
    if args.quant != "none":
        import dataclasses

        llm_cfg = dataclasses.replace(
            llm_cfg, weight_quant=args.quant,
            quant_act=args.act_quant, quant_impl=args.quant_impl)
    if args.serving_bundle:
        import dataclasses

        llm_cfg = dataclasses.replace(
            llm_cfg,
            quant_ffn_kernel=bool(bundle_meta.get("quant_ffn_kernel")),
            kv_quant=bundle_meta.get("kv_quant"),
            flash_decode=bool(bundle_meta.get("flash_decode")))
    lora = (LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
            if args.lora_rank > 0 else None)
    gen_cfg = ReportGenConfig()
    # quantized serving merges the LoRA deltas into the base weights
    # (quantize_tree below), so the quantized model carries no adapters
    model = CTReportGenerator(llm_cfg, vit_cfg, gen_cfg,
                              lora=None if args.quant != "none" else lora)
    tokenizer = (HFTokenizer(args.tokenizer) if args.tokenizer
                 else SimpleWordTokenizer(vocab_size=llm_cfg.vocab_size))

    mgr = CheckpointManager(args.serving_bundle or args.checkpoint_dir)
    state = mgr.restore()
    if state is None:
        print("no checkpoint found", file=sys.stderr)
        return 1
    if args.serving_bundle:
        params = state   # the bundle stores the quantized variables directly
    else:
        params = state["params"] if isinstance(state, dict) else state.params
        if args.quant != "none":
            from ctpa.ops.quant import quantize_tree

            params = quantize_tree(params, lora=lora,
                                   bits=4 if args.quant == "int4" else 8)

    ds = (ReportGenDataset if args.mode == "report" else VQADataset)(args.jsonl)
    n = min(len(ds), args.max_samples) if args.max_samples else len(ds)
    items = [ds[i] for i in range(n)]
    pre_cfg = PreprocessConfig.inference() if not args.tiny else PreprocessConfig(
        target_shape=(vit_cfg.temporal_size, vit_cfg.image_size, vit_cfg.image_size))

    records = generate_responses(
        model, params, tokenizer, items, pre_cfg,
        max_new_tokens=args.max_new_tokens, num_lanes=args.num_lanes,
        temperature=args.temperature, greedy=args.greedy,
        top_k=args.top_k or None, top_p=args.top_p or None,
        spec_lookup=args.speculative, spec_serve=args.spec_serve,
        visualize_dir=f"{args.out_dir}/viz" if args.visualize else None)

    metrics = NLGEvaluator().evaluate(
        [r["reference"] for r in records], [r["prediction"] for r in records])
    paths = write_nlg_results(args.out_dir, records, metrics)
    print({"n": len(records), **{k: round(v, 4) for k, v in metrics.items()}},
          file=sys.stderr)
    print("wrote:", paths, file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
