"""Export a serving bundle: quantize a trained report-generator checkpoint
ONCE offline and store the quantized params with their serving configuration.

Serving startup then loads the bundle directly (`generate_report
--serving-bundle`) instead of re-running `quantize_tree` on every boot — at
7B that pass merges LoRA deltas and quantizes ~6.7 GB of projections while
briefly holding both trees in host memory.  The bundle's metadata records
exactly which LLMConfig serving knobs the weights were prepared for
(weight_quant / fused projections / ffn kernel), so the loader cannot pair
int4-packed weights with an int8 model or vice versa.

The reference has no offline serving-preparation step at all: its inference
scripts load the raw training checkpoint and the peft adapter every time
(vqa_inference.py:24-91, ct_scan_inference.py:89-127).
"""

from __future__ import annotations

import argparse
import sys

from ctpa.core.checkpoint import CheckpointManager
from ctpa.core.config import LoRAConfig


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True,
                   help="training checkpoints (cli/train_report.py output)")
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to export (default: latest)")
    p.add_argument("--quant", choices=["int8", "int4"], default="int8")
    p.add_argument("--ffn-kernel", action="store_true",
                   help="prepare for LLMConfig.quant_ffn_kernel serving "
                        "(one fused pallas FFN launch per layer)")
    p.add_argument("--act-quant", action="store_true",
                   help="record w8a8/w4a8 serving intent (weights are "
                        "identical; stored so the loader enables quant_act)")
    p.add_argument("--kv-quant", choices=["none", "int8", "int4"],
                   default="none")
    p.add_argument("--flash-decode", action="store_true")
    p.add_argument("--lora-rank", type=int, default=16,
                   help="LoRA rank the checkpoint was trained with (0 = no "
                        "LoRA); deltas are merged before quantization")
    p.add_argument("--lora-alpha", type=float, default=32.0)
    args = p.parse_args(argv)

    from ctpa.ops.quant import quantize_tree

    mgr = CheckpointManager(args.checkpoint_dir)
    state = mgr.restore(args.step)
    if state is None:
        print("no checkpoint found", file=sys.stderr)
        return 1
    params = state["params"] if isinstance(state, dict) else state.params
    lora = (LoRAConfig(rank=args.lora_rank, alpha=args.lora_alpha)
            if args.lora_rank > 0 else None)
    params = quantize_tree(params, lora=lora,
                           bits=4 if args.quant == "int4" else 8,
                           ffn_kernel=args.ffn_kernel)

    meta = {
        "kind": "ctpa-serving-bundle",
        "weight_quant": args.quant,
        "quant_ffn_kernel": args.ffn_kernel,
        "quant_act": args.act_quant,
        "kv_quant": None if args.kv_quant == "none" else args.kv_quant,
        "flash_decode": args.flash_decode,
        "lora_merged": ({"rank": args.lora_rank, "alpha": args.lora_alpha}
                        if lora else None),
        "source_checkpoint": args.checkpoint_dir,
        "source_step": args.step if args.step is not None else mgr.latest_step(),
    }
    out = CheckpointManager(args.out, max_to_keep=1)
    out.save(0, params, metadata=meta, force=True)
    out.wait()
    print(f"serving bundle written to {args.out}: {meta}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
