"""Serving-bundle lifecycle: train checkpoint -> cli/export_serving (LoRA
merge + quantize, offline) -> generate_report --serving-bundle (loads the
pre-quantized tree, no startup quantize pass).

The reference re-loads the raw checkpoint + peft adapter on every inference
boot (vqa_inference.py:24-91); the bundle is the framework's offline serving
preparation step."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctpa.core.checkpoint import CheckpointManager
from ctpa.core.config import CTViTConfig, LLMConfig, LoRAConfig, ReportGenConfig
from ctpa.models.report_generator import CTReportGenerator


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """A training-style checkpoint of a tiny LoRA report generator."""
    llm_cfg, vit_cfg = LLMConfig.tiny(), CTViTConfig.tiny()
    lora = LoRAConfig(rank=4, alpha=8.0)
    model = CTReportGenerator(llm_cfg, vit_cfg, ReportGenConfig(lora=lora),
                              lora=lora)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(
        size=(1, 1, vit_cfg.temporal_size, vit_cfg.image_size,
              vit_cfg.image_size)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, llm_cfg.vocab_size, size=(1, 6)), jnp.int32)
    params = model.init(jax.random.key(0), video, ids, jnp.ones_like(ids))
    ckpt_dir = str(tmp_path_factory.mktemp("train_ckpt"))
    mgr = CheckpointManager(ckpt_dir)
    mgr.save(3, {"params": params, "step": 3})
    mgr.wait()
    return ckpt_dir, params


def test_export_bundle_roundtrip(trained_ckpt, tmp_path):
    from ctpa.cli.export_serving import main as export_main
    from ctpa.ops.quant import quantize_tree

    ckpt_dir, params = trained_ckpt
    bundle = str(tmp_path / "bundle")
    rc = export_main(["--checkpoint-dir", ckpt_dir, "--out", bundle,
                      "--quant", "int8", "--lora-rank", "4",
                      "--lora-alpha", "8.0", "--kv-quant", "int8"])
    assert rc == 0

    mgr = CheckpointManager(bundle)
    meta = mgr.restore_metadata()
    assert meta["kind"] == "ctpa-serving-bundle"
    assert meta["weight_quant"] == "int8"
    assert meta["kv_quant"] == "int8"
    assert meta["source_step"] == 3

    want = quantize_tree(params, lora=LoRAConfig(rank=4, alpha=8.0), bits=8)
    got = mgr.restore()
    same = jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.all(jnp.asarray(a) == b)),
                     got, want))
    assert same


def test_export_w4a8_ffn_bundle(trained_ckpt, tmp_path):
    """int4 + act-quant + ffn-kernel is a valid export since the fused int4
    FFN kernel grew a w4a8 path (ops/quant._ffn_kernel_q4_a8); the bundle
    metadata must record all three knobs so the loader enables them."""
    from ctpa.cli.export_serving import main as export_main
    from ctpa.core.checkpoint import CheckpointManager

    ckpt_dir, _ = trained_ckpt
    out = str(tmp_path / "b")
    assert export_main(
        ["--checkpoint-dir", ckpt_dir, "--out", out, "--quant", "int4",
         "--act-quant", "--ffn-kernel", "--lora-rank", "4",
         "--lora-alpha", "8.0"]) == 0
    meta = CheckpointManager(out).restore_metadata(0)
    assert meta["weight_quant"] == "int4"
    assert meta["quant_act"] is True
    assert meta["quant_ffn_kernel"] is True


def test_generate_report_serves_from_bundle(trained_ckpt, tmp_path):
    """Full CLI drive: export a bundle, then generate_report --serving-bundle
    over a 2-item jsonl dataset (tiny config, xla quant backend on CPU)."""
    from ctpa.cli.export_serving import main as export_main
    from ctpa.cli.generate_report import main as gen_main

    ckpt_dir, _ = trained_ckpt
    bundle = str(tmp_path / "bundle")
    assert export_main(["--checkpoint-dir", ckpt_dir, "--out", bundle,
                        "--quant", "int8", "--lora-rank", "4",
                        "--lora-alpha", "8.0"]) == 0

    vit = CTViTConfig.tiny()
    rng = np.random.default_rng(1)
    items = []
    for i in range(2):
        vol_path = str(tmp_path / f"vol{i}.npz")
        np.savez(vol_path, arr_0=rng.normal(
            size=(vit.temporal_size, vit.image_size, vit.image_size)
        ).astype(np.float32))
        items.append({"image_path": vol_path, "report": f"clean lungs {i}"})
    jsonl = str(tmp_path / "data.jsonl")
    with open(jsonl, "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")

    out_dir = str(tmp_path / "out")
    rc = gen_main(["--jsonl", jsonl, "--serving-bundle", bundle,
                   "--tiny", "--greedy", "--max-new-tokens", "4",
                   "--num-lanes", "1", "--quant-impl", "xla",
                   "--out-dir", out_dir])
    assert rc == 0
    results = json.load(open(os.path.join(out_dir, "evaluation_results.json")))
    assert len(results["samples"]) == 2
    assert all(len(s["prediction"]) >= 0 for s in results["samples"])
    assert "bleu4" in results["metrics"] or results["metrics"]


def test_generate_report_bundle_guards(trained_ckpt, tmp_path):
    from ctpa.cli.generate_report import main as gen_main

    with pytest.raises(SystemExit):   # bundle + quant
        gen_main(["--jsonl", "x", "--serving-bundle", "b", "--quant", "int8"])
    with pytest.raises(SystemExit):   # neither source
        gen_main(["--jsonl", "x"])
    with pytest.raises(SystemExit):   # not a bundle
        gen_main(["--jsonl", "x", "--serving-bundle", str(tmp_path / "nope")])
