"""Round-2 additions: device-side param materialization, decode layout
negotiation, flash block picker, acquisition CLI."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_device_params_matches_eval_shape_tree():
    from ctpa.core.initutils import device_params

    shapes = {
        "a": jax.ShapeDtypeStruct((8, 16), jnp.float32),
        "b": {"w": jax.ShapeDtypeStruct((4,), jnp.float32),
              "i": jax.ShapeDtypeStruct((3,), jnp.int32)},
    }
    tree = device_params(shapes, scale=0.5)
    assert tree["a"].shape == (8, 16) and tree["a"].dtype == jnp.float32
    assert tree["b"]["i"].dtype == jnp.int32
    # distinct leaves get distinct RNG streams
    assert not np.allclose(np.asarray(tree["a"][0, :4]),
                           np.asarray(tree["b"]["w"]))


def test_device_params_force_dtype_keeps_ints():
    from ctpa.core.initutils import device_params

    shapes = {"w": jax.ShapeDtypeStruct((4, 4), jnp.float32),
              "i": jax.ShapeDtypeStruct((2,), jnp.int32)}
    tree = device_params(shapes, force_dtype=jnp.bfloat16)
    assert tree["w"].dtype == jnp.bfloat16
    assert tree["i"].dtype == jnp.int32


def test_pick_block_cost_model():
    from ctpa.ops.pallas.flash_attention import _pick_block

    assert _pick_block(13824, cap=1728) == 1728   # exact divisor, big tile
    assert _pick_block(2048, cap=1728) == 1024    # 1728 would pad 69%
    assert _pick_block(576, cap=1728) == 640      # one lane-aligned block
    assert _pick_block(24, cap=1024) == 128       # minimum tile
    assert _pick_block(512, cap=1728) == 512


def test_negotiate_param_formats_structure():
    """Negotiation returns a Format per param leaf (CPU backend: layouts are
    trivial there, but the API contract — tree structure + compile — is what
    serving relies on)."""
    from ctpa.core.config import CTViTConfig, LLMConfig, ReportGenConfig
    from ctpa.models.report_generator import CTReportGenerator
    from ctpa.pipelines.streaming import negotiate_param_formats

    llm_cfg = LLMConfig.tiny()
    vit_cfg = CTViTConfig.tiny()
    model = CTReportGenerator(llm_cfg, vit_cfg, ReportGenConfig(vision_dim=128),
                              dtype=jnp.bfloat16)
    video = jnp.zeros((1, 1, vit_cfg.temporal_size, vit_cfg.image_size,
                       vit_cfg.image_size), jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32)
    shapes = jax.eval_shape(lambda k: model.init(k, video, ids, ids),
                            jax.random.key(0))
    fmts = negotiate_param_formats(model, shapes, num_lanes=2, max_len=24,
                                   steps_per_sync=2)
    assert jax.tree.structure(fmts) == jax.tree.structure(shapes)
    from jax.experimental.layout import Format
    assert all(isinstance(f, Format) for f in jax.tree.leaves(fmts))

    # materializing INTO the negotiated formats yields a usable tree
    from ctpa.core.initutils import device_params
    params = device_params(shapes, formats=fmts)
    assert jax.tree.structure(params) == jax.tree.structure(shapes)


def test_acquire_cli_filter(tmp_path):
    import pandas as pd

    from ctpa.cli.acquire import main

    scans = tmp_path / "scans"
    scans.mkdir()
    for i in range(4):
        (scans / f"vol_{i}.nii.gz").write_bytes(b"x")
    labels = tmp_path / "labels.csv"
    pd.DataFrame({"id": [f"vol_{i}" for i in range(4)],
                  "Pulmonary Embolism": [1, 0, 1, 0]}).to_csv(labels, index=False)
    out = tmp_path / "pos"
    rc = main(["filter", "--scans", str(scans), "--labels", str(labels),
               "--out", str(out)])
    assert rc == 0
    assert sorted(os.listdir(out)) == ["vol_0.nii.gz", "vol_2.nii.gz"]


def test_acquire_cli_plan(capsys):
    from ctpa.cli.acquire import main

    assert main(["plan"]) == 0
    assert "Meditron-7B" in capsys.readouterr().out


def test_llm_flash_prefill_matches_dense():
    """flash_prefill routes no-cache forwards through the pallas kernel;
    logits must match the dense-mask path (interpreter mode on CPU)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from ctpa.core.config import LLMConfig
    from ctpa.models.llm import LlamaForCausalLM

    cfg = LLMConfig.tiny()
    cfg_f = dataclasses.replace(cfg, flash_prefill=True, flash_min_len=16)
    dense = LlamaForCausalLM(cfg)
    flash = LlamaForCausalLM(cfg_f)

    rng = np.random.default_rng(0)
    b, n = 2, 48
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(b, n)), jnp.int32)
    lens = np.asarray([48, 31])
    mask = jnp.asarray(np.arange(n)[None, :] < lens[:, None], jnp.int32)

    params = dense.init(jax.random.key(0), ids, mask)
    want, _, _ = dense.apply(params, ids, mask)
    with pltpu.force_tpu_interpret_mode():
        got, _, _ = flash.apply(params, ids, mask)
    # compare real-token rows only (pad-query outputs are dropped by loss)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(got)[bi, :lens[bi]], np.asarray(want)[bi, :lens[bi]],
            rtol=5e-3, atol=5e-3)


def test_aot_cache_roundtrip(tmp_path):
    """Serialized-executable cache: second load must come from disk (no
    recompile) and execute identically; a poisoned blob degrades to compile."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ctpa.core.aot_cache import load_or_compile

    calls = []

    def f(x):
        calls.append(1)        # traced once per real compile
        return (x @ x).sum()

    # pin the program to the full visible topology: deserialize_and_load
    # binds to all addressable devices, so the compiled program must too
    # (on the single-chip TPU this is automatic)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctpa.core.config import MeshConfig
    from ctpa.core.mesh import create_mesh

    mesh = create_mesh(MeshConfig(data_parallel=jax.device_count(),
                                  model_parallel=1))
    rep = NamedSharding(mesh, P())
    x = jax.device_put(jnp.ones((32, 32)), rep)
    jk = {"in_shardings": rep, "out_shardings": rep}
    d = str(tmp_path / "aot")
    c1 = load_or_compile("unit", f, x, cache_dir=d, jit_kwargs=jk)
    want = float(c1(x))
    n_traces = len(calls)
    files = [p for p in __import__("os").listdir(d) if p.endswith(".bin")]
    assert len(files) == 1

    c2 = load_or_compile("unit", f, x, cache_dir=d, jit_kwargs=jk)
    assert float(c2(x)) == want
    # a hit must NOT trace/lower (the key is shape/source-based — lowering
    # the shipped pipeline costs ~140 s of Mosaic kernel lowering) and must
    # not write a second cache entry
    assert len(calls) == n_traces
    assert [p for p in __import__("os").listdir(d) if p.endswith(".bin")] == files

    # different shape -> different key -> second entry
    load_or_compile("unit", f, jax.device_put(jnp.ones((16, 16)), rep), cache_dir=d, jit_kwargs=jk)
    assert len([p for p in __import__("os").listdir(d) if p.endswith(".bin")]) == 2

    # poisoned blob: silently recompiles
    import os as _os
    with open(_os.path.join(d, files[0]), "wb") as fh:
        fh.write(b"garbage")
    c3 = load_or_compile("unit", f, x, cache_dir=d, jit_kwargs=jk)
    assert float(c3(x)) == want
    assert n_traces >= 1
