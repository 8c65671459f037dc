"""Shape-bucketed batching (data/bucketing.py + ops/preprocess src_shape):
heterogeneous raw scans must (a) group into few buckets, (b) preprocess
EXACTLY as their unpadded originals, (c) bound compile count by bucket count.
VERDICT r2 weak #8 / task 9."""

import numpy as np

import jax
import jax.numpy as jnp

from ctpa.core.config import PreprocessConfig
from ctpa.data.bucketing import ShapeBucketer, bucket_shape, pad_to_bucket
from ctpa.ops.preprocess import (preprocess_batch_bucketed, preprocess_volume)

CFG = PreprocessConfig(target_shape=(24, 48, 48), target_spacing=(1.5, 0.75, 0.75))


def test_bucket_shape_rounds_up():
    assert bucket_shape((100, 500, 500), (32, 64, 64)) == (128, 512, 512)
    assert bucket_shape((128, 512, 512), (32, 64, 64)) == (128, 512, 512)
    v = np.ones((10, 20, 20), np.float32)
    p = pad_to_bucket(v, (32, 64, 64))
    assert p.shape == (32, 64, 64) and p[:10, :20, :20].sum() == v.sum()


def test_bucketed_preprocess_exact_vs_unpadded(rng):
    """End-padded bucket volume + src_shape == unpadded volume, bitwise-close:
    the padded columns must never be selected by the interp matrices."""
    for shape in ((20, 40, 44), (26, 44, 40), (32, 48, 48)):
        vol = rng.normal(size=shape).astype(np.float32) * 300
        spacing = jnp.asarray((2.0, 0.8, 0.8), jnp.float32)
        want = preprocess_volume(jnp.asarray(vol), jnp.float32(1.0),
                                 jnp.float32(-1024.0), spacing, cfg=CFG)
        bucket = bucket_shape(shape, (8, 16, 16))
        padded = pad_to_bucket(vol, bucket)
        got = preprocess_volume(
            jnp.asarray(padded), jnp.float32(1.0), jnp.float32(-1024.0),
            spacing, cfg=CFG, src_shape=jnp.asarray(shape, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_bucketer_groups_and_compiles_per_bucket(rng):
    """Mixed-shape stream -> same-bucket batches; executable count bounded by
    distinct (bucket, batch) combos, not by distinct raw shapes."""
    shapes = [(17, 30, 30), (19, 28, 31), (18, 29, 30),   # -> bucket A
              (33, 50, 50), (35, 49, 52)]                 # -> bucket B
    samples = [{
        "volume": rng.normal(size=s).astype(np.float32) * 200,
        "slope": 1.0, "intercept": -1024.0,
        "spacing": np.asarray((2.0, 0.8, 0.8), np.float32),
    } for s in shapes]

    bucketer = ShapeBucketer(batch_size=2, mults=(8, 16, 16))
    seen_shapes = set()
    n_out = 0
    for batch in bucketer.batches(iter(samples)):
        assert batch["volumes"].shape[1:] == batch["bucket"]
        seen_shapes.add((batch["bucket"], batch["volumes"].shape[0]))
        out = preprocess_batch_bucketed(
            jnp.asarray(batch["volumes"]), jnp.asarray(batch["slope"], jnp.float32),
            jnp.asarray(batch["intercept"], jnp.float32),
            jnp.asarray(batch["spacing"]), jnp.asarray(batch["src_shapes"]),
            cfg=CFG)
        n_out += out.shape[0]
        # every item matches its unpadded single-volume preprocess
        for i in range(out.shape[0]):
            src = batch["src_shapes"][i]
            orig = batch["volumes"][i][: src[0], : src[1], : src[2]]
            want = preprocess_volume(
                jnp.asarray(orig), jnp.float32(1.0), jnp.float32(-1024.0),
                jnp.asarray(batch["spacing"][i]), cfg=CFG)
            np.testing.assert_allclose(np.asarray(out[i]), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)
    assert n_out == len(shapes)
    # 3 A-shapes + 2 B-shapes at batch 2 -> (A,2), (A,1), (B,2): <= 3 combos
    assert len(seen_shapes) <= 3
