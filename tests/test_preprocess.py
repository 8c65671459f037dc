"""Golden tests for the canonical preprocessing operator against the reference
semantics (torch F.interpolate trilinear + center crop/pad, SURVEY.md §3.5)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ctpa.core.config import PreprocessConfig
from ctpa.ops.preprocess import (
    crop_or_pad,
    hu_window,
    preprocess_volume,
    preprocess_volume_inference,
    resample_crop_pad,
)


def torch_reference_train(raw, slope, intercept, spacing, cfg):
    """Reproduce ct_clip/data.py:129-196 numerics with torch (oracle only)."""
    import torch
    import torch.nn.functional as F

    x = slope * raw + intercept
    t = torch.tensor(x, dtype=torch.float32)[None, None]
    scale = [spacing[i] / cfg.target_spacing[i] for i in range(3)]
    new_shape = [int(t.shape[2 + i] * scale[i]) for i in range(3)]
    t = F.interpolate(t, size=new_shape, mode="trilinear", align_corners=False)[0, 0]
    t = t.clamp(cfg.hu_min, cfg.hu_max) / cfg.hu_scale
    # center crop/pad per axis (d, h, w) directly on the (d,h,w) layout;
    # equivalent to the reference's transpose->crop->transpose dance.
    out_shape = cfg.target_shape
    for axis, tgt in enumerate(out_shape):
        size = t.shape[axis]
        if size > tgt:
            start = (size - tgt) // 2
            t = t.narrow(axis, start, tgt)
    pads = []
    for axis in reversed(range(3)):
        size = t.shape[axis]
        before = (out_shape[axis] - size) // 2
        pads += [before, out_shape[axis] - size - before]
    t = torch.nn.functional.pad(t, pads, value=cfg.pad_value)
    return t.numpy()


@pytest.mark.parametrize(
    "src_shape,spacing",
    [
        ((20, 24, 24), (2.0, 1.0, 1.0)),     # upsample depth, downsample-ish xy
        ((30, 16, 16), (1.0, 0.5, 0.5)),     # downsample everywhere
        ((12, 40, 40), (3.0, 1.5, 1.5)),     # strong anisotropy
    ],
)
def test_resample_crop_pad_matches_torch(rng, src_shape, spacing):
    cfg = PreprocessConfig(
        target_spacing=(1.5, 0.75, 0.75), target_shape=(24, 32, 32), pad_value=-1.0
    )
    raw = rng.normal(0.0, 500.0, size=src_shape).astype(np.float32)
    slope, intercept = 1.0, -1024.0

    want = torch_reference_train(raw, slope, intercept, spacing, cfg)
    got = preprocess_volume(
        jnp.asarray(raw), jnp.float32(slope), jnp.float32(intercept),
        jnp.asarray(spacing, dtype=jnp.float32), cfg=cfg,
    )[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_window_parity_train_vs_inference():
    cfg_t = PreprocessConfig.train()
    cfg_i = PreprocessConfig.inference()
    x = jnp.asarray([-2000.0, -1000.0, 0.0, 200.0, 1500.0])
    # train: clip +-1000 then /1000 (data.py:150-152)
    np.testing.assert_allclose(
        np.asarray(hu_window(x, cfg_t)), [-1.0, -1.0, 0.0, 0.2, 1.0], atol=1e-6
    )
    # inference: clip [-1000,200] then (x+400)/600 (data_inference.py:82-85)
    np.testing.assert_allclose(
        np.asarray(hu_window(x, cfg_i)), [-1.0, -1.0, 400 / 600, 1.0, 1.0], atol=1e-6
    )


def test_crop_or_pad_center_semantics():
    v = jnp.arange(5 * 4 * 3, dtype=jnp.float32).reshape(5, 4, 3)
    out = crop_or_pad(v, (3, 6, 3), pad_value=-1.0)
    assert out.shape == (3, 6, 3)
    # crop axis 0: keep rows 1..3 (start = (5-3)//2 = 1)
    np.testing.assert_allclose(np.asarray(out[:, 1:5, :]), np.asarray(v[1:4]))
    # pad axis 1: one before, one after
    assert np.all(np.asarray(out[:, 0, :]) == -1.0)
    assert np.all(np.asarray(out[:, 5, :]) == -1.0)


def test_inference_operator_shape_and_window(rng):
    cfg = PreprocessConfig(
        hu_min=-1000, hu_max=200, hu_shift=400, hu_scale=600,
        target_shape=(16, 24, 24), pad_value=-1.0,
    )
    vol = rng.uniform(-1, 1, size=(20, 20, 20)).astype(np.float32)  # (h, w, d)
    out = preprocess_volume_inference(jnp.asarray(vol), cfg=cfg)
    assert out.shape == (1, 16, 24, 24)
    interior = np.asarray(out[0, :, 2:22, 2:22])
    assert interior.min() >= -1.0 and interior.max() <= 1.0


def test_identity_spacing_roundtrip(rng):
    """spacing == target_spacing and source == target shape -> identity."""
    cfg = PreprocessConfig(target_shape=(8, 8, 8), target_spacing=(1.0, 1.0, 1.0))
    raw = rng.normal(size=(8, 8, 8)).astype(np.float32) * 100
    out = resample_crop_pad(jnp.asarray(raw), jnp.ones(3, jnp.float32), cfg, apply_window=False)
    np.testing.assert_allclose(np.asarray(out), raw, rtol=1e-5, atol=1e-4)
