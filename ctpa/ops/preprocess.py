"""Canonical CT preprocessing operator — HU rescale/window + isotropic trilinear
resample + center crop/pad — as one fused, jittable TPU op.

Behavioral parity targets (see SURVEY.md §3.5):
  * offline prep:  reference preprocess_train.py:99-110 (rescale -> window -> resample)
  * online train:  reference ct_clip/data.py:129-190   (rescale -> resample -> window -> crop/pad)
  * online infer:  reference data_inference.py:79-118  (x*1000 -> window[-1000,200] -> (x+400)/600 -> crop/pad)

TPU-first design, NOT a translation: the reference runs `F.interpolate` on CPU
per item (the wall-clock bottleneck, SURVEY.md §3.1).  Trilinear interpolation is
separable, so here each axis is resampled by a dense ``(target, source)``
interpolation matrix with <=2 non-zeros per row — three matmuls that run on the
MXU, fused by XLA with the windowing elementwise ops.  The resample, center
crop, and pad are folded into a single output grid: the interpolation matrix
rows are *offset* by the crop/pad shift, so the intermediate resampled volume
(dynamic shape!) is never materialised and the output shape stays static.  The
resampled size ``N = floor(S * spacing/target_spacing)`` only appears as a
traced scalar inside index arithmetic, so per-volume spacing is fully dynamic
under one compiled executable per source shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ctpa.core.config import PreprocessConfig


def hu_rescale(x: jax.Array, slope: jax.Array | float, intercept: jax.Array | float) -> jax.Array:
    """DICOM rescale: HU = slope * stored + intercept (preprocess_train.py:99)."""
    return x * slope + intercept


def hu_window(x: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """Clip to [hu_min, hu_max], shift, scale (data.py:150-152 / data_inference.py:82-85)."""
    x = jnp.clip(x, cfg.hu_min, cfg.hu_max)
    return (x + cfg.hu_shift) / cfg.hu_scale


def _axis_offset(n: jax.Array, target: int) -> jax.Array:
    """Index shift combining center-crop (n >= target) and center-pad (n < target).

    Matches torch slicing/pad arithmetic in data.py:157-190: crop start is
    ``(n - target) // 2`` and pad-before is ``(target - n) // 2``.
    """
    crop = (n - target) // 2          # used when n >= target
    pad = -((target - n) // 2)        # used when n < target
    return jnp.where(n >= target, crop, pad)


def _interp_matrix(source: int, n: jax.Array, target: int,
                   pad_mask_out: bool = True,
                   true_len: jax.Array | None = None):
    """Dense (target, source) trilinear-interp matrix for one axis, with the
    crop/pad offset folded in.

    ``source`` is static; ``n`` (the virtual resampled length) is a traced
    scalar.  Sampling uses half-pixel centers (align_corners=False):
    ``src = (i + 0.5) * source / n - 0.5`` with edge clamping, matching
    ``F.interpolate(mode='trilinear')`` in resize_array (preprocess_train.py:31-42).

    ``true_len`` (traced, <= source) supports SHAPE-BUCKETED inputs: the array
    is end-padded to a bucket size but only the first ``true_len`` entries are
    real.  All coordinate math then uses ``true_len``; padded columns are never
    selected (i0/i1 clamp to true_len - 1), so bucketing is numerically exact.

    Returns (W, valid): W is (target, source) float32; valid is (target,) bool
    marking rows inside the virtual resampled extent (False rows get pad_value).
    """
    eff = (jnp.asarray(source, jnp.int32) if true_len is None
           else true_len.astype(jnp.int32))
    o = jnp.arange(target)
    idx = o + _axis_offset(n, target)            # index in resampled space
    valid = (idx >= 0) & (idx < n)
    nf = n.astype(jnp.float32)
    src = (idx.astype(jnp.float32) + 0.5) * (eff.astype(jnp.float32) / nf) - 0.5
    i0 = jnp.floor(src)
    frac = src - i0
    i0c = jnp.clip(i0, 0, eff - 1).astype(jnp.int32)
    i1c = jnp.clip(i0 + 1, 0, eff - 1).astype(jnp.int32)
    s = jnp.arange(source)
    # row o has weight (1-frac) at column i0c[o] and frac at i1c[o];
    # when i0c == i1c (edge clamp) the weights sum to 1 as required.
    w = (jnp.where(s[None, :] == i0c[:, None], 1.0 - frac[:, None], 0.0)
         + jnp.where(s[None, :] == i1c[:, None], frac[:, None], 0.0))
    if pad_mask_out:
        w = w * valid[:, None]
    return w.astype(jnp.float32), valid


def resample_crop_pad(
    volume: jax.Array,
    spacing: jax.Array,
    cfg: PreprocessConfig,
    *,
    apply_window: bool = True,
    src_shape: jax.Array | None = None,
) -> jax.Array:
    """Fused resample-to-spacing + center crop/pad to ``cfg.target_shape``.

    Args:
      volume: (d, h, w) float volume in (z, y, x) axis order.
      spacing: (3,) per-volume source voxel spacing (z, y, x) in mm — traced.
      apply_window: apply HU window/scale *after* resampling (online-train
        parity, data.py:150-152).  Pass False if windowing was already applied
        (offline parity, preprocess_train.py:99-103).
      src_shape: optional (3,) traced TRUE extents when ``volume`` is
        end-padded to a shape bucket (data/bucketing.py) — one compiled
        executable then serves every raw shape in the bucket, exactly.

    Returns (D, H, W) volume on the fixed target grid, out-of-extent voxels
    filled with ``cfg.pad_value``.
    """
    d, h, w = volume.shape
    td, th, tw = cfg.target_shape
    tz, ty, tx = cfg.target_spacing
    if src_shape is None:
        sd = sh = sw = None
        ed, eh, ew = d, h, w
    else:
        sd, sh, sw = src_shape[0], src_shape[1], src_shape[2]
        ed, eh, ew = sd, sh, sw
    # virtual resampled sizes (traced scalars), preprocess_train.py:33-39
    nd = (ed * (spacing[0] / tz)).astype(jnp.int32)
    nh = (eh * (spacing[1] / ty)).astype(jnp.int32)
    nw = (ew * (spacing[2] / tx)).astype(jnp.int32)

    wd, vd = _interp_matrix(d, nd, td, true_len=sd)
    wh, vh = _interp_matrix(h, nh, th, true_len=sh)
    ww, vw = _interp_matrix(w, nw, tw, true_len=sw)

    x = volume.astype(jnp.float32)
    # three MXU matmuls: contract each axis against its interp matrix
    x = jnp.einsum("Dd,dhw->Dhw", wd, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("Hh,Dhw->DHw", wh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("Ww,DHw->DHW", ww, x, preferred_element_type=jnp.float32)

    if apply_window:
        x = hu_window(x, cfg)
    valid = vd[:, None, None] & vh[None, :, None] & vw[None, None, :]
    return jnp.where(valid, x, cfg.pad_value)


def crop_or_pad(volume: jax.Array, target_shape: tuple[int, int, int], pad_value: float) -> jax.Array:
    """Static center crop/pad (no resample) — inference-path parity
    (data_inference.py:86-118).  Source shape is static here, so this is pure
    slicing + padding that XLA folds into the surrounding program."""
    out = volume
    for axis, tgt in enumerate(target_shape):
        size = out.shape[axis]
        if size > tgt:
            start = (size - tgt) // 2
            out = jax.lax.slice_in_dim(out, start, start + tgt, axis=axis)
        elif size < tgt:
            before = (tgt - size) // 2
            pads = [(0, 0)] * out.ndim
            pads[axis] = (before, tgt - size - before)
            out = jnp.pad(out, pads, constant_values=pad_value)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "window_first"))
def preprocess_volume(
    raw: jax.Array,
    slope: jax.Array,
    intercept: jax.Array,
    spacing: jax.Array,
    cfg: PreprocessConfig = PreprocessConfig.train(),
    window_first: bool = False,
    src_shape: jax.Array | None = None,
) -> jax.Array:
    """Canonical train-path operator: raw (z,y,x) volume -> (1, D, H, W) model input.

    ``window_first=True`` reproduces the offline pipeline's ordering
    (rescale -> window -> resample, preprocess_train.py:99-110); the default
    False reproduces the online training dataset (rescale -> resample -> window,
    data.py:129-152).  Output matches the reference's final permute to
    (1, depth, height, width) at data.py:196.

    ``src_shape`` (traced (3,) int): true extents of a shape-bucketed,
    end-padded ``raw`` (data/bucketing.py) — heterogeneous raw scans then
    share one executable per BUCKET instead of one per shape.
    """
    x = hu_rescale(raw.astype(jnp.float32), slope, intercept)
    if window_first:
        x = hu_window(x, cfg)
        x = resample_crop_pad(x, spacing, cfg, apply_window=False,
                              src_shape=src_shape)
    else:
        x = resample_crop_pad(x, spacing, cfg, apply_window=True,
                              src_shape=src_shape)
    return x[None]


@functools.partial(jax.jit, static_argnames=("cfg", "prescale"))
def preprocess_volume_inference(
    vol: jax.Array,
    cfg: PreprocessConfig = PreprocessConfig.inference(),
    prescale: float = 1000.0,
) -> jax.Array:
    """Inference-path operator: pre-normalised npz volume -> (1, D, H, W).

    Parity with data_inference.py:78-122: input assumed in [-1,1]-ish units,
    multiplied back by 1000, windowed to [-1000, 200], mapped via (x+400)/600,
    then center crop/pad to (480, 480, 240) in (h, w, d) order and permuted to
    (d, h, w).  NOTE the deliberate train/infer windowing asymmetry
    (SURVEY.md §7 quirks)."""
    x = hu_window(vol.astype(jnp.float32) * prescale, cfg)
    th, tw, td = cfg.target_shape[1], cfg.target_shape[2], cfg.target_shape[0]
    x = crop_or_pad(x, (th, tw, td), cfg.pad_value)     # (h, w, d) like reference
    x = jnp.transpose(x, (2, 0, 1))                      # -> (d, h, w)
    return x[None]


def preprocess_batch(
    raws: jax.Array, slopes: jax.Array, intercepts: jax.Array, spacings: jax.Array,
    cfg: PreprocessConfig = PreprocessConfig.train(), window_first: bool = False,
) -> jax.Array:
    """vmap'd canonical operator over a batch of same-shape raw volumes."""
    fn = functools.partial(preprocess_volume, cfg=cfg, window_first=window_first)
    return jax.vmap(fn)(raws, slopes, intercepts, spacings)


@functools.partial(jax.jit, static_argnames=("cfg", "window_first"))
def preprocess_batch_bucketed(
    raws: jax.Array,        # (B, db, hb, wb) bucket-padded raw volumes
    slopes: jax.Array, intercepts: jax.Array, spacings: jax.Array,
    src_shapes: jax.Array,  # (B, 3) int true extents (data/bucketing.py)
    cfg: PreprocessConfig = PreprocessConfig.train(), window_first: bool = False,
) -> jax.Array:
    """Bucketed batch: one executable per (bucket shape, batch size), exact
    for every raw shape inside the bucket."""
    fn = functools.partial(preprocess_volume, cfg=cfg, window_first=window_first)
    return jax.vmap(fn)(raws, slopes, intercepts, spacings, src_shape=src_shapes)
