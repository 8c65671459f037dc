"""Native C++ loader tests — parity against the Python parsers."""

import numpy as np
import pytest

from ctpa.data import nifti
from ctpa.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no C++ toolchain / zlib"
)


def test_nifti_native_matches_python(tmp_path, rng):
    data = rng.normal(0, 500, size=(12, 10, 8)).astype(np.int16)
    path = str(tmp_path / "v.nii.gz")
    nifti.save(path, data, spacing=(0.7, 0.8, 2.0), scl_slope=2.0, scl_inter=-1024.0)

    loader = native_loader.NativeLoader(2)
    arr, meta = loader.load(path)
    assert meta.shape == (12, 10, 8)
    assert meta.spacing[0] == pytest.approx(0.7)
    assert meta.slope == 2.0 and meta.intercept == -1024.0
    np.testing.assert_array_equal(arr, data.astype(np.float32))


def test_npy_and_npz_native(tmp_path, rng):
    a = rng.normal(size=(5, 6, 7)).astype(np.float32)
    np.save(tmp_path / "a.npy", a)
    np.savez(tmp_path / "a.npz", a)
    np.savez_compressed(tmp_path / "ac.npz", a)

    loader = native_loader.NativeLoader(2)
    for name in ("a.npy", "a.npz", "ac.npz"):
        arr, meta = loader.load(str(tmp_path / name))
        assert meta.shape == (5, 6, 7)
        np.testing.assert_allclose(arr, a, rtol=1e-6)


def test_npy_int16_conversion(tmp_path, rng):
    a = rng.integers(-1000, 1000, size=(4, 4)).astype(np.int16)
    np.save(tmp_path / "i.npy", a)
    loader = native_loader.NativeLoader(1)
    arr, _ = loader.load(str(tmp_path / "i.npy"))
    np.testing.assert_array_equal(arr, a.astype(np.float32))


def test_async_batch(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(8):
        a = rng.normal(size=(16, 16, 16)).astype(np.float32)
        p = str(tmp_path / f"b{i}.npz")
        np.savez_compressed(p, a)
        paths.append(p)
        arrays.append(a)
    loader = native_loader.NativeLoader(4)
    out = loader.load_batch(paths)
    for (arr, _), want in zip(out, arrays):
        np.testing.assert_allclose(arr, want, rtol=1e-6)


def test_error_propagates(tmp_path):
    p = str(tmp_path / "junk.nii")
    with open(p, "wb") as f:
        f.write(b"\x00" * 100)
    loader = native_loader.NativeLoader(1)
    with pytest.raises(RuntimeError):
        loader.load(p)
