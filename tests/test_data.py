"""Data layer tests: NIfTI roundtrip, report cleaning, manifests, datasets,
prefetch."""

import json
import os

import numpy as np
import pytest

from ctpa.data import nifti
from ctpa.data.datasets import (
    CTReportDataset, CTReportInferenceDataset, ReportGenDataset, VQADataset,
    batch_iterator, collate_clip,
)
from ctpa.data.manifests import (
    extract_metadata, generate_vqa_manifest, metadata_lookup, parse_xy_spacing,
    write_split_metadata,
)
from ctpa.data.prefetch import PrefetchIterator
from ctpa.data.reports import clean_impression, train_test_split_by_name
from ctpa.data.tokenizer import SimpleWordTokenizer


# ------------------------------------------------------------------ NIfTI


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.int16, np.float32])
def test_nifti_roundtrip(tmp_path, rng, suffix, dtype):
    data = rng.normal(0, 500, size=(12, 10, 8)).astype(dtype)
    path = str(tmp_path / f"vol{suffix}")
    nifti.save(path, data, spacing=(0.7, 0.7, 2.0), scl_slope=1.0, scl_inter=-1024.0)
    img = nifti.load(path)
    np.testing.assert_array_equal(img.data, data)
    assert img.spacing[:3] == (pytest.approx(0.7), pytest.approx(0.7), pytest.approx(2.0))
    np.testing.assert_allclose(
        img.get_fdata(), data.astype(np.float64) - 1024.0, rtol=1e-6
    )


def test_nifti_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.nii")
    with open(p, "wb") as f:
        f.write(b"\x00" * 400)
    with pytest.raises(ValueError):
        nifti.load(p)


# ------------------------------------------------------------------ reports


def test_clean_impression_extracts_and_scrubs():
    raw = (
        "FINDINGS: stuff here. IMPRESSION: 1. No evidence of pulmonary embolism. "
        "2. Small 3 mm nodule. This was discussed with <hcw> at <time> on <date>. "
        "END OF IMPRESSION: trailer junk"
    )
    out = clean_impression(raw)
    assert out is not None
    assert "no evidence of pulmonary embolism" in out
    assert "3 mm nodule" in out          # measurement preserved
    assert "discussed" not in out        # boilerplate removed
    assert "<hcw>" not in out and "junk" not in out
    assert "1." not in out


def test_clean_impression_boilerplate_family():
    cases = [
        "IMPRESSION: acute pe. Findings conveyed to dr smith at 3pm on friday.",
        "IMPRESSION: acute pe. Preliminary report was discussed with the team by phone on monday at 9am.",
        "IMPRESSION: acute pe. Notification of critical result was provided to the ed at 2am on sunday.",
    ]
    for c in cases:
        out = clean_impression(c)
        assert out == "acute pe.", (c, out)


def test_clean_impression_empty_inputs():
    assert clean_impression("") is None
    assert clean_impression(None) is None
    assert clean_impression("no impression section at all") is None


def test_split_by_name():
    tr, te = train_test_split_by_name([f"v{i}" for i in range(10)], 0.8, seed=1)
    assert len(tr) == 8 and len(te) == 2
    assert not set(tr) & set(te)


# ------------------------------------------------------------------ manifests


def test_parse_xy_spacing_variants():
    assert parse_xy_spacing(0.75) == 0.75
    assert parse_xy_spacing([0.7, 0.7]) == 0.7
    assert parse_xy_spacing("[0.65, 0.65]") == 0.65
    assert parse_xy_spacing("0.8") == 0.8
    with pytest.raises(ValueError):
        parse_xy_spacing("not-a-number")


def test_metadata_pipeline(tmp_path, rng):
    paths = []
    for i in range(4):
        p = str(tmp_path / f"scan_{i}.nii")
        nifti.save(p, rng.integers(-1000, 1000, size=(8, 8, 6)).astype(np.int16),
                   spacing=(0.7, 0.7, 1.5), scl_slope=1.0, scl_inter=-1024.0)
        paths.append(p)
    df = extract_metadata(paths)
    assert len(df) == 4
    assert set(df.columns) >= {"VolumeName", "RescaleSlope", "RescaleIntercept",
                               "XYSpacing", "ZSpacing"}
    tr, te = write_split_metadata(df, str(tmp_path), train_frac=0.75)
    import pandas as pd
    assert len(pd.read_csv(tr)) == 3 and len(pd.read_csv(te)) == 1
    lookup = metadata_lookup(df)
    m = lookup["scan_0"]   # keys are extension-normalized stems
    assert m["spacing"] == (pytest.approx(1.5), pytest.approx(0.7), pytest.approx(0.7))
    assert m["intercept"] == -1024.0


# ------------------------------------------------------------------ datasets


def _mk_clip_data(tmp_path, rng, n=4):
    import pandas as pd

    vol_dir = tmp_path / "vols"
    vol_dir.mkdir()
    rows = []
    for i in range(n):
        vid = f"scan{i}"
        np.savez(vol_dir / f"{vid}.npz", rng.normal(size=(6, 8, 8)).astype(np.float32))
        rows.append({"impression_id": vid, "impressions": f'report "{i}" (clean)'})
    pd.DataFrame(rows).to_csv(tmp_path / "reports.csv", index=False)
    return str(vol_dir), str(tmp_path / "reports.csv")


def test_ct_report_dataset_and_collate(tmp_path, rng):
    vol_dir, reports = _mk_clip_data(tmp_path, rng)
    ds = CTReportDataset(vol_dir, reports)
    assert len(ds) == 4
    s = ds[0]
    assert s.volume.shape == (6, 8, 8)
    assert '"' not in s.text and "(" not in s.text   # normalize_for_training
    tok = SimpleWordTokenizer(vocab_size=1000, max_length=16)
    batch = collate_clip([ds[0], ds[1]], tok, max_length=16)
    assert batch["video"].shape == (2, 6, 8, 8)
    assert batch["input_ids"].shape == (2, 16)
    assert batch["spacing"].shape == (2, 3)


def test_inference_dataset_labels(tmp_path, rng):
    import pandas as pd

    vol_dir, reports = _mk_clip_data(tmp_path, rng)
    labels = pd.DataFrame([
        {"id": f"scan{i}", "Cardiomegaly": i % 2, "Pulmonary Embolism": 1 - i % 2}
        for i in range(4)
    ])
    labels.to_csv(tmp_path / "labels.csv", index=False)
    ds = CTReportInferenceDataset(
        vol_dir, reports, str(tmp_path / "labels.csv"),
        pathologies=["Cardiomegaly", "Pulmonary Embolism"],
    )
    s = ds[1]
    assert s.labels is not None and s.labels.shape == (2,)
    assert s.accession == "scan1"


def test_vqa_and_reportgen_datasets(tmp_path, rng):
    np.savez(tmp_path / "img.npz", rng.normal(size=(4, 4, 4)).astype(np.float32))
    vqa = tmp_path / "vqa.jsonl"
    with open(vqa, "w") as f:
        f.write(json.dumps({"image_path": str(tmp_path / "img.npz"),
                            "question": "is there pe?", "answer": "no"}) + "\n")
    ds = VQADataset(str(vqa))
    assert len(ds) == 1 and ds[0]["answer"] == "no"

    rg = tmp_path / "rg.jsonl"
    with open(rg, "w") as f:
        f.write(json.dumps({"image_path": str(tmp_path / "img.npz"),
                            "report": "clear lungs"}) + "\n")
    d2 = ReportGenDataset(str(rg))
    item = d2[0]
    assert "CT scan" in item["prompt"] and item["report"] == "clear lungs"


def test_vqa_manifest_generation(tmp_path, rng):
    import pandas as pd

    np.savez(tmp_path / "a.npz", rng.normal(size=(2, 2, 2)))
    pd.DataFrame([
        {"impression_id": "a", "impressions": "report a"},
        {"impression_id": "missing", "impressions": "nope"},
    ]).to_csv(tmp_path / "r.csv", index=False)
    n = generate_vqa_manifest(str(tmp_path / "r.csv"), str(tmp_path),
                              str(tmp_path / "out.jsonl"))
    assert n == 1


def test_batch_iterator_and_prefetch(tmp_path, rng):
    vol_dir, reports = _mk_clip_data(tmp_path, rng)
    ds = CTReportDataset(vol_dir, reports)
    tok = SimpleWordTokenizer(vocab_size=1000, max_length=8)
    it = batch_iterator(ds, 2, lambda s: collate_clip(s, tok, 8), cycle=False)
    batches = list(it)
    assert len(batches) == 2
    # prefetch wrapper preserves contents and order
    it2 = batch_iterator(ds, 2, lambda s: collate_clip(s, tok, 8), shuffle=False,
                         cycle=False)
    pre = PrefetchIterator(it2, depth=2)
    got = list(pre)
    assert len(got) == 2
    assert got[0]["video"].shape == (2, 6, 8, 8)


def test_prefetch_propagates_errors():
    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("loader exploded")

    pre = PrefetchIterator(bad(), depth=1)
    next(pre)
    with pytest.raises(RuntimeError, match="loader exploded"):
        next(pre)
        next(pre)


def test_batch_iterator_skip_on_error(tmp_path, rng):
    class Flaky:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("corrupt sample")
            return {"x": np.full(3, i, np.float32)}

    it = batch_iterator(Flaky(), 2, lambda s: np.stack([x["x"] for x in s]),
                        shuffle=False, cycle=False, on_error="skip")
    batches = list(it)
    seen = sorted(int(b[i][0]) for b in batches for i in range(len(b)))
    assert seen == [0, 1, 3, 4]          # idx 2 skipped, 5 dropped (drop_last)
    with pytest.raises(ValueError):
        list(batch_iterator(Flaky(), 2, lambda s: s, shuffle=False, cycle=False))


def test_process_shard_partitions_dataset():
    """ProcessShard slices must be disjoint, balanced, and cover the dataset."""
    from ctpa.data.datasets import ProcessShard

    data = list(range(10))
    shards = [ProcessShard(data, process_index=p, process_count=3)
              for p in range(3)]
    seen = []
    for s in shards:
        seen.extend(s[i] for i in range(len(s)))
    assert sorted(seen) == data                       # coverage, no overlap
    assert [len(s) for s in shards] == [4, 3, 3]      # balanced
    import pytest

    with pytest.raises(IndexError):
        shards[0][len(shards[0])]
    with pytest.raises(ValueError):
        ProcessShard(data, process_index=3, process_count=3)


def test_prefetch_process_local_assembles_global_batch():
    """process_local prefetch must build sharded global arrays from local rows
    (single-process: global == local, sharded over the data axis)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ctpa.core.config import MeshConfig
    from ctpa.core.mesh import DATA_AXIS, create_mesh
    from ctpa.data.prefetch import PrefetchIterator

    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    sh = NamedSharding(mesh, P(DATA_AXIS))
    batches = [{"x": np.arange(16, dtype=np.float32).reshape(8, 2) + i}
               for i in range(3)]
    it = PrefetchIterator(iter(batches), sharding=sh, process_local=True)
    got = list(it)
    assert len(got) == 3
    assert got[0]["x"].shape == (8, 2)
    assert got[0]["x"].sharding.spec == P(DATA_AXIS)
    np.testing.assert_array_equal(np.asarray(got[2]["x"]), batches[2]["x"])

    import pytest

    with pytest.raises(ValueError):
        PrefetchIterator(iter([]), sharding=None, process_local=True)
