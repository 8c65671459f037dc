"""VQGAN training CLI smoke: tiny config, 2 steps, checkpoint written and
resumable (script entry point for the reference's generative path,
ctvit.py:438-546, which has no runnable trainer there)."""

import numpy as np
import pytest

from ctpa.core.config import CTViTConfig


@pytest.mark.slow
def test_train_vqgan_cli_end_to_end(tmp_path):
    from ctpa.cli.train_vqgan import main

    vit = CTViTConfig.tiny()
    rng = np.random.default_rng(0)
    data = tmp_path / "vols"
    data.mkdir()
    for i in range(2):
        np.savez(data / f"v{i}.npz", arr_0=rng.normal(
            size=(vit.temporal_size, vit.image_size, vit.image_size)
        ).astype(np.float32))

    ckpt = str(tmp_path / "ckpts")
    rc = main(["--data-dir", str(data), "--tiny", "--batch-size", "1",
               "--num-steps", "2", "--save-every", "2", "--log-every", "1",
               "--checkpoint-dir", ckpt])
    assert rc == 0

    from ctpa.core.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt)
    assert mgr.latest_step() == 2

    # resume continues from the saved step
    rc = main(["--data-dir", str(data), "--tiny", "--batch-size", "1",
               "--num-steps", "3", "--save-every", "10", "--log-every", "1",
               "--checkpoint-dir", ckpt, "--resume"])
    assert rc == 0
    assert CheckpointManager(ckpt).latest_step() == 3


def test_volume_dataset_scans_dir(tmp_path):
    from ctpa.data.datasets import VolumeDataset

    rng = np.random.default_rng(1)
    (tmp_path / "sub").mkdir()
    np.savez(tmp_path / "a.npz", arr_0=rng.normal(size=(4, 8, 8)).astype(np.float32))
    np.savez(tmp_path / "sub" / "b.npz", arr_0=rng.normal(size=(4, 8, 8)).astype(np.float32))
    ds = VolumeDataset(str(tmp_path))
    assert len(ds) == 2
    assert ds[0].volume.shape == (4, 8, 8)
    with pytest.raises(FileNotFoundError):
        VolumeDataset(str(tmp_path / "empty"))
