"""Long-video ingest: MP4 decode path end-to-end."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mast3r_slam_tpu.data.dataloader import MP4Dataset, load_dataset


@pytest.fixture(scope="module")
def mp4_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48)
    )
    rng = np.random.default_rng(0)
    base = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    for i in range(24):
        frame = np.roll(base, i * 2, axis=1)
        w.write(frame)
    w.release()
    return path


def test_mp4_sequential_decode(mp4_path):
    ds = MP4Dataset(mp4_path)
    assert len(ds) == 24
    t0, img0 = ds[0]
    assert img0.shape == (48, 64, 3) and img0.dtype == np.float32
    assert 0.0 <= img0.min() and img0.max() <= 1.0
    # sequential reads (no seek) and a random seek both work
    _, img1 = ds[1]
    _, img5 = ds[5]
    assert not np.allclose(img1, img5)


def test_mp4_subsample_and_sniffing(mp4_path):
    ds = load_dataset(str(mp4_path))
    assert isinstance(ds, MP4Dataset)
    ds.subsample(4)
    assert len(ds) == 6
    t, img = ds[2]
    assert float(t) == pytest.approx(8 / 30.0, abs=1e-6)
