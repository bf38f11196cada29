"""CLI smoke: drive ``slam.run.main`` exactly as a user would.

Covers the argparse surface (reference main.py:153-158 flag parity plus the
TPU-build extras) end-to-end: RGB-folder ingest, the tiny random-weight
trunk, ``--set`` dotted config overrides, and the exported artifacts.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def rgb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rgbseq")
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(96, 128, 3)).astype(np.uint8)
    for i in range(4):
        cv2.imwrite(str(d / f"{i:04d}.png"), np.roll(base, i * 3, axis=1))
    return d


def test_cli_end_to_end_with_set_overrides(rgb_dir, tmp_path, monkeypatch):
    from mast3r_slam_tpu.slam import run as run_mod

    monkeypatch.chdir(tmp_path)  # logs/ land under the tmp dir

    seen = {}
    orig_build = run_mod.build_slam

    def spy_build(cfg, *a, **kw):
        seen["cfg"] = cfg
        return orig_build(cfg, *a, **kw)

    monkeypatch.setattr(run_mod, "build_slam", spy_build)
    run_mod.main([
        "--dataset", str(rgb_dir),
        "--config", "base",
        "--model-preset", "tiny",
        "--save-as", "cli_smoke",
        "--no-viz",
        "--set", "tracking.filtering_mode=best_score",
        "--set", "matching.max_iter=4",
    ])

    # --set overrides reached the engine config with YAML scalar typing
    assert seen["cfg"]["tracking"]["filtering_mode"] == "best_score"
    assert seen["cfg"]["matching"]["max_iter"] == 4

    out = tmp_path / "logs" / "cli_smoke"
    traj = out / f"{rgb_dir.name}.txt"
    assert traj.is_file(), sorted(os.listdir(out))
    lines = traj.read_text().strip().splitlines()
    assert lines and all(len(l.split()) == 8 for l in lines)  # TUM format


def test_cli_set_rejects_malformed(rgb_dir):
    from mast3r_slam_tpu.slam import run as run_mod

    with pytest.raises(SystemExit):
        run_mod.main([
            "--dataset", str(rgb_dir),
            "--set", "no_equals_sign",
        ])
