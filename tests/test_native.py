"""Native preprocessing library vs the PIL reference path."""

import numpy as np
import pytest

from mast3r_slam_tpu.utils import native
from mast3r_slam_tpu.utils.image import resize_img

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (make -C native)"
)


def test_resize_matches_pil_closely(rng):
    img = rng.random((480, 640, 3)).astype(np.float32)
    # smooth it so resamplers agree away from aliasing limits
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, sigma=(3, 3, 0))
    img = (img - img.min()) / (img.max() - img.min())

    ref = resize_img(img, 512)
    got = native.resize_img_native(img, 512)

    assert got["img"].shape == ref["img"].shape
    np.testing.assert_array_equal(got["true_shape"], ref["true_shape"])
    # PIL uses 8-bit fixed-point filter coefficients; allow small deviation
    diff = np.abs(got["img"] - ref["img"])
    assert np.percentile(diff, 99) < 0.02, np.percentile(diff, 99)
    assert diff.mean() < 0.005, diff.mean()


def test_resize_preserves_constant():
    img = np.full((480, 640, 3), 0.25, dtype=np.float32)
    got = native.resize_img_native(img, 512)
    # uint8 conversion truncates (matches the PIL path's np.uint8 cast)
    expect = (np.floor(0.25 * 255) / 255 - 0.5) / 0.5
    np.testing.assert_allclose(got["img"], expect, atol=1 / 255 + 1e-6)


def test_remap_matches_cv2(rng):
    import cv2

    img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
    H, W = img.shape[:2]
    mapx = (
        np.tile(np.arange(W, dtype=np.float32), (H, 1))
        + rng.normal(size=(H, W)).astype(np.float32)
    )
    mapy = (
        np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W))
        + rng.normal(size=(H, W)).astype(np.float32)
    )
    ref = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
    got = native.remap_native(img, mapx, mapy)
    # borders differ (cv2 constant-extends); compare interior
    diff = np.abs(ref[2:-2, 2:-2].astype(int) - got[2:-2, 2:-2].astype(int))
    assert np.percentile(diff, 99) <= 1.0, np.percentile(diff, 99)
