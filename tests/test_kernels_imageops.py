"""Image-op kernels against the exact reference constants (FIXTURES.md §5)."""

from __future__ import annotations

import numpy as np

from ocr_service_spark.kernels import imageops


def test_invert_threshold_boundary():
    # reference common.py:14 — invert iff mean gray < 100
    for mean, expect in [(99, True), (100, False), (101, False)]:
        img = np.full((10, 10), mean, np.uint8)
        out, inverted = imageops.invert_if_dark(img)
        assert inverted is expect
        assert out[0, 0] == (255 - mean if expect else mean)


def test_order_corners_tl_tr_br_bl():
    # reference common.py:36-58 — sort by y, then x within top/bottom pairs
    pts = np.array([[90, 95], [10, 10], [85, 5], [5, 100]], np.float64)
    ordered = imageops.order_corners(pts)
    # top two by y: (85,5),(10,10) → by x: TL=(10,10), TR=(85,5);
    # bottom two by x: BL=(5,100), BR=(90,95)
    np.testing.assert_array_equal(
        ordered, [[10, 10], [85, 5], [90, 95], [5, 100]]
    )


def test_order_corners_axis_aligned():
    pts = np.array([[50, 50], [0, 0], [50, 0], [0, 50]], np.float64)
    ordered = imageops.order_corners(pts)
    np.testing.assert_array_equal(
        ordered, [[0, 0], [50, 0], [50, 50], [0, 50]]
    )


def test_warp_size_min_64_and_scale():
    # reference common.py:73-75 — dst = 1.5× max edge, min 64 px
    small = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float64)
    assert imageops.warp_size(small) == (64, 64)
    big = np.array([[0, 0], [100, 0], [100, 200], [0, 200]], np.float64)
    assert imageops.warp_size(big) == (150, 300)


def test_perspective_transform_identity():
    quad = np.array([[0, 0], [9, 0], [9, 9], [0, 9]], np.float64)
    h = imageops.perspective_transform(quad, quad)
    np.testing.assert_allclose(h, np.eye(3), atol=1e-9)


def test_warp_axis_aligned_crop_scales():
    img = np.zeros((100, 100), np.uint8)
    img[20:80, 10:90] = 200
    corners = np.array([[10, 20], [89, 20], [89, 79], [10, 79]], np.float64)
    warped = imageops.warp_perspective(img, corners)
    # all sampled pixels come from inside the bright quad
    assert warped.min() == 200
    assert warped.shape == (imageops.warp_size(corners)[1], imageops.warp_size(corners)[0])


def test_adaptive_threshold_is_binary_and_separates():
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(120, 5, (64, 64)), 0, 255).astype(np.uint8)
    img[30:34, :] = 20  # dark stroke
    out = imageops.adaptive_threshold(img)
    assert set(np.unique(out)) <= {0, 255}
    assert out[32, 32] == 0  # stroke below local mean - C
    assert out[5, 5] == 255


def test_minmax_normalize_range():
    img = np.array([[10, 20], [30, 40]], np.uint8)
    out = imageops.minmax_normalize(img)
    assert out.min() == 0 and out.max() == 255
    assert imageops.minmax_normalize(np.full((3, 3), 7, np.uint8)).max() == 0


def test_mask_bbox_corners():
    img = np.zeros((50, 50), np.uint8)
    img[10:20, 5:30] = 255
    corners = imageops.mask_bbox_corners(img)
    np.testing.assert_array_equal(corners, [[5, 10], [29, 10], [29, 19], [5, 19]])


def test_contrast_stretch_deterministic_and_clipped():
    img = np.array([[0, 128, 255]], np.uint8)
    out = imageops.contrast_stretch(img)
    assert out.dtype == np.uint8
    assert out[0, 0] == 0 and out[0, 2] == 255  # clipped at both ends
