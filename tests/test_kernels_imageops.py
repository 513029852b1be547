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


def test_gaussian_blur3_binomial_kernel():
    # cv2 ksize=3 sigma=0 → fixed [1,2,1]/4 separable kernel; the impulse
    # response of the 2-D filter is the outer product /16
    img = np.zeros((5, 5), np.uint8)
    img[2, 2] = 160
    out = imageops.gaussian_blur3(img)
    np.testing.assert_array_equal(
        out[1:4, 1:4], np.array([[10, 20, 10], [20, 40, 20], [10, 20, 10]])
    )


def test_gaussian_kernel1d_cv2_sigma_rule():
    # sigma = 0.3*((k-1)*0.5 - 1) + 0.8 → 2.6 for block 15, 5.0 for 31
    k15 = imageops._gaussian_kernel1d(15)
    assert abs(k15.sum() - 1.0) < 1e-12
    # symmetric, peaked at center
    np.testing.assert_allclose(k15, k15[::-1])
    assert k15.argmax() == 7
    # center weight for sigma=2.6: exp(0)/sum
    sigma = 0.3 * ((15 - 1) * 0.5 - 1.0) + 0.8
    assert abs(sigma - 2.6) < 1e-12


def test_adaptive_threshold_gaussian_is_binary_and_separates():
    # reference common.py:104-112 — Gaussian-weighted local threshold
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(120, 5, (64, 64)), 0, 255).astype(np.uint8)
    img[30:34, :] = 20  # dark stroke
    out = imageops.adaptive_threshold_gaussian(img)
    assert set(np.unique(out)) <= {0, 255}
    assert out[32, 32] == 0  # stroke below local mean - C
    assert out[5, 5] == 255


def test_adaptive_threshold_gaussian_aggressive_profile():
    # block 31, C 10 accepts pixels deeper below the local mean than C 5
    img = np.full((64, 64), 150, np.uint8)
    img[32, 32] = 143  # 7 below local mean: fails C 5, passes C 10
    gentle = imageops.adaptive_threshold_gaussian(img, 15, 5)
    aggressive = imageops.adaptive_threshold_gaussian(img, 31, 10)
    assert gentle[32, 32] == 0
    assert aggressive[32, 32] == 255


def test_morph_close_2x2_and_open_1x1():
    # close bridges a 1-px gap with cv2's (1,1)-anchored even kernel
    m = np.full((6, 6), 255, np.uint8)
    m[3, 3] = 0
    closed = imageops.morph_close_2x2(m)
    assert closed[3, 3] == 255
    # close is spatially UNSHIFTED (cv2 parity: dilate mirrors the
    # kernel, erode doesn't, so the two passes cancel): a lone white
    # pixel survives closing in place
    p = np.zeros((6, 6), np.uint8)
    p[2, 2] = 255
    np.testing.assert_array_equal(imageops.morph_close_2x2(p), p)
    # open with 1×1 kernel is the identity (aggressive profile no-op)
    rng = np.random.default_rng(1)
    x = (rng.random((8, 8)) > 0.5).astype(np.uint8) * 255
    np.testing.assert_array_equal(imageops.morph_open_1x1(x), x)


def test_preprocess_for_ocr_profiles_binary_output():
    rng = np.random.default_rng(2)
    img = np.clip(rng.normal(140, 20, (48, 48)), 0, 255).astype(np.uint8)
    for aggressive in (False, True):
        out = imageops.preprocess_for_ocr(img, aggressive)
        assert out.dtype == np.uint8
        assert set(np.unique(out)) <= {0, 255}


def test_minmax_normalize_range():
    img = np.array([[10, 20], [30, 40]], np.uint8)
    out = imageops.minmax_normalize(img)
    assert out.min() == 0 and out.max() == 255
    assert imageops.minmax_normalize(np.full((3, 3), 7, np.uint8)).max() == 0


def test_warp_cubic_identity_at_integer_coords():
    # at integer sample positions the Keys kernel weights are (0,1,0,0):
    # an axis-aligned unit-scale warp reproduces the crop exactly
    img = np.arange(100, dtype=np.uint8).reshape(10, 10) * 2
    # corners chosen so warp_size == crop size (9/1.5=6 → dst 9x9... use
    # a quad whose 1.5x size rounds to an integer mapping)
    corners = np.array([[0, 0], [9, 0], [9, 9], [0, 9]], np.float64)
    near = imageops.warp_perspective(img, corners, "nearest")
    cub = imageops.warp_perspective(img, corners, "cubic")
    assert near.shape == cub.shape
    # constant image → constant output under any interpolation
    flat = np.full((20, 20), 77, np.uint8)
    out = imageops.warp_perspective(flat, np.array([[2, 2], [17, 2], [17, 17], [2, 17]], np.float64), "cubic")
    assert out.min() == out.max() == 77


def test_cubic_weights_partition_of_unity():
    t = np.linspace(0, 1, 33, dtype=np.float32)
    w = imageops._cubic_weights(t)
    np.testing.assert_allclose(sum(w), np.ones_like(t), atol=1e-6)
    # t=0 → exactly (0,1,0,0)
    w0 = [float(x[0]) for x in w]
    np.testing.assert_allclose(w0, [0, 1, 0, 0], atol=1e-7)


def test_warp_cubic_preserves_linear_ramp():
    # cubic convolution reproduces linear functions exactly (Keys
    # property); a pure-scale warp of a horizontal ramp stays a ramp
    ramp = np.tile(np.arange(0, 200, 2, dtype=np.uint8), (50, 1))
    corners = np.array([[10, 10], [89, 10], [89, 39], [10, 39]], np.float64)
    out = imageops.warp_perspective(ramp, corners, "cubic")
    # every row identical and monotone non-decreasing
    assert (out == out[0]).all()
    assert (np.diff(out[0].astype(int)) >= 0).all()


def test_mask_bbox_corners():
    img = np.zeros((50, 50), np.uint8)
    img[10:20, 5:30] = 255
    corners = imageops.mask_bbox_corners(img)
    np.testing.assert_array_equal(corners, [[5, 10], [29, 10], [29, 19], [5, 19]])


