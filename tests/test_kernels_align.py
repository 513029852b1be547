"""Classic alignment chain P3-P8 against the exact reference constants
(reference services/aligner/src/services/aligner.py:232-408, common.py:21-33).

The flood fill is cross-validated against `flood_fill_reference`, the
verbatim per-pixel port of the reference deque BFS — the vectorized
version must agree bit-for-bit."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_service_spark.kernels import align


def _receipt(h=120, w=90, bg=60, fg=200, seed=7):
    """Dark background with a bright receipt block (aspect ~1.3)."""
    rng = np.random.default_rng(seed)
    img = rng.normal(bg, 8, (h, w)).clip(0, 255).astype(np.uint8)
    img[h // 6 : 5 * h // 6, w // 6 : 5 * w // 6] = (
        rng.normal(fg, 6, (5 * h // 6 - h // 6, 5 * w // 6 - w // 6))
        .clip(0, 255)
        .astype(np.uint8)
    )
    return img


# --- P3: CLAHE ----------------------------------------------------------------

def test_gaussian_blur5_binomial_kernel():
    # cv2 ksize=5 sigma=0 → fixed [1,4,6,4,1]/16; impulse response center
    # row is 160 * [1,4,6,4,1]*6/256 = [3.75, 15, 22.5, 15, 3.75] → rounded
    img = np.zeros((7, 7), np.uint8)
    img[3, 3] = 160
    out = align.gaussian_blur5(img)
    np.testing.assert_array_equal(out[3, 1:6], [4, 15, 23, 15, 4])
    assert out[3, 3] == 160 * 36 // 256 + (1 if (160 * 36) % 256 >= 128 else 0)


def test_clahe_improves_low_contrast():
    rng = np.random.default_rng(0)
    img = np.clip(rng.normal(128, 6, (64, 64)), 0, 255).astype(np.uint8)
    out = align.clahe(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert float(out.std()) > float(img.std())  # equalization spreads values
    # deterministic
    np.testing.assert_array_equal(out, align.clahe(img))


def test_clahe_preserves_gradient_trend():
    # each tile LUT is a scaled CDF (non-decreasing); across tile
    # boundaries bilinear blending allows small local dips only
    img = np.tile(np.linspace(50, 200, 64).astype(np.uint8), (64, 1))
    out = align.clahe(img)
    mid = out[32].astype(int)
    assert (np.diff(mid) >= -8).all()
    assert mid[-1] > mid[0] + 100  # global trend preserved


def test_preprocess_illumination_gain():
    # ×1.2 gain with saturation (common.py:33)
    img = np.full((16, 16), 128, np.uint8)
    out = align.preprocess_illumination(img)
    eq = align.clahe(align.gaussian_blur5(img))
    expect = np.clip(np.rint(eq.astype(np.float32) * 1.2), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


# --- P4: seed point -----------------------------------------------------------

def test_seed_candidates_and_homogeneity_pick():
    # flat patch at (w//3, h//3); noisy elsewhere → candidate 2 wins
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (90, 90)).astype(np.uint8)
    img[20:40, 20:40] = 128  # covers (30, 30) = (w//3, h//3) patch
    assert align.find_best_seed_point(img) == (30, 30)


def test_seed_first_candidate_wins_ties():
    # uniform image → all homogeneity equal → strict > keeps candidate 0
    img = np.full((60, 60), 99, np.uint8)
    assert align.find_best_seed_point(img) == (30, 30)  # center first


# --- P5: tolerance + flood fill ------------------------------------------------

def test_auto_tolerance_formula_and_clip():
    # tolerance = clip(13 + (255-brightness)*0.7 + variance*0.7, 10, 65)
    flat = np.full(49, 250.0, np.float64)
    assert align.compute_auto_tolerance(flat, 250.0) == pytest.approx(
        13 + 5 * 0.7
    )
    dark = np.full(49, 0.0, np.float64)
    assert align.compute_auto_tolerance(dark, 0.0) == 65.0  # clipped at max
    # variance term: mean |s - mean|
    s = np.array([90.0, 110.0] * 24 + [100.0])
    tol = align.compute_auto_tolerance(s, 100.0)
    expect = 13 + (255 - 100) * 0.7 + np.abs(s - 100).mean() * 0.7
    assert tol == pytest.approx(min(expect, 65.0))


@pytest.mark.parametrize("kind", ["receipt", "gradient", "noise"])
def test_flood_fill_matches_reference_bfs(kind):
    rng = np.random.default_rng(11)
    h, w = 80, 100
    if kind == "receipt":
        img = _receipt(h, w)
    elif kind == "gradient":
        img = (
            np.linspace(80, 200, w)[None, :] * np.ones((h, 1))
            + rng.normal(0, 15, (h, w))
        ).clip(0, 255).astype(np.uint8)
    else:
        img = rng.normal(150, 40, (h, w)).clip(0, 255).astype(np.uint8)
    seed = align.find_best_seed_point(img)
    fast = align.flood_fill(img, seed)
    ref = align.flood_fill_reference(img, seed)
    np.testing.assert_array_equal(fast, ref)


def test_flood_fill_matches_reference_large_frontier():
    # frontiers in the thousands exercise the speculative scan's grown
    # (4096-element) blocks and the r^-4095 closed-form magnitudes —
    # the small fuzz images never reach them
    rng = np.random.default_rng(99)
    img = rng.normal(190, 10, (400, 300)).clip(0, 255).astype(np.uint8)
    seed = align.find_best_seed_point(img)
    np.testing.assert_array_equal(
        align.flood_fill(img, seed), align.flood_fill_reference(img, seed)
    )


def test_flood_fill_confined_to_tolerance_region():
    img = _receipt()
    seed = align.find_best_seed_point(img)
    mask = align.flood_fill(img, seed)
    # fills the bright block, not the dark background
    assert mask[60, 45] == 255  # inside the receipt
    assert mask[2, 2] == 0  # dark corner


# --- P4/P5 on COLOR frames (reference 3-D color math, aligner.py:374-395) -----

def _color_receipt(h=80, w=100, seed=5):
    """Receipt-style BGR frame: dark bluish background, bright warm block."""
    rng = np.random.default_rng(seed)
    img = np.empty((h, w, 3), np.uint8)
    for c, (bg, fg) in enumerate([(70, 180), (55, 200), (50, 215)]):  # B, G, R
        ch = rng.normal(bg, 8, (h, w))
        ch[h // 6 : 5 * h // 6, w // 6 : 5 * w // 6] = rng.normal(
            fg, 6, (5 * h // 6 - h // 6, 5 * w // 6 - w // 6)
        )
        img[..., c] = ch.clip(0, 255).astype(np.uint8)
    return img


def test_color_tolerance_reference_formula():
    # brightness = Rec.601 over the mean color, variance = mean Euclidean
    # distance (aligner.py:391-395)
    samples = np.array([[100.0, 150.0, 200.0], [104.0, 150.0, 197.0]], np.float32)
    mean = samples.mean(axis=0)
    bright = mean[2] * 0.299 + mean[1] * 0.587 + mean[0] * 0.114
    var = float(np.mean(np.sqrt(((samples - mean) ** 2).sum(axis=1))))
    expect = np.clip(13 + (255 - bright) * 0.7 + var * 0.7, 10, 65)
    assert align.compute_auto_tolerance(samples, mean) == pytest.approx(expect)


@pytest.mark.parametrize("seed_val", [3, 17, 29])
def test_color_flood_fill_matches_reference_bfs(seed_val):
    img = _color_receipt(seed=seed_val)
    seed = align.find_best_seed_point(img)
    np.testing.assert_array_equal(
        align.flood_fill(img, seed), align.flood_fill_reference(img, seed)
    )


def test_color_flood_fill_sees_equal_luminance_hue_boundary():
    """The regression the luminance specialization could never catch:
    two regions with IDENTICAL Rec.601 gray value but a large BGR
    Euclidean distance. The gray flood fill floods straight through;
    the color path must stop at the hue boundary (reference
    _color_distance, aligner.py:386-389)."""
    from ocr_service_spark.kernels.colorspace import bgr_to_gray

    a = np.array([128, 128, 128], np.uint8)  # gray
    b = np.array([23, 128, 168], np.uint8)  # same luminance, strong tint
    img = np.tile(a, (60, 80, 1)).astype(np.uint8)
    img[15:45, 20:60] = b
    gray = bgr_to_gray(img)
    assert gray[30, 40] == gray[2, 2]  # truly equal-luminance
    seed = (5, 5)  # in the outer gray region
    color_mask = align.flood_fill(img, seed)
    gray_mask = align.flood_fill(gray, seed)
    assert gray_mask[30, 40] == 255  # luminance view floods through
    assert color_mask[30, 40] == 0  # color view stops at the hue boundary
    assert color_mask[2, 2] == 255  # but does fill the seed region
    np.testing.assert_array_equal(
        color_mask, align.flood_fill_reference(img, seed)
    )


# --- binary morphology --------------------------------------------------------

def test_binary_close_fills_hole_open_removes_speck():
    m = np.zeros((30, 30), np.uint8)
    m[5:25, 5:25] = 255
    m[12, 12] = 0
    assert align.binary_close(m, 5)[12, 12] == 255
    speck = np.zeros((30, 30), np.uint8)
    speck[15, 15] = 255
    assert align.binary_open(speck, 5).sum() == 0
    # open preserves a solid block larger than the kernel
    solid = np.zeros((30, 30), np.uint8)
    solid[5:25, 5:25] = 255
    assert (align.binary_open(solid, 5)[8:22, 8:22] == 255).all()


# --- P6/P7: contours → polygon --------------------------------------------------

def test_contour_trace_rectangle_geometry():
    m = np.zeros((40, 50), np.uint8)
    m[10:30, 5:45] = 255
    (contour,) = align.find_external_contours(m)
    assert align.bounding_rect(contour) == (5, 10, 40, 20)
    # Green's-formula area of the boundary polygon: 39 * 19
    assert align.contour_area(contour) == pytest.approx(39 * 19)
    assert align.arc_length(contour) == pytest.approx(2 * (39 + 19))


def test_contours_multiple_components():
    m = np.zeros((40, 60), np.uint8)
    m[5:15, 5:15] = 255
    m[25:35, 40:55] = 255
    cs = align.find_external_contours(m)
    assert len(cs) == 2


def test_approx_poly_dp_rectangle_to_4():
    m = np.zeros((40, 50), np.uint8)
    m[10:30, 5:45] = 255
    (contour,) = align.find_external_contours(m)
    eps = 0.02 * align.arc_length(contour)
    poly = align.approx_poly_dp(contour, eps)
    assert len(poly) == 4
    got = {tuple(p) for p in poly}
    assert got == {(5, 10), (44, 10), (44, 29), (5, 29)}


def test_aspect_filter_boundaries_and_fallback():
    # 1 < h/w < 6 strict (aligner.py:338); falls back to all when none pass
    def rect_contour(w, h):
        m = np.zeros((h + 10, w + 10), np.uint8)
        m[5 : 5 + h, 5 : 5 + w] = 255
        return align.find_external_contours(m)[0]

    tall = rect_contour(10, 30)  # aspect 3 → kept
    square = rect_contour(10, 10)  # aspect 1.0 → excluded (strict)
    kept = align.filter_receipt_contours([tall, square])
    assert len(kept) == 1 and align.bounding_rect(kept[0])[3] == 30
    # none pass → all returned
    assert len(align.filter_receipt_contours([square])) == 1


def test_filter_sharp_angles_drops_spike():
    # a long thin spike makes a < 15° vertex; removing it keeps >= 4 pts
    poly = np.array(
        [[0, 0], [50, 0], [50, 30], [52, 100], [48, 30], [0, 30]], np.float64
    )
    out = align.filter_sharp_angles(poly, 15.0)
    assert len(out) < len(poly)
    # keep-original rule when fewer than 4 survive
    tri = np.array([[0, 0], [100, 1], [0, 2]], np.float64)
    np.testing.assert_array_equal(align.filter_sharp_angles(tri, 15.0), tri)


# --- P8: minAreaRect ------------------------------------------------------------

def test_min_area_rect_recovers_rotated_rectangle():
    th = np.deg2rad(25)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    base = np.array([[0, 0], [80, 0], [80, 30], [0, 30]], np.float64)
    pts = base @ rot.T + [40, 60]
    box = align.min_area_rect_points(pts)
    # same vertex set up to order/rounding
    def key(arr):
        return sorted((round(x, 6), round(y, 6)) for x, y in arr)

    assert key(box) == key(pts)


def test_min_area_rect_empty_raises():
    with pytest.raises(ValueError):
        align.min_area_rect_points(np.empty((0, 2)))


def test_ensure_receipt_shape_bbox_path():
    mask = np.zeros((30, 40), np.uint8)
    mask[10:20, 5:25] = 255
    poly = np.array([[1.0, 1.0], [2.0, 2.0]])  # < 4 points
    out = align.ensure_receipt_shape(poly, mask)
    assert len(out) == 4
    xs, ys = out[:, 0], out[:, 1]
    assert xs.min() == pytest.approx(5) and xs.max() == pytest.approx(24)
    assert ys.min() == pytest.approx(10) and ys.max() == pytest.approx(19)
    # >= 4 points → unchanged
    quad = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float64)
    np.testing.assert_array_equal(align.ensure_receipt_shape(quad, mask), quad)


# --- full chain -----------------------------------------------------------------

def test_classic_align_corners_recovers_receipt_block():
    img = _receipt(120, 90)
    corners = align.classic_align_corners(img)
    assert corners.shape == (4, 2)
    xs, ys = corners[:, 0], corners[:, 1]
    # the bright block spans x 15..74, y 20..99 (±morphology growth)
    assert 10 <= xs.min() <= 20 and 69 <= xs.max() <= 80
    assert 15 <= ys.min() <= 25 and 94 <= ys.max() <= 104


def test_classic_align_partition_invariant():
    # pure function: identical output on repeated calls
    img = _receipt(100, 80, seed=13)
    a = align.classic_align_corners(img)
    b = align.classic_align_corners(img)
    np.testing.assert_array_equal(a, b)


def test_gaussian_blur5_tiling_invariant():
    """The row-tiled blur must be byte-identical to the straightforward
    full-frame separable form, across sizes around/below/above the block
    boundary and odd shapes."""
    import numpy as np

    from ocr_service_spark.kernels.align import gaussian_blur5

    def reference(img):
        k = np.array([1, 4, 6, 4, 1], dtype=np.int32)
        p = np.pad(img.astype(np.int32), 2, mode="reflect")
        rows = sum(k[i] * p[:, i : i + img.shape[1]] for i in range(5))
        both = sum(k[i] * rows[i : i + img.shape[0], :] for i in range(5))
        return ((both + 128) >> 8).astype(np.uint8)

    rng = np.random.default_rng(11)
    for h, w in [(8, 8), (9, 33), (40, 17), (200, 301), (1030, 7), (3, 5), (517, 640)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        np.testing.assert_array_equal(gaussian_blur5(img), reference(img), err_msg=f"{h}x{w}")


def test_clahe_tiling_invariant():
    """The row-tiled CLAHE interpolation must equal the full-frame
    gather/blend byte-for-byte (same float32 math on the same values)."""
    import numpy as np

    from ocr_service_spark.kernels.align import clahe

    def reference(img, clip_limit=1.5, grid=8):
        h, w = img.shape
        ph, pw = -(-h // grid) * grid, -(-w // grid) * grid
        padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="reflect")
        th, tw = ph // grid, pw // grid
        tile_area = th * tw
        clip = max(int(clip_limit * tile_area / 256), 1)
        luts = np.empty((grid, grid, 256), dtype=np.uint8)
        tiles = padded.reshape(grid, th, grid, tw)
        scale = 255.0 / tile_area
        for ty in range(grid):
            for tx in range(grid):
                hist = np.bincount(tiles[ty, :, tx, :].ravel(), minlength=256)
                over = hist > clip
                clipped = int((hist[over] - clip).sum())
                hist = np.minimum(hist, clip)
                hist += clipped // 256
                residual = clipped % 256
                if residual:
                    step = max(256 // residual, 1)
                    idx = np.arange(0, residual * step, step)[:residual]
                    hist[idx[idx < 256]] += 1
                luts[ty, tx] = np.clip(np.rint(hist.cumsum() * scale), 0, 255).astype(np.uint8)
        ys = np.arange(ph, dtype=np.float32)
        xs = np.arange(pw, dtype=np.float32)
        tyf = (ys + 0.5) / th - 0.5
        txf = (xs + 0.5) / tw - 0.5
        ty1 = np.clip(np.floor(tyf).astype(np.int32), 0, grid - 1)
        tx1 = np.clip(np.floor(txf).astype(np.int32), 0, grid - 1)
        ty2 = np.minimum(ty1 + 1, grid - 1)
        tx2 = np.minimum(tx1 + 1, grid - 1)
        ya = np.clip(tyf - np.floor(tyf), 0.0, 1.0).astype(np.float32)[:, None]
        xa = np.clip(txf - np.floor(txf), 0.0, 1.0).astype(np.float32)[None, :]
        v = padded
        v11 = luts[ty1[:, None], tx1[None, :], v].astype(np.float32)
        v12 = luts[ty1[:, None], tx2[None, :], v].astype(np.float32)
        v21 = luts[ty2[:, None], tx1[None, :], v].astype(np.float32)
        v22 = luts[ty2[:, None], tx2[None, :], v].astype(np.float32)
        top = v11 * (1.0 - xa) + v12 * xa
        bot = v21 * (1.0 - xa) + v22 * xa
        out = top * (1.0 - ya[: len(ys)]) + bot * ya[: len(ys)]
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)[:h, :w]

    rng = np.random.default_rng(13)
    for h, w in [(64, 64), (100, 130), (333, 250), (961, 720)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        np.testing.assert_array_equal(clahe(img), reference(img), err_msg=f"{h}x{w}")
