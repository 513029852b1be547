"""Numpy-only image preprocessing ops (the aligner's algorithmic core).

Deterministic reimplementations of the reference aligner's preprocessing
semantics (SURVEY.md §2.2) without cv2 (not in this container):

- dark-receipt inversion   — reference services/aligner/src/services/common.py:9-18
- illumination/contrast    — common.py:21-33 (CLAHE step approximated by a
                             deterministic global contrast stretch; same
                             ×1.2 contrast gain)
- mask → bbox corners      — the `_ensure_receipt_shape` bounding-box path,
                             aligner.py:342-351 (the cv2 contour/minAreaRect
                             chain P4-P8 needs cv2; the bbox fallback is the
                             reference's own degenerate path and is exact)
- corner ordering          — common.py:36-58 (sort by y, split top/bottom,
                             sort each by x → TL,TR,BR,BL)
- perspective warp         — common.py:61-95 (dst = 1.5× max edge, min 64 px;
                             homography solved directly; nearest sampling
                             with border-replicate)
- OCR binarization         — common.py:98-118 (adaptive mean threshold,
                             block 15, C 5, then min-max normalize)

All functions take/return uint8 grayscale ndarrays and are pure.
"""

from __future__ import annotations

import numpy as np

from ..config import (
    BINARIZE_BLOCK,
    BINARIZE_C,
    DARK_INVERT_MEAN_THRESHOLD,
    WARP_MIN_SIZE,
    WARP_SCALE,
)


def downscale_max_side(img: np.ndarray, limit: int = 960) -> np.ndarray:
    """Cap processing resolution (PaddleOCR's det_limit_side_len=960
    convention: detection never runs above ~1k px per side). Deterministic
    strided nearest sampling; keeps every later temporary cache-sized,
    which is what lets 32 concurrent workers scale instead of thrashing
    the allocator/memory bus on 30 MB frames."""
    h, w = img.shape
    side = max(h, w)
    if side <= limit:
        return img
    step = -(-side // limit)  # ceil → result ≤ limit
    return np.ascontiguousarray(img[::step, ::step])


def invert_if_dark(img: np.ndarray) -> tuple[np.ndarray, bool]:
    """If mean gray < 100 → invert (common.py:9-18)."""
    if float(img.mean()) < DARK_INVERT_MEAN_THRESHOLD:
        return (255 - img), True
    return img, False


def contrast_stretch(img: np.ndarray, gain: float = 1.2) -> np.ndarray:
    """Deterministic illumination normalization (common.py:21-33 analog):
    center on the mean, apply ×1.2 contrast gain, clip to [0,255].

    float32 arithmetic throughout imageops: these kernels are memory-
    bandwidth-bound on receipt-photo-sized frames (measured: float64
    temporaries made the UDF stage ~4× slower than the serial kernel under
    task concurrency), and 24-bit mantissas are exact for 8-bit pixel math
    at these magnitudes."""
    f = img.astype(np.float32)
    mean = np.float32(f.mean())
    out = (f - mean) * np.float32(gain) + mean
    return np.clip(np.rint(out, out=out), 0, 255).astype(np.uint8)


def mask_bbox_corners(img: np.ndarray, thresh: float | None = None) -> np.ndarray:
    """Bounding-box corners of the bright foreground region
    (`_ensure_receipt_shape` path, aligner.py:342-351). Threshold defaults
    to the image mean — deterministic foreground/background split."""
    t = float(img.mean()) if thresh is None else thresh
    ys, xs = np.nonzero(img > t)
    if len(xs) == 0:
        h, w = img.shape
        return np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64)
    x0, x1 = float(xs.min()), float(xs.max())
    y0, y1 = float(ys.min()), float(ys.max())
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)


def order_corners(pts: np.ndarray) -> np.ndarray:
    """Order 4 points TL,TR,BR,BL (common.py:36-58: sort by y; top pair and
    bottom pair each sorted by x)."""
    pts = np.asarray(pts, dtype=np.float64).reshape(4, 2)
    by_y = pts[np.argsort(pts[:, 1], kind="stable")]
    top = by_y[:2][np.argsort(by_y[:2, 0], kind="stable")]
    bottom = by_y[2:][np.argsort(by_y[2:, 0], kind="stable")]
    tl, tr = top
    bl, br = bottom
    return np.array([tl, tr, br, bl], np.float64)


def perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 homography mapping src→dst quads (cv2.getPerspectiveTransform
    equivalent, solved as the standard 8×8 linear system)."""
    src = np.asarray(src, np.float64).reshape(4, 2)
    dst = np.asarray(dst, np.float64).reshape(4, 2)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i], b[2 * i + 1] = u, v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_size(corners: np.ndarray) -> tuple[int, int]:
    """Destination size: 1.5× the max edge length, min 64 px (common.py:73-75)."""
    tl, tr, br, bl = corners
    width = max(np.linalg.norm(tr - tl), np.linalg.norm(br - bl))
    height = max(np.linalg.norm(bl - tl), np.linalg.norm(br - tr))
    w = max(WARP_MIN_SIZE, int(round(width * WARP_SCALE)))
    h = max(WARP_MIN_SIZE, int(round(height * WARP_SCALE)))
    return w, h


def warp_perspective(img: np.ndarray, corners: np.ndarray) -> np.ndarray:
    """Deskew: warp the quad `corners` (TL,TR,BR,BL) to an upright
    rectangle (common.py:61-95). Inverse-map + nearest-neighbor sampling
    with border-replicate — deterministic across platforms (the reference
    uses INTER_CUBIC; nearest keeps bit-determinism without cv2)."""
    corners = np.asarray(corners, np.float64).reshape(4, 2)
    w, h = warp_size(corners)
    dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64)
    m = perspective_transform(dst, corners).astype(np.float32)  # dst → src
    # homogeneous coords are affine in (x, y): broadcast a row vector
    # against a column vector instead of materializing meshgrid + stack +
    # einsum temporaries (those cost ~1.5 GB of traffic per large frame)
    xs = np.arange(w, dtype=np.float32)[None, :]
    ys = np.arange(h, dtype=np.float32)[:, None]
    den = m[2, 0] * xs + (m[2, 1] * ys + m[2, 2])
    sx = (m[0, 0] * xs + (m[0, 1] * ys + m[0, 2])) / den
    sy = (m[1, 0] * xs + (m[1, 1] * ys + m[1, 2])) / den
    ih, iw = img.shape
    # NaN/inf guard: a near-degenerate quad puts the horizon line (den≈0)
    # inside the frame; clip handles ±inf but NaN would survive into the
    # int cast as INT_MIN
    np.nan_to_num(sx, copy=False, nan=0.0)
    np.nan_to_num(sy, copy=False, nan=0.0)
    sxi = np.clip(np.rint(sx, out=sx), 0, iw - 1).astype(np.int32)  # border replicate
    syi = np.clip(np.rint(sy, out=sy), 0, ih - 1).astype(np.int32)
    return img[syi, sxi]


def _box_sum(img_u8: np.ndarray, block: int) -> np.ndarray:
    """Local block×block box-filter SUM via an int32 integral image
    (edge-replicated), O(1) per pixel and exact: the processing-
    resolution cap (downscale_max_side, max side 960 → warp dst sides ≤ ~2100) bounds
    the total integral at 255·(2100·2100) ≈ 1.1e9 < 2^31. int32 halves the traffic of an int64
    integral image — this op is pure memory streaming."""
    r = block // 2
    padded = np.pad(img_u8, r + 1, mode="edge")
    ii = padded.astype(np.int32).cumsum(axis=0, dtype=np.int32).cumsum(
        axis=1, dtype=np.int32
    )
    h, w = img_u8.shape
    size = 2 * r + 1
    a = ii[size:, size:][:h, :w]
    b = ii[:h, size:][:, :w]
    c = ii[size:, :w][:h, :]
    d = ii[:h, :w]
    return (a - b) - (c - d)


def adaptive_threshold(
    img: np.ndarray, block: int = BINARIZE_BLOCK, c: float = BINARIZE_C
) -> np.ndarray:
    """Adaptive mean threshold: pixel > local_mean - C → 255 else 0
    (common.py:107-113, gentle profile block 15 / C 5).

    Integer formulation: pixel > sum/n² - C  ⟺  pixel·n² > sum - C·n²,
    exact and temporaries-light."""
    size = 2 * (block // 2) + 1
    n2 = size * size
    local_sum = _box_sum(img, block)
    lhs = img.astype(np.int32) * np.int32(n2)
    return ((lhs > local_sum - np.int32(round(c * n2))) * np.uint8(255)).astype(
        np.uint8
    )


def minmax_normalize(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0,255] (common.py:116-118)."""
    lo, hi = int(img.min()), int(img.max())
    if hi <= lo:
        return np.zeros_like(img)
    f = img.astype(np.float32)
    out = (f - np.float32(lo)) * (255.0 / (hi - lo))
    return np.rint(out, out=out).astype(np.uint8)


def preprocess_for_ocr(img: np.ndarray) -> np.ndarray:
    """Full OCR binarization chain (common.py:98-118 semantics)."""
    return minmax_normalize(adaptive_threshold(img))
