"""Numpy-only image preprocessing ops (the aligner's algorithmic core).

Deterministic reimplementations of the reference aligner's preprocessing
semantics (SURVEY.md §2.2) without cv2 (not in this container):

- dark-receipt inversion   — reference services/aligner/src/services/common.py:9-18
- mask → bbox corners      — the `_ensure_receipt_shape` bounding-box path,
                             aligner.py:342-351, used here as the in-process
                             P14 local fallback when the classic chain
                             (kernels/align.py, P3-P8) raises
- corner ordering          — common.py:36-58 (sort by y, split top/bottom,
                             sort each by x → TL,TR,BR,BL)
- perspective warp         — common.py:61-95 (dst = 1.5× max edge, min 64 px;
                             homography solved directly; nearest sampling
                             with border-replicate)
- OCR binarization         — common.py:98-118 (3×3 Gaussian blur →
                             Gaussian-adaptive threshold, gentle block 15
                             C 5 + close 2×2 / aggressive block 31 C 10 +
                             open 1×1 → min-max normalize)

The CLAHE illumination chain (P3) lives with the rest of the classic
aligner in kernels/align.py. All functions take/return uint8 grayscale
ndarrays and are pure.
"""

from __future__ import annotations

import numpy as np

from ..config import (
    BINARIZE_BLOCK,
    BINARIZE_BLOCK_AGGRESSIVE,
    BINARIZE_C,
    BINARIZE_C_AGGRESSIVE,
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
    h, w = img.shape[:2]  # 2-D gray or 3-D BGR (channels kept in lockstep)
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


_CUBIC_A = -0.75  # cv2's bicubic coefficient (BICUBIC alpha)


def _cubic_weights(t: np.ndarray) -> tuple[np.ndarray, ...]:
    """Cubic-convolution weights for the 4 samples at offsets -1..2 of a
    fractional position t ∈ [0,1) (Keys kernel, a = -0.75 as in cv2's
    interpolateCubic)."""
    a = _CUBIC_A
    w0 = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w1 = ((a + 2) * t - (a + 3)) * t * t + 1
    w2 = ((a + 2) * (1 - t) - (a + 3)) * (1 - t) * (1 - t) + 1
    w3 = 1.0 - w0 - w1 - w2  # weights of the Keys kernel sum to 1 exactly
    return w0, w1, w2, w3


def warp_perspective(
    img: np.ndarray, corners: np.ndarray, interp: str = "nearest"
) -> np.ndarray:
    """Deskew: warp the quad `corners` (TL,TR,BR,BL) to an upright
    rectangle (common.py:61-95). Inverse-map with border-replicate.

    interp='nearest' (default): one gather per pixel — the fast path,
    and pixel values are exactly source values (a documented tradeoff vs
    the reference's INTER_CUBIC). interp='cubic': 4×4 cubic convolution
    (Keys a=-0.75, cv2's kernel), matching the reference's resampling at
    ~8× the sampling cost; select via ExtractConfig.warp_interp."""
    corners = np.asarray(corners, np.float64).reshape(4, 2)
    w, h = warp_size(corners)
    dst = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64)
    m = perspective_transform(dst, corners).astype(np.float32)  # dst → src
    ih, iw = img.shape
    out = np.empty((h, w), dtype=img.dtype)
    # homogeneous coords are affine in (x, y): broadcast a row vector
    # against a column vector instead of materializing meshgrid + stack +
    # einsum temporaries. ROW-TILED so the coordinate buffers stay
    # L2-resident (full-frame f32 sx/sy/den cost ~25 MB of DRAM traffic
    # per receipt-photo frame — measured in the 32-worker scaling cliff).
    xs = np.arange(w, dtype=np.float32)[None, :]
    tile = max(32, (1 << 20) // (4 * w))
    for r0 in range(0, h, tile):
        r1 = min(r0 + tile, h)
        ys = np.arange(r0, r1, dtype=np.float32)[:, None]
        den = m[2, 0] * xs + (m[2, 1] * ys + m[2, 2])
        with np.errstate(divide="ignore", invalid="ignore"):
            # den==0 (horizon line of a degenerate quad) is handled by
            # the NaN/clip guard below; silence the expected warnings
            sx = (m[0, 0] * xs + (m[0, 1] * ys + m[0, 2])) / den
            sy = (m[1, 0] * xs + (m[1, 1] * ys + m[1, 2])) / den
        # NaN/inf guard: a near-degenerate quad puts the horizon line
        # (den≈0) inside the frame; clip handles ±inf but NaN would
        # survive into the int cast as INT_MIN
        np.nan_to_num(sx, copy=False, nan=0.0)
        np.nan_to_num(sy, copy=False, nan=0.0)
        if interp == "cubic":
            fx0 = np.floor(sx)
            fy0 = np.floor(sy)
            tx = (sx - fx0).astype(np.float32)
            ty = (sy - fy0).astype(np.float32)
            x0 = fx0.astype(np.int32)
            y0 = fy0.astype(np.int32)
            wx = _cubic_weights(tx)
            wy = _cubic_weights(ty)
            acc = np.zeros(sx.shape, dtype=np.float32)
            row = np.empty(sx.shape, dtype=np.float32)
            for dy in range(4):
                yi = np.clip(y0 + (dy - 1), 0, ih - 1)
                np.multiply(
                    img[yi, np.clip(x0 - 1, 0, iw - 1)], wx[0], out=row
                )
                for dx in range(1, 4):
                    xi = np.clip(x0 + (dx - 1), 0, iw - 1)
                    row += wx[dx] * img[yi, xi]
                acc += wy[dy] * row
            out[r0:r1] = np.clip(np.rint(acc, out=acc), 0, 255).astype(img.dtype)
        else:
            sxi = np.clip(np.rint(sx, out=sx), 0, iw - 1).astype(np.int32)
            syi = np.clip(np.rint(sy, out=sy), 0, ih - 1).astype(np.int32)
            out[r0:r1] = img[syi, sxi]  # border replicate via the clip
    return out


def gaussian_blur3(img: np.ndarray) -> np.ndarray:
    """3×3 Gaussian blur (common.py:101). cv2 with sigma=0 and ksize 3
    uses the fixed binomial kernel [1,2,1]/4; separable integer
    arithmetic with round-half-up and reflect-101 borders matches it."""
    # uint16 arithmetic: max accumulator value is 255·16 = 4080, and the
    # halved temporary traffic matters at 32 concurrent workers
    h, w = img.shape
    p = np.pad(img, 1, mode="reflect").astype(np.uint16)
    rows = p[:, 0:w] + 2 * p[:, 1 : w + 1] + p[:, 2 : w + 2]
    both = rows[0:h, :] + 2 * rows[1 : h + 1, :] + rows[2 : h + 2, :]
    both += 8
    return (both >> 4).astype(np.uint8)


def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    """cv2.getGaussianKernel with sigma=0 for ksize > 7:
    sigma = 0.3·((ksize-1)·0.5 - 1) + 0.8, normalized exp kernel."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def adaptive_threshold_gaussian(
    img: np.ndarray, block: int = BINARIZE_BLOCK, c: float = BINARIZE_C
) -> np.ndarray:
    """Gaussian-weighted adaptive threshold (ADAPTIVE_THRESH_GAUSSIAN_C,
    common.py:104-112): T(x,y) = gaussian-weighted local mean − C over a
    block×block window (replicate border), dst = 255 where src > T.
    Matches cv2's structure — the local mean is rounded to uint8 before
    the integer comparison; the separable convolution runs in float64
    (cv2 uses fixed point — documented determinism tradeoff)."""
    # float32 separable conv, ROW-TILED so the working set stays in each
    # core's private L2 (same device as neural._conv3): a full-frame
    # separable pass streams ~240 B/px of DRAM traffic per warped frame
    # (≈3 MPx at the warp's 1.5× upscale) and saturates memory bandwidth
    # under 32 concurrent workers — measured as the 16→32 scaling
    # cliff. Tiling re-computes the halo rows (~1.2× arithmetic) but
    # cuts traffic to ~read-once/write-once. float32 is exact to far
    # below the 1/2-ulp of the uint8 rounding for 8-bit pixel sums.
    k = _gaussian_kernel1d(block).astype(np.float32)
    r = block // 2
    h, w = img.shape
    p = np.pad(img, r, mode="edge")  # BORDER_REPLICATE, uint8 (1 B/px)
    out = np.empty((h, w), dtype=np.uint8)
    src = np.int16(round(c))
    tile = max(32, (1 << 20) // (4 * (w + 2 * r)))  # ~1 MiB of f32 rows
    rows_buf = np.empty((tile + 2 * r, w), dtype=np.float32)
    for r0 in range(0, h, tile):
        r1 = min(r0 + tile, h)
        nr = r1 - r0
        # row pass over the tile + halo (input rows r0 .. r1+2r of p)
        pr = p[r0 : r1 + 2 * r].astype(np.float32)
        buf = rows_buf[: nr + 2 * r]
        np.multiply(pr[:, 0:w], k[0], out=buf)
        for i in range(1, block):
            buf += k[i] * pr[:, i : i + w]
        # column pass into the output tile
        mean = k[0] * buf[0:nr]
        for i in range(1, block):
            mean += k[i] * buf[i : i + nr]
        mean_u8 = np.clip(np.rint(mean, out=mean), 0, 255).astype(np.int16)
        np.multiply(
            img[r0:r1].astype(np.int16) > mean_u8 - src,
            np.uint8(255),
            out=out[r0:r1],
            casting="unsafe",
        )
    return out


def _morph2x2(mask: np.ndarray, op: str) -> np.ndarray:
    """2×2 rect-kernel dilate/erode with cv2's default even-kernel anchor
    (ksize/2 = (1,1)) and border values (-inf for dilate, +inf for erode
    → pad 0 / 255). Per the OpenCV erode/dilate formulas the kernel is
    MIRRORED for dilation: dilate offsets are {anchor−x'} = {0,1}²,
    erode offsets are {x'−anchor} = {−1,0}² — so close = dilate∘erode is
    spatially unshifted, matching cv2.morphologyEx(MORPH_CLOSE). (Using
    {0,1}² for both — the pre-round-3 behavior — shifted the closed mask
    one pixel up-left.)"""
    if op == "dilate":
        p = np.pad(mask, ((0, 1), (0, 1)), mode="constant", constant_values=0)
        fn = np.maximum
    else:
        p = np.pad(mask, ((1, 0), (1, 0)), mode="constant", constant_values=255)
        fn = np.minimum
    out = fn(p[:-1, :-1], p[:-1, 1:])
    out = fn(out, p[1:, :-1], out=out)
    return fn(out, p[1:, 1:], out=out)


def morph_close_2x2(mask: np.ndarray) -> np.ndarray:
    """MORPH_CLOSE with a 2×2 rect kernel (gentle profile, common.py:113-114)."""
    return _morph2x2(_morph2x2(mask, "dilate"), "erode")


def morph_open_1x1(mask: np.ndarray) -> np.ndarray:
    """MORPH_OPEN with a 1×1 rect kernel (aggressive profile,
    common.py:107-108) — erode∘dilate with a single-pixel kernel is the
    identity; kept as an explicit no-op for parity with the reference."""
    return mask


def minmax_normalize(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0,255] (common.py:116-118)."""
    lo, hi = int(img.min()), int(img.max())
    if hi <= lo:
        return np.zeros_like(img)
    if lo == 0 and hi == 255:
        return img  # already full-range (every binary threshold output)
    f = img.astype(np.float32)
    out = (f - np.float32(lo)) * (255.0 / (hi - lo))
    return np.rint(out, out=out).astype(np.uint8)


def preprocess_for_ocr(img: np.ndarray, aggressive: bool = False) -> np.ndarray:
    """Full OCR binarization chain (common.py:98-118): 3×3 Gaussian blur,
    then Gaussian-adaptive threshold + morphology — gentle profile
    (block 15, C 5, close 2×2) or aggressive (block 31, C 10, open 1×1)
    — then min-max normalize."""
    blurred = gaussian_blur3(img)
    if aggressive:
        thresh = morph_open_1x1(
            adaptive_threshold_gaussian(
                blurred, BINARIZE_BLOCK_AGGRESSIVE, BINARIZE_C_AGGRESSIVE
            )
        )
    else:
        thresh = morph_close_2x2(
            adaptive_threshold_gaussian(blurred, BINARIZE_BLOCK, BINARIZE_C)
        )
    return minmax_normalize(thresh)
