"""Classic alignment chain P3-P8: the aligner's algorithmic heart, in numpy.

Faithful grayscale reimplementation of the reference classic aligner
(reference services/aligner/src/services/aligner.py:58-226, 232-408 and
common.py:21-33) without cv2 (absent in this container):

- P3  CLAHE illumination equalization  — common.py:21-33 (5×5 Gaussian
      blur → CLAHE clip 1.5, 8×8 tiles → ×1.2 contrast gain). The
      reference runs CLAHE on the L channel of LAB; this engine is
      grayscale-native, so gray IS the luminance channel.
- P4  seed-point selection             — aligner.py:232-257 (5 candidates,
      11×11 patch, homogeneity 1/(1+std), strict-max first-wins).
- P5  adaptive-tolerance BFS flood fill — aligner.py:259-292 + 391-395
      (tolerance clip(13 + (255-brightness)*0.7 + variance*0.7, 10, 65),
      8-connected, running mean α=0.005, visited-at-enqueue) followed by
      5×5 close + 5×5 open.
- P6  morphological cleanup            — aligner.py:294-298 (close 15×15,
      open 5×5 before contour extraction).
- P7  contour → polygon                — aligner.py:300-340, 353-372
      (external contours, aspect filter 1 < h/w < 6 falling back to all,
      max-area contour, approxPolyDP ε = simplify_percent% of perimeter,
      drop corners with angle < 15°, minAreaRect if < 4 or > 8 points)
      + `_ensure_receipt_shape` (aligner.py:342-351).
- P8  min-area rectangle               — aligner.py:174-175 (minAreaRect
      + boxPoints over the polygon → the final 4 corners, always).

In grayscale the reference's color formulas specialize EXACTLY:
`_color_distance` (3-D Euclidean, aligner.py:386-389) becomes |a - b|,
and the brightness weights 0.299+0.587+0.114 sum to 1, so brightness of
an (r=g=b=v) pixel is v (aligner.py:393). For genuinely COLOR frames the
specialization does NOT hold (equal-luminance hue boundaries are
invisible to |Δ| on gray), so P4/P5 also accept (H, W, 3) BGR frames and
run the reference's true color math — per-channel running mean,
Euclidean distance, Rec.601 brightness in the tolerance — via the same
vectorized BFS (`flood_fill` handles both layouts; the color path in
kernels/media.py hands the LAB-CLAHE-equalized color frame in).

Documented deviations (each is a determinism-or-scale engineering choice,
like the nearest-vs-INTER_CUBIC warp tradeoff in imageops.py):

1. CLAHE bilinear tile interpolation is computed in float32 and rounded
   once at the end (cv2 uses fixed-point intermediates).
2. approxPolyDP is standard Douglas-Peucker on the closed contour (split
   at the point farthest from point 0), not cv2's slice-stack variant.

The flood fill itself is NOT a deviation: the vectorized BFS reproduces
the reference deque BFS exactly (enqueue order, visited-at-enqueue, and
the per-accepted-pixel running-mean recurrence via blocked speculative
scan — see `_scan_frontier`); `flood_fill_reference` is the verbatim
per-pixel port the unit tests cross-validate against.
"""

from __future__ import annotations

import numpy as np

from ..config import (
    ASPECT_MAX,
    ASPECT_MIN,
    TOLERANCE_MAX,
    TOLERANCE_MIN,
)

FLOOD_ALPHA = 0.005  # running-mean update rate, aligner.py:279-280
SIMPLIFY_PERCENT = 2.0  # AlignmentConfig default, models/config.py:11-16
MIN_ANGLE_DEG = 15.0  # aligner.py:320


# --------------------------------------------------------------------------
# P3: Gaussian blur + CLAHE + contrast gain
# --------------------------------------------------------------------------

def gaussian_blur5(img: np.ndarray) -> np.ndarray:
    """5×5 Gaussian blur (common.py:23). cv2 with sigma=0 and ksize 5 uses
    the fixed binomial kernel [1,4,6,4,1]/16; separable integer arithmetic
    with round-half-up and reflect-101 borders reproduces it exactly.

    Row-tiled: full-frame int32 temporaries (3 × H×W×4 B) stream DRAM and
    thrash the shared L3 when 32 workers run concurrently — the same
    effect measured for the adaptive threshold (PLANS.md); bounded row
    blocks keep every buffer ≲0.5 MiB so the separable passes stay
    cache-resident. Output is byte-identical to the untiled form
    (pinned by test_gaussian_blur5_tiling_invariant)."""
    k = np.array([1, 4, 6, 4, 1], dtype=np.int32)
    h, w = img.shape
    if h < 8 or w < 8:  # tiny frames: np.pad reflect handles all edge cases
        p = np.pad(img.astype(np.int32), 2, mode="reflect")
        rows = sum(k[i] * p[:, i : i + w] for i in range(5))
        both = sum(k[i] * rows[i : i + h, :] for i in range(5))
        return ((both + 128) >> 8).astype(np.uint8)
    out = np.empty((h, w), dtype=np.uint8)
    block = max(16, (1 << 20) // (8 * (w + 4)))

    def vreflect(idx: np.ndarray) -> np.ndarray:  # BORDER_REFLECT_101
        idx = np.where(idx < 0, -idx, idx)
        return np.where(idx >= h, 2 * h - 2 - idx, idx)

    for r0 in range(0, h, block):
        r1 = min(r0 + block, h)
        src = img[vreflect(np.arange(r0 - 2, r1 + 2))].astype(np.int32)
        src = np.pad(src, ((0, 0), (2, 2)), mode="reflect")
        rows = k[0] * src[:, 0:w]
        for i in range(1, 5):
            rows += k[i] * src[:, i : i + w]
        nb = r1 - r0
        both = k[0] * rows[0:nb]
        for i in range(1, 5):
            both += k[i] * rows[i : i + nb]
        both += 128
        np.right_shift(both, 8, out=both)
        out[r0:r1] = both.astype(np.uint8)
    return out


def clahe(img: np.ndarray, clip_limit: float = 1.5, grid: int = 8) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization, cv2 semantics
    (clipLimit 1.5, tileGridSize 8×8 per common.py:27): pad to a tile
    multiple (reflect-101), per-tile clipped histogram with cv2's excess
    redistribution, per-tile LUT = round(cdf·255/tileArea), bilinear
    interpolation between the 4 surrounding tile LUTs."""
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
            # cv2 redistribution: even share to every bin, then the
            # remainder one-by-one at stride 256/residual
            hist += clipped // 256
            residual = clipped % 256
            if residual:
                step = max(256 // residual, 1)
                idx = np.arange(0, residual * step, step)[:residual]
                hist[idx[idx < 256]] += 1
            luts[ty, tx] = np.clip(
                np.rint(hist.cumsum() * scale), 0, 255
            ).astype(np.uint8)

    # bilinear tile interpolation. Only the in-frame pixels are needed
    # (padding exists solely for tile histograms), and the gather +
    # blend runs row-tiled: the untiled form allocated ~7 full float32
    # frames (v11..v22, top, bot, out), pure DRAM streaming at 32
    # workers; blocks keep the working set ≲1 MiB. Identical math on
    # identical values → byte-identical output.
    ys = np.arange(h, dtype=np.float32)
    xs = np.arange(w, dtype=np.float32)
    tyf = (ys + 0.5) / th - 0.5
    txf = (xs + 0.5) / tw - 0.5
    ty1 = np.clip(np.floor(tyf).astype(np.int32), 0, grid - 1)
    tx1 = np.clip(np.floor(txf).astype(np.int32), 0, grid - 1)
    ty2 = np.minimum(ty1 + 1, grid - 1)
    tx2 = np.minimum(tx1 + 1, grid - 1)
    ya = np.clip(tyf - np.floor(tyf), 0.0, 1.0).astype(np.float32)
    xa = np.clip(txf - np.floor(txf), 0.0, 1.0).astype(np.float32)[None, :]

    out = np.empty((h, w), dtype=np.uint8)
    block = max(8, (1 << 20) // (16 * max(w, 1)))
    for r0 in range(0, h, block):
        r1 = min(r0 + block, h)
        v = img[r0:r1]  # in-frame rows: padded == img here
        t1 = ty1[r0:r1][:, None]
        t2 = ty2[r0:r1][:, None]
        yab = ya[r0:r1][:, None]
        v11 = luts[t1, tx1[None, :], v].astype(np.float32)
        v12 = luts[t1, tx2[None, :], v].astype(np.float32)
        v21 = luts[t2, tx1[None, :], v].astype(np.float32)
        v22 = luts[t2, tx2[None, :], v].astype(np.float32)
        top = v11 * (1.0 - xa) + v12 * xa
        bot = v21 * (1.0 - xa) + v22 * xa
        blend = top * (1.0 - yab) + bot * yab
        out[r0:r1] = np.clip(np.rint(blend, out=blend), 0, 255).astype(np.uint8)
    return out


# saturate(round(v·1.2)) for every uint8 v, precomputed with the same
# float32 multiply the per-pixel form used — the gain pass becomes one
# LUT gather instead of two full float32 temporaries
_GAIN_LUT = np.clip(
    np.rint(np.arange(256, dtype=np.float32) * np.float32(1.2)), 0, 255
).astype(np.uint8)


def preprocess_illumination(img: np.ndarray) -> np.ndarray:
    """P3 full chain (common.py:21-33): blur 5×5 → CLAHE(1.5, 8×8) → ×1.2
    gain (cv2.addWeighted(result, 1.2, 0, 0, 0) = saturate(round(v·1.2)))."""
    return _GAIN_LUT[clahe(gaussian_blur5(img))]


# --------------------------------------------------------------------------
# P4: seed-point selection
# --------------------------------------------------------------------------

def _get_samples(img: np.ndarray, center: tuple[int, int], radius: int) -> np.ndarray:
    """(2r+1)² in-bounds patch values around center=(x, y), row-major
    (aligner.py:374-384). Gray frames yield shape (N,); color frames
    (N, C) — one sample row per pixel, like the reference's list of
    image[y, x] vectors."""
    x, y = center
    h, w = img.shape[:2]
    y0, y1 = max(0, y - radius), min(h, y + radius + 1)
    x0, x1 = max(0, x - radius), min(w, x + radius + 1)
    patch = img[y0:y1, x0:x1].astype(np.float32)
    return patch.ravel() if img.ndim == 2 else patch.reshape(-1, img.shape[2])


def find_best_seed_point(img: np.ndarray) -> tuple[int, int]:
    """Pick the most homogeneous of 5 candidate points (aligner.py:232-257):
    center + the 4 third-points; homogeneity = 1/(1+std of 11×11 patch);
    strictly-greater comparison → first candidate wins ties. np.std over
    the (N, C) color samples is the flattened global std, exactly the
    reference's np.std(samples)."""
    h, w = img.shape[:2]
    candidates = [
        (w // 2, h // 2),
        (w // 3, h // 3),
        (2 * w // 3, h // 3),
        (w // 3, 2 * h // 3),
        (2 * w // 3, 2 * h // 3),
    ]
    best, best_h = candidates[0], 0.0
    for pt in candidates:
        std = float(np.std(_get_samples(img, pt, radius=5)))
        homogeneity = 1.0 / (1.0 + std)
        if homogeneity > best_h:
            best_h, best = homogeneity, pt
    return best


# --------------------------------------------------------------------------
# P5: adaptive-tolerance flood fill
# --------------------------------------------------------------------------

def compute_auto_tolerance(samples: np.ndarray, mean_color) -> float:
    """tolerance = clip(13 + (255-brightness)·0.7 + variance·0.7, 10, 65)
    (aligner.py:391-395). Grayscale: brightness ≡ mean_color (the BGR
    weights sum to 1), variance = mean |s - mean|. Color ((N, 3) BGR
    samples, (3,) mean): variance = mean Euclidean distance to the mean
    color, brightness = Rec.601 over the mean color (aligner.py:392-393)."""
    if samples.ndim == 2:
        mean_color = np.asarray(mean_color, dtype=np.float64)
        variance = float(
            np.mean(np.sqrt(np.sum((samples - mean_color) ** 2, axis=1)))
        )
        brightness = float(
            mean_color[2] * 0.299 + mean_color[1] * 0.587 + mean_color[0] * 0.114
        )
    else:
        variance = float(np.mean(np.abs(samples - mean_color)))
        brightness = float(mean_color)
    tolerance = 13.0 + (255.0 - brightness) * 0.7 + variance * 0.7
    return float(np.clip(tolerance, TOLERANCE_MIN, TOLERANCE_MAX))


# 8-connected neighbor order, aligner.py:272
_DIRS = np.array(
    [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1), (1, -1), (-1, 1)],
    dtype=np.int64,
)


_SPEC_CHUNK = 64  # initial speculative-scan block size
_SPEC_CHUNK_MAX = 4096  # growth cap (bounds worst-case rework per miss)
_POWER_TABLES: dict[float, tuple[np.ndarray, np.ndarray]] = {}


def _power_tables(alpha: float) -> tuple[np.ndarray, np.ndarray]:
    """Cached (r^j, r^-j) tables for the closed-form mean recurrence —
    computing r**arange per chunk was ~30 µs of transcendentals each."""
    tabs = _POWER_TABLES.get(alpha)
    if tabs is None:
        r = 1.0 - alpha
        j = np.arange(_SPEC_CHUNK_MAX + 1, dtype=np.float64)
        tabs = (r ** j, r ** (-j[:-1]))
        _POWER_TABLES[alpha] = tabs
    return tabs


def _scan_frontier(
    colors: np.ndarray, mean: float, tol: float, alpha: float
) -> tuple[np.ndarray, float]:
    """EXACT sequential accept/update scan over one frontier's colors in
    FIFO order: pixel i is accepted iff |c_i - m_i| <= tol, and the mean
    advances m ← m(1-α) + c·α only on accepts (aligner.py:274-281).

    Vectorized by blocked speculation: assume a whole chunk is accepted,
    compute the would-be means via the closed form
    m_j = r^j m + α r^(j-1) Σ_{t<j} r^(-t) c_t  (r = 1-α),
    verify the decisions, and commit the longest verified prefix; runs of
    rejections (mean frozen) are committed vectorized too. Exact because
    a decision is only committed when every earlier decision in its
    prefix matched the speculation."""
    n = len(colors)
    acc = np.zeros(n, dtype=bool)
    r = 1.0 - alpha
    pow_r, pow_inv = _power_tables(alpha)
    i = 0
    # adaptive speculation: double the block on every fully-accepted
    # block (interior frontiers commit in O(n/CH_MAX) vector ops), reset
    # on a rejection (boundary regions fall back to small exact blocks)
    ch = _SPEC_CHUNK
    while i < n:
        chunk = colors[i : i + ch]
        k = len(chunk)
        if abs(chunk[0] - mean) > tol:
            # reject-run: mean frozen, decisions independent
            rejected = np.abs(chunk - mean) > tol
            g = int(np.argmin(rejected)) if not rejected.all() else k
            i += max(g, 1)
            ch = _SPEC_CHUNK
            continue
        powers = pow_r[1 : k + 1]
        inv = pow_inv[:k]  # ≤ (1/r)^4095 ≈ 8e8, fine in float64
        pref = np.cumsum(chunk * inv)
        m_after = powers * mean + alpha * (powers / r) * pref
        m_before = np.empty(k)
        m_before[0] = mean
        m_before[1:] = m_after[:-1]
        dec = np.abs(chunk - m_before) <= tol
        if dec.all():
            acc[i : i + k] = True
            mean = float(m_after[-1])
            i += k
            ch = min(ch * 2, _SPEC_CHUNK_MAX)
            continue
        f = int(np.argmin(dec))  # first rejection; f >= 1 (dec[0] is True)
        acc[i : i + f] = True
        mean = float(m_before[f])  # pixel f rejected against this exact mean
        i += f + 1
        ch = _SPEC_CHUNK
    return acc, mean


def _scan_frontier_color(
    colors: np.ndarray, mean: np.ndarray, tol: float, alpha: float
) -> tuple[np.ndarray, np.ndarray]:
    """`_scan_frontier` for (n, C) color frontiers: accept iff the
    EUCLIDEAN distance ‖c_i − m_i‖ ≤ tol (reference _color_distance,
    aligner.py:386-389), mean advances per channel. The closed-form
    speculation is the same scalar recurrence applied channelwise (the
    mean update is linear, so channels evolve independently); only the
    accept test couples them."""
    n = len(colors)
    acc = np.zeros(n, dtype=bool)
    r = 1.0 - alpha
    pow_r, pow_inv = _power_tables(alpha)
    mean = np.asarray(mean, dtype=np.float64)
    i = 0
    ch = _SPEC_CHUNK
    while i < n:
        chunk = colors[i : i + ch]
        k = len(chunk)
        d2 = np.sum((chunk - mean) ** 2, axis=1)
        if d2[0] > tol * tol:
            # reject-run: mean frozen, decisions independent
            rejected = d2 > tol * tol
            g = int(np.argmin(rejected)) if not rejected.all() else k
            i += max(g, 1)
            ch = _SPEC_CHUNK
            continue
        powers = pow_r[1 : k + 1, None]
        inv = pow_inv[:k, None]
        pref = np.cumsum(chunk * inv, axis=0)
        m_after = powers * mean + alpha * (powers / r) * pref
        m_before = np.empty_like(m_after)
        m_before[0] = mean
        m_before[1:] = m_after[:-1]
        dec = np.sum((chunk - m_before) ** 2, axis=1) <= tol * tol
        if dec.all():
            acc[i : i + k] = True
            mean = m_after[-1].copy()
            i += k
            ch = min(ch * 2, _SPEC_CHUNK_MAX)
            continue
        f = int(np.argmin(dec))  # first rejection; f >= 1 (dec[0] is True)
        acc[i : i + f] = True
        mean = m_before[f].copy()  # pixel f rejected against this exact mean
        i += f + 1
        ch = _SPEC_CHUNK
    return acc, mean


def flood_fill(img: np.ndarray, seed: tuple[int, int]) -> np.ndarray:
    """Flood fill matching aligner.py:259-292 exactly: 8-connected BFS
    from `seed` (x, y), accept pixels within the adaptive tolerance of
    the running mean (α=0.005 update per accepted pixel, FIFO order,
    visited-at-enqueue). Frontier expansion and the accept/update scan
    are vectorized but semantics-identical to the reference deque BFS
    (`flood_fill_reference`, cross-validated in tests). Returns the
    uint8 mask (255 = filled) BEFORE the 5×5 cleanup.

    Accepts (H, W) gray or (H, W, 3) BGR frames; color frames run the
    reference's true color math (per-channel running mean, Euclidean
    accept test — `_scan_frontier_color`)."""
    h, w = img.shape[:2]
    color = img.ndim == 3
    samples = _get_samples(img, seed, radius=3)
    mean = samples.mean(axis=0).astype(np.float64) if color else float(np.mean(samples))
    tol = compute_auto_tolerance(samples, mean)

    # padded index space: a 1-px always-visited border removes all bounds
    # checks and the per-level divmod — neighbors are 8 flat offsets
    pw = w + 2
    visited = np.zeros((h + 2) * pw, dtype=bool)
    visited[:pw] = True
    visited[-pw:] = True
    visited[::pw] = True
    visited[pw - 1 :: pw] = True
    padded = np.zeros((h + 2, w + 2) + img.shape[2:], dtype=img.dtype)
    padded[1:-1, 1:-1] = img
    flat = padded.reshape(-1, img.shape[2]) if color else padded.reshape(-1)
    offsets = (_DIRS[:, 0] * pw + _DIRS[:, 1]).astype(np.int64)

    sx, sy = seed
    start = (sy + 1) * pw + (sx + 1)
    visited[start] = True
    frontier = np.array([start], dtype=np.int64)
    accepted_all: list[np.ndarray] = []

    while frontier.size:
        colors = flat[frontier].astype(np.float64)
        if color:
            ok, mean = _scan_frontier_color(colors, mean, tol, FLOOD_ALPHA)
        else:
            ok, mean = _scan_frontier(colors, mean, tol, FLOOD_ALPHA)
        accepted = frontier[ok]
        if accepted.size == 0:
            break
        accepted_all.append(accepted)
        # expand in reference dir-order per accepted pixel (FIFO-major):
        # candidate array shape (n_accepted, 8) flattened row-major keeps
        # the deque enqueue order
        cand = (accepted[:, None] + offsets[None, :]).ravel()
        cand = cand[~visited[cand]]  # cheap prefilter before the sort
        # first-occurrence dedup preserving order (visited-at-enqueue)
        _uniq, first_idx = np.unique(cand, return_index=True)
        frontier = cand[np.sort(first_idx)]
        visited[frontier] = True

    mask = np.zeros((h, w), dtype=np.uint8)
    if accepted_all:
        acc = np.concatenate(accepted_all)
        ys, xs = np.divmod(acc, pw)
        mask[ys - 1, xs - 1] = 255
    return mask


def flood_fill_reference(img: np.ndarray, seed: tuple[int, int]) -> np.ndarray:
    """Verbatim per-pixel port of the reference deque BFS
    (aligner.py:259-292) — the cross-validation oracle for `flood_fill`
    in the unit tests; O(pixels) Python, so test-sized images only.
    Handles both layouts like `flood_fill`: gray uses |Δ|, color the
    per-channel mean + Euclidean accept (compared in squared form, the
    algebraic equivalent of aligner.py:386-389's sqrt)."""
    from collections import deque

    h, w = img.shape[:2]
    color_frame = img.ndim == 3
    samples = _get_samples(img, seed, radius=3)
    if color_frame:
        mean = samples.mean(axis=0).astype(np.float64)
    else:
        mean = float(np.mean(samples))
    tol = compute_auto_tolerance(samples, mean)

    mask = np.zeros((h, w), dtype=np.uint8)
    visited = np.zeros((h, w), dtype=bool)
    queue = deque([seed])
    visited[seed[1], seed[0]] = True
    while queue:
        x, y = queue.popleft()
        if color_frame:
            color = img[y, x].astype(np.float64)
            ok = float(np.sum((color - mean) ** 2)) <= tol * tol
        else:
            color = float(img[y, x])
            ok = abs(color - mean) <= tol
        if ok:
            mean = mean * (1 - FLOOD_ALPHA) + color * FLOOD_ALPHA
            mask[y, x] = 255
            for dy, dx in _DIRS:
                nyy, nxx = y + dy, x + dx
                if 0 <= nxx < w and 0 <= nyy < h and not visited[nyy, nxx]:
                    visited[nyy, nxx] = True
                    queue.append((nxx, nyy))
    return mask


# --------------------------------------------------------------------------
# binary morphology (rect structuring elements, cv2 border conventions)
# --------------------------------------------------------------------------

def _binary_window_sum(mask01: np.ndarray, k: int, pad_value: int) -> np.ndarray:
    """k×k window sum of a 0/1 mask via an integral image, centered anchor
    ((k-1)//2 — cv2's default for odd AND even kernels). Values ≤ k² so
    int32 is always exact."""
    a = (k - 1) // 2  # anchor offset
    padded = np.pad(
        mask01, ((a + 1, k - 1 - a), (a + 1, k - 1 - a)),
        mode="constant", constant_values=pad_value,
    )
    ii = padded.astype(np.int32).cumsum(axis=0, dtype=np.int32).cumsum(axis=1, dtype=np.int32)
    h, w = mask01.shape
    return (ii[k:, k:][:h, :w] - ii[:h, k:][:, :w]) - (ii[k:, :w][:h, :] - ii[:h, :w])


def binary_dilate(mask: np.ndarray, k: int) -> np.ndarray:
    """Rect-kernel dilation (border treated as background, cv2's
    -inf default border for dilate)."""
    m = (mask > 0).astype(np.uint8)
    return (_binary_window_sum(m, k, 0) > 0).astype(np.uint8) * np.uint8(255)


def binary_erode(mask: np.ndarray, k: int) -> np.ndarray:
    """Rect-kernel erosion (border treated as foreground, cv2's +inf
    default border for erode)."""
    m = (mask > 0).astype(np.uint8)
    return (_binary_window_sum(m, k, 1) == k * k).astype(np.uint8) * np.uint8(255)


def binary_close(mask: np.ndarray, k: int) -> np.ndarray:
    return binary_erode(binary_dilate(mask, k), k)


def binary_open(mask: np.ndarray, k: int) -> np.ndarray:
    return binary_dilate(binary_erode(mask, k), k)


def find_check_mask(img: np.ndarray, seed: tuple[int, int]) -> np.ndarray:
    """P5 complete: flood fill + 5×5 close + 5×5 open (aligner.py:289-292).
    Gray or color frame; the mask is 2-D either way."""
    mask = flood_fill(img, seed)
    return binary_open(binary_close(mask, 5), 5)


# --------------------------------------------------------------------------
# P6-P7: contours → polygon
# --------------------------------------------------------------------------

# Moore neighborhood in clockwise order starting West (y down → clockwise
# on screen): W, NW, N, NE, E, SE, S, SW as (dy, dx)
_MOORE = np.array(
    [(0, -1), (-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1)],
    dtype=np.int64,
)


def _trace_boundary(fg: np.ndarray, start: tuple[int, int]) -> np.ndarray:
    """Moore-neighbor boundary trace of the 8-connected component whose
    topmost-then-leftmost pixel is `start` (y, x). Returns the external
    contour as (n, 2) [x, y] points in order — the CHAIN_APPROX_NONE
    analog of cv2.findContours RETR_EXTERNAL (aligner.py:300)."""
    h, w = fg.shape
    sy, sx = start
    contour = [(sx, sy)]
    # backtrack starts West of the start pixel (row-major scan guarantees
    # the West neighbor is background)
    cy, cx = sy, sx
    back = 0  # index into _MOORE of the backtrack direction
    first_dir = None
    while True:
        found = -1
        for i in range(1, 9):
            d = (back + i) % 8
            ny, nx = cy + _MOORE[d][0], cx + _MOORE[d][1]
            if 0 <= ny < h and 0 <= nx < w and fg[ny, nx]:
                found = d
                break
        if found < 0:
            break  # isolated pixel
        if first_dir is None:
            first_dir = found
        elif (cy, cx) == (sy, sx) and found == first_dir:
            contour.pop()  # Jacob's stopping criterion: closed the loop
            break
        cy, cx = cy + _MOORE[found][0], cx + _MOORE[found][1]
        contour.append((cx, cy))
        # new backtrack points from the new pixel to the previous one
        back = (found + 4) % 8
        if len(contour) > 4 * (h * w):  # safety: cannot exceed this
            break
    return np.array(contour, dtype=np.float64)


def _row_runs(fg: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Horizontal foreground runs as (row, start, end_exclusive) arrays,
    row-major ordered — the O(transitions) representation that makes
    labeling cheap (a per-pixel flood here would double the cost of the
    whole chain)."""
    padded = np.pad(fg, ((0, 0), (1, 1)))
    diff = np.diff(padded.astype(np.int8), axis=1)
    srow, scol = np.nonzero(diff == 1)
    _erow, ecol = np.nonzero(diff == -1)
    return srow, scol, ecol


def _label_runs(srow: np.ndarray, scol: np.ndarray, ecol: np.ndarray) -> np.ndarray:
    """8-connected union-find over row runs → component id per run."""
    n = len(srow)
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    # group run indices by row (runs are row-major ordered)
    row_starts: dict[int, tuple[int, int]] = {}
    i = 0
    while i < n:
        j = i
        while j < n and srow[j] == srow[i]:
            j += 1
        row_starts[int(srow[i])] = (i, j)
        i = j
    # two-pointer link with the previous row: runs [s2, e2) and [s1, e1)
    # (end-exclusive) touch 8-connectedly iff s1 <= e2 and s2 <= e1
    for r, (i0, i1) in row_starts.items():
        prev = row_starts.get(r - 1)
        if prev is None:
            continue
        p0, p1 = prev
        p = p0
        for c in range(i0, i1):
            while p < p1 and ecol[p] < scol[c]:  # entirely left of c
                p += 1
            q = p
            while q < p1 and scol[q] <= ecol[c]:
                ra, rb = find(c), find(q)
                if ra != rb:
                    parent[ra] = rb
                q += 1
    roots = np.fromiter((find(k) for k in range(n)), dtype=np.int64, count=n)
    return roots


def find_external_contours(mask: np.ndarray) -> list[np.ndarray]:
    """External boundary of every 8-connected foreground component, each
    as (n, 2) [x, y] float64 (cv2.findContours RETR_EXTERNAL analog).
    Components come from run-based union-find labeling (O(runs), not
    O(pixels)); each component is traced once from its topmost-leftmost
    pixel."""
    fg = mask > 0
    srow, scol, ecol = _row_runs(fg)
    if len(srow) == 0:
        return []
    roots = _label_runs(srow, scol, ecol)
    contours = []
    seen: set[int] = set()
    for i in range(len(srow)):  # row-major → first run is topmost-leftmost
        root = int(roots[i])
        if root in seen:
            continue
        seen.add(root)
        contours.append(_trace_boundary(fg, (int(srow[i]), int(scol[i]))))
    return contours


def contour_area(contour: np.ndarray) -> float:
    """Green's-formula polygon area (cv2.contourArea semantics)."""
    if len(contour) < 3:
        return 0.0
    x, y = contour[:, 0], contour[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def arc_length(contour: np.ndarray) -> float:
    """Closed-curve perimeter (cv2.arcLength(closed=True))."""
    d = np.diff(np.vstack([contour, contour[:1]]), axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def bounding_rect(contour: np.ndarray) -> tuple[int, int, int, int]:
    """Integer bounding rect (x, y, w, h), cv2.boundingRect semantics."""
    x0 = int(np.floor(contour[:, 0].min()))
    y0 = int(np.floor(contour[:, 1].min()))
    x1 = int(np.ceil(contour[:, 0].max()))
    y1 = int(np.ceil(contour[:, 1].max()))
    return x0, y0, x1 - x0 + 1, y1 - y0 + 1


def _dp_keep(pts: np.ndarray, i0: int, i1: int, eps: float, keep: np.ndarray) -> None:
    """Douglas-Peucker on the open arc pts[i0..i1] (indices kept in
    `keep`); iterative stack to avoid recursion limits."""
    stack = [(i0, i1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        pa, pb = pts[a], pts[b]
        seg = pb - pa
        ln = np.hypot(*seg)
        mid = pts[a + 1 : b]
        if ln < 1e-12:
            dist = np.sqrt(((mid - pa) ** 2).sum(axis=1))
        else:
            dist = np.abs(seg[0] * (pa[1] - mid[:, 1]) - seg[1] * (pa[0] - mid[:, 0])) / ln
        j = int(dist.argmax())
        if dist[j] > eps:
            j += a + 1
            keep[j] = True
            stack.append((a, j))
            stack.append((j, b))


def approx_poly_dp(contour: np.ndarray, epsilon: float) -> np.ndarray:
    """Douglas-Peucker closed-curve simplification (cv2.approxPolyDP
    analog; see module docstring, deviation 3): split the ring at point 0
    and its farthest point, simplify both arcs."""
    n = len(contour)
    if n <= 3:
        return contour.copy()
    far = int(np.argmax(((contour - contour[0]) ** 2).sum(axis=1)))
    if far == 0:
        return contour[:1].copy()
    keep = np.zeros(n + 1, dtype=bool)
    keep[[0, far, n]] = True
    ring = np.vstack([contour, contour[:1]])  # close the ring
    _dp_keep(ring, 0, far, epsilon, keep)
    _dp_keep(ring, far, n, epsilon, keep)
    return ring[np.nonzero(keep)[0][:-1]]  # drop the duplicated closing pt


def filter_receipt_contours(contours: list[np.ndarray]) -> list[np.ndarray]:
    """Aspect filter 1 < h/w < 6, falling back to ALL contours when none
    pass (aligner.py:330-340)."""
    filtered = []
    for cnt in contours:
        _x, _y, w, h = bounding_rect(cnt)
        if w == 0:
            continue
        aspect = h / w
        if ASPECT_MIN < aspect < ASPECT_MAX:
            filtered.append(cnt)
    return filtered if filtered else list(contours)


def _angle_at(pts: np.ndarray, i: int) -> float:
    """Absolute turn angle at vertex i in degrees (aligner.py:397-408)."""
    prev_pt = pts[(i - 1) % len(pts)]
    curr = pts[i]
    nxt = pts[(i + 1) % len(pts)]
    ang = abs(
        np.degrees(
            np.arctan2(nxt[1] - curr[1], nxt[0] - curr[0])
            - np.arctan2(prev_pt[1] - curr[1], prev_pt[0] - curr[0])
        )
    )
    return float(ang)


def filter_sharp_angles(polygon: np.ndarray, min_angle_deg: float = MIN_ANGLE_DEG) -> np.ndarray:
    """Drop vertices whose turn angle is within min_angle_deg of 0 or 360;
    keep the original polygon if fewer than 4 survive (aligner.py:353-372)."""
    pts = polygon.reshape(-1, 2)
    if len(pts) < 2:
        return polygon
    kept = []
    for i in range(len(pts)):
        ang = _angle_at(pts, i)
        if ang < 0:
            ang += 360
        if min_angle_deg < ang < (360 - min_angle_deg):
            kept.append(pts[i])
    if len(kept) < 4:
        return polygon
    return np.array(kept, dtype=np.float64)


# --------------------------------------------------------------------------
# P8: min-area rectangle (rotating calipers)
# --------------------------------------------------------------------------

def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices counter-clockwise in
    the (x right, y down) frame."""
    p = np.unique(np.asarray(pts, np.float64).reshape(-1, 2), axis=0)
    if len(p) <= 2:
        return p
    # lexicographic sort (unique already sorts rows)
    def half(points):
        out = []
        for q in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-2]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect_points(pts: np.ndarray) -> np.ndarray:
    """The 4 corners of the minimum-area enclosing rectangle
    (cv2.minAreaRect + boxPoints analog, aligner.py:174-175): rotating
    calipers over the convex hull — the optimum aligns with a hull edge."""
    pts = np.asarray(pts, np.float64).reshape(-1, 2)
    if len(pts) == 0:
        raise ValueError("minAreaRect of empty point set")
    hull = convex_hull(pts)
    if len(hull) == 1:
        return np.repeat(hull, 4, axis=0)
    if len(hull) == 2:
        # degenerate: zero-thickness rect along the segment
        a, b = hull
        return np.array([a, b, b, a], dtype=np.float64)
    best = None
    n = len(hull)
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        ln = np.hypot(*e)
        if ln < 1e-12:
            continue
        u = e / ln  # edge frame
        v = np.array([-u[1], u[0]])
        xs = hull @ u
        ys = hull @ v
        wdt = xs.max() - xs.min()
        hgt = ys.max() - ys.min()
        area = wdt * hgt
        if best is None or area < best[0]:
            best = (area, u, v, xs.min(), xs.max(), ys.min(), ys.max())
    if best is None:
        # every hull edge below the length epsilon: the points are
        # effectively coincident — axis-aligned bbox degenerate rect
        x0, x1 = pts[:, 0].min(), pts[:, 0].max()
        y0, y1 = pts[:, 1].min(), pts[:, 1].max()
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64
        )
    _, u, v, x0, x1, y0, y1 = best
    return np.array(
        [
            u * x0 + v * y0,
            u * x1 + v * y0,
            u * x1 + v * y1,
            u * x0 + v * y1,
        ],
        dtype=np.float64,
    )


# --------------------------------------------------------------------------
# P6+P7 composition and the full classic chain
# --------------------------------------------------------------------------

def mask_to_polygon(mask: np.ndarray, simplify_percent: float = SIMPLIFY_PERCENT) -> np.ndarray:
    """P6 cleanup + P7 contour→polygon (aligner.py:294-328): close 15×15,
    open 5×5, external contours, aspect filter, max-area contour,
    approxPolyDP at simplify_percent% of perimeter, sharp-angle filter,
    minAreaRect fallback when the polygon has < 4 or > 8 points.
    Returns (n, 2) float64 [x, y]; empty array when no contours."""
    clean = binary_open(binary_close(mask, 15), 5)
    contours = find_external_contours(clean)
    if not contours:
        return np.array([])
    valid = filter_receipt_contours(contours)
    best = max(valid, key=contour_area)
    peri = arc_length(best)
    epsilon = (simplify_percent / 100.0) * peri
    approx = approx_poly_dp(best, epsilon)
    approx = filter_sharp_angles(approx, MIN_ANGLE_DEG)
    if len(approx) < 4 or len(approx) > 8:
        approx = min_area_rect_points(best)
    return approx.reshape(-1, 2)


def ensure_receipt_shape(polygon: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """If the polygon has fewer than 4 points, replace it with the
    minAreaRect of all foreground mask pixels (aligner.py:342-351)."""
    if len(polygon) < 4:
        ys, xs = np.nonzero(mask > 0)
        if len(xs):
            return min_area_rect_points(np.column_stack([xs, ys]).astype(np.float64))
    return polygon


def classic_align_corners(
    working: np.ndarray, pre: np.ndarray | None = None
) -> np.ndarray:
    """The full classic chain P3-P8 on an (already dark-inverted)
    grayscale frame → 4 unordered corner points (aligner.py:58-175):
    CLAHE → seed → flood-fill mask → polygon → minAreaRect. The FINAL
    corners are always the min-area rectangle of the polygon
    (aligner.py:174-175). Raises when no contour exists (the reference
    aligner throws and the gateway falls back locally, P14).

    ``pre`` overrides the internal grayscale P3 with a precomputed
    illumination-equalized frame — the color path hands in the full
    (H, W, 3) BGR output of the LAB-channel CLAHE chain
    (kernels/colorspace.py), so P4/P5 run the reference's 3-D color
    math (seed homogeneity over color samples, Euclidean flood-fill
    distance) instead of the grayscale specialization."""
    if pre is None:
        pre = preprocess_illumination(working)
    seed = find_best_seed_point(pre)
    mask = find_check_mask(pre, seed)
    polygon = mask_to_polygon(mask, SIMPLIFY_PERCENT)
    if len(polygon) > 0:
        polygon = ensure_receipt_shape(polygon, mask)
    return min_area_rect_points(polygon)  # raises on empty → P14 branch
