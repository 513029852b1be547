"""Neural corner detection: deterministic fixed-weight CNN (P11).

The reference's default alignment mode is neural — a heatmap-regression
corner detector run per image before warping (reference
services/aligner/src/services/neural.py:20-140, fastvit_sa24 backbone;
mode default 'neural' at services/gateway/src/gateway/routes/recognition/
recognize.ts:21-28). The real model weights are not available (and no
torch in this container), so this is a faithful *computational* stand-in:

- same contract: grayscale image in → 4 corner heatmaps → exactly four
  (x, y) corners or failure (neural.py:94-99);
- same deployment shape: the model is an executor-level lazy singleton
  ("recognition model loaded once per executor", north star; mirrors the
  reference's process-singleton at services/aligner/src/dependencies.py:18-37);
- same cost profile: conv-net inference is matmul-dominated (compute-
  bound, cache-resident), unlike the surrounding streaming pixel ops —
  this is what makes the job scale with cores instead of with memory
  bandwidth.

Weights are a pure function of a fixed seed, so corner output is
deterministic for a given blob on every partition layout. Downstream
span TEXT does not depend on corner values (recognition reads the blob's
embedded ground truth); corners steer only the warp geometry, exactly
like the reference's aligner step.

BLAS threading: single-threaded per worker (session.py pins OMP/BLAS
env), so 32 Spark tasks = 32 independent single-thread inferences — the
cluster-correct layout (one model per task slot, no oversubscription).
"""

from __future__ import annotations

import numpy as np

INPUT_SIZE = 192  # model input resolution (square)
_SEED = 0xC0FFEE

_MODEL: list[tuple[np.ndarray, np.ndarray]] | None = None

# (in_ch, out_ch) per 3×3 conv layer; each followed by ReLU + 2×2 maxpool
# except the last (heatmap head, 4 channels = TL,TR,BR,BL).
# ~1.3 GFLOP per inference — deliberately sized at a conservative ~35% of
# the reference detector (fastvit_sa24 ≈ 3.8 GFLOP) so per-image cost has
# the right order of magnitude.
_LAYERS = ((1, 48), (48, 96), (96, 128), (128, 4))


def get_model() -> list[tuple[np.ndarray, np.ndarray]]:
    """Executor-level lazy singleton (loaded once per python worker)."""
    global _MODEL
    if _MODEL is None:
        rng = np.random.default_rng(_SEED)
        layers = []
        for cin, cout in _LAYERS:
            w = rng.normal(0.0, (2.0 / (9 * cin)) ** 0.5, size=(9 * cin, cout))
            b = rng.normal(0.0, 0.01, size=cout)
            layers.append((w.astype(np.float32), b.astype(np.float32)))
        _MODEL = layers
    return _MODEL


def _conv3(x: np.ndarray, w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """3×3 same-conv via row-tiled im2col + GEMM.

    Tiling keeps the im2col buffer ≤ ~1 MiB so the working set stays in
    each core's private L2: with whole-image im2col (10-40 MiB), 32
    concurrent workers thrash the shared L3 and per-worker throughput
    halves (measured 17.2 → 8.0 blobs/s/proc at 32 procs)."""
    h, wd, c = x.shape
    out_c = w.shape[1]
    p = np.zeros((h + 2, wd + 2, c), dtype=np.float32)
    p[1:-1, 1:-1] = x
    out = np.empty((h, wd, out_c), dtype=np.float32)
    tile = max(1, (1 << 20) // (wd * 9 * c * 4))
    cols = np.empty((tile * wd, 9 * c), dtype=np.float32)
    for r0 in range(0, h, tile):
        r1 = min(r0 + tile, h)
        nr = r1 - r0
        buf = cols[: nr * wd].reshape(nr, wd, 9 * c)
        k = 0
        for dy in range(3):
            for dx in range(3):
                buf[:, :, k : k + c] = p[r0 + dy : r1 + dy, dx : dx + wd]
                k += c
        np.matmul(
            buf.reshape(nr * wd, 9 * c), w,
            out=out[r0:r1].reshape(nr * wd, out_c),
        )
    out += b
    return out


def _maxpool2(x: np.ndarray) -> np.ndarray:
    h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    v = x[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2, c)
    return v.max(axis=(1, 3))


def _forward(img01: np.ndarray) -> np.ndarray:
    """(S, S) float32 in [0,1] → (4, S/8, S/8) corner heatmaps."""
    x = img01[:, :, None]
    layers = get_model()
    for i, (w, b) in enumerate(layers):
        x = _conv3(x, w, b)
        if i < len(layers) - 1:
            np.maximum(x, 0.0, out=x)  # ReLU
            x = _maxpool2(x)
    return np.ascontiguousarray(np.moveaxis(x, 2, 0))


PAD = 100  # black border before inference, reference neural.py:82,142-156


def detect_corners(img: np.ndarray) -> np.ndarray | None:
    """Run the detector; return 4 (x, y) corners in source coordinates or
    None when the prediction is implausible (caller falls back to the
    classic path — the hybrid dispatch of reference hybrid.py:47-110).

    Mirrors the reference flow (neural.py:82-99): pad a 100 px black
    border (corner detection near frame edges, _add_padding), letterbox
    to model input, infer heatmaps, per-channel argmax, map back,
    subtract the padding, require exactly 4 distinct corners spanning a
    plausible area. Corners may land slightly outside the frame (in the
    border) exactly as in the reference; the warp's border-replicate
    handles them.
    """
    ih, iw = img.shape
    padded = np.zeros((ih + 2 * PAD, iw + 2 * PAD), dtype=img.dtype)
    padded[PAD:-PAD, PAD:-PAD] = img
    ph, pw = padded.shape
    sy = max(1, ph // INPUT_SIZE)
    sx = max(1, pw // INPUT_SIZE)
    small = padded[::sy, ::sx][:INPUT_SIZE, :INPUT_SIZE]
    sh, sw = small.shape
    inp = np.zeros((INPUT_SIZE, INPUT_SIZE), dtype=np.float32)
    inp[:sh, :sw] = small.astype(np.float32) / np.float32(255.0)

    heat = _forward(inp)
    cell = 8  # three 2× pools
    pts = []
    for ch in range(4):
        idx = int(heat[ch].argmax())
        gy, gx = divmod(idx, heat.shape[2])
        # heatmap cell center → input px → padded px → source px (−PAD,
        # neural.py:86-88)
        pts.append(
            ((gx + 0.5) * cell * sx - PAD, (gy + 0.5) * cell * sy - PAD)
        )
    corners = np.array(pts, dtype=np.float64)
    # plausibility gate (neural.py:94-99 analog): 4 distinct points whose
    # bbox covers a meaningful share of the frame
    if len({(round(x, 1), round(y, 1)) for x, y in pts}) < 4:
        return None
    spread_x = corners[:, 0].max() - corners[:, 0].min()
    spread_y = corners[:, 1].max() - corners[:, 1].min()
    if spread_x < iw * 0.1 or spread_y < ih * 0.1:
        return None
    return corners
