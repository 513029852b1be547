"""Color-image front end P2/P3 for real color media: cv2-semantics
BGR↔gray/LAB in pure numpy plus the reference's COLOR illumination chain.

The reference aligner preprocesses COLOR frames — 5×5 Gaussian blur →
BGR2LAB → CLAHE(clip 1.5, 8×8) on the L channel → merge → LAB2BGR →
×1.2 contrast gain (reference services/aligner/src/services/common.py:21-33)
— and dark-inverts on the mean of the BGR2GRAY frame (common.py:9-18).
The engine's synthetic SIMG corpus is grayscale, where those formulas
specialize exactly (align.py module notes); this module restores the
true LAB-channel CLAHE for real color images (jpeg/png/webp via
decode_real_image_any), the one documented grayscale specialization the
round-3 review listed as missing.

Parity notes:

- ``bgr_to_gray`` reproduces cv2's 8-bit fixed-point Rec.601 transform
  exactly: ``(R·4899 + G·9617 + B·1868 + 8192) >> 14``.
- ``bgr_to_lab`` / ``lab_to_bgr`` implement the documented cvtColor
  formula (D65 white point, NO sRGB gamma for 8-bit inputs — cv2 does
  not linearize for Lab) in float32; cv2 itself runs the same math
  through fixed-point interpolation tables. Same deviation class as the
  CLAHE float intermediates documented in align.py. Pinned fixtures in
  tests/test_colorspace.py match the published cv2 8-bit values
  (e.g. pure red BGR(0,0,255) → LAB(136, 208, 195)).
- Downstream of illumination the chain stays grayscale-native: the
  3-D color flood-fill distance (aligner.py:386-389) specializes to
  |Δ| on the luminance frame. What changes for color inputs is WHERE
  the contrast equalization happens — on L of LAB, as the reference
  does — not the mask algebra.
"""

from __future__ import annotations

import numpy as np

from . import align

# D65 white point and the CIE linear threshold (OpenCV cvtColor docs).
_XN = 0.950456
_ZN = 1.088754
_T0 = 0.008856  # (6/29)^3


def bgr_to_gray(bgr: np.ndarray) -> np.ndarray:
    """cv2 COLOR_BGR2GRAY, bit-exact 8-bit fixed point (Rec.601 weights
    0.299/0.587/0.114 scaled by 2^14 with round-half-up)."""
    b = bgr[..., 0].astype(np.int32)
    g = bgr[..., 1].astype(np.int32)
    r = bgr[..., 2].astype(np.int32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


def _cie_f(t: np.ndarray) -> np.ndarray:
    return np.where(t > _T0, np.cbrt(t), 7.787 * t + 16.0 / 116.0)


def bgr_to_lab(bgr: np.ndarray) -> np.ndarray:
    """cv2 COLOR_BGR2LAB for 8-bit inputs (documented float formula):
    RGB/255 → XYZ (linear matrix, D65) → L*a*b*, then the 8-bit packing
    L·255/100, a+128, b+128."""
    rgb = bgr[..., ::-1].astype(np.float32) / np.float32(255.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    x = (0.412453 * r + 0.357580 * g + 0.180423 * b) / _XN
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / _ZN
    lum = np.where(y > _T0, 116.0 * np.cbrt(y) - 16.0, 903.3 * y)
    fy = _cie_f(y)
    a = 500.0 * (_cie_f(x) - fy) + 128.0
    bb = 200.0 * (fy - _cie_f(z)) + 128.0
    lab = np.stack([lum * (255.0 / 100.0), a, bb], axis=-1)
    return np.clip(np.rint(lab), 0, 255).astype(np.uint8)


def lab_to_bgr(lab: np.ndarray) -> np.ndarray:
    """Inverse of bgr_to_lab (cv2 COLOR_LAB2BGR, 8-bit unpacking then the
    standard CIE inverse and the inverse XYZ→RGB matrix)."""
    lum = lab[..., 0].astype(np.float32) * np.float32(100.0 / 255.0)
    a = lab[..., 1].astype(np.float32) - np.float32(128.0)
    b = lab[..., 2].astype(np.float32) - np.float32(128.0)
    fy = (lum + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def _finv(t: np.ndarray) -> np.ndarray:
        t3 = t * t * t
        return np.where(t3 > _T0, t3, (t - 16.0 / 116.0) / 7.787)

    y = np.where(lum > 903.3 * _T0, fy * fy * fy, lum / 903.3)
    x = _finv(fx) * _XN
    z = _finv(fz) * _ZN
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875992 * y + 0.041556 * z
    bl = 0.055648 * x - 0.204043 * y + 1.057311 * z
    bgr = np.stack([bl, g, r], axis=-1)
    return np.clip(np.rint(bgr * 255.0), 0, 255).astype(np.uint8)


def invert_if_dark_color(bgr: np.ndarray) -> tuple[np.ndarray, bool]:
    """P2 for color frames (common.py:9-18): the dark test runs on the
    BGR2GRAY mean, the inversion on the color frame itself. Shares the
    gray path's configured threshold so the two P2 stages can never
    silently diverge."""
    from ..config import DARK_INVERT_MEAN_THRESHOLD

    if float(bgr_to_gray(bgr).mean()) < DARK_INVERT_MEAN_THRESHOLD:
        return (255 - bgr), True
    return bgr, False


def preprocess_illumination_color(bgr: np.ndarray) -> np.ndarray:
    """P3 full COLOR chain (common.py:21-33): per-channel 5×5 Gaussian
    blur (cv2.GaussianBlur applies the separable kernel to each channel
    independently) → BGR2LAB → CLAHE(1.5, 8×8) on L only → merge →
    LAB2BGR → ×1.2 gain on every channel."""
    blurred = np.stack(
        [align.gaussian_blur5(np.ascontiguousarray(bgr[..., c])) for c in range(3)],
        axis=-1,
    )
    lab = bgr_to_lab(blurred)
    lab[..., 0] = align.clahe(np.ascontiguousarray(lab[..., 0]))
    # ×1.2 gain via the grayscale chain's own LUT (align._GAIN_LUT:
    # saturate(round(v·1.2)), cv2.addWeighted semantics) so a gain
    # change can never diverge between the gray and color paths
    return align._GAIN_LUT[lab_to_bgr(lab)]
