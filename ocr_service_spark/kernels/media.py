"""Media span kernel: decode → align → binarize → QR attempt → OCR cascade.

This is the batch re-expression of the reference worker's hot path
(reference: services/gateway/src/services/processor.ts:57-260; SURVEY.md
§3.2): one pure function per image, invoked over Arrow record batches by
the pipeline layer, with recognition models held as executor-level
singletons.

Real OCR engines (pytesseract / paddleocr / a QR decoder) are not in this
container. The container-boundary is explicit:

- `SIMG1` blobs — the deterministic synthetic image format produced by
  ``ocr_service_spark.datagen`` — carry their ground-truth recognition
  payload; the ``StubRecognizer`` "infers" it after the *real* numpy
  preprocessing chain runs. This keeps the Spark-side plumbing (schemas,
  batching, cascade masking, skew salting) real and benchmarkable.
- real jpeg/png bytes route to engine adapters that import pytesseract /
  paddleocr lazily and raise ``NotImplementedError`` when absent.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from ..config import (
    ALLOWED_MEDIA_MAGIC,
    CASCADE_ATTEMPTS,
    KERNEL_TIMEOUT_S,
    MAX_MEDIA_BYTES,
)
from . import align, imageops, neural

SIMG_MAGIC = b"SIMG1\n"


# --------------------------------------------------------------------------
# blob codec (the synthetic stand-in for jpeg/png receipts)
# --------------------------------------------------------------------------

def encode_simg(meta: dict, pixels: np.ndarray) -> bytes:
    """Pack a synthetic grayscale image: magic + JSON meta line + raw u8."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 2
    head = json.dumps(meta, sort_keys=True, separators=(",", ":")).encode()
    return SIMG_MAGIC + head + b"\n" + pixels.tobytes()


def decode_simg(blob: bytes) -> tuple[dict, np.ndarray]:
    """Unpack; P1 decode analog (reference aligner.py:144-152)."""
    if not blob.startswith(SIMG_MAGIC):
        raise ValueError("not a SIMG1 blob")
    nl = blob.index(b"\n", len(SIMG_MAGIC))
    meta = json.loads(blob[len(SIMG_MAGIC) : nl])
    h, w = int(meta["h"]), int(meta["w"])
    pixels = np.frombuffer(blob[nl + 1 :], dtype=np.uint8, count=h * w).reshape(h, w)
    return meta, pixels


SVID_MAGIC = b"SVID1\n"
SAUD_MAGIC = b"SAUD1\n"


def encode_svid(meta: dict, frames: np.ndarray) -> bytes:
    """Pack a synthetic video: magic + JSON meta + raw u8 frames
    (n_frames, h, w). Stand-in for mp4/webm the way SIMG stands in for
    jpeg — real codecs need ffmpeg/PyAV, absent in this container."""
    assert frames.dtype == np.uint8 and frames.ndim == 3
    head = json.dumps(meta, sort_keys=True, separators=(",", ":")).encode()
    return SVID_MAGIC + head + b"\n" + frames.tobytes()


def decode_svid(blob: bytes) -> tuple[dict, np.ndarray]:
    if not blob.startswith(SVID_MAGIC):
        raise ValueError("not a SVID1 blob")
    nl = blob.index(b"\n", len(SVID_MAGIC))
    meta = json.loads(blob[len(SVID_MAGIC) : nl])
    n, h, w = int(meta["n_frames"]), int(meta["h"]), int(meta["w"])
    frames = np.frombuffer(blob[nl + 1 :], dtype=np.uint8, count=n * h * w).reshape(n, h, w)
    return meta, frames


def encode_saud(meta: dict, samples: np.ndarray) -> bytes:
    """Pack synthetic audio: magic + JSON meta + int16 little-endian PCM."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    head = json.dumps(meta, sort_keys=True, separators=(",", ":")).encode()
    return SAUD_MAGIC + head + b"\n" + samples.astype("<i2").tobytes()


def decode_saud(blob: bytes) -> tuple[dict, np.ndarray]:
    if not blob.startswith(SAUD_MAGIC):
        raise ValueError("not a SAUD1 blob")
    nl = blob.index(b"\n", len(SAUD_MAGIC))
    meta = json.loads(blob[len(SAUD_MAGIC) : nl])
    samples = np.frombuffer(blob[nl + 1 :], dtype="<i2", count=int(meta["n"]))
    return meta, samples


def validate_media(blob: bytes | None) -> str | None:
    """MIME/size gate (reference services/gateway/src/services/ocr.ts:42-49).
    Returns an error string or None."""
    if blob is None or len(blob) == 0:
        return "empty media"
    if len(blob) > MAX_MEDIA_BYTES:
        return "media exceeds 10 MiB"
    if not any(blob.startswith(m) for m in ALLOWED_MEDIA_MAGIC):
        return "unsupported media type"
    return None


# --------------------------------------------------------------------------
# QR (R3-R5)
# --------------------------------------------------------------------------

def classify_qr_format(data: str) -> str:
    """fiscal | url | unknown (reference processor.ts:341-355)."""
    if "fn=" in data or "&fn=" in data or ("t=" in data and "s=" in data and "fp=" in data):
        return "fiscal"
    if data.startswith("http://") or data.startswith("https://"):
        return "url"
    return "unknown"


def _qr_decode_stub(meta: dict, variant: str) -> dict | None:
    """Deterministic stand-in for zxing readBarcodes (processor.ts:278-339).
    The SIMG meta says whether a QR symbol is resolvable in each variant."""
    qr = meta.get("qr")
    if not qr:
        return None
    visible = qr.get("in_warped", True) if variant == "warped" else qr.get(
        "in_preprocessed", True
    )
    if not visible:
        return None
    x, y, w, h = qr.get("location", [0, 0, 0, 0])
    return {"data": qr["data"], "location": {"x": int(x), "y": int(y), "width": int(w), "height": int(h)}}


def try_qr(meta: dict, accepted_formats: tuple[str, ...] | None) -> dict | None:
    """Try warped first, then preprocessed; record found_in_preprocessed
    (processor.ts:176-217,278-339). Accept only if the classified format is
    in ``accepted_formats`` (None → accept all)."""
    for variant in ("warped", "preprocessed"):
        hit = _qr_decode_stub(meta, variant)
        if hit is None:
            continue
        fmt = classify_qr_format(hit["data"])
        if accepted_formats is not None and fmt not in accepted_formats:
            return None  # found but filtered → fall through to OCR
        return {
            "qr_data": hit["data"],
            "qr_format": fmt,
            "qr_location": hit["location"],
            "found_in_preprocessed": variant == "preprocessed",
        }
    return None


# --------------------------------------------------------------------------
# recognizers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class EngineResult:
    text: str
    confidence: float
    engine: str
    used_preprocessed: bool


class StubRecognizer:
    """Deterministic recognizer over SIMG blobs.

    Engine-specific text assembly mirrors the reference exactly:
    tesseract joins word tokens with spaces (tesseract.py:111); paddleocr
    joins block lines with newlines (paddleocr ocr.py:139). Per-attempt
    confidences come from the blob so the cascade's gating is exercised
    with real control flow.
    """

    name = "stub"

    def recognize(self, meta: dict, image: np.ndarray, engine: str, variant: str) -> tuple[str, float]:
        lines: list[str] = meta.get("lines", [])
        conf = float(meta.get("conf", {}).get(f"{engine}_{variant}", 0.0))
        if engine == "tesseract":
            # token filter + ' '.join + mean/100, empty → 0.0
            # (tesseract.py:102-115)
            tokens = [t for line in lines for t in line.split() if t]
            text = " ".join(tokens)
            if not tokens:
                conf = 0.0
        else:
            # paddle: '\n'.join block texts (ocr.py:139)
            text = "\n".join(lines)
            if not lines:
                conf = 0.0
        return text, conf


def _real_engine(engine: str):
    """Adapter for real OCR engines, imported lazily; absent in this
    container → NotImplementedError (plumbing is container-gated, the
    SIMG path is the tested one)."""
    if engine == "tesseract":
        import pytesseract  # noqa: F401

        raise NotImplementedError("pytesseract adapter: wire image_to_data psm=3 oem=3")
    import paddleocr  # noqa: F401

    raise NotImplementedError("paddleocr adapter: wire PaddleOCR.predict")


# --------------------------------------------------------------------------
# per-image extraction (the whole worker hot path, pure)
# --------------------------------------------------------------------------

def run_cascade(
    meta: dict,
    warped: np.ndarray,
    preprocessed: np.ndarray,
    confidence_low: float,
    recognizer: StubRecognizer,
    attempts: tuple[tuple[str, str], ...] = CASCADE_ATTEMPTS,
) -> EngineResult:
    """Confidence-gated engine cascade (processor.ts:366-477): accept the
    first attempt with confidence >= threshold_low; if all attempts are
    below the gate, return the LAST attempt's (low-confidence) result
    (processor.ts:443-474)."""
    last: EngineResult | None = None
    for engine, variant in attempts:
        img = preprocessed if variant == "preprocessed" else warped
        text, conf = recognizer.recognize(meta, img, engine, variant)
        last = EngineResult(text, conf, engine, variant == "preprocessed")
        if conf >= confidence_low:
            return last
    assert last is not None
    return last


CLASSIC_MAX_SIDE = 480  # processing-resolution cap for the P3-P8 chain


def extract_media_span(
    blob: bytes | None,
    confidence_low: float,
    accepted_qr_formats: tuple[str, ...] | None,
    recognizer: StubRecognizer | None = None,
    aggressive: bool = False,
    timeout_s: float | None = KERNEL_TIMEOUT_S,
) -> dict:
    """Full single-image extraction: validate → decode → align → binarize →
    QR short-circuit → OCR cascade. Pure function of the blob bytes.

    Q9 timeout guard: a soft monotonic deadline (default 30 s, the
    reference's per-engine-call OCR_ENGINE_TIMEOUT, config/index.ts:24)
    is checked between kernel stages and cascade attempts; on breach the
    span completes as FAILED instead of hanging its task (the batch
    analog of asyncio.wait_for + BullMQ job failure). The
    spark.task.reaper conf in session.py is the hard backstop.

    Returns a dict matching SPAN_DETAIL_SCHEMA's media fields.
    """
    import time as _time

    deadline = (_time.monotonic() + timeout_s) if timeout_s else None

    def _timed_out() -> bool:
        return deadline is not None and _time.monotonic() > deadline

    recognizer = recognizer or StubRecognizer()
    err = validate_media(blob)
    if err is not None:
        return {"status": "failed", "error": err, "kind": "media_text", "text": None}

    if not blob.startswith(SIMG_MAGIC):
        # real image formats: container-gated engine path
        try:
            _real_engine("tesseract")
        except (ImportError, NotImplementedError) as exc:
            return {
                "status": "failed",
                "error": f"real-image OCR unavailable: {exc}",
                "kind": "media_text",
                "text": None,
            }

    meta, img = decode_simg(blob)

    # --- alignment (hybrid dispatch P12, reference hybrid.py:47-110) ---
    img = imageops.downscale_max_side(img)  # det_limit_side_len analog
    # Neural corner detection first on the raw frame (default mode,
    # recognize.ts:21-28; the neural aligner gets the unprocessed image,
    # hybrid.py:67-70); the classic chain on any failure or decline.
    warped = None
    try:
        nc = neural.detect_corners(img)
        if nc is not None:
            warped = imageops.warp_perspective(img, imageops.order_corners(nc))
    except Exception:  # ANY neural-path failure → classic (hybrid.py:59-97)
        warped = None
    if warped is None:
        # Classic chain P2-P8 (aligner.py:58-175): dark-invert, then
        # CLAHE → seed point → flood-fill mask → polygon → minAreaRect.
        # The mask chain runs at a capped resolution (same engineering
        # device as downscale_max_side — flood fill and contour tracing
        # cost ~linear in pixels) and the corners scale back; the warp
        # samples the ORIGINAL (uninverted) frame, aligner.py:203-204.
        try:
            working, _inverted = imageops.invert_if_dark(img)  # P2
            step = max(1, -(-max(working.shape) // CLASSIC_MAX_SIDE))
            small = (
                np.ascontiguousarray(working[::step, ::step])
                if step > 1
                else working
            )
            corners = align.classic_align_corners(small) * float(step)
            warped = imageops.warp_perspective(
                img, imageops.order_corners(corners)
            )
        except Exception:
            # P14: the gateway's local preprocessing fallback
            # (processor.ts:139-147), in-process — bbox of the bright
            # foreground (the reference's own degenerate path).
            corners = imageops.mask_bbox_corners(img)
            warped = imageops.warp_perspective(img, corners)
    if _timed_out():
        return {
            "status": "failed",
            "error": f"kernel timeout after {timeout_s:.0f}s (alignment)",
            "kind": "media_text",
            "text": None,
        }
    preprocessed = imageops.preprocess_for_ocr(warped, aggressive)  # P13

    # --- QR short-circuit (R7) ---
    qr = try_qr(meta, accepted_qr_formats)
    if qr is not None:
        return {
            "status": "completed",
            "kind": "qr",
            "text": qr["qr_data"],
            "qr_data": qr["qr_data"],
            "qr_format": qr["qr_format"],
            "qr_location": qr["qr_location"],
            "found_in_preprocessed": qr["found_in_preprocessed"],
            "error": None,
        }

    # --- OCR cascade (R6) ---
    if _timed_out():
        return {
            "status": "failed",
            "error": f"kernel timeout after {timeout_s:.0f}s (pre-cascade)",
            "kind": "media_text",
            "text": None,
        }
    res = run_cascade(meta, warped, preprocessed, confidence_low, recognizer)
    return {
        "status": "completed",
        "kind": "media_text",
        "text": res.text,
        "engine": res.engine,
        "confidence": round(res.confidence, 2),  # numeric(3,2), schema.ts:41
        "used_preprocessed": res.used_preprocessed,
        "error": None,
    }
