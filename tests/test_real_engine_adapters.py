"""Real-engine adapters (R1/R2/R3): parsing semantics via stub modules,
clean skips when the libraries are absent, and the real-bytes path of
extract_media_span (reference tesseract.py:52-136, paddleocr
ocr.py:98-140, processor.ts:278-339)."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from ocr_service_spark.kernels import media


IMG = np.full((32, 32), 128, np.uint8)


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


# --- tesseract adapter ---------------------------------------------------------

def _fake_pytesseract(data):
    m = types.ModuleType("pytesseract")
    m.Output = types.SimpleNamespace(DICT="dict")
    m.image_to_data = lambda img, lang, config, output_type: data
    return m


def test_tesseract_adapter_token_filter_and_mean(monkeypatch):
    # conf > 0 gate drops -1 empty blocks; whitespace-only tokens dropped;
    # text = ' '.join, confidence = mean/100 (tesseract.py:102-115)
    data = {
        "conf": [-1, 90, 80, 50, 0],
        "text": ["", "Hello", "  ", "world", "x"],
    }
    monkeypatch.setitem(sys.modules, "pytesseract", _fake_pytesseract(data))
    media._REAL_ENGINES.clear()
    try:
        adapter = media.TesseractAdapter()
        text, conf = adapter.recognize(IMG)
        assert text == "Hello world"
        assert conf == pytest.approx((90 + 50) / 2 / 100.0)
        # empty result → 0.0 (tesseract.py:114)
        monkeypatch.setitem(
            sys.modules,
            "pytesseract",
            _fake_pytesseract({"conf": [-1], "text": [""]}),
        )
        adapter2 = media.TesseractAdapter()
        assert adapter2.recognize(IMG) == ("", 0.0)
    finally:
        media._REAL_ENGINES.clear()


def test_tesseract_adapter_config_string(monkeypatch):
    seen = {}

    def capture(img, lang, config, output_type):
        seen["lang"], seen["config"] = lang, config
        return {"conf": [], "text": []}

    m = types.ModuleType("pytesseract")
    m.Output = types.SimpleNamespace(DICT="dict")
    m.image_to_data = capture
    monkeypatch.setitem(sys.modules, "pytesseract", m)
    media.TesseractAdapter().recognize(IMG)
    assert seen["lang"] == "rus+eng"  # tesseract/src/config.py:22-25
    assert seen["config"] == "--psm 3 --oem 3"  # config.py:31-36


# --- paddle adapter ------------------------------------------------------------

def test_paddle_adapter_blocks_parse(monkeypatch):
    class FakeResult:
        json = {
            "res": {
                "rec_texts": ["line one", "line two"],
                "rec_scores": [0.9, 0.7],
                "dt_polys": [[[0, 0]], [[1, 1]]],
            }
        }

    class FakePaddleOCR:
        def __init__(self, lang):
            assert lang == "ru"

        def predict(self, arr):
            assert arr.ndim == 3 and arr.shape[2] == 3  # gray → RGB
            return [FakeResult()]

    m = types.ModuleType("paddleocr")
    m.PaddleOCR = FakePaddleOCR
    monkeypatch.setitem(sys.modules, "paddleocr", m)
    media._REAL_ENGINES.clear()
    try:
        text, conf = media.PaddleAdapter().recognize(IMG)
        assert text == "line one\nline two"  # '\n'.join (ocr.py:136)
        assert conf == pytest.approx(0.8)  # mean of scores (ocr.py:117)
    finally:
        media._REAL_ENGINES.clear()


# --- import gating --------------------------------------------------------------

@pytest.mark.skipif(_has("pytesseract"), reason="pytesseract installed")
def test_real_engine_raises_importerror_when_absent():
    media._REAL_ENGINES.clear()
    with pytest.raises(ImportError):
        media._real_engine("tesseract")


@pytest.mark.skipif(
    _has("zxingcpp") or _has("pyzbar") or _has("cv2"),
    reason="a QR decoder is installed",
)
def test_real_qr_decode_raises_importerror_when_absent():
    with pytest.raises(ImportError):
        media.real_qr_decode(IMG)


def test_try_qr_real_skips_to_ocr_without_decoder(monkeypatch):
    if _has("zxingcpp") or _has("pyzbar") or _has("cv2"):
        pytest.skip("a QR decoder is installed")
    assert media.try_qr_real(IMG, IMG, None) is None


# --- real-bytes end-to-end -------------------------------------------------------

def test_real_jpeg_bytes_fail_cleanly_without_libs():
    blob = b"\xff\xd8\xff\xe0" + b"\x00" * 64  # jpeg magic
    res = media.extract_media_span(blob, 0.6, None)
    if _has("PIL") or _has("cv2"):
        # decodable container: either a real result or a cascade failure
        assert res["status"] in ("completed", "failed")
    else:
        assert res["status"] == "failed"
        assert "decode unavailable" in res["error"]


@pytest.mark.skipif(
    not (_has("PIL") and _has("pytesseract")),
    reason="real OCR stack not installed",
)
def test_real_jpeg_smoke_path():
    # with a real stack present, a rendered text image round-trips
    import io

    from PIL import Image

    img = Image.new("L", (200, 80), 255)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    res = media.extract_media_span(buf.getvalue(), 0.0, None)
    assert res["status"] == "completed"


# --- cascade failure semantics ---------------------------------------------------

class _RaisingRecognizer:
    name = "raising"

    def __init__(self, fail_engines):
        self.fail = fail_engines

    def recognize(self, meta, image, engine, variant):
        if engine in self.fail:
            raise RuntimeError(f"{engine} down")
        return "ok", 0.9


def test_cascade_engine_failure_falls_through():
    # a raising attempt is skipped, the next engine serves the result
    # (processor.ts:424-441)
    res = media.run_cascade(
        {}, IMG, IMG, 0.6, _RaisingRecognizer({"tesseract"})
    )
    assert res.engine == "paddleocr" and res.text == "ok"


def test_cascade_all_engines_raise_propagates():
    with pytest.raises(RuntimeError, match="all OCR attempts failed"):
        media.run_cascade(
            {}, IMG, IMG, 0.6, _RaisingRecognizer({"tesseract", "paddleocr"})
        )
