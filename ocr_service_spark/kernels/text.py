"""Plain-text span kernel: whitespace normalization.

The reference emits OCR text as token joins (' '.join — reference:
services/tesseract/src/services/tesseract.py:111); for raw text spans the
extraction contract is the same canonical form: single-space separated,
stripped.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")


def normalize_text(text: str | None) -> str:
    """Collapse all whitespace runs to single spaces and strip ends."""
    if not text:
        return ""
    return _WS_RE.sub(" ", text).strip()
