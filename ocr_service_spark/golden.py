"""Sequential per-document reference extraction (golden-fixture producer).

A deliberately simple, single-threaded, per-document loop over the same
pure kernels — the semantic spec the distributed pipeline must reproduce
under the (kind, text, media_ref, order) span-sequence invariant
(BASELINE.json input_hint). The Spark pipeline is verified against this
for plumbing correctness (explode / shuffle / reassembly / resume);
kernel-level correctness is covered by hand-written unit fixtures
(tests/test_kernels_*).
"""

from __future__ import annotations

from .config import ExtractConfig
from .kernels.html import strip_boilerplate
from .kernels.media import extract_media_span
from .kernels.pdf import reconstruct_reading_order
from .kernels.text import normalize_text


def extract_document(
    spans: list[dict],
    media_lookup: dict[str, bytes],
    cfg: ExtractConfig | None = None,
) -> list[dict]:
    """Extract one document's output span sequence, in offset order."""
    cfg = cfg or ExtractConfig()
    out = []
    ordered = sorted(spans, key=lambda s: s["offset"])
    for order, span in enumerate(ordered):
        kind = span["kind"]
        if kind == "text":
            out.append({"kind": "text", "text": normalize_text(span["text"]), "media_ref": None, "order": order})
        elif kind == "html":
            out.append({"kind": "text", "text": strip_boilerplate(span["text"]), "media_ref": None, "order": order})
        elif kind == "pdf":
            out.append({"kind": "text", "text": reconstruct_reading_order(span["text"]), "media_ref": None, "order": order})
        elif kind == "media":
            blob = media_lookup.get(span["media_ref"])
            res = extract_media_span(
                blob,
                cfg.confidence_low,
                cfg.accepted_qr_formats,
                aggressive=cfg.aggressive,
                timeout_s=cfg.kernel_timeout_s,
                warp_interp=cfg.warp_interp,
                alignment_mode=cfg.alignment_mode,
            )
            out.append(
                {
                    "kind": res["kind"] if res["status"] == "completed" else "media_text",
                    "text": res.get("text"),
                    "media_ref": span["media_ref"],
                    "order": order,
                }
            )
        else:
            out.append({"kind": "text", "text": "", "media_ref": None, "order": order})
    return out
