"""R8: LLM text structuring (the visualizer's receipt parser).

Reference: services/visualizer/src/deepseek_client.py:24-114 — a chat
completion (temperature 0.1, max_tokens 2000) with a receipt-parser
system prompt, markdown-fence stripping, JSON parse, up to 3 attempts
with exponential backoff (2^attempt s) on 429/timeout/connection errors,
no retry on other 4xx. Output schema per prompt.txt:147-163:
{merchant, date, items:[{name, quantity, price, total}], subtotal, tax,
total, confidence, warnings}.

Spark-first shape: a `mapInPandas` stage with a per-executor HTTP
session and a token-bucket rate limiter (the distributed analog of the
reference's single client — N executors must share the provider's
rate, so the per-executor rate is budget/executors). The endpoint is
any OpenAI-compatible chat API, configured via the generic env vars
LLM_API_URL / LLM_API_KEY / LLM_MODEL; without them (this container has
no network) rows fall back to `HeuristicStructurer`, a deterministic
in-process parser producing the same schema — so the Spark plumbing is
fully tested and the LLM client is exercised the moment credentials
exist.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Iterator

RECEIPT_SCHEMA_DDL = (
    "doc_id string, span_order int, merchant string, date string, "
    "items string, subtotal double, tax double, total double, "
    "confidence string, warnings array<string>, error string"
)

_SYSTEM_PROMPT = (
    "You are a receipt parser. Extract structured data from raw OCR text. "
    "Respond with VALID JSON ONLY in the shape {merchant, date, items:"
    "[{name, quantity, price, total}], subtotal, tax, total, confidence, "
    "warnings}."
)

_PRICE_LINE = re.compile(r"^(?P<name>.*?)\s+(?P<amount>\d+(?:[.,]\d{1,2}))\s*$")
_DATE = re.compile(r"\b(\d{4})-(\d{2})-(\d{2})\b|\b(\d{2})[./](\d{2})[./](\d{4})\b")
_TOTAL_WORDS = ("total", "итог", "сумма")
_TAX_WORDS = ("tax", "ндс", "vat")


def strip_markdown_fences(content: str) -> str:
    """Exact fence-stripping semantics of deepseek_client.py:69-76."""
    content = content.strip()
    if content.startswith("```json"):
        content = content[7:]
    if content.startswith("```"):
        content = content[3:]
    if content.endswith("```"):
        content = content[:-3]
    return content.strip()


class HeuristicStructurer:
    """Deterministic receipt parse with the LLM output schema: first
    non-numeric line is the merchant, `name amount` lines are items,
    total/tax keywords map to their fields. Not a transformer — a stand-
    in that keeps the pipeline runnable and testable offline."""

    name = "heuristic"

    def structure_text(self, raw_text: str) -> dict[str, Any]:
        merchant = None
        items: list[dict[str, Any]] = []
        subtotal = tax = total = None
        warnings: list[str] = []
        date = None
        for line in (raw_text or "").splitlines():
            line = line.strip()
            if not line:
                continue
            dm = _DATE.search(line)
            if dm and date is None:
                if dm.group(1):
                    date = f"{dm.group(1)}-{dm.group(2)}-{dm.group(3)}"
                else:
                    date = f"{dm.group(6)}-{dm.group(5)}-{dm.group(4)}"
            m = _PRICE_LINE.match(line)
            lowered = line.lower()
            if m:
                amount = float(m.group("amount").replace(",", "."))
                name = m.group("name").strip()
                if any(w in lowered for w in _TOTAL_WORDS):
                    total = amount
                elif any(w in lowered for w in _TAX_WORDS):
                    tax = amount
                elif name:
                    items.append(
                        {"name": name, "quantity": None, "price": None, "total": amount}
                    )
            elif merchant is None:
                merchant = line
        if total is None and items:
            subtotal = round(sum(i["total"] or 0.0 for i in items), 2)
            warnings.append("total not found; subtotal from items")
        confidence = "high" if items and total is not None else ("medium" if items else "low")
        return {
            "merchant": merchant,
            "date": date,
            "items": items,
            "subtotal": subtotal,
            "tax": tax,
            "total": total,
            "confidence": confidence,
            "warnings": warnings,
        }


class LLMStructurer:
    """OpenAI-compatible chat client with the reference's exact retry
    contract (deepseek_client.py:56-114): ≤3 attempts, 2^attempt backoff
    on 429/timeout/connection error, 4xx≠429 fails fast, markdown fences
    stripped before json.loads, JSON decode error is terminal."""

    name = "llm"

    def __init__(
        self,
        api_url: str,
        api_key: str,
        model: str = "deepseek-chat",
        timeout: int = 60,
        sleep=time.sleep,
    ) -> None:
        import urllib.request  # stdlib; requests may be absent

        self._urllib = urllib.request
        self.api_url = api_url
        self.api_key = api_key
        self.model = model
        self.timeout = timeout
        self._sleep = sleep

    def _post(self, payload: dict) -> tuple[int, str]:
        req = self._urllib.Request(
            self.api_url,
            data=json.dumps(payload).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        try:
            with self._urllib.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read().decode()
        except Exception as exc:  # HTTPError carries a status
            status = getattr(exc, "code", None)
            if status is not None:
                return int(status), getattr(exc, "reason", str(exc))
            raise

    def structure_text(self, raw_text: str, max_retries: int = 3) -> dict[str, Any]:
        payload = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": _SYSTEM_PROMPT},
                {"role": "user", "content": raw_text},
            ],
            "temperature": 0.1,
            "max_tokens": 2000,
        }
        last_error = None
        for attempt in range(max_retries):
            try:
                status, body = self._post(payload)
            except Exception as exc:  # connection error → backoff retry
                last_error = f"request failed: {exc}"
                if attempt < max_retries - 1:
                    self._sleep(2**attempt)
                continue
            if status == 200:
                try:
                    content = json.loads(body)["choices"][0]["message"]["content"]
                    return json.loads(strip_markdown_fences(content))
                except (json.JSONDecodeError, KeyError, IndexError) as exc:
                    return {"error": "failed to parse api response", "details": str(exc)}
            if status == 429:
                self._sleep(2**attempt)
                last_error = f"rate limit (attempt {attempt + 1}/{max_retries})"
                continue
            last_error = f"api error {status}: {str(body)[:200]}"
            if 400 <= status < 500:
                break
        return {"error": "api request failed after retries", "details": last_error}


def get_structurer():
    """Executor-level structurer: LLM client when LLM_API_URL/KEY are
    configured, deterministic heuristic otherwise."""
    url, key = os.environ.get("LLM_API_URL"), os.environ.get("LLM_API_KEY")
    if url and key:
        return LLMStructurer(url, key, os.environ.get("LLM_MODEL", "deepseek-chat"))
    return HeuristicStructurer()


class TokenBucket:
    """Per-executor rate limiter: `rate` requests/sec sustained, burst of
    `burst`. The distributed analog of one client respecting a provider
    limit — configure rate = provider_limit / executors."""

    def __init__(self, rate: float, burst: int = 4, clock=time.monotonic, sleep=time.sleep):
        self.rate = rate
        self.capacity = float(burst)
        self.tokens = float(burst)
        self.last = clock()
        self._clock = clock
        self._sleep = sleep

    def acquire(self) -> None:
        while True:
            now = self._clock()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self._sleep((1.0 - self.tokens) / self.rate)


def structure_spans(df, rate_per_executor: float = 5.0):
    """mapInPandas stage: structure every extracted text span row
    (doc_id, span_order, text) into the receipt schema. The structurer
    and rate limiter are per-python-worker singletons."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        structurer = get_structurer()
        bucket = TokenBucket(rate_per_executor)
        limited = isinstance(structurer, LLMStructurer)
        for pdf in batches:
            rows = []
            for doc_id, order, text in zip(pdf["doc_id"], pdf["span_order"], pdf["text"]):
                if limited:
                    bucket.acquire()
                res = structurer.structure_text(text or "")
                err = res.get("error")
                rows.append(
                    {
                        "doc_id": doc_id,
                        "span_order": int(order),
                        "merchant": res.get("merchant"),
                        "date": res.get("date"),
                        "items": json.dumps(res.get("items", []), sort_keys=True),
                        "subtotal": res.get("subtotal"),
                        "tax": res.get("tax"),
                        "total": res.get("total"),
                        "confidence": res.get("confidence"),
                        "warnings": res.get("warnings", []),
                        "error": err,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, schema=RECEIPT_SCHEMA_DDL)
