"""R8 structuring kernel: heuristic parse, fence stripping, the LLM
client's exact retry contract (reference deepseek_client.py:56-114),
rate limiter, and the Spark mapInPandas stage."""

from __future__ import annotations

import json

import pytest

from ocr_service_spark.kernels import structuring as st


# --- fence stripping (deepseek_client.py:69-76) --------------------------------

@pytest.mark.parametrize(
    "raw,expect",
    [
        ('```json\n{"a": 1}\n```', '{"a": 1}'),
        ('```\n{"a": 1}\n```', '{"a": 1}'),
        ('{"a": 1}', '{"a": 1}'),
        ('  {"a": 1}  ', '{"a": 1}'),
    ],
)
def test_strip_markdown_fences(raw, expect):
    assert st.strip_markdown_fences(raw) == expect


# --- heuristic structurer -------------------------------------------------------

RECEIPT = """ACME STORE
2024-03-15
bread 12.50
milk 8,40
TAX 2.00
TOTAL 22.90
"""


def test_heuristic_parse_receipt():
    res = st.HeuristicStructurer().structure_text(RECEIPT)
    assert res["merchant"] == "ACME STORE"
    assert res["date"] == "2024-03-15"
    assert [i["name"] for i in res["items"]] == ["bread", "milk"]
    assert res["items"][1]["total"] == 8.40  # comma decimal normalized
    assert res["tax"] == 2.00 and res["total"] == 22.90
    assert res["confidence"] == "high" and res["warnings"] == []


def test_heuristic_missing_total_warns():
    res = st.HeuristicStructurer().structure_text("SHOP\nthing 5.00\n")
    assert res["total"] is None
    assert res["subtotal"] == 5.00
    assert res["confidence"] == "medium"
    assert any("total not found" in w for w in res["warnings"])


def test_heuristic_empty_text_low_confidence():
    res = st.HeuristicStructurer().structure_text("")
    assert res["items"] == [] and res["confidence"] == "low"


# --- receipt-corpus sidecar (the structured_receipts driver oracle) --------------

def test_receipt_sidecar_matches_parser(tmp_path):
    """The generation-time expected-record sidecar (spec arithmetic,
    datagen.generate_receipts) must agree with the real line parser on
    every rendered receipt — the local form of the structured_receipts
    driver hash check, covering all 8 variants."""
    import pyarrow.parquet as pq

    from ocr_service_spark.datagen import generate_receipts

    paths = generate_receipts(str(tmp_path), 64, seed=7)
    receipts = pq.read_table(paths["receipts"]).to_pylist()
    expected = {r["doc_id"]: r for r in pq.read_table(paths["receipts_expected"]).to_pylist()}
    assert len(receipts) == 64
    parser = st.HeuristicStructurer()
    for row in receipts:
        exp = expected[row["doc_id"]]
        res = parser.structure_text(row["text"])
        assert (res["merchant"] or "") == exp["merchant"], row["doc_id"]
        assert (res["date"] or "") == exp["date"], row["doc_id"]
        assert json.dumps(res["items"], sort_keys=True) == exp["items"], row["doc_id"]
        for k in ("subtotal", "tax", "total"):
            got = res[k] if res[k] is not None else -1.0
            assert got == exp[k], (row["doc_id"], k)
        assert res["confidence"] == exp["confidence"], row["doc_id"]
        assert json.dumps(res["warnings"], separators=(",", ":")) == exp["warnings"]
    # all variants represented with distinct confidence classes
    assert {e["confidence"] for e in expected.values()} == {"high", "medium", "low"}


# --- LLM client retry contract ---------------------------------------------------

def _client(responses, sleeps):
    c = st.LLMStructurer("http://x/v1/chat", "k", sleep=sleeps.append)
    it = iter(responses)

    def post(payload):
        r = next(it)
        if isinstance(r, Exception):
            raise r
        return r

    c._post = post
    return c


def _ok(content):
    return (200, json.dumps({"choices": [{"message": {"content": content}}]}))


def test_llm_success_with_fences():
    c = _client([_ok('```json\n{"merchant": "m"}\n```')], [])
    assert c.structure_text("x") == {"merchant": "m"}


def test_llm_429_backoff_then_success():
    sleeps = []
    c = _client([(429, "slow down"), _ok('{"ok": 1}')], sleeps)
    assert c.structure_text("x") == {"ok": 1}
    assert sleeps == [1]  # 2^0


def test_llm_429_exhausts_retries():
    sleeps = []
    c = _client([(429, ""), (429, ""), (429, "")], sleeps)
    res = c.structure_text("x")
    assert res["error"] == "api request failed after retries"
    assert "rate limit" in res["details"]
    assert sleeps == [1, 2, 4]  # 2^attempt backoff

def test_llm_4xx_fails_fast():
    sleeps = []
    c = _client([(401, "bad key"), _ok("{}")], sleeps)
    res = c.structure_text("x")
    assert "api error 401" in res["details"]
    assert sleeps == []  # no retry on non-429 4xx


def test_llm_connection_error_retries():
    sleeps = []
    c = _client([OSError("boom"), _ok('{"a": 2}')], sleeps)
    assert c.structure_text("x") == {"a": 2}
    assert sleeps == [1]


def test_llm_bad_json_terminal():
    c = _client([_ok("not json")], [])
    assert st.LLMStructurer.structure_text(c, "x")["error"] == (
        "failed to parse api response"
    )


# --- rate limiter ----------------------------------------------------------------

def test_token_bucket_rate():
    clock = {"t": 0.0}
    sleeps = []

    def sleep(s):
        sleeps.append(s)
        clock["t"] += s

    b = st.TokenBucket(rate=2.0, burst=2, clock=lambda: clock["t"], sleep=sleep)
    for _ in range(6):
        b.acquire()
    # burst of 2 free, then 4 more at 2/s → ~2s of sleeping total
    assert sum(sleeps) == pytest.approx(2.0, abs=0.01)


# --- Spark stage -----------------------------------------------------------------

def test_structure_spans_stage(spark):
    df = spark.createDataFrame(
        [("d1", 0, RECEIPT), ("d2", 1, None)],
        "doc_id string, span_order int, text string",
    )
    out = {r["doc_id"]: r for r in st.structure_spans(df).collect()}
    assert out["d1"]["merchant"] == "ACME STORE"
    assert out["d1"]["total"] == 22.90
    assert json.loads(out["d1"]["items"])[0]["name"] == "bread"
    assert out["d2"]["confidence"] == "low" and out["d2"]["error"] is None
