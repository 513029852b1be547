"""Kernel-level unit fixtures (FIXTURES.md §5) — no Spark required."""

from __future__ import annotations

from ocr_service_spark.kernels.html import strip_boilerplate
from ocr_service_spark.kernels.pdf import reconstruct_reading_order
from ocr_service_spark.kernels.text import normalize_text


# --- text normalization -----------------------------------------------------

def test_normalize_collapses_whitespace():
    assert normalize_text("  a\t b\n\nc  ") == "a b c"


def test_normalize_empty_and_none():
    assert normalize_text("") == ""
    assert normalize_text(None) == ""
    assert normalize_text("   \n\t ") == ""


# --- html boilerplate strip ---------------------------------------------------

CONTENT = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind distant quiet hills tonight"
)


def test_html_keeps_long_low_link_paragraph():
    html = f"<html><body><p>{CONTENT}</p></body></html>"
    assert strip_boilerplate(html) == CONTENT


def test_html_drops_nav_and_footer():
    html = (
        "<html><body>"
        '<nav><a href="/a">home page</a> <a href="/b">about page link</a> '
        '<a href="/c">contact us now</a> more words here to pass length</nav>'
        f"<p>{CONTENT}</p>"
        "<footer>copyright words and some legal text that is long enough "
        '<a href="/l">terms</a></footer>'
        "</body></html>"
    )
    assert strip_boilerplate(html) == CONTENT


def test_html_drops_link_farm():
    farm = " ".join(f'<a href="/{i}">link{i} word{i}</a>' for i in range(10))
    html = f"<body><div>{farm}</div><p>{CONTENT}</p></body>"
    assert strip_boilerplate(html) == CONTENT


def test_html_short_block_dropped_when_content_exists():
    html = f"<body><div>short note</div><p>{CONTENT}</p></body>"
    assert strip_boilerplate(html) == CONTENT


def test_html_fallback_densest_block_when_nothing_passes():
    # all blocks under MIN_WORDS → fall back to the wordiest block
    html = "<body><div>one two three</div><div>four five six seven</div></body>"
    assert strip_boilerplate(html) == "four five six seven"


def test_html_script_style_ignored():
    html = f"<body><script>var x = 1;</script><style>p{{}}</style><p>{CONTENT}</p></body>"
    assert strip_boilerplate(html) == CONTENT


def test_html_plaintext_passthrough():
    assert strip_boilerplate("no tags here at all") == "no tags here at all"
    assert strip_boilerplate("") == ""
    assert strip_boilerplate(None) == ""


def test_html_multiple_content_blocks_joined_with_newline():
    html = f"<body><p>{CONTENT}</p><p>{CONTENT}</p></body>"
    assert strip_boilerplate(html) == f"{CONTENT}\n{CONTENT}"


# --- pdf XY-cut ---------------------------------------------------------------

def _frag(x, y, w, h, t):
    return f"{x}|{y}|{w}|{h}|{t}"


def test_xycut_two_columns_reading_order():
    # two columns (gap 80 > MIN_GAP_X) emitted interleaved; expect full left
    # column then full right column, each top-to-bottom
    frags = [
        _frag(40, 40, 200, 12, "L0"),
        _frag(320, 40, 200, 12, "R0"),
        _frag(40, 60, 200, 12, "L1"),
        _frag(320, 60, 200, 12, "R1"),
    ]
    assert reconstruct_reading_order("\n".join(frags)) == "L0\nL1\nR0\nR1"


def test_xycut_header_above_columns():
    frags = [
        _frag(320, 60, 200, 12, "R0"),
        _frag(40, 10, 480, 14, "HEAD"),
        _frag(40, 60, 200, 12, "L0"),
    ]
    # y-gap between header (ends 24) and body (starts 60) is 36 ≥ MIN_GAP_Y
    assert reconstruct_reading_order("\n".join(frags)) == "HEAD\nL0\nR0"


def test_xycut_single_column_sorted_by_y():
    frags = [_frag(40, 80, 200, 12, "B"), _frag(40, 40, 200, 12, "A")]
    assert reconstruct_reading_order("\n".join(frags)) == "A\nB"


def test_xycut_malformed_lines_skipped():
    payload = "garbage\n40|40|200|12|ok\nnot|enough"
    assert reconstruct_reading_order(payload) == "ok"


def test_xycut_empty():
    assert reconstruct_reading_order("") == ""
    assert reconstruct_reading_order(None) == ""


# --- property tests (hypothesis) ---------------------------------------------

from hypothesis import given, settings, strategies as st

_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=10
)
_TAG = st.sampled_from(["p", "div", "li", "nav", "footer", "span", "a", "h2"])


@st.composite
def _html_doc(draw):
    """Random nested fragment from a safe alphabet (no entities, so the
    parser's charref conversion can't alter tokens)."""
    parts = []
    for _ in range(draw(st.integers(0, 8))):
        tag = draw(_TAG)
        words = " ".join(draw(st.lists(_WORD, max_size=30)))
        parts.append(f"<{tag}>{words}</{tag}>")
    return "".join(parts)


@given(_html_doc())
@settings(max_examples=60, deadline=None)
def test_html_never_invents_words(doc):
    """Every output token must come from the input: the classifier only
    selects blocks, it never synthesizes or merges words."""
    from collections import Counter

    out_words = Counter(strip_boilerplate(doc).split())
    in_words = Counter(
        w for w in doc.replace("<", " <").replace(">", "> ").split()
        if not (w.startswith("<") or w.endswith(">"))
    )
    assert not out_words - in_words


@given(st.text(max_size=400))
@settings(max_examples=80, deadline=None)
def test_html_total_on_garbage(raw):
    """strip_boilerplate is total: any string (broken tags, control
    chars, half-entities) must yield a string, never raise."""
    assert isinstance(strip_boilerplate(raw), str)


@given(st.text(max_size=200))
@settings(max_examples=60, deadline=None)
def test_normalize_idempotent(raw):
    once = normalize_text(raw)
    assert normalize_text(once) == once


@st.composite
def _pdf_payload(draw):
    n = draw(st.integers(1, 12))
    lines = []
    for i in range(n):
        x = draw(st.floats(0, 500, allow_nan=False))
        y = draw(st.floats(0, 700, allow_nan=False))
        w = draw(st.floats(1, 200, allow_nan=False))
        h = draw(st.floats(5, 20, allow_nan=False))
        lines.append(f"{x}|{y}|{w}|{h}|frag{i}")
    return "\n".join(lines)


@given(_pdf_payload())
@settings(max_examples=60, deadline=None)
def test_xycut_is_a_permutation(payload):
    """Reading-order sort reorders fragments; it never drops, duplicates
    or rewrites one, at any cut recursion shape."""
    out = reconstruct_reading_order(payload).split("\n")
    expected = sorted(line.split("|", 4)[4] for line in payload.split("\n"))
    assert sorted(out) == expected
