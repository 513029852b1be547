"""HTML boilerplate stripping: text-density + link-density block classification.

Boilerpipe/Readability-style main-content extraction (north rule; no
reference counterpart — SURVEY.md §2.5). Public-algorithm basis:
Kohlschütter et al., "Boilerplate Detection using Shallow Text Features"
(WSDM 2010): segment the DOM into blocks at block-level tags, score each
block by word count, link density and text density, and keep content-like
blocks.

Implementation is stdlib-only (html.parser) and fully deterministic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .text import normalize_text

# Tags that delimit blocks (Boilerpipe's block-level set, abridged).
_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "aside", "nav", "header",
    "footer", "li", "ul", "ol", "table", "tr", "td", "th", "h1", "h2",
    "h3", "h4", "h5", "h6", "blockquote", "pre", "form", "br",
}
# Content inside these is never body text.
_IGNORE_TAGS = {"script", "style", "noscript", "template", "head", "title"}
# Blocks whose nearest ancestor is one of these are boilerplate wrappers.
_BOILERPLATE_ANCESTORS = {"nav", "footer", "header", "aside", "form"}

# Classifier thresholds (Boilerpipe NumWordsRulesClassifier-inspired).
MIN_WORDS = 8
MAX_LINK_DENSITY = 0.333333
MIN_TEXT_DENSITY = 4.0  # words per wrapped line of 80 chars
_WORD_RE = re.compile(r"\S+")


@dataclass
class _Block:
    words: list[str] = field(default_factory=list)
    link_words: int = 0
    in_boiler_ancestor: bool = False

    @property
    def n_words(self) -> int:
        return len(self.words)

    @property
    def link_density(self) -> float:
        return self.link_words / self.n_words if self.words else 0.0

    @property
    def text_density(self) -> float:
        """Words per 80-char wrapped line (Kohlschütter text density)."""
        if not self.words:
            return 0.0
        n_chars = sum(len(w) for w in self.words) + max(0, len(self.words) - 1)
        n_lines = max(1, -(-n_chars // 80))  # ceil division
        return self.n_words / n_lines

    def is_content(self) -> bool:
        if self.in_boiler_ancestor:
            return False
        if self.n_words < MIN_WORDS:
            return False
        if self.link_density > MAX_LINK_DENSITY:
            return False
        return self.text_density >= MIN_TEXT_DENSITY

    def text(self) -> str:
        return " ".join(self.words)


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block()
        self._anchor_depth = 0
        self._ignore_depth = 0
        self._boiler_depth = 0

    def _flush(self) -> None:
        if self._cur.words:
            self.blocks.append(self._cur)
        self._cur = _Block(in_boiler_ancestor=self._boiler_depth > 0)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _IGNORE_TAGS:
            self._ignore_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILERPLATE_ANCESTORS:
            self._boiler_depth += 1
            self._cur.in_boiler_ancestor = True

    def handle_endtag(self, tag: str) -> None:
        if tag in _IGNORE_TAGS and self._ignore_depth > 0:
            self._ignore_depth -= 1
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILERPLATE_ANCESTORS and self._boiler_depth > 0:
            self._boiler_depth -= 1
            self._cur.in_boiler_ancestor = self._boiler_depth > 0

    def handle_data(self, data: str) -> None:
        if self._ignore_depth:
            return
        words = _WORD_RE.findall(data)
        self._cur.words.extend(words)
        if self._anchor_depth:
            self._cur.link_words += len(words)

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def strip_boilerplate(html: str | None) -> str:
    """Return the main content of an HTML fragment.

    Blocks classified as content are joined by newlines; if no block
    passes the classifier, fall back to the densest block so short real
    documents don't vanish.
    """
    if not html:
        return ""
    if "<" not in html:  # plain text shortcut
        return normalize_text(html)
    parser = _BlockParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return normalize_text(re.sub(r"<[^>]*>", " ", html))
    content = [b for b in parser.blocks if b.is_content()]
    if not content:
        eligible = [b for b in parser.blocks if not b.in_boiler_ancestor]
        pool = eligible or parser.blocks
        if not pool:
            return ""
        best = max(pool, key=lambda b: (b.n_words, -b.link_density))
        return best.text()
    return "\n".join(b.text() for b in content)
