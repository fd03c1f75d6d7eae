"""HTML main-text extraction — stdlib html.parser only.

The stage between a WARC scan and every text operator in this engine:
real crawl payloads are HTML, and training pipelines strip markup and
boilerplate before anything else sees the text. This is the classic
tag-category heuristic (the core of trafilatura/jusText-style tools):
drop content inside non-content elements (script/style/template and
the nav/header/footer/aside boilerplate regions), keep block-level
text, record structure facts (title, paragraph count, link count) a
quality filter wants. Deterministic by construction — no scoring
models — so a DuckDB oracle can state the expected extraction in
closed form.

Malformed markup never raises: html.parser is a forgiving tokenizer,
and unclosed boilerplate tags simply extend their suppressed region to
the matching close (or end of input) exactly as browsers nest them.
"""

from __future__ import annotations

from html.parser import HTMLParser

# content inside these elements never contributes text
_SUPPRESS = {"script", "style", "template", "noscript",
             "nav", "header", "footer", "aside"}
# block-level elements whose text forms one paragraph each
_BLOCKS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
           "blockquote", "td", "figcaption"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.suppress = 0
        self.in_title = False
        self.title_parts: list[str] = []
        self.block_parts: list[str] = []
        self.paragraphs: list[str] = []
        self.n_links = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SUPPRESS:
            self.suppress += 1
        elif tag == "title":
            self.in_title = True
        elif tag == "a" and not self.suppress:
            self.n_links += 1
        elif tag in _BLOCKS and not self.suppress:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SUPPRESS:
            self.suppress = max(0, self.suppress - 1)
        elif tag == "title":
            self.in_title = False
        elif tag in _BLOCKS and not self.suppress:
            self._flush()

    def handle_data(self, data):
        if self.in_title:
            self.title_parts.append(data)
        elif not self.suppress:
            self.block_parts.append(data)

    def _flush(self) -> None:
        text = " ".join("".join(self.block_parts).split())
        self.block_parts = []
        if text:
            self.paragraphs.append(text)


def extract_main_text(html: str) -> dict:
    """→ {title, text, n_paragraphs, n_links}: whitespace-normalized
    paragraphs joined by newlines, boilerplate regions removed."""
    p = _Extractor()
    p.feed(html)
    p.close()
    p._flush()
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "text": "\n".join(p.paragraphs),
        "n_paragraphs": len(p.paragraphs),
        "n_links": p.n_links,
    }
