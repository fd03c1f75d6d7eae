"""HTML main-text extraction (functions/htmltext.py): boilerplate
suppression, entity handling, structure facts, malformed markup."""

from __future__ import annotations

from articulation_vector_db_api_spark.functions.htmltext import (
    extract_main_text,
)


def test_boilerplate_suppressed_and_structure_counted():
    r = extract_main_text(
        "<html><head><title> My  Doc </title><style>p{c}</style></head>"
        "<body><nav>SKIP<a href='x'>navlink</a><p>fake</p></nav>"
        "<h1>Head line</h1><p>first  para   text</p>"
        "<p>second <a href='y'>link</a> para</p><p></p>"
        "<script>var x='<p>fake</p>';</script>"
        "<footer>SKIP2<p>hidden</p></footer></body></html>"
    )
    assert r["title"] == "My Doc"
    assert r["text"] == "Head line\nfirst para text\nsecond link para"
    assert r["n_paragraphs"] == 3
    assert r["n_links"] == 1  # the nav's anchor must not count


def test_entities_unescaped():
    r = extract_main_text("<p>a &amp; b &lt;tag&gt; &#65;</p>")
    assert r["text"] == "a & b <tag> A"


def test_nested_boilerplate_regions():
    r = extract_main_text(
        "<header><nav><p>deep</p></nav>shallow</header><p>keep</p>"
    )
    assert r["text"] == "keep"


def test_malformed_markup_never_raises():
    assert extract_main_text("<p>a<p>b<script>junk")["text"] == "a\nb"
    assert extract_main_text("")["text"] == ""
    assert extract_main_text("plain no tags")["text"] == "plain no tags"
    # a stray close tag must not drive the suppress depth negative
    # (text after it would vanish if it did)
    assert extract_main_text("</footer><p>x</p>")["text"] == "x"
    # real comments are dropped by the tokenizer
    assert extract_main_text("<p>x</p><!-- hidden -->")["text"] == "x"


def test_list_and_table_blocks():
    r = extract_main_text(
        "<ul><li>one</li><li>two</li></ul><table><tr><td>c1</td></tr></table>"
    )
    assert r["text"] == "one\ntwo\nc1"
    assert r["n_paragraphs"] == 3
