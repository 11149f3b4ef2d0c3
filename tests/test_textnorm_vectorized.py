"""Byte-equality contract: the vectorized extract_text_column must match
the scalar extract_text spec row-for-row, including the adversarial
corners of every pass (drop-tag nesting/case/unclosed, tag rows, charref
prefix fallback, invalid utf-8, unicode whitespace)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from consult_ray.functions.textnorm import (
    _extract_text_column_rows,
    extract_text,
    extract_text_column,
)

ADVERSARIAL = [
    b"",
    b"   ",
    b"plain text no markup",
    # drop-tag corners
    b"<script>drop me</script>keep",
    b"<SCRIPT a=1>drop</ScRiPt  >keep",
    b"<script>unclosed stays (tag stripped, body kept)",
    b"<head><title>t</title></head>body",
    b"<header>h</header><nav>n</nav><footer>f</footer>x",
    b"<headx>not a drop tag</headx>kept",
    b"<head>outer<head>inner</head>tail</head>end",  # non-greedy close
    b"</script>close with no open<script>then unclosed open",
    b"<script>a</style>wrong close</script>b",  # close name must match
    b"<style>s1</style><style>s2</style>mid",
    b"a<script>x</script>b<script>y</script>c",
    b"<heading>not head (\\b)</heading>z",
    b"<nav\nattr=1>multiline\ndrop</nav\t>q",
    # tag-strip corners
    b"a<b>c</b>d",
    b"a<unterminated",
    b"a<x<y>b",  # nested '<' consumed by one match
    b"<>empty tag<>",
    b"a>stray gt<b>c",
    # entities
    b"&amp; &lt;tag&gt; &quot;q&quot; &#39;",
    b"&amp no-semicolon &ampx &amp;x",
    b"&ampzzz; prefix fallback",
    b"&notareal; &notit; &#x41; &#65; &#X41;",
    b"&#0; &#x80; &#xD800; &#1114112; &#999999999999;",
    b"&frac34; &there4; &thinsp;x",
    b"&" + b"a" * 40 + b"; overlong name",
    b"&amp" + "é".encode() * 20 + b"; multibyte in ref",
    b"&#x; &#; && &",
    b"tail&",
    b"tail&amp",
    # invalid utf-8
    b"ok \xc3 lone lead",
    b"\xa0\xa1 continuations",
    b"split \xc3",  # pairs with next row starting \xa9
    b"\xa9 starts with continuation",
    b"mixed \xe2\x82 truncated euro \xe2\x82\xac real euro",
    # unicode whitespace (collapsed by python \s)
    "a\xa0b c d　e".encode(),
    "  lead and trail  ".encode(),
    b"\x1c\x1d\x1e\x1f\x85 c0 and nel",
    "xy z   q    \u3000w".encode(),
    "   all-ws row \u3000\t".encode(),
    "a \xa0   mixed run b".encode(),
    b"broken prefix \xe2\x80 then text",
    b"\xe2\x80\xa8 leading linesep \xe2\x80\xaf",
    b"tail c2 \xc2",
    b"\xc2\xa0",  # row IS one nbsp
    "word\u200bword zwsp is not ws".encode(),
    b"\xe1\x9a\x80 ogham \xe1\x9a\x81 not-ws",
    # everything combined
    b"<html><head><title>&amp;t</title></head><body>A &lt;b&gt;"
    b" \xc3\xa9ok \xff <nav>n</nav><p>x</p> "
    + "\xa0".encode(),
]


def test_adversarial_rows_byte_identical():
    col = pa.array(ADVERSARIAL + [None], pa.binary())
    got = extract_text_column(col)
    want = _extract_text_column_rows(col)
    for i, (g, w) in enumerate(zip(got.to_pylist(), want.to_pylist())):
        assert g == w, (i, col[i].as_py() if col[i].is_valid else None, g, w)


def test_rows_concat_boundary_cases():
    # adjacent rows whose bytes would interact if the buffer were
    # processed without row guards
    rows = [
        b"<script>open in row 0",
        b"</script>close in row 1",
        b"row ends with &amp",
        b"p; row starts mid-entity",
        b"row ends with <div",
        b">row starts with gt",
        b"split \xc3",
        b"\xa9 would join into valid utf-8",
        b"row ends with c2 \xc2",
        b"\xa0 a0 would join into nbsp",
        b"row ends e2 80 \xe2\x80",
        b"\x8a would join into U+200A",
        b"<head>x",
        b"</head>",
    ]
    col = pa.array(rows, pa.binary())
    got = extract_text_column(col).to_pylist()
    want = [extract_text(r) for r in rows]
    assert got == want


def test_synth_corpus_byte_identical():
    from consult_ray.sources.synth import make_pages_corpus

    c = make_pages_corpus(300, seed=3)
    got = extract_text_column(c.pages["html"].combine_chunks())
    assert got.to_pylist() == c.pages["text"].to_pylist()


def test_sliced_and_chunked_inputs():
    col = pa.array(ADVERSARIAL, pa.binary())
    sl = col.slice(5, 20)
    assert extract_text_column(sl).to_pylist() == _extract_text_column_rows(sl).to_pylist()
    ch = pa.chunked_array([col.slice(0, 7), col.slice(7)])
    assert extract_text_column(ch).to_pylist() == _extract_text_column_rows(col).to_pylist()


@st.composite
def html_soup(draw):
    frags = st.sampled_from(
        [
            b"<script>",
            b"</script>",
            b"<head>",
            b"</head>",
            b"<style x>",
            b"</style >",
            b"<p>",
            b"</p>",
            b"<",
            b">",
            b"&",
            b"&amp;",
            b"&amp",
            b"&#6",
            b"5;",
            b"&x;",
            b";",
            b"#",
            b"text",
            b" ",
            b"\n\n",
            b"\xc3",
            b"\xa9",
            b"\xff",
            "é  ".encode(),
            b"a" * 33,
            b"\xc2\xa0",
            b"\xc2",
            b"\xa0",
            b"\xe2\x80",
            b"\x8a",
            "\u2028".encode(),
            "\u3000".encode(),
        ]
    )
    return b"".join(draw(st.lists(frags, max_size=24)))


@settings(max_examples=120, deadline=None)
@given(st.lists(html_soup(), min_size=1, max_size=12))
def test_fuzz_byte_identical(rows):
    col = pa.array(rows, pa.binary())
    got = extract_text_column(col).to_pylist()
    want = [extract_text(r) for r in rows]
    assert got == want
