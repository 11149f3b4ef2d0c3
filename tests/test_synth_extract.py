"""Synthetic corpus + pinned extraction invariants (no Ray needed)."""

import pyarrow as pa

from consult_ray.functions.textnorm import canonicalize_column, extract_text
from consult_ray.sources.synth import make_pages_corpus


def test_extraction_byte_identical_per_url():
    """BASELINE.json per-row invariant: text == extract_text(html), byte-for-byte."""
    c = make_pages_corpus(200, seed=42)
    htmls = c.pages["html"].to_pylist()
    texts = c.pages["text"].to_pylist()
    for h, t in zip(htmls, texts):
        assert extract_text(h) == t


def test_extraction_pure_and_deterministic():
    html = b"<html><head><title>t</title></head><body><header>BOIL</header><main>Hello &amp; world  \n spaced</main><footer>f</footer></body></html>"
    out1 = extract_text(html)
    out2 = extract_text(html)
    assert out1 == out2 == "Hello & world spaced"


def test_extraction_drops_script_style():
    html = b"<body><script>var x=1;</script><style>.a{}</style><main>keep me</main></body>"
    assert extract_text(html) == "keep me"


def test_corpus_deterministic_across_calls():
    a = make_pages_corpus(100, seed=42)
    b = make_pages_corpus(100, seed=42)
    assert a.pages.equals(b.pages)
    assert a.truth.equals(b.truth)
    c = make_pages_corpus(100, seed=43)
    assert not c.pages.equals(a.pages)


def test_corpus_dup_mix():
    c = make_pages_corpus(1000, seed=42)
    kinds = c.truth["kind"].to_pylist()
    from collections import Counter

    k = Counter(kinds)
    assert k["unique"] == 600
    assert k["exact_dup"] == 200
    assert k["near_dup"] == 130
    assert k["negative"] > 0 and k["substring"] >= 2
    # exact dups really share text with their base
    texts = c.pages["text"].to_pylist()
    clusters = c.truth["truth_cluster"].to_pylist()
    for i, kind in enumerate(kinds):
        if kind == "exact_dup":
            assert texts[i] == texts[clusters[i]]
        if kind == "substring":
            assert texts[i] in texts[clusters[i]]


def test_canonicalize_column():
    col = pa.array(["  Hello   WORLD ", "Caf" + chr(0xE9), None])
    out = canonicalize_column(col).to_pylist()
    assert out[0] == "hello world"
    # pinned canonical form is NFKD + lowercase: e + combining acute
    assert out[1] == "cafe" + chr(0x301)
    assert out[2] is None
    # composed and decomposed inputs canonicalize identically
    both = canonicalize_column(pa.array(["Caf" + chr(0xE9), "Cafe" + chr(0x301)]))
    assert both[0].as_py() == both[1].as_py()
