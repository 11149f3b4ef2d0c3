"""Deterministic synthetic `pages` corpus with known dup ground truth.

Schema follows BASELINE.json's input_hint:
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

The reference's golden fixtures are stripped from its snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so — like FIXTURES.md specifies —
we synthesize a corpus with seeded (seed=42) injected duplicates and a
ground-truth cluster table, making recall measurable exactly.

Dup mix (FIXTURES.md §1): ~60% unique docs, ~20% exact dups, ~15% near
dups (1..p token edits, the analog of hd<=p at
/root/reference/main_search.cpp:1238-1259), ~5% negatives (edits far past
the budget), plus substring-containment cases for the suffix-array stage.

The html wrapper carries PER-SITE boilerplate header/footer — the web-text
analog of CONSULT's over-represented k-mers — which drives hot band keys
and exercises the skew/salting path.

text == extract_text(html) BY CONSTRUCTION, so the byte-identical
extraction invariant is testable.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from consult_ray.functions.textnorm import extract_text

_VOCAB_SIZE = 800
_N_SITES = 12
_EPOCH_US = 1_500_000_000_000_000  # fixed epoch (us)


def _vocab(rng: np.random.Generator) -> list[str]:
    words = []
    for i in range(_VOCAB_SIZE):
        n = int(rng.integers(3, 10))
        words.append("".join(chr(97 + c) for c in rng.integers(0, 26, n)))
    return words


def _zipf_text(rng: np.random.Generator, vocab: list[str], n_tokens: int) -> str:
    # Zipfian ranks over the vocab: heavy head like real web text
    ranks = rng.zipf(1.3, size=n_tokens)
    idx = np.minimum(ranks - 1, len(vocab) - 1)
    return " ".join(vocab[i] for i in idx)


def _edit_tokens(rng: np.random.Generator, text: str, n_edits: int, vocab: list[str]) -> str:
    toks = text.split(" ")
    positions = rng.choice(len(toks), size=min(n_edits, len(toks)), replace=False)
    for p in positions:
        toks[p] = vocab[int(rng.integers(0, len(vocab)))]
    return " ".join(toks)


def _wrap_html(site: int, title: str, body_text: str) -> bytes:
    """Per-site boilerplate wrapper. extract_text() drops head/header/
    footer/nav subtrees and strips tags, so extract_text(html) == body_text
    exactly (body_text is whitespace-normalized single-space text)."""
    boiler_nav = " ".join(f"site{site}-nav-item-{j}" for j in range(8))
    boiler_footer = f"copyright site{site} all rights reserved " * 2
    html = (
        f"<html><head><title>{title}</title></head>"
        f"<body><header><nav>{boiler_nav}</nav></header>"
        f"<main>{body_text}</main>"
        f"<footer>{boiler_footer}</footer></body></html>"
    )
    return html.encode("utf-8")


@dataclass
class SynthCorpus:
    pages: pa.Table       # url, warc_ts, html, text, lang
    truth: pa.Table       # doc_url, truth_cluster, kind


def make_pages_corpus(n_docs: int, seed: int = 42, p_budget: int = 3) -> SynthCorpus:
    """Build a deterministic corpus of n_docs pages + ground truth.

    truth_cluster is the index of the base doc a page derives from
    (singletons point at themselves); kind in
    {unique, exact_dup, near_dup, negative, substring}.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    n_unique = int(n_docs * 0.60)
    n_exact = int(n_docs * 0.20)
    n_near = int(n_docs * 0.13)
    n_sub = max(2, int(n_docs * 0.02))
    n_neg = n_docs - n_unique - n_exact - n_near - n_sub

    texts: list[str] = []
    kinds: list[str] = []
    clusters: list[int] = []

    for i in range(n_unique):
        n_tokens = int(rng.integers(50, 600))
        texts.append(_zipf_text(rng, vocab, n_tokens))
        kinds.append("unique")
        clusters.append(i)

    def _pick_base() -> int:
        return int(rng.integers(0, n_unique))

    for _ in range(n_exact):
        b = _pick_base()
        texts.append(texts[b])
        kinds.append("exact_dup")
        clusters.append(b)

    for _ in range(n_near):
        b = _pick_base()
        n_edits = int(rng.integers(1, p_budget + 1))
        texts.append(_edit_tokens(rng, texts[b], n_edits, vocab))
        kinds.append("near_dup")
        clusters.append(b)

    for _ in range(n_sub):
        # doc is an exact contiguous substring (token span) of a base doc
        b = _pick_base()
        toks = texts[b].split(" ")
        if len(toks) < 40:
            span = toks
        else:
            start = int(rng.integers(0, len(toks) - 35))
            span = toks[start : start + int(rng.integers(30, min(120, len(toks) - start)))]
        texts.append(" ".join(span))
        kinds.append("substring")
        clusters.append(b)

    for i in range(n_neg):
        b = _pick_base()
        # way past the edit budget: rewrite 60% of tokens
        toks = texts[b].split(" ")
        texts.append(_edit_tokens(rng, texts[b], max(p_budget * 10, int(len(toks) * 0.6)), vocab))
        kinds.append("negative")
        clusters.append(n_unique + n_exact + n_near + n_sub + i)  # own singleton cluster

    n = len(texts)
    sites = rng.integers(0, _N_SITES, size=n)
    urls = [
        f"https://site{sites[i]}.example/{uuid.uuid5(uuid.NAMESPACE_URL, f's{seed}-d{i}')}"
        for i in range(n)
    ]
    ts = (_EPOCH_US + rng.integers(0, 10**12, size=n)).astype("int64")
    langs = [
        "en" if rng.random() < 0.9 else ["de", "fr", "es", "zh"][int(rng.integers(0, 4))]
        for _ in range(n)
    ]
    htmls = [
        _wrap_html(int(sites[i]), f"doc {i}", texts[i]) for i in range(n)
    ]
    # invariant: text column IS the pinned extraction of html
    extracted = [extract_text(h) for h in htmls]
    assert extracted == texts, "synth corpus violates the extraction invariant"

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    truth = pa.table(
        {
            "doc_url": pa.array(urls, pa.string()),
            "truth_cluster": pa.array(clusters, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )
    return SynthCorpus(pages=pages, truth=truth)


def write_pages_corpus(out_dir: str, n_docs: int, seed: int = 42, num_files: int = 8) -> None:
    """Write the corpus as partitioned parquet (num_files shards) so Ray
    gets file-level read parallelism; plus truth.parquet alongside."""
    import os

    import pyarrow.parquet as pq

    corpus = make_pages_corpus(n_docs, seed=seed)
    os.makedirs(f"{out_dir}/pages", exist_ok=True)
    n = corpus.pages.num_rows
    step = (n + num_files - 1) // num_files
    for f in range(num_files):
        chunk = corpus.pages.slice(f * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/pages/part-{f:05d}.parquet")
    pq.write_table(corpus.truth, f"{out_dir}/truth.parquet")
