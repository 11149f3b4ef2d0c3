"""BPE trainer/encoder (stages/bpe.py) vs a brute-force per-word
reference: merge tables bit-equal on overlap/tie-heavy corpora, encoder
token counts equal the reference encoding, pair counts equal a dict
census, and the top-words cap mirrors the (n desc, word asc) order."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from consult_ray.stages.bpe import (
    BpeEncoder,
    pair_counts,
    train_bpe,
    word_census,
)


# --- brute-force reference (string-tuple symbols, classic BPE) ----------

def _brute_counts(texts):
    counts = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _brute_train(word_counts, n_merges, min_count=2, max_words=None):
    if max_words is not None:
        keep = sorted(word_counts, key=lambda w: (-word_counts[w], w))
        word_counts = {w: word_counts[w] for w in keep[:max_words]}
    syms = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        cnt = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + c
        if not cnt:
            break
        best = max(cnt.values())
        if best < min_count:
            break
        a, b = min(p for p, n in cnt.items() if n == best)
        merges.append((rank, a, b, a + b, best))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _merge_rows(tbl):
    return list(zip(tbl["rank"].to_pylist(), tbl["left"].to_pylist(),
                    tbl["right"].to_pylist(), tbl["token"].to_pylist(),
                    tbl["n"].to_pylist()))


# overlap runs ("aaaa"), count ties resolved by pair order, repeated
# words, a word that re-merges a product ("abab" after "ab"), unicode
_TEXTS = [
    "aaaa aaaa bb bb cc",
    "abab abab ab ab",
    "the cat the hat the mat",
    "zz zz  zz",  # double space -> empty split token (dropped)
    "ééé ééé xy xy",
    "banana bandana",
]


def test_train_matches_brute(ray_session):
    ds = rd.from_arrow(pa.table({"text": _TEXTS}))
    got = _merge_rows(train_bpe(word_census(ds), n_merges=24,
                                max_words=1000))
    want, _ = _brute_train(_brute_counts(_TEXTS), 24)
    assert got == want
    assert len(got) >= 6  # the corpus genuinely trains several merges


def test_overlap_run_semantics(ray_session):
    # "aaaa" x3: (a,a) counts 9 (overlaps included), first merge leaves
    # "aa","aa" per word, so round 2 sees (aa,aa) count 3
    texts = ["aaaa aaaa aaaa"]
    ds = rd.from_arrow(pa.table({"text": texts}))
    got = _merge_rows(train_bpe(word_census(ds), n_merges=2, max_words=10))
    assert got == [(0, "a", "a", "aa", 9), (1, "aa", "aa", "aaaa", 3)]


def test_max_words_cap_mirrors_census_order(ray_session):
    # cap binds: only the 2 most frequent words (count desc, word asc
    # tiebreak) train; 'bb' ties with 'cc' on count and wins on word
    texts = ["aa aa aa bb bb cc cc dd"]
    ds = rd.from_arrow(pa.table({"text": texts}))
    got = _merge_rows(train_bpe(word_census(ds), n_merges=4, max_words=2))
    want, _ = _brute_train(_brute_counts(texts), 4, max_words=2)
    assert got == want
    assert {r[3] for r in got} == {"aa", "bb"}


def test_encoder_matches_brute(ray_session):
    texts = _TEXTS
    counts = _brute_counts(texts)
    want_merges, syms = _brute_train(counts, 24)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    merges = train_bpe(word_census(ds), n_merges=24, max_words=1000)
    assert _merge_rows(merges) == want_merges
    out = (
        ds.map_batches(BpeEncoder, fn_constructor_kwargs=dict(merges=merges),
                       batch_format="pyarrow", concurrency=1)
        .to_pandas().sort_values("doc_id", ignore_index=True)
    )
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        assert out.n_words[i] == len(words)
        assert out.n_tokens[i] == sum(len(syms[w]) for w in words)
        assert out.n_chars[i] == len(t)


def test_pair_counts_match_dict_census(ray_session):
    ds = rd.from_arrow(pa.table({"text": _TEXTS}))
    got = pair_counts(ds).to_pandas()
    want = {}
    for t in _TEXTS:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                k = (ord(w[i]) << 32) | ord(w[i + 1])
                want[k] = want.get(k, 0) + 1
    assert dict(zip(got["pair"].astype(np.uint64), got["n"])) == want


# --- property tests (hypothesis) -------------------------------------

from hypothesis import given, settings, strategies as st

# tiny alphabet forces count ties, overlap runs, and product reuse
_word = st.text(alphabet="abé", min_size=1, max_size=6)


@settings(max_examples=25, deadline=None)
@given(
    words=st.lists(_word, min_size=1, max_size=25),
    n_merges=st.integers(min_value=1, max_value=10),
)
def test_train_matches_brute_property(ray_session, words, n_merges):
    """For arbitrary tie/overlap-heavy corpora the distributed trainer
    must emit exactly the brute per-word trainer's merge table."""
    text = " ".join(words)
    ds = rd.from_arrow(pa.table({"text": [text]}))
    got = _merge_rows(train_bpe(word_census(ds), n_merges=n_merges,
                                max_words=1000))
    want, _ = _brute_train(_brute_counts([text]), n_merges)
    assert got == want


@settings(max_examples=20, deadline=None)
@given(words=st.lists(_word, min_size=1, max_size=25))
def test_encoder_matches_brute_property(ray_session, words):
    """Encoder token counts equal the brute reference encoding under
    the trained table, for arbitrary corpora."""
    text = " ".join(words)
    counts = _brute_counts([text])
    _, syms = _brute_train(counts, 8)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([text]),
    }))
    merges = train_bpe(word_census(ds), n_merges=8, max_words=1000)
    out = (
        ds.map_batches(BpeEncoder, fn_constructor_kwargs=dict(merges=merges),
                       batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert out.n_tokens[0] == sum(len(syms[w]) for w in words)


def test_product_string_canonicalization(ray_session):
    # 'xy'+'z' and 'x'+'yz' both spell "xyz": whichever forms second
    # must reuse the first symbol, as a string-tuple trainer would
    texts = ["xy xy xy xyz xyz yz yz"]
    ds = rd.from_arrow(pa.table({"text": texts}))
    got = _merge_rows(train_bpe(word_census(ds), n_merges=6, max_words=10))
    want, _ = _brute_train(_brute_counts(texts), 6)
    assert got == want
