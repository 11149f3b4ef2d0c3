"""Kernel tests for the training-data assembly operators (pack,
weblinks, classifier) — pure batch-level checks; the end-to-end queries
are covered by test_queries_oracle.py's registry parametrization."""

import numpy as np
import pyarrow as pa

from consult_ray.stages.classifier import (
    HashedLinearScorer,
    make_weights,
    score_rows_reference,
)
from consult_ray.stages.pack import pack_shard, token_shard_batch
from consult_ray.stages.weblinks import extract_hrefs, link_host, links_batch


# --- pack ------------------------------------------------------------


def test_pack_shard_straddle_semantics():
    g = pa.table({
        "doc_id": pa.array([3, 1, 2], pa.int64()),
        "shard": pa.array([0, 0, 0], pa.int64()),
        "n_tok": pa.array([30, 70, 50], pa.int64()),
    })
    out = pack_shard(g, budget=100).to_pydict()
    # doc order 1,2,3; before = 0, 70, 120
    assert out["doc_id"] == [1, 2, 3]
    assert out["seq_id"] == [0, 0, 1]
    assert out["seq_offset"] == [0, 70, 20]


def test_pack_shard_matches_bruteforce():
    rng = np.random.default_rng(7)
    ids = rng.permutation(200).astype(np.int64)
    toks = rng.integers(1, 500, 200).astype(np.int64)
    g = pa.table({
        "doc_id": pa.array(ids),
        "shard": pa.array(np.zeros(200, np.int64)),
        "n_tok": pa.array(toks),
    })
    out = pack_shard(g, budget=256)
    by_id = dict(zip(ids.tolist(), toks.tolist()))
    before = 0
    expect = {}
    for d in sorted(by_id):
        expect[d] = (before // 256, before % 256)
        before += by_id[d]
    got = {
        d: (s, o)
        for d, s, o in zip(
            out["doc_id"].to_pylist(),
            out["seq_id"].to_pylist(),
            out["seq_offset"].to_pylist(),
        )
    }
    assert got == expect


def test_token_shard_batch_counts_like_split():
    b = pa.table({
        "doc_id": pa.array([0, 5, 9], pa.int64()),
        "text": pa.array(["a b c", "", "one  two"]),  # "" -> 1, double space -> 3
    })
    out = token_shard_batch(b, n_shards=4).to_pydict()
    assert out["n_tok"] == [3, 1, 3]
    assert out["shard"] == [0, 1, 1]


# --- weblinks ----------------------------------------------------------


def test_extract_hrefs_edges():
    html = pa.array([
        '<a href="https://x.com/a">1</a> mid <a href="/rel">2</a>',
        "no links here",
        None,
        "",
        '<a href="unclosed',      # no closing quote -> regex no-match
        'href="https://y.org/"',
    ])
    links, rows = extract_hrefs(html)
    assert links.to_pylist() == ["https://x.com/a", "/rel", "https://y.org/"]
    assert rows.tolist() == [0, 0, 5]
    hosts = link_host(links).to_pylist()
    assert hosts == ["x.com", "", "y.org"]


def test_links_batch_explodes_with_ids():
    b = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "html": pa.array(['<a href="https://a.b/x">.</a>', "none"]),
    })
    out = links_batch(b).to_pydict()
    assert out == {"doc_id": [10], "link": ["https://a.b/x"], "host": ["a.b"]}


# --- doc_chunks ------------------------------------------------------------


def test_doc_chunks_windows_multichunk():
    """sf docs are all single-window; pin the multi-chunk arithmetic
    (stride overlap, short tail, exact boundary) on synthetic lengths."""
    import duckdb

    from consult_ray.pipelines.train_queries import _CHUNK_S, _CHUNK_W, _SQL_CHUNKS, q_doc_chunks

    assert (_CHUNK_W, _CHUNK_S) == (128, 96)
    lens = [1, 96, 128, 129, 224, 225, 500]
    texts = [" ".join(f"t{i}_{j}" for j in range(n)) for i, n in enumerate(lens)]
    tbl = pa.table({
        "doc_id": pa.array(range(len(lens)), pa.int64()),
        "text": pa.array(texts),
    })
    import tempfile, os
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp()
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    got = q_doc_chunks(d).to_pandas().sort_values(
        ["doc_id", "chunk_no"], ignore_index=True
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    want = con.sql(_SQL_CHUNKS).df().sort_values(
        ["doc_id", "chunk_no"], ignore_index=True
    )
    for c in ["doc_id", "chunk_no", "n_tok", "first_tok", "last_tok"]:
        assert got[c].tolist() == want[c].tolist(), c
    # chunk counts: 1+max(0,ceil((n-128)/96)) -> 1,1,1,2,2,3,5
    counts = got.groupby("doc_id").size().tolist()
    assert counts == [1, 1, 1, 2, 2, 3, 5]
    # doc 3 (129 tokens): tail chunk starts at token 96, 33 tokens long
    tail = got[(got.doc_id == 3) & (got.chunk_no == 1)].iloc[0]
    assert tail.n_tok == 33 and tail.first_tok == "t3_96" and tail.last_tok == "t3_128"


# --- classifier ----------------------------------------------------------


def test_scorer_matches_per_row_reference():
    texts = ["the quick brown fox", "", "one", "a a a b", "uniécode tøkens"]
    b = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    s = HashedLinearScorer(dim=1 << 12, seed=99, threshold=0.0)
    out = s(b)
    ref = score_rows_reference(texts, dim=1 << 12, seed=99, threshold=0.0)
    got = list(zip(out["quality_score"].to_pylist(), out["quality_keep"].to_pylist()))
    for (gs, gk), (rs, rk) in zip(got, ref):
        assert gs == rs  # bit-exact: same hash, float64 accumulation
        assert gk == rk


def test_scorer_batch_split_invariant():
    rng = np.random.default_rng(3)
    texts = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "x", "longword"], 20))
        for _ in range(64)
    ]
    tbl = pa.table({"doc_id": pa.array(range(64), pa.int64()), "text": pa.array(texts)})
    s = HashedLinearScorer(dim=1 << 10, seed=5)
    whole = s(tbl)["quality_score"].to_pylist()
    parts = []
    for lo in range(0, 64, 17):
        parts += s(tbl.slice(lo, 17))["quality_score"].to_pylist()
    assert whole == parts


def test_weights_deterministic():
    assert np.array_equal(make_weights(256, 1), make_weights(256, 1))
    assert not np.array_equal(make_weights(256, 1), make_weights(256, 2))


def test_extract_hrefs_matches_regex_on_adversarial_html():
    """Regex-parity on the automaton cases the vectorized fast path
    cannot see: an href value holding `href=` right before its closing
    quote, unterminated captures closed by the NEXT separator's own
    quote, and the skipped fragment that follows them."""
    import random
    import re

    rx = re.compile(r'href="([^"]*)"')
    # the review's concrete repro: regex captures 'abc href=' (closed by
    # the second separator's trailing quote), never 'def'
    links, rows = extract_hrefs(pa.array(['<a href="abc href="def">']))
    assert links.to_pylist() == ["abc href="]
    assert rows.tolist() == [0]
    # skipped-fragment case: the text after the consumed quote is plain
    links, _ = extract_hrefs(pa.array(['x href="a href="b"c" href="d"']))
    assert links.to_pylist() == ["a href=", "d"]

    rnd = random.Random(7)
    pieces = ['href="', '"', "a", "<a ", "def", " x ", "href=", ">", ""]
    for _ in range(400):
        rows_in = [
            "".join(rnd.choice(pieces) for _ in range(rnd.randint(0, 12)))
            for _ in range(rnd.randint(0, 6))
        ]
        if rnd.random() < 0.15:
            rows_in.append(None)
        got_links, got_rows = extract_hrefs(pa.array(rows_in, pa.string()))
        got = {}
        for l, r in zip(got_links.to_pylist(), got_rows.tolist()):
            got.setdefault(r, []).append(l)
        for i, row in enumerate(rows_in):
            want = rx.findall(row) if row is not None else []
            assert got.get(i, []) == want, (row, want, got.get(i, []))


def test_shuffle_shards_is_seeded_permutation(ray_session):
    """Each (shard, pos) pair is unique, positions are dense per shard,
    the id set round-trips, and a different seed permutes differently."""
    import ray.data as rd

    from consult_ray.stages.pack import shuffle_shards

    ids = pa.table({"doc_id": pa.array(np.arange(777), pa.int64())})
    a = shuffle_shards(rd.from_arrow(ids), 4, seed=42).to_pandas()
    b = shuffle_shards(rd.from_arrow(ids), 4, seed=42).to_pandas()
    c = shuffle_shards(rd.from_arrow(ids), 4, seed=43).to_pandas()

    a_s = a.sort_values("doc_id", ignore_index=True)
    assert sorted(a.doc_id) == list(range(777))
    for s, g in a.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))
    # determinism across runs; a new seed moves assignments
    assert a_s.equals(b.sort_values("doc_id", ignore_index=True))
    c_s = c.sort_values("doc_id", ignore_index=True)
    assert not a_s[["shard", "pos"]].equals(c_s[["shard", "pos"]])


# --- grouped top-k ---------------------------------------------------


def test_top_k_batch_matches_pandas_rank():
    import pandas as pd

    from consult_ray.pipelines.operators import _top_k_batch

    rng = np.random.default_rng(11)
    n = 500
    t = pa.table({
        "g": pa.array(rng.integers(0, 17, n).astype(str)),
        "v": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "id": pa.array(rng.permutation(n).astype(np.int64)),
    })
    got = _top_k_batch(
        t, "g", [("v", True), ("id", False)], k=3, rank_col="rank"
    ).to_pandas().sort_values(["g", "rank"], ignore_index=True)
    df = t.to_pandas().sort_values(
        ["g", "v", "id"], ascending=[True, False, True], ignore_index=True
    )
    df["rank"] = df.groupby("g").cumcount() + 1
    want = df[df["rank"] <= 3].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_top_k_split_invariant(ray_session):
    """The per-block partial must not change the final ranking: the
    distributed result over many tiny blocks equals the single-batch
    kernel result."""
    import pandas as pd

    import ray.data as rd

    from consult_ray.pipelines.operators import _top_k_batch, grouped_top_k

    rng = np.random.default_rng(13)
    n = 1000
    t = pa.table({
        "g": pa.array(rng.integers(0, 11, n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 25, n).astype(np.int64)),
        "id": pa.array(rng.permutation(n).astype(np.int64)),
    })
    order = [("v", True), ("id", False)]
    ds = rd.from_arrow(t).repartition(23)
    got = (
        grouped_top_k(ds, "g", order, k=4)
        .to_pandas()
        .sort_values(["g", "rank"], ignore_index=True)
    )
    want = (
        _top_k_batch(t, "g", order, k=4, rank_col="rank")
        .to_pandas()
        .sort_values(["g", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cluster_best_docs_matches_bruteforce(ray_session):
    """Per-cluster argmax (n_chars desc, doc_id tiebreak) equality with
    a pandas brute force over the SAME cluster labels."""
    import pandas as pd

    from consult_ray.pipelines.queries import (
        CFG,
        _read,
        q_cluster_best_docs,
        q_dedup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        q_cluster_best_docs(sf)
        .to_pandas()
        .sort_values("cluster_id", ignore_index=True)
    )
    labels = q_dedup_clusters(sf).to_pandas()[["doc_id", "cluster_id"]]
    chars = _read(sf, "documents", ["doc_id", "n_chars"]).to_pandas()
    df = labels.merge(chars, on="doc_id").sort_values(
        ["cluster_id", "n_chars", "doc_id"],
        ascending=[True, False, True],
    )
    want = df.groupby("cluster_id", as_index=False).first()[
        ["doc_id", "n_chars", "cluster_id"]
    ].sort_values("cluster_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )
