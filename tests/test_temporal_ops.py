"""Unit tests for the custom temporal operators (as-of join,
sessionization, exact distinct-count) on hand-built tables, checked
against pandas ground truth rather than the sf fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.pipelines.operators import asof_join, distinct_count_by, sessionize

CFG = PipelineConfig()


def _ts(*vals):
    return pa.array(pd.to_datetime(list(vals)), pa.timestamp("us"))


def test_asof_join_matches_merge_asof(ray_session):
    rng = np.random.default_rng(7)
    n_left, n_right = 400, 120
    left = pd.DataFrame({
        "event_id": np.arange(n_left, dtype=np.int64),
        "user_id": rng.integers(0, 20, n_left),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 10**6, n_left), unit="s"),
    })
    right = pd.DataFrame({
        "o_custkey": rng.integers(0, 25, n_right),
        "o_orderdate": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.integers(0, 10**6, n_right), unit="s"),
    })

    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), CFG,
        on="user_id", right_on="o_custkey", left_ts="ts", right_ts="o_orderdate",
        out_ts="asof_date", left_keep=("event_id",),
    ).to_pandas().sort_values("event_id", ignore_index=True)

    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("o_orderdate"),
        left_on="ts", right_on="o_orderdate",
        left_by="user_id", right_by="o_custkey", direction="backward",
    ).dropna(subset=["o_orderdate"]).sort_values("event_id", ignore_index=True)

    assert len(got) == len(want)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["asof_date"].to_numpy() == want["o_orderdate"].to_numpy()).all()


def test_sessionize_hand_case(ray_session):
    # user 1: 3 events, gaps 10min/45min -> 2 sessions
    # user 2: 1 event -> 1 session
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": _ts("2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 10:55",
                  "2024-01-02 00:00"),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
    })
    out = sessionize(rd.from_arrow(tbl), CFG, gap_minutes=30).to_pandas()
    got = dict(zip(out.user_id, out.n_sessions))
    assert got == {1: 2, 2: 1}


def test_distinct_count_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "day": rng.integers(0, 5, 1000),
        "user_id": rng.integers(0, 40, 1000),
    })
    out = distinct_count_by(rd.from_pandas(df), "day", "user_id", "n_users").to_pandas()
    want = df.groupby("day")["user_id"].nunique()
    got = dict(zip(out.day, out.n_users))
    assert got == want.to_dict()


def test_range_join_count_hand_case(ray_session):
    """Bucket-boundary cases for the banded range join: 10:00 and 11:00
    sit in different hour buckets but are exactly W apart (inclusive
    boundary must count them); 12:01 is 61min from 11:00 (must not)."""
    from consult_ray.pipelines.operators import range_join_count

    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": _ts("2024-01-01 10:00", "2024-01-01 10:30", "2024-01-01 11:00",
                  "2024-01-01 12:01", "2024-01-01 10:00"),
    })
    ds = rd.from_arrow(tbl)
    out = range_join_count(
        ds, ds, CFG, on="user_id", right_on="user_id",
        left_ts="ts", right_ts="ts", window_us=3600 * 1_000_000,
        left_keep=("event_id",),
    ).to_pandas()
    got = dict(zip(out.event_id, out.n_window))
    assert got == {0: 3, 1: 3, 2: 3, 3: 1, 4: 1}


def test_range_join_count_string_keys(ray_session):
    """The union schema must follow the LEFT schema: string (url-shaped)
    keys and string keep columns work without an int cast."""
    from consult_ray.pipelines.operators import range_join_count

    tbl = pa.table({
        "url": pa.array(["a/0", "a/1", "a/2", "b/0"], pa.string()),
        "host": pa.array(["h1", "h1", "h1", "h2"], pa.string()),
        "ts": _ts("2024-01-01 10:00", "2024-01-01 10:30", "2024-01-01 12:01",
                  "2024-01-01 10:00"),
    })
    ds = rd.from_arrow(tbl)
    out = range_join_count(
        ds, ds, CFG, on="host", right_on="host",
        left_ts="ts", right_ts="ts", window_us=3600 * 1_000_000,
        left_keep=("url",),
    ).to_pandas()
    got = dict(zip(out.url, out.n_window))
    assert got == {"a/0": 2, "a/1": 2, "a/2": 1, "b/0": 1}


def test_range_join_count_matches_bruteforce(ray_session):
    """Randomized check vs an all-pairs pandas count, timestamps drawn
    dense enough that many pairs straddle bucket edges."""
    from consult_ray.pipelines.operators import range_join_count

    rng = np.random.default_rng(5)
    n = 300
    W_s = 900  # 15-minute window
    left = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 8, n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s"),
    })
    out = range_join_count(
        rd.from_pandas(left), rd.from_pandas(left), CFG,
        on="user_id", right_on="user_id", left_ts="ts", right_ts="ts",
        window_us=W_s * 1_000_000, left_keep=("event_id",),
    ).to_pandas().sort_values("event_id", ignore_index=True)

    t = left.ts.to_numpy().astype("datetime64[us]").view(np.int64)
    k = left.user_id.to_numpy()
    want = np.array([
        int(((k == k[i]) & (np.abs(t - t[i]) <= W_s * 1_000_000)).sum())
        for i in range(n)
    ])
    assert len(out) == n
    assert (out.n_window.to_numpy() == want).all()


def test_minimizer_kernel_unicode():
    """Char-window minimizer must match per-character brute force even on
    multibyte text (code-point windows, not byte windows)."""
    from consult_ray.pipelines.extra_queries import q_minimizers  # noqa: F401 (import check)
    K = 16
    texts = ["zèbre annonce café au lait über alles", "short", "",
             "aaaaaaaaaaaaaaaaaaab", "中文测试 west of the middle 中文"]
    for t in texts:
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        if len(cp) <= K:
            got = t
        else:
            w = np.lib.stride_tricks.sliding_window_view(cp, K)
            idx = np.lexsort(np.ascontiguousarray(w).T[::-1])[0]
            got = "".join(chr(c) for c in w[idx])
        want = t if len(t) <= K else min(t[i:i + K] for i in range(len(t) - K + 1))
        assert got == want, t


def test_vectorized_labels_matches_unionfind():
    from consult_ray.state.unionfind import unionfind_labels, vectorized_labels
    rng = np.random.default_rng(11)
    for _ in range(15):
        n = int(rng.integers(2, 1500))
        e = int(rng.integers(1, 4000))
        a = rng.integers(0, n, e).astype(np.int64)
        b = rng.integers(0, n, e).astype(np.int64)
        nodes, labs = vectorized_labels(a, b)
        assert dict(zip(nodes.tolist(), labs.tolist())) == unionfind_labels(a, b)
    # empty edge set
    nodes, labs = vectorized_labels(np.array([], np.int64), np.array([], np.int64))
    assert len(nodes) == 0 and len(labs) == 0


def test_hll_approx_distinct_within_3pct(ray_session):
    """HyperLogLog daily distinct-user estimates must land within 3% of
    the exact counts at p=12 (sigma ~1.6%; the bound covers the max over
    ~30 daily draws) on the sf0.01 events table."""
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    qs = entrymod.queries()
    exact = qs["distinct_users_daily"](sf).to_pandas().sort_values(
        "day", ignore_index=True)
    approx = qs["approx_distinct_users_daily"](sf).to_pandas().sort_values(
        "day", ignore_index=True)
    assert list(exact.day) == list(approx.day)
    rel = np.abs(approx.n_users_approx - exact.n_users) / np.maximum(exact.n_users, 1)
    assert rel.max() <= 0.03, rel.max()


def test_hll_partition_finalize_matches_dense_reference(ray_session):
    """The partition-vectorized HLL finalize (one kernel for ALL groups
    in a hash partition) must reproduce the dense 2^p-register
    hll_estimate per group: many synthetic groups with very different
    cardinalities (including a 1-element group hitting the linear-count
    branch), estimates equal to the reference within 1 count (the two
    accumulation orders differ by ulps)."""
    from consult_ray.functions.sketch import hll_estimate, hll_register_updates
    from consult_ray.pipelines.operators import approx_distinct_count_by

    p = 12
    rng = np.random.default_rng(11)
    gs, vs = [], []
    for gid, card in enumerate([1, 7, 50, 400, 3000, 20000]):
        vals = rng.integers(0, 1 << 62, size=card, dtype=np.int64)
        vals = np.concatenate([vals, vals[: card // 2]])  # duplicates
        gs.append(np.full(len(vals), gid, dtype=np.int64))
        vs.append(vals)
    g, v = np.concatenate(gs), np.concatenate(vs)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(8)
    got = approx_distinct_count_by(ds, "g", "v", out_name="n", p=p).to_pandas()
    got = dict(zip(got.g, got.n))
    for gid in np.unique(g):
        vals = np.unique(v[g == gid]).view(np.uint64)
        idx, rho = hll_register_updates(vals, p, 7)
        regs = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(regs, idx, rho)
        want = hll_estimate(regs, p)
        assert abs(got[int(gid)] - int(round(want))) <= 1, (gid, got[int(gid)], want)


def test_pagerank_hand_graph(ray_session):
    """Integer PageRank vs a naive per-node reference loop on a small
    directed graph with a dangling node (d has no outlinks) and a
    2-node cycle."""
    from consult_ray.pipelines.cluster import pagerank

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"), ("b", "d")]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges]),
        "dst": pa.array([d for _, d in edges]),
    }))
    scale, iters = 10**12, 10
    got = pagerank(ds, CFG, iters=iters, scale=scale).to_pandas()
    got = dict(zip(got.host, got.pr))

    nodes = sorted({v for e in edges for v in e})
    n = len(nodes)
    outdeg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // outdeg[a]
        r = {v: (15 * scale) // (100 * n) + (85 * s[v]) // 100 for v in nodes}
    assert got == r
    # d has two in-links (from b and c); c has one (half of a's rank)
    assert got["d"] > got["c"]


def test_range_join_right_only_partition_and_nulls(ray_session):
    """Two review regressions: (a) a sort partition holding only
    right-side rows must not crash the empty-left branch (cross-table
    skew: left keys all sort above right keys); (b) null keys/timestamps
    mirror SQL predicate semantics — null left rows emit count 0, null
    right rows never count."""
    from consult_ray.pipelines.operators import range_join_count

    left = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "user_id": pa.array(["zzz", "zzz", None], pa.string()),
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 10:00", None, "2024-01-01 10:00"]),
            pa.timestamp("us")),
    })
    right = pa.table({
        "user_id": pa.array(["aaa"] * 2000 + ["zzz", None], pa.string()),
        "ts": pa.array(
            pd.to_datetime(["2024-01-01 10:05"] * 2001 + [None]),
            pa.timestamp("us")),
    })
    out = range_join_count(
        rd.from_arrow(left), rd.from_arrow(right), CFG,
        on="user_id", right_on="user_id", left_ts="ts", right_ts="ts",
        window_us=3600 * 1_000_000, left_keep=("event_id",),
    ).to_pandas()
    got = dict(zip(out.event_id, out.n_window))
    # row 0: one in-window non-null zzz right row; rows 1-2: null ts/key
    assert got == {0: 1, 1: 0, 2: 0}


def test_pagerank_empty_edge_table(ray_session):
    from consult_ray.pipelines.cluster import pagerank

    out = pagerank(
        rd.from_arrow(pa.table({
            "src": pa.array([], pa.string()),
            "dst": pa.array([], pa.string()),
        })),
        CFG,
    )
    # note: 0-row to_pandas drops columns in this Ray version, so assert
    # on the dataset schema
    assert out.count() == 0 and out.schema().names == ["host", "pr"]


def test_asof_join_string_keys_and_nulls(ray_session):
    """String (host-shaped) keys work; null keys/timestamps drop on both
    sides (inner ASOF semantics) instead of NaT-matching each other; a
    key range holding only right rows returns cleanly."""
    left = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "host": pa.array(["h2", "h2", None, "h2"], pa.string()),
        "ts": _ts("2024-01-02 00:00", "2024-01-01 00:00",
                  "2024-01-02 00:00", None),
    })
    right = pa.table({
        "host": pa.array(["h1", "h1", "h2", None], pa.string()),
        "ots": _ts("2024-01-01 00:00", "2024-01-02 00:00",
                   "2024-01-01 12:00", None),
    })
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right), CFG,
        on="host", right_on="host", left_ts="ts", right_ts="ots",
        out_ts="asof", left_keep=("event_id",),
    ).to_pandas()
    # only event 0 matches (h2 at 01-02 >= h2 order at 01-01 12:00);
    # event 1 precedes every h2 right row; events 2-3 are null-keyed/ts
    assert list(out.event_id) == [0]
    assert out["asof"].iloc[0] == pd.Timestamp("2024-01-01 12:00")
