"""Additional operator-coverage queries (SURVEY §2.6 sorts/limits/top-k/
sampling, §2.4 multi-way joins, §2.2 minimizer analog) registered
alongside the core set in queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from consult_ray.config import PipelineConfig
from consult_ray.util import read_parquet_clean
from consult_ray.util import resolve_join_partitions

CFG = PipelineConfig()


def _read(sf_dir: str, table: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# --- sorts / limits / top-k (O1-O3 analogs) --------------------------

def q_top_docs_by_chars(sf_dir: str):
    """Global sort + limit: top-20 docs by n_chars, doc_id tiebreak
    (deterministic total order, so LIMIT is well-defined)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


def q_source_top_docs(sf_dir: str):
    """Grouped top-k: the 3 longest docs per source (n_chars desc,
    doc_id tiebreak) with a 1-based rank — the "best k pages per
    domain" curation primitive. The per-block combiner inside
    operators.grouped_top_k bounds the shuffle to k rows per group per
    block, so at 100 TB only ~k*n_blocks tiny rows per source move."""
    from consult_ray.pipelines.operators import grouped_top_k

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return grouped_top_k(
        ds, "source", [("n_chars", True), ("doc_id", False)], k=3
    )


def q_orders_by_month(sf_dir: str):
    """Temporal bucketing + grouped count + sort by key."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def add_month(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(batch["o_orderdate"], unit="month")
        return pa.table({"month": month,
                         "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))})

    return (
        ds.map_batches(add_month, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("n", alias_name="n"))
    )


def q_deterministic_sample(sf_dir: str):
    """Deterministic 10% sample (hash-free modulo sampling — the O6
    seeded-sampling analog, reproducible across retries)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 10 == 0))

    return ds.map_batches(keep, batch_format="pyarrow")


# --- multi-way join (revenue per nation) -----------------------------

def q_nation_order_value(sf_dir: str):
    """orders ⋈ customer ⋈ nation -> total order value per nation.

    Scale plan: orders pre-aggregate per custkey FIRST (the join input
    shrinks from one row per order to one per customer), ONE hash join
    against customer, and nation resolves via a ray.put broadcast lookup
    array inside map_batches — the small side never shuffles. Money is
    integer cents per row before summing (associative, bit-exact vs the
    oracle at any partition order); partials are Arrow-native."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    nation_tbl = pa.concat_tables(
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    # dense lookup array indexed by nationkey (keys are small ints)
    nkeys = nation_tbl["n_nationkey"].to_numpy(zero_copy_only=False)
    names_by_key = np.empty(int(nkeys.max()) + 1, dtype=object)
    names_by_key[nkeys] = nation_tbl["n_name"].to_pylist()
    nation_ref = ray.put(names_by_key)

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        from consult_ray.util import grouped

        return grouped(
            pa.table({
                "o_custkey": batch["o_custkey"],
                "total_cents": cents,
                "n_orders": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }),
            ["o_custkey"], [("total_cents", "sum"), ("n_orders", "sum")],
            ["total_cents", "n_orders"],
        )

    from consult_ray.util import partitioned_group_agg, pin_schema

    # custkey cardinality scales with the corpus: the native hash
    # aggregate's per-distinct-key cost (58x at 2.6M keys, commit
    # 4fb6a54) makes it a scale cliff — merge the per-batch partials
    # with one partition kernel instead.
    per_cust = pin_schema(
        partitioned_group_agg(
            orders.map_batches(partial, batch_format="pyarrow"),
            "o_custkey",
            [("total_cents", "sum", "total_cents"),
             ("n_orders", "sum", "n_orders")],
            resolve_join_partitions(CFG),
        ),
        pa.schema([("o_custkey", pa.int64()), ("total_cents", pa.int64()),
                   ("n_orders", pa.int64())]),
    )
    joined = per_cust.join(
        cust, "inner", resolve_join_partitions(CFG),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def add_nation(batch: pa.Table) -> pa.Table:
        names = ray.get(nation_ref)
        keys = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array(names[keys], pa.string()),
            "total_cents": batch["total_cents"],
            "n_orders": batch["n_orders"],
        })

    return (
        joined.map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("total_cents", alias_name="total_cents"),
                   Sum("n_orders", alias_name="n_orders"))
    )


def q_region_revenue(sf_dir: str):
    """TPC-H-Q5-shaped 6-table join: local-supplier revenue per
    (region, nation) for one order year. The deepest join plan in the
    registry, every fan-in shrunk before it moves:

      lineitem --map_batches--> (orderkey, s_nation, cents) partials
        [supplier resolved via ray.put dense broadcast; revenue is
         integer cents PER ROW so every later sum is associative]
      ⋈ orders (year-filtered at the read; projected to 16 B rows)
      --per-batch partial--> (custkey, s_nation, cents)
      ⋈ customer           [the only two hash shuffles are the two
                            big-side joins; nation/region never move]
      --filter c_nation == s_nation--> broadcast nation/region names
      --per-batch partial + one tiny groupby--> (r_name, n_name, cents)

    At 100 TB: supplier is ~10^6 narrow rows (broadcastable), lineitem
    partials cap at ~suppliers-per-order rows per order, and both joins
    key on already-reduced 24 B rows — text-free and skew-safe."""
    import ray

    from consult_ray.util import grouped

    # small dims -> dense driver arrays, ray.put once
    sup = pa.concat_tables(
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    skeys = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    s_nat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    s_nat[skeys] = sup["s_nationkey"].to_numpy(zero_copy_only=False)
    nat = pa.concat_tables(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    reg = pa.concat_tables(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    nkeys = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    n_name = np.empty(int(nkeys.max()) + 1, dtype=object)
    n_name[nkeys] = nat["n_name"].to_pylist()
    rkeys = reg["r_regionkey"].to_numpy(zero_copy_only=False)
    r_by_region = np.empty(int(rkeys.max()) + 1, dtype=object)
    r_by_region[rkeys] = reg["r_name"].to_pylist()
    r_name = np.empty_like(n_name)
    r_name[nkeys] = r_by_region[
        nat["n_regionkey"].to_numpy(zero_copy_only=False)
    ]
    dims_ref = ray.put((s_nat, n_name, r_name))

    lineitem = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey",
                             "l_extendedprice", "l_discount"]
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        s_nat_arr, _, _ = ray.get(dims_ref)
        # cents per ROW, identical float64 op order to the oracle's
        # round(l_extendedprice * (1 - l_discount) * 100)
        cents = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(batch["l_extendedprice"],
                                pc.subtract(pa.scalar(1.0),
                                            batch["l_discount"])),
                    pa.scalar(100.0),
                ),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        snat = s_nat_arr[batch["l_suppkey"].to_numpy(zero_copy_only=False)]
        return grouped(
            pa.table({
                "l_orderkey": batch["l_orderkey"],
                "s_nation": pa.array(snat),
                "cents": cents,
            }),
            ["l_orderkey", "s_nation"], [("cents", "sum")], ["cents"],
        )

    li = lineitem.map_batches(li_partial, batch_format="pyarrow")

    import pyarrow.dataset as pads

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pads.field("o_orderdate") >= pa.scalar(
                np.datetime64("1996-01-01", "us")))
            & (pads.field("o_orderdate") < pa.scalar(
                np.datetime64("1997-01-01", "us")))
        ),
    ).select_columns(["o_orderkey", "o_custkey"])

    # both j1 inputs descend from FILTERED reads (a fully-filtered
    # fragment yields an empty block, and the li partial map strips it
    # to a null schema) — drop empty blocks so neither side's first
    # block can reach the join schema-less (util.pin_schema docstring).
    # The li side is per-block (orderkey, nation) partials, far smaller
    # than lineitem, so the materialize is cheap at any scale.
    from consult_ray.util import drop_empty_blocks

    j1 = drop_empty_blocks(li, CFG).join(
        drop_empty_blocks(orders, CFG), "inner",
        resolve_join_partitions(CFG),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def cust_partial(batch: pa.Table) -> pa.Table:
        return grouped(
            batch.select(["o_custkey", "s_nation", "cents"]),
            ["o_custkey", "s_nation"], [("cents", "sum")], ["cents"],
        )

    # j1 is a join output and cust_partial's map strips its empty
    # blocks to a NULL schema — feeding j2 a schema-less first block
    # crashes Acero at high partition counts (util.pin_schema docstring)
    from consult_ray.util import drop_empty_blocks

    per_cust = drop_empty_blocks(
        j1.map_batches(cust_partial, batch_format="pyarrow"), CFG
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = per_cust.join(
        customer, "inner", resolve_join_partitions(CFG),
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def localize(batch: pa.Table) -> pa.Table:
        _, n_name_arr, r_name_arr = ray.get(dims_ref)
        keep = pc.equal(batch["c_nationkey"],
                        batch["s_nation"].cast(pa.int64()))
        kept = batch.filter(keep)
        nk = kept["c_nationkey"].to_numpy(zero_copy_only=False)
        return grouped(
            pa.table({
                "r_name": pa.array(r_name_arr[nk], pa.string()),
                "n_name": pa.array(n_name_arr[nk], pa.string()),
                "revenue_cents": kept["cents"],
            }),
            ["r_name", "n_name"], [("revenue_cents", "sum")],
            ["revenue_cents"],
        )

    return (
        j2.map_batches(localize, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )


# --- minimizer (M1 analog) -------------------------------------------

def minimizers_dataset(ds, k: int = 16, text_col: str = "text",
                       id_col: str = "doc_id"):
    """Per-doc lexicographically-smallest k-substring — the direct
    web-text analog of CONSULT's minimizer extraction
    (/root/reference/minimization.cpp:158-180: slide a window, keep the
    lexicographically smallest). Backs the `minimizers` query and the
    CLI minimize mode."""
    K = k

    def fn(batch: pa.Table) -> pa.Table:
        # Vectorized across the WHOLE batch (the per-doc lexsort +
        # chr-join loop this replaces was the slowest construction in the
        # repo): all docs' code points concatenate into one array, every
        # window start across every doc is a candidate, and K elimination
        # rounds keep per-doc the starts minimal on code point j — a
        # radix tournament whose per-round work is one gather + one
        # segmented min (np.minimum.reduceat). Code-point order ==
        # binary UTF-8 order, duckdb's default collation.
        texts = [t or "" for t in batch[text_col].to_pylist()]
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        doc_off = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_off[1:])

        mins = [None] * len(texts)
        long_docs = np.nonzero(lens > K)[0]
        for i in np.nonzero(lens <= K)[0]:
            mins[int(i)] = texts[int(i)]
        if len(long_docs):
            # candidate window starts (absolute positions), doc-major
            n_win = lens[long_docs] - K + 1
            starts = np.repeat(doc_off[long_docs], n_win) + (
                np.arange(int(n_win.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(n_win) - n_win, n_win)
            )
            doc_of = np.repeat(np.arange(len(long_docs)), n_win)
            for j in range(K):
                vals = cp[starts + j]
                seg_starts = np.flatnonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])
                seg_min = np.minimum.reduceat(vals, seg_starts)
                # map each candidate to its doc's current min
                seg_of = np.cumsum(np.r_[False, doc_of[1:] != doc_of[:-1]])
                keep = vals == seg_min[seg_of]
                starts, doc_of = starts[keep], doc_of[keep]
                if len(starts) == len(long_docs):
                    break  # one candidate per doc already
            # first surviving start per doc is the minimizer
            firsts = np.flatnonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])
            for d, s in zip(doc_of[firsts], starts[firsts]):
                di = int(long_docs[d])
                local = int(s - doc_off[di])
                mins[di] = texts[di][local: local + K]
        return pa.table({id_col: batch[id_col], "minimizer": pa.array(mins, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_minimizers(sf_dir: str):
    """Registered query: k=16 minimizers over the documents table."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minimizers_dataset(ds)


# --- set ops ---------------------------------------------------------

def q_union_langs(sf_dir: str):
    """Union + distinct across two sources (documents.lang and a filtered
    events projection is meaningless; use documents vs documents-sample)."""
    a = _read(sf_dir, "documents", ["lang"])
    b = _read(sf_dir, "documents", ["lang"]).filter(expr="lang != 'en'")
    from consult_ray.pipelines.operators import preagg_group_count

    unioned = a.union(b)
    counts = preagg_group_count(unioned, "lang", "n", cfg=CFG)
    return counts


# --- temporal / streaming-window operators ---------------------------

def q_sessionized_events(sf_dir: str):
    """Per-user session count (30-min inactivity gap): single
    groupby(user) shuffle + per-group vectorized sort/diff."""
    from consult_ray.pipelines.operators import sessionize

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    return sessionize(ds, CFG, key="user_id", ts="ts",
                      order_tiebreak="event_id", gap_minutes=30)


def q_distinct_users_daily(sf_dir: str):
    """Exact COUNT(DISTINCT user) per day via two-level pair dedup."""
    from consult_ray.pipelines.operators import distinct_count_by

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def add_day(batch: pa.Table) -> pa.Table:
        return pa.table({"day": pc.floor_temporal(batch["ts"], unit="day"),
                         "user_id": batch["user_id"]})

    daily = ds.map_batches(add_day, batch_format="pyarrow")
    return distinct_count_by(daily, "day", "user_id", out_name="n_users", cfg=CFG)


def q_approx_distinct_users_daily(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user) per day — the sketch
    twin of distinct_users_daily: the shuffle carries at most 2^p
    register rows per day instead of one row per (day, user) pair. No
    SQL oracle on the ESTIMATE (its finalize is float); pytest asserts
    <=3% relative error vs the exact counts (sigma ~1.6% at p=12, bound
    covers the max over ~30 daily draws), and the underlying all-integer
    register state is itself SQL-witnessed bit-exactly by
    hll_registers_daily below."""
    from consult_ray.pipelines.operators import approx_distinct_count_by

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def add_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day_us": pc.floor_temporal(batch["ts"], unit="day").cast(pa.int64()),
            "user_id": batch["user_id"],
        })

    daily = ds.map_batches(add_day, batch_format="pyarrow")
    agg = approx_distinct_count_by(daily, "day_us", "user_id", out_name="n_users_approx")

    def restore_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch["day_us"].cast(pa.timestamp("us")),
            "n_users_approx": batch["n_users_approx"],
        })

    return agg.map_batches(restore_day, batch_format="pyarrow")


def q_hll_registers_daily(sf_dir: str):
    """The HLL summary CONTENT, bit-exact: per (day, register) the max
    rho over all user hashes (pipelines.operators.hll_register_maxima).
    The estimate query above stays rows-only (its finalize is float);
    this one witnesses the sketch itself against SQL — every column is
    an integer produced by splitmix64/shift/clz, all replayable in
    DuckDB HUGEINT (EXTRA_ORACLE_SQL), so the driver hash-compares the
    exact mergeable state that approx_distinct folds into estimates."""
    from consult_ray.pipelines.operators import hll_register_maxima

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def add_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day_us": pc.floor_temporal(batch["ts"], unit="day").cast(pa.int64()),
            "user_id": batch["user_id"],
        })

    daily = ds.map_batches(add_day, batch_format="pyarrow")
    regs = hll_register_maxima(daily, "day_us", "user_id")

    def restore_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": batch["day_us"].cast(pa.timestamp("us")),
            "reg": batch["reg"],
            "rho": batch["rho"],
        })

    return regs.map_batches(restore_day, batch_format="pyarrow")


def _hll_registers_sql(p: int = 12, seed: int = 7) -> str:
    """DuckDB replay of hll_register_maxima over events: two's-complement
    user_id -> uint64, splitmix64(u ^ seed) in HUGEINT (the same _sm64
    twin the seeded-shuffle oracle uses), reg = top p bits, w = low
    64-p bits shifted up, rho = clz(w)+1 via bin()'s minimal bit length
    (bin(w) of a positive HUGEINT has exactly floor(log2 w)+1 digits)."""
    from consult_ray.pipelines.flagship_oracle import M64, _sm64

    cap = 64 - p + 1
    u = f"(((CAST(user_id AS HUGEINT) % {M64}) + {M64}) % {M64})"
    h = _sm64(f"xor({u}, CAST({seed} AS HUGEINT))")
    return f"""
WITH hashed AS (
  SELECT date_trunc('day', ts) AS day, {h} AS h FROM events
),
regs AS (
  SELECT day,
         CAST(h // {1 << (64 - p)} AS BIGINT) AS reg,
         (h * {1 << p}) % {M64} AS w
  FROM hashed
)
SELECT day, reg,
       CAST(MAX(CASE WHEN w = 0 THEN {cap}
                ELSE LEAST(64 - length(bin(w)) + 1, {cap}) END) AS BIGINT) AS rho
FROM regs GROUP BY day, reg"""


def q_top_users_by_value(sf_dir: str):
    """Top-20 users by total event value. Values convert to integer cents
    per row BEFORE summing so the distributed sum is associative and
    bit-exact vs the oracle; pre-aggregated per batch, then a
    partition-kernel merge (user_id cardinality scales with the corpus
    — the native per-distinct-key aggregate is the measured 58x cliff,
    4fb6a54) with a per-partition top-20 trim before the tiny global
    sort (same superset argument as q_top_words)."""
    from consult_ray.util import partitioned_group_agg

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch["value"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        from consult_ray.util import grouped

        return grouped(
            pa.table({"user_id": batch["user_id"], "total_cents": cents}),
            ["user_id"], [("total_cents", "sum")], ["total_cents"],
        )

    agg = partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id", [("total_cents", "sum", "total_cents")],
        resolve_join_partitions(CFG),
    )

    def trim(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("total_cents", "descending"), ("user_id", "ascending")],
        )
        return batch.take(idx[:20])

    top = agg.map_batches(trim, batch_format="pyarrow").materialize()
    return top.sort(["total_cents", "user_id"], descending=[True, False]).limit(20)


def q_events_sliding_3h(sf_dir: str):
    """Sliding-window aggregate: hourly event counts with a 3-hour
    trailing-window sum per event type. The tumbling aggregate shrinks
    the data to one row per (type, hour) FIRST; the window pass then
    runs per type in map_groups over that tiny table — the standard
    two-level plan for sliding windows over high-volume streams."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def add_hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "hour": pc.floor_temporal(batch["ts"], unit="hour"),
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    hourly = (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def window(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("hour", "ascending")])
        g = g.take(order)
        hours = g["hour"].to_numpy(zero_copy_only=False).astype("datetime64[h]").astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False)
        # trailing 3h (current + 2 previous CALENDAR hours, gaps count 0)
        csum = np.concatenate([[0], np.cumsum(n)])
        lo = np.searchsorted(hours, hours - 2, side="left")
        n3 = csum[np.arange(len(n)) + 1] - csum[lo]
        return pa.table({
            "event_type": g["event_type"],
            "hour": g["hour"],
            "n": g["n"],
            "n_3h": pa.array(n3.astype(np.int64)),
        })

    return hourly.groupby("event_type").map_groups(window, batch_format="pyarrow")


def q_events_asof_order(sf_dir: str):
    """As-of join (an operator Ray Data lacks): each event matched to the
    latest order of the same user at or before the event time."""
    from consult_ray.pipelines.operators import asof_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    return asof_join(
        events, orders, CFG,
        on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        out_ts="asof_date", left_keep=("event_id",),
    )


def q_events_range_1h(sf_dir: str):
    """Range/interval join (the third temporal-join shape next to the
    as-of join and the sliding window): per event, how many events the
    same user produced within +-1 hour — a burst-activity feature. Self
    range join, anchor row included in its own count (mirrored in the
    SQL). Bucketed band-join plan — see operators.range_join_count for
    the partitioning story. (events x orders would be degenerate here:
    the sf events stream is 2024, orders end in 2001.)"""
    from consult_ray.pipelines.operators import range_join_count

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return range_join_count(
        events, events, CFG,
        on="user_id", right_on="user_id",
        left_ts="ts", right_ts="ts",
        window_us=3600 * 1_000_000,
        left_keep=("event_id",),
    )


# --- dedup-family variants with SQL oracles --------------------------

def q_ngram_jaccard_doc0(sf_dir: str):
    """Exact character-trigram Jaccard of every doc vs doc 0 (the n-gram
    Jaccard near-dup family with a SQL-checkable shape). Scores scale to
    e4 integers; trigram sets are exact rationals so both sides agree
    bit-for-bit. The scalable near-dup path hashes shingles instead
    (fingerprints/minhash); this exposes the un-hashed metric itself."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ref_tbl = pa.concat_tables(
        ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    id_np = ref_tbl["doc_id"].to_numpy(zero_copy_only=False)
    base_text = ref_tbl["text"].to_pylist()[int(np.nonzero(id_np == 0)[0][0])] or ""

    def _tri_keys(cp: np.ndarray) -> np.ndarray:
        """distinct character trigrams as packed uint64 (3 x 21-bit code
        points) — vectorized set representation."""
        if len(cp) < 3:
            return np.empty(0, dtype=np.uint64)
        c = cp.astype(np.uint64)
        return np.unique(
            (c[:-2] << np.uint64(42)) | (c[1:-1] << np.uint64(21)) | c[2:]
        )

    g0 = _tri_keys(np.frombuffer(base_text.encode("utf-32-le"), dtype=np.uint32))
    import ray as _ray

    g0_ref = _ray.put(g0)

    def fn(batch: pa.Table) -> pa.Table:
        # fully vectorized across the batch: one codepoint concat, packed
        # trigram keys, per-(doc, key) dedup via one unique pass, and a
        # sorted-array membership test against the broadcast doc-0 set
        ref = _ray.get(g0_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = [t or "" for t in batch["text"].to_pylist()]
        n = len(texts)
        cp = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        c = cp.astype(np.uint64)
        n_docs_grams = np.zeros(n, dtype=np.int64)
        n_inter = np.zeros(n, dtype=np.int64)
        if len(c) >= 3:
            tri = (c[:-2] << np.uint64(42)) | (c[1:-1] << np.uint64(21)) | c[2:]
            starts = np.arange(len(tri), dtype=np.int64)
            doc_of = np.searchsorted(offs, starts, side="right") - 1
            valid = (starts + 3) <= offs[doc_of + 1]
            tri, doc_of = tri[valid], doc_of[valid]
            # distinct (doc, trigram): sort by a fused key and drop runs.
            # trigram keys use 63 bits, so fuse via lexsort instead of
            # packing: order by (doc, tri), then first-of-run mask
            order = np.lexsort((tri, doc_of))
            d_s, t_s = doc_of[order], tri[order]
            first = np.r_[True, (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])]
            d_u, t_u = d_s[first], t_s[first]
            n_docs_grams = np.bincount(d_u, minlength=n)
            pos = np.searchsorted(ref, t_u)
            pos_c = np.clip(pos, 0, max(len(ref) - 1, 0))
            hit = len(ref) > 0 and ref[pos_c] == t_u
            if np.any(hit):
                n_inter = np.bincount(d_u[hit], minlength=n)
        union = n_docs_grams + len(g0) - n_inter
        jac = np.where(union > 0, n_inter / np.maximum(union, 1), 1.0)
        # half-up to match duckdb round() (numpy round is half-even)
        e4 = np.floor(jac * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids), "jaccard_e4": pa.array(e4)})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos >= 0.35, a < b): per-batch
    float64 matmul against the broadcast full matrix — the brute-force
    N x M block of a cosine self-join; the LSH-bucketed variant
    (knn_lsh) is the scale path."""
    import ray as _ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    full = pa.concat_tables(ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    ids_all = full["vec_id"].to_numpy(zero_copy_only=False)
    m = np.asarray(full["embedding"].combine_chunks().flatten(), dtype=np.float64)
    m = m.reshape(len(ids_all), -1)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    mat_ref = _ray.put((ids_all, m / norms[:, None]))

    TAU = 0.35

    def fn(batch: pa.Table) -> pa.Table:
        ids_r, mat = _ray.get(mat_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        q = np.asarray(batch["embedding"].combine_chunks().flatten(), dtype=np.float64)
        q = q.reshape(len(ids), -1)
        qn = np.linalg.norm(q, axis=1)
        qn[qn == 0] = 1.0
        sims = (q / qn[:, None]) @ mat.T
        ai, bj = np.nonzero(sims >= TAU)
        a, b = ids[ai], ids_r[bj]
        keep = a < b
        cos = sims[ai[keep], bj[keep]]
        e4 = np.floor(cos * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "cos_e4": pa.array(e4)})

    return ds.map_batches(fn, batch_format="pyarrow")


_BPE_PAT = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def q_token_stats_bpe(sf_dir: str):
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (letters / digits / punctuation runs with optional leading space)
    counted per doc. Both sides run RE2 — pyarrow count_substring_regex
    here, duckdb regexp_extract_all in the oracle — so counts are
    bit-identical."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch["text"], _BPE_PAT), pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": n})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_top_words(sf_dir: str):
    """Corpus-wide vocabulary census: top-50 space-separated words by
    frequency (word tiebreak). The token explosion never leaves the
    batch: per-batch value_counts pre-aggregates to one (word, n) row
    per distinct word per block, so the shuffle moves vocabulary-sized
    partials, not one row per token. The merge is a partition kernel
    (vocab cardinality scales with the corpus — the native
    per-distinct-key aggregate is the measured 58x cliff, commit
    4fb6a54), and each partition keeps only its local top-50 under the
    SAME total order before the final global sort, so the sort input is
    <= 50 x partitions rows no matter the vocabulary size (a word's
    census row lives in exactly one partition, so any global top-50
    word survives its partition's top-50)."""
    from consult_ray.util import partitioned_group_agg

    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        counts = pc.value_counts(words)
        return pa.table({
            "word": counts.field("values"),
            "n": counts.field("counts").cast(pa.int64()),
        })

    agg = partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "word", [("n", "sum", "n")], resolve_join_partitions(CFG),
    )

    def trim(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch, sort_keys=[("n", "descending"), ("word", "ascending")]
        )
        return batch.take(idx[:50])

    # materialize the tiny trimmed set so the sort's sampling pass
    # cannot re-execute the census (CLAUDE.md sort-reexecution quirk)
    top = agg.map_batches(trim, batch_format="pyarrow").materialize()
    return top.sort(["n", "word"], descending=[True, False]).limit(50)


def q_embedding_clusters(sf_dir: str):
    """Connected components over the exact embedding-cosine pair graph
    (cos >= 0.35): cluster label = min vec_id in the component,
    singletons label themselves. This gives the CC operator itself a
    SQL oracle — a recursive transitive-closure CTE over the same
    cosine predicate (since round 4 dedup_clusters ALSO has a full
    HUGEINT band-key replay oracle in pipelines/flagship_oracle.py;
    this one exercises CC over an independently-derived edge set)."""
    from consult_ray.pipelines.cluster import assign_clusters, connected_components

    edges = q_embedding_dup_pairs(sf_dir)  # exact pair gen (SQL-green itself)
    labels = connected_components(edges, CFG)
    vecs = _read(sf_dir, "embeddings", ["vec_id"])
    return assign_clusters(vecs, labels, CFG, id_col="vec_id")


# --- web-pipeline operators over the input_hint pages shape ----------

from consult_ray.pipelines.pagesview import (  # single source of truth
    PAGES_EPOCH_US as _PAGES_EPOCH_US,
    PAGES_URL_SQL as _URL_SQL,
    pages_url as _pages_url,
)

_RECRAWL_DELTA_US = 30 * 86_400 * 1_000_000


def q_pages_latest_crawl(sf_dir: str):
    """Snapshot dedup: keep the LATEST crawl per url across two
    deterministic crawl snapshots (every doc_id % 3 == 0 page is
    re-crawled 30 days later) — the keep-newest-per-key operator every
    Common-Crawl ingest runs before content dedup. url/warc_ts derived
    exactly as queries._pages_table; timestamps carried as epoch-us
    BIGINT for oracle hash safety. Plan: union of two narrow
    map_batches -> per-batch partial (max, count) -> one partition-
    kernel merge keyed on url (url cardinality scales with the corpus,
    so the native per-distinct-key aggregate is the measured 58x cliff,
    commit 4fb6a54); nothing wider than the url key ever shuffles."""
    from consult_ray.util import grouped, partitioned_group_agg

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def mk(recrawl: bool):
        def f(batch: pa.Table) -> pa.Table:
            if recrawl:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                batch = batch.filter(pa.array(ids % 3 == 0))
            url = _pages_url(batch)
            ts = pc.add(
                pc.multiply(batch["doc_id"], pa.scalar(1_000_000, pa.int64())),
                pa.scalar(
                    _PAGES_EPOCH_US + (_RECRAWL_DELTA_US if recrawl else 0),
                    pa.int64(),
                ),
            )
            return pa.table({"url": url, "ts_us": ts})

        return f

    pages = docs.map_batches(mk(False), batch_format="pyarrow").union(
        docs.map_batches(mk(True), batch_format="pyarrow")
    )

    def pre(batch: pa.Table) -> pa.Table:
        return grouped(batch, ["url"], [("ts_us", "max"), ("ts_us", "count")],
                       ["mx", "cnt"])

    return partitioned_group_agg(
        pages.map_batches(pre, batch_format="pyarrow"),
        "url",
        [("mx", "max", "latest_ts_us"), ("cnt", "sum", "n_crawls")],
        resolve_join_partitions(CFG),
    )


def q_line_dedup_stats(sf_dir: str):
    """Global LINE-level exact dedup (the RefinedWeb/CCNet boilerplate
    pass): derive per-doc lines (stages/lines.py — header/footer
    boilerplate repeats across every doc of a source), keep each
    distinct line's first instance by (doc_id, line_no), and report per
    doc how many of its lines are keepers. Plan: three partition-kernel
    merges of 16-byte rows — line_hash min(packed doc,line_no) for
    winners, doc_id count sums — then one narrow left join; line TEXT
    never shuffles (64-bit hash key; ~3e-5 collision odds at 2^40
    lines, same contract as exact_dedup_groups). line_hash cardinality
    = corpus LINE count and doc_id cardinality = corpus doc count, so
    every merge here is a partition kernel, never the native
    per-distinct-key aggregate (the measured 58x cliff, commit
    4fb6a54)."""
    from consult_ray.stages.lines import LINE_NO_BITS, lines_batch, pack_line_key
    from consult_ray.util import grouped, partitioned_group_agg

    P = resolve_join_partitions(CFG)
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    # materialized: both the totals and winners branches consume it, and
    # each partition shuffle's sampling pass would otherwise re-run the
    # line derivation a third time (CLAUDE.md sort-reexecution quirk)
    keyed = docs.map_batches(
        lambda b: pack_line_key(lines_batch(b)), batch_format="pyarrow"
    ).materialize()

    def pre_tot(batch: pa.Table) -> pa.Table:
        return grouped(batch, ["doc_id"], [("pack", "count")], ["cnt"])

    totals = partitioned_group_agg(
        keyed.map_batches(pre_tot, batch_format="pyarrow"),
        "doc_id", [("cnt", "sum", "n_lines")], P,
    )

    def pre_win(batch: pa.Table) -> pa.Table:
        return grouped(batch, ["line_hash"], [("pack", "min")], ["pack"])

    winners = partitioned_group_agg(
        keyed.map_batches(pre_win, batch_format="pyarrow"),
        "line_hash", [("pack", "min", "pack")], P,
    )

    def win_doc(batch: pa.Table) -> pa.Table:
        d = pc.shift_right(batch["pack"], pa.scalar(LINE_NO_BITS, pa.int64()))
        return grouped(pa.table({"doc_id": d}), ["doc_id"],
                       [("doc_id", "count")], ["cnt"])

    kept = partitioned_group_agg(
        winners.map_batches(win_doc, batch_format="pyarrow"),
        "doc_id", [("cnt", "sum", "n_kept")], P,
    )

    # both join inputs are hash-aggregate outputs: pin their schemas so
    # empty partitions (partitions > distinct doc_ids) can't feed Acero
    # schema-less blocks (the doc_top_terms failure class)
    from consult_ray.util import pin_schema

    totals = pin_schema(
        totals, pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64())])
    )
    kept = pin_schema(
        kept, pa.schema([("doc_id", pa.int64()), ("n_kept", pa.int64())])
    )
    joined = totals.join(
        kept, "left_outer", resolve_join_partitions(CFG), on=("doc_id",)
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": batch["n_lines"].cast(pa.int64()),
            "n_kept": batch["n_kept"].fill_null(0).cast(pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def q_doc_repetition_stats(sf_dir: str):
    """Per-doc repetition census (the Gopher repetition-filter inputs):
    word count, distinct-word count, and the most frequent word with
    its count (ties broken by ascending word — binary collation both
    sides). Entirely row-local: each batch computes its own docs' stats
    with Arrow group_by/sort kernels; NO shuffle at any scale. Integer
    and string outputs only, so the oracle hash is exact (the derived
    fractions are left to the consumer)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        from consult_ray.util import grouped

        n = batch.num_rows
        words = pc.split_pattern(batch["text"], " ")
        lens = pc.list_value_length(words).cast(pa.int64())
        flat = pc.list_flatten(words)
        d = np.repeat(np.arange(n, dtype=np.int64),
                      lens.to_numpy(zero_copy_only=False))
        wtab = pa.table({"d": pa.array(d), "w": flat})
        counts = grouped(wtab, ["d", "w"], [("w", "count")], ["cnt"])
        counts = counts.set_column(
            2, "cnt", counts["cnt"].cast(pa.int64())
        )
        # distinct words per doc
        nd = np.bincount(counts["d"].to_numpy(zero_copy_only=False),
                         minlength=n).astype(np.int64)
        # top word: first row per doc after (cnt desc, w asc) sort
        srt = counts.sort_by([("d", "ascending"), ("cnt", "descending"),
                              ("w", "ascending")])
        ds_ = srt["d"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], ds_[1:] != ds_[:-1])) if len(ds_) else \
            np.zeros(0, bool)
        top = srt.filter(pa.array(first))
        # srt covers every doc with >=1 word; split_pattern never yields
        # an empty list (empty text -> ['']), so top has exactly n rows
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": lens,
            "n_distinct_words": pa.array(nd),
            "top_word": top["w"],
            "top_word_count": top["cnt"],
        })

    return docs.map_batches(stats, batch_format="pyarrow")


def q_domain_stats(sf_dir: str):
    """Per-domain corpus census over the url-keyed pages view: doc
    count, total text bytes, distinct langs — the partition census every
    crawl-scale pipeline runs before per-site policies. The domain is
    PARSED from the url (not read from `source`) so the string-extract
    kernel is exercised. Distinct-per-group without a distinct shuffle:
    batch partials collapse to (domain, lang) rows, one small groupby
    merges them, a second tiny groupby folds langs per domain."""
    from consult_ray.util import grouped

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        url = _pages_url(batch)
        # domain = host between the scheme and the first path slash
        domain = pc.list_element(pc.split_pattern(url, "/"), 2)
        t = pa.table({
            "domain": domain,
            "lang": batch["lang"],
            "nb": pc.binary_length(batch["text"]).cast(pa.int64()),
        })
        return grouped(t, ["domain", "lang"], [("nb", "count"), ("nb", "sum")],
                       ["cnt", "nb"])

    per_lang = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["domain", "lang"])
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("nb", alias_name="nb"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        return grouped(
            batch.select(["domain", "cnt", "nb"]),
            ["domain"], [("cnt", "sum"), ("nb", "sum"), ("cnt", "count")],
            ["n_docs", "total_bytes", "n_langs"],
        )

    # second phase re-keys (domain, lang)->domain: partial fold per
    # batch, tiny groupby merges (n_langs partials sum correctly because
    # (domain, lang) rows are already globally unique after phase one)
    return (
        per_lang.map_batches(fold, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_bytes", alias_name="total_bytes"),
                   Sum("n_langs", alias_name="n_langs"))
    )


def q_gopher_filter(sf_dir: str):
    """Gopher-style repetition/length quality gate (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): keep docs with >= 30 words, top-word
    fraction <= 1/5, and distinct-word ratio >= 1/2. Entirely row-local
    (reuses q_doc_repetition_stats' per-batch census) — NO shuffle at
    any scale; emits the surviving ids + the stats that justified them."""
    stats = q_doc_repetition_stats(sf_dir)

    def gate(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"]
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(nw, pa.scalar(30)),
                pc.less_equal(
                    pc.multiply(batch["top_word_count"], pa.scalar(5)), nw
                ),
            ),
            pc.greater_equal(
                pc.multiply(batch["n_distinct_words"], pa.scalar(2)), nw
            ),
        )
        return batch.filter(keep).select(
            ["doc_id", "n_words", "n_distinct_words", "top_word_count"]
        )

    return stats.map_batches(gate, batch_format="pyarrow")


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified head-k: the 3 smallest doc_ids per
    (lang, source) stratum — the balanced eval-set draw. Two-phase
    top-k: each batch keeps its own k smallest per stratum (vectorized
    lexsort + run-rank, no Python loop), then one groupby over rows
    <= k * n_strata merges. Equivalent to a global per-group
    row_number() <= k at a fraction of the shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
    K = 3

    def head_k(batch: pa.Table) -> pa.Table:
        srt = batch.sort_by(
            [("lang", "ascending"), ("source", "ascending"),
             ("doc_id", "ascending")]
        )
        lang = srt["lang"].to_numpy(zero_copy_only=False)
        src = srt["source"].to_numpy(zero_copy_only=False)
        new = np.concatenate((
            [True], (lang[1:] != lang[:-1]) | (src[1:] != src[:-1])
        )) if len(lang) else np.zeros(0, bool)
        # rank within run: index - index_of_run_start
        idx = np.arange(len(lang))
        run_start = idx[new]
        rank = idx - np.repeat(run_start, np.diff(np.append(run_start, len(lang))))
        return srt.filter(pa.array(rank < K))

    merged = docs.map_batches(head_k, batch_format="pyarrow")
    # rows now <= K * n_strata * n_blocks; one map_groups finishes
    def final_k(g: pa.Table) -> pa.Table:
        return g.sort_by([("doc_id", "ascending")]).slice(0, K)

    return merged.groupby(["lang", "source"]).map_groups(
        final_k, batch_format="pyarrow"
    )


def q_length_quantiles(sf_dir: str):
    """Exact per-lang length quantiles (p25/p50/p75/p95 of n_chars) via
    DISTRIBUTED value counting: batch partials collapse to
    (lang, n_chars) count rows, a groupby merges them, and only that
    bounded count table (distinct lengths x langs, ~1e6 rows even at
    web scale) reaches the driver for the cumulative scan — the plan
    shape that replaces a full sort at 10^12 rows. Quantile definition:
    smallest v with count(x <= v) >= ceil(q * n) (inverse-CDF /
    percentile_disc semantics, exactly mirrored in the oracle SQL)."""
    from consult_ray.util import grouped

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        return grouped(batch, ["lang", "n_chars"], [("n_chars", "count")],
                       ["cnt"])

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    counts = counts.sort_values(["lang", "n_chars"], ignore_index=True)
    out = []
    QS = [(25, 0.25), (50, 0.50), (75, 0.75), (95, 0.95)]
    for lang, g in counts.groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"lang": lang}
        for tag, q in QS:
            need = int(np.ceil(q * n))
            row[f"p{tag}"] = int(vals[np.searchsorted(cum, need)])
        out.append(row)
    return pa.Table.from_pylist(out)


def q_approx_length_quantiles(sf_dir: str):
    """Approximate per-lang length quantiles from a bounded mergeable
    equi-rank summary (functions/sketch.py qsketch_*) — the scale path
    when the value domain is unbounded (floats, high-cardinality
    lengths) and q_length_quantiles' exact count table would approach
    the row count and degrade to a full sort. Per-block per-lang
    summaries (<=4096 weighted points, binary-serialized) pre-fold
    fan-in 16 in worker tasks before take_all (the bounded-intake
    convention); rank error <= merge_depth * n / 4096 (<0.1% here).
    Rows-only: pytest bounds the rank error vs the exact CDF."""
    from consult_ray.functions.sketch import (
        qsketch_merge, qsketch_prune, qsketch_quantile,
    )

    B = 4096
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])

    def pack(out_l, out_s) -> pa.Table:
        return pa.table({
            "lang": pa.array(out_l, pa.string()),
            "v": pa.array(
                [s[0].astype(np.int64).tobytes() for s in out_s],
                pa.large_binary(),
            ),
            "w": pa.array(
                [s[1].astype(np.float64).tobytes() for s in out_s],
                pa.large_binary(),
            ),
        })

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        vals = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_l, out_s = [], []
        for lg in np.unique(langs):  # ~10 langs, not a hot loop
            m = langs == lg
            out_l.append(str(lg))
            out_s.append(qsketch_prune(vals[m], np.ones(int(m.sum())), B))
        return pack(out_l, out_s)

    def combine(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        out_l, out_s = [], []
        for lg in np.unique(langs):
            rows = np.flatnonzero(langs == lg)
            ss = [
                (np.frombuffer(batch["v"][int(i)].as_py(), np.int64),
                 np.frombuffer(batch["w"][int(i)].as_py(), np.float64))
                for i in rows
            ]
            out_l.append(str(lg))
            out_s.append(qsketch_merge(ss, B))
        return pack(out_l, out_s)

    rows = (
        docs.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=16)
        .take_all()
    )
    bylang: dict[str, list] = {}
    for r in rows:
        bylang.setdefault(r["lang"], []).append(
            (np.frombuffer(r["v"], np.int64), np.frombuffer(r["w"], np.float64))
        )
    out = []
    for lg in sorted(bylang):
        v, w = qsketch_merge(bylang[lg], B)
        out.append({"lang": lg} | {
            f"p{tag}": int(qsketch_quantile(v, w, q))
            for tag, q in [(25, 0.25), (50, 0.50), (75, 0.75), (95, 0.95)]
        })
    return pa.Table.from_pylist(out)


def q_crawl_changed(sf_dir: str):
    """Cross-snapshot change detection: every doc_id%3==0 page is
    re-crawled 30 days later and every doc_id%6==0 page came back with
    CHANGED content (text + ' updated!') — report each re-crawled url
    with whether its content changed. Ray compares 64-bit content
    hashes so text never shuffles (the exact_dedup collision contract);
    the oracle compares the text itself — equal results whenever the
    hash is collision-free on the corpus. The snapshot merge keys on
    url (corpus cardinality), so it is a partition kernel, not a native
    per-distinct-key aggregate (the measured 58x cliff, 4fb6a54)."""
    from consult_ray.stages.text import doc_fingerprint_batch
    from consult_ray.util import grouped, partitioned_group_agg

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def snapshots(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        re_mask = ids % 3 == 0
        base = batch
        recrawl = batch.filter(pa.array(re_mask))
        rids = recrawl["doc_id"].to_numpy(zero_copy_only=False)
        changed = pa.array(rids % 6 == 0)
        new_text = pc.if_else(
            changed,
            pc.binary_join_element_wise(recrawl["text"], " updated!", ""),
            recrawl["text"],
        )
        recrawl = recrawl.set_column(
            recrawl.schema.get_field_index("text"), "text", new_text
        )
        both = pa.concat_tables([base, recrawl])
        url = _pages_url(both)
        h = doc_fingerprint_batch(both)["content_hash"]
        t = pa.table({"url": url, "h": h})
        return grouped(t, ["url"], [("h", "min"), ("h", "max"), ("h", "count")],
                       ["hmin", "hmax", "cnt"])

    agg = partitioned_group_agg(
        docs.map_batches(snapshots, batch_format="pyarrow"),
        "url",
        [("hmin", "min", "hmin"), ("hmax", "max", "hmax"),
         ("cnt", "sum", "cnt")],
        resolve_join_partitions(CFG),
    )

    def finish(batch: pa.Table) -> pa.Table:
        both = pc.equal(batch["cnt"], pa.scalar(2, pa.int64()))
        out = batch.filter(both)
        return pa.table({
            "url": out["url"],
            "changed": pc.not_equal(out["hmin"], out["hmax"]),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_export_survivors(sf_dir: str):
    """Sink path as a first-class query (S5 + the resumable-output
    contract): exact-dedup survivors are WRITTEN as hive-partitioned
    parquet (one lang=<v> directory per language + a _SUCCESS marker;
    a failed run re-exports, a finished one is skipped), then read
    BACK through read_parquet's partition decoding and censused —
    proving the output layout round-trips. Oracle = the same census
    over the SQL survivor set."""
    import hashlib
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from consult_ray.pipelines import operators as ops
    from consult_ray.util import grouped

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    # cache key carries the source row count so a regenerated corpus at
    # the same path can't serve a stale export (metadata-only read)
    nrows = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    key = hashlib.md5(f"{sf_dir}:{nrows}:survivors:v1".encode()).hexdigest()[:12]
    base = "/tmp/consult_ray_export"
    out_dir = f"{base}/{key}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        # unique tmp per process: concurrent builders each write their
        # own complete copy and the swap stays last-writer-wins atomic
        os.makedirs(base, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix=f"{key}.tmp", dir=base)
        survivors = ops.exact_dedup_survivors(docs, CFG).select_columns(
            ["doc_id", "lang", "n_chars"]
        )
        survivors.write_parquet(tmp, partition_cols=["lang"])
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
        shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.replace(tmp, out_dir)
        except OSError:  # lost the swap race; the winner's copy is live
            shutil.rmtree(tmp, ignore_errors=True)

    back = rd.read_parquet(out_dir)

    def pre(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "lang": batch["lang"].cast(pa.string()),
            "n_chars": batch["n_chars"].cast(pa.int64()),
        })
        return grouped(t, ["lang"], [("n_chars", "count"), ("n_chars", "sum")],
                       ["n_docs", "total_chars"])

    return (
        back.map_batches(pre, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_chars", alias_name="total_chars"))
    )


_MG_K = 256            # Misra-Gries summary size per block
_MG_SENTINEL = " "     # can't collide with a word (tokens are split on space)


def q_heavy_hitter_words(sf_dir: str):
    """EXACT corpus heavy hitters (every word whose count*100 >= total
    word count) via a two-pass Misra-Gries plan (Misra & Gries 1982;
    mergeable-summaries merge per Agarwal et al. 2012):

      pass 1: per-block exact counts (pc.value_counts) shrunk to a
              k-entry MG summary; summaries sum-merge in ONE small
              groupby. A sentinel row carries the total token count.
      pass 2: the candidate set (merged weight >= threshold - slack,
              where slack = total // (k+1) bounds the total MG
              undercount — a deterministic SUPERSET of the true heavy
              hitters) is broadcast; blocks count candidates exactly;
              one groupby + integer threshold filter gives the exact
              answer.

    Unlike top_words (full vocabulary census), nothing proportional to
    the vocabulary ever reaches the driver: only the candidates (at
    most ~total/(threshold-slack) words) are collected. SQL-checked
    bit-exact — the two-pass structure is lossless by the MG bound."""
    import ray

    from consult_ray.functions.sketch import misra_gries_shrink

    docs = _read(sf_dir, "documents", ["text"])

    def summarize(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        vc = pc.value_counts(toks)
        words = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        w2, c2 = misra_gries_shrink(words, counts, _MG_K)
        return pa.table({
            "word": pa.array(np.concatenate([w2, [_MG_SENTINEL]]), pa.string()),
            "w": pa.array(np.concatenate([c2, [counts.sum()]]).astype(np.int64)),
        })

    # the summary key space is the UNION of block summaries (k words per
    # block — grows with the corpus), so the merge is a partition
    # kernel, not a native per-distinct-key aggregate (58x, 4fb6a54)
    from consult_ray.util import partitioned_group_agg

    summary = partitioned_group_agg(
        docs.map_batches(summarize, batch_format="pyarrow"),
        "word", [("w", "sum", "w")], resolve_join_partitions(CFG),
    ).materialize()  # small: bounded by the block summaries' union
    sent = summary.filter(expr=f"word == '{_MG_SENTINEL}'").take_all()
    if not sent:  # empty corpus: no blocks ever emitted the sentinel
        return rd.from_arrow(pa.table({
            "word": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }))
    total = sent[0]["w"]
    thresh = -(-total // 100)          # ceil: 100*c >= total  <=>  c >= thresh
    slack = total // (_MG_K + 1)       # max total MG undercount
    # the two-pass superset proof needs thresh > slack: an item dropped
    # from every block summary has merged weight 0, so with slack >=
    # thresh it could still be heavy yet never become a candidate. Holds
    # iff _MG_K + 1 > the threshold divisor (256+1 > 100); keep coupled.
    assert thresh > slack, (
        f"MG superset bound void: k={_MG_K} too small for threshold "
        f"total/100 (thresh={thresh} <= slack={slack})"
    )
    cands = sorted(
        r["word"]
        for r in summary.filter(
            expr=f"w >= {max(thresh - slack, 1)} and word != '{_MG_SENTINEL}'"
        ).take_all()
    )
    ref = ray.put(pa.array(cands, pa.string()))

    def count_cands(batch: pa.Table) -> pa.Table:
        val = ray.get(ref)
        toks = pc.list_flatten(pc.split_pattern(batch["text"], pattern=" "))
        toks = toks.filter(pc.is_in(toks, value_set=val))
        vc = pc.value_counts(toks)
        return pa.table({
            "word": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64()),
        })

    return partitioned_group_agg(
        docs.map_batches(count_cands, batch_format="pyarrow"),
        "word", [("n", "sum", "n")], resolve_join_partitions(CFG),
    ).filter(expr=f"n >= {thresh}")


def q_doc_top_terms(sf_dir: str):
    """Per-document top-3 salient terms under (tf desc, df asc, token
    asc) — an integer-ordered TF-IDF surrogate ("most frequent rarest
    term", the keyword-extraction op of a curation pipeline) kept
    bit-exact by never forming a float idf.

    Plan shape at 100 TB: tf is computed ENTIRELY inside map_batches (a
    doc never spans rows, so the (doc_id, token) count is row-local —
    zero shuffle); df pre-aggregates one row per distinct token per
    block, then one partition-kernel merge over ~vocab-size rows (vocab
    cardinality scales with the corpus, so the native per-distinct-key
    aggregate is the measured 58x cliff — commit 4fb6a54); one hash
    join tf x df on token; grouped_top_k's combiner then bounds the
    final doc_id shuffle to <=3 rows per doc per block. The text column
    never leaves the tokenize stage."""
    from consult_ray.pipelines.operators import grouped_top_k
    from consult_ray.util import grouped

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_batch(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern(batch["text"], pattern=" ")
        n = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        flat = pa.table({
            "doc_id": pa.array(np.repeat(ids, n.astype(np.int64))),
            "token": pc.list_flatten(split),
            "one": pa.array(np.ones(int(n.sum()), np.int64)),
        })
        return grouped(flat, ["doc_id", "token"], [("one", "sum")], ["tf"])

    tf_ds = docs.map_batches(tf_batch, batch_format="pyarrow")

    def df_partial(batch: pa.Table) -> pa.Table:
        # tf rows are globally unique per (doc, token) — each doc lives
        # in exactly one input row — so per-block distinct-doc counts
        # sum to the true document frequency.
        t = batch.append_column(
            "one", pa.array(np.ones(batch.num_rows, np.int64))
        )
        return grouped(t.select(["token", "one"]), ["token"],
                       [("one", "sum")], ["df"])

    from consult_ray.util import partitioned_group_agg

    df_ds = partitioned_group_agg(
        tf_ds.map_batches(df_partial, batch_format="pyarrow"),
        "token", [("df", "sum", "df")], resolve_join_partitions(CFG),
    )
    # aggregate outputs can carry empty blocks for key-less partitions,
    # which crash Acero inside Dataset.join at high partition counts
    # (CORRECTNESS_r03's one red row) — pin the schema before the join
    from consult_ray.util import pin_schema

    df_ds = pin_schema(
        df_ds, pa.schema([("token", pa.string()), ("df", pa.int64())])
    )
    joined = tf_ds.join(
        df_ds, "inner", resolve_join_partitions(CFG), on=("token",)
    )
    return grouped_top_k(
        joined, "doc_id",
        [("tf", True), ("df", False), ("token", False)], k=3,
    )


EXTRA_QUERIES = {
    "heavy_hitter_words": q_heavy_hitter_words,
    "doc_top_terms": q_doc_top_terms,
    "export_survivors": q_export_survivors,
    "top_docs_by_chars": q_top_docs_by_chars,
    "source_top_docs": q_source_top_docs,
    "orders_by_month": q_orders_by_month,
    "deterministic_sample": q_deterministic_sample,
    "nation_order_value": q_nation_order_value,
    "region_revenue": q_region_revenue,
    "minimizers": q_minimizers,
    "union_langs": q_union_langs,
    "sessionized_events": q_sessionized_events,
    "distinct_users_daily": q_distinct_users_daily,
    "top_users_by_value": q_top_users_by_value,
    "events_asof_order": q_events_asof_order,
    "events_range_1h": q_events_range_1h,
    "events_sliding_3h": q_events_sliding_3h,
    "ngram_jaccard_doc0": q_ngram_jaccard_doc0,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "embedding_clusters": q_embedding_clusters,
    "token_stats_bpe": q_token_stats_bpe,
    "top_words": q_top_words,
    "approx_distinct_users_daily": q_approx_distinct_users_daily,
    "hll_registers_daily": q_hll_registers_daily,
    "pages_latest_crawl": q_pages_latest_crawl,
    "line_dedup_stats": q_line_dedup_stats,
    "doc_repetition_stats": q_doc_repetition_stats,
    "domain_stats": q_domain_stats,
    "gopher_filter": q_gopher_filter,
    "stratified_sample": q_stratified_sample,
    "length_quantiles": q_length_quantiles,
    "approx_length_quantiles": q_approx_length_quantiles,
    "crawl_changed": q_crawl_changed,
}

EXTRA_ORACLE_SQL = {
    "hll_registers_daily": _hll_registers_sql(),
    "export_survivors": (
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents "
        "WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text) "
        "GROUP BY lang"
    ),
    "heavy_hitter_words": (
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS word "
        "FROM documents) "
        "SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY word "
        "HAVING 100 * count(*) >= (SELECT count(*) FROM w)"
    ),
    "top_docs_by_chars": (
        "SELECT doc_id, n_chars FROM documents "
        "ORDER BY n_chars DESC, doc_id LIMIT 20"
    ),
    "doc_top_terms": (
        "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token "
        "FROM documents), "
        "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, token), "
        "df AS (SELECT token, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY token) "
        "SELECT doc_id, token, tf, df, rank FROM ("
        "SELECT tf.doc_id, tf.token, tf.tf, df.df, row_number() OVER ("
        "PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df, tf.token) AS rank "
        "FROM tf JOIN df USING (token)) WHERE rank <= 3"
    ),
    "source_top_docs": (
        "SELECT source, doc_id, n_chars, rank FROM ("
        "SELECT source, doc_id, n_chars, row_number() OVER ("
        "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank "
        "FROM documents) WHERE rank <= 3"
    ),
    "orders_by_month": (
        "SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n "
        "FROM orders GROUP BY 1"
    ),
    "deterministic_sample": (
        "SELECT doc_id, lang FROM documents WHERE doc_id % 10 = 0"
    ),
    "sessionized_events": (
        "SELECT user_id, count(*) AS n_sessions FROM ("
        "SELECT user_id, CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE "
        "OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ") WHERE new_sess = 1 GROUP BY user_id"
    ),
    "distinct_users_daily": (
        "SELECT date_trunc('day', ts) AS day, "
        "count(DISTINCT user_id) AS n_users FROM events GROUP BY 1"
    ),
    "top_users_by_value": (
        # outer CAST: duckdb sum(BIGINT) -> HUGEINT -> pandas float,
        # which hash-mismatches the engine's int64
        "SELECT user_id, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents "
        "FROM events GROUP BY user_id "
        "ORDER BY total_cents DESC, user_id LIMIT 20"
    ),
    "events_asof_order": (
        "SELECT e.event_id, o.o_orderdate AS asof_date "
        "FROM events e ASOF JOIN orders o "
        "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
    ),
    "events_range_1h": (
        "SELECT e.event_id, CAST(count(o.user_id) AS BIGINT) AS n_window "
        "FROM events e LEFT JOIN events o ON e.user_id = o.user_id "
        "AND o.ts BETWEEN e.ts - INTERVAL 1 HOUR "
        "AND e.ts + INTERVAL 1 HOUR GROUP BY e.event_id"
    ),
    "events_sliding_3h": (
        "SELECT event_type, hour, n, CAST(sum(n) OVER ("
        "PARTITION BY event_type ORDER BY hour "
        "RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW"
        ") AS BIGINT) AS n_3h FROM ("
        "SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n "
        "FROM events GROUP BY 1, 2)"
    ),
    "ngram_jaccard_doc0": (
        "WITH nums AS (SELECT CAST(range AS INT) AS i FROM range(1, 65537)), "
        "grams AS (SELECT DISTINCT d.doc_id, substring(d.text, n.i, 3) AS g "
        "FROM documents d JOIN nums n ON n.i <= length(d.text) - 2), "
        "g0 AS (SELECT g FROM grams WHERE doc_id = 0), "
        "cnts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT g2.doc_id, count(*) AS i_cnt FROM grams g2 "
        "JOIN g0 ON g2.g = g0.g GROUP BY g2.doc_id) "
        "SELECT d.doc_id, CAST(round(10000.0 * COALESCE(i.i_cnt, 0) / "
        "(COALESCE(c.n, 0) + (SELECT count(*) FROM g0) - COALESCE(i.i_cnt, 0))"
        ") AS BIGINT) AS jaccard_e4 "
        "FROM documents d "
        "LEFT JOIN cnts c ON d.doc_id = c.doc_id "
        "LEFT JOIN inter i ON d.doc_id = i.doc_id"
    ),
    "embedding_dup_pairs": (
        "SELECT a.vec_id AS a, b.vec_id AS b, "
        "CAST(round(10000 * list_cosine_similarity("
        "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))) AS BIGINT) AS cos_e4 "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.35"
    ),
    "token_stats_bpe": (
        "SELECT doc_id, CAST(len(regexp_extract_all(text, "
        "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT) AS n_bpe_tokens "
        "FROM documents"
    ),
    "top_words": (
        "SELECT w AS word, count(*) AS n FROM ("
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
        ") GROUP BY w ORDER BY n DESC, w LIMIT 50"
    ),
    "embedding_clusters": (
        # transitive closure by recursive CTE: reach(id, anc) enumerates
        # every node reachable from id through the cosine>=0.35 graph;
        # the component label is the min reachable id (incl. itself)
        "WITH RECURSIVE pairs AS ("
        "  SELECT a.vec_id AS a, b.vec_id AS b"
        "  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id"
        "  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) >= 0.35"
        "), edges AS ("
        "  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs"
        "), reach(id, anc) AS ("
        "  SELECT vec_id, vec_id FROM embeddings"
        "  UNION"
        "  SELECT r.id, e.b FROM reach r JOIN edges e ON e.a = r.anc"
        ") "
        "SELECT id AS vec_id, CAST(min(anc) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY id"
    ),
    "nation_order_value": (
        "SELECT n.n_name, "
        "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS total_cents, count(*) AS n_orders "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
    ),
    # region_revenue: cents are rounded to int64 per lineitem ROW before
    # any sum (associative; bit-exact vs the Arrow kernel's identical
    # (ext * (1-disc)) * 100 op order + half-away rounding)
    "region_revenue": (
        "SELECT r.r_name, n.n_name, "
        "CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "AND c.c_nationkey = s.s_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY r.r_name, n.n_name"
    ),
    "union_langs": (
        "SELECT lang, count(*) AS n FROM ("
        "SELECT lang FROM documents UNION ALL "
        "SELECT lang FROM documents WHERE lang <> 'en') GROUP BY lang"
    ),
    # minimizers: a numbers-table join (lateral generate_series over a
    # column is unsupported); 65536 bounds the doc length in testdata
    "minimizers": (
        "SELECT d.doc_id, CASE WHEN length(d.text) <= 16 THEN min(d.text) "
        "ELSE min(substring(d.text, n.i, 16)) END AS minimizer "
        "FROM documents d "
        "LEFT JOIN (SELECT CAST(range AS INT) AS i FROM range(1, 65537)) n "
        "ON n.i <= length(d.text) - 15 "
        "GROUP BY d.doc_id, length(d.text)"
    ),
    # two deterministic crawl snapshots of the pages table (every
    # doc_id%3==0 page recrawled 30 days later); epoch-us BIGINT
    # timestamps match q_pages_latest_crawl's _PAGES_EPOCH_US math
    "pages_latest_crawl": (
        "WITH pages AS ("
        f"SELECT {_URL_SQL} "
        f"AS url, {_PAGES_EPOCH_US} + doc_id * 1000000 AS ts_us "
        "FROM documents "
        "UNION ALL "
        f"SELECT {_URL_SQL}, "
        f"{_PAGES_EPOCH_US} + {_RECRAWL_DELTA_US} + doc_id * 1000000 "
        "FROM documents WHERE doc_id % 3 = 0) "
        "SELECT url, CAST(max(ts_us) AS BIGINT) AS latest_ts_us, "
        "CAST(count(*) AS BIGINT) AS n_crawls FROM pages GROUP BY url"
    ),
    # derived line structure (stages/lines.py): header boilerplate,
    # 10-word body chunks via list_slice on a numbers table, footer;
    # winner per distinct line = min (doc_id<<20 | line_no) composite
    "line_dedup_stats": (
        "WITH docs AS ("
        "SELECT doc_id, source, string_split(text, ' ') AS ws, "
        "CAST(ceil(len(string_split(text, ' ')) / 10.0) AS BIGINT) AS m "
        "FROM documents), "
        "nums AS (SELECT CAST(range AS BIGINT) AS k FROM range(0, 65536)), "
        "body AS ("
        "SELECT d.doc_id, 1 + n.k AS line_no, "
        "array_to_string(list_slice(d.ws, 10 * n.k + 1, 10 * n.k + 10), ' ') "
        "AS line FROM docs d JOIN nums n ON n.k < d.m), "
        "lines AS ("
        "SELECT doc_id, CAST(0 AS BIGINT) AS line_no, "
        "'cookie notice from ' || source AS line FROM docs "
        "UNION ALL SELECT doc_id, line_no, line FROM body "
        "UNION ALL SELECT doc_id, m + 1, "
        "'copyright ' || source || ' all rights reserved' FROM docs), "
        "winners AS ("
        "SELECT line, min(doc_id * 1048576 + line_no) AS pack "
        "FROM lines GROUP BY line), "
        "kept AS (SELECT pack // 1048576 AS doc_id, count(*) AS n_kept "
        "FROM winners GROUP BY 1), "
        "totals AS (SELECT doc_id, count(*) AS n_lines FROM lines "
        "GROUP BY doc_id) "
        "SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines, "
        "CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept "
        "FROM totals t LEFT JOIN kept k ON t.doc_id = k.doc_id"
    ),
    # per-doc word census; top word ties break by ascending word
    # (binary collation both engines)
    "doc_repetition_stats": (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
        "FROM documents), "
        "cnt AS (SELECT doc_id, word, count(*) AS c FROM w "
        "GROUP BY doc_id, word), "
        "top AS (SELECT doc_id, word AS top_word, "
        "CAST(c AS BIGINT) AS top_word_count, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, word) AS rn "
        "FROM cnt), "
        "nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_words "
        "FROM cnt GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words, "
        "nd.n_distinct_words, t.top_word, t.top_word_count "
        "FROM documents d "
        "JOIN nd ON d.doc_id = nd.doc_id "
        "JOIN top t ON d.doc_id = t.doc_id AND t.rn = 1"
    ),
    # strlen = BYTES (matches Arrow binary_length); length() would be
    # codepoints and diverge on the non-ascii langs
    "domain_stats": (
        "SELECT split_part(" + _URL_SQL + ", '/', 3) AS domain, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(strlen(text)) AS BIGINT) AS total_bytes, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs "
        "FROM documents GROUP BY 1"
    ),
    "gopher_filter": (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word "
        "FROM documents), "
        "cnt AS (SELECT doc_id, word, count(*) AS c FROM w "
        "GROUP BY doc_id, word), "
        "s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, "
        "CAST(count(*) AS BIGINT) AS n_distinct_words, "
        "CAST(max(c) AS BIGINT) AS top_word_count FROM cnt GROUP BY doc_id) "
        "SELECT doc_id, n_words, n_distinct_words, top_word_count FROM s "
        "WHERE n_words >= 30 AND top_word_count * 5 <= n_words "
        "AND n_distinct_words * 2 >= n_words"
    ),
    "stratified_sample": (
        "SELECT doc_id, lang, source FROM documents "
        "QUALIFY row_number() OVER ("
        "PARTITION BY lang, source ORDER BY doc_id) <= 3"
    ),
    # inverse-CDF quantiles: smallest v with count(x<=v) >= ceil(q*n),
    # exactly the definition q_length_quantiles implements
    "length_quantiles": (
        "WITH c AS (SELECT lang, n_chars, count(*) AS cnt FROM documents "
        "GROUP BY 1, 2), "
        "cum AS (SELECT lang, n_chars, "
        "sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cm, "
        "sum(cnt) OVER (PARTITION BY lang) AS n FROM c) "
        "SELECT lang, "
        "CAST(min(CASE WHEN cm >= ceil(0.25 * n) THEN n_chars END) AS BIGINT)"
        " AS p25, "
        "CAST(min(CASE WHEN cm >= ceil(0.50 * n) THEN n_chars END) AS BIGINT)"
        " AS p50, "
        "CAST(min(CASE WHEN cm >= ceil(0.75 * n) THEN n_chars END) AS BIGINT)"
        " AS p75, "
        "CAST(min(CASE WHEN cm >= ceil(0.95 * n) THEN n_chars END) AS BIGINT)"
        " AS p95 "
        "FROM cum GROUP BY lang"
    ),
    # oracle compares TEXT; the engine compares 64-bit content hashes
    # (equal whenever the hash is collision-free on the corpus — the
    # exact_dedup contract)
    "crawl_changed": (
        "WITH snap AS ("
        "SELECT doc_id, source, text FROM documents "
        "UNION ALL "
        "SELECT doc_id, source, CASE WHEN doc_id % 6 = 0 "
        "THEN text || ' updated!' ELSE text END "
        "FROM documents WHERE doc_id % 3 = 0) "
        "SELECT url, changed FROM ("
        "SELECT " + _URL_SQL + " "
        "AS url, count(*) AS c, min(text) <> max(text) AS changed "
        "FROM snap GROUP BY 1) WHERE c = 2"
    ),
}
