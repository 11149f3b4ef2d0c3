"""DuckDB SQL twins of the flagship fingerprint -> LSH -> dedup path.

These oracles replay the ENTIRE near-dup pipeline relationally — rolling
32-byte shingle hashes, SplitMix64 finalizer, OPH MinHash with rotation
densification, SimHash bit majorities, both band-key families, the O4
bucket cap and the hamming-verified pair expansion, through connected
components — in DuckDB HUGEINT arithmetic, bit-exact against the numpy
kernels. They are an independent derivation from the same published
constants (Vigna SplitMix64; Li/Owen/Zhang OPH; the config's pinned
band positions embedded as literals the way the reference's
map_fixed_pos variant pins its sampled bits,
/root/reference/map_fixed_pos/main_map_fixed_pos.cpp:423-424), not a
transcription of the engine code path, so a bug in either side surfaces
as a driver hash mismatch.

Replay techniques (shared with queries._content_hash_sql and the
shuffle_shards oracle):
  * 64x64-bit products split at 2^32 so they cannot overflow HUGEINT;
  * bytes come from hex(encode(text)) nibble pairs (multi-byte UTF-8
    exact);
  * the prefix-sum window formulation of functions.hashing
    .rolling_shingle_hashes is mirrored with window functions: with
    S(i) = sum_{m<=i} byte_m * BASE^{-(m-1)} (exact HUGEINT — terms are
    < 2^72 and docs are < 2^20 bytes at oracle scale, so the raw sum
    stays < 2^92 and mod-2^64 is taken only at the window), the window
    hash at 1-based start p is BASE^{p+k-2} * (S(p+k-1) - S(p-1));
  * OPH densification's distance-doubling rotation is 8 unrolled CTE
    rounds (shift = 1..128), each reading the PREVIOUS round's full
    grid snapshot exactly like np.roll;
  * chained splitmix folds (minhash band keys) use list_reduce;
  * every reused CTE is MATERIALIZED — DuckDB inlines CTEs by default
    and each densification round references its predecessor twice, so
    inlining would duplicate the whole upstream chain 2^8 times.

Caveats (hold for the synthetic corpus the driver runs on): the engine
canonicalizes with pyarrow utf8_normalize(NFKD) + utf8_lower +
\\s+ collapse + unicode trim; the SQL twin uses lower() + the same RE2
collapse + trim(' '), which is identical on ASCII text (NFKD and
unicode-trim are identities there). Integer-only arithmetic throughout
— no float traps.
"""

from __future__ import annotations

import numpy as np

from consult_ray.config import PipelineConfig
from consult_ray.functions.hashing import (
    ROLL_BASE,
    ROLL_BASE_INV,
    _SM_GAMMA,
    _SM_M1,
    _SM_M2,
    splitmix64,
)

M64, M32 = 1 << 64, 1 << 32
_OPH_DIV = 1 << 24  # value = h >> (64 - 40) == h // 2^24
_EMPTY = M64 - 1  # functions.fingerprint._OPH_EMPTY


def _mulmod(e: str, c: int) -> str:
    """(e * c) mod 2^64 for an expression e in [0, 2^64) and a Python
    int constant c in [0, 2^64) — the product is split at 2^32 so no
    intermediate exceeds HUGEINT."""
    return (
        f"(((({e}) % {M32}) * {c} + "
        f"((((({e}) // {M32}) * {c}) % {M32}) * {M32}) ) % {M64})"
    )


def _mulmod_vv(a: str, b: str) -> str:
    """(a * b) mod 2^64 for two expressions both in [0, 2^64)."""
    return (
        f"(((({a}) % {M32}) * ({b}) + "
        f"((((({a}) // {M32}) * ({b})) % {M32}) * {M32}) ) % {M64})"
    )


def _sm64(y: str) -> str:
    """SplitMix64 finalizer of an expression in [0, 2^64) — the exact
    twin of functions.hashing.splitmix64 (verified on boundary values
    0, 1, 2^63, 2^64-1)."""
    s0 = f"((({y}) + {int(_SM_GAMMA)}) % {M64})"
    s1 = _mulmod(f"xor({s0}, ({s0}) >> 30)", int(_SM_M1))
    s2 = _mulmod(f"xor({s1}, ({s1}) >> 27)", int(_SM_M2))
    return f"xor({s2}, ({s2}) >> 31)"


def _signed64(e: str) -> str:
    """[0, 2^64) expression -> its int64 bit pattern as BIGINT."""
    return (
        f"CAST(CASE WHEN ({e}) >= {1 << 63} THEN ({e}) - {M64} "
        f"ELSE ({e}) END AS BIGINT)"
    )


_NIB1 = "(strpos('0123456789ABCDEF', substr(hx, 2*u-1, 1)) - 1)"
_NIB2 = "(strpos('0123456789ABCDEF', substr(hx, 2*u, 1)) - 1)"


def _sh_cte(k: int, src: str = "documents") -> str:
    """WITH-clause prefix computing sh(doc_id, h): every k-byte rolling
    shingle hash of the canonicalized text (docs shorter than k fall
    back to one whole-doc hash seeded with k, empty docs included) —
    the twin of functions.hashing.rolling_shingle_hashes over
    functions.textnorm.canonicalize_column. src: any relation with
    (doc_id, text) columns."""
    return f"""
WITH RECURSIVE
canon AS (
  SELECT doc_id, trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'), ' ') AS t
  FROM {src}
),
meta AS MATERIALIZED (
  SELECT doc_id, octet_length(encode(t)) AS n, upper(hex(encode(t))) AS hx FROM canon
),
pw(i, p, ip) AS (
  SELECT 0, CAST(1 AS HUGEINT), CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i+1, {_mulmod('p', int(ROLL_BASE))}, {_mulmod('ip', int(ROLL_BASE_INV))}
  FROM pw WHERE i < (SELECT COALESCE(max(n), 0) + {k} FROM meta)
),
pos AS MATERIALIZED (
  SELECT doc_id, n, unnest(range(1, n+1)) AS i,
         unnest(list_transform(range(1, n+1),
           u -> CAST(16*{_NIB1} + {_NIB2} AS HUGEINT))) AS byte
  FROM meta
),
wt AS (
  SELECT p.doc_id, p.n, p.i,
         SUM(p.byte * w.ip) OVER (PARTITION BY p.doc_id ORDER BY p.i) AS S
  FROM pos p JOIN pw w ON w.i = p.i - 1
),
s2w AS (
  SELECT doc_id, n, i,
         lead(S, {k - 1}) OVER (PARTITION BY doc_id ORDER BY i) AS S_hi,
         COALESCE(lag(S, 1) OVER (PARTITION BY doc_id ORDER BY i), 0) AS S_lo
  FROM wt WHERE n >= {k}
),
winh AS (
  SELECT s2w.doc_id, {_sm64(_mulmod_vv('w.p', f'((S_hi - S_lo) % {M64})'))} AS h
  FROM s2w JOIN pw w ON w.i = s2w.i + {k} - 2
  WHERE s2w.i <= s2w.n - {k} + 1
),
shorth AS (
  SELECT m.doc_id,
         {_sm64(f'((({k} + m.n) * wn.p + COALESCE(q.poly, 0)) % {M64})')} AS h
  FROM meta m
  LEFT JOIN (
    SELECT p.doc_id, SUM(p.byte * w.p) AS poly
    FROM pos p JOIN pw w ON w.i = p.n - p.i GROUP BY p.doc_id
  ) q USING (doc_id)
  JOIN pw wn ON wn.i = m.n
  WHERE m.n < {k}
),
sh AS MATERIALIZED (
  SELECT doc_id, h FROM winh UNION ALL SELECT doc_id, h FROM shorth
)"""


def _fp_cte() -> str:
    """fp(doc_id, n_shingles, sim): SimHash as 64 per-bit majority
    aggregates over sh (functions.fingerprint.simhash_signatures: bit j
    set iff 2*count_j >= n_shingles)."""
    bits = " + ".join(
        f"(CASE WHEN 2*SUM(CAST((h // {1 << j}) % 2 AS HUGEINT)) >= COUNT(*) "
        f"THEN CAST({1 << j} AS HUGEINT) ELSE 0 END)"
        for j in range(64)
    )
    return f""",
fp AS MATERIALIZED (
  SELECT doc_id, COUNT(*) AS n_shingles, ({bits}) AS sim
  FROM sh GROUP BY doc_id
)"""


def _sb_cte(cfg: PipelineConfig) -> str:
    """sb: the L bit-sampled SimHash band rows. Band l gathers the K
    pinned bit positions (embedded as literals) into a K-bit integer,
    xors the precomputed splitmix64(l + 0x5B00) band constant and
    finalizes (functions.fingerprint.simhash_band_keys)."""
    parts = []
    for l in range(cfg.simhash_bands):
        pos = cfg.band_positions[l]
        raw = " + ".join(
            f"((sim // {1 << int(p)}) % 2) * {1 << i}" for i, p in enumerate(pos)
        )
        c = int(splitmix64(np.uint64(l + 0x5B00))[()])
        key = _sm64(f"xor(CAST(({raw}) AS HUGEINT), CAST({c} AS HUGEINT))")
        parts.append(
            f"SELECT doc_id, sim, {l} AS band, {key} AS band_key FROM fp"
        )
    return f""",
sb AS MATERIALIZED ({' UNION ALL '.join(parts)})"""


def _grid_ctes(cfg: PipelineConfig) -> tuple[str, str]:
    """OPH MinHash grid: minima of h>>24 per (doc, bin = h % P), empty
    bins = 2^64-1, then the rotation-densification rounds (shift
    doubling 1..P; fill = splitmix64(donor ^ (0xD00D + shift)), donor
    read from the previous round's snapshot at (bin + shift) % P —
    functions.fingerprint.minhash_signatures). Returns (sql, last_cte)."""
    P = cfg.num_perm
    rounds = []
    prev, shift, i = "g0", 1, 0
    while shift < 2 * P:
        fill = _sm64(f"xor(d.v, CAST({0xD00D + shift} AS HUGEINT))")
        cur = f"g{i + 1}"
        rounds.append(
            f"{cur} AS MATERIALIZED (SELECT g.doc_id, g.bin, "
            f"CASE WHEN g.v = {_EMPTY} AND d.v != {_EMPTY} THEN {fill} ELSE g.v END AS v "
            f"FROM {prev} g JOIN {prev} d "
            f"ON d.doc_id = g.doc_id AND d.bin = (g.bin + {shift}) % {P})"
        )
        prev, shift, i = cur, shift * 2, i + 1
    sql = f""",
mins AS MATERIALIZED (
  SELECT doc_id, CAST(h % {P} AS BIGINT) AS bin, MIN(h // {_OPH_DIV}) AS v
  FROM sh GROUP BY 1, 2
),
g0 AS MATERIALIZED (
  SELECT f.doc_id, b.bin, COALESCE(m.v, CAST('{_EMPTY}' AS HUGEINT)) AS v
  FROM fp f CROSS JOIN (SELECT unnest(range({P})) AS bin) b
  LEFT JOIN mins m ON m.doc_id = f.doc_id AND m.bin = b.bin
),
{','.join(rounds)}"""
    return sql, prev


def _mb_cte(cfg: PipelineConfig, grid: str) -> str:
    """mb: the b banded-MinHash rows — band j folds signature rows
    [j*r, (j+1)*r) with acc = splitmix64(acc ^ v) from acc = 0, then
    mixes the precomputed splitmix64(j + 0xA11CE) band seed
    (functions.fingerprint.minhash_band_keys)."""
    bs_vals = ",".join(
        f"({j}, CAST('{int(splitmix64(np.uint64(j) + np.uint64(0xA11CE))[()])}' AS HUGEINT))"
        for j in range(cfg.minhash_bands)
    )
    return f""",
bseed(band, c) AS (SELECT * FROM (VALUES {bs_vals}) t(band, c)),
mlists AS (
  SELECT doc_id, CAST(bin // {cfg.minhash_rows} AS BIGINT) AS band,
         list(v ORDER BY bin) AS l
  FROM {grid} GROUP BY 1, 2
),
macc AS (
  SELECT doc_id, band,
         list_reduce(list_prepend(CAST(0 AS HUGEINT), l),
                     (acc, b) -> {_sm64('xor(acc, b)')}) AS acc
  FROM mlists
),
mb AS MATERIALIZED (
  SELECT m.doc_id, f.sim, m.band, {_sm64('xor(m.acc, s.c)')} AS band_key
  FROM macc m JOIN bseed s ON s.band = m.band JOIN fp f ON f.doc_id = m.doc_id
)"""


def _edges_tail(cfg: PipelineConfig, src: str) -> str:
    """capped + edges CTEs over a band-row source (doc_id, sim,
    band_key): the O4 bucket cap (keep the bucket_cap smallest doc_ids
    per band_key — pipelines.dedup._expand_bucket_pairs) then every
    intra-bucket pair a<b with popcount(simhash_a ^ simhash_b) <= p.
    One row per colliding band: the engine does NOT dedupe the edge
    multiset at c=1 (pipelines.dedup module docstring)."""
    return f""",
capped AS MATERIALIZED (
  SELECT * FROM {src}
  QUALIFY row_number() OVER (PARTITION BY band_key ORDER BY doc_id) <= {cfg.bucket_cap}
),
edges AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         bit_count(xor({_signed64('x.sim')}, {_signed64('y.sim')})) AS hamming
  FROM capped x JOIN capped y
  ON x.band_key = y.band_key AND x.doc_id < y.doc_id
)"""


_EDGE_SELECT = (
    "SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM edges "
    "WHERE hamming <= {p}"
)

_CLOSURE = """,
dedges AS MATERIALIZED (
  SELECT DISTINCT a, b FROM edges WHERE hamming <= {p}
),
sym AS (SELECT a, b FROM dedges UNION ALL SELECT b AS a, a AS b FROM dedges),
reach(id, anc) AS (
  SELECT doc_id, doc_id FROM {src}
  UNION
  SELECT r.id, e.b FROM reach r JOIN sym e ON e.a = r.anc
),
clusters AS (
  SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS cluster_id
  FROM reach GROUP BY id
)"""


def _string_hash_expr(col: str, seed: int) -> str:
    """Whole-string rolling hash of a VARCHAR column, the twin of
    functions.hashing.hash_bytes_u64 / stages.ids.hash_keys before its
    >> 1: fold acc = acc*BASE + byte from acc = seed + byte_length,
    then the SplitMix64 finalizer (same shape as
    queries._content_hash_sql, parameterized by seed and column)."""
    hexs = f"upper(hex(encode({col})))"
    nib1 = f"(strpos('0123456789ABCDEF', substr({hexs}, 2*u-1, 1)) - 1)"
    nib2 = f"(strpos('0123456789ABCDEF', substr({hexs}, 2*u, 1)) - 1)"
    byte_list = (
        f"list_transform(range(1, octet_length(encode({col}))+1), "
        f"u -> CAST(16*{nib1} + {nib2} AS HUGEINT))"
    )
    init = f"((CAST({seed} AS HUGEINT) + octet_length(encode({col}))) % {M64})"
    step = f"({_mulmod('acc', int(ROLL_BASE))} + b) % {M64}"
    return _sm64(f"list_reduce(list_prepend({init}, {byte_list}), (acc, b) -> {step})")


# the input_hint url derivation (pipelines.pagesview.PAGES_URL_SQL) and
# the deterministic url -> int64 id (stages.ids.hash_keys: whole-string
# hash >> 1, nonneg so the int64 bit pattern equals the value)
_URL_SQL = "'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR)"


def _lookup_tail(cfg: PipelineConfig) -> str:
    """The CONSULT search-workload twin (state.lookup.classify_queries /
    state.library.classify_queries_partitioned, which are
    pytest-asserted output-equal): corpus = doc_id < n//2 band buckets
    capped at bucket_cap smallest doc_ids; each query band row is one
    PROBE; a probe matches iff any capped bucket member has hd <= p;
    match_count counts matching probes (the A4 counter,
    /root/reference/main_search.cpp:766,868,996), match_doc is the min
    matching member over all probes, matched = match_count >= c."""
    cap, p, c = cfg.bucket_cap, cfg.hamming_budget, cfg.collision_threshold
    return f""",
allk AS (
  SELECT doc_id, sim, 0 AS kind, band, band_key FROM sb
  UNION ALL SELECT doc_id, sim, 1 AS kind, band, band_key FROM mb
),
half AS (SELECT COUNT(*) // 2 AS h FROM documents),
cb AS MATERIALIZED (
  SELECT doc_id, sim, band_key FROM allk, half WHERE doc_id < h
  QUALIFY row_number() OVER (PARTITION BY band_key ORDER BY doc_id) <= {cap}
),
qb AS (SELECT doc_id, sim, kind, band, band_key FROM allk, half WHERE doc_id >= h),
hits AS (
  SELECT q.doc_id, q.kind, q.band, MIN(c2.doc_id) AS mdoc
  FROM qb q JOIN cb c2 ON c2.band_key = q.band_key AND c2.doc_id <> q.doc_id
  WHERE bit_count(xor({_signed64('q.sim')}, {_signed64('c2.sim')})) <= {p}
  GROUP BY 1, 2, 3
),
agg AS (SELECT doc_id, COUNT(*) AS mc, MIN(mdoc) AS md FROM hits GROUP BY doc_id)
SELECT d.doc_id,
       (COALESCE(a.mc, 0) >= {c}) AS matched,
       CAST(COALESCE(a.mc, 0) AS BIGINT) AS match_count,
       CAST(COALESCE(a.md, -1) AS BIGINT) AS match_doc
FROM (SELECT doc_id FROM documents, half WHERE doc_id >= h) d
LEFT JOIN agg a USING (doc_id)"""


# within-cluster suffix-array containment (stages.substring
# ._drop_contained): doc i drops iff some same-cluster j contains it
# and (texts differ, or i > j for exact equals). Character position()
# == byte containment on this corpus (same caveat as the
# substring_pairs oracle). Assumes no cluster exceeds
# GROUP_TEXT_BUDGET (true at oracle scale).
_MEMB_DROPS = """,
memb AS MATERIALIZED (
  SELECT c.cluster_id, d.doc_id, d.text
  FROM clusters c JOIN documents d USING (doc_id)
),
drops AS (
  SELECT i.doc_id
  FROM memb i JOIN memb j
  ON i.cluster_id = j.cluster_id AND i.doc_id <> j.doc_id
  WHERE position(i.text IN j.text) > 0
    AND (i.text <> j.text OR i.doc_id > j.doc_id)
  GROUP BY i.doc_id
)"""


def flagship_oracle_sql(cfg: PipelineConfig) -> dict[str, str]:
    """The flagship oracles, keyed by registry name."""
    k, p = cfg.shingle_k, cfg.hamming_budget
    sh = _sh_cte(k)
    fp = _fp_cte()
    sb = _sb_cte(cfg)
    grid, last = _grid_ctes(cfg)
    mb = _mb_cte(cfg, last)
    allb = """,
allb AS (
  SELECT doc_id, sim, band_key FROM sb
  UNION ALL SELECT doc_id, sim, band_key FROM mb
)"""
    sb_src = "(SELECT doc_id, sim, band_key FROM sb) t"
    mb_src = "(SELECT doc_id, sim, band_key FROM mb) t"
    edge_sel = _EDGE_SELECT.format(p=p)
    closure = _CLOSURE.format(p=p, src="documents")

    sim_chain = sh + fp + sb
    mh_chain = sh + fp + grid + mb
    all_chain = sh + fp + sb + grid + mb + allb

    # url-keyed variant: same engine over (hash(url) >> 1, text); the
    # pages variant extracts text from html first, but the extraction is
    # byte-identity-pinned (extract_text(html) == text, itself
    # SQL-checked by pages_extract_text), so both share this oracle.
    from consult_ray.stages.ids import DEFAULT_ID_SEED

    uhash = _string_hash_expr("url", DEFAULT_ID_SEED)
    usrc = (
        f"(SELECT CAST(({uhash}) // 2 AS BIGINT) AS doc_id, url, text "
        f"FROM (SELECT {_URL_SQL} AS url, text FROM documents) u0) u1"
    )
    url_chain = (
        _sh_cte(k, src=usrc) + fp + sb + grid + mb + allb
        + _edges_tail(cfg, "allb") + _CLOSURE.format(p=p, src=usrc)
    )
    url_clusters = url_chain + f"""
SELECT s.url AS url, r.url AS cluster_url
FROM clusters c
JOIN {usrc.replace(' u1', ' s')} ON s.doc_id = c.doc_id
JOIN {usrc.replace(' u1', ' r')} ON r.doc_id = c.cluster_id"""

    lookup_sql = sim_chain + grid + mb + _lookup_tail(cfg)

    return {
        # the three lookup variants are pytest-asserted output-equal
        # (library partitioned probe == broadcast CSR == Bloom-filtered)
        # so they share one oracle
        "lookup_classify": lookup_sql,
        "lookup_classify_lib": lookup_sql,
        "lookup_classify_bloom": lookup_sql,
        "dedup_clusters_url": url_clusters,
        "dedup_clusters_pages": url_clusters,
        "fingerprints": sh + fp + f"""
SELECT doc_id, {_signed64('sim')} AS simhash, CAST(n_shingles AS BIGINT) AS n_shingles
FROM fp""",
        # hot_policy="salt" + collision_threshold=2 (q_dedup_edges_salted):
        # salting is LOSSLESS — every band collision of a pair lands in
        # >= 1 triangle bucket of the same (band_kind, band), and
        # pair_count_threshold collapses replicas on that tuple before
        # counting — so the salted c=2 edge set equals the UNCAPPED
        # distinct-band-collision count with no salt replay needed: pairs
        # sharing >= 2 distinct band keys with hd <= p. (hamming is a
        # pair property — popcount(sim_a ^ sim_b) — hence MIN = the
        # value; distinct band_key == distinct (band_kind, band) for a
        # pair up to the usual 2^-64 band-key collision contract.)
        "dedup_edges_salted": all_chain + f""",
sedges AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.band_key,
         bit_count(xor({_signed64('x.sim')}, {_signed64('y.sim')})) AS hamming
  FROM allb x JOIN allb y ON x.band_key = y.band_key AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(MIN(hamming) AS BIGINT) AS hamming
FROM sedges WHERE hamming <= {p}
GROUP BY a, b HAVING COUNT(DISTINCT band_key) >= 2""",
        "simhash_edges": sim_chain + _edges_tail(cfg, sb_src) + "\n" + edge_sel,
        "minhash_edges": mh_chain + _edges_tail(cfg, mb_src) + "\n" + edge_sel,
        "dedup_edges": all_chain + _edges_tail(cfg, "allb") + "\n" + edge_sel,
        "band_occupancy_hist": all_chain + """
SELECT CAST(cnt AS BIGINT) AS occupancy, COUNT(*) AS n_buckets
FROM (SELECT band_key, COUNT(*) AS cnt FROM allb GROUP BY band_key)
GROUP BY cnt""",
        "dedup_clusters": all_chain + _edges_tail(cfg, "allb") + closure + """
SELECT doc_id, cluster_id FROM clusters""",
        # the containment-drop fragment is shared with dedup_tiers
        # below; see _MEMB_DROPS for the drop-rule notes
        "substring_dedup": all_chain + _edges_tail(cfg, "allb") + closure
        + _MEMB_DROPS + """
SELECT m.doc_id, m.cluster_id, (dr.doc_id IS NOT NULL) AS substring_dropped
FROM memb m LEFT JOIN drops dr USING (doc_id)""",
        # tiered attribution (pipelines.dedup.dedup_tiers): exact =
        # non-min of an identical-text group; substring = containment
        # drop; near = survives both but is not the cluster's survivor
        # (min non-dropped member, checkpointed build_survivors rule).
        # Precedence exact > substring > near mirrors np.select order.
        # The engine keys the exact tier on the 64-bit content_hash
        # with null text hashed as '' (dedup.py dedup_tiers), so the
        # reps partition mirrors it with COALESCE(text, '') — a corpus
        # holding BOTH null and empty texts groups them together on
        # either side; a 64-bit hash collision is the one residual
        # divergence (same ~3e-5-at-2^40-docs contract as
        # exact_dedup_groups).
        "dedup_tiers": all_chain + _edges_tail(cfg, "allb") + closure
        + _MEMB_DROPS + """,
reps AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY COALESCE(text, '')) AS rep FROM documents),
surv AS (
  SELECT m.cluster_id, MIN(m.doc_id) AS survivor
  FROM memb m LEFT JOIN drops dr USING (doc_id)
  WHERE dr.doc_id IS NULL GROUP BY m.cluster_id
)
SELECT m.doc_id, m.cluster_id,
       CASE WHEN r.rep <> m.doc_id THEN 'exact'
            WHEN dr.doc_id IS NOT NULL THEN 'substring'
            WHEN m.doc_id <> s.survivor THEN 'near'
            ELSE 'survivor' END AS tier
FROM memb m
JOIN reps r ON r.doc_id = m.doc_id
LEFT JOIN drops dr ON dr.doc_id = m.doc_id
JOIN surv s ON s.cluster_id = m.cluster_id""",
        "cluster_best_docs": all_chain + _edges_tail(cfg, "allb") + closure + """
SELECT d.doc_id, d.n_chars, c.cluster_id
FROM clusters c JOIN documents d USING (doc_id)
QUALIFY row_number() OVER (
  PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, d.doc_id ASC) = 1""",
    }
