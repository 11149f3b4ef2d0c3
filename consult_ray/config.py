"""Pipeline configuration — the analog of CONSULT's fixed hyper-parameters.

The reference fixes its signature config in code (SL=32 at
/root/reference/main_map.cpp:61, p=3 at :198, K=15 at :213, L=2 at :220,
SIGS_COLMN=7 => bucket cap 28 at :62, c=1 default at
/root/reference/main_search.cpp:110-116) and, for reproducibility, pins
the sampled bit positions in the map_fixed_pos variant
(/root/reference/map_fixed_pos/main_map_fixed_pos.cpp:423-424).  We do the
same: every random choice below is derived from a fixed seed so cluster
assignments are deterministic and retries are value-identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

U64 = np.uint64


def _sample_bit_positions(seed: int, n_bands: int, bits_per_band: int, width: int = 64) -> np.ndarray:
    """Fixed per-band bit positions sampled from a 64-bit SimHash.

    Analog of CONSULT's random K-of-32 position draw
    (/root/reference/main_map.cpp:385-416), pinned by seed the way
    map_fixed_pos pins them with constants.
    Returns (n_bands, bits_per_band) int64, descending per band (the
    reference sorts positions descending at main_map.cpp:406).
    """
    rng = np.random.default_rng(seed)
    out = np.empty((n_bands, bits_per_band), dtype=np.int64)
    for l in range(n_bands):
        pos = rng.choice(width, size=bits_per_band, replace=False)
        out[l] = np.sort(pos)[::-1]
    return out


def _minhash_coeffs(seed: int, num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed odd multipliers + offsets for multiply-shift MinHash permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) * U64(2) + U64(1)  # odd
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


@dataclass(frozen=True)
class PipelineConfig:
    # --- shingling (CONSULT SL=32 analog: 32-byte char shingles) ---
    shingle_k: int = 32

    # --- SimHash + bit-sampled LSH bands (CONSULT-faithful path) ---
    # L band families, K sampled bits each (main_map.cpp:210-220,213).
    simhash_bands: int = 2          # L
    simhash_bits_per_band: int = 15  # K
    hamming_budget: int = 3          # p (main_map.cpp:198): verify popcount(xor)<=p

    # --- MinHash LSH (the scale/recall path) ---
    num_perm: int = 128
    minhash_bands: int = 16          # b
    minhash_rows: int = 8            # r  (b*r == num_perm)
    jaccard_threshold: float = 0.8   # verify threshold for minhash-only edges

    # --- bucket / collision policy ---
    bucket_cap: int = 28             # SIGS_COLMN*partitions=28 (main_map.cpp:62)
    collision_threshold: int = 1     # c (main_search.cpp:110-116 default 1)

    # --- M5 segmentation (the N-split tokenizer analog,
    # /root/reference/main_search.cpp:770-777: split reads on ambiguous
    # bases, shingle only tokens >= SL) ---
    # When on, the RAW text splits on blank-line boundaries before
    # shingling, segments whose CANONICALIZED UTF-8 byte length is
    # under segment_min_chars (default shingle_k — same byte unit as
    # the shingle window) produce no shingles, and no shingle ever
    # spans a segment boundary. Docs whose every segment
    # drops fall back to one whole-doc shingle (so they still dedup).
    # Off by default: the flagship pipeline shingles straight through.
    segment_split: bool = False
    segment_min_chars: int | None = None

    # --- determinism ---
    seed: int = 42

    # --- execution knobs (single-node defaults; scale by cluster size) ---
    batch_size: int = 4096
    join_partitions: int = 32
    cc_max_iters: int = 50
    # Distributed-CC round strategy: when the dup-graph NODE count is at
    # or below this, label state lives on the driver as sorted int64
    # arrays (the pagerank pattern: ~16 B/node, 50M nodes = 0.8 GB) and
    # each round is ONE shuffle-free vectorized map over the static edge
    # table + a partition-kernel min merge of per-batch partials —
    # measured 42 s -> ~4 s per round at 22M directed edges / 2.6M nodes
    # on 8 CPUs vs the co-partitioned union+sort rounds, which re-shuffle
    # every edge every round. Above the limit the co-partitioned rounds
    # run (per-node state too big for any single machine). Edges stay
    # distributed in BOTH modes.
    cc_driver_node_limit: int = 50_000_000
    # Cap on concurrent tasks for the memory-bandwidth-bound compute
    # stages (fingerprint / band census / verify). None = no cap — the
    # right default when advertised CPUs are actually delivered (a real
    # cluster). On hosts that deliver fewer cores than advertised,
    # oversubscribed streaming kernels thrash the cache hierarchy:
    # measured here, the fingerprint stage at 32 concurrent tasks on
    # ~10 delivered cores burns 10x the CPU (551 vs 53 core-sec) and
    # 4x the wall time of the same stage capped at 12-16. bench.py sets
    # this from its measured delivered-parallelism probe; a cap >= the
    # session's real CPU count is a no-op by construction.
    compute_concurrency: int | None = None
    # Candidate-pair generation strategy over the band table:
    #   "group" — ONE hash-bucketed shuffle (part = band_key % P) +
    #             vectorized intra-bucket pair expansion per partition;
    #             per-task memory = band_rows/P, the same bound as the
    #             hash join's per-partition build table.
    #   "join"  — Dataset.join self-join (shuffles both sides; emits
    #             every bucket's m^2 ordered pairs incl. self-pairs
    #             before the a<b filter).
    # Same edge multiset either way (pytest-asserted); "group" measured
    # ~2x faster at 7.2M band rows.
    candidate_strategy: str = "group"
    # O3 in-probe early exit (/root/reference/main_search.cpp:866-894):
    # the lookup actor processes band probes in (kind, band) order and
    # skips a query row's remaining probes once it has reached
    # collision_threshold matches. `matched` is unchanged; match_count
    # caps at c and match_doc reflects only the probes performed (the
    # reference's exact stop-at-c semantics). Off by default so the
    # actor and partitioned-library paths stay bit-identical.
    probe_early_exit: bool = False
    # Bloom pre-filter for library classification (opt-in): a packed
    # bit array over ALL library band keys is built once (per-block OR
    # partials, cached per manifest generation), ray.put once, and each
    # probe task drops its band rows that miss it BEFORE partition
    # routing. A Bloom miss is never wrong, so dropped rows provably
    # contribute zero matches and classification output is UNCHANGED
    # (pytest-asserted); survivors still take the exact CSR path.
    # Pays when the query stream is novel-heavy (streaming ingest of
    # fresh crawl): misses skip the partition load entirely. Applicable
    # while ~6-10 bits/key fits a worker heap (<=1e10 library keys);
    # beyond that, shard the filter per key-range partition.
    probe_bloom_prefilter: bool = False
    bloom_fpp: float = 0.02

    # --- hot-key (heavy hitter) detection ---
    # "sketch": count-min sketch, two vectorized passes, no census shuffle
    #           (the scale path; estimates overcount so the candidate set
    #           is a deterministic superset — capping non-hot keys is a
    #           no-op, so semantics are exact)
    # "exact":  full band_key census groupby (the A3-faithful path)
    census_mode: str = "sketch"
    cms_width: int = 1 << 20   # cells per depth row; error ~ total_rows/width
    cms_depth: int = 3
    # hot-key policy: "cap" = keep the bucket_cap smallest doc_ids, drop
    # the rest (CONSULT-faithful, main_map.cpp:592); "salt" = salted
    # triangle repartitioning — lossless, every pair still generated,
    # no partition ever holds one key's full membership
    hot_policy: str = "cap"

    # derived, cached at first use
    _cache: dict = field(default_factory=dict, compare=False, hash=False, repr=False)

    @property
    def band_positions(self) -> np.ndarray:
        if "pos" not in self._cache:
            self._cache["pos"] = _sample_bit_positions(
                self.seed, self.simhash_bands, self.simhash_bits_per_band
            )
        return self._cache["pos"]

    @property
    def minhash_a(self) -> np.ndarray:
        if "mh" not in self._cache:
            self._cache["mh"] = _minhash_coeffs(self.seed + 1, self.num_perm)
        return self._cache["mh"][0]

    @property
    def minhash_b(self) -> np.ndarray:
        if "mh" not in self._cache:
            self._cache["mh"] = _minhash_coeffs(self.seed + 1, self.num_perm)
        return self._cache["mh"][1]

    def __post_init__(self):
        assert self.minhash_bands * self.minhash_rows == self.num_perm, (
            "num_perm must equal minhash_bands * minhash_rows"
        )


DEFAULT_CONFIG = PipelineConfig()
