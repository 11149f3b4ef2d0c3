"""Distributed BPE tokenizer training: census -> bounded local merges.

Algorithm: Sennrich, Haddow & Birch 2016 (arXiv:1508.07909) char-level
BPE with whitespace pre-tokenization. The scale shape is
census-then-merge: ONE distributed pass shrinks the corpus to its
distinct-word frequency table (per-block `value_counts` partials, so the
token explosion never leaves a batch and the groupby shuffles
vocabulary-sized rows, never one row per token), then the merge loop
runs over that bounded table only — at 100 TB the census is the whole
corpus read, while 10^8 distinct words x ~8 symbols fit one worker.

Reference analog: the reference builds its k-mer encoding table once up
front and then streams every read against the fixed table
(/root/reference/main_map.cpp:859-1132 builds, main_search.cpp:704-894
consumes); `train_bpe` is that build step for text tokens, and
`BpeEncoder` is the fixed-table streaming consumer.

Determinism contract (mirrored bit-for-bit by the brute-force oracle in
tests/test_bpe.py):
- words = text split on single spaces, empties dropped;
- a pair's count sums word_freq over EVERY adjacent occurrence
  (overlaps included: "aaa" contributes (a,a) twice);
- merge winner = max count, ties by lexicographically smallest
  (left_token, right_token) string pair, then smallest id pair;
- a merge rewrites occurrences greedily LEFT-TO-RIGHT without overlap
  ("aaaa" + merge (a,a) -> "aa","aa");
- training stops when the best pair count < min_count (default 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from consult_ray.util import grouped

# new symbol ids are assigned above the codepoint range, so base ids ARE
# codepoints and never collide with merge products
_BASE = 0x110000


def word_census(ds: Dataset, text_col: str = "text", cfg=None) -> Dataset:
    """(word, n) frequency table of space-separated words. Per-block
    value_counts partials -> one vocabulary-sized partition-kernel
    merge (vocab cardinality scales with the corpus, so the native
    per-distinct-key aggregate is the measured 58x cliff — commit
    4fb6a54; see util.partitioned_group_agg). cfg sizes the shuffle
    (defaults to PipelineConfig())."""
    from consult_ray.config import PipelineConfig
    from consult_ray.util import partitioned_group_agg, resolve_join_partitions

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(batch[text_col], pattern=" ")
        )
        words = words.filter(pc.not_equal(words, pa.scalar("")))
        counts = pc.value_counts(words)
        return pa.table({
            "word": counts.field("values"),
            "n": counts.field("counts").cast(pa.int64()),
        })

    return partitioned_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        "word", [("n", "sum", "n")],
        resolve_join_partitions(cfg or PipelineConfig()),
    )


def _codepoints(words: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(cps, offs): concatenated uint32 codepoints of every word plus
    per-word codepoint offsets (len m+1). Two C passes over the batch
    (utf8 decode + utf32 encode), no per-row Python."""
    from consult_ray.stages.fingerprint import _utf8_concat_and_offsets

    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    data, _ = _utf8_concat_and_offsets(words)
    cps = np.frombuffer(
        data.tobytes().decode("utf-8").encode("utf-32-le"), dtype=np.uint32
    )
    clen = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(clen)])
    return cps, offs


def pair_count_partial(batch: pa.Table, word_col: str = "word",
                       n_col: str = "n") -> pa.Table:
    """(pair uint64, n) adjacent-codepoint pair counts of one census
    batch, weighted by word frequency. pair = left_cp << 32 | right_cp,
    which sorts exactly like (left_char, right_char) binary collation."""
    cps, offs = _codepoints(batch[word_col])
    w = batch[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(cps) < 2:
        return pa.table({"pair": pa.array([], pa.uint64()),
                         "n": pa.array([], pa.int64())})
    valid = np.ones(len(cps) - 1, dtype=bool)
    # position i pairs cps[i],cps[i+1]; it is invalid when i+1 starts a
    # new word, i.e. i is the last codepoint index of any non-final word
    inner = offs[1:-1]
    valid[inner[inner > 0] - 1] = False
    m = len(batch)
    widx = np.repeat(np.arange(m, dtype=np.int64),
                     np.diff(offs))[: len(cps) - 1]
    keys = (cps[:-1].astype(np.uint64) << np.uint64(32)) | cps[1:].astype(
        np.uint64
    )
    uniq, inv = np.unique(keys[valid], return_inverse=True)
    # integer weights < 2^53 sum exactly in float64
    cnt = np.bincount(inv, weights=w[widx[valid]].astype(np.float64))
    return pa.table({
        "pair": pa.array(uniq, pa.uint64()),
        "n": pa.array(cnt.astype(np.int64)),
    })


def pair_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """(pair uint64, n) global adjacent-char pair counts over every word
    occurrence. Census folded INTO each batch (value_counts then the
    weighted pair kernel), so one tiny alphabet^2-bounded groupby is the
    only shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern(batch[text_col], pattern=" ")
        )
        words = words.filter(pc.not_equal(words, pa.scalar("")))
        counts = pc.value_counts(words)
        census = pa.table({
            "word": counts.field("values"),
            "n": counts.field("counts").cast(pa.int64()),
        })
        return pair_count_partial(census)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
    )


def pair_strings(pairs: pa.Table) -> pa.Table:
    """Expand packed pairs to (left, right) single-char string columns
    (uint32 view -> numpy '<U1', no per-row Python)."""
    packed = pairs["pair"].to_numpy(zero_copy_only=False)
    left = (packed >> np.uint64(32)).astype(np.uint32)
    right = packed.astype(np.uint32)
    out = {"left": pa.array(left.view("<U1")),
           "right": pa.array(right.view("<U1"))}
    for name in pairs.column_names:
        if name != "pair":
            out[name] = pairs[name]
    return pa.table(out)


def train_bpe(
    census: Dataset,
    n_merges: int = 64,
    max_words: int = 4096,
    min_count: int = 2,
) -> pa.Table:
    """Greedy BPE merge table from a word-frequency census.

    Bounded driver intake: only the top `max_words` words by (n desc,
    word asc) leave the cluster — the standard coverage cap (dropped
    tail words still encode fine, just as base symbols + earlier
    merges). A per-block top-V combiner prunes BEFORE the global sort,
    so the sort shuffles <= V rows per block instead of the whole
    vocabulary (the grouped_top_k plan shape, here with one group).
    Returns (rank, left, right, token, n) with one row per merge in
    training order."""

    def block_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= max_words:
            return batch
        idx = pa.compute.sort_indices(
            batch, sort_keys=[("n", "descending"), ("word", "ascending")]
        )
        return batch.take(idx.slice(0, max_words))

    top = (
        census.map_batches(block_top, batch_format="pyarrow")
        .sort(["n", "word"], descending=[True, False])
        .limit(max_words)
    )
    parts = list(top.iter_batches(batch_size=max_words,
                                  batch_format="pyarrow"))
    if parts:
        tbl = pa.concat_tables(parts).combine_chunks()
    else:
        tbl = pa.table({"word": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64())})

    cps, offs = _codepoints(tbl["word"])
    seq = cps.astype(np.uint64)
    wid = np.repeat(np.arange(len(tbl), dtype=np.int64), np.diff(offs))
    wcount = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)

    # symbols are canonically STRINGS (classic BPE): merge products are
    # deduplicated by string, so "abc" reached via (a,bc) and via (ab,c)
    # is ONE symbol — exactly what a per-word brute-force trainer over
    # string tuples computes
    tokens: dict[int, str] = {}  # merge-product ids only
    by_str: dict[str, int] = {}

    def tok(i: int) -> str:
        return chr(i) if i < _BASE else tokens[i]

    ranks, lefts, rights, toks, counts = [], [], [], [], []
    next_id = _BASE
    for rank in range(n_merges):
        adj = wid[:-1] == wid[1:] if len(seq) > 1 else np.zeros(0, bool)
        pos = np.nonzero(adj)[0]
        if not len(pos):
            break
        keys = (seq[pos] << np.uint64(32)) | seq[pos + 1]
        uniq, inv = np.unique(keys, return_inverse=True)
        cnt = np.bincount(inv, weights=wcount[wid[pos]].astype(np.float64))
        best = int(cnt.max())
        if best < min_count:
            break
        cands = uniq[cnt == cnt.max()]
        a, b = min(
            ((int(k) >> 32, int(k) & 0xFFFFFFFF) for k in cands),
            key=lambda ab: (tok(ab[0]), tok(ab[1]), ab),
        )
        ca, cb = np.uint64(a), np.uint64(b)
        hit = (seq[:-1] == ca) & (seq[1:] == cb) & adj
        cpos = np.nonzero(hit)[0]
        if a == b and len(cpos) > 1:
            # greedy left-to-right: within each run of CONSECUTIVE
            # candidate positions (only possible when a == b), keep the
            # even offsets — "aaaa" merges at 0 and 2, not 1
            run_start = np.concatenate([[True], np.diff(cpos) != 1])
            starts = cpos[run_start][np.cumsum(run_start) - 1]
            cpos = cpos[(cpos - starts) % 2 == 0]
        lt, rt = tok(a), tok(b)
        prod = lt + rt
        pid = by_str.get(prod)
        if pid is None:
            pid = next_id
            next_id += 1
            tokens[pid] = prod
            by_str[prod] = pid
        seq[cpos] = np.uint64(pid)
        keep = np.ones(len(seq), dtype=bool)
        keep[cpos + 1] = False
        seq = seq[keep]
        wid = wid[keep]
        ranks.append(rank)
        lefts.append(lt)
        rights.append(rt)
        toks.append(prod)
        counts.append(best)

    return pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "token": pa.array(toks, pa.string()),
        "n": pa.array(counts, pa.int64()),
    })


class BpeEncoder:
    """Actor-pool encode stage: applies a trained merge table to every
    doc, emitting (id_col, n_tokens, n_chars). The merge table is
    compiled ONCE per actor in __init__ (the reference's resident
    fixed-table consumer shape, main_search.cpp:704-707); __call__ runs
    the same vectorized merge kernel as training, one pass per merge
    rank over the batch's DISTINCT words (dictionary-encoded; encoding
    is word-local, so occurrences share their word's tokenization)."""

    def __init__(self, merges: pa.Table, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        by_token: dict[str, int] = {}  # merge-product strings only
        self.merge_ids = []
        nid = _BASE
        for lt, rt in zip(merges["left"].to_pylist(),
                          merges["right"].to_pylist()):
            # same string-canonical ids as train_bpe: single chars are
            # their codepoint; every longer token is a prior product
            a = ord(lt) if len(lt) == 1 else by_token[lt]
            b = ord(rt) if len(rt) == 1 else by_token[rt]
            prod = lt + rt
            if prod not in by_token:
                by_token[prod] = nid
                nid += 1
            self.merge_ids.append(
                (np.uint64(a), np.uint64(b), np.uint64(by_token[prod]))
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # whole batch as one symbol stream; word AND doc boundaries both
        # break adjacency via a per-symbol stream id
        words = pc.split_pattern(batch[self.text_col], pattern=" ")
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        n_words = pc.list_value_length(words).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_of_word = np.repeat(np.arange(len(batch), dtype=np.int64),
                                n_words)
        nonempty = pc.not_equal(
            pc.list_flatten(words), pa.scalar("")
        ).to_numpy(zero_copy_only=False)
        # per-doc word counts AFTER the empty filter
        per_doc_words = np.bincount(
            doc_of_word[nonempty], minlength=len(batch)
        ).astype(np.int64)

        # encode each DISTINCT word once (encoding is word-local, so
        # occurrences share their word's tokenization): merge-loop work
        # scales with the batch's vocabulary, not its token count
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        uniq = enc.dictionary
        occ_of_word = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )

        cps, offs = _codepoints(uniq)
        seq = cps.astype(np.uint64)
        stream = np.repeat(np.arange(len(uniq), dtype=np.int64),
                           np.diff(offs))
        for a, b, pid in self.merge_ids:
            if len(seq) > 1:
                adj = stream[:-1] == stream[1:]
                hit = (seq[:-1] == a) & (seq[1:] == b) & adj
                cpos = np.nonzero(hit)[0]
                if a == b and len(cpos) > 1:
                    run_start = np.concatenate(
                        [[True], np.diff(cpos) != 1]
                    )
                    starts = cpos[run_start][np.cumsum(run_start) - 1]
                    cpos = cpos[(cpos - starts) % 2 == 0]
                if len(cpos):
                    seq[cpos] = pid
                    keep = np.ones(len(seq), dtype=bool)
                    keep[cpos + 1] = False
                    seq = seq[keep]
                    stream = stream[keep]

        # tokens per distinct word -> per occurrence -> per doc
        per_uniq = np.bincount(stream, minlength=len(uniq)).astype(
            np.int64
        )
        doc_of_stream = doc_of_word[nonempty]
        n_tokens = np.bincount(
            doc_of_stream,
            weights=per_uniq[occ_of_word].astype(np.float64),
            minlength=len(batch),
        ).astype(np.int64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_tokens": pa.array(n_tokens),
            "n_words": pa.array(per_doc_words),
            "n_chars": pc.cast(pc.utf8_length(batch[self.text_col]),
                               pa.int64()),
        })
