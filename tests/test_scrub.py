"""Kernel tests for the scrub stage (Ray-free: pure Arrow/numpy).

The registered pii_redact / url_canonical / decontaminate queries are
SQL-checked end-to-end in test_queries_oracle.py; these tests pin the
kernel edge cases the sf tables don't exercise.
"""

import numpy as np
import pyarrow as pa

from consult_ray.stages.scrub import (
    ContaminationScanner,
    canonicalize_url,
    redact_pii,
    remove_frequent_lines_batch,
    snippet_window_hashes,
)


def test_redact_order_email_before_phone():
    # the email pattern must consume its digits before the phone pass;
    # adjacent PII tokens redact independently
    t = pa.array([
        "mail a+b_c%d@x-y.co.uk now",
        "ip 192.168.0.1 tel +44 7911 123456.",
        "a@b.io+1 23456789",
        "no pii here",
    ])
    out = redact_pii(t).to_pylist()
    assert out == [
        "mail <EMAIL> now",
        "ip <IP> tel <PHONE>.",
        "<EMAIL><PHONE>",
        "no pii here",
    ]


def test_canonicalize_url_cases():
    t = pa.array([
        "HTTP://WWW.Ex.COM/A/B/",                      # scheme+host lower, www, slash
        "https://ex.com/p?utm_source=a&ref=b",          # all params tracked -> dropped
        "https://ex.com/p?utm_x=1&keep=2",              # mixed -> keep survivor
        "https://ex.com/Path/Case",                     # path case preserved
        "https://www.ex.com",                           # bare host
        "not a url/",                                   # no scheme: rewrites only
    ])
    out = canonicalize_url(t).to_pylist()
    assert out == [
        "http://ex.com/A/B",
        "https://ex.com/p",
        "https://ex.com/p?keep=2",
        "https://ex.com/Path/Case",
        "https://ex.com",
        "not a url",
    ]


def test_canonicalize_url_is_idempotent():
    # canonicalization should be a projection: canon(canon(x)) ==
    # canon(x), or repeated normalization in different pipeline stages
    # fractures the dedup key space. The alphabet excludes the letters
    # of 'utm'/'ref': a single-pass RE2 param remover (no lookbehind)
    # is not idempotent across removal SEAMS by construction — that
    # caveat is documented on URL_REWRITES and shared bit-for-bit by
    # the SQL oracle, so it is out of scope for this property.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.text(
        alphabet="abcXYZ019./?&=:WW_-% ", min_size=0, max_size=60,
    ), min_size=1, max_size=20))
    @settings(max_examples=150, deadline=None)
    def check(urls):
        arr = pa.array(urls, pa.string())
        once = canonicalize_url(arr)
        twice = canonicalize_url(once)
        assert once.to_pylist() == twice.to_pylist()

    check()
    # targeted fixed-point cases for the run-stripping rules
    hard = pa.array([
        "HTTP://WWW.www.Ex.com/a/?&/",
        "https://ex.com/p?&&",
        "https://ex.com////",
        "?/", ".=.0&/",
    ])
    once = canonicalize_url(hard)
    assert canonicalize_url(once).to_pylist() == once.to_pylist()


def test_snippet_hash_is_position_invariant():
    # a snippet's single-window hash equals the same bytes' window hash
    # at ANY position inside a larger doc (the scan's core premise)
    from consult_ray.functions.hashing import rolling_shingle_hashes

    k = 8
    snip = b"abcdefgh"
    hs = snippet_window_hashes([snip], k)
    doc = b"xxxx" + snip + b"yyyyyyyy" + snip
    concat = np.frombuffer(doc, dtype=np.uint8)
    offsets = np.array([0, len(doc)], dtype=np.int64)
    h, _ = rolling_shingle_hashes(concat, offsets, k)
    assert np.isin(hs, h).all()
    # and a doc without the snippet shares no window hash
    other = np.frombuffer(b"0123456789abcdef0123", dtype=np.uint8)
    h2, _ = rolling_shingle_hashes(other, np.array([0, 20], dtype=np.int64), k)
    assert not np.isin(hs, h2).any()


def test_contamination_scanner_edge_cases():
    k = 8
    snips = ["abcdefgh", "ZZZZZZZZ"]
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "prefix abcdefgh suffix",   # contains snippet mid-doc
            "short",                    # shorter than k: cannot contain
            "no match in this doc!!",   # long enough, no hit
            "ZZZZZZZZ",                 # doc IS the snippet
        ]),
    })
    out = ContaminationScanner(snips, k=k)(batch)
    assert out["contaminated"].to_pylist() == [True, False, False, True]
    # empty snippet set: nothing flagged
    out2 = ContaminationScanner([], k=k)(batch)
    assert out2["contaminated"].to_pylist() == [False] * 4


def test_remove_frequent_lines_edge_cases():
    # unsorted ids; one doc loses EVERY line (header+footer+body all
    # frequent) -> n_kept 0, empty text_clean; reassembly preserves
    # line order within each doc
    batch = pa.table({
        "doc_id": pa.array([7, 3], pa.int64()),
        "text": pa.array(["a b", "x y"]),
        "source": pa.array(["s1", "s1"]),
    })
    from consult_ray.stages.lines import lines_batch

    lt = lines_batch(batch)
    doc3_lines = [r["line"] for r in lt.to_pylist() if r["doc_id"] == 3]
    out = remove_frequent_lines_batch(batch, pa.array(doc3_lines))
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id[3]["n_kept"] == 0 and by_id[3]["text_clean"] == ""
    # doc 7 keeps only its body line "a b" (header/footer shared with
    # doc 3 via the same source, so they are in the frequent set too)
    assert by_id[7]["text_clean"] == "a b" and by_id[7]["n_kept"] == 1
    # row order follows the input batch
    assert out["doc_id"].to_pylist() == [7, 3]


def test_decontaminate_nonascii_corpus_matches_oracle(ray_session, tmp_path):
    """A multi-byte char inside a benchmark doc's snippet window used to
    crash the scanner (40 CHARS sliced, 40 BYTES asserted). The ASCII
    gate must drop that doc from the snippet set — identically in the
    Ray kernel and the SQL oracle — while non-ASCII docs still scan."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from consult_ray.pipelines.scrub_queries import (
        SCRUB_ORACLE_SQL,
        q_decontaminate,
    )

    ascii_s = "A quick brown fox jumps over the lazy dog near a riverbank!"
    uni_s = "Ein Käfer läuft über die Straße — größer als üblich heute ja."
    assert len(uni_s) >= 50 and len(uni_s.encode()) != len(uni_s)
    docs = pa.table({
        # doc_id % 97 == 1 marks benchmark docs: 1 is non-ASCII (must be
        # gated OUT of the snippet set), 98 is ASCII (stays in)
        "doc_id": pa.array([1, 98, 2, 3, 4], pa.int64()),
        "text": pa.array([
            uni_s,
            ascii_s,
            "prefix " + ascii_s[10:50] + " suffix",   # contains snippet
            "clean doc with no benchmark overlap at all, long enough.",
            "also contains " + uni_s[10:50] + " but that snippet is gated",
        ]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")

    got = q_decontaminate(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.sql(SCRUB_ORACLE_SQL["decontaminate"]).df()
    got = got.sort_values("doc_id", ignore_index=True)
    want = want.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    flags = dict(zip(got.doc_id, got.contaminated))
    assert flags[98] and flags[2], "ASCII snippet must still flag"
    assert not flags[4], "gated non-ASCII snippet must not flag"
