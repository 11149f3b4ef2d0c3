"""Line-structure derivation kernel (stages/lines.py): the vectorized
byte-slice chunker must match a plain-Python reference exactly, be
invariant to batch splits, and pack winner keys losslessly."""

import numpy as np
import pyarrow as pa

from consult_ray.stages.lines import (
    FOOTER_PREFIX,
    FOOTER_SUFFIX,
    HEADER_PREFIX,
    LINE_NO_BITS,
    WORDS_PER_LINE,
    lines_batch,
    pack_line_key,
)


def _ref_lines(ids, texts, sources, wpl=WORDS_PER_LINE):
    rows = []
    for i, t, s in zip(ids, texts, sources):
        rows.append((i, 0, HEADER_PREFIX + s))
        words = t.split(" ")  # '' -> [''], matching SQL string_split
        chunks = [
            " ".join(words[j : j + wpl]) for j in range(0, len(words), wpl)
        ]
        for no, line in enumerate(chunks, start=1):
            rows.append((i, no, line))
        rows.append((i, len(chunks) + 1, FOOTER_PREFIX + s + FOOTER_SUFFIX))
    return rows


def _table(ids, texts, sources):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )


CASES = [
    # empty text, single word, exact multiple of wpl, one over, unicode
    (7, "", "a.com"),
    (8, "solo", "b.org"),
    (9, " ".join(f"w{k}" for k in range(WORDS_PER_LINE)), "c.net"),
    (10, " ".join(f"w{k}" for k in range(WORDS_PER_LINE + 1)), "c.net"),
    (11, " ".join(f"w{k}" for k in range(3 * WORDS_PER_LINE)), "d.io"),
    (12, "héllo wörld é " + " ".join(["x"] * 25), "e.de"),
    (13, "  double  spaces ", "f.fr"),  # empty words between spaces
]


def _rows(tbl):
    # row ORDER is unspecified (header/body/footer sections are emitted
    # concatenated); every consumer groups by key, so compare as sets
    return sorted(
        (r["doc_id"], r["line_no"], r["line"]) for r in tbl.to_pylist()
    )


def test_lines_batch_matches_python_reference():
    ids, texts, sources = zip(*[(i, t, s) for i, t, s in CASES])
    got = _rows(lines_batch(_table(ids, texts, sources)))
    assert got == sorted(_ref_lines(ids, texts, sources))


def test_lines_batch_split_invariant():
    ids, texts, sources = zip(*[(i, t, s) for i, t, s in CASES])
    whole = _rows(lines_batch(_table(ids, texts, sources)))
    parts = []
    for k in range(len(CASES)):
        parts.extend(
            _rows(
                lines_batch(
                    _table(ids[k : k + 1], texts[k : k + 1], sources[k : k + 1])
                )
            )
        )
    assert whole == sorted(parts)


def test_lines_batch_empty():
    out = lines_batch(_table([], [], []))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "line_no", "line"]


def test_pack_line_key_roundtrip_and_hash_consistency():
    ids, texts, sources = zip(*[(i, t, s) for i, t, s in CASES])
    lines = lines_batch(_table(ids, texts, sources))
    keyed = pack_line_key(lines)
    pack = keyed["pack"].to_numpy(zero_copy_only=False)
    doc = keyed["doc_id"].to_numpy(zero_copy_only=False)
    no = lines["line_no"].to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(pack >> LINE_NO_BITS, doc)
    np.testing.assert_array_equal(pack & ((1 << LINE_NO_BITS) - 1), no)
    # equal line text <=> equal 64-bit hash on this corpus (headers from
    # the same source collide intentionally; distinct lines must not)
    h = keyed["line_hash"].to_numpy(zero_copy_only=False)
    text = lines["line"].to_pylist()
    by_hash = {}
    for hv, tv in zip(h, text):
        by_hash.setdefault(int(hv), set()).add(tv)
    assert all(len(v) == 1 for v in by_hash.values())
