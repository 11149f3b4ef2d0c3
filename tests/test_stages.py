"""Stage-level tests: text analysis, substring dedup, similarity,
multimodal plumbing, stateful lookup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from consult_ray.config import PipelineConfig
from consult_ray.sources.synth import make_pages_corpus
from consult_ray.stages.multimodal import (
    DeterministicFakeDecoder,
    LibraryDecoder,
    make_fake_media_table,
    recommended_batch_size,
)
from consult_ray.stages.similarity import add_hyperplane_buckets, brute_force_topk, lsh_topk
from consult_ray.stages.substring import substring_dedup_in_clusters, substring_pairs_table
from consult_ray.stages.text import (
    LangIdStage,
    doc_fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)

CFG = PipelineConfig()


# --- text analysis ---------------------------------------------------

def test_token_count_matches_split_semantics():
    b = pa.table({"text": ["a b c", "one", "x  y"]})  # double space -> empty token
    out = token_count_batch(b)
    assert out["n_tokens"].to_pylist() == [3, 1, 3]
    assert out["n_chars2"].to_pylist() == [5, 3, 4]


def test_quality_score_ranges():
    b = pa.table({"text": ["the cat and the dog sat on the mat", "!!!??!!..,,", "worda " * 50]})
    out = quality_score_batch(b)
    s = out["quality_score"].to_pylist()
    assert all(0 <= x <= 1 for x in s)
    assert s[0] > s[1]  # english-ish beats punctuation soup
    assert out["stop_ratio"].to_pylist()[0] > 0.3


def test_lang_id_heuristic():
    stage = LangIdStage()
    b = pa.table(
        {
            "text": [
                "the quick brown fox jumps over the lazy dog and the cat is on the mat",
                "der schnelle braune fuchs springt über den faulen hund und die katze",
                "le renard brun rapide saute par dessus le chien paresseux dans la maison",
                "",
            ]
        }
    )
    out = stage(b)["lang_pred"].to_pylist()
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "fr"
    assert out[3] == "und"


def test_doc_fingerprint_deterministic():
    b = pa.table({"text": ["hello world", "hello world", "bye"]})
    h = doc_fingerprint_batch(b)["content_hash"].to_pylist()
    assert h[0] == h[1] != h[2]


# --- substring stage -------------------------------------------------

def test_substring_pairs_table_matches_sql_semantics():
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["abcdef", "cde", "abcdef", "zzz"],
        }
    )
    pairs = substring_pairs_table(docs)
    got = set(zip(pairs["inner_id"].to_pylist(), pairs["outer_id"].to_pylist()))
    # 2 in 1, 2 in 3; equal texts 1<->3 both directions
    assert got == {(2, 1), (2, 3), (1, 3), (3, 1)}


def test_substring_dedup_in_clusters(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "cluster_id": [0, 0, 0, 3, 3],
            "text": [
                "the full long document text",
                "standalone variant text",      # not contained anywhere
                "the full long document text",  # exact dup of 0
                "other cluster",
                "other",                         # substring of doc 3, same cluster
            ],
        }
    )
    out = (
        substring_dedup_in_clusters(rd.from_pandas(df), CFG)
        .to_pandas()
        .sort_values("doc_id")
    )
    dropped = dict(zip(out.doc_id, out.substring_dropped))
    assert not dropped[0]   # representative of the exact-dup pair (min id)
    assert not dropped[1]
    assert dropped[2]       # exact dup of 0, higher id -> dropped
    assert not dropped[3]
    assert dropped[4]       # contained in doc 3 within cluster 3


# --- similarity ------------------------------------------------------

@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(11)
    m = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), 16),
        }
    )
    return rd.from_arrow(tbl), m


def test_brute_force_topk_exact(emb_ds):
    ds, m = emb_ds
    q = m[7].astype(np.float64)
    got = brute_force_topk(ds, q, k=5)
    sims = (m / np.linalg.norm(m, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    want = np.argsort(-sims, kind="stable")[:5]
    assert got["vec_id"].to_pylist() == want.tolist()
    assert got["vec_id"].to_pylist()[0] == 7  # itself first


def test_lsh_topk_contains_query_bucket(emb_ds):
    ds, m = emb_ds
    bucketed = add_hyperplane_buckets(ds, CFG, n_planes=6)
    got = lsh_topk(bucketed, m[3].astype(np.float64), CFG, k=3, n_planes=6)
    # approximate: the query itself must be in its own bucket -> rank 1
    assert got["vec_id"].to_pylist()[0] == 3


# --- multimodal plumbing --------------------------------------------

def test_fake_decoder_plumbing(ray_session):
    tbl = make_fake_media_table(40)
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(
        DeterministicFakeDecoder,
        fn_constructor_kwargs=dict(dim=8),
        batch_format="pyarrow",
        batch_size=recommended_batch_size(1024),
        concurrency=2,
    ).to_pandas()
    assert len(out) == 40
    assert all(len(f) == 8 for f in out["features"])
    # deterministic: same payload -> same features
    d = DeterministicFakeDecoder(dim=8)
    f1 = d(tbl.slice(0, 4))["features"].to_pylist()
    f2 = d(tbl.slice(0, 4))["features"].to_pylist()
    assert f1 == f2


def _pil():
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil(), reason="PIL present: decode path is live")
def test_library_decoder_stub_gated():
    with pytest.raises(NotImplementedError):
        LibraryDecoder("image")


@pytest.mark.skipif(not _pil(), reason="needs PIL")
def test_library_decoder_real_decode():
    """Activates wherever PIL exists: a real PNG round-trips through the
    batch decode with true dimensions and the pooled feature."""
    import io

    import PIL.Image as Image

    from consult_ray.stages.multimodal import pool_rgb_features

    a = (np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3) * 3) % 251
    buf = io.BytesIO()
    Image.fromarray(a, "RGB").save(buf, format="PNG")
    tbl = make_fake_media_table(3).drop_columns(["payload"]).add_column(
        2, "payload", pa.array([buf.getvalue()] * 3, pa.large_binary())
    )
    out = LibraryDecoder("image")(tbl)
    mask = out["kind"].to_pylist()
    for i, k in enumerate(mask):
        if k != "image":
            continue
        assert out["width"][i].as_py() == 8
        assert out["height"][i].as_py() == 6
        got = np.array(out["features"][i].as_py(), dtype=np.float32)
        want = pool_rgb_features(a.astype(np.float32))
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_pool_rgb_features_math():
    """The codec-independent pooling half, pinned without PIL: a
    constant-color image pools to that color; quadrant colors land in
    their quadrant cells."""
    from consult_ray.stages.multimodal import pool_rgb_features

    solid = np.full((10, 14, 3), 200.0, dtype=np.float32)
    np.testing.assert_allclose(pool_rgb_features(solid),
                               np.full(48, 200.0 / 255.0, np.float32),
                               rtol=1e-6)
    quad = np.zeros((8, 8, 3), dtype=np.float32)
    quad[:4, :4, 0] = 255.0  # top-left red
    f = pool_rgb_features(quad).reshape(4, 4, 3)
    assert f[0, 0, 0] == 1.0 and f[0, 1, 0] == 1.0
    assert f[1, 1, 0] == 1.0  # rows 0-3 cover pool rows 0-1 of 4
    assert f[2:, :, 0].max() == 0.0 and f[:, 2:, 0].max() == 0.0
    assert f[..., 1:].max() == 0.0


# --- stateful lookup -------------------------------------------------

def test_band_lookup_semi_anti(ray_session):
    from consult_ray.state.lookup import classify_queries

    c = make_pages_corpus(120, seed=42)
    docs = c.pages.append_column("doc_id", pa.array(np.arange(c.pages.num_rows)))
    corpus = rd.from_arrow(docs.slice(0, 80))
    dup_q = docs.slice(0, 10).select(["text"]).append_column(
        "doc_id", pa.array(np.arange(500, 510))
    )
    fresh = pa.table(
        {
            "text": pa.array(
                ["fresh never seen doc %d %s" % (i, " ".join(f"q{i}x{j}" for j in range(60))) for i in range(5)]
            ),
            "doc_id": pa.array(np.arange(900, 905)),
        }
    )
    queries = rd.from_arrow(
        pa.concat_tables([dup_q.select(["doc_id", "text"]), fresh.select(["doc_id", "text"])])
    )
    out = classify_queries(queries, corpus, CFG, concurrency=2).to_pandas()
    assert out[out.doc_id < 900].matched.all()
    assert not out[out.doc_id >= 900].matched.any()
    # match_doc points at a real corpus doc
    assert (out[out.doc_id < 900].match_doc >= 0).all()


def test_ivf_full_probe_is_exact(ray_session):
    """With nprobe == nlist, IVF search degenerates to the exact
    brute-force top-k; with a small nprobe it still returns k rows and
    its top hit appears in the exact top-k."""
    import ray.data as rd

    from consult_ray.config import PipelineConfig
    from consult_ray.stages.similarity import (
        add_ivf_cells,
        brute_force_topk,
        ivf_build_centroids,
        ivf_topk,
    )

    cfg = PipelineConfig()
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    import pyarrow as pa
    first = next(iter(ds.iter_batches(batch_size=16, batch_format="pyarrow")))
    q = np.asarray(first["embedding"].combine_chunks()[0].values, dtype=np.float64)
    qid = int(first["vec_id"][0].as_py())

    cent = ivf_build_centroids(ds, cfg, nlist=8)
    bucketed = add_ivf_cells(ds, cent).materialize()
    exact = brute_force_topk(ds, q, k=5, exclude_ids=frozenset({qid}))
    full = ivf_topk(bucketed, cent, q, k=5, nprobe=8, exclude_ids=frozenset({qid}))
    assert exact["vec_id"].to_pylist() == full["vec_id"].to_pylist()

    approx = ivf_topk(bucketed, cent, q, k=5, nprobe=2, exclude_ids=frozenset({qid}))
    assert len(approx) == 5
    assert approx["vec_id"][0].as_py() in set(exact["vec_id"].to_pylist())


def test_embedding_lsh_pairs_recall_vs_bruteforce(ray_session):
    """Banded hyperplane LSH pair generation: exact precision (verify is
    true cosine) and recall >= 0.99 vs the brute-force all-pairs set."""
    import ray.data as rd

    from consult_ray.stages.similarity import embedding_dup_pairs_lsh

    rng = np.random.default_rng(17)
    n, d, tau = 400, 32, 0.35
    # clustered vectors so plenty of pairs clear tau
    centers = rng.standard_normal((20, d))
    m = centers[rng.integers(0, 20, n)] + 0.55 * rng.standard_normal((n, d))
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    ai, bj = np.nonzero(np.triu(sims >= tau, k=1))
    brute = set(zip(ai.tolist(), bj.tolist()))
    assert len(brute) > 50

    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32) for row in m],
                              pa.list_(pa.float32())),
    })
    got_df = embedding_dup_pairs_lsh(
        rd.from_arrow(tbl), PipelineConfig(), tau=tau
    ).to_pandas()
    got = set(zip(got_df.a, got_df.b))
    assert got <= brute, "precision must be exact (cosine-verified)"
    recall = len(got & brute) / len(brute)
    assert recall >= 0.99, f"recall {recall:.4f}"


def test_minimizers_match_bruteforce_random_unicode(ray_session):
    """The batch radix-tournament minimizer must equal the brute-force
    min-over-windows on random unicode docs (incl. empty/short/repeat)."""
    import ray.data as rd

    from consult_ray.pipelines.extra_queries import minimizers_dataset

    rng = np.random.default_rng(11)
    K = 16
    texts = []
    for _ in range(80):
        n = int(rng.integers(0, 200))
        texts.append("".join(chr(int(c)) for c in rng.integers(32, 1200, n)))
    texts += ["", "short", "a" * 40, "ab" * 30, "zz" + "a" * 20 + "zz"]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    got = minimizers_dataset(rd.from_arrow(tbl), k=K).to_pandas().sort_values(
        "doc_id", ignore_index=True
    )

    def brute(t):
        return t if len(t) <= K else min(t[i: i + K] for i in range(len(t) - K + 1))

    for i, t in enumerate(texts):
        assert got.minimizer[i] == brute(t), i


def test_kmeans_embeddings_recovers_blobs(ray_session):
    """Distributed Lloyd's must exactly recover well-separated synthetic
    blobs (every blob lands in one cluster, clusters don't merge), and
    two runs in one session are value-identical."""
    import ray.data as rd

    from consult_ray.config import PipelineConfig
    from consult_ray.stages.similarity import kmeans_embeddings

    rng = np.random.default_rng(23)
    k, per, d = 4, 120, 16
    centers = rng.normal(size=(k, d)) * 8
    vecs = np.concatenate([
        centers[i] + rng.normal(scale=0.05, size=(per, d)) for i in range(k)
    ])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(k * per), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32))),
    })
    cfg = PipelineConfig()
    a1, cent = kmeans_embeddings(rd.from_arrow(tbl), cfg, k=k, iters=8)
    df = a1.to_pandas().sort_values("vec_id", ignore_index=True)
    lab = df.cluster.to_numpy()
    # each blob maps to exactly one cluster and no two blobs share one
    blob_clusters = [set(lab[i * per:(i + 1) * per]) for i in range(k)]
    assert all(len(s) == 1 for s in blob_clusters), blob_clusters
    assert len(set().union(*blob_clusters)) == k
    assert cent.shape == (k, d)

    a2, _ = kmeans_embeddings(rd.from_arrow(tbl), cfg, k=k, iters=8)
    df2 = a2.to_pandas().sort_values("vec_id", ignore_index=True)
    assert (df2.cluster.to_numpy() == lab).all()


# --- product quantization --------------------------------------------


def test_pq_encode_matches_argmin_and_adc_reference(emb_ds):
    """Encoding equals the per-row nearest-center argmin and the
    batched LUT-gather ADC distance equals the direct per-row sum of
    subspace squared distances (validates the fixed-size-binary buffer
    slicing and LUT math)."""
    from consult_ray.stages.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    ds, m = emb_ds
    books = pq_train_codebooks(ds, CFG, m=4, ks=8, sample=200, iters=5)
    enc = (
        pq_encode(ds, books)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    x = m.astype(np.float64)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dsub = x.shape[1] // 4
    codes = np.stack([np.frombuffer(c, dtype=np.uint8) for c in enc["pq_code"]])
    for j in range(4):
        xs = x[:, j * dsub:(j + 1) * dsub]
        d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
        assert (codes[:, j] == np.argmin(d2, axis=1)).all()

    q = m[5].astype(np.float64)
    got = pq_topk(pq_encode(ds, books), books, q, k=10)
    qn = q / np.linalg.norm(q)
    ref = np.zeros(len(x))
    for j in range(4):
        ref += (
            (books[j][codes[:, j]] - qn[j * dsub:(j + 1) * dsub][None, :]) ** 2
        ).sum(-1)
    order = np.lexsort((np.arange(len(x)), ref))[:10]
    assert got["vec_id"].to_pylist() == order.tolist()
    np.testing.assert_allclose(
        np.asarray(got["pq_dist"]), ref[order], rtol=0, atol=1e-12
    )


def test_pq_topk_recall_and_determinism(ray_session):
    """On clustered (non-adversarial) data PQ@10 must recover most of
    the brute top-10; two runs are bit-identical (seeded codebooks)."""
    from consult_ray.stages.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 32))
    pts = np.repeat(centers, 40, axis=0) + 0.05 * rng.standard_normal((400, 32))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(400, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.astype(np.float32).reshape(-1)), 32
        ),
    })
    ds = rd.from_arrow(tbl)
    books = pq_train_codebooks(ds, CFG, m=8, ks=16, sample=400)
    enc = pq_encode(ds, books)
    q = pts[3].astype(np.float64)
    got = pq_topk(enc, books, q, k=10)
    got2 = pq_topk(pq_encode(ds, books), books, q, k=10)
    assert got.equals(got2)
    # quantization collapses co-cluster members to near-identical codes,
    # so intra-cluster rank is tie-arbitrary — the property PQ promises
    # is CLUSTER-level retrieval: every hit must come from the query's
    # true cluster (ids 0..39), whose inter-cluster distance dwarfs the
    # quantization error
    hits = got["vec_id"].to_pylist()
    assert all(0 <= i < 40 for i in hits), f"off-cluster hits: {hits}"
    brute = brute_force_topk(ds, q, k=10)
    assert all(0 <= i < 40 for i in brute["vec_id"].to_pylist())
