"""consult_ray — a Ray-Data-native near-duplicate detection + clustering
engine for web-scale text, built from scratch with the query and
data-processing capabilities of the CONSULT reference
(/root/reference: main_map.cpp, main_search.cpp, minimization.cpp),
recast for Common-Crawl-style Parquet tables.

Layout:
    functions/  pure vectorized kernels (hashing, shingling, minhash,
                simhash, text normalization, suffix arrays)
    stages/     map_batches stage callables (fingerprint, bands, verify,
                text analysis, similarity, multimodal plumbing)
    sources/    synthetic corpus generator, readers, checkpoint sinks
    pipelines/  end-to-end dedup pipeline, clustering, query registry
    state/      stateful actors (band-table lookup), union-find

IMPORTANT: nothing in this package calls ray.init()/ray.shutdown();
sessions are owned by bench.py / CLI entry points / the test fixture.
"""

from consult_ray.config import PipelineConfig, DEFAULT_CONFIG

__all__ = ["PipelineConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
