"""Job driver: the single `ray job submit` entry point (SURVEY §3.4).

    ray job submit -- python -m consult_ray \
        --input /data/pages_parquet --workdir /data/dedup_run1 \
        [--mode dedup|build-library|search-library] \
        [--hot-policy cap|salt] [--resume]

Modes (one per reference binary, plus the flagship pipeline):
  * dedup (default): full checkpointed dedup pipeline (fingerprints →
    bands → edges → labels → clusters → substring → survivors) with a
    stage/lineage summary. Re-running with the same --workdir resumes:
    completed stages are skipped via their _SUCCESS markers (--resume
    is implied; pass --fresh to wipe first).
  * build-library: main_map analog — build the partitioned band-table
    library from --input and persist it at --library.
  * search-library: main_search analog — classify --input query docs
    against the --library, write matched/unclassified parquet under
    --workdir (the ucseq_ anti-join split).
  * ingest: one streaming-dedup step — classify the --input shard
    against the resident --library (created empty if missing), drop
    near-dup docs, append the novel ones, write survivors parquet under
    --workdir. Run per arriving shard; the library grows monotonically
    and append is order-free + idempotent.
  * minimize: main_minimization analog — per-doc lexicographically
    smallest k-window (k=16), written as parquet under --workdir.
  * train-bpe: BPE tokenizer training (stages/bpe.py: distributed word
    census → bounded greedy merge loop); merge table written as
    parquet under --workdir (--bpe-merges / --bpe-max-words).
  * library-stats: occupancy report over a persisted library (the
    reference's build-time histogram, main_map.cpp:1167-1197).

Owns its Ray session only when none exists (the driver contract:
library code never calls ray.init unconditionally).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from consult_ray.util import read_parquet_clean


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="consult_ray")
    ap.add_argument("--input", default=None,
                    help="parquet file/dir with doc_id + text columns "
                         "(url-keyed pages tables work via --id-col url); "
                         "required for every mode except library-stats")
    ap.add_argument("--workdir", default=None,
                    help="checkpoint/output directory; required for every "
                         "mode except library-stats")
    ap.add_argument("--mode",
                    choices=["dedup", "build-library", "search-library",
                             "ingest", "minimize", "train-bpe",
                             "library-stats"],
                    default="dedup")
    ap.add_argument("--library", default=None,
                    help="band-table library dir (build-library output / "
                         "search-library input)")
    ap.add_argument("--library-partitions", type=int, default=16)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html-col", default=None,
                    help="read this raw-html binary column and run the "
                         "pinned extract_text stage first (pages-table "
                         "input per BASELINE.json input_hint)")
    ap.add_argument("--hot-policy", choices=["cap", "salt"], default="cap")
    ap.add_argument("--bpe-merges", type=int, default=4096,
                    help="train-bpe: number of greedy merge rounds")
    ap.add_argument("--bpe-max-words", type=int, default=1 << 20,
                    help="train-bpe: top-V distinct-word cap for the "
                         "driver-side merge loop (count desc, word asc)")
    ap.add_argument("--census-mode", choices=["sketch", "exact"], default="sketch")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the workdir's checkpoints (the "
                         "default; flag kept for CLI compatibility)")
    ap.add_argument("--fresh", action="store_true",
                    help="delete the workdir before running")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus when starting a new local session")
    args = ap.parse_args(argv)

    if args.mode == "library-stats":
        # the A3 occupancy report over a persisted library
        # (/root/reference/main_map.cpp:1167-1197's analog). Purely local
        # pyarrow/numpy — runs BEFORE any Ray session starts.
        import numpy as np
        import pyarrow.parquet as pq

        from consult_ray.state.library import _part_path, read_library_meta

        assert args.library, "--library required for library-stats"
        meta = read_library_meta(args.library)
        hist: dict[int, int] = {}
        total_rows = total_keys = total_dropped = 0
        for p in meta["partitions"]:
            part = int(p["part"])
            total_rows += int(p["rows"])
            total_keys += int(p["n_keys"])
            total_dropped += int(p.get("dropped", 0))
            keys = pq.read_table(
                _part_path(args.library, part), columns=["band_key"]
            )["band_key"].to_numpy(zero_copy_only=False)
            _, per_key = np.unique(keys, return_counts=True)
            occ, n = np.unique(per_key, return_counts=True)
            for o, c in zip(occ.tolist(), n.tolist()):
                hist[o] = hist.get(o, 0) + c
        print(f"== band library {args.library}: {total_rows} rows, "
              f"{total_keys} keys, {len(meta['partitions'])}/"
              f"{meta['num_partitions']} partitions, "
              f"{total_dropped} rows dropped past cap ==")
        n_buckets = sum(hist.values()) or 1
        for occ in sorted(hist):
            frac = hist[occ] / n_buckets
            print(f"  occupancy {occ:>3}: {hist[occ]:>10} buckets ({frac:.4%})")
        return 0

    assert args.workdir, f"--workdir required for mode {args.mode}"

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import dataclasses

    from consult_ray.config import PipelineConfig
    from consult_ray.pipelines.checkpointed import CheckpointedDedupPipeline

    if args.fresh and os.path.exists(args.workdir):
        shutil.rmtree(args.workdir)

    cfg = dataclasses.replace(
        PipelineConfig(), hot_policy=args.hot_policy, census_mode=args.census_mode
    )

    assert args.input, f"--input required for mode {args.mode}"
    content_col = args.html_col or args.text_col
    docs = read_parquet_clean(args.input, columns=[args.id_col, content_col])

    # string-keyed tables (--id-col url, the input_hint pages schema):
    # assign deterministic content-hash int64 ids as stage zero, run the
    # int64 engine on those, and persist the (id, key) mapping for the
    # output round-trip (search-library carries the key column through
    # its output rows natively)
    import pyarrow as _pa

    key_col = None
    id_col = args.id_col
    sch = docs.schema()  # ray Schema: parallel .names / .types lists
    id_type = dict(zip(sch.names, sch.types))[args.id_col]
    if args.mode in ("dedup", "build-library", "search-library", "ingest") and not _pa.types.is_integer(
        id_type
    ):
        from consult_ray.stages.ids import add_hashed_doc_ids

        key_col, id_col = args.id_col, "__docid"
        docs = add_hashed_doc_ids(docs, key_col=key_col, id_col=id_col)
        if args.mode == "dedup":
            import shutil
            import tempfile

            os.makedirs(args.workdir, exist_ok=True)
            mpath = os.path.join(args.workdir, "id_mapping")
            # sweep tmp orphans from crashed writes (they never go live)
            for d in os.listdir(args.workdir):
                if d.startswith("id_mapping.tmp"):
                    shutil.rmtree(os.path.join(args.workdir, d),
                                  ignore_errors=True)
            if not os.path.exists(os.path.join(mpath, "_done")):
                # lean key-only scan: the mapping never needs text/html,
                # so the heavy columns stay in storage for this pass
                keys = add_hashed_doc_ids(
                    read_parquet_clean(args.input, columns=[key_col]),
                    key_col=key_col, id_col=id_col,
                ).select_columns([id_col, key_col])
                tmp = tempfile.mkdtemp(prefix="id_mapping.tmp",
                                       dir=args.workdir)
                keys.write_parquet(tmp)
                with open(os.path.join(tmp, "_done"), "w") as f:
                    f.write("")
                # tmp is complete (incl. marker); swap it live atomically
                shutil.rmtree(mpath, ignore_errors=True)
                os.replace(tmp, mpath)
            print(f"string id column {key_col!r}: hashed int64 ids assigned; "
                  f"(id, {key_col}) mapping parquet at {mpath}")

    if args.mode != "dedup" and args.html_col:
        # library modes run the pinned extraction inline (the dedup mode
        # runs it as a checkpointed stage inside the pipeline)
        import pyarrow as pa

        from consult_ray.functions.textnorm import extract_text_column

        idc, tc, hc, kc = id_col, args.text_col, args.html_col, key_col

        def _extract(b: "pa.Table") -> "pa.Table":
            cols = {idc: b[idc], tc: extract_text_column(b[hc].combine_chunks())}
            if kc:
                cols[kc] = b[kc]
            return pa.table(cols)

        docs = docs.map_batches(_extract, batch_format="pyarrow")

    if args.mode == "minimize":
        # uses `docs` as prepared above: --id-col/--text-col honored and
        # the pinned extraction already applied when --html-col is given
        from consult_ray.pipelines.extra_queries import minimizers_dataset

        t0 = time.time()
        out = minimizers_dataset(
            docs, text_col=args.text_col, id_col=args.id_col
        ).materialize()
        os.makedirs(args.workdir, exist_ok=True)
        out.write_parquet(os.path.join(args.workdir, "minimizers"))
        n = out.count()
        print(f"== minimized {n} docs in {time.time() - t0:.1f}s; "
              f"parquet under {args.workdir}/minimizers ==")
        return 0

    if args.mode == "train-bpe":
        # docs prepared above: --text-col honored, pinned extraction
        # already applied when --html-col is given
        import pyarrow.parquet as pq

        from consult_ray.stages.bpe import train_bpe, word_census

        t0 = time.time()
        merges = train_bpe(
            word_census(docs, text_col=args.text_col),
            n_merges=args.bpe_merges,
            max_words=args.bpe_max_words,
        )
        os.makedirs(args.workdir, exist_ok=True)
        out_path = os.path.join(args.workdir, "bpe_merges.parquet")
        pq.write_table(merges, out_path)
        print(f"== trained {merges.num_rows} BPE merges in "
              f"{time.time() - t0:.1f}s; merge table at {out_path} ==")
        return 0

    if args.mode == "build-library":
        from consult_ray.state.library import save_band_library

        assert args.library, "--library required for build-library"
        t0 = time.time()
        manifest = save_band_library(
            docs, cfg, args.library, num_partitions=args.library_partitions,
            text_col=args.text_col, id_col=id_col,
        )
        rows = sum(p["rows"] for p in manifest["partitions"])
        print(f"== built band library: {rows} rows in "
              f"{len(manifest['partitions'])} partitions at {args.library} "
              f"({time.time() - t0:.1f}s) ==")
        return 0

    if args.mode == "search-library":
        from consult_ray.state.library import classify_queries_partitioned

        assert args.library, "--library required for search-library"
        t0 = time.time()
        out = classify_queries_partitioned(
            docs, args.library, cfg, text_col=args.text_col, id_col=id_col
        ).materialize()
        matched = out.filter(expr="matched == True")
        unmatched = out.filter(expr="matched == False")
        os.makedirs(args.workdir, exist_ok=True)
        matched.write_parquet(os.path.join(args.workdir, "classified"))
        unmatched.write_parquet(os.path.join(args.workdir, "unclassified"))
        n_m, n_u = matched.count(), unmatched.count()
        print(f"== searched library: {n_m} classified / {n_u} unclassified "
              f"in {time.time() - t0:.1f}s; parquet under {args.workdir} ==")
        return 0

    if args.mode == "ingest":
        from consult_ray.state.library import (
            ingest_shard,
            init_band_library,
        )

        assert args.library, "--library required for ingest"
        # existence must go through the fs layer: --library may be an
        # object-store URI, where os.path.exists is always False and
        # would re-init (wipe) the resident library on every run
        from consult_ray.state import fsio

        _fs, _root = fsio.resolve_fs(args.library)
        if not fsio.exists(_fs, fsio.join(_root, "_SUCCESS")):
            init_band_library(
                args.library, cfg, num_partitions=args.library_partitions
            )
            print(f"initialized empty band library at {args.library}")
        t0 = time.time()
        res = ingest_shard(
            docs, args.library, cfg, text_col=args.text_col, id_col=id_col
        )
        os.makedirs(args.workdir, exist_ok=True)
        res["survivors"].write_parquet(os.path.join(args.workdir, "survivors"))
        print(f"== ingested shard: {res['n_in']} docs -> {res['n_new']} novel "
              f"appended, {res['n_dup']} dups dropped in "
              f"{time.time() - t0:.1f}s; survivors under {args.workdir} ==")
        return 0

    t0 = time.time()
    pipe = CheckpointedDedupPipeline(
        args.workdir, cfg, id_col=id_col, text_col=args.text_col,
        html_col=args.html_col,
    )
    out = pipe.run(docs)
    n_docs = out["clusters"].count()
    n_survivors = out["survivors"].count()
    wall = time.time() - t0

    lin = pipe.lineage_table().to_pandas()
    print(f"\n== consult_ray dedup run: {n_docs} docs -> "
          f"{n_survivors} survivors in {wall:.1f}s ==")
    for _, r in lin.iterrows():
        mark = "skip" if r["skipped"] else f"{r['wall_s']:.1f}s"
        print(f"  {r['stage']:<13} rows_out={r['rows_out']:<10} {mark}")
    print(f"checkpoints + per-partition lineage under {args.workdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
