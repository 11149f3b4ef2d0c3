"""Checkpointed, resumable end-to-end dedup pipeline with per-stage
lineage/metrics records.

The reference has NO fault tolerance — any failure restarts the binary
(SURVEY §4; the only guard is the refuse-to-overwrite mkdir at
/root/reference/main_map.cpp:361-372). The north_rule requires the
opposite: every stage boundary is a Parquet checkpoint directory committed via
the rename-free manifest protocol (state/fsio.py — works on object
stores) with a _SUCCESS marker, a rerun skips
completed stages, and every stage appends lineage rows
(stage, rows_out, wall_s, ...) to <workdir>/lineage/.

Stage graph (each node a checkpoint):
    fingerprints/  -> bands/ -> edges/ -> labels/ -> clusters/

At 100 TB each checkpoint is a partitioned parquet directory (one file
per block), so resume skips whole completed STAGES; finer-grained
per-partition resume is achieved by running the pipeline per input shard
(the intended ray-job layout: one workdir per input partition range).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset

from consult_ray.config import PipelineConfig
from consult_ray.pipelines import cluster as cluster_mod
from consult_ray.pipelines import dedup as dedup_mod
from consult_ray.state import fsio

_SUCCESS = "_SUCCESS"
_MANIFEST = "_manifest.json"


def _is_complete(path: str) -> bool:
    fs, root = fsio.resolve_fs(path)
    return fsio.exists(fs, fsio.join(root, _SUCCESS)) and fsio.exists(
        fs, fsio.join(root, _MANIFEST)
    )


def _write_checkpoint(ds: Dataset, path: str) -> tuple[int, list[dict]]:
    """Rename-free checkpoint commit (manifest protocol, state/fsio.py):
    the dataset writes straight into a generation-unique data dir, the
    _manifest.json PUT names it (object-store-atomic commit point), and
    the _SUCCESS marker lands last. A crash at any point leaves either
    no marker (stage reruns into a fresh generation) or the previous
    complete snapshot; superseded generations are GC'd best-effort.
    Returns (total rows, per-partition records) — one record per output
    parquet file (= one per block), the north_rule's per-partition
    lineage."""
    fs, root = fsio.resolve_fs(path)
    fsio.mkdirs(fs, root)
    try:  # the generation the prior commit pointed at, if any
        prev_gen = fsio.read_json(fs, fsio.join(root, _MANIFEST)).get("data")
    except Exception:
        prev_gen = None
    gen = f"data-{uuid.uuid4().hex[:8]}"
    data_dir = fsio.join(root, gen)
    ds.write_parquet(data_dir, filesystem=fs)
    if not any(
        f.endswith(".parquet") for f in fsio.list_files(fs, data_dir)
    ):
        # an EMPTY dataset writes zero files (and possibly no dir): a
        # manifest naming a fileless generation would crash readback, so
        # persist one explicit 0-row parquet carrying the schema (a
        # schema-less empty stage — e.g. edges on an all-unique corpus —
        # degrades to a 0-column file; downstream handles empty inputs)
        schema = ds.schema(fetch_if_missing=True)
        arrow_schema = getattr(schema, "base_schema", None) or pa.schema([])
        fsio.mkdirs(fs, data_dir)
        with fs.open_output_stream(fsio.join(data_dir, "empty.parquet")) as out:
            pq.write_table(arrow_schema.empty_table(), out)
    parts = []
    for f in fsio.list_files(fs, data_dir):
        if not f.endswith(".parquet"):
            continue
        fp = fsio.join(data_dir, f)
        md = pq.ParquetFile(fs.open_input_file(fp)).metadata
        parts.append({
            "file": f,
            "rows": int(md.num_rows),
            "bytes": int(fs.get_file_info(fp).size),
        })
    fsio.write_json(fs, fsio.join(root, _MANIFEST), {"data": gen, "files": parts})
    fsio.write_marker(fs, fsio.join(root, _SUCCESS), str(time.time()))
    # GC superseded generations (crashed or replaced writes) — but keep
    # the immediate predecessor for one commit, per the fsio protocol:
    # readers that resolved the prior manifest stay valid until the NEXT
    # rewrite (library._commit_manifest keeps the same retention)
    try:
        infos = fs.get_file_info(pafs.FileSelector(root, recursive=False))
        keep = {gen, prev_gen}
        for i in infos:
            base = os.path.basename(i.path)
            if (
                i.type == pafs.FileType.Directory
                and base.startswith("data-")
                and base not in keep
            ):
                fs.delete_dir(i.path)
    except Exception:
        pass
    return sum(p["rows"] for p in parts), parts


def _read_checkpoint(path: str) -> Dataset:
    """Open the committed snapshot via its manifest."""
    fs, root = fsio.resolve_fs(path)
    meta = fsio.read_json(fs, fsio.join(root, _MANIFEST))
    return rd.read_parquet(fsio.join(root, meta["data"]), filesystem=fs)


class CheckpointedDedupPipeline:
    """Run (or resume) the flagship dedup pipeline against a docs source.

    Stages run only if their checkpoint is missing; each run appends
    lineage rows. `run()` returns a dict of output dataset handles.
    """

    STAGES = ("fingerprints", "bands", "edges", "labels", "clusters",
              "substring", "survivors")

    def __init__(self, workdir: str, cfg: PipelineConfig | None = None,
                 id_col: str = "doc_id", text_col: str = "text",
                 html_col: str | None = None):
        """html_col: when set, the input carries raw html bytes and the
        pipeline's FIRST stage runs the pinned extract_text function
        (north_rule's byte-identical-per-url invariant,
        functions/textnorm.py) producing text_col, with its own
        checkpoint + lineage row."""
        self.workdir = workdir
        self.cfg = cfg or PipelineConfig()
        self.id_col = id_col
        self.text_col = text_col
        self.html_col = html_col
        self.stages = (("extract",) if html_col else ()) + self.STAGES
        os.makedirs(workdir, exist_ok=True)
        os.makedirs(os.path.join(workdir, "lineage"), exist_ok=True)

    # --- lineage -----------------------------------------------------
    def _lineage(self, stage: str, rows_out: int, wall_s: float,
                 skipped: bool = False, extra: dict | None = None) -> None:
        rec = {
            "stage": stage,
            "rows_out": int(rows_out),
            "wall_s": round(float(wall_s), 4),
            "skipped": bool(skipped),
            "ts": time.time(),
            "checkpoint_path": os.path.join(self.workdir, stage),
            **(extra or {}),
        }
        fname = os.path.join(self.workdir, "lineage", f"{stage}-{uuid.uuid4().hex[:8]}.json")
        with open(fname, "w") as f:
            json.dump(rec, f)

    def lineage_table(self) -> pa.Table:
        recs = []
        ldir = os.path.join(self.workdir, "lineage")
        for f in sorted(os.listdir(ldir)):
            if f.endswith(".json"):
                with open(os.path.join(ldir, f)) as fh:
                    recs.append(json.load(fh))
        if not recs:
            return pa.table({"stage": pa.array([], pa.string())})
        keys = ["stage", "rows_out", "wall_s", "skipped", "ts", "checkpoint_path"]
        return pa.table({k: pa.array([r.get(k) for r in recs]) for k in keys})

    def partition_lineage_table(self) -> pa.Table:
        """Per-partition lineage rows (stage, partition_id, file, rows,
        bytes) — one per checkpoint parquet file."""
        recs = []
        ldir = os.path.join(self.workdir, "lineage")
        for f in sorted(os.listdir(ldir)):
            if f.endswith(".partitions.jsonl"):
                with open(os.path.join(ldir, f)) as fh:
                    recs.extend(json.loads(line) for line in fh if line.strip())
        if not recs:
            return pa.table({"stage": pa.array([], pa.string())})
        keys = ["stage", "partition_id", "file", "rows", "bytes"]
        return pa.table({k: pa.array([r.get(k) for r in recs]) for k in keys})

    # --- stages ------------------------------------------------------
    def _ckpt(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _run_stage(self, stage: str, build_fn) -> Dataset:
        path = self._ckpt(stage)
        if _is_complete(path):
            self._lineage(stage, -1, 0.0, skipped=True)
            return _read_checkpoint(path)
        t0 = time.time()
        ds, extra = build_fn()
        rows, parts = _write_checkpoint(ds, path)
        self._lineage(stage, rows, time.time() - t0, extra=extra)
        # per-partition lineage: one JSONL line per output parquet file
        pfile = os.path.join(self.workdir, "lineage",
                             f"{stage}-{uuid.uuid4().hex[:8]}.partitions.jsonl")
        with open(pfile, "w") as f:
            for i, p in enumerate(parts):
                f.write(json.dumps({"stage": stage, "partition_id": i, **p}) + "\n")
        return _read_checkpoint(path)

    def run(self, docs: Dataset) -> dict[str, Dataset]:
        cfg = self.cfg
        outputs: dict[str, Dataset] = {}

        if self.html_col:
            from consult_ray.functions.textnorm import extract_text_column

            html_col, id_col, text_col = self.html_col, self.id_col, self.text_col

            def extract(batch: pa.Table) -> pa.Table:
                return pa.table({
                    id_col: batch[id_col],
                    text_col: extract_text_column(batch[html_col].combine_chunks()),
                })

            docs = self._run_stage(
                "extract",
                lambda: (docs.map_batches(extract, batch_format="pyarrow"), {}),
            )
            outputs["extract"] = docs

        fp = self._run_stage(
            "fingerprints",
            lambda: (dedup_mod.fingerprints(docs, cfg, text_col=self.text_col,
                                            id_col=self.id_col), {}),
        )

        bands = self._run_stage(
            "bands", lambda: (dedup_mod.band_rows(fp, cfg), {})
        )

        def build_edges():
            capped, cstats = dedup_mod.capped_band_rows(bands, cfg)
            edges = dedup_mod.candidate_edges(capped, cfg)
            edges = dedup_mod.pair_count_threshold(edges, cfg)
            return edges, cstats

        edges = self._run_stage("edges", build_edges)

        labels = self._run_stage(
            "labels",
            lambda: (cluster_mod.connected_components(
                edges, cfg,
                checkpoint_dir=os.path.join(self.workdir, "cc_rounds"),
            ), {}),
        )

        clusters = self._run_stage(
            "clusters",
            lambda: (cluster_mod.assign_clusters(docs, labels, cfg, id_col=self.id_col), {}),
        )

        def build_substring():
            # broadcast-label routing: the text-bearing doc table never
            # joins; singleton docs bypass the text shuffle entirely
            # (stages/substring.py::substring_stage)
            from consult_ray.stages.substring import substring_stage

            return substring_stage(
                docs, labels, cfg, text_col=self.text_col, id_col=self.id_col
            ), {}

        substring = self._run_stage("substring", build_substring)

        def build_survivors():
            # survivor = MIN doc_id among the cluster's non-substring-
            # dropped members. NOT "doc_id == cluster_id": the cluster
            # label is the min member id, and that member may itself be a
            # proper substring of a larger member (_drop_contained drops
            # the contained doc regardless of id) — requiring the label to
            # survive would silently emit zero survivors for such clusters.
            # Per-batch min pre-agg, then ONE partition-kernel min —
            # cluster cardinality scales with the corpus, and the
            # native groupby.aggregate pays per-distinct-key (58x at
            # 2.6M keys; util.partitioned_group_min docstring).
            id_col = self.id_col

            def partial(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                from consult_ray.util import grouped

                alive = batch.filter(pc.invert(batch["substring_dropped"]))
                return grouped(
                    alive.select(["cluster_id", id_col]),
                    ["cluster_id"], [(id_col, "min")], [id_col],
                )

            from consult_ray.util import partitioned_group_min, resolve_join_partitions

            agg = partitioned_group_min(
                substring.map_batches(partial, batch_format="pyarrow"),
                "cluster_id", id_col, resolve_join_partitions(cfg),
            )
            return agg.select_columns([self.id_col, "cluster_id"]), {}

        survivors = self._run_stage("survivors", build_survivors)

        outputs.update({
            "fingerprints": fp,
            "bands": bands,
            "edges": edges,
            "labels": labels,
            "clusters": clusters,
            "substring": substring,
            "survivors": survivors,
            "lineage": rd.from_arrow(self.lineage_table()),
        })
        return outputs
