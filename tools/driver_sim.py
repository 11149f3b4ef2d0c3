"""Driver-environment simulation: run the full query registry at the
driver's parallelism (``ray.init(num_cpus=32)``, sf0.01) and compare
SQL-checked entries against their DuckDB oracles.

The round-3 red CORRECTNESS row (``doc_top_terms``) passed every pytest
run because the shared test fixture caps Ray at 4 CPUs; the failure only
appeared at the driver's 32 join partitions. This script is the local
twin of the driver gate so partition-count-dependent failures surface
BEFORE the round artifact does.

Usage: python tools/driver_sim.py [--first N] [--names a,b,c]
Writes /tmp/driver_sim.json and prints one summary line per query.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--first", type=int, default=None,
                    help="only the first N registry entries (driver window)")
    ap.add_argument("--names", type=str, default=None)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import duckdb
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)

    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(queries)
    if args.first:
        names = names[: args.first]
    if args.names:
        names = [n for n in args.names.split(",") if n in queries]

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    failed = []
    for name in names:
        t0 = time.time()
        row: dict = {"sql": name in oracles}
        try:
            res = queries[name](SF_DIR)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            row["rows"] = int(len(df))
            if name in oracles:
                got = _canon(df)
                want = _canon(con.sql(oracles[name]).df())
                row["oracle_rows"] = int(len(want))
                assert list(got.columns) == list(want.columns), (
                    f"columns {list(got.columns)} != {list(want.columns)}"
                )
                assert len(got) == len(want), f"{len(got)} vs {len(want)} rows"
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False,
                    rtol=0, atol=1e-6,
                )
                row["match"] = True
            row["ok"] = True
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            row["ok"] = False
            row["err"] = f"{type(e).__name__}: {e}"
            row["trace"] = traceback.format_exc()[-2000:]
            failed.append(name)
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = "OK " if row["ok"] else "FAIL"
        kind = "sql " if row["sql"] else "rows"
        print(f"{status} {kind} {row['sec']:7.2f}s  {name}", flush=True)

    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failures: {failed}")
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
