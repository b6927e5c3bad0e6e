"""Local replica of the driver's t2 correctness gate.

Runs every registry query on Spark at the given sf dir, runs its DuckDB
oracle on the same parquet files, and compares row count, schema
(column names sorted), and values order-insensitively.  Exact compare
for non-floats; floats compared with tiny tolerance but reported, since
the driver hashes values (we engineer queries so floats are either
pass-through or exact decimals).

Usage: python tools/check_oracle.py [sf_dir] [query ...] [--json PATH]

``--json PATH`` additionally writes a machine-readable artifact in the
driver's CORRECTNESS_r{N}.json shape (rows_match / schema_match /
hash_match / spark_rows / oracle_rows / err per key) so each round can
ship proof for the keys the driver's bounded window misses —
`ORACLE_LOCAL_r{N}.json` at the repo root by convention.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for cross-engine compare
    def canon(v):
        if isinstance(v, float):
            return round(v, 9)
        if type(v).__name__ == "date":  # datetime.date (Spark DATE cols)
            return pd.Timestamp(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, canon(x)) for k, x in v.items()))
        return v

    out = df.map(canon)
    out = out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )
    return out


def compare(name: str, spark_df, con) -> tuple[bool, str, float, dict]:
    """Returns (ok, message, spark_seconds, record) where record is one
    entry in the driver's CORRECTNESS_r{N}.json shape."""
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import REGISTRY

    spec = REGISTRY[name]
    rec = {
        "rows_match": False, "schema_match": False, "hash_match": False,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    t0 = time.time()
    sp = spark_df.toPandas()
    spark_sec = time.time() - t0
    rec["spark_rows"] = len(sp)
    if spec.oracle is None:
        # rows-only key that executed: NO oracle comparison occurred,
        # so every *_match field stays null — "match" is reserved for
        # actual comparisons (a consumer summing rows_match must not
        # count an unverified key as a verified pass).  `executed`
        # plus err="no_oracle" carry the rows-only outcome.
        rec.update(
            rows_match=None,
            schema_match=None,
            hash_match=None,
            executed=True,
            err="no_oracle",
        )
        return len(sp) >= 0, f"rows-only: {len(sp)} rows", spark_sec, rec
    du = con.sql(spec.oracle).df()
    rec["oracle_rows"] = len(du)
    if sorted(sp.columns) != sorted(du.columns):
        rec["rows_match"] = len(sp) == len(du)
        rec["err"] = "schema_mismatch"
        return False, f"SCHEMA spark={sorted(sp.columns)} duck={sorted(du.columns)}", spark_sec, rec
    rec["schema_match"] = True
    if len(sp) != len(du):
        rec["err"] = "rowcount_mismatch"
        return False, f"ROWCOUNT spark={len(sp)} duck={len(du)}", spark_sec, rec
    rec["rows_match"] = True
    nsp, ndu = normalize(sp), normalize(du.astype(sp.dtypes.to_dict(), errors="ignore"))
    try:
        pd.testing.assert_frame_equal(nsp, ndu, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
    except AssertionError as e:
        rec["err"] = "values_mismatch"
        return False, "VALUES " + str(e).split("\n")[0] + repr([nsp.head(3), ndu.head(3)]), spark_sec, rec
    rec["hash_match"] = True
    return True, f"{len(sp)} rows", spark_sec, rec


def main() -> int:
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [sf_dir] [query ...] --json PATH")
            return 2
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    from kafka_connect_postgres_to_clickhouse_spark.plans.registry import (
        load_all_queries,
    )
    from kafka_connect_postgres_to_clickhouse_spark.session import get_spark

    registry = load_all_queries()
    only = argv[1:]
    spark = get_spark("check-oracle")
    con = duck_con(sf_dir)
    failed = []
    records: dict[str, dict] = {}
    for name, spec in registry.items():
        if only and name not in only:
            continue
        try:
            ok, msg, sec, rec = compare(name, spec.fn(spark, sf_dir), con)
        except Exception:
            ok, msg, sec = False, "EXC " + traceback.format_exc(limit=10), 0.0
            rec = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": "exception: " + traceback.format_exc(limit=3)[-400:],
            }
        records[name] = rec
        status = "ok " if ok else "FAIL"
        print(f"{status} {name:28s} {sec:6.2f}s  {msg[:900]}")
        if not ok:
            failed.append(name)
    print(f"\n{len(failed)} failed of {len([n for n in registry if not only or n in only])}")
    if failed:
        print("failed:", " ".join(failed))
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(records, f, indent=1)
        print(f"wrote {json_path} ({len(records)} keys)")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
