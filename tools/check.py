#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 tools/check.py <sfDir> <outDir>

For each <outDir>/<name> parquet dir with an oracle entry in
<outDir>/oracle_sql.json: run the oracle in DuckDB over the sfDir
tables, sort columns by name, sort rows, hash both sides, report
match/mismatch. Dev tooling only — not part of the library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to naive UTC ISO strings for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            s = df[c]
            try:
                s = s.dt.tz_convert(None)
            except Exception:
                pass
            df[c] = s.astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: json.dumps(v, default=str, sort_keys=True)
                if isinstance(v, (list, dict, tuple)) else v)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).lower().startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (a directory of part files), e.g. a
            # ScaleScaffold sf1 dir — DuckDB needs the glob form
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    # several gates deliberately share one oracle (e.g. the four MVT
    # byte-path queries all replay the identical tile-stats SQL) — at
    # sf1 that SQL takes tens of minutes, so cache results by SQL text
    oracle_cache = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"EMPTY-DIR {name}")
            continue
        got = canon(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(got)}")
            continue
        try:
            sql = oracles[name]
            if sql in oracle_cache:
                want = oracle_cache[sql]
            else:
                want = canon(con.sql(sql).df())
                oracle_cache[sql] = want
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:160]}")
            bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA-MISMATCH {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            bad += 1
        elif len(got) != len(want):
            print(f"ROWS-MISMATCH {name}: spark={len(got)} oracle={len(want)}")
            bad += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            cols = [c for c in got.columns if neq[c].any()]
            print(f"VALUE-MISMATCH {name}: cols={cols}")
            for c in cols[:3]:
                i = neq[c].idxmax()
                print(f"    row {i} col {c}: spark={got[c][i]!r} oracle={want[c][i]!r}")
            bad += 1
        else:
            print(f"OK {name}: rows={len(got)}")
            ok += 1
    print(f"\n{ok} ok, {bad} bad")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
