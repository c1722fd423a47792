#!/usr/bin/env python3
"""Self-test of tools/check.py's state-cache semantics (VERDICT r16 #1).

The bug class under test: CACHED-OK keyed on the oracle SQL sha alone
would let a Spark-side code change ride a stale green. The fix binds
the cache to a content digest of the Spark result parquet; this test
proves the binding end to end:

  1. fresh run        -> OK, state written with sql_sha + spark_digest
  2. unchanged re-run -> CACHED-OK (oracle not re-run)
  3. one-value Spark-side mutation, SAME oracle -> cache entry is
     REJECTED and the compare runs fresh -> VALUE-MISMATCH (exit 1)
  4. restore the original content -> digest matches the green state
     again -> CACHED-OK (content-identical output is honestly green)
  5. oracle-text change with unchanged output -> cache also rejected

Run: python3 tools/test_check.py   (prints PASS lines; exit 0 = green)
"""
import io, json, os, shutil, sys, tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check  # noqa: E402
import duckdb  # noqa: E402


def run(sf, out, state):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = check.main([sf, out, f"--state={state}", "--lock=no"])
    return rc, buf.getvalue()


def expect(cond, label, detail=""):
    if not cond:
        print(f"FAIL {label}: {detail}")
        sys.exit(1)
    print(f"PASS {label}")


def main():
    root = tempfile.mkdtemp(prefix="graft_checktest_")
    try:
        sf = os.path.join(root, "sf")
        out = os.path.join(root, "out")
        state = os.path.join(root, "state.json")
        os.makedirs(sf)
        qdir = os.path.join(out, "q_t")
        os.makedirs(qdir)
        con = duckdb.connect()
        con.sql("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (2, 20)) "
                "v(k, n)")
        con.sql(f"COPY t TO '{sf}/lineitem.parquet' (FORMAT PARQUET)")
        oracle = ("SELECT k, CAST(sum(n) AS INT) AS s FROM lineitem "
                  "GROUP BY k")
        json.dump({"q_t": oracle}, open(f"{out}/oracle_sql.json", "w"))

        def write_result(rows):
            con.sql("CREATE OR REPLACE TABLE r AS SELECT * FROM (VALUES "
                    + ", ".join(f"({k}, {s})" for k, s in rows)
                    + ") v(k, s)")
            con.sql(f"COPY r TO '{qdir}/part0.parquet' (FORMAT PARQUET)")

        good = [(1, 10), (2, 20)]
        write_result(good)
        rc, log = run(sf, out, state)
        expect(rc == 0 and "OK q_t" in log, "fresh run green", log)
        st = json.load(open(state))
        expect("spark_digest" in st["q_t"],
               "state carries spark_digest", json.dumps(st))

        rc, log = run(sf, out, state)
        expect(rc == 0 and "CACHED-OK q_t" in log
               and "spark_digest=" in log,
               "unchanged re-run is CACHED-OK with digest", log)

        # THE test: mutate ONE value on the Spark side, oracle unchanged
        write_result([(1, 10), (2, 99)])
        rc, log = run(sf, out, state)
        expect("CACHED-OK" not in log and "VALUE-MISMATCH q_t" in log
               and rc == 1,
               "Spark-side mutation invalidates the cache", log)

        write_result(good)
        rc, log = run(sf, out, state)
        expect(rc == 0 and "CACHED-OK q_t" in log,
               "restored content matches the green digest again", log)

        # oracle-side change must also invalidate (the original key)
        json.dump({"q_t": oracle + " ORDER BY k"},
                  open(f"{out}/oracle_sql.json", "w"))
        rc, log = run(sf, out, state)
        expect(rc == 0 and "CACHED-OK" not in log and "OK q_t" in log,
               "oracle-text change invalidates the cache", log)

        # regression guard for the ADVICE r16 re.I fix: a CTE whose
        # self-reference is differently cased must still materialize
        # via the recursive path, not error
        json.dump({"q_t": "WITH c AS (SELECT k, n FROM lineitem UNION "
                          "SELECT k + 10, n FROM C WHERE k < 2) "
                          "SELECT k, CAST(sum(n) AS INT) AS s FROM c "
                          "WHERE k IN (1, 2) GROUP BY k"},
                  open(f"{out}/oracle_sql.json", "w"))
        rc, log = run(sf, out, state)
        expect("ORACLE-ERR" not in log,
               "case-insensitive recursive CTE reference handled", log)
        print("ALL PASS")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
