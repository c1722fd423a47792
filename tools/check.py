#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 tools/check.py <sfDir> <outDir> [--state FILE] [--only a,b]
          [--db FILE] [--mem 48GB]

For each <outDir>/<name> parquet dir with an oracle entry in
<outDir>/oracle_sql.json: run the oracle in DuckDB over the sfDir
tables, sort columns by name, sort rows, hash both sides, report
match/mismatch. Dev tooling only — not part of the library.

Scale plumbing (the sf1 sweep's 45-min oracles):
- Each oracle's top-level CTE chain is MATERIALIZED into DuckDB temp
  tables, keyed by the sha of the chain prefix up to and including the
  CTE — so (a) a single-use CTE chain (unrolled closure steps) stops
  being inlined exponentially, and (b) queries sharing a CTE prefix
  (the six tile gates replay one feature pipeline) compute it ONCE.
  Before each query, temp tables whose names are not in ITS chain are
  dropped, so a query can never silently read another query's CTE.
- `--state FILE` records per-query results keyed by the oracle's sha;
  a re-run skips queries already green under the same SQL (logged as
  CACHED-OK so a resumed sweep log is honest about what re-ran).
- The connection is file-backed (`--db`) with a memory limit so big
  materializations spill instead of holding tens of GB resident.
"""
import sys, json, glob, os, re, hashlib
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


def split_ctes(sql):
    """Parse `WITH [RECURSIVE] n1 AS [MATERIALIZED] (b1), ... SELECT ...`
    into ([(name, body)], recursive, final_select). Returns None when the
    text isn't a single top-level WITH chain (then run it as-is)."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", sql, re.I)
    if not m:
        return None
    recursive = bool(m.group(1))
    i, n = m.end(), len(sql)
    ctes = []
    while True:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s+(MATERIALIZED\s+)?\(",
                     sql[i:], re.I)
        if not m:
            return None
        name = m.group(1)
        j = i + m.end()  # char after the opening paren
        depth, q = 1, None
        while depth > 0 and j < n:
            c = sql[j]
            if q:
                if c == q:
                    q = None
            elif c == "'":
                q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth != 0:
            return None
        ctes.append((name, sql[i + m.end():j - 1]))
        m2 = re.match(r"\s*,", sql[j:])
        if m2:
            i = j + m2.end()
            continue
        return ctes, recursive, sql[j:]


class Materializer:
    """Temp-table CTE materialization with prefix-hash reuse.

    Disk-bounded (sf1-size chains spill tens of GB per table):
    - Queries should be processed grouped by shared chain prefix
      (`group_key`), so prefix-sharers run consecutively and the
      hygiene drop between unrelated queries can't discard a prefix
      that the next query would rebuild from scratch.
    - `register`/`unregister` maintain a refcount of still-pending
      queries per (name, running-sha); once a chain table is no longer
      referenced by the rest of ITS chain nor reusable by any pending
      query, it is dropped IMMEDIATELY, so peak temp-disk is the live
      frontier of the chain, not the whole chain.
    """

    def __init__(self, con):
        self.con = con
        self.live = {}    # name -> running prefix sha materialized
        self.future = {}  # (name, sha) -> pending queries able to reuse

    @staticmethod
    def chain_of(sql):
        """[(name, body, running_sha)], final_select — or None if the
        query isn't a clean single-level CTE chain."""
        parsed = split_ctes(sql)
        if not parsed:
            return None
        ctes, _recursive, final = parsed
        names = {n for n, _ in ctes}
        if names & set(TABLES) or len(names) != len(ctes):
            return None  # shadowing/dup — run as-is
        h = hashlib.sha1()
        out = []
        for name, body in ctes:
            h.update(name.encode())
            h.update(body.encode())
            out.append((name, body, h.hexdigest()))
        return out, final

    def group_key(self, sql):
        """Sort key clustering queries that share a chain prefix."""
        c = self.chain_of(sql)
        return c[0][0][2] if c else ""

    def register(self, sql):
        c = self.chain_of(sql)
        if not c:
            return
        for name, _, sha in c[0]:
            self.future[(name, sha)] = self.future.get((name, sha), 0) + 1

    def unregister(self, sql):
        c = self.chain_of(sql)
        if not c:
            return
        for name, _, sha in c[0]:
            k = (name, sha)
            if k in self.future:
                self.future[k] -= 1
                if not self.future[k]:
                    del self.future[k]

    def _drop(self, name):
        self.con.sql(f'DROP TABLE IF EXISTS "{name}"')
        del self.live[name]

    def run(self, sql):
        c = self.chain_of(sql)
        if not c:
            return self.con.sql(sql).df()
        chain, final = c
        names = {n for n, _, _ in chain}
        # drop anything this query doesn't define, so it can never read
        # another query's CTE by accident
        for stale in [n for n in self.live if n not in names]:
            self._drop(stale)
        invalidated = False
        for idx, (name, body, ph) in enumerate(chain):
            if invalidated or self.live.get(name) != ph:
                # once one table in the chain is rebuilt, everything
                # after it depends on it and must be rebuilt too
                invalidated = True
                self.con.sql(f'DROP TABLE IF EXISTS "{name}"')
                if re.search(rf"\b{re.escape(name)}\b", body):
                    # self-referential (recursive) CTE — materialize result
                    self.con.sql(
                        f'CREATE TEMP TABLE "{name}" AS WITH RECURSIVE '
                        f'"{name}" AS ({body}) SELECT * FROM "{name}"')
                else:
                    self.con.sql(f'CREATE TEMP TABLE "{name}" AS {body}')
                self.live[name] = ph
            # early drop: anything the REST of this chain and the final
            # select no longer reference, and no OTHER pending query can
            # reuse (refcount 1 = only the query being run right now)
            rest = " ".join(b for _, b, _ in chain[idx + 1:]) + " " + final
            for n2 in [n for n in self.live if n != name]:
                if re.search(rf"\b{re.escape(n2)}\b", rest):
                    continue
                if self.future.get((n2, self.live[n2]), 0) > 1:
                    continue
                self._drop(n2)
        return self.con.sql(final).df()


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    opts = dict(a.split("=", 1) if "=" in a else (a, "")
                for a in argv if a.startswith("--"))
    sf_dir, out_dir = args[0], args[1]
    state_path = opts.get("--state")
    only = set(opts["--only"].split(",")) if "--only" in opts else None
    dbfile = opts.get("--db", "")
    con = duckdb.connect(dbfile) if dbfile else duckdb.connect()
    if "--mem" in opts:
        con.sql(f"SET memory_limit='{opts['--mem']}'")
        con.sql("SET temp_directory='/tmp/duckdb_spill'")
        # row order is irrelevant (canon sorts) and ordered
        # materialization of the big chain tables costs memory/spill
        con.sql("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (a directory of part files), e.g. a
            # ScaleScaffold sf1 dir — DuckDB needs the glob form
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    state = {}
    if state_path and os.path.exists(state_path):
        state = json.load(open(state_path))
    mat = Materializer(con)
    ok = bad = cached = 0
    # several gates deliberately share one oracle (e.g. the MVT byte-path
    # queries all replay the identical tile-stats SQL) — cache by SQL text
    oracle_cache = {}
    # Processing ORDER: cluster queries sharing a chain prefix so the
    # materialized prefix is built once and reused consecutively —
    # alphabetical order interleaves unrelated queries between the six
    # tile gates, and the hygiene drop would discard (then recompute) a
    # prefix that spills tens of GB at sf1-size. Ties break by name so
    # the order stays deterministic.
    pending = []
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        pending.append((name, d))
    pending.sort(key=lambda nd: (
        mat.group_key(oracles.get(nd[0], "")), nd[0]))
    live_sqls = []  # (name, sql) that will actually run an oracle
    for name, d in pending:
        sql = oracles.get(name)
        if sql is None or not glob.glob(f"{d}/*.parquet"):
            continue
        sha = hashlib.sha1(sql.encode()).hexdigest()
        prev = state.get(name)
        if prev and prev.get("sql_sha") == sha and prev.get("status") == "OK":
            continue
        mat.register(sql)
        live_sqls.append(name)
    for name, d in pending:
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"EMPTY-DIR {name}", flush=True)
            continue
        if name not in oracles:
            got = canon(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
            print(f"ROWS-ONLY {name}: rows={len(got)}", flush=True)
            continue
        sql = oracles[name]
        sha = hashlib.sha1(sql.encode()).hexdigest()
        prev = state.get(name)
        if prev and prev.get("sql_sha") == sha and prev.get("status") == "OK":
            print(f"CACHED-OK {name}: rows={prev.get('rows')}", flush=True)
            cached += 1
            continue
        got = canon(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
        try:
            if sql in oracle_cache:
                want = oracle_cache[sql]
            else:
                want = canon(mat.run(sql))
                oracle_cache[sql] = want
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e).splitlines()[0][:160]}",
                  flush=True)
            bad += 1
            continue
        finally:
            # refcount covers PENDING queries: this one is done (any
            # outcome), so its claim on shared prefix tables lapses
            if name in live_sqls:
                mat.unregister(sql)
                live_sqls.remove(name)
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA-MISMATCH {name}: spark={list(got.columns)} "
                  f"oracle={list(want.columns)}", flush=True)
            bad += 1
        elif len(got) != len(want):
            print(f"ROWS-MISMATCH {name}: spark={len(got)} oracle={len(want)}",
                  flush=True)
            bad += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            cols = [c for c in got.columns if neq[c].any()]
            print(f"VALUE-MISMATCH {name}: cols={cols}", flush=True)
            for c in cols[:3]:
                i = neq[c].idxmax()
                print(f"    row {i} col {c}: spark={got[c][i]!r} "
                      f"oracle={want[c][i]!r}", flush=True)
            bad += 1
        else:
            print(f"OK {name}: rows={len(got)}", flush=True)
            ok += 1
            if state_path is not None:
                state[name] = {"sql_sha": sha, "status": "OK",
                               "rows": len(got)}
                json.dump(state, open(state_path, "w"))
    extra = f" ({cached} cached)" if cached else ""
    print(f"\n{ok + cached} ok, {bad} bad{extra}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
