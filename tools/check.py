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
- `--state FILE` records per-query results keyed by BOTH the oracle's
  sha AND a content digest of the Spark-side result parquet (the same
  canon'd frame the compare hashes) — a re-run skips a query only when
  neither side changed (logged as CACHED-OK with both digests, so a
  resumed sweep log is honest AND a Spark-side code change can never
  ride a stale green; VERDICT r16 #1).
- The connection is file-backed (`--db`) with a memory limit so big
  materializations spill instead of holding tens of GB resident.
- `--lock` (default on when --db is given; --lock=no disables) takes a
  process-exclusive advisory lock on /tmp/graft_disk.lock for the
  whole run — the same POSIX fcntl lock graft.Verify takes for
  sf1-size inputs — so the two ~50 GB disk phases (oracle chain spill
  here, Spark extraction staging there) serialize instead of ENOSPCing
  each other (VERDICT r16 #5; both r16 ENOSPCs were this pair).
- `--max-temp-gb=N` aborts the run (exit 2) when the DuckDB footprint
  (db file + spill dir) exceeds N GB after a materialization, before
  the NEXT one can fill the disk.
"""
import sys, json, glob, os, re, hashlib
import duckdb
import pandas as pd

LOCK_PATH = "/tmp/graft_disk.lock"


def acquire_disk_lock():
    """Blocking process-exclusive advisory lock shared with the Scala
    side (graft.DiskLock uses java.nio FileLock = POSIX fcntl on
    Linux, so fcntl.lockf here — NOT flock(), which lives in a
    separate namespace — is the interoperable choice)."""
    import fcntl
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_WRONLY, 0o666)
    try:
        fcntl.lockf(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        # name the blocker: the holder wrote "why pid=" into the lock
        # file at acquire time, so a stuck wait is attributable
        # without ps archaeology (VERDICT r17 #7)
        try:
            with open(LOCK_PATH) as f:
                holder = f.read().strip() or "unknown holder"
        except OSError:
            holder = "unknown holder"
        print(f"[lock] waiting for {LOCK_PATH} "
              f"(another disk-heavy graft phase is running: {holder})",
              flush=True)
        fcntl.lockf(fd, fcntl.LOCK_EX)
        print("[lock] acquired", flush=True)
    os.write(fd, f"check.py pid={os.getpid()}\n".encode())
    return fd  # held until process exit


class BudgetExceeded(Exception):
    pass

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


def spark_digest(df: pd.DataFrame) -> str:
    """Content digest of a canon'd frame — the state-cache key binding
    the CACHED-OK decision to the Spark-side OUTPUT, not just the
    oracle text. hash_pandas_object over the already-sorted frame is
    deterministic for a given pandas (the driver env is pinned) and
    ~100x faster than to_csv on the 6.35M-row tile gates."""
    h = hashlib.sha1()
    h.update("|".join(map(str, df.columns)).encode())
    h.update(pd.util.hash_pandas_object(df, index=False).values.tobytes())
    return h.hexdigest()


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

    def __init__(self, con, dbfile="", budget_bytes=None):
        self.con = con
        self.live = {}    # name -> running prefix sha materialized
        self.future = {}  # (name, sha) -> pending queries able to reuse
        self.dbfile = dbfile
        self.budget_bytes = budget_bytes

    def _footprint(self) -> int:
        """Current temp-disk footprint: db file + DuckDB spill dir."""
        total = 0
        if self.dbfile and os.path.exists(self.dbfile):
            total += os.path.getsize(self.dbfile)
        for d in (self.dbfile + ".wal", "/tmp/duckdb_spill"):
            if os.path.isfile(d):
                total += os.path.getsize(d)
            elif os.path.isdir(d):
                for root, _, files in os.walk(d):
                    for f in files:
                        try:
                            total += os.path.getsize(os.path.join(root, f))
                        except OSError:
                            pass
        return total

    def _check_budget(self):
        if self.budget_bytes is None:
            return
        used = self._footprint()
        if used > self.budget_bytes:
            raise BudgetExceeded(
                f"temp-disk footprint {used / 1e9:.1f} GB exceeds "
                f"--max-temp-gb={self.budget_bytes / 1e9:.0f} — aborting "
                "before the next materialization can fill the disk")

    @staticmethod
    def chain_of(sql):
        """[(name, body, running_sha)], final_select — or None if the
        query isn't a clean single-level CTE chain."""
        parsed = split_ctes(sql)
        if not parsed:
            return None
        ctes, _recursive, final = parsed
        # DuckDB identifiers resolve case-insensitively, so the
        # shadow/dup guard compares lowercased names
        names = {n.lower() for n, _ in ctes}
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
        # a live table whose refcount just hit 0 (cache-hit / error /
        # final-chain paths never reach run()'s early drop) would
        # otherwise hold its spill until some later chain's stale-drop
        # — tens of GB resident at sf1 (ADVICE r16)
        self.reap()

    def reap(self):
        """Drop live tables no pending query can reuse."""
        for n in [n for n, sha in self.live.items()
                  if not self.future.get((n, sha), 0)]:
            self._drop(n)

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
                # reference scans are case-INSENSITIVE to match DuckDB
                # identifier resolution (ADVICE r16): a differently-cased
                # self-reference is still recursive, and a differently-
                # cased later reference must still block the early drop
                if re.search(rf"\b{re.escape(name)}\b", body, re.I):
                    # self-referential (recursive) CTE — materialize result
                    self.con.sql(
                        f'CREATE TEMP TABLE "{name}" AS WITH RECURSIVE '
                        f'"{name}" AS ({body}) SELECT * FROM "{name}"')
                else:
                    self.con.sql(f'CREATE TEMP TABLE "{name}" AS {body}')
                self.live[name] = ph
                self._check_budget()
            # early drop: anything the REST of this chain and the final
            # select no longer reference, and no OTHER pending query can
            # reuse (refcount 1 = only the query being run right now)
            rest = " ".join(b for _, b, _ in chain[idx + 1:]) + " " + final
            for n2 in [n for n in self.live if n != name]:
                if re.search(rf"\b{re.escape(n2)}\b", rest, re.I):
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
    # disk-heavy runs (file-backed = sf1-size sweeps) serialize against
    # Spark's disk-heavy phases via the shared advisory lock; --lock
    # forces it on for an in-memory run, --lock=no opts out
    want_lock = opts.get("--lock", "yes" if dbfile else "no")
    if want_lock != "no":
        acquire_disk_lock()
    con = duckdb.connect(dbfile) if dbfile else duckdb.connect()
    if "--mem" in opts:
        con.sql(f"SET memory_limit='{opts['--mem']}'")
        con.sql("SET temp_directory='/tmp/duckdb_spill'")
        # Row order is irrelevant (canon sorts) and ordered
        # materialization of the big chain tables costs memory/spill.
        # CONSTRAINT this relies on (ADVICE r16): every oracle LIMIT
        # must sit under an ORDER BY whose keys are row-unique (all 13
        # current LIMIT oracles tie-break on a group key / id column —
        # audited 2026-08-16), otherwise which ties survive the LIMIT
        # becomes nondeterministic under unordered materialization.
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
    budget = (float(opts["--max-temp-gb"]) * 1e9
              if "--max-temp-gb" in opts else None)
    mat = Materializer(con, dbfile=dbfile, budget_bytes=budget)
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
    def read_spark(d):
        return canon(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())

    def cache_valid(name, sha):
        """OK under the SAME oracle sha AND the SAME Spark output digest
        — the digest requires reading the parquet, so it is computed
        once here and memoized for the compare loop."""
        prev = state.get(name)
        if not (prev and prev.get("sql_sha") == sha
                and prev.get("status") == "OK"):
            return False
        if name not in digests:
            d = os.path.join(out_dir, name)
            digests[name] = spark_digest(read_spark(d))
        return prev.get("spark_digest") == digests[name]

    digests = {}  # name -> Spark-side content digest, computed once
    live_sqls = []  # names that will actually run an oracle
    for name, d in pending:
        sql = oracles.get(name)
        if sql is None or not glob.glob(f"{d}/*.parquet"):
            continue
        sha = hashlib.sha1(sql.encode()).hexdigest()
        if cache_valid(name, sha):
            continue
        mat.register(sql)
        live_sqls.append(name)
    for name, d in pending:
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"EMPTY-DIR {name}", flush=True)
            continue
        if name not in oracles:
            got = read_spark(d)
            print(f"ROWS-ONLY {name}: rows={len(got)}", flush=True)
            continue
        sql = oracles[name]
        sha = hashlib.sha1(sql.encode()).hexdigest()
        if cache_valid(name, sha):
            print(f"CACHED-OK {name}: rows={state[name].get('rows')} "
                  f"sql_sha={sha[:12]} spark_digest={digests[name][:12]}",
                  flush=True)
            cached += 1
            continue
        got = read_spark(d)
        dg = digests.get(name) or spark_digest(got)
        try:
            if sql in oracle_cache:
                want = oracle_cache[sql]
            else:
                want = canon(mat.run(sql))
                oracle_cache[sql] = want
        except BudgetExceeded as e:
            print(f"ABORT {name}: {e}", flush=True)
            return 2
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
                               "rows": len(got), "spark_digest": dg}
                json.dump(state, open(state_path, "w"))
    mat.reap()  # end-of-run cleanup: nothing pending can reuse anything
    extra = f" ({cached} cached)" if cached else ""
    print(f"\n{ok + cached} ok, {bad} bad{extra}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
