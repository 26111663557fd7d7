#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: run each
oracle SQL in DuckDB over the sf parquet tables, compare (schema-insensitive:
columns sorted by name, rows sorted) against the Verify.scala parquet dumps.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [jsonOut]

Load-awareness (the r14 bench lesson applied to this gate): the r15 round
lost 12 rows to DuckDB OutOfMemoryException because the checker ran beside
a 36-minute bench JVM. Now the checker (a) refuses to start while another
graft JVM is live, backing off up to WAIT_MAX seconds, and (b) stamps
loadavg + JVM count into the JSON artifact so a contended run adjudicates
itself from data.
"""
import sys, json, math, glob, os, time
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]
# refuse-and-back-off window for a live graft JVM; env-overridable so an
# operator who KNOWS the other JVM is unrelated can shorten the wait
WAIT_MAX = int(os.environ.get("GRAFT_CHECK_WAIT_MAX", "1800"))
WAIT_STEP = 30
REPO_DIR = os.path.realpath(os.path.join(os.path.dirname(__file__), ".."))


def graft_jvms():
    """Pids of live JVMs that belong to THIS repo (sbt, Bench, Verify...).

    /proc scan, no external tools. Scoped to the repo (cmdline mentions the
    repo path, or the process cwd is inside it) so an unrelated sbt server
    elsewhere on the host doesn't stall this gate for WAIT_MAX seconds.
    """
    pids = []
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode("utf-8", "replace")
        except OSError:
            continue
        if "java" not in cmd:
            continue
        try:
            cwd = os.path.realpath(f"/proc/{p}/cwd")
        except OSError:
            cwd = ""
        in_repo = REPO_DIR in cmd or cwd.startswith(REPO_DIR)
        if in_repo and ("graft" in cmd or "sbt" in cmd.lower()):
            pids.append(int(p))
    return pids


def mem_limit_mb():
    """75% of currently-available RAM, floored at 1 GiB: big enough for
    every oracle, small enough that DuckDB spills to temp_directory instead
    of dying with 'Failed to allocate block' under host pressure (the
    r15/r16 q_bpe_sample_agreement failure mode)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return max(1024, int(line.split()[1]) * 3 // 4 // 1024)
    except OSError:
        pass
    return 8192


def steal_ticks():
    """Cumulative hypervisor-steal ticks (/proc/stat cpu field 8) — the
    uniform-slowdown contention mode loadavg can't see (r17); the start/end
    stamps let a reader compute the run's stolen CPU-seconds (delta/100).
    -1 when unavailable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if parts[:1] == ["cpu"] and len(parts) > 8 else -1
    except (OSError, ValueError, IndexError):
        return -1


def load_markers():
    la1, la5, la15 = os.getloadavg()
    return {"loadavg_1m": round(la1, 2), "loadavg_5m": round(la5, 2),
            "loadavg_15m": round(la15, 2), "graft_jvms": len(graft_jvms()),
            "steal_ticks": steal_ticks()}


def connect_views(sfdir):
    c = duckdb.connect()
    # Cap memory + give a spill directory: an oracle that exceeds the cap
    # spills and slows down instead of OutOfMemoryException-ing the row.
    c.execute(f"PRAGMA memory_limit='{mem_limit_mb()}MB'")
    c.execute("PRAGMA temp_directory='/tmp/graft_duckdb_spill'")
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return c


def canon(df):
    # Dataframe-based on purpose: the driver compares pandas dataframes, so
    # DuckDB's HUGEINT surfaces as float64 here exactly as it does there
    # ("1000.0" vs "1000"). fetchall() would mask that class of oracle typing
    # bug (HUGEINT -> Python int -> str identical to Spark's int64).
    df = df[sorted(df.columns)]
    out = []
    for r in df.itertuples(index=False):
        rr = []
        for v in r:
            if isinstance(v, float):
                v = round(v, 9)
            rr.append(str(v))
        out.append("|".join(rr))
    return sorted(out)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    json_out = sys.argv[3] if len(sys.argv) > 3 else None

    waited = 0
    while True:
        jvms = graft_jvms()
        if not jvms:
            break
        if waited >= WAIT_MAX:
            print(f"WARN: proceeding after {waited}s with graft JVMs still "
                  f"live ({jvms}) — results may carry contention flakes")
            break
        print(f"BUSY: graft JVM(s) live {jvms}; backing off {WAIT_STEP}s "
              f"({waited}/{WAIT_MAX})", flush=True)
        time.sleep(WAIT_STEP)
        waited += WAIT_STEP
    markers_start = load_markers()

    con = connect_views(sfdir)
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}

    fail = ok = 0
    for name in sorted(oracle):
        res_dir = f"{outdir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"MISSING  {name} (no verify output)")
            results[name] = {"err": "no verify output"}; fail += 1; continue
        try:
            # Transient host-memory pressure surfaces as tiny-block
            # allocation failures on queries that pass standalone. The
            # r15 lesson (12 rows lost to a contended checker) plus the
            # r16 rerun (1 row lost even serially, right after the Verify
            # JVM exited): retry on a FRESH connection with growing
            # pauses so the page cache / allocator pressure drains. The
            # fresh connection also replaces `con` for the rest of the
            # loop — the failed allocation may have poisoned the old one.
            # A real memory blow-up fails identically on every attempt.
            for attempt in range(4):
                try:
                    gdf = con.execute(
                        f"SELECT * FROM '{res_dir}/*.parquet'").df()
                    wdf = con.execute(oracle[name]).df()
                    if attempt:
                        print(f"RETRY-OK {name}: transient DuckDB "
                              f"allocation failure, clean on attempt "
                              f"{attempt + 1}")
                    break
                except duckdb.OutOfMemoryException:
                    if attempt == 3:
                        raise
                    time.sleep(10 * (attempt + 1))
                    con = connect_views(sfdir)
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            results[name] = {"err": str(e)[:400]}; fail += 1; continue
        row = {"spark_rows": len(gdf), "oracle_rows": len(wdf),
               "rows_match": len(gdf) == len(wdf),
               "schema_match": sorted(gdf.columns) == sorted(wdf.columns),
               "hash_match": False, "err": None}
        if not row["schema_match"]:
            print(f"SCHEMA   {name}: got {sorted(gdf.columns)} "
                  f"want {sorted(wdf.columns)}")
            results[name] = row; fail += 1; continue
        cg, cw = canon(gdf), canon(wdf)
        row["hash_match"] = cg == cw
        results[name] = row
        if cg == cw:
            print(f"OK       {name} ({len(cg)} rows)"); ok += 1
        else:
            print(f"MISMATCH {name}: {len(cg)} vs {len(cw)} rows")
            gs, ws = set(cg), set(cw)
            for x in list(gs - ws)[:3]: print(f"  spark-only: {x}")
            for x in list(ws - gs)[:3]: print(f"  oracle-only: {x}")
            fail += 1

    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle: continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{'ROWS-OK ' if n > 0 else 'EMPTY!  '} {name} ({n} rows)")
            results[name] = {"spark_rows": n, "rows_only": True, "err": None}
            if n == 0: fail += 1
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            results[name] = {"err": str(e)[:400]}; fail += 1

    markers_end = load_markers()
    artifact = {"queries": results, "ok": ok, "fail": fail,
                "load_start": markers_start, "load_end": markers_end,
                "waited_for_jvms_sec": waited}
    if json_out:
        with open(json_out, "w") as f:
            json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"\n{ok} oracle-ok, {fail} problems  "
          f"(load start {markers_start} end {markers_end})")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
