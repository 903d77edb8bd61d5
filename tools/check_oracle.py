#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfdir> <outdir>"), then this script compares each
result parquet against the corresponding oracle SQL run in DuckDB."""
import json, math, sys, glob, os
import duckdb

def canon(rows, cols):
    # driver sorts columns by name before hashing; sort rows for stability
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    def key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)
    out.sort(key=key)
    return [tuple(cols[i] for i in order)] + out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path): continue
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            results[name] = "EMPTY-RESULT"; n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{path}/*.parquet'")
        got_rows, got_cols = got.fetchall(), [d[0] for d in got.description]
        if name not in oracle:
            results[name] = f"rows-only ({len(got_rows)} rows)"
            if len(got_rows) == 0: n_fail += 1
            else: n_pass += 1
            continue
        try:
            # Type probe BEFORE fetchall: DuckDB widens integer aggregates to
            # HUGEINT (int128), which Python's == canonicalizes away but a
            # representation-sensitive hash (pandas/Arrow export) does not —
            # this was the root cause of the q383/q606/q676 driver-only hash
            # FAILs in rounds 6-8. Flag any HUGEINT output column as a FAIL so
            # the local replica catches the class.
            rel = con.sql(oracle[name])
            hug = [c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t)]
            if hug:
                results[name] = f"HUGEINT-ORACLE-COLS {hug} (cast to BIGINT in oracle SQL)"
                n_fail += 1; continue
            exp = con.execute(oracle[name])
            exp_rows, exp_cols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {str(e)[:120]}"; n_fail += 1; continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g[0] != e[0]:
            results[name] = f"SCHEMA-MISMATCH got={g[0]} exp={e[0]}"; n_fail += 1
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)-1} exp={len(e)-1}"; n_fail += 1
        elif g != e:
            diffs = [(i, g[i], e[i]) for i in range(1, len(g)) if g[i] != e[i]][:3]
            results[name] = f"VALUE-MISMATCH {len([1 for i in range(1,len(g)) if g[i]!=e[i]])} rows; first: {diffs[0]}"
            n_fail += 1
        else:
            results[name] = f"PASS ({len(g)-1} rows)"; n_pass += 1
    for k, v in sorted(results.items()):
        flag = "ok " if v.startswith(("PASS", "rows-only")) else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
