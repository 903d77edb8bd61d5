#!/usr/bin/env python3
"""Overflow-envelope audit for the exact half-up scaled-integer macro.

The catalog's ratio emissions use the macro
    cast(((A) - ((A) % (B))) / (B) as bigint)
whose `/` is a DOUBLE division in both engines: exact only while the
dividend (an exact multiple of B) stays under 2^53. Past that, the
double lands a hair above or below the true quotient and the two
engines' double->bigint casts (Spark truncates, DuckDB rounds) can
disagree — the q390_lorenz sf0.001 failure class.

This tool detects violations EMPIRICALLY and deterministically: for
every oracle query it rewrites each macro division into DuckDB's `//`
(exact integer division at any magnitude — DuckDB widens to HUGEINT),
runs the original and the rewritten text, and reports any query whose
results differ. A difference means the macro left its envelope on this
data — the Spark side (same values, same double division) is then a
coin-flip too and the site must be converted to the x100-peel form
(see lorenzSql in SparkEntry.scala).

Usage: envelope_audit.py <sfdir> <outdir-with-oracle_sql.json>
"""
import json, re, sys
import duckdb

# A and B may contain one nesting level of parens (casts, floor(...)).
ATOM = r"(?:[^()]|\([^()]*\))+"
MACRO = re.compile(
    r"cast\(\(\((?P<A>" + ATOM + r")\) - \(\((?P=A)\) % \((?P<B>" + ATOM
    + r")\)\)\) / \((?P=B)\) as bigint\)")

def rewrite(sql: str):
    n = 0
    def sub(m):
        nonlocal n
        n += 1
        a, b = m.group("A"), m.group("B")
        return f"((({a}) - (({a}) % ({b}))) // ({b}))"
    return MACRO.sub(sub, sql), n

def main(sfdir, outdir):
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_sites = n_q = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        new, k = rewrite(sql)
        if k == 0:
            continue
        n_q += 1; n_sites += k
        try:
            a = con.execute(sql).fetchall()
            b = con.execute(new).fetchall()
        except Exception as e:
            print(f"[err ] {name}: {str(e)[:120]}"); n_bad += 1; continue
        if a != b:
            n_bad += 1
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y][:2]
            print(f"[VIOL] {name}: {k} macro sites, rows differ; first: {diffs[0] if diffs else 'row count'}")
    print(f"\n{n_q} queries / {n_sites} macro sites audited, {n_bad} envelope violations")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
