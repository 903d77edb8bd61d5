#!/usr/bin/env python3
"""Split graft.Explain output (===== qname ===== sections) into per-query
files <outdir>/<qname>_<suffix>.txt. Usage:
  split_explain.py <explain_output> <outdir> <suffix>"""
import re, sys, os

src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
cur, buf = None, []
def flush():
    if cur and buf:
        with open(os.path.join(outdir, f"{cur}_{suffix}.txt"), "w") as f:
            f.write("\n".join(buf).strip() + "\n")
for line in open(src):
    m = re.match(r"=+ (q\S+) =+", line.strip())
    if m:
        flush(); cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line.rstrip("\n"))
flush()
print("wrote", outdir)
