#!/usr/bin/env python3
"""Merge per-query correctness JSON reports (dev tooling, not shipped).

Later files win per query. Also accepts `LOG:<path>` arguments: a
compare.py stdout log is parsed into report entries (PASS name (N rows)
/ FAIL name: reason) — used to recover the completed prefix of a
compare run that was killed before writing its JSON. LOG-derived FAIL
entries are stage-aware: the FAIL reason is parsed to distinguish
schema / row-count / hash failures, so a merged report carries the
same per-axis flags a compare.py JSON would (unparseable reasons fall
back to all-false with the reason preserved in `err`).

The output carries a `_provenance` entry (`"source": "merged"`, plus
the input list) so a recovered/merged artifact is always
distinguishable from compare.py's single-pass `"full-run"` output.

Usage: python3 tools/merge_correctness.py out.json in1.json LOG:run.log in2.json ...
"""
import json
import os
import re
import sys


def from_log(path):
    rep = {}
    for line in open(path):
        m = re.match(r"PASS (\S+) \((\d+) rows\)", line.strip())
        if m:
            rep[m.group(1)] = {"rows_match": True, "schema_match": True,
                               "hash_match": True,
                               "spark_rows": int(m.group(2)),
                               "oracle_rows": int(m.group(2)), "err": None}
            continue
        m = re.match(r"FAIL (\S+): (.*)", line.strip())
        if m:
            name, reason = m.group(1), m.group(2)
            # Stage-aware parse mirroring compare.py's record() calls:
            #   "hash mismatch (N rows)"  → rows+schema ok, hash bad
            #   "rows N != M"             → schema ok, counts known
            #   "cols [...] != [...]"     → schema bad, counts unknown
            #   anything else (exception / no output) → all false + err
            hm = re.match(r"hash mismatch \((\d+) rows\)", reason)
            rm = re.match(r"rows (\d+) != (\d+)", reason)
            if hm:
                n = int(hm.group(1))
                rep[name] = {"rows_match": True, "schema_match": True,
                             "hash_match": False, "spark_rows": n,
                             "oracle_rows": n, "err": None}
            elif rm:
                rep[name] = {"rows_match": False, "schema_match": True,
                             "hash_match": False,
                             "spark_rows": int(rm.group(1)),
                             "oracle_rows": int(rm.group(2)), "err": None}
            elif reason.startswith("cols "):
                rep[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": 0, "err": reason[:300]}
            else:
                rep[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": 0,
                             "oracle_rows": 0, "err": reason[:300]}
    return rep


def main(out, sources):
    merged = {}
    for s in sources:
        rep = from_log(s[4:]) if s.startswith("LOG:") else json.load(open(s))
        rep.pop("_provenance", None)
        merged.update(rep)
    merged["_provenance"] = {"source": "merged",
                             "inputs": [os.path.basename(s) for s in sources]}
    tmp = f"{out}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    os.replace(tmp, out)
    entries = [v for k, v in merged.items() if not k.startswith("_")]
    green = sum(1 for v in entries if v["hash_match"])
    print(f"{out}: {len(entries)} entries, {green} hash-green (merged)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
