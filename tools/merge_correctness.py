#!/usr/bin/env python3
"""Merge per-query correctness JSON reports (dev tooling, not shipped).

Later files win per query. Also accepts `LOG:<path>` arguments: a
compare.py stdout log is parsed into report entries (PASS name (N rows)
/ FAIL name: reason) — used to recover the completed prefix of a
compare run that was killed before writing its JSON.

Usage: python3 tools/merge_correctness.py out.json in1.json LOG:run.log in2.json ...
"""
import json
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
            rep[m.group(1)] = {"rows_match": False, "schema_match": False,
                               "hash_match": False, "spark_rows": 0,
                               "oracle_rows": 0, "err": m.group(2)[:300]}
    return rep


def main(out, sources):
    merged = {}
    for s in sources:
        rep = from_log(s[4:]) if s.startswith("LOG:") else json.load(open(s))
        merged.update(rep)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    green = sum(1 for v in merged.values() if v["hash_match"])
    print(f"{out}: {len(merged)} entries, {green} hash-green")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
