#!/usr/bin/env bash
# sf10 oracle-compare runner (dev tooling, not shipped).
#
# Replays the full registry's DuckDB oracles against the sf10 fixture
# in budgeted subsets — each subset writes its own JSON and log, so a
# kill loses at most one subset — then merges into CORRECTNESS_sf10
# (merge_correctness.py stamps `_provenance.source = "merged"` with
# the input list). DUCKDB_MEMORY_LIMIT makes an oversized oracle fail
# ITS entry instead of OOM-killing the run.
#
# Usage: tools/compare_sf10.sh <verifyOutDir> <outJson>
set -euo pipefail
vdir=$1; out=$2
sfdir=/root/repo/sf10_fixture
mkdir -p /tmp/sf10_compare
names=$(python3 - "$vdir" <<'EOF'
import json, sys
print(",".join(sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))))
EOF
)
IFS=',' read -ra ALL <<< "$names"
total=${#ALL[@]}
nsub=6
per=$(( (total + nsub - 1) / nsub ))
inputs=()
for ((i=0; i<nsub; i++)); do
  sub=("${ALL[@]:i*per:per}")
  [ ${#sub[@]} -eq 0 ] && continue
  subset=$(IFS=','; echo "${sub[*]}")
  j=/tmp/sf10_compare/part$i.json
  l=/tmp/sf10_compare/part$i.log
  echo "=== subset $i (${#sub[@]} entries) ==="
  DUCKDB_MEMORY_LIMIT=${DUCKDB_MEMORY_LIMIT:-80GB} COMPARE_ONLY="$subset" \
    python3 tools/compare.py "$sfdir" "$vdir" "$j" 2>&1 | tee "$l" | tail -2 || true
  [ -s "$j" ] && inputs+=("$j") || inputs+=("LOG:$l")
done
python3 tools/merge_correctness.py "$out" "${inputs[@]}"
