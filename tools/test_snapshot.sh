#!/usr/bin/env bash
# Evidence-derived test counts: run the full ScalaTest suite and commit
# the summary lines to artifacts/test_summary.txt. SURVEY.md's "Suite:
# N specs, M suites" line must be copied from that artifact — never
# hand-edited (rounds 14 and 15 both shipped a hand-drifted count).
set -euo pipefail
cd "$(dirname "$0")/.."
out=artifacts/test_summary.txt
tmp="$(mktemp "${out}.XXXX.tmp")"
trap 'rm -f "$tmp"' EXIT
sbt -batch test 2>&1 | tee /dev/stderr | grep -E \
  "Total number of tests run:|Suites: completed|Tests: succeeded|All tests passed" \
  > "$tmp"
date -u +"captured_utc: %Y-%m-%dT%H:%M:%SZ" >> "$tmp"
git rev-parse HEAD | sed 's/^/worktree_head: /' >> "$tmp"
mv "$tmp" "$out"
trap - EXIT
echo "wrote $out:"
cat "$out"
