#!/usr/bin/env bash
# One-pass release gate (VERDICT r14 #6): clean test reports → full suite →
# Verify + both oracle checks → Bench — in ONE sequence, echoing report
# timestamps against the HEAD commit time so "every suite report postdates
# the final code-touching commit" is checkable from the script's output
# instead of by hand. Run from the repo root with NO other sbt/Spark JVM
# active (concurrent JVMs distort bench timings 2-3x).
#
# Usage: tools/gate.sh [sfVerifyDir] [sfBenchDir]
set -uo pipefail
cd "$(dirname "$0")/.."

SF_VERIFY="${1:-/root/testdata/sf0.01}"
SF_BENCH="${2:-/root/testdata/sf0.1}"
OUT=/tmp/gate_verify_out
FAIL=0

echo "== gate: HEAD =="
git log -1 --format='%h %cI %s'

echo "== gate: clean test reports =="
rm -rf target/test-reports
rm -rf "$OUT"

echo "== gate: full suite =="
if ! sbt -batch test 2>&1 | grep -E "Tests: |\*\*\* FAILED|error]" | tail -20; then
  echo "gate: sbt test pipeline produced no summary"; FAIL=1
fi
# every suite must have written a report, all zero-failure
python3 - <<'EOF' || FAIL=1
import glob, sys, xml.etree.ElementTree as ET
reports = glob.glob("target/test-reports/*.xml")
if not reports:
    print("gate: NO test reports"); sys.exit(1)
tests = failures = errors = 0
for r in reports:
    a = ET.parse(r).getroot().attrib
    tests += int(a.get("tests", 0))
    failures += int(a.get("failures", 0))
    errors += int(a.get("errors", 0))
print(f"gate: {len(reports)} suites, {tests} tests, {failures} failures, {errors} errors")
sys.exit(0 if failures == 0 and errors == 0 and tests > 0 else 1)
EOF

echo "== gate: Verify @ $SF_VERIFY =="
sbt -batch "runMain graft.Verify $SF_VERIFY $OUT" 2>&1 | grep -E '\[verify\]|error:' | tail -3
python3 tools/local_check.py "$SF_VERIFY" "$OUT" | tail -2 || FAIL=1
python3 tools/strict_check.py "$SF_VERIFY" "$OUT" | tail -2 || FAIL=1

echo "== gate: Bench @ $SF_BENCH =="
BENCH_LINE=$(SPARK_GRAFT_SF_DIR="$SF_BENCH" sbt -batch 'runMain graft.Bench' 2>&1 | grep -F '"metric"')
if [ -z "$BENCH_LINE" ]; then echo "gate: bench emitted no metric line"; FAIL=1; fi
echo "$BENCH_LINE" | head -c 400; echo

echo "== gate: report freshness vs HEAD =="
HEAD_T=$(git log -1 --format=%ct)
STALE=0
for r in target/test-reports/*.xml; do
  RT=$(stat -c %Y "$r")
  if [ "$RT" -lt "$HEAD_T" ]; then echo "STALE: $r"; STALE=1; fi
done
[ "$STALE" = 0 ] && echo "gate: all $(ls target/test-reports/*.xml | wc -l) reports postdate HEAD commit"
[ "$STALE" = 1 ] && FAIL=1

if [ "$FAIL" = 0 ]; then echo "== gate: PASS =="; else echo "== gate: FAIL =="; fi
exit $FAIL
