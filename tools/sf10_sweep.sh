#!/bin/bash
# Full-suite sf10 oracle sweep (VERDICT r8 ask #1): run every registered
# query at sf10 in batches from a CLASSES SNAPSHOT (so foreground compiles
# can't corrupt a mid-flight batch), then DuckDB-compare each batch with a
# per-oracle cap. Timeout-class exact mirrors (documented in BASELINE.md)
# are excluded up front — their DuckDB mirrors are deliberately quadratic.
#
# Usage: tools/sf10_sweep.sh <snapshot-classes-dir> <out-root> [batch ...]
set -uo pipefail
cd "$(dirname "$0")/.."
SNAP="$1"; OUT="$2"; shift 2
SF=target/testdata/sf10
mkdir -p "$OUT"
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
for NAMEFILE in "$@"; do
  B="$(basename "$NAMEFILE" .txt)"
  NAMES="$(grep -v '^#' "$NAMEFILE" | tr '\n' ',' | sed 's/,$//;s/^,//')"
  [ -z "$NAMES" ] && continue
  echo "=== batch $B: engine start $(date +%T) ===" | tee -a "$OUT/sweep.log"
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  java "${ADD_OPENS[@]}" "-Xmx${SPARK_DRIVER_MEM:-24g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$SNAP:/opt/spark/jars/*" graft.Verify "$SF" "$OUT/$B" "$NAMES" \
    2>&1 | grep "\[verify\]" | tee -a "$OUT/sweep.log"
  echo "=== batch $B: oracle start $(date +%T) ===" | tee -a "$OUT/sweep.log"
  python3 tools/check_oracle.py "$OUT/$B" "$SF" "${ORACLE_CAP:-600}" \
    2>&1 | tee -a "$OUT/sweep.log"
done
echo "=== sweep done $(date +%T) ===" | tee -a "$OUT/sweep.log"
