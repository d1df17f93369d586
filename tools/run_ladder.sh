#!/bin/bash
# Launch the 32M-quad N-vs-4N executor ladder from an immutable code
# snapshot (run-window hygiene: live edits must not leak into a running
# leg, and nothing else may run Spark on this box while legs execute).
# Usage: bash tools/run_ladder.sh [quads] [outtag]
set -e
QUADS="${1:-32000000}"
TAG="${2:-r5}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SNAP="/dev/shm/kgsnap_${TAG}"
EVLOG="/dev/shm/kg_evlog_${TAG}"
OUT="$REPO/tools/out"
mkdir -p "$OUT"
rm -rf "$SNAP" "$EVLOG"
mkdir -p "$SNAP"
# tmpfs hygiene: the code snapshot is only needed while legs run; the
# event log is moved to tools/out so repeated TAGs don't accumulate
# RAM-backed copies (the 32M corpus at $KG_SCALE_CORPUS is intentionally
# kept — reuse across ladders skips a ~15 min prepare step)
cleanup() {
  rm -rf "$SNAP"
  if [ -d "$EVLOG" ]; then
    rm -rf "$OUT/evlog_${TAG}"
    mv "$EVLOG" "$OUT/evlog_${TAG}" 2>/dev/null || rm -rf "$EVLOG"
  fi
}
trap cleanup EXIT
git -C "$REPO" archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
KG_SCALE_QUADS="$QUADS" KG_SCALE_EVENTLOG="$EVLOG" \
  python tools/scaling_bench.py \
  > "$OUT/ladder_${TAG}.json" 2> "$OUT/ladder_${TAG}.log"
echo "ladder done: $OUT/ladder_${TAG}.json"
