#!/bin/bash
# Scripted scale-rehearsal gate: generate the Nx corpus if absent, then
# run graft.Rehearsal to (re)write REHEARSAL.json at the repo root.
#
#   VOCAB=1000 SCALE=10 tools/rehearsal.sh
#
# VOCAB picks the corpus density (gen_sf1.py docstring): 1000 = bounded
# pair density, the variant that measures PLAN scaling; 31 replays the
# driver corpus' degenerate density (true-output growth dominates).
set -euo pipefail
cd "$(dirname "$0")/.."
VOCAB="${VOCAB:-1000}"
SCALE="${SCALE:-10}"
# BOTH ends are generated at the SAME vocab: comparing the driver's
# vocab-31 sf0.1 against a Heaps-law big corpus would conflate corpus
# density with scale (measured: it flips x20b to 0.3x and inflates
# x55b to 10x purely from the density change).
BASE="${BASE:-/tmp/graft_sf01_v$VOCAB}"
BIG="${BIG:-/tmp/graft_sf1_v$VOCAB}"
if [ ! -e "$BASE/documents.parquet" ]; then
  python3 tools/gen_sf1.py "$BASE" 1 "$VOCAB"
fi
if [ ! -e "$BIG/documents.parquet" ]; then
  python3 tools/gen_sf1.py "$BIG" "$SCALE" "$VOCAB"
fi
sbt -batch "runMain graft.Rehearsal $BASE $BIG $SCALE"
