#!/bin/bash
# Interleaved A/B: anchor tree (eada43b) vs HEAD, 3 rounds each, headline only.
set -u
export SPARK_GRAFT_SLOPE=0 SPARK_GRAFT_LEGWALL=0
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
for round in 1 2 3; do
  for tree in anchor head; do
    if [ "$tree" = anchor ]; then d=/tmp/r17_anchor; else d=/root/repo; fi
    cd "$d"
    echo "=== round $round tree $tree $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ==="
    python bench.py 2>/dev/null
  done
done
