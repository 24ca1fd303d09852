#!/bin/bash
# Interleaved A/B: anchor tree (f0ae49e, worktree /tmp/r18_anchor) vs
# HEAD, alternating within each round so load drift hits both trees;
# rounds 4-6 run in reversed order to cancel the teardown-load bias.
set -u
export SPARK_GRAFT_SLOPE=0 SPARK_GRAFT_LEGWALL=0
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
for round in 1 2 3 4 5 6; do
  if [ "$round" -le 3 ]; then order="anchor head"; else order="head anchor"; fi
  for tree in $order; do
    if [ "$tree" = anchor ]; then d=/tmp/r18_anchor; else d=/root/repo; fi
    cd "$d"
    echo "=== round $round tree $tree $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg) ==="
    python bench.py 2>/dev/null
  done
done
