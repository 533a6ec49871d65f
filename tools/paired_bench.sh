#!/bin/bash
# Paired same-window A/B: pristine BEFORE worktree vs the current tree,
# back-to-back full benches at sf0.1/c32 (VERDICT r13 item 2). Usage:
#   tools/paired_bench.sh <before_worktree_dir> <out_dir>
set -e
BEFORE_DIR=$1; OUT=$2
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
cd "$BEFORE_DIR" && python bench.py > "$OUT/paired_before.json" 2> "$OUT/paired_before.log"
cd /root/repo   && python bench.py > "$OUT/paired_after.json"  2> "$OUT/paired_after.log"
echo done
