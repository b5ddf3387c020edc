#!/bin/bash
# Interleaved same-box A/B bench: HEAD (/root/repo) vs the round-8 commit
# (wt-r8 worktree), SPARK_GRAFT_BENCH_ONLY on the drifted query set, three
# interleaved rounds per side; per-query MIN across rounds is the
# steady-state number. Outputs land in /tmp/ab/{head,r8}_N.json.
set -u
QS="g1_pagerank,x32_contrastive_pairs,d12_lsh_recall,x12_lm_score,d6b_dup_clusters_dist,d4b_jaccard_prefix_path,q1_pricing_summary"
SF=${1:-/root/testdata/sf0.1}
mkdir -p /tmp/ab
for i in 1 2 3; do
  for side in head r8; do
    dir=/root/repo; [ "$side" = r8 ] && dir=/root/repo/wt-r8
    (cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_ONLY="$QS" \
      SPARK_GRAFT_BENCH_OUT="/tmp/ab/${side}_${i}.json" \
      sbt -batch "runMain graft.Bench" >/dev/null 2>&1)
    echo "done $side round $i: $(cat /tmp/ab/${side}_${i}.json | head -c 200)"
  done
done
echo AB_COMPLETE
