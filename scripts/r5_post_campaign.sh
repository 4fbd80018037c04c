#!/bin/bash
# Round-5 post-campaign chain: waits for the 3.2M 1v4-pinned scaling
# campaign (bench.py --scaling) to exit, then runs the two queued
# quiet-window measurements that must not overlap it:
#   1. default sf0.1 bench  -> bench_r5_quiet.json
#      (re-measures the dedup_pipeline adjudication from ROUND5.md item
#      2 — the original raw log was lost to a sandbox re-image)
#   2. at-scale distributed-CC verification -> cc_verify_r5.json
# Detached via setsid so it survives the driving session.
set -u
cd /root/repo

while pgrep -f "bench.py --scaling" > /dev/null || pgrep -f "bench.py --pipeline-only" > /dev/null; do
    sleep 60
done

echo "campaign done at $(date -Is), load $(cut -d' ' -f1 /proc/loadavg)" > r5_post_campaign.status

python bench.py > bench_r5_quiet.json 2> bench_r5_quiet.err
rc=$?  # capture BEFORE the $(date -Is) substitution clobbers $?
echo "bench done at $(date -Is), rc=$rc" >> r5_post_campaign.status

SPARK_GRAFT_CC_EDGES=10000000 SPARK_GRAFT_CPUS=16 \
    python scripts/verify_distributed_cc.py > cc_verify_r5.json 2> cc_verify_r5.err
rc=$?
echo "cc verify done at $(date -Is), rc=$rc" >> r5_post_campaign.status
