#!/bin/bash
# Wait for the tpu_watch.sh pipeline (perf queue -> fading-full queue ->
# fp8 stability queue) to drain, then run perf queue #2
# (scripts/r3_perf_queue2.sh). Checks only — never kills anything.
set -u
cd "$(dirname "$0")/.."
# tpu_watch.sh stays alive until its last queue returns, so it alone marks
# the pipeline (matching train.py here would also match unrelated
# CPU-backend runs)
while pgrep -f "tpu_watch.sh" > /dev/null; do
  sleep 60
done
# one more settle window for the exclusive chip to tear down
sleep 30
date > /tmp/queue2_started
bash scripts/r3_perf_queue2.sh
date > /tmp/queue2_done
