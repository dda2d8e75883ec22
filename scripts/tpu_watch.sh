#!/bin/bash
# Poll the axon tunnel relay; the moment it answers, run a bench health
# check and drop a flag file so the interactive session knows the chip is
# back. Safe to leave running: one TCP connect per minute, no JAX import
# until the relay is up.
#
# To stage work for when the chip returns, point STAGED_QUEUE at a script
# (e.g. STAGED_QUEUE=scripts/r3_perf_queue6.sh bash scripts/tpu_watch.sh);
# with nothing staged it just verifies the chip with one default bench run.
# (The round-3 queues this script used to hardcode are all complete —
# results/r3_perf_queue*.jsonl.)
set -u
cd "$(dirname "$0")/.."
flag=/tmp/tpu_back
rm -f "$flag"
while true; do
  if python - <<'EOF'
import socket, sys
try:
    with socket.create_connection(("127.0.0.1", 8082), timeout=5):
        sys.exit(0)
except OSError:
    sys.exit(1)
EOF
  then
    date > "$flag"
    echo "[tpu_watch] relay is back, probing jax.devices()" >&2
    if timeout 180 python -c "import jax; print(jax.devices())"; then
      if [ -n "${STAGED_QUEUE:-}" ]; then
        echo "[tpu_watch] chip alive — running staged queue $STAGED_QUEUE" >&2
        bash "$STAGED_QUEUE"
      else
        echo "[tpu_watch] chip alive — bench health check" >&2
        timeout 900 python bench.py 2>/dev/null | tail -1
      fi
      exit 0
    else
      echo "[tpu_watch] relay answered but devices() failed; keep waiting" >&2
      rm -f "$flag"
    fi
  fi
  sleep 60
done
