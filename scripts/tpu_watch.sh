#!/bin/bash
# Poll the axon tunnel relay; the moment it answers, run the staged
# round-3 perf queue (scripts/r3_perf_queue.sh) and drop a flag file so
# the interactive session knows the chip is back. Safe to leave running:
# one TCP connect per minute, no JAX import until the relay is up.
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
      echo "[tpu_watch] chip alive — running r3 perf queue" >&2
      bash scripts/r3_perf_queue.sh
      echo "[tpu_watch] perf queue complete — starting full fading train" >&2
      sleep 20
      bash scripts/r3_fading_full_queue.sh
      echo "[tpu_watch] fading-full queue complete — fp8 on-chip stability" >&2
      sleep 20
      bash scripts/r3_fp8_stability_queue.sh
      echo "[tpu_watch] fp8 stability queue complete" >&2
      exit 0
    else
      echo "[tpu_watch] relay answered but devices() failed; keep waiting" >&2
      rm -f "$flag"
    fi
  fi
  sleep 60
done
