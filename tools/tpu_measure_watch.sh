#!/bin/bash
# Stage-2 watcher: after the genome-resume watcher (tpu_watch_resume.sh)
# finishes — success or not — wait for the TPU to be reachable and run
# the one-process measurement batch (tools/tpu_measure_all.py).
# Never overlaps the genome run (one host core; see verify skill).
set -u
cd /root/repo
# wait for the stage-1 watcher and any genome_scale run to exit
while pgrep -f "tpu_watch_resume.sh" > /dev/null \
   || pgrep -f "genome_scale.py" > /dev/null; do
  sleep 300
done
echo "$(date -u +%H:%M:%S) stage-1 watcher gone; probing TPU"
while true; do
  if PYTHONPATH=/root/repo:/root/.axon_site timeout 240 python -c \
      "import jax; assert jax.devices()" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) TPU up; running tpu_measure_all"
    PYTHONPATH=/root/repo:/root/.axon_site timeout 14400 \
      python tools/tpu_measure_all.py data/out/tpu_measure_r03s4.log
    echo "$(date -u +%H:%M:%S) tpu_measure_all exited: $?"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU still unavailable"
  sleep 480
done
