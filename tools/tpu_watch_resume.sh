#!/bin/bash
# Wait out a TPU backend outage, then finish the genome-scale align
# phase from the saved artifact (tools/genome_scale.py --resume).
# Probes cheaply every 8 min; exits after the resume run completes.
# Refuses to start while a previous genome_scale.py process is alive.
set -u
cd /root/repo
while pgrep -f "genome_scale.py" > /dev/null; do
  echo "$(date -u +%H:%M:%S) previous genome_scale still running; waiting"
  sleep 300
done
while true; do
  if PYTHONPATH=/root/repo:/root/.axon_site timeout 240 python -c \
      "import jax; assert jax.devices()" 2>/dev/null; then
    echo "$(date -u +%H:%M:%S) TPU back; launching resume"
    PYTHONPATH=/root/repo:/root/.axon_site timeout 10800 \
      python tools/genome_scale.py --resume --table-s 647 \
      > data/out/genome_scale_r03_resume.log 2>&1
    rc=$?
    echo "$(date -u +%H:%M:%S) resume exited: $rc"
    if [ "$rc" -eq 0 ] && [ -f data/out/genome_scale/genome_scale.json ]; then
      cp data/out/genome_scale/genome_scale.json data/genome_scale_r03.json
      echo "$(date -u +%H:%M:%S) copied result to data/genome_scale_r03.json"
    fi
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) TPU still unavailable"
  sleep 480
done
