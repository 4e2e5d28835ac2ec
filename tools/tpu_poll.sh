#!/bin/bash
# Poll the axon TPU tunnel; when jax.devices() succeeds, run chiprun.sh once.
# Safe to re-run: refuses to start if a CHIPRUN.log sentinel shows a
# completed run this round.
cd /root/repo
if grep -q "=== CHIPRUN COMPLETE ===" CHIPRUN.log 2>/dev/null; then
  echo "chiprun already completed this round; exiting."
  exit 0
fi
echo "$(date) tpu_poll: start" >> CHIPRUN.log
while true; do
  if timeout 90 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu'" 2>/dev/null; then
    echo "$(date) tpu_poll: TPU is UP, launching chiprun" >> CHIPRUN.log
    bash tools/chiprun.sh
    echo "=== CHIPRUN COMPLETE ===" >> CHIPRUN.log
    exit 0
  fi
  echo "$(date) tpu_poll: down" >> CHIPRUN.log
  sleep 180
done
