#!/bin/bash
# Run a TPU-touching python script with retries: the axon claim lingers for
# ~1-2 min after the previous process exits, so "Backend 'axon' is not in the
# list of known backends" is transient.
script="$1"; log="$2"; tries="${3:-6}"
for i in $(seq 1 "$tries"); do
  PYTHONPATH=/root/repo:$PYTHONPATH python "$script" > "$log" 2>&1
  if ! grep -q "not in the list of known backends" "$log"; then
    echo "tpu_run: done after attempt $i"; exit 0
  fi
  echo "tpu_run: attempt $i hit claim contention; retrying in 60s"
  sleep 60
done
echo "tpu_run: exhausted retries"; exit 1
