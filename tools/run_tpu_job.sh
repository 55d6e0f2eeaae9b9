#!/bin/bash
# One long-lived TPU job: full profile + tuned bench in a single process
# (the axon grant is single-client; exit code 7 = chip busy -> sleep+retry).
cd /root/repo || exit 1
for i in $(seq 1 60); do
  python tools/tpu_profile.py >> tools/profile_r02.log 2>&1
  code=$?
  if [ "$code" -ne 7 ]; then
    echo "tpu job finished with code $code (attempt $i)" >> tools/profile_r02.log
    exit "$code"
  fi
  echo "chip busy (attempt $i); sleeping 300s" >> tools/profile_r02.log
  sleep 300
done
exit 7
