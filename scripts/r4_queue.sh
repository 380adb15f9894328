#!/bin/bash
# Round-4 serial TPU measurement queue (one tunnel client at a time).
# Waits for any running bench_upload_ab to drain first.
set -u
cd /root/repo
while ps aux | grep bench_upload_ab | grep -v grep >/dev/null; do
  sleep 30
done
run() {
  echo "### $*"
  timeout 2400 "$@" 2>&1 | grep -v "^WARNING"
}
run python scripts/profile_train.py --dtype f32
run python scripts/profile_train.py --dtype f32 --inner-dtype bf16
run python bench.py --mode sintel --batch 16
run python bench.py --mode sintel --batch 12
run python bench.py --mode 1080p --batch 12
run python bench.py --quick
echo QUEUE_DONE
