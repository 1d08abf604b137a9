#!/usr/bin/env bash
# End-to-end spark-submit --py-files demo (the north-rule deployment shape).
# Packages the library as a zip, submits tools/submit_replay.py against the
# smallest testdata tier, and checks the JSON verdict: exactly-once replay
# skip + per-row content sha256 equality + a non-trivial offload ratio.
#
# Usage: tools/run_submit_demo.sh [sf_dir] [master]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
MASTER="${2:-local[8]}"
WORK="$(mktemp -d /tmp/submit-demo.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

zip -qr "$WORK/ccsmt.zip" kafka_connect_claim_check_smt_spark

spark-submit --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/ccsmt.zip" \
  tools/submit_replay.py "$SF_DIR" "$WORK/out" >"$WORK/stdout" 2>"$WORK/stderr"

grep -E '^\{' "$WORK/stdout"
python - "$WORK/stdout" <<'EOF'
import json, sys
line = [l for l in open(sys.argv[1]) if l.startswith("{")][-1]
r = json.loads(line)
assert r["content_sha_ok"], r
assert r["replay_skipped"], r
assert r["offload_ratio"] > 0, r
print("SUBMIT DEMO OK")
EOF
