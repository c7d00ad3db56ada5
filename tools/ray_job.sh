#!/bin/sh
# Launch the flagship pipeline on a fixed-size Ray cluster via ray job
# submit — the north-rule launch shape. On a real cluster run this twice
# (cluster sizes N and 4N nodes) and compare the reported wall times for
# the scaling-efficiency criterion; bench.py --scaling is the single-node
# proxy used in this sandbox.
#
#   RAY_ADDRESS=http://<head>:8265 tools/ray_job.sh s3://bucket/in s3://bucket/out [index_dir]
set -eu
IN=$1; OUT=$2; INDEX=${3:-}
exec ray job submit \
  --working-dir "$(cd "$(dirname "$0")/.." && pwd)" \
  --no-wait \
  -- python -m data_quality_ray run "$IN" "$OUT" --address auto \
     ${INDEX:+--dedup-index "$INDEX"}
