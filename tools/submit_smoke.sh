#!/usr/bin/env bash
# spark-submit --py-files shipping smoke (the north rule's deployment
# shape): zip the package, generate a small deterministic input, run
# the pipeline through an external driver script with the package
# shipped ONLY via --py-files (nothing importable from the CWD), and
# assert routed rows + conservation.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d /tmp/logfowd2-submit-XXXX)"
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && zip -qr "$WORK/logfowd2_spark.zip" logfowd2_spark -x '*__pycache__*')

python - <<PY
from logfowd2_spark import synth
synth.write_dataset("$WORK/in", n_rows=5000, seed=42, n_files=4)
PY

cat > "$WORK/driver.py" <<'PY'
import sys
from pyspark.sql import SparkSession

from logfowd2_spark.config import PipelineConfig
from logfowd2_spark.streaming.pipeline import run_pipeline

spark = SparkSession.builder.getOrCreate()
cfg = PipelineConfig(
    input_path=sys.argv[1], output_path=sys.argv[2],
    checkpoint_path=sys.argv[3], max_line_size=256)
m = run_pipeline(spark, cfg, sys.argv[4], sys.argv[5])
ok = all(x.conservation_ok() for x in m)
print("SUBMIT_OK", sum(x.rows_routed for x in m), ok)
assert ok, "conservation violated under spark-submit"
spark.stop()
PY

cd "$WORK"  # CWD contains no importable package: --py-files must ship it
spark-submit --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --py-files "$WORK/logfowd2_spark.zip" "$WORK/driver.py" \
  "$WORK/in/sequences" "$WORK/out" "$WORK/ckpt" \
  "$WORK/in/pods.parquet" "$WORK/in/routes.parquet" 2>/dev/null \
  | grep -a SUBMIT_OK
