#!/usr/bin/env bash
# Run the KG pipeline the way the north rule specifies: spark-submit with
# the package shipped via --py-files (executors on a real cluster do not
# share the driver's filesystem). On a cluster, replace --master.
#
#   tools/submit_pipeline.sh --synth-docs 50000
#   tools/submit_pipeline.sh --pages /path/pages.parquet --gazetteer /path/gaz.parquet --out /tmp/kg
#
# Everything after the script name is passed through to jobs/run_pipeline.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(REPO="$REPO" python3 - <<'EOF'
import os, sys
sys.path.insert(0, os.path.join(os.environ["REPO"], "tools"))
from bench_scaling import _package_zip
print(_package_zip())
EOF
)
MASTER="${SPARK_MASTER:-local[8]}"
export SPARK_MASTER="$MASTER"  # get_spark() inside the job honors this
# spark-submit's driver JVM defaults to 1g, which GC-thrashes local-mode
# runs above ~500k synth docs (in local mode the "driver" heap IS the
# executor heap); session-level spark.driver.memory cannot raise it after
# launch, so it must be set here
exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEMORY:-8g}" \
  --py-files "$ZIP" \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-32}" \
  "$REPO/jobs/run_pipeline.py" "$@"
