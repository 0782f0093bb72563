#!/usr/bin/env bash
# Ship the engine via spark-submit --py-files (north-rule packaging contract).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/rustserini_submit_demo}"
mkdir -p "$WORK"

# 1. package the engine
cd "$REPO"
rm -f "$WORK/rustserini_spark.zip"
zip -qr "$WORK/rustserini_spark.zip" rustserini_spark oracle

# 2. synthesize a small webtext table if absent
if [ ! -e "$WORK/webtext/_SUCCESS" ]; then
  python - "$WORK" <<'EOF'
import sys
sys.path.insert(0, ".")
from rustserini_spark import get_spark
from rustserini_spark.sources.synth import synth_webtext
spark = get_spark("submit-prep", master="local[8]")
synth_webtext(spark, n_docs=2000).write.mode("overwrite").parquet(sys.argv[1] + "/webtext")
spark.stop()
EOF
fi

# 3. run via spark-submit with the zipped package
rm -rf "$WORK/ckpt"
spark-submit --master 'local[8]' \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.ui.enabled=false \
  --py-files "$WORK/rustserini_spark.zip" \
  "$REPO/scripts/submit_job.py" "$WORK/webtext" "$WORK/ckpt" 10
