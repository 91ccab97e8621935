#!/usr/bin/env bash
# The north-star deployment shape: the index build shipped to a
# multi-executor cluster via spark-submit --py-files.
#
#   tools/cluster.sh start 4
#   tools/submit_build.sh [--cores 8] [--docs 100000]
#
# Zips the package, submits tools/bench_build.py to the loopback
# standalone cluster; executors import the engine from the shipped zip.
set -euo pipefail
cd "$(dirname "$0")/.."

SPARK_PKG=$(python -c "import pyspark, os; print(os.path.dirname(pyspark.__file__))")
ZIP=/tmp/beetle_pkg.zip
rm -f $ZIP
python - <<'EOF'
import zipfile, os
with zipfile.ZipFile("/tmp/beetle_pkg.zip", "w") as z:
    for root, _, files in os.walk("beetle_search_engine_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF

export SPARK_HOME=$SPARK_PKG SPARK_SCALA_VERSION=2.13
exec "$SPARK_PKG/bin/spark-submit" \
  --master spark://127.0.0.1:7077 \
  --py-files $ZIP \
  --conf spark.executor.cores=8 \
  --conf spark.executor.memory=10g \
  --conf spark.executorEnv.SPARK_SCALA_VERSION=2.13 \
  tools/bench_build.py --master spark://127.0.0.1:7077 "$@"
