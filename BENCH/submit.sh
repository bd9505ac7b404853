#!/bin/sh
# Run a bench/engine script via spark-submit --py-files, the launch form the
# north rule names for multi-executor clusters.  On a real cluster, replace
# --master with the cluster URL; everything else is identical.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SCRIPT="${1:-$REPO/bench.py}"
shift 2>/dev/null || true
MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

cd "$REPO"
rm -f /tmp/rendler_spark_pkg.zip
python -c "
import shutil, zipfile, pathlib
z = zipfile.ZipFile('/tmp/rendler_spark_pkg.zip', 'w')
for p in pathlib.Path('rendler_spark').rglob('*.py'):
    z.write(p, str(p))
z.close()
"
exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \
  --py-files /tmp/rendler_spark_pkg.zip \
  "$SCRIPT" "$@"
