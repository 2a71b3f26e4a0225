#!/usr/bin/env bash
# Ship the engine as a spark-submit job (north rule: "run via spark-submit
# --py-files on a multi-executor cluster"). Locally this exercises the exact
# packaging a cluster run uses: the package is zipped, shipped via
# --py-files, and the driver script imports it from the shipped archive.
#
#   tools/submit_bench.sh                      # bench at $SPARK_GRAFT_SF_DIR
#   MASTER=spark://host:7077 tools/submit_bench.sh --scaling
#
# On a real cluster set MASTER (and executor sizing via SPARK_SUBMIT_OPTS or
# extra args after --).
#
# Iceberg checkpointing (sources/checkpoint.py table backend) needs the
# runtime jars + a catalog, e.g.:
#   --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
#   --conf spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog \
#   --conf spark.sql.catalog.ice.type=hadoop \
#   --conf spark.sql.catalog.ice.warehouse=<path>
# tests/test_pagerank_spark.py::test_checkpointer_iceberg_roundtrip then
# un-skips and exercises the append/resume path.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=build/ps_projekt_pagerank_spark.zip
mkdir -p build
rm -f "$ZIP"
(cd . && zip -qr "$ZIP" ps_projekt_pagerank_spark -x '*__pycache__*')

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
# driver memory must be set HERE: once spark-submit has launched the JVM,
# the session builder's spark.driver.memory is a no-op
exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEM:-64g}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  bench.py "$@"
