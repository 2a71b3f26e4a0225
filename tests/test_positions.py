"""plans.positions — distributed global rank numbering.

The scale contract: positions must equal the single-threaded sort's, and
the plan must contain NO partitionless Window (a |V|-row frame funneled
through one task). Every Window node in the plan must be partitioned by
the local _pid key.
"""

import contextlib
import io
import re

from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.plans.positions import global_positions
from ps_projekt_pagerank_spark.plans.reporting import order_agreement


def _make(spark, n=211):
    # deterministic, collision-heavy values so ties exercise the id break
    rows = [(i, float((i * 37) % 50) / 50.0) for i in range(n)]
    return spark.createDataFrame(rows, "id LONG, rank DOUBLE")


def test_global_positions_matches_sequential_sort(spark):
    df = _make(spark)
    expected = {
        row_id: pos + 1
        for pos, (row_id, _) in enumerate(
            sorted(
                ((r["id"], r["rank"]) for r in df.collect()),
                key=lambda t: (-t[1], t[0]),
            )
        )
    }
    for p in (1, 4, 32):
        got = {
            r["id"]: r["pos"]
            for r in global_positions(
                df, [F.desc("rank"), F.asc("id")], partitions=p
            ).collect()
        }
        assert got == expected, p


def test_positions_plan_has_no_partitionless_window(spark):
    df = _make(spark)
    out = global_positions(df, [F.desc("rank"), F.asc("id")])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # formatted explain lists each Window node's Arguments with the
    # partition spec; require the _pid partition key on every one
    for m in re.finditer(r"Arguments: \[row_number\(\)[^\n]*", plan):
        assert "_pid" in m.group(0), plan


def test_order_agreement_identity_and_disagreement(spark):
    df = _make(spark)
    assert order_agreement(df, df) == 1.0
    shifted = df.select("id", (F.lit(1.0) - F.col("rank")).alias("rank"))
    assert order_agreement(df, shifted) < 1.0
