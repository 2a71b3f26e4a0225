"""No gated plan may contain a partitionless Window (VERDICT r3 task 2).

A ``row_number()`` (or any window) over a spec with no PARTITION BY
funnels the whole frame through ONE task — fine at test scale, a
scale-killer at 10^9 rows. Two layers of defense:

1. source scan: the package must not construct ``Window.orderBy(...)``
   (the only way pyspark builds a partitionless spec);
2. plan scan: every __spark_entry__.queries() entry is built at sf0.001
   and its optimized plan searched for a ``windowspecdefinition`` whose
   first argument is already a SortOrder (no partition exprs) — the
   definitive check, covering windows that arrive via SQL or helpers.
"""

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.explain_plans import partitionless_windows  # noqa: E402

PKG = pathlib.Path(__file__).resolve().parents[1] / "ps_projekt_pagerank_spark"
SF_DIR = "/root/testdata/sf0.001"


def test_no_partitionless_window_constructions_in_source():
    bad = []
    for py in sorted(PKG.rglob("*.py")):
        text = py.read_text()
        for m in re.finditer(r"Window\s*\.\s*orderBy\s*\(", text):
            line = text[: m.start()].count("\n") + 1
            bad.append(f"{py.relative_to(PKG.parent)}:{line}")
    assert not bad, f"partitionless Window constructions: {bad}"


def test_detector_flags_a_partitionless_window(spark):
    # the detector itself must be able to see one, or the main test is
    # vacuous
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert partitionless_windows(plan)
    ok = spark.range(10).select(
        F.row_number()
        .over(Window.partitionBy((F.col("id") % 2)).orderBy("id"))
        .alias("rn")
    )
    plan_ok = ok._jdf.queryExecution().optimizedPlan().toString()
    assert not partitionless_windows(plan_ok)


def test_every_gated_plan_is_window_partitioned(spark):
    import __spark_entry__ as entrymod

    failures = []
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        hits = partitionless_windows(plan)
        if hits:
            failures.append((name, hits[:2]))
    assert not failures, failures
