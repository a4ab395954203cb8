"""Memory-pressure execution: the aggregation/sort path must complete and
stay correct when the heap is a fraction of the data (reference:
sqllogictest/test_files/aggregate_memory_spill.slt — DataFusion validates
its hash-agg spill path the same way).

A subprocess JVM gets a ~700 MB heap and runs a high-cardinality
aggregation plus a global sort over the sf0.1 lineitem (≈600 k rows whose
unzipped working set, with 32 shuffle partitions collapsed to 4, forces
Tungsten's external alloc paths).  Assertions are value-level (count and
an exact decimal sum), so a spill-induced wrong answer — not just an OOM —
fails the test.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.memory", "700m")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        # shrink execution memory so external spill paths engage well
        # before the heap limit
        .config("spark.memory.fraction", "0.2")
        .appName("spill_test")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    # high-cardinality agg: one group per (orderkey, linenumber) ~= 600k
    agg = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("s"))
    )
    n = agg.count()
    total = agg.agg(F.sum("s").cast("decimal(38,6)")).collect()[0][0]
    direct = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
    ).collect()[0][0]
    assert total == direct, (total, direct)

    # global sort across the same rows (external sort under the same cap)
    top = li.orderBy(F.col("l_extendedprice").desc()).limit(5).collect()
    assert len(top) == 5
    print("SPILLTEST_OK", n)
    spark.stop()
""")


def test_high_cardinality_agg_under_memory_cap():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SPILLTEST_OK" in proc.stdout, proc.stdout[-500:]
    n = int(proc.stdout.split("SPILLTEST_OK")[1].split()[0])
    assert n > 400_000, n          # sf0.1: 456,861 distinct key pairs

_SMJ_SCRIPT = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.memory", "700m")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.memory.fraction", "0.2")
        # no broadcast: force the big-big merge path the reference tests
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .appName("smj_spill_test")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")

    j = li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in j._jdf.queryExecution().executedPlan().toString()

    # FK integrity: every lineitem row joins exactly once, so the joined
    # decimal sum must equal the direct scan sum — a spill-induced dropped
    # or duplicated row changes it.
    joined_sum = j.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
    ).collect()[0][0]
    direct_sum = li.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
    ).collect()[0][0]
    assert joined_sum == direct_sum, (joined_sum, direct_sum)
    n = j.count()
    print("SMJSPILL_OK", n)
    spark.stop()
""")


def test_sort_merge_join_under_memory_cap():
    """Big-big sort-merge join completes and stays exact under a ~700 MB
    heap (reference sqllogictest sort_merge_join_spill.slt — DataFusion
    validates its SMJ spill path the same way; Spark's counterpart is
    UnsafeExternalSorter spilling during the shuffle sort phase)."""
    proc = subprocess.run(
        [sys.executable, "-c", _SMJ_SCRIPT.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SMJSPILL_OK" in proc.stdout, proc.stdout[-500:]
    n = int(proc.stdout.split("SMJSPILL_OK")[1].split()[0])
    assert n > 590_000, n          # sf0.1 lineitem row count ≈ 600k
