"""Named job metrics via DataFrame.observe (SURVEY §2.4 A7)."""

from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.utils.jobcontext import JobContext


def test_observe_counts(spark):
    ctx = JobContext()
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    observed = ctx.observe_counts(
        df, "stage1", rows=F.count(F.lit(1)), max_v=F.max("v")
    )
    observed.write.format("noop").mode("overwrite").save()  # one action
    results = ctx.results()
    assert results["stage1"]["rows"] == 100
    assert results["stage1"]["max_v"] == 198


def test_default_metric_and_table(spark, capsys):
    ctx = JobContext()
    observed = ctx.observe_counts(spark.range(7), "s")
    observed.write.format("noop").mode("overwrite").save()
    out = ctx.print_table()
    assert "s.rows\t7" in out
