package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q53's reason to exist, measured: a 2-d box query over a z-ordered
  * layout reads a fraction of the rows the same query reads over a
  * single-column (time-sorted) layout, because the Morton sort gives
  * every file tight min/max statistics on BOTH dimensions and parquet
  * row-group skipping excludes the rest before IO. The corpus gate
  * (q53's DuckDB oracle) proves the ANSWER is layout-independent; this
  * spec proves the layout does what it claims on a corpus big enough for
  * the statistics to bite.
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  /** Rows the parquet reader actually produced (post row-group skip).
    * Runs with AQE off so the scan node is reachable in the executed
    * plan (query stages hide their subtrees from TreeNode.collect). */
  private def scanRows(df: DataFrame): Long = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.collect()
      val scans = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "no FileSourceScanExec in plan")
      scans.map(_.metrics("numOutputRows").value).sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("z-order layout beats a time-sorted layout on a 2-d box query") {
    // AQE off for the whole test: partition coalescing would collapse the
    // 64 range partitions of these (tiny) layouts into a handful of wide
    // files, erasing exactly the statistics granularity under test. (At
    // production file sizes there is nothing to coalesce.)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try zOrderBody()
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def zOrderBody(): Unit = {
    // 200k synthetic events, uniform over a 1024×1024 (user, hour) grid.
    val base = spark.range(200000L).select(
      col("id"),
      pmod(xxhash64(concat(lit("u:"), col("id"))), lit(1024)).as("user"),
      pmod(xxhash64(concat(lit("h:"), col("id"))), lit(1024)).as("hour"),
      (col("id") % 97).cast("double").as("value"))

    val zDir = Files.createTempDirectory("zorder").toString
    val tDir = Files.createTempDirectory("timesorted").toString
    // 256 output files ≈ the min/max granularity parquet row groups give
    // a production-sized file for free; each z file covers a ~64×64
    // (user, hour) tile, each time-sorted file a ~4-hour stripe.
    base
      .withColumn("z", graft.ops.Bucketed.morton16(col("user"), col("hour")))
      .repartitionByRange(256, col("z")).sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(zDir)
    base
      .repartitionByRange(256, col("hour")).sortWithinPartitions(col("hour"))
      .write.mode("overwrite").parquet(tDir)

    // user-narrow × hour-wide box: the single-column (time) sort serves
    // the hour predicate only, so it must read every user for 256 hours;
    // the z tiles serve both predicates at once.
    def box(df: DataFrame): DataFrame = df
      .filter(col("user").between(256, 319) && col("hour").between(256, 511))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))

    assert(box(spark.read.parquet(zDir)).collect().toSeq ==
      box(spark.read.parquet(tDir)).collect().toSeq,
      "the answer must be layout-independent")

    // fresh frames: executedPlan is cached per Dataset, and scanRows
    // needs one planned under AQE-off
    val zRead = scanRows(box(spark.read.parquet(zDir)))
    val tRead = scanRows(box(spark.read.parquet(tDir)))
    // time-sorted reads ~25% of rows (256 of 1024 hours); the z tiles
    // read ~1/16 of that box (64 of 1024 users, tile-quantized). Assert a
    // conservative 3× so range-boundary effects can't flake the test.
    assert(zRead * 3 < tRead,
      s"z-order read $zRead rows, time-sorted read $tRead")
    assert(tRead < 200000L, "time-sorted layout should itself prune")
  }
}
