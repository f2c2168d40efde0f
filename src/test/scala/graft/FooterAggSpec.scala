package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet aggregate pushdown: COUNT/MIN/MAX over an unfiltered scan can
  * be answered from file footers alone — at 100 TB the difference between
  * a full-corpus read and a metadata walk. The v2 parquet source supports
  * it behind two confs; this spec proves the plan actually carries
  * `PushedAggregation` (the scan returns pre-aggregated rows) and that
  * the answer matches the default full-scan path bit-for-bit.
  */
class FooterAggSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def statsQuery() =
    spark.read.parquet(s"$sf/orders.parquet")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))

  test("count/min/max are answered from parquet footers (PushedAggregation)") {
    val (plan, pushed) = withConfs(
      // parquet is on the v1 list by default; aggregate pushdown is a
      // v2-scan feature.
      "spark.sql.sources.useV1SourceList" -> "avro,csv,json,kafka,orc,text",
      "spark.sql.parquet.aggregatePushdown" -> "true") {
      val df = statsQuery()
      val rows = df.collect()
      (df.queryExecution.executedPlan.toString, rows.toSeq)
    }
    assert(plan.contains("PushedAggregation"),
      "aggregate did not reach the scan:\n" + plan.take(3000))
    val full = statsQuery().collect().toSeq
    assert(pushed == full,
      s"footer-stats answer diverged: $pushed vs $full")
  }

  test("store minMax skips zero-row files instead of declining") {
    import TestSpark.spark.implicits._
    val store = new graft.psn.TableStore(TestSpark.spark,
      java.nio.file.Files.createTempDirectory("footer_mm").toString)
    // A scan task whose rows are all filtered away still writes a 0-row
    // parquet file with NO chunk stats — it provably contributes nothing
    // to MIN/MAX, so the metadata answer must still be complete (the q71
    // sf0.1 regression). Reproduce the shape: two range-separated source
    // files forced into separate splits, filter keeps only one side.
    val srcDir = java.nio.file.Files.createTempDirectory("footer_mm_src")
      .resolve("src").toString
    (1L to 100L).toDF("k")
      .repartitionByRange(2, org.apache.spark.sql.functions.col("k"))
      .write.parquet(srcDir)
    val spk = TestSpark.spark
    val old = spk.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spk.conf.set("spark.sql.files.maxPartitionBytes", 1024L * 1024)
      store.overwrite("t", spk.read.parquet(srcDir).filter("k <= 2"))
    } finally spk.conf.set("spark.sql.files.maxPartitionBytes", old)
    val files = store.fileCount("t")
    assert(files > 1, s"need empty part files, got $files")
    // the regression is only exercised if a 0-row file really landed
    val conf = TestSpark.spark.sessionState.newHadoopConf()
    val perFile = store.read("t").inputFiles.map(f =>
      graft.psn.FileStats.rowCount(conf,
        java.nio.file.Paths.get(f.stripPrefix("file:"))))
    assert(perFile.contains(0L),
      s"no zero-row file written (rows per file: ${perFile.mkString(",")})")
    assert(store.minMax("t", "k").map { case (_, mn, mx) =>
      (mn.toLong, mx.toLong) } == Some((1L, 2L)))
  }
}
