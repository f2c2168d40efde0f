package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.Explain <queryName> <sfDir> [format]`
  * prints the formatted physical plan and times two executions (cold+warm).
  * Used to audit pushdown / broadcast / codegen spans per SURVEY's
  * 100 TB posture checklist. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // rank-filter group limits must cover t59's VerifyCap=4096
      // sample (default threshold 1000 silently disables the pushdown)
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"RUN$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
