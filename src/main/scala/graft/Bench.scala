package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated filter for profiling single queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.filter {
      case (n, _) => only.forall(_.contains(n))
    }
    // Execute the WHOLE plan, final ordering and row materialization
    // included: under a bare count() Catalyst's EliminateSorts drops the
    // final sort (and its exchange), so ordered queries would be billed
    // less work than they declare — and less than the DuckDB baseline
    // executes for the same SQL. The noop sink consumes every row
    // without writing.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm-up: run every query once at the smallest SF so classloading,
    // codegen and JIT don't bill the first timed queries.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      queries.foreach { case (_, fn) =>
        try exec(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    }
    spark.catalog.clearCache() // drop warmup caches
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { exec(fn(spark, sfDir)) } catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // Isolate queries: persisted intermediates (MinHash sketches etc.)
      // must bill the query that built them, not skew its neighbors via
      // memory pressure.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout of a 60+-query run gets tail-truncated by log scrapers
    // (BENCH_r02 lost 17 queries mid-JSON) — the file is the durable
    // artifact; stdout stays for the driver's existing contract.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
