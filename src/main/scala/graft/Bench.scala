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
      // ContextCleaner frees broadcast/shuffle blocks only when the driver
      // GCs; the default periodic-GC interval (30min) outlives the whole
      // suite, and in local mode driver + executor share one heap — stale
      // broadcast blocks from 115 warmup runs squeeze the storage pool
      // that cache-reliant queries (e06's Lloyd intermediates) depend on
      // (measured: e06 16.7 s inside the full suite vs 1.9 s isolated).
      // A real cluster self-heals (per-executor heaps, natural driver GC);
      // local[32] needs the nudge.
      .config("spark.cleaner.periodicGC.interval", "45s")
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
    // Local-iteration knob: time each query REPS times and report the MIN.
    // The box's wall-clock noise dwarfs real deltas (t23 measured 7.7-35 s
    // across unchanged runs; host oversubscription inflated a full suite
    // 1.7× with the guest idle); min-of-k isolates the code's cost from
    // scheduler interference. Default is min-of-2 so unattended driver
    // runs get one retry against weather; set SPARK_GRAFT_REPS=1 for a
    // quick single shot or higher for paired A/B measurement.
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(2)
    // A query that THROWS must never masquerade as a fast one — round 5's
    // bench recorded the whole event family at ~0.05 s while every run
    // failed at scan time (regenerated testdata changed a physical type).
    // Failures are tracked per query and published in the artifacts.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val results = queries.map { case (name, fn) =>
      val dt = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)) } catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val d = (System.nanoTime() - t0) / 1e9
        // Isolate queries: persisted intermediates (MinHash sketches etc.)
        // must bill the query that built them, not skew its neighbors via
        // memory pressure.
        spark.catalog.clearCache()
        d
      }.min
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errs}"""
    // The driver parses the bench JSON from a 2000-char stdout tail (measured
    // from BENCH_r03.json), and sbt appends a ~75-char "[success]" footer —
    // so the printed line must stay under ~1900 chars FOREVER, at any suite
    // size. Full names at full precision blew it two rounds running
    // (BENCH_r02/r03 "parsed": null). stdout therefore gets short query keys
    // (the unique "q01"/"t17"/… prefix of each name) at 3 decimals; the
    // full-name full-precision line goes to BENCH_LAST.json, the durable
    // artifact committed alongside.
    def shortKey(name: String): String = {
      val cut = name.indexOf('_')
      if (cut > 0) name.substring(0, cut) else name
    }
    def ms3(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    val shortQs = results
      .map { case (k, v) => s"\"" + shortKey(k) + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    // Subset runs (SPARK_GRAFT_ONLY) are profiling probes — keep them out
    // of the committed full-suite artifact.
    val defaultOut =
      if (only.isDefined) "/tmp/BENCH_SUBSET.json" else "BENCH_LAST.json"
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    val shortLine =
      s"""{"metric":"total","value":${ms3(total)},"unit":"sec","queries":$shortQs,"sf":"$sfDir","nerr":${failed.size},"detail":"$out"}"""
    println(shortLine)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
