package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn.FakePsnClient

/** DataSource V2 "psn" source: paged scan, schema, column pruning parity
  * with the driver-side createDataFrame ingestion path. */
class PsnSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def titles = spark.read.format("graft.sources.PsnSource")
    .option("table", "titles").option("pageSize", "2").load()

  test("titles scan returns every record across pages") {
    assert(titles.count() == FakePsnClient.default.titleStats().size)
    // 3 titles, pageSize 2 → 2 partitions (pages fetch concurrently)
    assert(titles.rdd.getNumPartitions == 2)
  }

  test("column pruning reaches the source") {
    val pruned = titles.select("title_id")
    val plan = pruned.queryExecution.executedPlan.toString
    // BatchScan lists exactly the pruned output columns
    assert(plan.contains("BatchScan psn.titles[title_id#"))
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("CUSA_00001", "CUSA_00002", "PPSA_10003"))
  }

  test("filter pushdown reaches the page readers") {
    // play_count > 100 matches only Gamma Souls (133): both pages are
    // planned (planning sees only a count, not content), and the pushed
    // predicate drops non-matching rows inside each reader.
    val filtered = titles.filter(col("play_count") > 100)
    assert(filtered.rdd.getNumPartitions == 2)
    assert(filtered.collect().map(_.getAs[String]("title_id")).toSeq ==
      Seq("PPSA_10003"))
    // the scan advertises what it pushed
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedFilters: [GreaterThan(play_count,100)]"))
    val one = titles.filter(col("title_id") === "CUSA_00002")
    assert(one.collect().map(_.getAs[Long]("play_count")).toSeq == Seq(7))
  }

  test("planning performs no record fetch — metadata count only") {
    // The r7 design fetched the full title list on the driver at plan
    // time to prune pages; this asserts the fix: planInputPartitions may
    // consult titleCount() (record-free metadata) but never titleStats().
    import java.util.concurrent.atomic.AtomicInteger
    val stats = new AtomicInteger(0)
    val counts = new AtomicInteger(0)
    val counting = new graft.psn.PsnClient {
      private val inner = FakePsnClient.default
      override def profileTrophies() = inner.profileTrophies()
      override def titleStats() = {
        stats.incrementAndGet(); inner.titleStats()
      }
      override def titleCount() = {
        counts.incrementAndGet(); inner.titleCount()
      }
    }
    val saved = graft.sources.PsnSource.clientFactory
    graft.sources.PsnSource.clientFactory = () => counting
    try {
      val b = new graft.sources.PsnScanBuilder("titles", pageSize = 2)
      b.pushFilters(Array(
        org.apache.spark.sql.sources.GreaterThan("play_count", 100L)))
      val parts = b.build().toBatch.planInputPartitions()
      assert(parts.length == 2)
      assert(stats.get() == 0,
        s"plan-time record fetches: ${stats.get()} (must be 0)")
      assert(counts.get() == 1,
        s"plan-time metadata calls: ${counts.get()} (must be 1)")
      // end-to-end through the session: records are fetched only by the
      // page readers (one titleStats per planned page), never at planning
      stats.set(0); counts.set(0)
      val got = titles.filter(col("play_count") > 100)
        .collect().map(_.getAs[String]("title_id")).toSeq
      assert(got == Seq("PPSA_10003"))
      assert(counts.get() >= 1)
      assert(stats.get() == 2,
        s"record fetches: ${stats.get()} (one per planned page, 2 pages)")
    } finally graft.sources.PsnSource.clientFactory = saved
  }

  test("unsupported predicates leave the plan unpruned but correct") {
    val f = titles.filter(col("name").endsWith("Racer"))
    assert(f.rdd.getNumPartitions == 2) // nothing pushed, both pages fetched
    assert(f.collect().map(_.getAs[String]("title_id")).toSeq ==
      Seq("CUSA_00002"))
  }

  test("trophies table yields the single profile row") {
    val t = spark.read.format("graft.sources.PsnSource")
      .option("table", "trophies").load()
    val r = t.head
    assert(t.count() == 1 && r.getAs[Long]("bronze") == 120)
  }

  test("streaming read: each micro-batch is one full API poll") {
    val expected = graft.psn.FakePsnClient.default.titleStats().size
    val stream = spark.readStream.format("graft.sources.PsnSource")
      .option("table", "titles").load()
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("psn_stream_out")
      .start()
    // default trigger: latestOffset advances one poll per trigger; wait for
    // at least two polls (two "days"), then stop.
    val deadline = System.currentTimeMillis() + 60000
    def polled: Long = spark.table("psn_stream_out").count()
    while (polled < 2L * expected && System.currentTimeMillis() < deadline) {
      Thread.sleep(200)
    }
    q.stop()
    val n = polled
    assert(n >= 2L * expected, s"expected >= ${2 * expected} rows, got $n")
    assert(n % expected == 0, s"partial poll: $n not a multiple of $expected")
    // every poll re-reads the full authoritative snapshot
    val perTitle = spark.table("psn_stream_out")
      .groupBy("title_id").count().select("count").distinct().collect()
    assert(perTitle.length == 1)
  }

  test("streaming offsets fast-forward on checkpoint recovery") {
    // A restarted stream deserializes the committed offset before asking
    // for the latest; the poll counter must resume AFTER it, never behind
    // (a fresh instance otherwise restarts at poll 1 and regresses the WAL).
    import graft.sources.{PsnMicroBatchStream, PsnPage, PsnSource}
    val pages = Array[org.apache.spark.sql.connector.read.InputPartition](
      PsnPage(0, 2), PsnPage(2, 2))
    val ms = new PsnMicroBatchStream("titles",
      PsnSource.titlesSchema, () => pages)
    val restored = ms.deserializeOffset("5")
    val next = ms.latestOffset()
    assert(next.json.toLong == 6,
      s"latestOffset after recovery at 5 must be 6, got ${next.json}")
    // (5,6] = one poll = one full page set; (5,5] = nothing
    assert(ms.planInputPartitions(restored, next).length == pages.length)
    assert(ms.planInputPartitions(restored, restored).isEmpty)
  }

  test("source path and createDataFrame path agree after cleanup") {
    val viaSource = titles
      .select(col("title_id"), col("play_count"),
        col("first_played_date_time"))
    val viaDriver = {
      import spark.implicits._
      FakePsnClient.default.titleStats().toDS()
        .select(col("title_id"), col("play_count"),
          col("first_played_date_time"))
    }
    assert(viaSource.exceptAll(viaDriver).count() == 0)
    assert(viaDriver.exceptAll(viaSource).count() == 0)
  }
}
