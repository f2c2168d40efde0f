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

  test("filter pushdown prunes whole pages at plan time") {
    // play_count > 100 matches only Gamma Souls (133) on page 2 of 2 —
    // page 1 (42, 7) must not be planned at all.
    val filtered = titles.filter(col("play_count") > 100)
    assert(filtered.rdd.getNumPartitions == 1)
    assert(filtered.collect().map(_.getAs[String]("title_id")).toSeq ==
      Seq("PPSA_10003"))
    // the scan advertises what it pushed
    assert(filtered.queryExecution.executedPlan.toString
      .contains("PushedFilters: [GreaterThan(play_count,100)]"))
    // title_id equality: same single-page plan
    val one = titles.filter(col("title_id") === "CUSA_00002")
    assert(one.rdd.getNumPartitions == 1)
    assert(one.collect().map(_.getAs[Long]("play_count")).toSeq == Seq(7))
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
