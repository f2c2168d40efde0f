package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.psn.TableStore

/** Append change feed: hard-linked append-only mirror of a table's
  * appended files, consumed by a plain file stream source. Invariants:
  * each appended file feeds exactly once; enable bootstraps the current
  * snapshot; layout commits (compact) feed nothing while their GC cannot
  * take fed bytes away (hard links); rewriting commits and partitioned
  * appends on a feed-enabled table are loud; truncate reclaims backlog
  * without touching table data.
  */
class FeedSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshStore(): (TableStore, String) = {
    val wh = Files.createTempDirectory("feed_wh").toString
    (new TableStore(spark, wh), wh)
  }

  private def feedFiles(wh: String, t: String): Seq[String] = {
    val d = Paths.get(wh, t, "_feed")
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  test("enable bootstraps the snapshot; appends feed exactly once") {
    val (store, wh) = freshStore()
    store.append("t", Seq((1L, "a"), (2L, "b")).toDF("k", "s").coalesce(1))
    store.enableFeed("t")
    assert(feedFiles(wh, "t").nonEmpty)
    store.append("t", Seq((3L, "c")).toDF("k", "s").coalesce(1))
    store.append("t", Seq((4L, "d")).toDF("k", "s").coalesce(1))
    val feed = spark.read.parquet(Paths.get(wh, "t", "_feed").toString)
    assert(feed.count() == 4) // every row exactly once, no duplicates
    assert(feed.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("compaction feeds nothing and cannot unlink fed bytes") {
    val (store, wh) = freshStore()
    store.append("t", Seq((1L, "a")).toDF("k", "s").coalesce(1))
    store.enableFeed("t")
    (2 to 4).foreach(i =>
      store.append("t", Seq((i.toLong, s"r$i")).toDF("k", "s").coalesce(1)))
    val before = feedFiles(wh, "t").toSet
    require(store.compact("t")) // new version; old files GC'd next commit
    store.append("t", Seq((5L, "e")).toDF("k", "s").coalesce(1))
    require(store.compact("t")) // second commit: first version's dirs GC'd
    val after = feedFiles(wh, "t").toSet
    // compaction added nothing; the appends added exactly their files
    assert((after -- before).nonEmpty && before.subsetOf(after))
    // fed bytes survive the GC of the version dirs they came from
    val feed = spark.read.parquet(Paths.get(wh, "t", "_feed").toString)
    assert(feed.select("k").as[Long].collect().sorted.toSeq ==
      (1L to 5L).toSeq)
    // and the TABLE itself never double-counts (feed files are outside
    // the data-file walk even for flat layouts)
    assert(store.read("t").count() == 5)
    assert(store.countRows("t") == 5)
  }

  test("rewriting commits and hive appends are loud under a feed") {
    val (store, _) = freshStore()
    store.append("t", Seq((1L, "a")).toDF("k", "s"))
    store.enableFeed("t")
    intercept[IllegalArgumentException](
      store.overwrite("t", Seq((9L, "z")).toDF("k", "s")))
    intercept[IllegalArgumentException](
      store.mergeWith("t")(cur => cur))
    intercept[IllegalArgumentException](
      store.appendPartitioned("t", Seq((2L, "b")).toDF("k", "s"), "s"))
    // a hive-partitioned table cannot enable the feed at all
    val (store2, _) = freshStore()
    store2.appendPartitioned("p", Seq((1L, "x")).toDF("k", "s"), "s")
    intercept[IllegalArgumentException](store2.enableFeed("p"))
  }

  test("truncateFeed reclaims backlog without touching table data") {
    val (store, wh) = freshStore()
    store.append("t", Seq((1L, "a")).toDF("k", "s").coalesce(1))
    store.enableFeed("t")
    assert(feedFiles(wh, "t").nonEmpty)
    store.truncateFeed("t", olderThanMs = 0L)
    assert(feedFiles(wh, "t").isEmpty)
    assert(store.read("t").count() == 1)
  }
}
