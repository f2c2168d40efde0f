package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.psn.{FileStats, TableStore}

/** Per-file Bloom filters in the stats sidecar: equality skipping where
  * range stats cannot prune (hash-distributed high-cardinality keys).
  * Asserts the contract end-to-end: range-only keeps everything, blooms
  * prune, results never change, filters survive commits (carried by
  * relPath or rebuilt per the recorded spec), and ineligible column
  * types are refused loudly.
  */
class BloomSkipSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def eqPred(k: Long) =
    Seq(FileStats.eqTo("k", FileStats.LLong(k)))

  test("blooms prune point lookups that range stats keep; results identical") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bl").toString
    val store = new TableStore(spark, wh)
    val df = (1L to 4096L).map(k => (k, s"v$k")).toDF("k", "v")
    store.overwrite("t", df.repartition(8, col("k")))
    store.analyze("t")
    val (rangeKept, total) = store.pruneInfo("t", eqPred(2048L))
    assert(total == 8 && rangeKept == total,
      s"hash layout must defeat range stats (kept $rangeKept/$total)")
    val covered = store.analyzeBloom("t", Seq("k"),
      expectedItemsPerFile = 4096L, fpp = 0.01)
    assert(covered == total)
    val (bloomKept, _) = store.pruneInfo("t", eqPred(2048L))
    assert(bloomKept >= 1 && bloomKept < total)
    // Pruned read returns exactly the looked-up row...
    assert(store.readWhere("t", eqPred(2048L))
      .as[(Long, String)].collect().toSeq == Seq((2048L, "v2048")))
    // ...and an ABSENT key returns empty, never an error (bloom may keep
    // a false-positive file; the residual filter erases it).
    assert(store.readWhere("t", eqPred(999999L)).count() == 0)
  }

  test("filters survive a rewriting commit via the recorded spec") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bl2").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t",
      (1L to 2048L).map(k => (k, k % 7)).toDF("k", "grp")
        .repartition(4, col("k")))
    store.analyzeBloom("t", Seq("k"), expectedItemsPerFile = 2048L,
      fpp = 0.01)
    // mergeWith rewrites every file (new names): maintainStats must
    // rebuild the filters from the sidecar-recorded spec.
    store.mergeWith("t")(d => d.filter("k <= 1500").repartition(4, col("k")))
    val (kept, total) = store.pruneInfo("t", eqPred(700L))
    assert(total > 1 && kept < total,
      s"blooms must survive the commit (kept $kept/$total)")
    assert(store.readWhere("t", eqPred(700L)).count() == 1)
    assert(store.readWhere("t", eqPred(1800L)).count() == 0) // merged away
  }

  test("appends get filters on the next analyze; old files carry forward") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bl3").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", (1L to 1024L).map(k => (k, "a")).toDF("k", "s")
      .repartition(4, col("k")))
    store.analyzeBloom("t", Seq("k"), expectedItemsPerFile = 1024L,
      fpp = 0.01)
    store.append("t", (2000L to 2100L).map(k => (k, "b")).toDF("k", "s")
      .repartition(2, col("k")))
    val covered = store.analyze("t") // plain analyze maintains the opt-in
    assert(covered == store.fileCount("t"))
    val (kept, total) = store.pruneInfo("t", eqPred(2050L))
    assert(kept < total && store.readWhere("t", eqPred(2050L)).count() == 1)
  }

  test("IN-list lookups prune per key and keep the union of survivors") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bl5").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t",
      (1L to 4096L).map(k => (k, k % 3)).toDF("k", "m")
        .repartition(8, col("k")))
    store.analyzeBloom("t", Seq("k"), expectedItemsPerFile = 4096L,
      fpp = 0.01)
    val pred = Seq(FileStats.in("k",
      Seq(100L, 2000L, 3999L).map(FileStats.LLong(_))))
    val (kept, total) = store.pruneInfo("t", pred)
    assert(kept >= 1 && kept < total)
    assert(store.readWhere("t", pred).select("k")
      .as[Long].collect().sorted.toSeq == Seq(100L, 2000L, 3999L))
    // absent keys in the list never lose present ones
    val mixed = Seq(FileStats.in("k",
      Seq(100L, 999999L).map(FileStats.LLong(_))))
    assert(store.readWhere("t", mixed).count() == 1)
  }

  test("string keys bloom; ineligible types are loud") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bl4").toString
    val store = new TableStore(spark, wh)
    store.overwrite("s",
      (1 to 512).map(i => (s"doc_$i", i * 1.5)).toDF("id", "score")
        .repartition(4, col("id")))
    store.analyzeBloom("s", Seq("id"), expectedItemsPerFile = 512L,
      fpp = 0.01)
    val pred = Seq(FileStats.eqTo("id", FileStats.LString("doc_300")))
    val (kept, total) = store.pruneInfo("s", pred)
    assert(kept < total)
    assert(store.readWhere("s", pred).count() == 1)
    assert(intercept[IllegalArgumentException] {
      store.analyzeBloom("s", Seq("score"))
    }.getMessage.contains("integral and string"))
  }
}
