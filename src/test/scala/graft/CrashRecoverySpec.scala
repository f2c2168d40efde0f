package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn.TableStore

/** Crash injection for the merge commit protocol (VERDICT r7 directive 8):
  * a writer that dies between claiming a version directory and publishing
  * its commit marker must leave (a) a readable table, (b) a pointer that
  * never regresses, and (c) an orphan that is eventually collected —
  * age-gated vacuum for idle tables, the normal gc window once commits
  * move past it. VersionedStoreSpec covers racing writers; this covers
  * dead ones. */
class CrashRecoverySpec extends AnyFunSuite {
  import TestSpark._

  private def kv(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def versionDirs(wh: String, table: String): Set[Int] = {
    val d = Paths.get(wh, table)
    val s = Files.list(d)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
      .toSet
    finally s.close()
  }

  private def contents(store: TableStore, table: String) =
    store.read(table).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("crash between claim and publish: readable table, no pointer regression, orphan vacuumed") {
    val wh = Files.createTempDirectory("crash_wh").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", kv(1 -> "a", 2 -> "b")) // v1 committed

    // Inject the crash: f's plan throws mid-job (assert_true on one row),
    // so the claim directory exists and the write died before publish —
    // exactly a writer killed between claimNext and the marker CAS.
    intercept[Exception] {
      store.mergeWith("t") { cur =>
        // filter form: assert_true is NULL on pass (keeps every row) and
        // throws mid-job on the violating row; a projected-then-dropped
        // assert column would be pruned away by Catalyst
        cur.filter(expr("assert_true(k < 2)").isNull)
      }
    }
    assert(versionDirs(wh, "t").contains(2), "crash left no claim dir")

    // "Restart": a fresh store instance over the same warehouse.
    val recovered = new TableStore(spark, wh)
    assert(contents(recovered, "t") == Map(1 -> "a", 2 -> "b"),
      "reader must see the pre-crash committed snapshot")
    assert(recovered.versions("t").max == 1,
      "the half-written version must never become visible")

    // A FRESH orphan is indistinguishable from an in-flight writer, so
    // the default TTL keeps it...
    assert(recovered.vacuum("t").isEmpty)
    assert(versionDirs(wh, "t").contains(2))
    // ...and an EXPIRED one is collected.
    assert(recovered.vacuum("t", olderThanMs = 0L) == Seq(2))
    assert(!versionDirs(wh, "t").contains(2))

    // Recovery merge commits ABOVE the old head — monotone, never a reuse
    // of the crashed writer's published state.
    recovered.mergeWith("t")(cur =>
      cur.withColumn("v", concat(col("v"), lit("+"))))
    assert(recovered.versions("t").max > 1)
    assert(contents(recovered, "t") == Map(1 -> "a+", 2 -> "b+"))
  }

  test("orphan below a moving head ages out through the normal gc window") {
    val wh = Files.createTempDirectory("crash_wh2").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", kv(1 -> "a")) // v1
    intercept[Exception] { // dead claim at v2
      store.mergeWith("t") { cur =>
        cur.filter(expr("assert_true(k < 1)").isNull)
      }
    }
    assert(versionDirs(wh, "t").contains(2))
    // claimNext skips the orphan: the next two commits land at v3, v4.
    store.mergeWith("t")(_.withColumn("v", lit("b"))) // v3
    assert(versionDirs(wh, "t") == Set(1, 2, 3),
      "retention keeps v1 (readers), orphan v2 still within window")
    store.mergeWith("t")(_.withColumn("v", lit("c"))) // v4: gc prev=3
    val left = versionDirs(wh, "t")
    assert(!left.contains(2), s"orphan v2 must age out of retention: $left")
    assert(contents(store, "t") == Map(1 -> "c"))
  }

  test("s24 composite commit: decisions + index growth land in ONE tagged version; replay watermark skips whole batches") {
    import spark.implicits._
    // the growth fixture from StreamsSpec: 4 non-empty batches, batch 0
    // and batch 3 accept new documents, batch 2 is an exact dup
    val docs = Seq(
      (1L, "alpha corpus document body with words"),
      (0L, "bravo fresh increment text body"),
      (8L, "bravo fresh increment text body"),
      (12L, "tango twin text arriving together"),
      (28L, "tango twin text arriving together"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    graft.streaming.Streams.streamIngestOf(spark, docs).collect()
    val store = new TableStore(spark,
      graft.streaming.Streams.s24LastWarehouse.get)
    // one seed commit + one composite commit per non-empty batch —
    // round 13 paid three commits per batch (decisions, exact index,
    // band index) with two crash windows between them
    // chunk 1 of this fixture is empty (no commit): seed + 3 composite
    // commits ran; gc retains the recent window — audit what is readable
    val vs = store.versions("ingest_idx")
    assert(vs.length >= 2 && vs.max == 4,
      s"expected 4 commits (seed + 3 composites), retained window: $vs")
    // the replay watermark is the single guard: any batch id <= 3 skips
    assert(store.txnVersion("ingest_idx", "s24").contains(3L))
    // ATOMICITY: in every batch version, the decision rows and the index
    // rows for that batch's acceptances appear TOGETHER — a version with
    // decisions but missing index growth would be the old crash window
    val decPart = 16 // 2 * IngestBuckets
    def at(v: Int) = store.readVersion("ingest_idx", v)
    vs.sliding(2).foreach { case Seq(prev, cur) =>
      val newDec = at(cur).filter(col("sbkt") === decPart)
        .select("doc_id", "decision").except(
          at(prev).filter(col("sbkt") === decPart)
            .select("doc_id", "decision")).collect()
      val accepted = newDec.filter(_.getString(1) == "new").map(_.getLong(0))
      val newExact = at(cur)
        .filter(col("sbkt") < 8 && col("th").isNotNull)
        .select("doc_id").except(
          at(prev).filter(col("sbkt") < 8).select("doc_id"))
        .collect().map(_.getLong(0)).sorted
      assert(newExact.toSeq == accepted.sorted.toSeq,
        s"v$cur: exact-index growth $newExact != accepted ${accepted.toSeq}")
      case _ => ()
    }
    // the final decision log is complete and correct across the replay
    // chain (no double-appends, no dropped batch)
    val dec = store.readPartitions("ingest_idx", "sbkt", Seq(decPart))
      .select("doc_id", "decision").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(dec == Seq((0L, "new"), (8L, "exact"),
      (12L, "new"), (28L, "new")))
  }

  test("kill mid-transaction-COMMIT: the manifest rolls the whole write set forward (r14 next-2)") {
    val wh = Files.createTempDirectory("crash_txn_wh").toString
    val store = new TableStore(spark, wh)
    store.overwrite("ta", kv(1 -> "a"))
    store.overwrite("tb", kv(2 -> "b"))

    // stage a two-table transaction up to its durability point (claims
    // written, manifest published, ZERO pointers moved) — exactly the
    // state a process killed inside commitTransaction leaves behind
    val manifest = store.stageTransaction(Seq(
      "ta" -> kv(1 -> "a", 10 -> "x"),
      "tb" -> kv(2 -> "b2")))
    assert(Files.exists(manifest))
    // nothing is visible before recovery: readers still see the old head
    assert(contents(store, "ta") == Map(1 -> "a"))
    assert(contents(store, "tb") == Map(2 -> "b"))

    // a NEW process heals at script entry: both tables advance, the
    // manifest retires — all-or-nothing, roll-forward
    val healed = new TableStore(spark, wh)
    assert(healed.recoverTransactions() == 1)
    assert(contents(healed, "ta") == Map(1 -> "a", 10 -> "x"))
    assert(contents(healed, "tb") == Map(2 -> "b2"))
    assert(!Files.exists(manifest))
    // recovery is idempotent: nothing left to heal
    assert(healed.recoverTransactions() == 0)

    // crash BEFORE the durability point (claim staged, no manifest):
    // the transaction never happened — an orphaned claim, swept later
    val preDur = versionDirs(wh, "ta")
    graft.ops.Sql.runScript(spark, healed, "/root/testdata/sf0.001",
      "BEGIN; DELETE FROM ta WHERE k = 10; ROLLBACK")
    assert(versionDirs(wh, "ta") == preDur)
    assert(contents(healed, "ta") == Map(1 -> "a", 10 -> "x"))
  }

  test("recovery replay is idempotent: published entries are skipped, versions never double-publish") {
    val wh = Files.createTempDirectory("crash_txn_wh2").toString
    val store = new TableStore(spark, wh)
    store.overwrite("ta", kv(1 -> "a"))
    store.overwrite("tb", kv(2 -> "b"))
    val manifest = store.stageTransaction(Seq(
      "ta" -> kv(1 -> "a1"),
      "tb" -> kv(2 -> "b1")))
    val content = Files.readString(manifest)
    assert(store.recoverTransactions() == 1)
    val vA = store.versions("ta").max
    val vB = store.versions("tb").max
    // a recovery that crashed AFTER publishing but BEFORE retiring the
    // manifest re-presents it whole on the next boot: every entry's
    // marker already names its version, so replay publishes nothing new
    Files.writeString(manifest, content)
    assert(store.recoverTransactions() == 1)
    assert(store.versions("ta").max == vA &&
      store.versions("tb").max == vB)
    assert(contents(store, "ta") == Map(1 -> "a1"))
    assert(contents(store, "tb") == Map(2 -> "b1"))
    assert(!Files.exists(manifest))
  }
}
