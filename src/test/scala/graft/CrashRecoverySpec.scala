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
}
