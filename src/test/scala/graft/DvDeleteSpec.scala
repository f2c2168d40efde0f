package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.psn.TableStore

/** Deletion vectors: row-level DELETE as a hard-link commit plus a
  * (file, row-position) vector every read subtracts. Asserts the
  * contract: zero data files rewritten (inode identity), successive
  * deletes merge, time travel keeps pre-delete snapshots (diffVersions
  * reports the rows as removed), rewriting commits materialize and PURGE
  * the vector, compaction carries linked files' entries while rewritten
  * bins materialize theirs, and the metadata COUNT subtracts the vector.
  */
class DvDeleteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def dataFilesOf(wh: String, table: String): Seq[Path] = {
    val d = Paths.get(wh, table)
    val v = Files.readString(d.resolve("_current")).trim
    Files.walk(d.resolve(v)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { f =>
        val rel = d.resolve(v).relativize(f)
        rel.iterator().asScala.forall { seg =>
          val n = seg.toString
          !n.startsWith("_") && !n.startsWith(".")
        }
      }.toSeq
  }

  private def ino(p: Path): Any = Files.getAttribute(p, "unix:ino")

  private def dvExists(wh: String, table: String): Boolean = {
    val d = Paths.get(wh, table)
    val v = Files.readString(d.resolve("_current")).trim
    Files.isDirectory(d.resolve(v).resolve("_dv"))
  }

  test("delete links files, subtracts rows; successive deletes merge") {
    val wh = Files.createTempDirectory("graft_dv").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t",
      (1L to 1000L).map(k => (k, k % 4)).toDF("k", "grp").repartition(4))
    val before = dataFilesOf(wh, "t").map(ino).toSet
    assert(store.deleteRows("t", col("grp") === 0) == 250L)
    assert(dataFilesOf(wh, "t").map(ino).toSet == before,
      "DV delete must hard-link, not rewrite")
    assert(store.read("t").count() == 750)
    assert(store.read("t").filter("grp = 0").count() == 0)
    // second delete merges into the vector
    assert(store.deleteRows("t", col("k") <= 100) == 75L)
    assert(store.read("t").count() == 675)
    assert(store.countRows("t") == 675,
      "metadata COUNT must subtract the vector")
    // a delete matching nothing commits nothing
    val v0 = store.versions("t").max
    assert(store.deleteRows("t", col("k") > 99999) == 0L)
    assert(store.versions("t").max == v0)
  }

  test("time travel keeps pre-delete rows; diffVersions reports removals") {
    val wh = Files.createTempDirectory("graft_dv2").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v"))
    val vPre = store.versions("t").max
    store.deleteRows("t", col("k") <= 10)
    val vPost = store.versions("t").max
    assert(store.readVersion("t", vPre).count() == 100)
    assert(store.readVersion("t", vPost).count() == 90)
    val diff = store.diffVersions("t", vPre, vPost, "k")
    assert(diff.filter("change = 'removed'").count() == 10)
    assert(diff.count() == 10)
  }

  test("rewriting commits materialize the deletes and purge the vector") {
    val wh = Files.createTempDirectory("graft_dv3").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", (1L to 500L).map(k => (k, k % 5)).toDF("k", "grp"))
    store.deleteRows("t", col("grp") === 1)
    assert(dvExists(wh, "t"))
    store.mergeWith("t")(df => df.filter("k <= 400"))
    assert(!dvExists(wh, "t"), "a full rewrite must purge the vector")
    assert(store.read("t").count() == 320) // 400 minus the 80 grp=1 rows
    assert(store.read("t").filter("grp = 1").count() == 0)
  }

  test("compact carries linked files' entries, rewritten bins materialize") {
    val wh = Files.createTempDirectory("graft_dv4").toString
    val store = new TableStore(spark, wh)
    // several small files → all bins rewrite under a big target
    (0 until 4).foreach(i =>
      store.append("t",
        (1L to 100L).map(k => (i * 100L + k, i.toLong)).toDF("k", "src")
          .repartition(1)))
    store.deleteRows("t", col("k") % 2 === 0)
    assert(store.read("t").count() == 200)
    assert(store.compact("t"))
    assert(!dvExists(wh, "t"),
      "all-small bins rewrite: vector should be fully materialized")
    assert(store.read("t").count() == 200)
    assert(store.read("t").filter("k % 2 = 0").count() == 0)

    // large single-file bins hard-link → entries must carry
    val store2 = new TableStore(spark, wh)
    store2.overwrite("u",
      (1L to 1000L).map(k => (k, s"payload_$k")).toDF("k", "v")
        .repartition(3))
    store2.deleteRows("u", col("k") <= 100)
    assert(store2.compact("u", targetBytes = 1L)) // every bin is one file
    assert(dvExists(wh, "u"), "linked bins must carry their DV entries")
    assert(store2.read("u").count() == 900)
    assert(store2.read("u").filter("k <= 100").count() == 0)
  }

  test("readWhere subtracts the vector on pruned scans") {
    val wh = Files.createTempDirectory("graft_dv5").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", (1L to 1000L).map(k => (k, k % 3)).toDF("k", "m"))
    assert(store.cluster("t", "k", 4))
    store.deleteRows("t", col("k") === 42)
    val pred = Seq(graft.psn.FileStats.le("k", graft.psn.FileStats.LLong(100L)))
    assert(store.readWhere("t", pred).count() == 99)
    assert(store.readWhere("t", pred).filter("k = 42").count() == 0)
  }

  test("the statement surface routes predicate DELETEs through the vector") {
    val wh = Files.createTempDirectory("graft_dv6").toString
    val store = new TableStore(spark, wh)
    store.overwrite("t", (1L to 100L).map(k => (k, k % 2)).toDF("k", "par"))
    val files = store.fileCount("t")
    val n = graft.ops.Sql.runDeleteWhere(spark, store,
      "DELETE FROM `graft-project.store.t` WHERE par = 1;")
    assert(n == 50L)
    assert(store.fileCount("t") == files)
    assert(store.read("t").count() == 50)
    // feed tables refuse row-level deletes (consumers read raw files)
    val store3 = new TableStore(spark, wh)
    store3.overwrite("f", Seq((1L, "a")).toDF("k", "v"))
    store3.enableFeed("f")
    assert(intercept[IllegalArgumentException] {
      store3.deleteRows("f", col("k") === 1)
    }.getMessage.contains("feed"))
  }
}
