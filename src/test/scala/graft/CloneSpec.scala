package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn.TableStore

/** CREATE [SNAPSHOT] TABLE … CLONE (TableStore.cloneTable): the clone
  * must be zero-copy (hard links, byte-identical inodes), pin the chosen
  * snapshot while the source keeps evolving, carry sidecars (deletion
  * vector, constraints), and — for SNAPSHOT clones — refuse every write
  * for life while still allowing DROP. */
class CloneSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore() = {
    val wh = Files.createTempDirectory("clone_wh").toString
    (new TableStore(spark, wh), wh)
  }

  private def kv(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def rowsOf(store: TableStore, t: String) =
    store.read(t).orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq

  test("clone is zero-copy: same bytes via hard links, content identical") {
    val (store, wh) = freshStore()
    store.overwrite("src", kv(1 -> "a", 2 -> "b"))
    assert(store.cloneTable("src", "dst") == 1)
    assert(rowsOf(store, "dst") == Seq(1 -> "a", 2 -> "b"))
    // every data file of the clone is the SAME inode as its source twin
    val srcDir = Paths.get(wh, "src", "v1")
    val dstDir = Paths.get(wh, "dst", "v1")
    val parts = Files.list(dstDir).iterator()
    var checked = 0
    while (parts.hasNext) {
      val f = parts.next()
      val n = f.getFileName.toString
      if (!n.startsWith("_") && !n.startsWith(".")) {
        assert(Files.isSameFile(f, srcDir.resolve(n)),
          s"clone file $n is not a hard link of the source's")
        checked += 1
      }
    }
    assert(checked > 0)
  }

  test("clone pins its snapshot; source and clone evolve independently") {
    val (store, _) = freshStore()
    store.overwrite("src", kv(1 -> "a", 2 -> "b")) // v1
    store.cloneTable("src", "pin")
    store.mergeWith("src")(_.filter(col("k") =!= 2)) // src v2
    assert(rowsOf(store, "src") == Seq(1 -> "a"))
    assert(rowsOf(store, "pin") == Seq(1 -> "a", 2 -> "b"))
    // and the clone is writable the other way too
    store.mergeWith("pin")(_.filter(col("k") =!= 1))
    assert(rowsOf(store, "pin") == Seq(2 -> "b"))
    assert(rowsOf(store, "src") == Seq(1 -> "a"))
  }

  test("clone FOR VERSION AS OF takes the retained earlier snapshot") {
    val (store, _) = freshStore()
    store.overwrite("src", kv(1 -> "a")) // v1
    store.mergeWith("src")(_.withColumn("v", lit("A"))) // v2
    store.cloneTable("src", "old", asOfVersion = Some(1))
    assert(rowsOf(store, "old") == Seq(1 -> "a"))
    intercept[IllegalArgumentException](
      store.cloneTable("src", "gone", asOfVersion = Some(99)))
  }

  test("clone carries the deletion vector and CHECK constraints") {
    val (store, _) = freshStore()
    store.overwrite("src", kv(1 -> "a", 2 -> "b", 3 -> "c"))
    store.addConstraint("src", "k_pos", "k > 0")
    store.deleteRows("src", col("k") === 2) // DV commit, no rewrite
    store.cloneTable("src", "dst")
    assert(rowsOf(store, "dst") == Seq(1 -> "a", 3 -> "c"))
    assert(store.constraints("dst") == Seq("k_pos" -> "k > 0"))
    intercept[Exception] { // inherited constraint enforces on the clone
      store.append("dst", kv(-5 -> "bad"))
    }
  }

  test("snapshot clones refuse every write for life, but DROP works") {
    val (store, _) = freshStore()
    store.overwrite("src", kv(1 -> "a"))
    store.cloneTable("src", "snap", snapshot = true)
    assert(store.isSnapshot("snap") && !store.isSnapshot("src"))
    intercept[IllegalArgumentException](store.append("snap", kv(2 -> "b")))
    intercept[IllegalArgumentException](store.overwrite("snap", kv(2 -> "b")))
    intercept[IllegalArgumentException](
      store.mergeWith("snap")(df => df))
    intercept[IllegalArgumentException](
      store.deleteRows("snap", lit(true)))
    intercept[IllegalArgumentException](store.restore("snap", 1))
    intercept[IllegalArgumentException](store.compact("snap"))
    assert(rowsOf(store, "snap") == Seq(1 -> "a")) // unharmed throughout
    store.drop("snap")
    assert(!store.exists("snap"))
    assert(rowsOf(store, "src") == Seq(1 -> "a")) // shared bytes survive
  }

  test("clone refuses an existing target and a missing source") {
    val (store, _) = freshStore()
    store.overwrite("a", kv(1 -> "x"))
    store.overwrite("b", kv(2 -> "y"))
    intercept[IllegalArgumentException](store.cloneTable("a", "b"))
    intercept[IllegalArgumentException](store.cloneTable("nope", "c"))
  }

  test("SQL verbs: CREATE [SNAPSHOT] TABLE … CLONE with version pin") {
    val (store, _) = freshStore()
    val dir = "/root/testdata/sf0.001"
    graft.ops.Sql.runScript(spark, store, dir,
      """CREATE TABLE `p.d.base` AS
        |  SELECT o_orderkey AS k, o_orderstatus AS v FROM orders;
        |CREATE SNAPSHOT TABLE `p.d.keep` CLONE `p.d.base`;
        |DELETE FROM `p.d.base` WHERE v = 'F';
        |CREATE TABLE `p.d.redo` CLONE `p.d.base` FOR VERSION AS OF 1;
        |""".stripMargin)
    assert(store.isSnapshot("keep") && !store.isSnapshot("redo"))
    val full = store.read("keep").count()
    assert(store.read("redo").count() == full)
    assert(store.read("base").count() < full)
    intercept[IllegalArgumentException] {
      graft.ops.Sql.runScript(spark, store, dir,
        "DELETE FROM `p.d.keep` WHERE v = 'F';")
    }
  }

  test("SQL verb: CLONE FOR SYSTEM_TIME AS OF resolves by commit stamp") {
    val (store, _) = freshStore()
    store.overwrite("t", kv(1 -> "a")) // v1
    Thread.sleep(30)
    val mid = System.currentTimeMillis()
    Thread.sleep(30)
    store.mergeWith("t")(_.withColumn("v", lit("A"))) // v2
    graft.ops.Sql.runScript(spark, store, "/root/testdata/sf0.001",
      s"CREATE TABLE `p.d.t_then` CLONE `p.d.t` FOR SYSTEM_TIME AS OF $mid;")
    assert(rowsOf(store, "t_then") == Seq(1 -> "a"))
  }

  test("SQL verb: CREATE TABLE … COPY is a writable independent copy") {
    val (store, _) = freshStore()
    val dir = "/root/testdata/sf0.001"
    graft.ops.Sql.runScript(spark, store, dir,
      """CREATE TABLE `p.d.src` AS
        |  SELECT o_orderkey AS k, o_orderstatus AS v FROM orders;
        |CREATE TABLE `p.d.cp` COPY `p.d.src`;
        |""".stripMargin)
    val n = store.read("src").count()
    assert(store.read("cp").count() == n)
    assert(!store.isSnapshot("cp")) // writable, unlike SNAPSHOT
    // the two tables share NO future state: mutate each side, other holds
    graft.ops.Sql.runScript(spark, store, dir,
      "DELETE FROM `p.d.cp` WHERE v = 'F';")
    assert(store.read("src").count() == n)
    store.truncate("src")
    assert(store.read("cp").count() > 0)
    // SNAPSHOT pairs with CLONE only (BigQuery's split of the verbs)
    intercept[IllegalArgumentException](graft.ops.Sql.runScript(
      spark, store, dir, "CREATE SNAPSHOT TABLE `p.d.s2` COPY `p.d.cp`;"))
  }

  test("a snapshot-clone crash before commit cannot poison the name") {
    val (store, wh) = freshStore()
    store.overwrite("src", kv(1 -> "a"))
    // simulate the crash window: a claimed-but-never-published version
    // dir carrying the read-only flag (exactly what a snapshot clone
    // leaves if it dies before its CAS commit)
    val orphan = Paths.get(wh, "victim", "v1")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("_snapshot"), "")
    assert(!store.exists("victim") && !store.isSnapshot("victim"))
    // the name is still usable: a later CREATE claims past the orphan
    store.overwrite("victim", kv(2 -> "b"))
    assert(rowsOf(store, "victim") == Seq(2 -> "b"))
    assert(!store.isSnapshot("victim")) // and it is writable
    store.append("victim", kv(3 -> "c"))
    // while a COMMITTED snapshot still refuses writes
    store.cloneTable("src", "snap", snapshot = true)
    assert(store.isSnapshot("snap"))
    intercept[IllegalArgumentException] { store.append("snap", kv(9 -> "z")) }
  }
}
