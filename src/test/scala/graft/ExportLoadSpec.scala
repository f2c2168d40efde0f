package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn.TableStore

/** EXPORT DATA / LOAD DATA (Sql.runExport / Sql.runLoad): the BigQuery
  * bulk file-exchange statements. Export must honor the wildcard-tail
  * uri and the format option; load must create-or-append (INTO) and
  * truncate-load (OVERWRITE) through the store's commit protocol. */
class ExportLoadSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def freshStore() =
    new TableStore(spark, Files.createTempDirectory("el_wh").toString)

  test("EXPORT DATA parquet honors the wildcard-tail uri; CSV round-trips") {
    val store = freshStore()
    val out = Files.createTempDirectory("el_out").toString
    val p = graft.ops.Sql.runExport(spark, store, dir,
      s"""EXPORT DATA OPTIONS(uri='$out/p/*.parquet', format='PARQUET') AS
         |SELECT o_orderstatus, COUNT(*) AS n FROM orders
         |GROUP BY o_orderstatus""".stripMargin)
    assert(p == s"$out/p")
    val back = spark.read.parquet(s"$out/p")
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(back.except(want).count() == 0 && want.except(back).count() == 0)

    graft.ops.Sql.runExport(spark, store, dir,
      s"""EXPORT DATA OPTIONS(uri='$out/c/*.csv', format='CSV') AS
         |SELECT o_orderstatus, COUNT(*) AS n FROM orders
         |GROUP BY o_orderstatus""".stripMargin)
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$out/c")
    assert(csv.count() == want.count())
  }

  test("EXPORT DATA sees statement-scoped store tables too") {
    import spark.implicits._
    val store = freshStore()
    store.overwrite("mine", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val out = Files.createTempDirectory("el_out2").toString
    graft.ops.Sql.runExport(spark, store, dir,
      s"EXPORT DATA OPTIONS(uri='$out/m/*.parquet', format='PARQUET') AS " +
        "SELECT k, v FROM mine")
    assert(spark.read.parquet(s"$out/m").count() == 2)
  }

  test("LOAD DATA INTO creates then appends; OVERWRITE truncate-loads") {
    import spark.implicits._
    val store = freshStore()
    val stage = Files.createTempDirectory("el_src").toString
    Seq((1, "a")).toDF("k", "v").write.parquet(s"$stage/one")
    Seq((2, "b"), (3, "c")).toDF("k", "v").write.parquet(s"$stage/two")
    assert(graft.ops.Sql.runLoad(spark, store,
      s"LOAD DATA INTO `p.d.t` FROM FILES(uris=['$stage/one'], " +
        "format='PARQUET');") == 1L)
    assert(graft.ops.Sql.runLoad(spark, store,
      s"LOAD DATA INTO `p.d.t` FROM FILES(uris=['$stage/two'], " +
        "format='PARQUET');") == 2L)
    assert(store.read("t").count() == 3)
    assert(graft.ops.Sql.runLoad(spark, store,
      s"LOAD DATA OVERWRITE `p.d.t` FROM FILES(uris=['$stage/one'], " +
        "format='PARQUET');") == 1L)
    assert(store.read("t").count() == 1)
  }

  test("LOAD DATA CSV autodetects header + types") {
    val store = freshStore()
    val stage = Files.createTempDirectory("el_csv")
    Files.createDirectories(stage.resolve("c"))
    Files.writeString(stage.resolve("c/part.csv"), "k,v\n10,x\n20,y\n")
    graft.ops.Sql.runLoad(spark, store,
      s"LOAD DATA INTO `p.d.c` FROM FILES(uris=['$stage/c'], " +
        "format='CSV');")
    assert(store.read("c").agg(sum(col("k"))).first.getLong(0) == 30L)
  }

  test("unsupported formats and malformed uris are loud") {
    val store = freshStore()
    intercept[IllegalArgumentException](graft.ops.Sql.runLoad(spark, store,
      "LOAD DATA INTO `t` FROM FILES(uris=['/x'], format='AVRO');"))
    intercept[IllegalArgumentException](graft.ops.Sql.runLoad(spark, store,
      "LOAD DATA INTO `t` FROM FILES(uris=[/unquoted], format='PARQUET');"))
    intercept[IllegalArgumentException](
      graft.ops.Sql.runExport(spark, store, dir,
        "EXPORT DATA OPTIONS(uri='/x', format='ORC') AS SELECT 1 AS a"))
  }
}
