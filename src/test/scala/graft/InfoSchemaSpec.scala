package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn.{MvAgg, TableStore}

/** INFORMATION_SCHEMA views (TableStore.informationSchemaTables/Columns):
  * table kinds classified, metadata-only row counts, declared schemas
  * surfaced post-evolution. */
class InfoSchemaSpec extends AnyFunSuite {
  import TestSpark._

  test("TABLES classifies kinds and counts rows from footers only") {
    import spark.implicits._
    val store = new TableStore(spark,
      Files.createTempDirectory("is_wh").toString)
    store.overwrite("t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    store.append("t", Seq((3, "c")).toDF("k", "v"))
    store.cloneTable("t", "snap", snapshot = true)
    store.createMaterializedView("m", "t", Seq("v"),
      Seq(MvAgg("n", "COUNT", "*")))
    val got = store.informationSchemaTables()
      .select(col("table_name"), col("table_type"), col("n_rows"),
        col("n_columns"))
      .orderBy("table_name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == Seq(
      ("m", "MATERIALIZED VIEW", 3L, 2),
      ("snap", "SNAPSHOT", 3L, 2),
      ("t", "BASE TABLE", 3L, 2)))
  }

  test("COLUMNS shows the DECLARED schema after metadata-only evolution") {
    import spark.implicits._
    val store = new TableStore(spark,
      Files.createTempDirectory("is_wh2").toString)
    store.overwrite("e", Seq((1, "a")).toDF("k", "v"))
    assert(store.addColumn("e", "score", "DOUBLE"))
    val cols = store.informationSchemaColumns()
      .filter(col("table_name") === "e")
      .orderBy("ordinal_position").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getString(3))).toSeq
    assert(cols == Seq(("k", 1, "INT"), ("v", 2, "STRING"),
      ("score", 3, "DOUBLE")))
  }
}
