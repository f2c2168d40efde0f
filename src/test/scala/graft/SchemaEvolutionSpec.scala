package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.psn.TableStore

/** Schema-on-write at the sink: an in-place append whose schema drifts
  * from the table's would land mixed-schema files in one version
  * directory, where a plain parquet read samples a single footer and the
  * new column silently vanishes. The store must fail the APPEND loudly;
  * the supported widening path is a rewriting commit (overwrite /
  * mergeWith) — a new version — so time travel keeps every snapshot's
  * schema intact.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore() = new TableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_evo").toString)

  test("drifting append fails loudly; same-schema append passes") {
    import TestSpark.spark.implicits._
    val store = freshStore()
    store.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    // Same shape, different column ORDER: not drift.
    store.append("t",
      Seq(("c", 3L)).toDF("name", "id").select("name", "id"))
    assert(store.read("t").count() == 3)
    val widened = Seq((4L, "d", 1.5)).toDF("id", "name", "score")
    val e = intercept[IllegalArgumentException] {
      store.append("t", widened)
    }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    val retyped = Seq((5, "e")).toDF("id", "name") // id INT, not BIGINT
    assert(intercept[IllegalArgumentException] {
      store.append("t", retyped)
    }.getMessage.contains("schema drift"))
    assert(store.read("t").count() == 3, "rejected appends must not land")
  }

  test("widening goes through a rewriting commit; time travel keeps old schema") {
    import TestSpark.spark.implicits._
    val store = freshStore()
    store.append("t", Seq((1L, "a")).toDF("id", "name"))
    val v1 = store.versions("t").max
    val widened = store.read("t")
      .withColumn("score", org.apache.spark.sql.functions.lit(0.5))
    store.overwrite("t", widened)
    assert(store.read("t").columns.toSeq ==
      Seq("id", "name", "score"))
    // The appended-to widened table accepts the new shape...
    store.append("t", Seq((2L, "b", 0.9)).toDF("id", "name", "score"))
    assert(store.read("t").count() == 2)
    // ...and rejects the OLD one now.
    assert(intercept[IllegalArgumentException] {
      store.append("t", Seq((3L, "c")).toDF("id", "name"))
    }.getMessage.contains("schema drift"))
    // Time travel: the v1 snapshot still reads with its own schema.
    assert(store.readVersion("t", v1).columns.toSeq == Seq("id", "name"))
  }

  test("partitioned append: partition-column type inference is not drift") {
    import TestSpark.spark.implicits._
    val store = freshStore()
    store.appendPartitioned("p",
      Seq((1L, 20240101L, "x")).toDF("id", "day", "v"), "day")
    // day was written BIGINT but reads back via partition inference —
    // appending the same frame shape must still pass.
    store.appendPartitioned("p",
      Seq((2L, 20240102L, "y")).toDF("id", "day", "v"), "day")
    assert(store.read("p").count() == 2)
    // A genuinely drifted non-partition column still fails.
    assert(intercept[IllegalArgumentException] {
      store.appendPartitioned("p",
        Seq((3L, 20240103L, 9)).toDF("id", "day", "v"), "day")
    }.getMessage.contains("schema drift"))
  }
}
