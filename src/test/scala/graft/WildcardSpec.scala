package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn.TableStore

/** Wildcard tables (TableStore.readWildcard + Sql.runWildcard): union of
  * matching shards with the `_TABLE_SUFFIX` pseudo-column; suffix
  * predicates must PRUNE non-matching shards out of the optimized plan
  * (per-branch literal → constant-folded filter → eliminated scan), and
  * schema-drifted shards must align by name with null-fill. */
class WildcardSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore() = {
    val wh = Files.createTempDirectory("wild_wh").toString
    new TableStore(spark, wh)
  }

  private def shard(store: TableStore, name: String, ks: Int*): Unit = {
    import spark.implicits._
    store.overwrite(name, ks.map(k => (k, s"r$k")).toDF("k", "v"))
  }

  test("union carries _TABLE_SUFFIX; only prefix-extending names match") {
    val store = freshStore()
    shard(store, "ev_a", 1, 2)
    shard(store, "ev_b", 3)
    shard(store, "ev", 99) // the bare prefix itself is NOT a match
    shard(store, "other", 7)
    val got = store.readWildcard("ev_")
      .select(col("_TABLE_SUFFIX"), col("k")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 1), ("a", 2), ("b", 3)))
  }

  test("suffix predicate prunes shard scans from the optimized plan") {
    val store = freshStore()
    (1 to 5).foreach(i => shard(store, s"d_200$i", i))
    val df = store.readWildcard("d_")
      .filter(col("_TABLE_SUFFIX") >= "2002" && col("_TABLE_SUFFIX") <= "2003")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
    }
    assert(scans.length == 2,
      s"expected 2 surviving shard scans, plan has ${scans.length}")
    assert(df.select(sum(col("k"))).first.getLong(0) == 2 + 3)
  }

  test("metadata-level suffixPred never plans the excluded shards") {
    val store = freshStore()
    (1 to 5).foreach(i => shard(store, s"d_200$i", i))
    val df = store.readWildcard("d_", s => s == "2001" || s == "2005")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
    }
    assert(scans.length == 2)
    assert(df.select(sum(col("k"))).first.getLong(0) == 1 + 5)
  }

  test("schema drift across shards aligns by name with null-fill") {
    import spark.implicits._
    val store = freshStore()
    store.overwrite("s_old", Seq((1, "a")).toDF("k", "v"))
    store.overwrite("s_new", Seq((2, "b", 9.5)).toDF("k", "v", "score"))
    val got = store.readWildcard("s_")
      .select(col("_TABLE_SUFFIX"), col("k"), col("score")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(("old", 1, None), ("new", 2, Some(9.5))))
  }

  test("no matching shard is loud, not an empty scan") {
    val store = freshStore()
    shard(store, "x_1", 1)
    intercept[IllegalArgumentException](store.readWildcard("y_"))
  }

  test("SQL front-end: wildcard ref + _TABLE_SUFFIX WHERE, shards pruned") {
    val store = freshStore()
    import spark.implicits._
    (1 to 4).foreach(i => store.overwrite(s"ord_199$i",
      Seq((i * 10, i * 1.5)).toDF("k", "price")))
    val out = graft.ops.Sql.runWildcard(spark, store, "/root/testdata/sf0.001",
      """SELECT _TABLE_SUFFIX AS sh, SUM(k) AS sk
        |FROM `p.d.ord_*`
        |WHERE _TABLE_SUFFIX IN ('1992', '1994')
        |GROUP BY _TABLE_SUFFIX ORDER BY sh""".stripMargin)
    val scans = out.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
    }
    assert(scans.length == 2)
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("1992", 20L), ("1994", 40L)))
  }
}
