package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomOps

/** The Bloom membership probe ([[graft.functions.BloomContainsLong]]) —
  * the broadcast-sketch primitive behind t34's zero-shuffle
  * decontamination. Gates the two halves of the Bloom contract and the
  * codegen/interpreted agreement the t34 plan relies on (flat projection
  * runs generated code; the `exists` lambda evaluates interpreted). */
class BloomSpec extends AnyFunSuite {
  import TestSpark._

  private def filterOf(keys: Seq[Long]): Array[Byte] = {
    import spark.implicits._
    BloomOps.toBytes(
      keys.toDF("h").stat.bloomFilter("h", math.max(keys.size, 1000L), 1e-6))
  }

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 2654435761L + 17)
    val bytes = filterOf(keys)
    val misses = keys.toDF("h")
      .filter(!BloomOps.bloom_contains_long(bytes, col("h")))
      .count()
    assert(misses == 0L)
  }

  test("absent keys overwhelmingly probe false (fpp 1e-6 setting)") {
    import spark.implicits._
    val inserted = (0L until 5000L).map(i => i * 2654435761L + 17)
    val bytes = filterOf(inserted)
    val disjoint = (0L until 20000L).map(i => i * 7046029254386353L + 3)
    val hits = disjoint.toDF("h")
      .filter(BloomOps.bloom_contains_long(bytes, col("h")))
      .count()
    assert(hits <= 2, s"expected ~0 false positives out of 20000, got $hits")
  }

  test("interpreted lambda probe agrees with the codegen'd flat probe") {
    import spark.implicits._
    val inserted = (10L until 60L).map(_ * 31)
    val bytes = filterOf(inserted)
    val probes = (0L until 2000L).toDF("k")
    val flat = probes // whole-stage codegen path (doGenCode)
      .select(col("k"), BloomOps.bloom_contains_long(bytes, col("k")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaLambda = probes // HOF lambdas evaluate interpreted (nullSafeEval)
      .select(col("k"),
        exists(array(col("k")),
          e => BloomOps.bloom_contains_long(bytes, e)).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flat == viaLambda)
    assert(inserted.forall(k => flat.getOrElse(k, false)))
  }

  test("t34's probe shape: map-only flagging, one exchange to the verdict") {
    // The scale claim behind t34: probing a corpus against the broadcast
    // filter shuffles NOTHING (exists over the per-doc gram array — no
    // explode), and the corpus-wide verdict pays exactly one exchange
    // (partial agg → single-partition final). Assert it on the physical
    // plan, not on prose.
    val bytes = filterOf((0L until 100L).toSeq)
    val probe = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        exists(ext.TextOps2.wordGrams(8),
          g => BloomOps.bloom_contains_long(bytes, xxhash64(g)))
          .as("bloom_hit"))
    assert(!probe.queryExecution.executedPlan.toString.contains("Exchange"),
      "bloom probe must be map-only")
    val verdict = probe.agg(
      sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_flagged"))
    val exchanges = "Exchange".r
      .findAllIn(verdict.queryExecution.executedPlan.toString).size
    assert(exchanges == 1,
      s"corpus verdict should pay exactly one exchange, saw $exchanges")
    verdict.collect() // and it runs
  }
}
