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
}
