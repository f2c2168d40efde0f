package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps4

/** Invariants for the fourth text-operator wave. Exact-value parity is
  * gated by the DuckDB oracle at sf0.01; here we check the model-apply
  * semantics directly against an independent driver-side reimplementation. */
class TextOps4Spec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The t50 scorer, reimplemented from the definition (not the code). */
  private def score(text: String): Long =
    text.split(" ", -1).map { t =>
      val b = java.lang.Long.parseLong(md5hex("feat:" + t).take(8), 16) % 64
      b * 2654435761L % 1001L - 500L
    }.sum

  test("t50 classifier: every doc covered; kept == score>0; scores match a direct reimplementation") {
    val r = TextOps4.t50QualityClassifier(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r.length == docs.size, "one verdict per document")
    r.foreach { x =>
      val (id, n, raw, kept) =
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3))
      val text = docs(id)
      assert(n == text.split(" ", -1).length)
      assert(raw == score(text), s"doc $id score mismatch")
      assert(kept == (raw > 0))
    }
    // The toy weights are mean-centered enough that a real corpus must
    // split: an all-kept or all-dropped verdict means the scorer is inert.
    val nk = r.count(_.getBoolean(3))
    assert(nk > 0 && nk < r.length, s"degenerate split: $nk of ${r.length}")
  }
}
