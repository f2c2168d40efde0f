package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps3

/** Winnowing (t39) against an in-memory reference implementation, plus
  * the two properties the scheme is FOR (Schleimer et al., SIGMOD '03):
  * the match guarantee — any shared token run of length ≥ w+k−1 yields a
  * shared fingerprint hash — and the density bound — at most one
  * selection per window start. */
class WinnowingSpec extends AnyFunSuite {
  import TestSpark._

  private val K = 4
  private val W = 5
  private val Base = 1048576L

  /** Reference winnowing: same hash, same leftmost-min tiebreak. */
  private def reference(text: String): Set[(Long, Long)] = {
    val t = text.split(" ", -1)
    if (t.length < K) return Set.empty
    val md = MessageDigest.getInstance("MD5")
    val hv = (0 to t.length - K).map { i =>
      val g = t.slice(i, i + K).mkString(" ")
      val hex = md.digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val ng = hv.length
    (0 to ng - W).map { s =>
      (s until s + W).map(p => hv(p) * Base + p).min
    }.toSet.map((k: Long) => (k % Base, k / Base))
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] = {
    import spark.implicits._
    TextOps3.winnowTransform(docs.toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
  }

  test("matches the in-memory reference on varied documents") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 25L).map { i =>
      val n = rnd.nextInt(30) // includes gram-free and window-free docs
      i -> Seq.fill(n + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = run(docs)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) == reference(text),
        s"doc $id mismatch")
    }
  }

  test("guarantee: docs sharing >= w+k-1 tokens share a fingerprint hash") {
    val shared = (1 to W + K - 1).map(i => s"run$i").mkString(" ")
    val a = 0L -> s"x1 x2 x3 x4 x5 $shared y1 y2 y3 y4 y5"
    val b = 1L -> s"z1 z2 z3 z4 z5 z6 z7 $shared w1 w2 w3 w4"
    val got = run(Seq(a, b))
    val hashes = got.mapValues(_.map(_._2))
    assert(hashes(0L).intersect(hashes(1L)).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint on a shared run")
  }

  test("density: at most one selection per window start") {
    val rnd = new scala.util.Random(11)
    val text = Seq.fill(200)("tk" + rnd.nextInt(40)).mkString(" ")
    val got = run(Seq(0L -> text))(0L)
    val nWindows = (200 - K + 1) - W + 1
    assert(got.nonEmpty && got.size <= nWindows)
  }
}
