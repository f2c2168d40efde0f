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

  test("oversized documents fail loudly instead of aliasing the packing") {
    // The (hash,pos) packing holds only while pos < 2^20. Past it the
    // position bits bleed into the hash — and deterministically, so an
    // oracle comparison would AGREE on the garbage. The transform must
    // throw, not answer. (2^20 + k tokens ≈ a 2 MB single doc: rare, but
    // an unchunked book-scale corpus hits it.)
    import spark.implicits._
    val big = Seq.tabulate(1048576 + K)(i => (i % 97).toString).mkString(" ")
    val ex = intercept[Exception] {
      TextOps3.winnowTransform(Seq((1L, big)).toDF("doc_id", "text"))
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("chunk documents")))
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

  test("canonicalized t40 pairs equal the naive all-docs form on a " +
    "duplicated corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a1", "a2", "a3", "a4", "a5", "a6", "a7", "a8")
    val base = (0 until 12).map { i =>
      Seq.fill(20 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    // 3 exact copies of each base text, plus two singletons
    val docs = base.zipWithIndex.flatMap { case (t, i) =>
      (0 until 3).map(c => (i * 10L + c, t))
    } ++ Seq((900L, "only one two three four five six seven eight"),
      (901L, "x1 x2 x3"))
    val df = docs.toDF("doc_id", "text")
    val canonical = graft.ext.TextOps3.winnowPairsOf(spark, df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference: distinct (doc, hash) posting, full-corpus df cap,
    // all-pairs via the hash equi-join
    val posting = graft.ext.TextOps3.winnowTransform(df)
      .select(col("doc_id"), col("hash")).distinct().persist()
    val n = posting.select(countDistinct(col("doc_id"))).collect()(0).getLong(0)
    val hdf = posting.groupBy(col("hash")).agg(count(lit(1)).as("df"))
    val kept = posting.join(hdf, "hash")
      .filter(col("df") * 10 <= lit(n))
      .select(col("doc_id"), col("hash"))
    val naive = kept.toDF("a", "hash")
      .join(kept.toDF("b", "hash"), "hash")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(canonical == naive)
    assert(naive.nonEmpty, "degenerate test corpus: no pairs at all")
  }

  test("density: at most one selection per window start") {
    val rnd = new scala.util.Random(11)
    val text = Seq.fill(200)("tk" + rnd.nextInt(40)).mkString(" ")
    val got = run(Seq(0L -> text))(0L)
    val nWindows = (200 - K + 1) - W + 1
    assert(got.nonEmpty && got.size <= nWindows)
  }
}
