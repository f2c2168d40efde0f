package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps3

/** t41's reason to exist, proven on a corpus built to exhibit the failure:
  * a duplicate family whose members' PER-DOCUMENT hash buckets fall on
  * opposite sides of the t14 split line. The doc-level split leaks the
  * family across train/eval; the cluster-level split (t41) keeps it on
  * one side by construction. The gate oracle (sf0.01) checks values; this
  * spec checks the PROPERTY on a corpus where the contrast is guaranteed
  * to materialize.
  */
class LeakageSplitSpec extends AnyFunSuite {
  import TestSpark._

  /** The t14/t34 bucket function, recomputed driver-side:
    * first 8 md5 hex chars of the salted key, base-16, mod 100. */
  private def bucket(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100
  }

  test("cluster-level split keeps a doc-hash-straddling dup family together") {
    // Two ids whose per-document 80/20 buckets straddle the line — the
    // naive split would send one copy to train and one to eval.
    val ids = 0L until 200L
    val trainId = ids.find(i => bucket(s"split:$i") < 80).get
    val evalId = ids.find(i => bucket(s"split:$i") >= 80).get

    val dupText = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi " +
      "psi omega one two three four five six seven eight nine ten")
    val fillers = Seq(
      "solar wind carries charged particles far beyond the outer planets",
      "the harvest festival begins when the first frost touches the valley",
      "compilers translate source programs into executable machine code",
      "migratory birds navigate by starlight magnetism and coastline shape")

    import spark.implicits._
    val rows = Seq(
      (trainId, dupText),
      (evalId, dupText)) ++
      fillers.zipWithIndex.map { case (t, i) => (1000L + i, t) }
    val docs = rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'syn' AS source",
        "CAST(length(text) AS LONG) AS n_chars")

    val split = TextOps3.t41Of(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

    // The family is one cluster, labeled by its smallest member...
    val lab = math.min(trainId, evalId)
    assert(split(trainId)._1 == lab && split(evalId)._1 == lab)
    // ...and BOTH copies share one split side (zero leakage), while the
    // per-document hash provably separates them.
    assert(split(trainId)._2 == split(evalId)._2)
    assert(bucket(s"split:$trainId") < 80 && bucket(s"split:$evalId") >= 80)
    // Every document is assigned exactly one side.
    assert(split.size == rows.size &&
      split.values.forall(v => v._2 == "train" || v._2 == "heldout"))
  }
}
