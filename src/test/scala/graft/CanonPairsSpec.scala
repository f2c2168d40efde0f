package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Canonicalization equivalence for the LSH/minhash/simhash/vector pair
  * generators (the t26/canonSim argument extended to TextOps and
  * SimilarityOps): on a 7-fold duplicated corpus with INTERLEAVED ids
  * (copy i at id + i·10⁵, so cross-group expansion exercises the
  * (min, max) orientation flip — a contiguous-block scheme would leave it
  * silently uncovered), the representative-level path must reproduce the
  * textbook doc-level computation row for row. The naive references below
  * run the SAME signature + banding machinery over the full duplicated
  * corpus with no canonicalization.
  */
class CanonPairsSpec extends AnyFunSuite {
  import TestSpark._

  private def dupDocs(): DataFrame = {
    val base = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
    (0 until 7).map(i =>
      base.select((col("doc_id") + i * 100000).as("doc_id"), col("lang"),
        col("text"), col("n_chars")))
      .reduce(_ unionAll _)
  }

  test("t07 canonical LSH pairs match the naive doc-level band join on a " +
    "7-fold duplicated corpus") {
    val dup = dupDocs()
    val canonical = ext.TextOps.t07Of(dup).persist()
    val sig = ext.TextOps.minhashSigOf(dup).persist()
    sig.count()
    val reference = ext.TextOps.bandCandidates(sig)
    // duplication must actually create twin pairs (est exactly 1.0), and
    // plenty of them: every group of 7 contributes C(7,2) = 21
    assert(canonical.filter(col("jaccard_est") === 1.0).count() >= 21 * 10)
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist(); sig.unpersist()
  }

  test("t12 canonical clusters match doc-level pointer doubling run on the " +
    "naive duplicated edge list") {
    val dup = dupDocs()
    val canonical = ext.TextOps.t12Of(dup).persist()
    // Reference closure: same label algebra, but over the NAIVE doc-level
    // edges (no canonicalization), iterated to a true fixpoint.
    val sig = ext.TextOps.minhashSigOf(dup).persist()
    sig.count()
    val edges = ext.TextOps.bandCandidates(sig)
      .filter(col("jaccard_est") >= 0.875)
      .select(col("a"), col("b"))
    val adj = edges.union(edges.select(col("b"), col("a")))
      .toDF("src", "dst").localCheckpoint()
    var labels = dup
      .select(col("doc_id"), col("doc_id").as("lab")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = labels
        .join(adj, labels("doc_id") === adj("src"))
        .groupBy(col("dst")).agg(min(col("lab")).as("nlab"))
      val hooked = labels
        .join(nbrMin, labels("doc_id") === nbrMin("dst"), "left")
        .select(col("doc_id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
      val byDoc = labels
        .select(col("doc_id").as("ld"), col("lab").as("llab"))
      val updated = hooked
        .join(byDoc, hooked("lab") === byDoc("ld"), "left")
        .select(col("doc_id"),
          least(col("lab"), coalesce(col("llab"), col("lab"))).as("lab"))
        .localCheckpoint()
      changed = updated.as("u").join(labels.as("l"), "doc_id")
        .filter(col("u.lab") < col("l.lab")).count()
      labels = updated
    }
    val reference = labels.select(col("doc_id"), col("lab").as("cluster"))
    assert(canonical.count() == dup.count())
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist(); sig.unpersist()
  }

  test("t13 canonical simhash pairs match the naive doc-level hamming band " +
    "join on a 7-fold duplicated corpus") {
    val dup = dupDocs()
    val canonical = ext.TextOps.t13Of(dup).persist()
    val sig = ext.TextOps.simhashSigOf(dup).persist()
    sig.count()
    val reference = ext.TextOps.simhashBandedPairs(sig, nBands = 3)
      .filter(col("hamming") <= 2)
    assert(canonical.filter(col("hamming") === 0).count() >= 21 * 10)
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist(); sig.unpersist()
  }

  private def dupVecs(): DataFrame = {
    val base = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    (0 until 7).map(i =>
      base.select((col("vec_id") + i * 100000).as("vec_id"),
        col("embedding")))
      .reduce(_ unionAll _)
  }

  test("e10 canonical cosine pairs match the naive doc-level bucket join " +
    "on 7-fold duplicated vectors") {
    val dup = dupVecs()
    val canonical = ext.SimilarityOps.e10Of(dup).persist()
    val reference = ext.SimilarityOps.naiveLshCosine(dup)
    assert(canonical.filter(col("cos_r") === 1.0).count() >= 21 * 10)
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist()
  }

  test("e05 canonical label-blocked pairs match the naive doc-level join " +
    "on 7-fold duplicated vectors (label folded into the canonical key)") {
    val base = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
    val dup = (0 until 7).map(i =>
      base.select((col("vec_id") + i * 100000).as("vec_id"), col("label"),
        col("embedding")))
      .reduce(_ unionAll _)
    val canonical = ext.SimilarityOps.e05Of(dup).persist()
    val reference = ext.SimilarityOps.naiveLabelCosine(dup)
    assert(canonical.filter(col("cos_r") === 1.0).count() >= 21 * 10)
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist()
  }

  test("m05 canonical frame-fingerprint pairs match the naive doc-level " +
    "posting join on 7-fold duplicated media (fa/fb re-derived per side)") {
    val base = ext.MultimodalOps.media(spark, sf)
      .select(col("media_id"), col("content"))
    val dup = (0 until 7).map(i =>
      base.select((col("media_id") + i * 100000).as("media_id"),
        col("content")))
      .reduce(_ unionAll _)
    val canonical = ext.MultimodalOps.m05Of(dup).persist()
    val reference = ext.MultimodalOps.naiveFrameDedup(dup)
    // twin pairs: n_shared = fa = fb, overlap exactly 1.0
    assert(canonical.filter(col("overlap_r") === 1.0 &&
      col("n_shared") === col("fa")).count() >= 21 * 10)
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist()
  }

  test("e15 canonical clusters match doc-level pointer doubling on the " +
    "naive duplicated vector edges") {
    val dup = dupVecs()
    val canonical = ext.SimilarityOps.e15Of(dup).persist()
    val edges = ext.SimilarityOps.naiveLshCosine(dup)
      .select(col("a"), col("b"))
    val adj = edges.union(edges.select(col("b"), col("a")))
      .toDF("src", "dst").localCheckpoint()
    var labels = dup
      .select(col("vec_id"), col("vec_id").as("lab")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = labels
        .join(adj, labels("vec_id") === adj("src"))
        .groupBy(col("dst")).agg(min(col("lab")).as("nlab"))
      val hooked = labels
        .join(nbrMin, labels("vec_id") === nbrMin("dst"), "left")
        .select(col("vec_id"),
          least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
      val byVec = labels
        .select(col("vec_id").as("lv"), col("lab").as("llab"))
      val updated = hooked
        .join(byVec, hooked("lab") === byVec("lv"), "left")
        .select(col("vec_id"),
          least(col("lab"), coalesce(col("llab"), col("lab"))).as("lab"))
        .localCheckpoint()
      changed = updated.as("u").join(labels.as("l"), "vec_id")
        .filter(col("u.lab") < col("l.lab")).count()
      labels = updated
    }
    val reference = labels.select(col("vec_id"), col("lab").as("cluster"))
    assert(canonical.count() == dup.count())
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    canonical.unpersist()
  }
}
