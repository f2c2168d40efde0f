package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonicalization for pairwise operators: collapse rows whose canonical
  * key is IDENTICAL (exact-duplicate documents, bit-identical embeddings)
  * to one representative before any pair-generating join, and expand group
  * membership back to element-level pairs at the very end.
  *
  * Why this is a scale requirement and not an optimization: candidate
  * generation in every near-dup pipeline here (minhash/simhash bands,
  * sign-LSH buckets, term postings) produces ALL pairs within a collision
  * group, so a corpus where each item has k exact copies pays k² in pair
  * volume — the 100× replica put t26 at 642 s and t07 at 565 s, all of it
  * candidate-stage work on pairs whose every downstream quantity (band
  * digests, signature-lane estimates, hamming, cosine, set intersections)
  * is a pure function of the two canonical keys and therefore constant
  * within a group. Rep-level machinery tracks DISTINCT content; the k²
  * lives only in the final membership expansion, which is output-bound.
  * First proven on the TF-IDF similarity family ([[TextOps2]] `canonSim`:
  * t26 642.5 → 26.0 s at 100×); this object generalizes the membership
  * tagging + pair expansion so the minhash/simhash/vector families share
  * one audited implementation.
  */
private[ext] object Canon {

  /** Tag every row with `rep` = the smallest `idCol` among rows sharing
    * `key`. One shuffle (window over the key); the input's columns ride
    * along, so callers can derive both the member map (id → rep) and the
    * representative-only relation from the same cached pass. Callers
    * persist + materialize the result — it feeds several subtrees. */
  def tagReps(rows: DataFrame, key: Column, idCol: String): DataFrame =
    rows.withColumn("rep",
      min(col(idCol)).over(Window.partitionBy(key)))

  /** Expand rep-level pairs to element-level pairs via group membership.
    * `repPairs` carries (ra, rb, payload...); `member` carries
    * (id, rep) — column names are positional, first = element id, second
    * = rep. Cross-group rows multiply out to every member combination,
    * oriented (min, max); diagonal rows (ra = rb) become each group's
    * internal a < b pairs — callers must pre-drop diagonals of singleton
    * groups (they expand to nothing but would dominate the pair list one
    * row per element). CAUTION: payload columns must be SYMMETRIC in
    * (a, b) — the orientation flip would silently misattribute
    * direction-sensitive values (derive those post-expansion per element,
    * as t26 does for sa/sb). */
  def expandPairs(repPairs: DataFrame, member: DataFrame): DataFrame = {
    val payload = repPairs.columns.filterNot(c => c == "ra" || c == "rb")
    val m = member.toDF("id", "r")
    repPairs
      .join(m.toDF("a", "ra"), "ra")
      .join(m.toDF("b", "rb"), "rb")
      .filter(col("ra") =!= col("rb") || col("a") < col("b"))
      .select(least(col("a"), col("b")).as("a") +:
        greatest(col("a"), col("b")).as("b") +: payload.map(col).toSeq: _*)
  }
}
