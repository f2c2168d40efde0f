package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Tables._
import graft.functions.Md5Hex.graft_md5
import graft.ops.Out._

/** Fourth wave of LLM-training-pipeline text operators (t50+): model-apply
  * primitives — scoring every document with a small broadcast-able model
  * whose arithmetic both engines can replay exactly.
  *
  * Scale posture: each operator is a narrow per-document map (higher-order
  * array folds inside whole-stage codegen, no explode, no shuffle before
  * the final output sort) — the shape that turns a 100 TB corpus scan into
  * pure embarrassing parallelism. All scoring arithmetic is integer-exact
  * so the DuckDB oracle replays it bit-for-bit.
  */
object TextOps4 {

  // --- t50: hashed-feature linear quality classifier -------------------

  /** Feature buckets (hashing trick) and the fixed per-bucket integer
    * weights of the toy model. A production model would broadcast learned
    * weights (KB-sized for fasttext-style linear scorers — the same
    * driver-artifact discipline as the ANN codebooks); here the weights
    * are a deterministic function of the bucket id so the oracle can
    * derive them independently. */
  private val FeatDim = 64

  /** Token → bucket via the cross-engine md5-hex-slice recipe (t14). */
  private def bucket(tok: Column): Column =
    conv(substring(graft_md5(concat(lit("feat:"), tok)), 1, 8), 16, 10)
      .cast("long") % FeatDim

  /** Bucket → integer weight in [-500, 500] (Knuth multiplicative mix). */
  private def weight(b: Column): Column = (b * 2654435761L) % 1001L - 500L

  /** t50: fasttext-style hashed linear quality classifier applied to every
    * document (the CCNet/Gopher-style "score with a tiny linear model,
    * keep above threshold" filter). Features are hashed token buckets
    * (hashing trick, dim 64); the score is the integer sum of per-token
    * bucket weights; keep = score > 0 (zero bias).
    *
    * Plan shape: ONE narrow projection — `aggregate` folds the token
    * array inside whole-stage codegen (md5 kernel + integer mix per
    * element), so there is no explode, no per-token shuffle, and the only
    * exchange in the plan is the final output sort. Per-doc cost is
    * O(tokens); corpus cost is one scan — the ideal 100 TB shape. The
    * model itself stays in the plan as literals (a learned model would be
    * a broadcast map lookup, same shape). Caveat, audited in the plan:
    * Spark evaluates higher-order-function lambdas interpreted (the fold
    * Project is outside the codegen span) — still a narrow distributed
    * map, and measured 4.5× wall for 10× input; the codegen'd alternative
    * (explode + groupBy) would buy a corpus-sized shuffle to save
    * per-element dispatch, the wrong trade at any scale. */
  def t50QualityClassifier(s: SparkSession, dir: String): DataFrame =
    scoreOf(documents(s, dir)).sortedWide("doc_id")

  /** The t50 scorer as a stateless projection over any (doc_id, text)
    * relation — shared verbatim by the batch gate above and the
    * streaming twin ([[graft.streaming.Streams.scoredDocuments]]), so
    * both paths score with the identical expression tree. */
  private[graft] def scoreOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(toks, lit(0L),
          (acc, t) => acc + weight(bucket(t))).as("score_raw"))
      .withColumn("kept", col("score_raw") > 0L)
  }

  val t50Oracle: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
       |    t -> (CAST(('0x' || substr(md5('feat:' || t), 1, 8)) AS BIGINT)
       |          % $FeatDim) * 2654435761 % 1001 - 500)), 0)
       |    AS BIGINT) AS score_raw,
       |  coalesce(list_sum(list_transform(string_split(text, ' '),
       |    t -> (CAST(('0x' || substr(md5('feat:' || t), 1, 8)) AS BIGINT)
       |          % $FeatDim) * 2654435761 % 1001 - 500)), 0) > 0 AS kept
       |FROM documents ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t50_quality_classifier", t50QualityClassifier, Some(t50Oracle)))
}
