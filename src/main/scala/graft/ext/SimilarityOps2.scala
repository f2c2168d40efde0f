package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Tables._
import graft.ops.Out._

/** Second wave of embedding-similarity operators (e18): maximum
  * inner-product search. Split from [[SimilarityOps]] purely for file
  * size; shares its codegen'd vector kernels.
  */
object SimilarityOps2 {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VecOps.graft_vec_dot(a, b)

  /** e18: exact maximum-inner-product top-k — the retrieval measure
    * learned-embedding rankers actually optimize (unnormalized dot, not
    * cosine: a vector's magnitude IS part of its relevance signal).
    * Brute force with the queries broadcast, one codegen'd kernel per
    * candidate — same plan skeleton as e02.
    *
    * The scale path is the classic MIPS→cosine reduction (Bachrach et
    * al. 2014): augment each candidate with sqrt(M² − ‖x‖²) (M = max
    * norm) so every augmented candidate has norm exactly M, and append 0
    * to queries; augmented cosine is then dot/(‖q‖·M) — a strictly
    * monotone function of the inner product — so the existing sign-LSH /
    * IVF cosine infrastructure (e03/e04/e06) indexes MIPS unchanged.
    * Mips2CosineSpec proves the ordering equivalence on this corpus;
    * this gate query stays brute-force so the oracle is exact. */
  def e18MipsTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot_r").desc, col("cid"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qe"), col("embedding")), 4).as("dot_r"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .sortedSmall("qid", "rnk")
  }

  val e18Oracle: String =
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
      |      FROM embeddings),
      |p AS (SELECT qid, cid,
      |        round(list_inner_product(qe, ce), 4) AS dot_r
      |      FROM q, c WHERE cid <> qid),
      |r AS (SELECT qid, cid, dot_r,
      |        row_number() OVER (PARTITION BY qid
      |                           ORDER BY dot_r DESC, cid) AS rnk
      |      FROM p)
      |SELECT qid, cid, dot_r, rnk FROM r WHERE rnk <= 10
      |ORDER BY qid, rnk""".stripMargin

  // --- e19: MMR diversified rerank -------------------------------------

  private val MmrK = 10      // results returned per query
  private val MmrC = 50      // candidate pool per query (first-stage top-C)
  // λ relevance / (1−λ) redundancy weights. Written as two literals (not
  // 1−λ) so Spark and DuckDB evaluate bit-identical doubles.
  private val MmrLam = 0.7
  private val MmrMu = 0.3

  /** e19: maximal-marginal-relevance rerank (Carbonell & Goldstein 1998)
    * — the diversity pass retrieval pipelines run AFTER ANN: from each
    * query's top-C cosine candidates, greedily pick K where each pick
    * maximizes λ·rel(q,d) − (1−λ)·max_{s∈picked} sim(d,s), so near-
    * duplicate hits (which embedding corpora are full of — see e05/e10)
    * don't crowd the result list.
    *
    * Plan shape: the candidate pool and the within-pool pair similarities
    * are DataFrame joins on codegen'd kernels (the e02 skeleton — queries
    * broadcast, one dot per pair, pairs only WITHIN a query's pool, never
    * across). The greedy selection is inherently sequential PER QUERY but
    * touches only that query's C rels + C² pair sims (KB-sized), so it
    * runs as a typed `cogroup` keyed by qid — queries parallelize across
    * the cluster, per-query state is bounded by construction, and nothing
    * ever collects to the driver. This is the documented (d)-tier seam
    * (like the media codec): a greedy argmax chain has no declarative
    * form; everything AROUND it stays Catalyst.
    *
    * Determinism: rel and sim are rounded to 4dp (the e02-proven parity
    * grid); scores combine them with fixed double literals, so both
    * engines walk identical comparison sequences; ties break by cid. The
    * DuckDB oracle unrolls the same K greedy steps as chained CTEs. */
  def e19MmrRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val norm2 = (c: org.apache.spark.sql.Column) =>
      sqrt(dot(c, c))
    val e = embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("cid"))
    val cand = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4)
          .as("rel"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= MmrC).drop("rn")
    val ce = e.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      col("nrm").as("cn"))
    val ca = cand.join(ce, "cid").select(col("qid"), col("cid"),
      col("ce"), col("cn"))
    val pairs = ca.as("x").join(ca.as("y"),
        col("x.qid") === col("y.qid") && col("x.cid") =!= col("y.cid"))
      .select(col("x.qid").as("qid"), col("x.cid").as("a"),
        col("y.cid").as("b"),
        round(dot(col("x.ce"), col("y.ce")) / (col("x.cn") * col("y.cn")), 4)
          .as("sim"))

    val candG = cand.select(col("qid"), col("cid"), col("rel"))
      .as[(Long, Long, Double)].groupByKey(_._1)
    val pairG = pairs.as[(Long, Long, Long, Double)].groupByKey(_._1)
    val picked = candG.cogroup(pairG) { (qid, cs, ps) =>
      val cands = cs.map(t => (t._2, t._3)).toArray
        .sortBy { case (cid, rel) => (-rel, cid) }
      val sim = ps.map(t => ((t._2, t._3), t._4)).toMap
      val sel = scala.collection.mutable.ArrayBuffer[Long]()
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Double)]()
      val taken = scala.collection.mutable.HashSet[Long]()
      while (sel.size < MmrK && sel.size < cands.length) {
        var bCid = -1L; var bRel = 0.0
        var bScore = Double.NegativeInfinity
        cands.foreach { case (cid, rel) =>
          if (!taken(cid)) {
            val score =
              if (sel.isEmpty) MmrLam * rel
              else MmrLam * rel -
                MmrMu * sel.iterator
                  .map(sc => sim.getOrElse((cid, sc), 0.0)).max
            if (score > bScore || (score == bScore && cid < bCid)) {
              bCid = cid; bRel = rel; bScore = score
            }
          }
        }
        taken += bCid; sel += bCid
        out += ((qid, sel.size.toLong, bCid, bRel, bScore))
      }
      out.iterator
    }
    picked.toDF("qid", "rnk", "cid", "rel", "score")
      .withColumn("mmr", round(col("score"), 6)).drop("score")
      .sortedSmall("qid", "rnk")
  }

  val e19Oracle: String = {
    val lam = "CAST(0.7 AS DOUBLE)"
    val mu = "CAST(0.3 AS DOUBLE)"
    val steps = (2 to MmrK).map { i =>
      s"""sel$i AS MATERIALIZED (
         |  SELECT qid, cid, rel, $i AS rnk, score FROM (
         |    SELECT s.qid, s.cid, s.rel, s.score,
         |      row_number() OVER (PARTITION BY s.qid
         |                         ORDER BY s.score DESC, s.cid) AS rn
         |    FROM (
         |      SELECT c0.qid, c0.cid, c0.rel,
         |        $lam * c0.rel - $mu * m.msim AS score
         |      FROM cand c0
         |      JOIN (SELECT p.qid, p.a AS cid, MAX(p.sim) AS msim
         |            FROM ps p JOIN acc${i - 1} s2
         |              ON p.qid = s2.qid AND p.b = s2.cid
         |            GROUP BY p.qid, p.a) m
         |        ON c0.qid = m.qid AND c0.cid = m.cid
         |      WHERE NOT EXISTS (SELECT 1 FROM acc${i - 1} s3
         |                        WHERE s3.qid = c0.qid AND s3.cid = c0.cid)
         |    ) s) WHERE rn = 1),
         |acc$i AS MATERIALIZED (SELECT * FROM acc${i - 1}
         |          UNION ALL SELECT qid, cid, rel, rnk, score FROM sel$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
       |      FROM embeddings),
       |scored AS (SELECT qid, cid,
       |             round(list_cosine_similarity(qe, ce), 4) AS rel
       |           FROM q, c WHERE cid <> qid),
       |cand AS MATERIALIZED (SELECT qid, cid, rel FROM (
       |           SELECT qid, cid, rel,
       |             row_number() OVER (PARTITION BY qid
       |                                ORDER BY rel DESC, cid) AS rn
       |           FROM scored) WHERE rn <= $MmrC),
       |ps AS MATERIALIZED (SELECT x.qid, x.cid AS a, y.cid AS b,
       |         round(list_cosine_similarity(cx.ce, cy.ce), 4) AS sim
       |       FROM cand x JOIN cand y
       |         ON x.qid = y.qid AND x.cid <> y.cid
       |       JOIN c cx ON cx.cid = x.cid
       |       JOIN c cy ON cy.cid = y.cid),
       |sel1 AS (SELECT qid, cid, rel, 1 AS rnk, $lam * rel AS score
       |         FROM (SELECT qid, cid, rel,
       |                 row_number() OVER (PARTITION BY qid
       |                                    ORDER BY rel DESC, cid) AS rn
       |               FROM cand) WHERE rn = 1),
       |acc1 AS MATERIALIZED (SELECT qid, cid, rel, rnk, score FROM sel1),
       |$steps
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, cid, rel,
       |  round(score, 6) AS mmr
       |FROM acc$MmrK ORDER BY qid, rnk""".stripMargin
  }

  // --- e20: SemDeDup keeper election -----------------------------------

  /** e20: semantic-dedup keeper election (SemDeDup, Abbas et al. 2023):
    * within each embedding near-dup cluster (e15's connected components,
    * read from the per-corpus cluster artifact the way dedup-apply t17
    * reads t12's), compute the cluster centroid and score every member by
    * cosine-to-centroid; the keeper is the member closest to the centroid
    * (ties → smallest vec_id), everything else is the semantic-duplicate
    * mass a training pipeline drops.
    *
    * Plan shape at 100 TB: the cluster map is a (vec_id, cluster) join
    * against the vector scan; multi-member clusters are a tiny fraction
    * (near-dup mass), so the centroid aggregation and the scoring join
    * touch only them; centroids per cluster are one groupBy with 64
    * decimal sums (the e06 Lloyd recipe — order-independent across
    * partitions AND engines, so the DuckDB oracle replays it exactly).
    * No driver-side state, no all-pairs anywhere.
    */
  def e20SemdedupKeep(s: SparkSession, dir: String): DataFrame = {
    val norm2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)
    val cl = SimilarityOps.vecClusterMap(s, dir)
    val m0 = embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .join(cl, "vec_id")
    // Only clusters with >= 2 members have duplicates to elect among;
    // the size table is near-dup-cluster-count-sized → broadcast.
    val sz = m0.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= 2)
    val mem = m0.join(broadcast(sz), "cluster")
    // Decimal-exact per-dimension means cast back float (the e06 recipe):
    // 64 dsum buffers + the shared count stay under the codegen field cap.
    val sums = (0 until 64).map(p =>
      graft.expr.Exprs.dsum(
        element_at(col("embedding"), p + 1).cast("double"), 12)
        .as(s"s$p"))
    val cents = mem
      .groupBy(col("cluster"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("cnt")): _*)
      .select(col("cluster"),
        array((0 until 64).map(p =>
          (col(s"s$p") / col("cnt")).cast("float")): _*).as("cvec"))
      .withColumn("cn", norm2(col("cvec")))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("cos_c").desc, col("vec_id"))
    mem.join(broadcast(cents), "cluster")
      .select(col("cluster"), col("vec_id"), col("n_members"),
        round(dot(col("embedding"), col("cvec")) /
          (norm2(col("embedding")) * col("cn")), 4).as("cos_c"))
      .withColumn("keep", row_number().over(w) === 1)
      .sortedSmall("cluster", "vec_id")
  }

  /** DuckDB replica: the e15 recursive-CTE closure (its fourth — the
    * structural Spark win), then the same decimal-exact centroid means and
    * rounded cosine scoring. */
  val e20Oracle: String =
    s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END +
       |   CASE WHEN embedding[9] > 0 THEN 4 ELSE 0 END +
       |   CASE WHEN embedding[17] > 0 THEN 2 ELSE 0 END +
       |   CASE WHEN embedding[25] > 0 THEN 1 ELSE 0 END) AS bucket
       |  FROM embeddings),
       |edges AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b
       |  FROM e x JOIN e y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |  WHERE round(list_cosine_similarity(x.v, y.v), 4) > 0.4),
       |adj AS (
       |  SELECT a AS src, b AS dst FROM edges
       |  UNION SELECT b, a FROM edges),
       |reach(vec, r) AS (
       |  SELECT src, dst FROM adj
       |  UNION
       |  SELECT reach.vec, adj.dst FROM reach
       |  JOIN adj ON reach.r = adj.src),
       |cl AS (
       |  SELECT v.vec_id,
       |    least(coalesce(MIN(r.r), v.vec_id), v.vec_id) AS cluster
       |  FROM embeddings v LEFT JOIN reach r ON v.vec_id = r.vec
       |  GROUP BY v.vec_id),
       |big AS (
       |  SELECT cluster, COUNT(*) AS n_members FROM cl
       |  GROUP BY cluster HAVING COUNT(*) >= 2),
       |mem AS (
       |  SELECT cl.vec_id, cl.cluster, big.n_members, e.v
       |  FROM cl JOIN big USING (cluster) JOIN e ON e.vec_id = cl.vec_id),
       |cent AS (
       |  SELECT cluster, CAST(list(mf ORDER BY pos) AS DOUBLE[]) AS cv
       |  FROM (
       |    SELECT cluster, pos,
       |      CAST(${graft.expr.Exprs.davgSql("x", 12)} AS FLOAT) AS mf
       |    FROM (SELECT cluster, generate_subscripts(v, 1) AS pos,
       |            unnest(v) AS x FROM mem)
       |    GROUP BY cluster, pos)
       |  GROUP BY cluster),
       |sc AS (
       |  SELECT m.cluster, m.vec_id, m.n_members,
       |    round(list_inner_product(m.v, c.cv) /
       |      (sqrt(list_inner_product(m.v, m.v)) *
       |       sqrt(list_inner_product(c.cv, c.cv))), 4) AS cos_c
       |  FROM mem m JOIN cent c USING (cluster))
       |SELECT cluster, vec_id, CAST(n_members AS BIGINT) AS n_members,
       |  cos_c,
       |  (row_number() OVER (PARTITION BY cluster
       |                      ORDER BY cos_c DESC, vec_id) = 1) AS keep
       |FROM sc ORDER BY cluster, vec_id""".stripMargin

  // --- e21: hard-negative mining ---------------------------------------

  /** e21: hard-negative mining + alignment margin — the contrastive-
    * training diagnostic run before an embedding fine-tune: per anchor,
    * the hardest negative (highest-cosine vector of a DIFFERENT label),
    * the decimal-exact mean cosine to its positives (same label), and the
    * margin between them. A small or negative margin marks anchors whose
    * neighborhood the label structure does not explain — exactly the rows
    * a hard-negative sampler feeds back into training.
    *
    * Plan: the e02 skeleton (anchors broadcast, one codegen'd kernel per
    * pair, per-anchor window for the argmax) with a label split; the
    * positive-mean aggregation goes through decimal sums so both engines
    * average identically. At 100 TB the pair stage rides any ANN index
    * (e04/e06) — the gate stays brute-force so the oracle is exact. */
  def e21HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val norm2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)
    val e = embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        norm2(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label").as("qlab"),
        col("embedding").as("qe"), col("nrm").as("qn"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlab"), col("vec_id").as("cid"),
        col("label"),
        round(dot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 4)
          .as("cos_r"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_r").desc, col("cid"))
    val hardNeg = pairs.filter(col("label") =!= col("qlab"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("cid").as("hard_neg_cid"),
        col("cos_r").as("hard_neg_cos"))
    val pos = pairs.filter(col("label") === col("qlab"))
      .groupBy(col("qid"), col("qlab"))
      .agg(count(lit(1)).as("n_pos"),
        round(graft.expr.Exprs.davg(col("cos_r"), 12), 6)
          .as("mean_pos_cos"))
    pos.join(hardNeg, "qid")
      .select(col("qid"), col("qlab").as("label"), col("n_pos"),
        col("mean_pos_cos"), col("hard_neg_cid"), col("hard_neg_cos"),
        round(col("mean_pos_cos") - col("hard_neg_cos"), 6).as("margin"))
      .sortedSmall("qid")
  }

  val e21Oracle: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |q AS (SELECT vec_id AS qid, label AS qlab, v AS qv FROM e
       |      WHERE vec_id < 5),
       |p AS (SELECT qid, qlab, e.vec_id AS cid, e.label,
       |        round(list_cosine_similarity(qv, e.v), 4) AS cos_r
       |      FROM q, e WHERE e.vec_id <> q.qid),
       |hn AS (SELECT qid, cid AS hard_neg_cid, cos_r AS hard_neg_cos
       |       FROM (SELECT qid, cid, cos_r,
       |               row_number() OVER (PARTITION BY qid
       |                 ORDER BY cos_r DESC, cid) AS rn
       |             FROM p WHERE label <> qlab) WHERE rn = 1),
       |pos AS (SELECT qid, qlab AS label, COUNT(*) AS n_pos,
       |          round(${graft.expr.Exprs.davgSql("cos_r", 12)}, 6)
       |            AS mean_pos_cos
       |        FROM p WHERE label = qlab GROUP BY 1, 2)
       |SELECT pos.qid, pos.label, pos.n_pos, pos.mean_pos_cos,
       |  hn.hard_neg_cid, hn.hard_neg_cos,
       |  round(pos.mean_pos_cos - hn.hard_neg_cos, 6) AS margin
       |FROM pos JOIN hn ON hn.qid = pos.qid
       |ORDER BY pos.qid""".stripMargin

  // --- e22: binary-quantized hamming search ----------------------------

  /** e22: binary quantization + hamming search — the third member of the
    * compression family (int8 e08: 4×, PQ e12: 32×; sign binarization:
    * 64× — one bit per dimension, packed into a single LONG for 64-dim
    * vectors). Search ranks by hamming distance via bit_count(xor) — one
    * codegen'd instruction pair per candidate — with exact cosine
    * re-ranking of the binary top-C shortlist, the standard two-stage
    * shape (compressed scan → exact re-rank) production binary indexes
    * run. Agreement between sign bits is a Johnson-Lindenstrauss-style
    * angle proxy; the re-rank stage restores exact order among
    * survivors.
    *
    * At 100 TB: the binary code column is 8 bytes/vector — the scan that
    * ranks the whole corpus reads 64× less than the float embeddings,
    * and only the shortlist touches the full vectors. */
  def e22BinaryHammingTopK(s: SparkSession, dir: String): DataFrame = {
    val shortlist = 20
    val k = 5
    // Sign bit j (1-indexed dim j) → bit 63-j+1... fixed layout: bit
    // (64 - j) so dim 1 is the most significant — replayed identically
    // in the oracle.
    val code = (1 to 64)
      .map(j => when(element_at(col("embedding"), j) > 0f,
        lit(1L << (64 - j))).otherwise(0L))
      .reduce(_ + _)
    val e = embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), code.as("code"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("code").as("qcode"))
    val wHam = Window.partitionBy(col("qid"))
      .orderBy(col("hamming").asc, col("cid"))
    val cand = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qe"), col("vec_id").as("cid"),
        col("embedding"),
        bit_count(col("code").bitwiseXOR(col("qcode"))).cast("long")
          .as("hamming"))
      .withColumn("hrnk", row_number().over(wHam))
      .filter(col("hrnk") <= shortlist)
    val norm2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos_r").desc, col("cid"))
    cand
      .select(col("qid"), col("cid"), col("hamming"),
        round(dot(col("qe"), col("embedding")) /
          (norm2(col("qe")) * norm2(col("embedding"))), 4).as("cos_r"))
      .withColumn("rnk", row_number().over(wCos))
      .filter(col("rnk") <= k)
      .withColumn("rnk", col("rnk").cast("long"))
      .sortedSmall("qid", "rnk")
  }

  val e22Oracle: String = {
    val bits = (1 to 64)
      .map(j =>
        s"CASE WHEN embedding[$j] > 0 THEN ${java.lang.Long.toString(1L << (64 - j))} ELSE 0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  CAST($bits AS BIGINT) AS code FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv, code AS qcode FROM e
       |      WHERE vec_id < 5),
       |h AS (SELECT qid, qv, e.vec_id AS cid, e.v,
       |        CAST(bit_count(xor(e.code, q.qcode)) AS BIGINT) AS hamming
       |      FROM q, e WHERE e.vec_id <> q.qid),
       |sl AS (SELECT qid, qv, cid, v, hamming FROM (
       |         SELECT qid, qv, cid, v, hamming,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY hamming ASC, cid) AS hrnk
       |         FROM h) WHERE hrnk <= 20),
       |r AS (SELECT qid, cid, hamming,
       |        round(list_cosine_similarity(qv, v), 4) AS cos_r
       |      FROM sl)
       |SELECT qid, cid, hamming, cos_r, rnk FROM (
       |  SELECT qid, cid, hamming, cos_r,
       |    CAST(row_number() OVER (PARTITION BY qid
       |      ORDER BY cos_r DESC, cid) AS BIGINT) AS rnk
       |  FROM r) WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin
  }

  // --- e23: matryoshka truncated-dimension search -----------------------

  /** e23: matryoshka (MRL-style) two-stage search — rank the whole corpus
    * by cosine over the first 16 of 64 dimensions, then exactly re-rank
    * the truncated top-20 shortlist with full-dimension cosine. This is
    * the dimension-TRUNCATION member of the compression family: int8
    * (e08) and binary (e22) shrink each dimension's width, PQ (e12)
    * re-codes blocks, matryoshka simply reads a prefix — no codebook, no
    * training pass, and the coarse stage is the same kernel as the exact
    * one on a 4× shorter array. Embeddings trained with matryoshka
    * representation learning (Kusupati et al. 2022) order information by
    * prefix precisely so this query shape works.
    *
    * At 100 TB: the coarse scan reads a 16-float prefix column (4× less
    * I/O — materialized as its own parquet column so the scan prunes),
    * and only the shortlist touches full vectors. Same two-stage plan as
    * e22 with prefix-slice instead of bit-pack. */
  def e23MatryoshkaTopK(s: SparkSession, dir: String): DataFrame = {
    val prefixDims = 16
    val shortlist = 20
    val k = 5
    val norm2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)
    val e = embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        slice(col("embedding"), 1, prefixDims).as("prefix"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("prefix").as("qp"))
    val wCoarse = Window.partitionBy(col("qid"))
      .orderBy(col("cos_t").desc, col("cid"))
    val cand = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qe"), col("vec_id").as("cid"),
        col("embedding"),
        round(dot(col("qp"), col("prefix")) /
          (norm2(col("qp")) * norm2(col("prefix"))), 4).as("cos_t"))
      .withColumn("trnk", row_number().over(wCoarse))
      .filter(col("trnk") <= shortlist)
    val wExact = Window.partitionBy(col("qid"))
      .orderBy(col("cos_r").desc, col("cid"))
    cand
      .select(col("qid"), col("cid"), col("cos_t"),
        round(dot(col("qe"), col("embedding")) /
          (norm2(col("qe")) * norm2(col("embedding"))), 4).as("cos_r"))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= k)
      .withColumn("rnk", col("rnk").cast("long"))
      .sortedSmall("qid", "rnk")
  }

  val e23Oracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |  CAST(embedding[1:16] AS DOUBLE[]) AS p FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv, p AS qp FROM e
      |      WHERE vec_id < 5),
      |t AS (SELECT qid, qv, e.vec_id AS cid, e.v,
      |        round(list_cosine_similarity(qp, e.p), 4) AS cos_t
      |      FROM q, e WHERE e.vec_id <> q.qid),
      |sl AS (SELECT qid, qv, cid, v, cos_t FROM (
      |         SELECT qid, qv, cid, v, cos_t,
      |           row_number() OVER (PARTITION BY qid
      |             ORDER BY cos_t DESC, cid) AS trnk
      |         FROM t) WHERE trnk <= 20),
      |r AS (SELECT qid, cid, cos_t,
      |        round(list_cosine_similarity(qv, v), 4) AS cos_r
      |      FROM sl)
      |SELECT qid, cid, cos_t, cos_r, rnk FROM (
      |  SELECT qid, cid, cos_t, cos_r,
      |    CAST(row_number() OVER (PARTITION BY qid
      |      ORDER BY cos_r DESC, cid) AS BIGINT) AS rnk
      |  FROM r) WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  // --- e24: reciprocal-rank fusion of two retrievers --------------------

  /** e24: reciprocal-rank fusion — the standard hybrid-search combiner
    * (Cormack et al. 2009; every production "vector + keyword" stack):
    * each retriever contributes 1/(K + rank) for documents on its list,
    * ranks fuse additively, no score calibration needed. Here the two
    * retrievers are the engine's own cosine top-10 (e02 shape) and MIPS
    * top-10 (e18 shape) — angle vs magnitude-weighted relevance — and
    * the fused score is computed in SCALED INTEGER arithmetic
    * (1000000 div (60+rank)) so both engines agree bit-for-bit with no
    * float-sum ordering concerns.
    *
    * Plan: both rankers are the broadcast-queries brute-force skeleton
    * sharing one candidate scan; the fusion itself is a full-outer join
    * of two (qid, cid, rank) lists — top-k-sized, tiny — and one final
    * per-query window. At 100 TB the rankers swap to their indexed
    * variants (e04/e06 for cosine, the e18 norm-augmentation reduction
    * for MIPS) and the fusion join shape is unchanged. */
  def e24RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val rrfK = 60
    val e = embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val norm2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qe"), col("embedding")) /
          (norm2(col("qe")) * norm2(col("embedding"))), 4).as("cos_r"),
        round(dot(col("qe"), col("embedding")), 4).as("dot_r"))
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos_r").desc, col("cid"))
    val wDot = Window.partitionBy(col("qid"))
      .orderBy(col("dot_r").desc, col("cid"))
    val cosTop = pairs.withColumn("rc", row_number().over(wCos))
      .filter(col("rc") <= 10).select(col("qid"), col("cid"), col("rc"))
    val dotTop = pairs.withColumn("rd", row_number().over(wDot))
      .filter(col("rd") <= 10).select(col("qid"), col("cid"), col("rd"))
    val wFused = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("cid"))
    cosTop.join(dotTop, Seq("qid", "cid"), "full_outer")
      .select(col("qid"), col("cid"),
        (coalesce(expr(s"1000000 div (${rrfK} + rc)"), lit(0L)) +
          coalesce(expr(s"1000000 div (${rrfK} + rd)"), lit(0L)))
          .as("rrf"),
        col("rc").cast("long").as("cos_rank"),
        col("rd").cast("long").as("dot_rank"))
      .withColumn("rnk", row_number().over(wFused).cast("long"))
      .filter(col("rnk") <= 10)
      .sortedSmall("qid", "rnk")
  }

  val e24Oracle: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
      |p AS (SELECT qid, e.vec_id AS cid,
      |        round(list_cosine_similarity(qv, e.v), 4) AS cos_r,
      |        round(list_inner_product(qv, e.v), 4) AS dot_r
      |      FROM q, e WHERE e.vec_id <> q.qid),
      |ct AS (SELECT qid, cid, rc FROM (
      |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
      |           ORDER BY cos_r DESC, cid) AS rc FROM p) WHERE rc <= 10),
      |dt AS (SELECT qid, cid, rd FROM (
      |         SELECT qid, cid, row_number() OVER (PARTITION BY qid
      |           ORDER BY dot_r DESC, cid) AS rd FROM p) WHERE rd <= 10),
      |f AS (SELECT coalesce(ct.qid, dt.qid) AS qid,
      |        coalesce(ct.cid, dt.cid) AS cid,
      |        coalesce(1000000 // (60 + rc), 0)
      |          + coalesce(1000000 // (60 + rd), 0) AS rrf,
      |        CAST(rc AS BIGINT) AS cos_rank, CAST(rd AS BIGINT) AS dot_rank
      |      FROM ct FULL OUTER JOIN dt
      |        ON ct.qid = dt.qid AND ct.cid = dt.cid)
      |SELECT qid, cid, CAST(rrf AS BIGINT) AS rrf, cos_rank, dot_rank, rnk
      |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY qid
      |        ORDER BY rrf DESC, cid) AS BIGINT) AS rnk FROM f)
      |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  // --- e25: k-center coreset selection ---------------------------------

  private val KCenters = 8

  /** Rounded squared euclidean distance from the proven fold primitives
    * (`list_inner_product` on DOUBLE[] is a sequential left fold — the
    * e09 identity): ‖a−b‖² = a·a + b·b − 2·a·b, round 4 so both engines
    * compare the same value. */
  private def sqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    round(dot(a, a) + dot(b, b) - dot(a, b) * 2, 4)

  /** e25: k-center coreset selection — greedy farthest-first traversal
    * (Gonzalez 1985), the diversity-sampling primitive training-data
    * pipelines use to pick maximally-spread exemplars (coreset seeding,
    * eval-set diversification, k-means++-style init). Deterministic:
    * seed = smallest vec_id, then K−1 rounds of "farthest point from the
    * selected set" with (distance DESC, vec_id) tiebreak. Output is the
    * selection order with each center's coverage radius at selection
    * time — the classic 2-approximation certificate for the k-center
    * objective.
    *
    * Plan shape (the t47 round discipline): per-point running min
    * squared distance to the selected set advances one eager
    * localCheckpoint per round — each round is ONE narrow map (distance
    * to the single new center, O(N·d)) + a 1-row argmax collect; no
    * shuffle grows with K, nothing is pairwise. At 100 TB this is K
    * linear passes — the textbook distributed k-center. */
  def e25KCenterCoreset(s: SparkSession, dir: String): DataFrame =
    e25Of(s, embeddings(s, dir).select(col("vec_id"), col("embedding")))

  /** The greedy loop over any (vec_id, embedding) relation. Selects
    * min(K, N) centers: a corpus smaller than the budget exhausts
    * cleanly after its last point instead of failing the argmax. */
  private[graft] def e25Of(s: SparkSession, e: DataFrame): DataFrame = {
    val seedRows = e.orderBy(col("vec_id")).limit(1).collect()
    require(seedRows.nonEmpty, "k-center selection over an empty corpus")
    val seed = seedRows.head
    var selected = List[(Long, Long, Double)](
      (1L, seed.getLong(0), 0.0))
    var st = e
      .withColumn("md",
        sqDist(col("embedding"), typedlit(seed.getSeq[Float](1).toArray)))
      .localCheckpoint()
    var r = 2
    var exhausted = false
    while (r <= KCenters && !exhausted) {
      val chosen = selected.map(_._2)
      val tops = st.filter(!col("vec_id").isInCollection(chosen))
        .orderBy(col("md").desc, col("vec_id")).limit(1).collect()
      if (tops.isEmpty) exhausted = true
      else {
        val top = tops.head
        selected ::= ((r.toLong, top.getLong(0), top.getDouble(2)))
        val cvec = top.getSeq[Float](1).toArray
        val prev = st
        st = st
          .withColumn("md",
            least(col("md"), sqDist(col("embedding"), typedlit(cvec))))
          .localCheckpoint()
        prev.unpersist()
        r += 1
      }
    }
    st.unpersist()
    import s.implicits._
    selected.reverse.toDF("sel_round", "vec_id", "coverage")
      .sortedSmall("sel_round")
  }

  /** K−1 chained CTE stages replaying the greedy loop exactly —
    * same seed, same rounded-distance fold, same tiebreak. */
  val e25Oracle: String = {
    def dist(a: String, b: String) =
      s"round(list_inner_product($a, $a) + list_inner_product($b, $b)" +
        s" - list_inner_product($a, $b) * 2, 4)"
    val stages = (2 to KCenters).map { r =>
      val prior = (1 until r)
        .map(i => s"SELECT vec_id FROM b$i").mkString(" UNION ALL ")
      s"""b$r AS (
         |  SELECT vec_id, v, md FROM d${r - 1}
         |  WHERE vec_id NOT IN ($prior)
         |  ORDER BY md DESC, vec_id LIMIT 1),
         |d$r AS (
         |  SELECT d.vec_id, d.v,
         |    LEAST(d.md, ${dist("d.v", "b.v")}) AS md
         |  FROM d${r - 1} d, b$r b)""".stripMargin
    }.mkString(",\n")
    val union = (s"SELECT CAST(1 AS BIGINT) AS sel_round, vec_id, " +
      s"CAST(0.0 AS DOUBLE) AS coverage FROM b1") +:
      (2 to KCenters).map(r =>
        s"SELECT CAST($r AS BIGINT), vec_id, md FROM b$r")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |b1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS (SELECT e.vec_id, e.v, ${dist("e.v", "b.v")} AS md
       |       FROM e, b1 b),
       |$stages
       |${union.mkString(" UNION ALL ")}
       |ORDER BY sel_round""".stripMargin
  }

  // --- e26: cluster-balanced sampling ---------------------------------

  /** e26: cluster-balanced corpus sampling — the density-aware pruning
    * step of cluster-then-sample curation pipelines (SemDeDup/D4-style):
    * assign every vector to its IVF cell (e06's trained model, shared
    * bit-for-bit with that gate's oracle), then keep ceil(sqrt(n_cell))
    * exemplars per cell, chosen by a deterministic md5 draw. Dense
    * regions are downweighted (a cell 100× larger contributes only 10×
    * the samples), sparse regions survive — the diversity-preserving
    * alternative to uniform sampling.
    *
    * Plan shape: the assignment is e06's probe (broadcast codebook
    * against the partitioned vector scan, argmin in place); the draw is
    * ONE window shuffle keyed on cid (count + row_number share the single
    * exchange) followed by the quota filter. At 100 TB the cell count
    * scales with the corpus (65k+ cells), so the window keys are
    * plentiful and the per-cell streams are bounded by cell size; a
    * pathological mega-cell is exactly what the sqrt quota caps. */
  def e26ClusterSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, assigned) = SimilarityOps.ivfModel(s, dir)
    val draw = conv(substring(
      graft.functions.Md5Hex.graft_md5(
        concat(lit("e26:"), col("vec_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    val byCell = Window.partitionBy(col("cid"))
    val r = assigned
      .select(col("cid"), col("vec_id"), draw.as("draw"))
      .withColumn("cell_n", count(lit(1)).over(byCell))
      .withColumn("samp_rank",
        row_number().over(byCell.orderBy(col("draw"), col("vec_id")))
          .cast("long"))
      .filter(col("samp_rank") <= ceil(sqrt(col("cell_n"))))
      .select(col("cid"), col("vec_id"), col("cell_n"), col("samp_rank"))
    r.sortedSmall("cid", "samp_rank")
  }

  /** Replays e06's shared training/assignment CTEs, then the same
    * sqrt-quota draw. */
  val e26Oracle: String =
    s"""WITH ${SimilarityOps.ivfAssignCtes},
       |d AS (
       |  SELECT cid, vec_id,
       |    CAST(('0x' || substr(md5('e26:' || CAST(vec_id AS VARCHAR)),
       |      1, 8)) AS BIGINT) AS draw,
       |    COUNT(*) OVER (PARTITION BY cid) AS cell_n
       |  FROM a3),
       |r AS (
       |  SELECT cid, vec_id, cell_n,
       |    CAST(row_number() OVER (PARTITION BY cid
       |      ORDER BY draw, vec_id) AS BIGINT) AS samp_rank
       |  FROM d)
       |SELECT cid, vec_id, cell_n, samp_rank FROM r
       |WHERE samp_rank <= ceil(sqrt(cell_n))
       |ORDER BY cid, samp_rank""".stripMargin

  // --- e30: per-cluster embedding outliers -----------------------------

  /** e30: cluster-based out-of-distribution scoring — for every vector,
    * the exact L2² distance to its trained IVF centroid, and per cell
    * the top-3 farthest members: the "flag what the index can't
    * represent" pass a curation pipeline runs to surface OOD, mislabeled
    * or junk embeddings (the centroid-distance outlier detector, the
    * k-means flavor of Chandola et al. 2009's cluster-based anomaly
    * family). Distances round to 4 decimals BEFORE ranking so both
    * engines rank identical values (the e06 discipline), ties break to
    * the smaller vec_id.
    *
    * Plan shape: the model is the shared [[SimilarityOps.ivfModel]]
    * (driver-memoized codebook, K×64 floats); the probe is ONE broadcast
    * of the codebook against the partitioned vector scan (argmin
    * aggregates in place — zero exchanges), the distance re-derives from
    * the same broadcast join, and the only new exchange is the cid-keyed
    * top-3 window over K cells. At 100 TB: scan + broadcast + one
    * bounded window — the e26 budget exactly. */
  def e30ClusterOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cents, assigned) = SimilarityOps.ivfModel(s, dir)
    val d2 = (col("na") * col("na") + col("cn") * col("cn")
      - dot(col("embedding"), col("cvec")) * 2)
    val byCell = Window.partitionBy(col("cid"))
      .orderBy(col("d2_r").desc, col("vec_id"))
    assigned
      .withColumn("na",
        graft.functions.VecOps.graft_vec_norm(col("embedding")))
      .join(broadcast(cents), "cid")
      .select(col("cid"), col("vec_id"), round(d2, 4).as("d2_r"))
      .withColumn("rnk", row_number().over(byCell).cast("long"))
      .filter(col("rnk") <= 3)
      .sortedSmall("cid", "rnk")
  }

  /** Replays e06's shared training/assignment CTEs, the sqrt-then-square
    * distance recipe (its lost bits are part of the contract), and the
    * per-cell top-3. */
  val e30Oracle: String = {
    def n2(x: String) =
      s"sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($x, $x))"
    s"""WITH ${SimilarityOps.ivfAssignCtes},
       |d AS (
       |  SELECT a3.cid, a3.vec_id,
       |    round(${n2("a3.v")} + ${n2("c2.cv")}
       |      - list_inner_product(a3.v, c2.cv) * 2, 4) AS d2_r
       |  FROM a3 JOIN c2 ON a3.cid = c2.cid),
       |r AS (
       |  SELECT cid, vec_id, d2_r,
       |    CAST(row_number() OVER (PARTITION BY cid
       |      ORDER BY d2_r DESC, vec_id) AS BIGINT) AS rnk
       |  FROM d)
       |SELECT cid, vec_id, d2_r, rnk FROM r WHERE rnk <= 3
       |ORDER BY cid, rnk""".stripMargin
  }

  // --- e27: retrieval-eval MRR ----------------------------------------

  /** e27: retrieval evaluation — mean-reciprocal-rank inputs for the
    * binary-hamming retriever (e22) judged against the exact cosine
    * top-1 (e02), the eval-harness primitive behind every ANN quality
    * dashboard (e07 measures set recall; this measures where in the
    * list the right answer lands). Integer-exact: rr_ppm = 1e6 div rank,
    * 0 when the truth misses the shortlist, so both engines compare
    * without float division.
    *
    * Scale shape: both retrievers are existing gates (broadcast-query
    * plans); the judgment is one left equi-join of Q truth rows against
    * Q×k retrieved rows — eval cost is retrieval cost, the join is
    * noise. */
  def e27RetrievalMrr(s: SparkSession, dir: String): DataFrame = {
    val truth = SimilarityOps.e02CosineTopK(s, dir)
      .filter(col("rnk") === 1)
      .select(col("qid"), col("cid").as("truth_cid"))
    val ham = e22BinaryHammingTopK(s, dir)
      .select(col("qid").as("hqid"), col("cid").as("hcid"),
        col("rnk").as("hrnk"))
    truth
      .join(ham,
        col("qid") === col("hqid") && col("truth_cid") === col("hcid"),
        "left")
      .select(col("qid"), col("truth_cid"),
        coalesce(col("hrnk"), lit(0L)).as("found_rank"),
        coalesce(expr("1000000 div hrnk"), lit(0L)).as("rr_ppm"))
      .sortedSmall("qid")
  }

  /** Nests the e02 and e22 oracles verbatim as derived tables, so the
    * judged lists are bit-identical to their own gates'. */
  val e27Oracle: String = {
    val exactTop1 =
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |      FROM embeddings),
        |p AS (SELECT qid, cid,
        |        round(list_cosine_similarity(qe, ce), 4) AS cos_r
        |      FROM q, c WHERE cid <> qid)
        |SELECT qid, cid AS truth_cid FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos_r DESC, cid) AS rnk FROM p) WHERE rnk = 1""".stripMargin
    s"""SELECT e.qid, e.truth_cid,
       |  CAST(coalesce(h.rnk, 0) AS BIGINT) AS found_rank,
       |  CAST(coalesce(1000000 // h.rnk, 0) AS BIGINT) AS rr_ppm
       |FROM ($exactTop1) e
       |LEFT JOIN ($e22Oracle) h
       |  ON h.qid = e.qid AND h.cid = e.truth_cid
       |ORDER BY e.qid""".stripMargin
  }

  // --- e28: retrieval-eval nDCG@4 --------------------------------------

  /** Rank-position DCG weights, pinned as the operator's integer
    * constants: w(i) = floor(1e6 / log2(i + 1)) for positions 1..4 —
    * both engines use the same literals, so no float log enters either
    * plan. */
  private val DcgW = Seq(1000000L, 630929L, 500000L, 430676L)

  /** Ideal DCG: the graded truth (rel 4..1) in perfect order. */
  private val IdealDcg =
    DcgW.zip(Seq(4L, 3L, 2L, 1L)).map { case (w, r) => w * r }.sum

  /** e28: retrieval evaluation — nDCG@4 of the binary-hamming retriever
    * (e22) against graded relevance from the exact cosine ranking (e02):
    * the exact top-4 carry relevance 4..1, anything else 0, and the
    * retrieved list is scored with the pinned log-discount weights. e07
    * measures set recall and e27 top-1 rank; nDCG is the list-quality
    * metric an ANN dashboard actually tracks when near-misses matter.
    * Integer-exact end to end: dcg = Σ rel·w(pos), ndcg_ppm =
    * 1e6·dcg div [[IdealDcg]].
    *
    * Scale shape: both retrievers are existing gates (broadcast-query
    * plans); the judgment is one left equi-join of Q×4 retrieved rows
    * against Q×4 truth rows and a Q-row aggregate — eval cost is
    * retrieval cost. */
  def e28RetrievalNdcg(s: SparkSession, dir: String): DataFrame = {
    val truth = SimilarityOps.e02CosineTopK(s, dir)
      .filter(col("rnk") <= 4)
      .select(col("qid"), col("cid"), (lit(5L) - col("rnk")).as("rel"))
    val wcol = DcgW.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (w, i)) =>
        when(col("rnk") === (i + 1).toLong, lit(w)).otherwise(acc)
    }
    e22BinaryHammingTopK(s, dir)
      .filter(col("rnk") <= 4)
      .select(col("qid"), col("cid"), wcol.as("w"))
      .join(truth, Seq("qid", "cid"), "left")
      .select(col("qid"),
        (coalesce(col("rel"), lit(0L)) * col("w")).as("g"))
      .groupBy(col("qid"))
      .agg(sum(col("g")).as("dcg"))
      .select(col("qid"), col("dcg"),
        expr(s"dcg * 1000000 div $IdealDcg").as("ndcg_ppm"))
      .sortedSmall("qid")
  }

  /** Truth = the e27-style exact cosine ranking, graded (rel 4..1);
    * retrieved = the e22 oracle verbatim as a derived table. */
  val e28Oracle: String = {
    val exactTop4 =
      """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
        |      FROM embeddings),
        |p AS (SELECT qid, cid,
        |        round(list_cosine_similarity(qe, ce), 4) AS cos_r
        |      FROM q, c WHERE cid <> qid)
        |SELECT qid, cid, 5 - rnk AS rel FROM (
        |  SELECT qid, cid, row_number() OVER (PARTITION BY qid
        |    ORDER BY cos_r DESC, cid) AS rnk FROM p) WHERE rnk <= 4""".stripMargin
    val wCase = DcgW.zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
      .mkString("CASE rnk ", " ", " END")
    s"""SELECT g.qid,
       |  CAST(SUM(coalesce(t.rel, 0) * g.w) AS BIGINT) AS dcg,
       |  CAST(SUM(coalesce(t.rel, 0) * g.w) * 1000000 // $IdealDcg
       |    AS BIGINT) AS ndcg_ppm
       |FROM (SELECT qid, cid, $wCase AS w
       |      FROM ($e22Oracle) WHERE rnk <= 4) g
       |LEFT JOIN ($exactTop4) t ON t.qid = g.qid AND t.cid = g.cid
       |GROUP BY g.qid ORDER BY g.qid""".stripMargin
  }

  // --- e29: kNN label propagation --------------------------------------

  /** e29: one round of majority-vote label propagation over the
    * production-width kNN graph — the semi-supervised labeling pass a
    * curation pipeline runs to spread scarce human quality labels across
    * an unlabeled corpus (Zhu & Ghahramani 2002's label propagation, one
    * synchronous step, hard votes). Every vector with neighbors takes
    * the most frequent label among its ≤5 nearest; ties break to the
    * smallest label (deterministic in both engines), and the report
    * carries the node's own label, the vote, the neighbor count, and
    * whether propagation would flip it — the disagreement signal that
    * flags mislabeled or boundary examples.
    *
    * Plan shape: the graph is the shared [[SimilarityOps.knnWideArtifact]]
    * (built once per corpus per JVM — e17's gate verifies its content);
    * one equi-join hangs each neighbor's label on the edge, one
    * (node, label) hash aggregate counts votes map-side, and the argmax
    * is a WindowGroupLimit over node-keyed partitions — every exchange
    * equi-keyed on vector ids, nothing all-pairs, no driver state. At
    * 100 TB the edge list is 5n rows and the pass is join + agg +
    * window, all on the same key family. Iterated propagation is t43's
    * round discipline (localCheckpoint per round) on this same plan. */
  def e29LabelProp(s: SparkSession, dir: String): DataFrame = {
    val lbl = embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = SimilarityOps.knnWideArtifact(s, dir)
      .join(lbl.select(col("vec_id").as("b"),
        col("label").as("nb_label")), "b")
      .groupBy(col("a"), col("nb_label"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("cnt").desc, col("nb_label"))
    votes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("a"), col("nb_label").as("prop_label"),
        col("cnt").as("prop_votes"))
      .join(lbl.select(col("vec_id").as("a"), col("label")), "a")
      .select(col("a").as("vec_id"), col("label"),
        col("prop_label"), col("prop_votes"),
        (col("label") =!= col("prop_label")).as("flipped"))
      .sortedWide("vec_id")
  }

  /** Replays e17's chain (same CTE text) plus the vote. */
  val e29Oracle: String = {
    val bucket = (0 until 8).map { j =>
      s"CASE WHEN embedding[${8 * j + 1}] > 0 THEN ${1 << (7 - j)} ELSE 0 END"
    }.mkString(" +\n   ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  ($bucket) AS bucket
       |  FROM embeddings),
       |p AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    round(list_cosine_similarity(x.v, y.v), 4) AS cos_r
       |  FROM e x JOIN e y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |r AS (
       |  SELECT a, b, cos_r,
       |    CAST(row_number() OVER (PARTITION BY a
       |      ORDER BY cos_r DESC, b) AS BIGINT) AS rnk
       |  FROM p),
       |g AS (SELECT a, b FROM r WHERE rnk <= 5),
       |v AS (
       |  SELECT g.a, CAST(l.label AS BIGINT) AS nb_label,
       |    COUNT(*) AS cnt
       |  FROM g JOIN embeddings l ON g.b = l.vec_id
       |  GROUP BY g.a, CAST(l.label AS BIGINT)),
       |top AS (
       |  SELECT a, nb_label AS prop_label, cnt AS prop_votes
       |  FROM (SELECT a, nb_label, cnt,
       |          row_number() OVER (PARTITION BY a
       |            ORDER BY cnt DESC, nb_label) AS rn
       |        FROM v)
       |  WHERE rn = 1)
       |SELECT top.a AS vec_id, CAST(l.label AS BIGINT) AS label,
       |  top.prop_label, top.prop_votes,
       |  CAST(l.label AS BIGINT) <> top.prop_label AS flipped
       |FROM top JOIN embeddings l ON top.a = l.vec_id
       |ORDER BY vec_id""".stripMargin
  }

  // --- e31: per-dimension embedding health stats -------------------------

  /** e31: per-dimension feature-space health report — count, integerized
    * (ppm) mean, exact integer variance, min/max, and the dead-dimension
    * signal (share of exact zeros) for each of the 64 embedding
    * coordinates. This is the check an embedding pipeline runs before
    * trusting an index: collapsed or dead dimensions break PQ codebooks
    * and distance contrast (Aggarwal et al. 2001), and per-dim drift vs a
    * previous snapshot flags encoder regressions. Every value integerizes
    * ONCE (half-up at ppm) before any aggregation, so both engines
    * aggregate identical integers — variance is the exact integer
    * n·Σv² − (Σv)² over n², no IEEE accumulation anywhere.
    *
    * Plan shape: one scan, posexplode to (dim, value) — 64× the rows but
    * map-side combinable straight back down to a 64-key hash aggregate;
    * sums ride as decimal(38,0) so a 100 TB corpus cannot overflow the
    * merge buffers. No join, no window, one exchange of 64 keys. */
  def e31DimStats(s: SparkSession, dir: String): DataFrame = {
    val v = embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("d0", "vf")))
      .select((col("d0") + 1).cast("long").as("dim"),
        floor(col("vf").cast("double") * 1000000 + 0.5).cast("long")
          .as("vi"))
    v.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("vi").cast("decimal(38,0)")).as("sv"),
        sum((col("vi") * col("vi")).cast("decimal(38,0)")).as("svv"),
        min(col("vi")).as("min_ppm"),
        max(col("vi")).as("max_ppm"),
        sum(when(col("vi") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select(col("dim"), col("n"),
        expr("CAST(sv div n AS BIGINT)").as("mean_ppm"),
        expr("CAST((svv * n - sv * sv) div (n * n) AS BIGINT)")
          .as("var_ppm2"),
        col("min_ppm"), col("max_ppm"),
        expr("1000000 * n_zero div n").as("zero_ppm"))
      .sortedSmall("dim")
  }

  val e31Oracle: String =
    """WITH v AS (
      |  SELECT CAST(u.i AS BIGINT) AS dim,
      |    CAST(floor(CAST(u.v AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS vi
      |  FROM (SELECT unnest(embedding) AS v,
      |               unnest(range(1, len(embedding) + 1)) AS i
      |        FROM embeddings) u)
      |SELECT dim, COUNT(*) AS n,
      |  CAST(SUM(vi) // COUNT(*) AS BIGINT) AS mean_ppm,
      |  CAST((SUM(vi * vi) * COUNT(*) - SUM(vi) * SUM(vi))
      |    // (COUNT(*) * COUNT(*)) AS BIGINT) AS var_ppm2,
      |  MIN(vi) AS min_ppm, MAX(vi) AS max_ppm,
      |  (1000000 * CAST(SUM(CASE WHEN vi = 0 THEN 1 ELSE 0 END) AS BIGINT))
      |    // COUNT(*) AS zero_ppm
      |FROM v GROUP BY dim ORDER BY dim""".stripMargin

  // --- e32: IVF centroid separation audit ---------------------------------

  /** e32: centroid-separation audit of the trained IVF index — for every
    * centroid, its 3 nearest sibling centroids by exact L2² (rounded to
    * 4 decimals before ranking, the e06/e30 discipline). Near-coincident
    * centroids mean wasted cells and recall cliffs at probe time (the
    * k-means degeneracy check FAISS users run as index sanity); the
    * nearest-sibling margin is what decides nprobe. The matrix is K²
    * (K = 16 cells) — constant in corpus size, so the whole audit costs
    * nothing at any scale: the model is the shared driver-memoized
    * codebook ([[SimilarityOps.ivfModel]]), the pairing is a broadcast
    * nested-loop over K rows, and the top-3 window partitions K keys. */
  def e32CentroidSeparation(s: SparkSession, dir: String): DataFrame = {
    val (cents, _) = SimilarityOps.ivfModel(s, dir)
    val a = cents.select(col("cid").as("cid_a"), col("cvec").as("va"),
      col("cn").as("na"))
    val b = cents.select(col("cid").as("cid_b"), col("cvec").as("vb"),
      col("cn").as("nb"))
    val w = Window.partitionBy(col("cid_a"))
      .orderBy(col("d2_r").asc, col("cid_b"))
    a.join(b, col("cid_a") =!= col("cid_b"))
      .select(col("cid_a"), col("cid_b"),
        round(col("na") * col("na") + col("nb") * col("nb")
          - dot(col("va"), col("vb")) * 2, 4).as("d2_r"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .sortedSmall("cid_a", "rnk")
  }

  /** Replays e06's training CTEs and e30's sqrt-then-square norm recipe
    * (the lost low bits are part of the shared contract). */
  val e32Oracle: String = {
    def n2(x: String) =
      s"sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($x, $x))"
    s"""WITH ${SimilarityOps.ivfAssignCtes},
       |p AS (
       |  SELECT x.cid AS cid_a, y.cid AS cid_b,
       |    round(${n2("x.cv")} + ${n2("y.cv")}
       |      - list_inner_product(x.cv, y.cv) * 2, 4) AS d2_r
       |  FROM c2 x JOIN c2 y ON x.cid <> y.cid),
       |r AS (
       |  SELECT cid_a, cid_b, d2_r,
       |    CAST(row_number() OVER (PARTITION BY cid_a
       |      ORDER BY d2_r ASC, cid_b) AS BIGINT) AS rnk
       |  FROM p)
       |SELECT cid_a, cid_b, d2_r, rnk FROM r WHERE rnk <= 3
       |ORDER BY cid_a, rnk""".stripMargin
  }

  // --- e33: PQ quantization-distortion audit ------------------------------

  /** e33: per-codeword reconstruction-error audit of the trained PQ
    * index — for every (subspace, codeword): how many subvectors it
    * covers and the total / mean / max L2² distance between them and the
    * codeword (the distortion PQ's ADC distances inherit as error). This
    * completes the index-health trio (e30 flags outlier members, e32
    * audits centroid separation, e33 measures what the compression
    * actually loses) — the report FAISS users read as imbalance (dead or
    * overloaded codewords) and distortion before shipping an index.
    * Distances round to 4 decimals per row, then integerize to 1e-4
    * units THROUGH A DECIMAL CAST, so sums are exact integers on both
    * engines — no IEEE accumulation order anywhere.
    *
    * Plan shape: the audit READS THE STORED INDEX — the materialized
    * (vec_id, m, cid) codes ([[SimilarityOps.pqCodes]], the t60 index
    * discipline) joined back to the corpus subvector scan on (vec_id, m)
    * plus ONE broadcast of the memoized codebook (M×K rows) — then a
    * (m, cid) hash aggregate over M·K = 128 keys, map-side combinable.
    * Zero k-means iterations, zero argmin encode passes: an index audit
    * reads the index, it does not rebuild it (PqArtifactSpec witnesses
    * the encode counter stays flat). At 100 TB: two co-keyed scans + a
    * broadcast + a bounded aggregate. */
  def e33PqDistortion(s: SparkSession, dir: String): DataFrame = {
    val cents = SimilarityOps.pqCodebook(s, dir)
    val asg = SimilarityOps.pqSubvectors(s, dir)
      .join(SimilarityOps.pqCodes(s, dir), Seq("vec_id", "m"))
    val nsv = graft.functions.VecOps.graft_vec_norm(col("sv"))
    val d2 = nsv * nsv + col("cn") * col("cn") - dot(col("sv"), col("cvec")) * 2
    asg.join(broadcast(cents), Seq("m", "cid"))
      .select(col("m"), col("cid"),
        (round(d2, 4).cast("decimal(18,4)") * 10000).cast("long").as("q4"))
      .groupBy(col("m"), col("cid"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("q4")).as("total_d2_q4"),
        max(col("q4")).as("max_d2_q4"))
      .select(col("m").cast("long").as("m"), col("cid"), col("n_vecs"),
        col("total_d2_q4"),
        expr("total_d2_q4 div n_vecs").as("mean_d2_q4"),
        col("max_d2_q4"))
      .sortedSmall("m", "cid")
  }

  /** Replays e12's training chain and the sqrt-then-square norm recipe,
    * then the same decimal integerization. */
  val e33Oracle: String = {
    def n2(x: String) =
      s"sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($x, $x))"
    s"""WITH ${SimilarityOps.pqSqlChain},
       |d AS (
       |  SELECT a3.m, a3.cid,
       |    CAST(CAST(round(${n2("a3.sv")} + ${n2("c2.cv")}
       |      - list_inner_product(a3.sv, c2.cv) * 2, 4) AS DECIMAL(18,4))
       |      * 10000 AS BIGINT) AS q4
       |  FROM a3 JOIN c2 ON a3.m = c2.m AND a3.cid = c2.cid)
       |SELECT m, cid, COUNT(*) AS n_vecs,
       |  CAST(SUM(q4) AS BIGINT) AS total_d2_q4,
       |  CAST(SUM(q4) AS BIGINT) // COUNT(*) AS mean_d2_q4,
       |  MAX(q4) AS max_d2_q4
       |FROM d GROUP BY m, cid ORDER BY m, cid""".stripMargin
  }

  // --- e34: IVF nprobe tuning curve ---------------------------------------

  /** e34: the recall-vs-cost tuning curve of the IVF index — the same
    * probe at nprobe ∈ {1, 2, 4} cells, each setting reporting its
    * candidate volume (the cost axis: candidates scanned is what nprobe
    * buys/costs) and its MEASURED recall@10 against the exact
    * brute-force ground truth (the shared eval artifact). This is the
    * knob-setting run every ANN deployment does before fixing nprobe
    * (e06 ships nprobe=2; this measures why). Recall is integer ppm;
    * the spec asserts the curve is monotone in nprobe.
    *
    * Plan shape: ONE probe pass ranks all K cells per query (broadcast
    * codebook, K·|queries| rows), the three settings explode from the
    * rn ≤ 4 prefix (no re-probe per setting), candidates come from the
    * same cell-keyed join as e06, and the report aggregates over
    * |settings| keys. At 100 TB each setting touches nprobe/K of the
    * corpus — the curve's cost axis is real, not simulated. */
  def e34NprobeCurve(s: SparkSession, dir: String): DataFrame = {
    val nrm = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)
    val (cents, asg) = SimilarityOps.ivfModel(s, dir)
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("cid"))
    val probes = embeddings(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .join(broadcast(cents))
      .select(col("qid"), col("qe"), col("cid"),
        (col("cn") * col("cn") - dot(col("qe"), col("cvec")) * 2)
          .as("dist"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= 4)
      .withColumn("qnorm", nrm(col("qe")))
      .withColumn("np", explode(array(lit(1), lit(2), lit(4))))
      .filter(col("rn") <= col("np"))
      .select(col("np"), col("qid"), col("qe"), col("qnorm"), col("cid"))
    val cand = asg
      .withColumn("cnorm", nrm(col("embedding")))
      .join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("np"), col("qid"), col("vec_id").as("cid2"),
        round(dot(col("qe"), col("embedding")) /
          (col("qnorm") * col("cnorm")), 4).as("cos_r"))
    val vol = cand.groupBy(col("np"))
      .agg(count(lit(1)).as("n_candidates"))
    val gtR = SimilarityOps.groundTruthTopK(s, dir)
      .select(col("qid"), col("cid").as("cid2"), lit(1L).as("hit"))
    val wr = Window.partitionBy(col("np"), col("qid"))
      .orderBy(col("cos_r").desc, col("cid2"))
    cand
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= 10)
      .join(broadcast(gtR), Seq("qid", "cid2"), "left")
      .groupBy(col("np"))
      .agg(countDistinct(col("qid")).as("n_queries"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .join(vol, "np")
      .select(col("np").cast("long").as("nprobe"), col("n_queries"),
        col("n_candidates"), col("n_hits"),
        expr("1000000 * n_hits div (10 * n_queries)").as("recall_ppm"))
      .sortedSmall("nprobe")
  }

  /** Replays e06's training/probe CTEs at the three widths and e02's
    * exact brute-force ground truth. */
  val e34Oracle: String = {
    val dist = SimilarityOps.ivfDistSql("e.v", "c.cv")
    s"""WITH ${SimilarityOps.ivfAssignCtes},
       |nps AS (SELECT unnest([1, 2, 4]) AS np),
       |pr AS (
       |  SELECT qid, qv, cid, rn FROM (
       |    SELECT e.vec_id AS qid, e.v AS qv, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY $dist ASC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN c2 c WHERE e.vec_id < 5)
       |  WHERE rn <= 4),
       |probes AS (SELECT np, qid, qv, cid FROM pr, nps WHERE rn <= np),
       |cand AS (
       |  SELECT p.np, p.qid, a.vec_id AS cid2,
       |    round(list_inner_product(p.qv, a.v) /
       |      (sqrt(list_inner_product(p.qv, p.qv)) *
       |       sqrt(list_inner_product(a.v, a.v))), 4) AS cos_r
       |  FROM probes p JOIN a3 a ON a.cid = p.cid AND a.vec_id <> p.qid),
       |vol AS (SELECT np, COUNT(*) AS n_candidates FROM cand GROUP BY np),
       |top AS (
       |  SELECT np, qid, cid2 FROM (
       |    SELECT np, qid, cid2,
       |      row_number() OVER (PARTITION BY np, qid
       |        ORDER BY cos_r DESC, cid2) AS rnk
       |    FROM cand)
       |  WHERE rnk <= 10),
       |gt AS (
       |  SELECT qid, cid FROM (
       |    SELECT q.vec_id AS qid, a.vec_id AS cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(q.v, a.v), 4) DESC,
       |                 a.vec_id) AS rnk
       |    FROM e q JOIN e a ON a.vec_id <> q.vec_id WHERE q.vec_id < 5)
       |  WHERE rnk <= 10),
       |h AS (
       |  SELECT t.np, COUNT(DISTINCT t.qid) AS n_queries,
       |    CAST(SUM(CASE WHEN gt.qid IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hits
       |  FROM top t LEFT JOIN gt ON t.qid = gt.qid AND t.cid2 = gt.cid
       |  GROUP BY t.np)
       |SELECT CAST(h.np AS BIGINT) AS nprobe, h.n_queries,
       |  CAST(vol.n_candidates AS BIGINT) AS n_candidates, h.n_hits,
       |  (1000000 * h.n_hits) // (10 * h.n_queries) AS recall_ppm
       |FROM h JOIN vol ON h.np = vol.np ORDER BY nprobe""".stripMargin
  }

  /** e36: FILTERED vector search — top-k nearest neighbors restricted to
    * a metadata predicate (each query qid wants only candidates with
    * `label = qid % 3`), answered through the shared IVF index
    * ([[SimilarityOps.ivfModel]]: same codebook, same nprobe=2 probe as
    * e06). The predicate applies to candidates INSIDE the probed cells
    * BEFORE ranking (pre-filtering) — the semantics every production
    * vector store ships (search within a tenant / language / split),
    * and the one post-filtering gets wrong: filtering e06's top-10
    * AFTER ranking returns fewer than k survivors, while pre-filtering
    * ranks the filtered candidate set and keeps full depth.
    *
    * Scale shape: identical to e06 — the filter is one more conjunct on
    * the broadcast-join candidate stream (codegen'd, no extra shuffle,
    * no extra pass); candidate volume only shrinks. The oracle replays
    * the whole chain (shared ivfAssignCtes) with the same label join. */
  def e36FilteredAnn(s: SparkSession, dir: String): DataFrame = {
    val nprobe = 2
    val e = embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val (cents, asg) = SimilarityOps.ivfModel(s, dir)
    val norm2 = (c: org.apache.spark.sql.Column) =>
      graft.functions.VecOps.graft_vec_norm(c)

    // labels ride the same vec_id partitioning the assignment was built
    // on, so the join plans in place (no extra exchange on the big side)
    val assigned = asg
      .join(e.select(col("vec_id"), col("label"))
        .repartition(s.sparkContext.defaultParallelism, col("vec_id")),
        Seq("vec_id"))
      .withColumn("cnorm", norm2(col("embedding")))
      .persist() // one probe-join consumer, same discipline as e06
    assigned.count()

    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("dist").asc, col("cid"))
    val probes = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .join(broadcast(cents))
      .select(col("qid"), col("qe"), col("cid"),
        (col("cn") * col("cn") - dot(col("qe"), col("cvec")) * 2).as("dist"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
      .withColumn("qnorm", norm2(col("qe")))

    val wr = Window.partitionBy(col("qid"))
      .orderBy(col("cos_r").desc, col("cid2"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid") &&
        col("label") === (col("qid") % 3).cast("int")) // the metadata filter
      .select(col("qid"), col("vec_id").as("cid2"), col("label"),
        round(dot(col("qe"), col("embedding")) /
          (col("qnorm") * col("cnorm")), 4).as("cos_r"))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("cid2").as("cid"), col("label"),
        col("cos_r"), col("rnk").cast("long").as("rnk"))
      .sortedSmall("qid", "rnk")
  }

  val e36Oracle: String = {
    def dist(v: String, c: String): String =
      SimilarityOps.ivfDistSql(v, c)
    s"""WITH ${SimilarityOps.ivfAssignCtes},
       |probes AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT e.vec_id AS qid, e.v AS qv, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist("e.v", "c.cv")} ASC, c.cid ASC) AS rn
       |    FROM e CROSS JOIN c2 c WHERE e.vec_id < 5)
       |  WHERE rn <= 2),
       |p AS (
       |  SELECT p.qid, a.vec_id AS cid, el.label,
       |    round(list_inner_product(p.qv, a.v) /
       |      (sqrt(list_inner_product(p.qv, p.qv)) *
       |       sqrt(list_inner_product(a.v, a.v))), 4) AS cos_r
       |  FROM probes p
       |  JOIN a3 a ON a.cid = p.cid AND a.vec_id <> p.qid
       |  JOIN embeddings el ON el.vec_id = a.vec_id
       |  WHERE el.label = CAST(p.qid % 3 AS INTEGER)),
       |r AS (
       |  SELECT qid, cid, label, cos_r,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY cos_r DESC, cid) AS rnk
       |  FROM p)
       |SELECT qid, cid, label, cos_r, rnk FROM r WHERE rnk <= 10
       |ORDER BY qid, rnk""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("e18_mips_topk", e18MipsTopK, Some(e18Oracle)),
    Q("e19_mmr_rerank", e19MmrRerank, Some(e19Oracle)),
    Q("e20_semdedup_keep", e20SemdedupKeep, Some(e20Oracle)),
    Q("e21_hard_negatives", e21HardNegatives, Some(e21Oracle)),
    Q("e22_binary_hamming_topk", e22BinaryHammingTopK, Some(e22Oracle)),
    Q("e23_matryoshka_topk", e23MatryoshkaTopK, Some(e23Oracle)),
    Q("e24_rrf_fusion", e24RrfFusion, Some(e24Oracle)),
    Q("e25_kcenter_coreset", e25KCenterCoreset, Some(e25Oracle)),
    Q("e26_cluster_sample", e26ClusterSample, Some(e26Oracle)),
    Q("e27_retrieval_mrr", e27RetrievalMrr, Some(e27Oracle)),
    Q("e28_retrieval_ndcg", e28RetrievalNdcg, Some(e28Oracle)),
    Q("e29_label_prop", e29LabelProp, Some(e29Oracle)),
    Q("e30_cluster_outliers", e30ClusterOutliers, Some(e30Oracle)),
    Q("e31_dim_stats", e31DimStats, Some(e31Oracle)),
    Q("e32_centroid_separation", e32CentroidSeparation, Some(e32Oracle)),
    Q("e33_pq_distortion", e33PqDistortion, Some(e33Oracle)),
    Q("e34_nprobe_curve", e34NprobeCurve, Some(e34Oracle)),
    Q("e36_filtered_ann", e36FilteredAnn, Some(e36Oracle)))
}
