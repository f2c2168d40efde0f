package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.expr.Exprs

/** Property tests (SURVEY §5d) — each property generates a batch of cases
  * with a fixed seed and evaluates them in ONE Spark job (per-case jobs
  * would dominate runtime). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("isoDurationSeconds == h*3600 + m*60 + s for generated durations") {
    import spark.implicits._
    val gen = for {
      h <- Gen.choose(0, 5000)
      m <- Gen.choose(0, 59)
      s <- Gen.choose(0, 59)
    } yield (s"PT${h}H${m}M${s}S", h * 3600.0 + m * 60 + s)
    val cases = sample(gen, 50)
    val got = cases.map(_._1).toDF("iso")
      .select(Exprs.isoDurationSeconds(col("iso")).as("sec"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("deriveId = last7(id stripped of '_') ++ ddHHyyyyMM, for generated ids") {
    import spark.implicits._
    val gen = for {
      raw <- Gen.listOfN(10, Gen.alphaNumChar).map(_.mkString)
      pos <- Gen.choose(0, 9)
      epochDay <- Gen.choose(10000L, 20000L)
      hour <- Gen.choose(0, 23)
    } yield {
      val id = raw.substring(0, pos) + "_" + raw.substring(pos)
      val ts = Timestamp.valueOf(
        java.time.LocalDate.ofEpochDay(epochDay).atTime(hour, 30))
      (id, ts)
    }
    val cases = sample(gen, 50)
    val got = cases.toDF("id", "ts")
      .select(Exprs.deriveId(col("id"), col("ts")).as("k"))
      .collect().map(_.getString(0)).toSeq
    val expect = cases.map { case (id, ts) =>
      val stripped = id.replace("_", "")
      val last7 = stripped.substring(math.max(0, stripped.length - 7))
      val ldt = ts.toLocalDateTime
      last7 + f"${ldt.getDayOfMonth}%02d${ldt.getHour}%02d" +
        f"${ldt.getYear}%04d${ldt.getMonthValue}%02d"
    }
    assert(got == expect)
  }

  test("dsum equals exact BigDecimal sum regardless of partitioning") {
    import spark.implicits._
    val gen = Gen.choose(-1000000L, 1000000L).map(_ / 100.0)
    val xs = sample(gen, 2000)
    val expect = xs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    Seq(1, 7, 32).foreach { p =>
      val got = xs.toDF("x").repartition(p)
        .agg(Exprs.dsum(col("x")).as("s")).head.getDouble(0)
      assert(got == expect, s"partitions=$p")
    }
  }

  test("distributed global rank == driver-side sort rank, random data") {
    import spark.implicits._
    val gen = for {
      v <- Gen.choose(-1000000, 1000000)
      k <- Gen.choose(0, 100000)
    } yield (v.toDouble / 100, k.toLong)
    val cases = sample(gen, 400).distinct
    val df = cases.toDF("spent", "k").repartition(7)
    val (ranked, n) = graft.ops.Rank.withGlobalRankN(
      df, Seq(col("spent").desc, col("k")), "r")
    assert(n == cases.size)
    val got = ranked.orderBy(col("r"))
      .collect().map(r => (r.getAs[Double]("spent"), r.getAs[Long]("k")))
    val expect = cases.sortBy { case (s, k) => (-s, k) }
    assert(got.toSeq == expect)
    // rank values are exactly 1..n with no gaps
    val ranks = ranked.select(col("r")).collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to n).toSeq)
  }

  test("ntile/cume_dist from rank == Spark's window functions, random sizes") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    for (n <- Seq(1, 2, 3, 7, 40, 101)) {
      val df = (1 to n).map(i => (i.toLong, (i * 7919) % 1000))
        .toDF("id", "v")
      val w = Window.orderBy(col("v"), col("id"))
      val viaWindow = df.select(col("id"),
          ntile(4).over(w).cast("long").as("nt"),
          cume_dist().over(w).as("cd"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(_._1)
      val (ranked, total) = graft.ops.Rank.withGlobalRankN(
        df, Seq(col("v"), col("id")), "r")
      val viaRank = ranked.select(col("id"),
          graft.ops.Rank.ntileFromRank(col("r"), total, 4).as("nt"),
          graft.ops.Rank.cumeDistFromRank(col("r"), total).as("cd"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(_._1)
      assert(viaRank == viaWindow, s"n=$n")
    }
  }

  test("simhash banding finds exactly the brute-force hamming<=2 pairs") {
    // structure check for t13's pigeonhole bands on adversarial random sigs
    val rnd = new scala.util.Random(42)
    val sigs = (0 until 120).map(i =>
      (i.toLong, rnd.nextInt().toLong & 0xFFFFFFFFL)) ++
      // inject near-dups at controlled hamming distances 0,1,2,3
      Seq((200L, 0x0F0F0F0FL), (201L, 0x0F0F0F0FL),
        (202L, 0x0F0F0F0EL), (203L, 0x0F0F0F0CL), (204L, 0x8F0F0F0CL))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 2
    } yield (a, b)).toSet
    // replicate t13's production bands (11+11+10 bits of 32)
    val bands32 = (s: Long) =>
      Seq((0, s & 0x7FF), (1, (s >> 11) & 0x7FF), (2, (s >> 22) & 0x3FF))
    val byBucket = sigs.flatMap { case (id, s) =>
      bands32(s).map(b => (b, id, s)) }
      .groupBy(_._1)
    val banded = byBucket.values.flatMap { grp =>
      for {
        (_, a, sa) <- grp; (_, b, sb) <- grp if a < b
        if java.lang.Long.bitCount(sa ^ sb) <= 2
      } yield (a, b)
    }.toSet
    assert(banded == brute)
  }

  test("t30 segment dedup vs in-memory model, for generated corpora") {
    import spark.implicits._
    // random corpora over a tiny vocabulary force heavy cross-document
    // segment collisions; the in-memory model replays the election rule
    val vocab = Vector("a", "b", "c", "d")
    val docGen = for {
      n <- Gen.choose(1, 35)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val docs = sample(docGen, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("t30prop").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    // model: first occurrence of each segment text by (doc_id, seg_idx)
    val segs = docs.flatMap { case (id, t, _, _, _) =>
      t.split(" ").grouped(10).zipWithIndex
        .map { case (seg, i) => (id, i.toLong, seg.mkString(" ")) }
    }
    val firstOf = segs.groupBy(_._3).map { case (seg, occ) =>
      seg -> occ.map(o => (o._1, o._2)).min }
    val expect = segs.groupBy(_._1).map { case (id, ss) =>
      val kept = ss.filter(s => firstOf(s._3) == ((s._1, s._2)))
        .sortBy(_._2).map(_._3)
      id -> (ss.size.toLong, kept.size.toLong, kept.mkString(" "))
    }
    val got = ext.TextOps2.t30SegmentDedup(spark, dir)
      .select(col("doc_id"), col("n_segs"), col("n_kept"), col("clean_len"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, (nSegs, nKept, clean)) =>
      val (gSegs, gKept, gLen) = got(id)
      assert(gSegs == nSegs && gKept == nKept && gLen == clean.length,
        s"doc $id: got ($gSegs,$gKept,$gLen) expected " +
          s"($nSegs,$nKept,${clean.length})")
    }
  }

  test("m05 frame near-dup vs in-memory model, for generated payloads " +
    "with planted duplicates") {
    import spark.implicits._
    // payloads: random word strings; every third is a copy of an earlier
    // one, and some share a 128+-byte prefix (aligned frame collisions)
    val wordGen = Gen.listOfN(60, Gen.oneOf("aa", "bb", "cc", "dd"))
      .map(_.mkString(" "))
    val base = sample(wordGen, 20).toVector
    val docs = (0 until 30).map { i =>
      val t =
        if (i % 3 == 2) base(i % base.size)            // exact copy
        else if (i % 3 == 1) base(i % base.size) + " zz" // shared prefix
        else base(i % base.size).reverse
      (i.toLong, t, "en", "s", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("m05prop").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    // in-memory model of m05: stride-64 frames, distinct per media,
    // pairs sharing >= 2 frames
    val frames = docs.map { case (id, t, _, _, _) =>
      id -> t.getBytes("UTF-8").grouped(64).map(_.toSeq).toSet
    }.toMap
    val expect = (for {
      a <- frames.keys; b <- frames.keys if a < b
      shared = frames(a).intersect(frames(b)).size if shared >= 2
    } yield (a, b, shared.toLong)).toSet
    val got = ext.MultimodalOps.m05FrameDedup(spark, dir)
      .select(col("a"), col("b"), col("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("t12 clusters: endpoints of every LSH edge share a cluster label") {
    import org.apache.spark.sql.functions._
    val clusters = ext.TextOps.t12DedupClusters(spark, sf)
    // labels are minimal: cluster <= doc_id everywhere
    assert(clusters.filter(col("cluster") > col("doc_id")).count() == 0)
    // every pair the verifier would consider connected shares a label
    val pairs = ext.TextOps.t07LshPairs(spark, sf)
      .filter(col("jaccard_est") >= 0.875).select("a", "b")
    val ca = clusters.withColumnRenamed("doc_id", "a")
      .withColumnRenamed("cluster", "cl_a")
    val cb = clusters.withColumnRenamed("doc_id", "b")
      .withColumnRenamed("cluster", "cl_b")
    assert(pairs.join(ca, "a").join(cb, "b")
      .filter(col("cl_a") =!= col("cl_b")).count() == 0)
  }

  test("Md5BucketSum == per-token md5 reimplementation for generated texts") {
    import spark.implicits._
    // random texts incl. empty tokens, repeats (exercising the memo),
    // unicode, and pathological space runs — against a from-scratch
    // driver-side fold (not the kernel's own helpers)
    val tokGen = Gen.oneOf(
      Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString),
      Gen.const(""), Gen.const("éä漢"), Gen.const("the"))
    val gen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, tokGen).map(_.mkString(" ")))
    val texts = sample(gen, 80)
    val dim = 64
    val weights = Array.tabulate(dim)(b => (b.toLong * 7919L) % 2003L - 1001L)
    def expected(t: String): Long =
      t.split(" ", -1).map { tok =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(("p:" + tok).getBytes("UTF-8"))
        val b = ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % dim).toInt
        weights(b)
      }.sum
    val got = texts.toDF("t")
      .select(graft.functions.Md5BucketSum
        .graft_md5_bucket_sum(col("t"), "p:", dim, weights).as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == texts.map(expected))
  }

  test("WpTokenStats conservation laws on generated texts") {
    import spark.implicits._
    // every char of every word is consumed exactly once: pieces consume
    // >= 1 char each, unks exactly 1 — so pieces + unk <= word chars and
    // pieces*1 + unk == chars when the vocab is single-char only
    val vocab = Seq("ab", "abc", "z")
    val wordGen = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'z', 'q')).map(_.mkString))
    val gen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val texts = sample(gen, 60)
    val st = graft.functions.WpTokenStats.wp_token_stats(col("t"), vocab)
    val rows = texts.toDF("t")
      .select(length(col("t")).as("len"), st.as("st"))
      .select(col("len"), col("st.n_words"), col("st.n_pieces"),
        col("st.n_unk")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      val (words, pieces, unk) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      val wordChars = t.count(_ != ' ').toLong
      assert(words == t.split(" ", -1).length.toLong, s"'$t' words")
      // pieces are >=1 char ('z') and <=3 chars; unks are exactly 1 char
      assert(pieces + unk <= wordChars, s"'$t' over-consumed")
      assert(pieces * 3 + unk >= wordChars, s"'$t' under-consumed")
    }
  }
}
