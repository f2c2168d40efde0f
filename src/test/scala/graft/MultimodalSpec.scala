package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.MultimodalOps

/** Multimodal plumbing: binary column round-trip, batch decode shape,
  * frame sampling coverage. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table: binary payload matches source byte length") {
    val m = MultimodalOps.m01MediaMeta(spark, sf)
    val d = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id").as("media_id"), col("n_chars"))
    // ASCII corpus → utf-8 bytes == chars
    assert(m.join(d, "media_id")
      .filter(col("n_bytes") =!= col("n_chars")).count() == 0)
  }

  test("decode features: one row per media, deterministic checksum") {
    val f1 = MultimodalOps.m02DecodeFeatures(spark, sf)
    val f2 = MultimodalOps.m02DecodeFeatures(spark, sf)
    assert(f1.count() ==
      graft.tables.Tables.documents(spark, sf).count())
    assert(f1.exceptAll(f2).count() == 0)
    assert(f1.filter(col("width") <= 0 || col("height") <= 0).count() == 0)
  }

  test("binaryFile source ingests opaque media files into the same pipeline") {
    // The production ingest path for real media: files on disk → Spark's
    // binaryFile source → (path, length, content) → the same binary-column
    // pipeline the m-queries run on the synthesized table.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_media")
    val payloads = (0 until 8).map { i =>
      i.toLong -> Array.tabulate[Byte](100 + i * 37)(j => ((i * j) % 251).toByte)
    }
    payloads.foreach { case (id, bytes) =>
      Files.write(Paths.get(dir.toString, f"media_$id%03d.bin"), bytes)
    }
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir.toString)
      .select(
        regexp_extract(col("path"), "media_(\\d+)\\.bin$", 1)
          .cast("long").as("media_id"),
        col("length"), col("content"))
    assert(files.count() == 8)
    val rows = files.collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val content = r.getAs[Array[Byte]]("content")
      assert(content.sameElements(payloads(id.toInt)._2),
        s"content mismatch for media $id")
      assert(r.getAs[Long]("length") == payloads(id.toInt)._2.length)
    }
  }

  test("frame sample: stride-64 frames cover every byte exactly once") {
    val frames = MultimodalOps.m03FrameSample(spark, sf)
    val perMedia = frames.groupBy("media_id")
      .agg(sum("frame_len").as("bytes_covered"))
    val m = MultimodalOps.m01MediaMeta(spark, sf)
    assert(perMedia.join(m, "media_id")
      .filter(col("bytes_covered") =!= col("n_bytes")).count() == 0)
  }

  test("MediaCodec seam: an alternate codec drops in without touching " +
    "the query plumbing; the registry path IS the stub codec") {
    // toy "codec": constant 2x3 dims, checksum = first byte; resize =
    // constant one-byte output — shaped nothing like the stub, so any
    // plumbing that secretly re-derives values from bytes would diverge.
    object ToyCodec extends MultimodalOps.MediaCodec {
      override def features(m: MultimodalOps.MediaRow) =
        MultimodalOps.MediaFeatures(m.media_id, m.kind,
          m.content.length.toLong,
          checksum = if (m.content.isEmpty) -1L else (m.content(0) & 0xffL),
          width = 2, height = 3, n_frames = 7)
      override def resize(content: Array[Byte], factor: Int) =
        Array[Byte](42)
    }
    val f = MultimodalOps.decodeFeaturesWith(ToyCodec)(spark, sf)
    assert(f.filter(col("width") =!= 2 || col("height") =!= 3 ||
      col("n_frames") =!= 7).count() == 0)
    val r = MultimodalOps.resizeWith(ToyCodec)(spark, sf)
    assert(r.filter(col("resized_bytes") =!= 1).count() == 0)
    // the default-bound registry queries equal the explicit stub binding
    assert(MultimodalOps.m02DecodeFeatures(spark, sf).exceptAll(
      MultimodalOps.decodeFeaturesWith(MultimodalOps.ByteStatCodec)(
        spark, sf)).count() == 0)
  }

  test("m03/m05 oracle frame-series bound: no document may exceed 64 " +
    "frames (4096 bytes) or the DuckDB gates silently diverge") {
    // ADVICE r4: the oracles enumerate generate_series(0, 63) while the
    // Spark side enumerates ALL frames — this assertion turns a corpus
    // that outgrows the constant series into a loud failure instead of a
    // silent gate break.
    val over = graft.tables.Tables.documents(spark, sf)
      .filter(length(col("text")) > 64 * 64)
    assert(over.count() == 0,
      "documents exceed the m03/m05 oracle frame cap; widen the oracle " +
        "series bound alongside any corpus growth")
  }

  test("m05 frame near-dup: identical payloads pair with full overlap; " +
    "shared count never exceeds either side's frames") {
    val r = MultimodalOps.m05FrameDedup(spark, sf)
    assert(r.filter(col("n_shared") > col("fa") ||
      col("n_shared") > col("fb")).count() == 0)
    assert(r.filter(col("overlap_r") > 1.0).count() == 0)
    // every exact-duplicate text pair (same bytes => same frames) with
    // >=2 frames must appear with overlap 1.0
    import org.apache.spark.sql.functions.{min => fmin}
    val dups = graft.tables.Tables.documents(spark, sf)
      .groupBy(col("text")).agg(fmin(col("doc_id")).as("a"),
        org.apache.spark.sql.functions.max(col("doc_id")).as("b"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && length(col("text")) >= 128)
    val missing = dups.select(col("a"), col("b"))
      .join(r.filter(col("overlap_r") === 1.0), Seq("a", "b"), "left_anti")
    assert(missing.count() == 0)
  }

  test("m07 cross-modal consistency: overlap equals a direct distinct-token intersection") {
    val r = ext.MultimodalOps.m07CrossModalConsistency(spark, sf).collect()
    assert(r.nonEmpty)
    val caps = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") < 240)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ").toSet)).toMap
    // every within-class pair present, overlap recomputed independently
    val expectedPairs = for {
      a <- caps.keys.toSeq; b <- caps.keys.toSeq
      if a < b && a % 8 == b % 8
    } yield (a, b)
    assert(r.length == expectedPairs.length)
    r.foreach { x =>
      val (a, b) = (x.getLong(0), x.getLong(1))
      assert(a % 8 == b % 8 && a < b)
      assert(x.getLong(3) == (caps(a) & caps(b)).size.toLong,
        s"pair ($a,$b) overlap mismatch")
    }
    // the graded signal must actually vary — a constant column gates
    // nothing a curation threshold could cut on
    assert(r.map(_.getLong(3)).distinct.length > 1)
  }

  test("m08 audio activity: frame stats match a direct reimplementation; VAD signal varies") {
    val r = ext.MultimodalOps.m08AudioActivity(spark, sf).collect()
    val audio = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).getBytes("UTF-8"))).toMap
    assert(r.length == audio.size, "one row per audio clip")
    r.foreach { x =>
      val bytes = audio(x.getLong(0))
      val frames = bytes.grouped(16).toArray
      val act = frames.map(f => f.map(_ & 0xff).sum > 90L * f.length)
      assert(x.getInt(1) == frames.length)
      assert(x.getInt(2) == act.count(identity))
      assert(x.getLong(3) == 100L * act.count(identity) / frames.length)
      assert(x.getInt(4) == act.indexOf(true))
      assert(x.getInt(5) == act.lastIndexOf(true))
      assert(x.getInt(4) <= x.getInt(5))
      assert(x.getInt(2) <= x.getInt(1))
    }
    // the speech ratio must discriminate for a VAD gate to mean anything
    assert(r.map(_.getLong(3)).distinct.length > 1)
  }

  test("m09 scene cuts: segmentation matches a direct reimplementation; cut counts vary") {
    val r = ext.MultimodalOps.m09SceneCuts(spark, sf).collect()
    val videos = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).getBytes("UTF-8"))).toMap
    assert(r.length == videos.size, "one row per video clip")
    r.foreach { x =>
      val bytes = videos(x.getLong(0))
      val means = bytes.grouped(16).toArray
        .map(f => f.map(_ & 0xff).sum.toLong / f.length)
      val cutAt = (1 until means.length)
        .filter(f => math.abs(means(f) - means(f - 1)) >= 8)
      // scene runs: split frame indices at the cut points
      val runs = means.indices.foldLeft(List(0)) { (acc, f) =>
        if (f > 0 && cutAt.contains(f)) 1 :: acc
        else (acc.head + 1) :: acc.tail
      }
      assert(x.getInt(1) == means.length)
      assert(x.getInt(2) == cutAt.size)
      assert(x.getInt(3) == cutAt.size + 1)
      assert(x.getInt(4) == runs.max, s"clip ${x.getLong(0)} longest run")
      assert(x.getInt(5) == cutAt.headOption.getOrElse(-1))
    }
    assert(r.map(_.getInt(2)).distinct.length > 1,
      "cut counts must discriminate between clips")
  }

  test("m10 video dedup: groups partition the clips; fingerprints match a direct reimplementation; identical payloads collapse") {
    val r = ext.MultimodalOps.m10VideoDedup(spark, sf).collect()
    val videos = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).getBytes("UTF-8"))).toMap
    def sig(bytes: Array[Byte]): String = {
      val means = bytes.grouped(16).toArray
        .map(f => f.map(_ & 0xff).sum.toLong / f.length)
      s"${means.length}:${means.mkString(",")}"
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = videos.toSeq
      .map { case (id, b) => (md5hex(sig(b)), id, b) }
      .groupBy(_._1)
    // groups partition the clip set; keeper is the min id of its group
    assert(r.map(_.getLong(1)).sum == videos.size.toLong)
    assert(r.length == expect.size)
    r.foreach { x =>
      val members = expect(x.getString(0))
      assert(x.getLong(1) == members.size.toLong, s"group ${x.getString(0)}")
      assert(x.getLong(2) == members.map(_._2).min)
      assert(x.getLong(3) ==
        ((members.head._3.length + 15) / 16).toLong)
    }
    // end-to-end on a crafted corpus: byte-identical clips collapse to one
    // group with the right copy count and min-id keeper
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("m10corpus").toString
    Seq((2L, "the same clip three times, long enough for several frames"),
      (5L, "the same clip three times, long enough for several frames"),
      (8L, "ZZZZ a very different payload ZZZZZZZZZZZZZZZZZZZZZZZZZZZZ"),
      (11L, "the same clip three times, long enough for several frames"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")
    val crafted = ext.MultimodalOps.m10VideoDedup(spark, tmp).collect()
    assert(crafted.length == 2)
    val trio = crafted.find(_.getLong(1) == 3L).get
    assert(trio.getLong(2) == 2L, "keeper must be the smallest media id")
  }

  test("m11 chunk dedup: manifest conserves every payload byte; keepers are lexicographic minima; shared chunks exist") {
    val payloads = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
      .filter(_._2.nonEmpty)
    // direct recompute of the chunk map
    val chunks = payloads.flatMap { case (id, bytes) =>
      bytes.grouped(64).zipWithIndex.map { case (c, i) =>
        (c.map(b => f"${b & 0xff}%02x").mkString, id, i.toLong,
          c.length.toLong)
      }
    }
    val expect = chunks.groupBy(_._1).map { case (_, refs) =>
      val keeper = refs.minBy(r => (r._2, r._3))
      (refs.length.toLong, refs.map(_._2).distinct.length.toLong,
        refs.map(_._4).min, keeper._2, keeper._3)
    }.toSeq.sorted
    val r = ext.MultimodalOps.m11ChunkDedup(spark, sf).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
        x.getLong(5))).toSeq.sorted
    assert(r == expect, "manifest rows match the direct recompute")
    // conservation: every payload byte is accounted for exactly once
    assert(r.map(x => x._1 * x._3).sum == payloads.map(_._2.length.toLong).sum)
    // dedup must actually fire on this corpus
    assert(r.exists(_._1 > 1), "no shared chunk: dedup inert")
  }
}
