package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.Md5Hex.graft_md5
import graft.tables.Tables._
import graft.ops.Out._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed in executor-side batches.
  *
  * The container has no image/audio codecs, so the *decode* kernel is a
  * clearly-marked deterministic STUB (byte-statistics stand-in); everything
  * Spark-side — schema, partitioning, batch iteration shape, feature
  * schema — is real and tested. In production the stub body is replaced by
  * a codec call per element (same mapPartitions signature; this is the
  * Scala twin of a Pandas-UDF/`mapInPandas` batch kernel).
  *
  * Scale notes: content bytes stay columnar (parquet BINARY) until the
  * decode stage; decode is a narrow map (no shuffle), so it pipelines with
  * the scan and parallelizes per input split. Frame sampling explodes rows
  * map-side only.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      width: Int, height: Int, n_frames: Int)

  /** The executor-side media kernel seam: a production deployment drops a
    * real decoder/resampler in here WITHOUT touching the oracle-gated
    * query plumbing (m02/m04 take a codec parameter; the registry entries
    * bind [[ByteStatCodec]], the container's deterministic stand-in —
    * this container ships no image/audio codecs). Implementations must be
    * Serializable (the instance is shipped into the mapPartitions
    * closure) and deterministic if an oracle gate is to hold. */
  trait MediaCodec extends Serializable {
    /** Called once per partition before the first element — amortize
      * codec/model handle initialization here, not per row. */
    def open(): Unit = ()
    /** Decode `content` and extract typed features. */
    def features(m: MediaRow): MediaFeatures
    /** Resample `content` down by `factor` (image resize / audio
      * downsample stand-in). */
    def resize(content: Array[Byte], factor: Int): Array[Byte]
  }

  /** STUB codec — deterministic byte statistics standing in for real
    * decode/resample (replicated bit-for-bit by the m02/m04 oracles). */
  object ByteStatCodec extends MediaCodec {
    override def features(m: MediaRow): MediaFeatures = {
      val n = m.content.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (m.content(i) & 0xff); i += 1 }
      val w = 16 + (sum % 64).toInt
      MediaFeatures(m.media_id, m.kind, n.toLong, sum, w,
        height = if (n == 0) 0 else (n / w) + 1,
        n_frames = n / 32 + 1)
    }
    override def resize(content: Array[Byte], factor: Int): Array[Byte] = {
      val out = new Array[Byte]((content.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = content(i * factor); i += 1 }
      out
    }
  }

  /** REAL image codec over the JDK's built-in `javax.imageio` readers —
    * PNG/BMP/GIF/JPEG ship with every JVM, no native libs needed — bound
    * to the same [[MediaCodec]] seam as the stub. `features` reports the
    * actual decoded dimensions plus a deterministic pixel checksum;
    * `resize` is a real bilinear downscale re-encoded as PNG. The
    * registry gates keep [[ByteStatCodec]] (DuckDB can replay byte
    * statistics, not a PNG decoder); ImageIoCodecSpec drives THIS codec
    * through the same mapPartitions plumbing on synthesized images,
    * proving the seam takes a production decoder without touching the
    * oracle-gated queries. */
  object ImageIoCodec extends MediaCodec {
    private def decode(content: Array[Byte], what: String)
        : java.awt.image.BufferedImage = {
      // A corrupt-but-recognized payload can THROW inside the codec (not
      // just return null); rethrow with the row's identity attached so one
      // bad image in a large executor batch is attributable.
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"$what: image codec failed: ${e.getMessage}", e)
        }
      require(img != null, s"$what: payload is not a decodable image")
      img
    }
    override def features(m: MediaRow): MediaFeatures = {
      val img = decode(m.content, s"media_id ${m.media_id}")
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += (img.getRGB(x, y) & 0xffffff)
          x += 1
        }
        y += 1
      }
      MediaFeatures(m.media_id, m.kind, m.content.length.toLong, sum,
        img.getWidth, img.getHeight, n_frames = 1)
    }
    override def resize(content: Array[Byte], factor: Int): Array[Byte] = {
      val img = decode(content, "resize")
      val w = math.max(1, img.getWidth / factor)
      val h = math.max(1, img.getHeight / factor)
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      // BufferedImage-source drawImage is synchronous; bilinear keeps the
      // downscale deterministic across JVMs.
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** The media projection over any (doc_id, text) relation — shared by
    * the batch table below and the streaming twin
    * ([[graft.streaming.Streams.audioActivityStream]]), so both paths
    * derive identical binary rows. */
  def mediaOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"))

  /** Synthesize the media table from `documents` (UTF-8 bytes as payload) —
    * deterministic, schema-faithful stand-in for an ingested binary table. */
  def media(s: SparkSession, dir: String): DataFrame =
    mediaOf(documents(s, dir))

  /** m01: metadata projection over the binary column (no decode) — the
    * cheap-scan path: byte length without touching content semantics. */
  def m01MediaMeta(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .select(col("media_id"), col("kind"),
        length(col("content")).cast("long").as("n_bytes"))
      .sortedWide("media_id")

  val m01Oracle: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                  ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |FROM documents ORDER BY media_id""".stripMargin

  /** m02: batch feature extraction over binary content via mapPartitions —
    * the decode kernel behind the [[MediaCodec]] seam (registry binds the
    * stub; production binds a real decoder, same plan). */
  def m02DecodeFeatures(s: SparkSession, dir: String): DataFrame =
    decodeFeaturesWith(ByteStatCodec)(s, dir)

  def decodeFeaturesWith(codec: MediaCodec)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeFeaturesOf(codec, media(s, dir).as[MediaRow])
      .sortedWide("media_id")
  }

  /** Dataset-level decode seam: the mapPartitions kernel alone, so specs
    * can drive alternate codecs ([[ImageIoCodec]]) over synthesized
    * payloads through the exact plumbing the registry query uses. */
  private[graft] def decodeFeaturesOf(
      codec: MediaCodec,
      ds: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
        // batch shape: open() amortizes codec/model init across the
        // partition; elements stream lazily through the decoder.
        codec.open()
        rows.map(codec.features)
      }
      .toDF()
  }

  /** m02 oracle: the stub is deterministic byte statistics, so DuckDB can
    * replicate it — byte values come from hex(blob) 2-char slices joined
    * against a constant index series (this DuckDB build only supports
    * constant generate_series; 1024 covers the corpus max of 577 bytes). */
  val m02Oracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                    ELSE 'video' END AS kind,
      |    hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |  FROM documents),
      |idx AS (SELECT unnest(generate_series(1, 1024)) AS i),
      |b AS (
      |  SELECT media_id,
      |    CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS bv
      |  FROM m JOIN idx ON i <= n),
      |cs AS (
      |  SELECT media_id, CAST(SUM(bv) AS BIGINT) AS checksum
      |  FROM b GROUP BY media_id)
      |SELECT m.media_id, m.kind, CAST(m.n AS BIGINT) AS n_bytes,
      |  coalesce(cs.checksum, 0) AS checksum,
      |  CAST(16 + coalesce(cs.checksum, 0) % 64 AS INTEGER) AS width,
      |  CAST(CASE WHEN m.n = 0 THEN 0
      |            ELSE m.n // (16 + coalesce(cs.checksum, 0) % 64) + 1
      |       END AS INTEGER) AS height,
      |  CAST(m.n // 32 + 1 AS INTEGER) AS n_frames
      |FROM m LEFT JOIN cs USING (media_id) ORDER BY media_id""".stripMargin

  /** m03: frame sampling — one row per sampled fixed-stride chunk of the
    * payload (video frame-sample / audio windowing shape). Map-side explode;
    * the slice is a real byte-range view of the binary column. */
  def m03FrameSample(s: SparkSession, dir: String): DataFrame = {
    val stride = 64
    media(s, dir)
      .select(col("media_id"), col("kind"), col("content"),
        explode(sequence(lit(0L),
          expr(s"(length(content) - 1) div $stride"))).as("frame_no"))
      .select(col("media_id"), col("kind"), col("frame_no"),
        col("content").substr((col("frame_no") * stride + 1).cast("int"),
          lit(stride)).as("frame_bytes"))
      .select(col("media_id"), col("kind"), col("frame_no"),
        length(col("frame_bytes")).cast("long").as("frame_len"))
      .sortedWide("media_id", "frame_no")
  }

  /** m03 oracle: stride-64 chunk indices and lengths from octet_length
    * alone. greatest(..., 0) matches Spark's truncating `div` on the n=0
    * edge (one zero-length frame). */
  val m03Oracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                    ELSE 'video' END AS kind,
      |    octet_length(encode(text)) AS n
      |  FROM documents),
      |f AS (SELECT unnest(generate_series(0, 63)) AS frame_no)
      |SELECT media_id, kind, CAST(frame_no AS BIGINT) AS frame_no,
      |  CAST(LEAST(64, n - frame_no * 64) AS BIGINT) AS frame_len
      |FROM m JOIN f ON frame_no <= greatest((n - 1) // 64, 0)
      |ORDER BY media_id, frame_no""".stripMargin

  /** m04: resize through the [[MediaCodec]] seam (stub keeps every k-th
    * byte — a deterministic downsample). The Spark shape is the real
    * part: binary in, smaller binary + typed meta out, narrow map, no
    * shuffle. */
  def m04Resize(s: SparkSession, dir: String): DataFrame =
    resizeWith(ByteStatCodec)(s, dir)

  def resizeWith(codec: MediaCodec)(
      s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val factor = 4
    media(s, dir).as[MediaRow]
      .mapPartitions { rows =>
        codec.open()
        rows.map { m =>
          val out = codec.resize(m.content, factor)
          (m.media_id, m.kind, out, m.content.length.toLong,
            out.length.toLong)
        }
      }
      .toDF("media_id", "kind", "resized", "orig_bytes", "resized_bytes")
      .select("media_id", "kind", "orig_bytes", "resized_bytes")
      .sortedWide("media_id")
  }

  /** m04 oracle: ceil(n / 4) output bytes. */
  val m04Oracle: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |                  ELSE 'video' END AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
      |  CAST((octet_length(encode(text)) + 3) // 4 AS BIGINT)
      |    AS resized_bytes
      |FROM documents ORDER BY media_id""".stripMargin

  /** m05: media near-dup via frame fingerprints — the video/asset dedup
    * shape: sample fixed-stride frames (m03's chunking), fingerprint each
    * (md5 over the frame's hex image — STUB for a perceptual hash of the
    * decoded frame; same signature), and pair media sharing ≥2 distinct
    * fingerprints via an equi-join on the fingerprint. Candidates are
    * posting-list work on the fingerprint key — never media × media — and
    * the per-media distinct() bounds any one asset's contribution to a
    * posting list at 1. Overlap ratio = shared / min(frame counts). */
  def m05FrameDedup(s: SparkSession, dir: String): DataFrame =
    m05Of(media(s, dir).select(col("media_id"), col("content")),
      Some(s -> dir)).sortedWide("a", "b")

  /** Representative level ([[graft.ext.Canon]], keyed on the content
    * bytes): frame fingerprints, the posting join, n_shared and the frame
    * counts are all pure functions of the content, so identical assets
    * are indistinguishable to the pair generator — a k-way duplicated
    * corpus otherwise pays k² inside every fingerprint posting list
    * (measured: 25.6 s at the 100× replica, mostly within-group pairs).
    * n_shared is symmetric and rides the expansion; fa/fb are
    * direction-sensitive (the t26 sa/sb argument) and are re-attached per
    * media AFTER expansion from the member→rep count map. */
  private[graft] def m05Of(m: DataFrame,
      art: Option[(SparkSession, String)] = None): DataFrame = {
    val stride = 64
    // Corpus queries materialize the canon map and the representative
    // frame-fingerprint postings (both pure per-corpus functions — the
    // asset bytes never change) via [[Artifacts]]: production stores
    // fingerprints NEXT TO the media, it does not re-hash every asset per
    // query. The member artifact deliberately excludes the binary column
    // — only (media_id, rep) persists.
    def buildTagged: DataFrame =
      graft.ext.Canon.tagReps(m, col("content"), "media_id")
    val (member, reps, grpSz) = art match {
      case Some((s, dir)) =>
        val mem = Artifacts.materialized(s, "media_member", dir)(
          buildTagged.select(col("media_id"), col("rep")))
        (mem,
          m.join(mem.filter(col("media_id") === col("rep"))
            .select(col("media_id")), Seq("media_id"), "left_semi"),
          mem.groupBy(col("rep")).agg(count(lit(1)).as("grp_n")))
      case None =>
        val tagged = buildTagged.persist()
        tagged.count()
        (tagged.select(col("media_id"), col("rep")),
          tagged.filter(col("media_id") === col("rep")).drop("rep"),
          tagged.groupBy(col("rep")).agg(count(lit(1)).as("grp_n")))
    }
    def buildFrames: DataFrame = reps
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0L),
          expr(s"(length(content) - 1) div $stride"))).as("frame_no"))
      .select(col("media_id"),
        graft_md5(hex(col("content")
          .substr((col("frame_no") * stride + 1).cast("int"), lit(stride))))
          .as("fp"))
      .distinct()
    val frames = art match {
      case Some((s, dir)) =>
        Artifacts.materialized(s, "media_frames", dir)(buildFrames)
      case None => buildFrames
    }
    val counts = frames.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    // a <= b keeps the diagonal: a rep joined with itself yields
    // n_shared = nf — the shared-fingerprint count of every twin pair in
    // its duplicate group — and the n_shared >= 2 gate then applies to
    // twins exactly as it does doc-level (single-frame assets never pair).
    val rp = frames.toDF("a", "fp")
      .join(frames.toDF("b", "fp"), "fp")
      .filter(col("a") <= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(grpSz.toDF("a", "grp_n"), "a")
      .filter(col("a") =!= col("b") || col("grp_n") >= 2)
      .drop("grp_n")
    val szOf = member.join(broadcast(counts.toDF("rep", "nf")), "rep")
      .select(col("media_id"), col("nf"))
    graft.ext.Canon.expandPairs(
      rp.select(col("a").as("ra"), col("b").as("rb"), col("n_shared")),
      member)
      .join(broadcast(szOf.toDF("a", "fa")), "a")
      .join(broadcast(szOf.toDF("b", "fb")), "b")
      .select(col("a"), col("b"), col("n_shared"), col("fa"), col("fb"),
        round(col("n_shared").cast("double") / least(col("fa"), col("fb")),
          4).as("overlap_r"))
  }

  /** Pre-canonicalization doc-level m05, kept as the spec reference. */
  private[graft] def naiveFrameDedup(m: DataFrame): DataFrame = {
    val stride = 64
    val frames = m
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0L),
          expr(s"(length(content) - 1) div $stride"))).as("frame_no"))
      .select(col("media_id"),
        graft_md5(hex(col("content")
          .substr((col("frame_no") * stride + 1).cast("int"), lit(stride))))
          .as("fp"))
      .distinct()
    val counts = frames.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    frames.toDF("a", "fp")
      .join(frames.toDF("b", "fp"), "fp")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(broadcast(counts.toDF("a", "fa")), "a")
      .join(broadcast(counts.toDF("b", "fb")), "b")
      .select(col("a"), col("b"), col("n_shared"), col("fa"), col("fb"),
        round(col("n_shared").cast("double") / least(col("fa"), col("fb")),
          4).as("overlap_r"))
  }

  /** m05 oracle: the fingerprint is md5 over the frame's hex slice, so
    * DuckDB replays it directly on `substr(hex(blob))` — hex casing and
    * 2-chars-per-byte alignment match Spark's `hex`. */
  val m05Oracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS n
      |  FROM documents),
      |f AS (SELECT unnest(generate_series(0, 63)) AS frame_no),
      |fr AS (
      |  SELECT DISTINCT media_id,
      |    md5(substr(hx, frame_no * 128 + 1, 128)) AS fp
      |  FROM m JOIN f ON frame_no <= greatest((n - 1) // 64, 0)),
      |cnt AS (SELECT media_id, COUNT(*) AS nf FROM fr GROUP BY media_id),
      |p AS (
      |  SELECT fa.media_id AS a, fb.media_id AS b, COUNT(*) AS n_shared
      |  FROM fr fa JOIN fr fb ON fa.fp = fb.fp AND fa.media_id < fb.media_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT p.a, p.b, p.n_shared, ca.nf AS fa, cb.nf AS fb,
      |  round(CAST(p.n_shared AS DOUBLE) / least(ca.nf, cb.nf), 4)
      |    AS overlap_r
      |FROM p, cnt ca, cnt cb
      |WHERE ca.media_id = p.a AND cb.media_id = p.b
      |ORDER BY a, b""".stripMargin

  // --- m06: perceptual (aHash) image near-dup -------------------------

  /** 64-bit average-hash of a decoded image — the perceptual near-dup
    * fingerprint: the image partitions into a fixed 8×8 grid, each cell
    * accumulates integer ITU-R 601 luma (299R+587G+114B), and bit (cy,cx)
    * is set when the cell's mean luma exceeds the global mean. Integer
    * arithmetic end-to-end, so the hash is bit-stable across JVMs. Small
    * pixel perturbations move a few cell means slightly (low hamming
    * distance); distinct content flips ~half the bits — AHashSpec
    * measures both ends. */
  private[graft] def aHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) +
          587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
        val c = cy * 8 + x * 8 / w
        sums(c) += luma
        cnts(c) += 1
        total += luma
        x += 1
      }
      y += 1
    }
    val mean = total / (w.toLong * h)
    var bits = 0L
    var c = 0
    while (c < 64) {
      if (cnts(c) > 0 && sums(c) / cnts(c) > mean)
        bits |= 1L << c
      c += 1
    }
    bits
  }

  /** m06: perceptual near-dup pairs over REAL decoded images — aHash per
    * image (one decode per row inside `mapPartitions`, the codec seam's
    * batch shape), then hamming-banded candidate generation on the 64-bit
    * fingerprints (8 bands of 8 bits: by pigeonhole any pair within
    * hamming 7 is a candidate — t13's recipe at double width) and the
    * exact bit_count(xor) check on candidates only. DuckDB cannot decode
    * PNGs, so the gate is AHashSpec (synthesized images: exact copies at
    * hamming 0, perturbed copies within the radius, distinct content
    * filtered out) — the same spec-gated footing as the codec itself. */
  def m06AHashPairs(images: DataFrame, maxHamming: Int = 6): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val sig = images.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          // A corrupt-but-recognized payload can throw inside the codec;
          // rethrow with the row's identity attached so one bad image in a
          // large batch is attributable (the null return already is).
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](1)))
            catch {
              case e: Exception =>
                throw new IllegalArgumentException(
                  s"media_id $id: image decode failed", e)
            }
          require(img != null, s"media_id $id: not an image")
          (id, aHash(img))
        }
      }(enc)
      .toDF("doc_id", "simhash")
    graft.ext.TextOps
      .simhashBandedPairs(sig, nBands = 8, width = 64)
      .filter(col("hamming") <= maxHamming)
      .select(col("a").as("media_a"), col("b").as("media_b"),
        col("hamming"))
  }

  /** 8 luminance patterns chosen to be far apart in 8×8 block-mean space
    * (aHash's feature space): gradients in four orientations, two
    * checkerboard phases, two half-plane splits. Images of the same class
    * are pixel-identical; distinct classes sit at large hamming distance,
    * so the pair structure of the gate corpus is a pure function of the
    * class assignment. */
  private[graft] def classPng(cls: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val l = cls match {
          case 0 => (x * 4) & 0xff
          case 1 => (y * 4) & 0xff
          case 2 => 255 - ((x * 4) & 0xff)
          case 3 => 255 - ((y * 4) & 0xff)
          case 4 => if (((x / 8) + (y / 8)) % 2 == 0) 0 else 255
          case 5 => if (((x / 8) + (y / 8)) % 2 == 0) 255 else 0
          // Diagonal gradients, not half-plane splits: a half-plane's
          // above-mean cell set is exactly a gradient's (x<32 dark ≡
          // right-half cells set, the same bits as cls 0), which collides
          // at hamming 0. The triangles sit ≥16 bits from every other
          // class.
          case 6 => ((x + y) * 2) & 0xff
          case _ => ((x + 63 - y) * 2) & 0xff
        }
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic PNG corpus for the m06 gate: one real 64×64
    * PNG per document (bounded slice), class = doc_id % 8. PNG is lossless
    * and the pixels are set explicitly, so decode→aHash is bit-exact on
    * every JVM — the q20/e07 pinned-contract precedent applied to a codec
    * DuckDB does not have. Encoding runs executor-side in the same
    * mapPartitions shape the decode path uses. */
  private[graft] def syntheticImages(s: SparkSession, dir: String,
      maxId: Long = 240L): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.BINARY)
    documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") < maxId)
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          (id, classPng((id % 8).toInt))
        }
      }(enc)
      .toDF("media_id", "content")
  }

  /** m06 registry gate: real PNG decode → aHash → banded candidate
    * generation → exact hamming filter, over the pinned synthetic corpus.
    * Same-class images are pixel-identical (hamming 0) and the 8 classes
    * are structurally far apart (≥16 bits pairwise by cell-count
    * analysis; the gate's exact row count re-proves no cross-class pair
    * within the radius on every run), so the
    * oracle replays the expected pair set — every within-class pair at
    * hamming 0 — from `documents` alone, gating the full decode pipeline
    * through the DuckDB hash compare without DuckDB decoding a pixel. */
  /** The decoded-aHash candidate pairs over the pinned corpus as a
    * per-corpus artifact: a pure function of the corpus shared by the
    * m06 report and the m07 cross-modal join (the substring_spans
    * discipline — decode the 240 PNGs once per JVM, not once per
    * consumer). */
  private def aHashPairsArtifact(s: SparkSession, dir: String): DataFrame =
    Artifacts.materialized(s, "ahash_pairs", dir)(
      m06AHashPairs(syntheticImages(s, dir)))

  def m06AHashPairsGate(s: SparkSession, dir: String): DataFrame =
    aHashPairsArtifact(s, dir)
      .sortedWide("media_a", "media_b")

  val m06Oracle: String =
    """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 240)
      |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
      |  CAST(0 AS BIGINT) AS hamming
      |FROM d a JOIN d b
      |  ON a.doc_id % 8 = b.doc_id % 8 AND a.doc_id < b.doc_id
      |ORDER BY media_a, media_b""".stripMargin

  /** m07: cross-modal consistency — for every visually-duplicate image
    * pair (m06's decoded-aHash candidates over the pinned corpus), how
    * much do the two captions agree? Identical images carrying unrelated
    * captions are the classic noisy-pair signal in caption-image training
    * sets (one label is wrong, or the pair is a re-post with drifted alt
    * text); high caption overlap marks a pure duplicate for t01-style
    * collapse. Agreement = distinct shared tokens between the captions
    * (integer-exact; boolean caption identity is degenerate on this
    * corpus — every text is unique — so the gate scores the graded
    * signal a curation threshold would actually cut on). The image side
    * decodes real PNGs; the text side replays in DuckDB.
    *
    * Scale shape: m06's banded candidate generation (never all-pairs)
    * plus two equi-joins from the pair's media ids to the caption
    * projection of `documents`, then a per-pair array intersect — at
    * 100 TB the caption side is one narrow column keyed on the join id
    * and the intersect is caption-bounded, not corpus-bounded. */
  def m07CrossModalConsistency(s: SparkSession, dir: String): DataFrame = {
    val caps = documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    aHashPairsArtifact(s, dir)
      .join(caps.select(col("doc_id").as("media_a"), col("toks").as("ta")),
        "media_a")
      .join(caps.select(col("doc_id").as("media_b"), col("toks").as("tb")),
        "media_b")
      .select(col("media_a"), col("media_b"), col("hamming"),
        size(array_intersect(col("ta"), col("tb"))).cast("long")
          .as("caption_overlap"))
      .sortedWide("media_a", "media_b")
  }

  /** Replays m06's pinned pair structure and the caption-token overlap
    * from `documents` alone (DuckDB decodes no pixels — the m06
    * contract-oracle precedent). */
  val m07Oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents WHERE doc_id < 240)
      |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
      |  CAST(0 AS BIGINT) AS hamming,
      |  CAST(len(list_distinct(list_intersect(a.toks, b.toks)))
      |    AS BIGINT) AS caption_overlap
      |FROM d a JOIN d b
      |  ON a.doc_id % 8 = b.doc_id % 8 AND a.doc_id < b.doc_id
      |ORDER BY media_a, media_b""".stripMargin

  // --- m08: audio frame energy / voice-activity detection --------------

  final case class AudioActivity(
      media_id: Long, n_frames: Int, active_frames: Int, speech_pct: Long,
      first_active: Int, last_active: Int)

  /** Samples per analysis frame (a production VAD frames PCM at 10–30 ms;
    * the stand-in payload is byte-per-sample). */
  private val AudioFrameBytes = 16

  /** Per-sample activity threshold: a frame is "speech" when its mean
    * sample value exceeds this (integer cross-multiplied — no division). */
  private val AudioActiveAvg = 90L

  /** m08: voice-activity detection over the audio rows of the media table —
    * the silence-trim / speech-ratio pass an audio training pipeline runs
    * before transcription. Frames each payload (16-sample frames, final
    * partial frame included), computes per-frame energy, flags frames
    * whose mean sample exceeds the threshold, and reports per clip the
    * frame count, active count, speech percentage, and the first/last
    * active frame (the trim points). −1 sentinels mark all-silence clips.
    *
    * Same executor-batch shape as m02: one mapPartitions kernel over the
    * binary column — a production deployment swaps the byte loop for a
    * real PCM decode + energy/zero-crossing VAD with identical plumbing
    * (narrow map, no shuffle, pipelines with the scan at 100 TB). The
    * stand-in arithmetic is integer-exact so the DuckDB oracle replays
    * it from the documents bytes. */
  def m08AudioActivity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    audioActivityOf(
        media(s, dir).filter(col("kind") === "audio").as[MediaRow])
      .sortedWide("media_id")
  }

  /** The VAD kernel alone over any MediaRow dataset — stateless
    * mapPartitions, so the streaming twin runs it unchanged over a file
    * stream ([[graft.streaming.Streams.audioActivityStream]]). */
  private[graft] def audioActivityOf(
      ds: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
        rows.map { m =>
          val n = m.content.length
          val nFrames = (n + AudioFrameBytes - 1) / AudioFrameBytes
          var f = 0
          var active = 0
          var first = -1
          var last = -1
          while (f < nFrames) {
            val lo = f * AudioFrameBytes
            val hi = math.min(lo + AudioFrameBytes, n)
            var e = 0L
            var i = lo
            while (i < hi) { e += (m.content(i) & 0xff); i += 1 }
            if (e > AudioActiveAvg * (hi - lo)) {
              active += 1
              if (first < 0) first = f
              last = f
            }
            f += 1
          }
          val pct = if (nFrames == 0) 0L else 100L * active / nFrames
          AudioActivity(m.media_id, nFrames, active, pct, first, last)
        }
      }
      .toDF()
  }

  /** Replays the frame/energy arithmetic from the documents bytes via the
    * m02 hex-slice recipe (constant generate_series; 1024 ≥ corpus max). */
  val m08Oracle: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 1),
       |idx AS (SELECT unnest(generate_series(1, 1024)) AS i),
       |b AS (
       |  SELECT media_id, (i - 1) // $AudioFrameBytes AS f,
       |    CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS bv
       |  FROM m JOIN idx ON i <= n),
       |fr AS (
       |  SELECT media_id, f, SUM(bv) AS e, COUNT(*) AS fn
       |  FROM b GROUP BY media_id, f),
       |fl AS (SELECT media_id, f, e > $AudioActiveAvg * fn AS act FROM fr)
       |SELECT media_id,
       |  CAST(COUNT(*) AS INTEGER) AS n_frames,
       |  CAST(SUM(CAST(act AS INTEGER)) AS INTEGER) AS active_frames,
       |  CAST(100 * SUM(CAST(act AS BIGINT)) // COUNT(*) AS BIGINT)
       |    AS speech_pct,
       |  CAST(coalesce(MIN(CASE WHEN act THEN f END), -1) AS INTEGER)
       |    AS first_active,
       |  CAST(coalesce(MAX(CASE WHEN act THEN f END), -1) AS INTEGER)
       |    AS last_active
       |FROM fl GROUP BY media_id ORDER BY media_id""".stripMargin

  // --- m09: video scene-change detection -------------------------------

  final case class SceneStats(
      media_id: Long, n_frames: Int, n_cuts: Int, n_scenes: Int,
      longest_scene: Int, first_cut: Int)

  /** Mean-intensity jump (per sample, integer) that counts as a hard cut. */
  private val SceneCutDelta = 8L

  /** m09: scene-change detection over the video rows — the shot-boundary
    * pass a video training pipeline runs before sampling frames per scene
    * (so a 2-hour single-shot clip and a 200-cut trailer don't yield the
    * same frame budget). Frames each payload (16-sample frames), computes
    * per-frame mean intensity, declares a cut wherever the mean jumps by
    * ≥ [[SceneCutDelta]] between consecutive frames, and reports per clip
    * the cut count, scene count, longest scene run, and first cut point
    * (−1 when single-scene). A production deployment replaces the byte
    * loop with a real frame decode + histogram distance inside the same
    * kernel; everything downstream is unchanged.
    *
    * Same executor-batch shape as m02/m08: one mapPartitions kernel, no
    * shuffle, pipelines with the scan — at 100 TB the cost is the scan
    * itself. The scene segmentation (gaps-and-islands over cut flags) is
    * computed inside the kernel per clip: payloads are row-local, so no
    * window exchange is needed — the oracle replays the same segmentation
    * relationally with a cumulative-sum window. */
  def m09SceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).filter(col("kind") === "video").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val n = m.content.length
          val nFrames = (n + AudioFrameBytes - 1) / AudioFrameBytes
          val means = Array.tabulate(nFrames) { f =>
            val lo = f * AudioFrameBytes
            val hi = math.min(lo + AudioFrameBytes, n)
            var e = 0L
            var i = lo
            while (i < hi) { e += (m.content(i) & 0xff); i += 1 }
            e / (hi - lo)
          }
          var cuts = 0
          var firstCut = -1
          var run = 1
          var longest = if (nFrames > 0) 1 else 0
          var f = 1
          while (f < nFrames) {
            if (math.abs(means(f) - means(f - 1)) >= SceneCutDelta) {
              cuts += 1
              if (firstCut < 0) firstCut = f
              run = 1
            } else run += 1
            if (run > longest) longest = run
            f += 1
          }
          SceneStats(m.media_id, nFrames, cuts, cuts + 1, longest, firstCut)
        }
      }
      .toDF()
      .sortedWide("media_id")
  }

  /** Replays frame means from the documents bytes (m02 hex-slice recipe),
    * the cut flags via a lag window, and the scene runs via a
    * cumulative-sum gaps-and-islands segmentation. */
  val m09Oracle: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 2),
       |idx AS (SELECT unnest(generate_series(1, 1024)) AS i),
       |b AS (
       |  SELECT media_id, (i - 1) // $AudioFrameBytes AS f,
       |    CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS bv
       |  FROM m JOIN idx ON i <= n),
       |fr AS (
       |  SELECT media_id, f, SUM(bv) // COUNT(*) AS mn
       |  FROM b GROUP BY media_id, f),
       |cf AS (
       |  SELECT media_id, f,
       |    CASE WHEN lag(mn) OVER w IS NOT NULL
       |           AND abs(mn - lag(mn) OVER w) >= $SceneCutDelta
       |         THEN 1 ELSE 0 END AS cut
       |  FROM fr WINDOW w AS (PARTITION BY media_id ORDER BY f)),
       |sc AS (
       |  SELECT media_id, f, cut,
       |    SUM(cut) OVER (PARTITION BY media_id ORDER BY f) AS scene
       |  FROM cf),
       |runs AS (
       |  SELECT media_id, scene, COUNT(*) AS run_len
       |  FROM sc GROUP BY media_id, scene)
       |SELECT sc.media_id,
       |  CAST(COUNT(*) AS INTEGER) AS n_frames,
       |  CAST(SUM(cut) AS INTEGER) AS n_cuts,
       |  CAST(SUM(cut) + 1 AS INTEGER) AS n_scenes,
       |  CAST((SELECT MAX(run_len) FROM runs r
       |        WHERE r.media_id = sc.media_id) AS INTEGER) AS longest_scene,
       |  CAST(coalesce(MIN(CASE WHEN cut = 1 THEN f END), -1) AS INTEGER)
       |    AS first_cut
       |FROM sc GROUP BY sc.media_id ORDER BY sc.media_id""".stripMargin

  // --- m10: video content dedup ----------------------------------------

  final case class VideoSig(media_id: Long, n_frames: Int, sig: String)

  /** m10: video-level content deduplication — the "same clip uploaded
    * twice" collapse a video training pipeline runs before any frame
    * sampling (frame-level near-dup inside one clip is m05's job; scene
    * segmentation is m09's). Each clip reduces to a perceptual signature
    * in the kernel — here the per-frame mean-intensity sequence, the
    * integer stand-in for a real per-frame pHash sequence — and clips
    * group on the md5 of that signature: only the 32-hex digest ever
    * rides the shuffle, never the signature (or the payload), the m05/t30
    * digest discipline. Keeper election is min(media_id); the report
    * lists each duplicate group once (n_copies ≥ 2).
    *
    * Same executor-batch shape as m08/m09: one mapPartitions kernel
    * pipelining with the scan, then ONE digest-keyed exchange whose
    * volume is a digest+id pair per clip — at 100 TB the scan dominates
    * and the shuffle is metadata-sized. A production deployment swaps the
    * byte loop for a real decode + per-frame pHash inside the same
    * kernel; grouping, election, and report are unchanged. The report
    * lists EVERY fingerprint group (singletons included — n_copies = 1
    * means "already unique"), so the gate hash-verifies the fingerprint
    * computation even on a corpus with few exact clips; on the 10×
    * duplicate replica every group carries its copy count. */
  def m10VideoDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).filter(col("kind") === "video").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { m =>
          val n = m.content.length
          val nFrames = (n + AudioFrameBytes - 1) / AudioFrameBytes
          val means = new Array[Long](nFrames)
          var f = 0
          while (f < nFrames) {
            val lo = f * AudioFrameBytes
            val hi = math.min(lo + AudioFrameBytes, n)
            var e = 0L
            var i = lo
            while (i < hi) { e += (m.content(i) & 0xff); i += 1 }
            means(f) = e / (hi - lo)
            f += 1
          }
          VideoSig(m.media_id, nFrames, nFrames.toString + ":" +
            means.mkString(","))
        }
      }
      .toDF()
      .select(col("media_id"), col("n_frames"),
        graft_md5(col("sig")).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_copies"),
        min(col("media_id")).as("keeper"),
        min(col("n_frames")).cast("long").as("n_frames"))
      .select(col("fp"), col("n_copies"), col("keeper"), col("n_frames"))
      .sortedWide("fp")
  }

  /** Replays frame means from the documents bytes (the m09 CTE), the
    * signature string, and the group report. The byte-index series is
    * sized to the SAME ≤ 2 KiB payload contract m11's oracle states
    * (32 × 64-byte chunks): a payload in (1024, 2048] must make BOTH
    * gates agree, not pass one and silently truncate the other. */
  val m10Oracle: String =
    s"""WITH m AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n
       |  FROM documents WHERE doc_id % 3 = 2),
       |idx AS (SELECT unnest(generate_series(1, 2048)) AS i),
       |b AS (
       |  SELECT media_id, (i - 1) // $AudioFrameBytes AS f,
       |    CAST(('0x' || substr(hx, 2 * i - 1, 2)) AS BIGINT) AS bv
       |  FROM m JOIN idx ON i <= n),
       |fr AS (
       |  SELECT media_id, f, SUM(bv) // COUNT(*) AS mn
       |  FROM b GROUP BY media_id, f),
       |sig AS (
       |  SELECT media_id,
       |    md5(CAST(COUNT(*) AS VARCHAR) || ':' ||
       |        string_agg(CAST(mn AS VARCHAR), ',' ORDER BY f)) AS fp
       |  FROM fr GROUP BY media_id),
       |g AS (
       |  SELECT fp, COUNT(*) AS n_copies, MIN(media_id) AS keeper
       |  FROM sig GROUP BY fp)
       |SELECT g.fp, g.n_copies, g.keeper,
       |  CAST((SELECT COUNT(*) FROM fr WHERE fr.media_id = g.keeper)
       |    AS BIGINT) AS n_frames
       |FROM g ORDER BY fp""".stripMargin

  // --- m11: content-addressed chunk dedup --------------------------------

  /** m11: chunk-level storage deduplication across ALL media payloads —
    * the content-addressable-store manifest a 100 TB blob pipeline builds
    * at ingest: every payload splits into fixed 64-byte chunks, each
    * chunk is addressed by digest, and the report is one row per distinct
    * chunk with its reference count, the media fan-in, and the keeper
    * reference (lexicographic (media, offset) election — the t01 keeper
    * discipline at chunk granularity). `n_refs > 1` rows are exactly the
    * bytes a content-addressed store would NOT store twice.
    *
    * Plan shape: chunking is pure projection — `substring` on the binary
    * column + the md5 digest, all inside whole-stage codegen, no kernel
    * needed — and the ONE exchange is keyed by digest carrying
    * (32-hex, media_id, offset) per chunk: shuffle volume is metadata-
    * sized relative to payload bytes (the m05/m10 digest discipline). At
    * 100 TB a real deployment uses CDC boundaries (t42's rolling-hash
    * kernel) instead of fixed offsets; grouping, election, and manifest
    * are unchanged. */
  private val OffBase = 1L << 24 // chunk slots per payload (1 GiB at 64 B)
  private val MediaIdCap = 1L << 38 // packed alongside OffBase in one long

  def m11ChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val cb = 64
    media(s, dir)
      .filter(length(col("content")) > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L),
          expr(s"CAST((length(content) - 1) div $cb AS BIGINT)"))).as("ci"),
        col("content"))
      .select(col("media_id"), col("ci"),
        lower(hex(expr(
          s"substring(content, CAST(ci * $cb + 1 AS INT), $cb)")))
          .as("chunk_hex"))
      .select(col("media_id"), col("ci"),
        graft_md5(col("chunk_hex")).as("fp"),
        expr("CAST(length(chunk_hex) div 2 AS BIGINT)").as("chunk_bytes"))
      // Keeper election packs (media_id, offset) into ONE long so the
      // lexicographic min stays a plain hash-aggregable MIN — min over a
      // STRUCT forces SortAggregate (a per-partition sort the 100 TB plan
      // doesn't need). 2^24 chunk slots = 1 GiB payloads at 64 B; the
      // winnowing PosBase guard discipline: overflow throws mid-scan
      // instead of silently mis-electing.
      .filter(assert_true(
        col("ci") < lit(OffBase) && col("media_id") < lit(MediaIdCap),
        lit(s"m11: chunk offset >= $OffBase or media_id >= $MediaIdCap; " +
          "widen OffBase/MediaIdCap")).isNull)
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("media_id")).as("n_media"),
        min(col("chunk_bytes")).as("chunk_bytes"),
        min(col("media_id") * OffBase + col("ci")).as("kp"))
      .select(col("fp"), col("n_refs"), col("n_media"), col("chunk_bytes"),
        expr(s"kp div $OffBase").as("keeper_media"),
        (col("kp") % OffBase).as("keeper_off"))
      .sortedWide("fp")
  }

  /** Chunks the hex string (2 chars per byte) where the engine slices the
    * blob — DuckDB has no BLOB substring. The chunk-index table is a
    * constant 0..31 joined on `ci*64 < n` (payloads here are ≤ 2 KiB by
    * testdata contract; a longer payload makes the engine emit chunks the
    * oracle misses and the hash gate goes loud, not stale). */
  val m11Oracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx,
      |    octet_length(encode(text)) AS n
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |idx AS (SELECT unnest(range(0, 32)) AS ci),
      |c AS (
      |  SELECT media_id, CAST(ci AS BIGINT) AS ci,
      |    md5(substr(hx, CAST(ci * 128 + 1 AS INT), 128)) AS fp,
      |    CAST(length(substr(hx, CAST(ci * 128 + 1 AS INT), 128)) // 2
      |      AS BIGINT) AS chunk_bytes
      |  FROM m JOIN idx ON ci * 64 < n),
      |g AS (
      |  SELECT fp, COUNT(*) AS n_refs, COUNT(DISTINCT media_id) AS n_media,
      |    CAST(MIN(chunk_bytes) AS BIGINT) AS chunk_bytes
      |  FROM c GROUP BY fp),
      |k AS (
      |  SELECT fp, media_id AS keeper_media, ci AS keeper_off,
      |    row_number() OVER (PARTITION BY fp ORDER BY media_id, ci) AS rn
      |  FROM c)
      |SELECT g.fp, g.n_refs, g.n_media, g.chunk_bytes,
      |  k.keeper_media, k.keeper_off
      |FROM g JOIN k ON g.fp = k.fp AND k.rn = 1 ORDER BY g.fp""".stripMargin

  val all: Seq[Q] = Seq(
    Q("m01_media_meta", m01MediaMeta, Some(m01Oracle)),
    Q("m02_decode_features", m02DecodeFeatures, Some(m02Oracle)),
    Q("m03_frame_sample", m03FrameSample, Some(m03Oracle)),
    Q("m04_resize", m04Resize, Some(m04Oracle)),
    Q("m05_frame_dedup", m05FrameDedup, Some(m05Oracle)),
    Q("m06_ahash_pairs", m06AHashPairsGate, Some(m06Oracle)),
    Q("m07_crossmodal_consistency", m07CrossModalConsistency,
      Some(m07Oracle)),
    Q("m08_audio_activity", m08AudioActivity, Some(m08Oracle)),
    Q("m09_scene_cuts", m09SceneCuts, Some(m09Oracle)),
    Q("m10_video_dedup", m10VideoDedup, Some(m10Oracle)),
    Q("m11_chunk_dedup", m11ChunkDedup, Some(m11Oracle)))
}
