package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MD5-hex with a thread-local digest instance.
  *
  * Spark's built-in `md5` calls `MessageDigest.getInstance` per row, which
  * synchronizes on the JCA provider table — measured on this box, 16-way
  * parallel md5 runs barely faster than single-threaded (1.9s vs 2.6s for
  * 5.5M hashes). The MinHash/LSH dedup path hashes every shingle of every
  * document, making md5 its hot kernel at scale; a thread-local digest
  * removes the contention while producing bit-identical output (MD5 is
  * MD5 — DuckDB oracle parity is preserved).
  */
case class Md5Hex(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hex.hexDigest(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Hex.hexDigest($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hex =
    copy(child = newChild)
}

object Md5Hex {
  private val local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  /** Static entry point shared by interpreted eval and generated code. */
  def hexDigest(input: UTF8String): UTF8String = {
    val md = local.get()
    md.reset()
    val digest = md.digest(input.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Column API: drop-in for `functions.md5(col.cast("string"))`. */
  def graft_md5(c: Column): Column =
    GraftBridge.column(Md5Hex(GraftBridge.expression(c)))
}

/** 8 MinHash lanes per input in one expression call: md5('0'‖s) and
  * md5('1'‖s), each split into four big-endian 32-bit words (= the numeric
  * value of each 8-hex-char slice of the digest, so `min(lane)` over longs
  * is ordered identically to the oracle's `min(substr(md5_hex, 8j+1, 8))`
  * over zero-padded hex strings). No intermediate strings: the seeded
  * digests are computed byte-wise, and downstream aggregation runs on
  * primitive longs — this is the shingle pipeline's hot kernel. */
case class Md5Lanes(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_md5_lanes"

  override protected def nullSafeEval(input: Any): Any =
    Md5Lanes.lanes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Lanes.lanes($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)
}

object Md5Lanes {
  private val local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def lanes(input: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val md = local.get()
    val bytes = input.getBytes
    val out = new Array[Long](8)
    var seed = 0
    while (seed < 2) {
      md.reset()
      md.update(('0' + seed).toByte)
      md.update(bytes)
      val d = md.digest()
      var j = 0
      while (j < 4) {
        out(seed * 4 + j) =
          ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
        j += 1
      }
      seed += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def graft_md5_lanes(c: Column): Column =
    GraftBridge.column(Md5Lanes(GraftBridge.expression(c)))
}

/** Whole-document hashed-bucket fold in one codegen'd call: split `text`
  * on single spaces (Spark's `split(text, " ")` semantics — trailing and
  * doubled separators yield empty tokens, which hash like any other) and
  * sum `weights[bucket(token)]`, where bucket = the first 8 hex chars of
  * md5(prefix‖token) as an unsigned int, mod `dim` — the t14/t50 hashing
  * recipe, bit-identical to the `conv(substring(md5(..),1,8),16,10) % dim`
  * column chain it replaces.
  *
  * Why an expression: the DataFrame spelling is `aggregate(split(..), ..)`
  * — a higher-order function whose lambda Spark evaluates INTERPRETED,
  * per token, re-walking a five-node expression tree with UTF8String
  * allocations at every step (t50/t52/t55's dominant cost; their 10×
  * growth ratios topped the suite). This kernel is one generated call per
  * document with a tight JVM loop — and a per-thread token→bucket memo,
  * because a corpus's token stream is Zipfian: the md5 is paid once per
  * DISTINCT token per task, not once per occurrence. The memo is bounded
  * (2^17 entries, insert-only, then pass-through) so a pathological
  * vocabulary degrades to the uncached cost, never to unbounded memory.
  * Weights ride along as a plan literal (KB-sized model artifact — the
  * codebook discipline). */
case class Md5BucketSum(child: Expression, prefix: String, dim: Int,
    weights: Array[Long]) extends UnaryExpression {
  require(weights.length == dim, s"weights.length ${weights.length} != dim $dim")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_md5_bucket_sum"

  override protected def nullSafeEval(input: Any): Any =
    Md5BucketSum.fold(input.asInstanceOf[UTF8String], prefix, dim, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "long[]")
    val p = ctx.addReferenceObj("prefix", prefix, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5BucketSum.fold($c, $p, $dim, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5BucketSum =
    copy(child = newChild)
}

object Md5BucketSum {
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val cacheLocal: ThreadLocal[java.util.HashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, java.lang.Long](1 << 12))
  private val CacheCap = 1 << 17

  /** First 4 md5 bytes of (prefix‖tok) as an unsigned 32-bit value, mod
    * dim — memoized per thread (bucket depends only on the key, so t50
    * and t52 share entries; the key carries dim to keep t55's 128-bucket
    * space distinct). */
  def bucketOf(prefix: String, tok: String, dim: Int): Long = {
    val key = dim + ":" + prefix + tok
    val c = cacheLocal.get()
    val hit = c.get(key)
    if (hit != null) hit.longValue()
    else {
      val md = md5Local.get()
      md.reset()
      val d = md.digest((prefix + tok)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val v = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % dim
      if (c.size < CacheCap) c.put(key, java.lang.Long.valueOf(v))
      v
    }
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def fold(text: UTF8String, prefix: String, dim: Int,
      weights: Array[Long]): Long = {
    var acc = 0L
    SpaceTokens.foreach(text.toString)(tok =>
      acc += weights(bucketOf(prefix, tok, dim).toInt))
    acc
  }

  def graft_md5_bucket_sum(c: Column, prefix: String, dim: Int,
      weights: Array[Long]): Column =
    GraftBridge.column(
      Md5BucketSum(GraftBridge.expression(c), prefix, dim, weights))
}

/** ONE copy of the kernels' tokenization contract: iterate the tokens of
  * `split(text, " ")` with Spark's limit=-1 semantics — every single
  * space is a separator, so doubled and trailing separators yield empty
  * tokens, and the empty string yields one empty token. Md5BucketSum and
  * WpTokenStats both pin cross-engine parity on exactly this behavior;
  * sharing the loop keeps them from ever diverging. */
private[functions] object SpaceTokens {
  def foreach(s: String)(f: String => Unit): Unit = {
    var start = 0
    var done = false
    while (!done) {
      val idx = s.indexOf(' ', start)
      f(if (idx < 0) s.substring(start) else s.substring(start, idx))
      if (idx < 0) done = true else start = idx + 1
    }
  }
}
