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
