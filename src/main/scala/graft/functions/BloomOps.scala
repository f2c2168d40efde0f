package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter — the broadcast-sketch
  * half of the scale path for set membership (t34's decontamination gate):
  * build the filter over the SMALL side (a benchmark's shingles, a
  * blocklist), ship it inside the expression, and probe the 100 TB side in
  * a map-only scan with zero shuffle.
  *
  * The filter travels as its serialized bytes (a plan-embedded constant,
  * like a broadcast literal); each JVM deserializes it once into a
  * transient lazy, and generated code probes via a plan reference object —
  * no per-row deserialization, no UDF. Spark's `util.sketch.BloomFilter`
  * is deterministic (Murmur3 seed 0, bit-OR merge is order-insensitive),
  * so probe results are reproducible across runs and partitionings —
  * which is what lets an oracle gate the no-false-negative contract.
  *
  * Not registered in [[graft.GraftExtensions]]: the filter argument is a
  * runtime-built object, not a SQL-expressible literal — this is a
  * programmatic operator by nature.
  */
case class BloomContainsLong(filter: Array[Byte], child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filter))

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bf, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

object BloomOps {

  /** Column API: true iff `key` (a long, e.g. `xxhash64(gram)`) might be in
    * the filter. False ⇒ definitely absent — the Bloom contract. */
  def bloom_contains_long(filter: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomContainsLong(filter, GraftBridge.expression(key)))

  /** Serialize a built filter for plan embedding. */
  def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Distributed Bloom CONSTRUCTION as an aggregate Column: one pass
    * builds a filter over `key` (a long — e.g. `xxhash64(...)`) per
    * group, returning the serialized bytes. This is Catalyst's own
    * runtime-filter aggregate reused as a public building block — the
    * store's per-file bloom sidecars ([[graft.psn.TableStore.analyzeBloom]])
    * group by `input_file_name()` and build every file's filter in ONE
    * job instead of one job per file. */
  def bloom_build_agg(key: Column, expectedItems: Long,
      fpp: Double): Column = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bloom_build_agg: need items > 0 and 0 < fpp < 1")
    // optimalNumOfBits(n, p) = -n ln p / (ln 2)^2
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(key),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }
}
