package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document WordPiece tokenization stats in ONE expression call:
  * split `text` on single spaces (Spark's `split(text, " ")` semantics)
  * and, per word, run the greedy longest-prefix strip over the vocabulary
  * trie — the EXACT algorithm of `TextOps3.tokenizeTrie` (equality-spec'd
  * against the fused form in WordpieceTrieSpec) — returning
  * struct(n_words, n_pieces, n_unk).
  *
  * Why an expression: t45's DataFrame spelling exploded every word
  * instance, distinct'd the corpus token stream, tokenized the distinct
  * words, joined the instances back and re-aggregated per document —
  * three shuffles of corpus-token-sized streams to compute facts each
  * document holds locally. This kernel is one narrow projection: the
  * vocabulary ships as a plan literal (KB-sized model artifact, the
  * codebook discipline), the trie builds once per task, and a per-task
  * word→(pieces, unk) memo makes the Zipfian tail free — the greedy walk
  * is paid once per DISTINCT word per task, not once per occurrence. The
  * memo is bounded (2^17 entries, insert-only then pass-through), so an
  * adversarial vocabulary degrades to the uncached walk, never to
  * unbounded memory. At 100 TB: a pure corpus scan, zero exchanges
  * before the output sort — the shape a production tokenizer-stats pass
  * (HF tokenizers over a Spark scan) actually takes.
  *
  * CodegenFallback is deliberate: the per-row cost is the word loop
  * itself; one interpreted dispatch per document is noise against it. */
case class WpTokenStats(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))
  override def prettyName: String = "graft_wp_token_stats"

  // Per-task state: tasks deserialize their own expression instance, so
  // the trie builds once per task and the memo never crosses tasks.
  @transient private lazy val trie = WpTokenStats.buildTrie(vocab)
  @transient private lazy val memo =
    new java.util.HashMap[String, Array[Long]](1 << 12)

  override protected def nullSafeEval(input: Any): Any = {
    var nWords = 0L
    var nPieces = 0L
    var nUnk = 0L
    SpaceTokens.foreach(input.asInstanceOf[UTF8String].toString) { w =>
      nWords += 1L
      var pu = memo.get(w)
      if (pu == null) {
        pu = WpTokenStats.greedy(trie, w)
        if (memo.size < WpTokenStats.MemoCap) memo.put(w, pu)
      }
      nPieces += pu(0)
      nUnk += pu(1)
    }
    new GenericInternalRow(Array[Any](nWords, nPieces, nUnk))
  }

  override protected def withNewChildInternal(newChild: Expression): WpTokenStats =
    copy(child = newChild)
}

object WpTokenStats {
  private[functions] val MemoCap = 1 << 17

  /** children(node): Char → next node; terminal(node): a piece ends here.
    * The tokenizeTrie layout, built once per task from the literal vocab. */
  final class Trie(val children: Array[java.util.HashMap[Character, Integer]],
      val terminal: Array[Boolean])

  private[functions] def buildTrie(vocab: Seq[String]): Trie = {
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val terminal = scala.collection.mutable.ArrayBuffer(false)
    vocab.foreach { p =>
      var n = 0
      p.foreach { ch =>
        val nxt = children(n).get(ch)
        n = if (nxt != null) nxt.intValue()
        else {
          children += new java.util.HashMap[Character, Integer]()
          terminal += false
          val id = children.length - 1
          children(n).put(ch, Integer.valueOf(id))
          id
        }
      }
      terminal(n) = true
    }
    new Trie(children.toArray, terminal.toArray)
  }

  /** Greedy longest-prefix strip — tokenizeTrie's loop verbatim:
    * (pieces, unk) for one word. */
  private[functions] def greedy(t: Trie, w: String): Array[Long] = {
    var i = 0
    var nPieces = 0L
    var nUnk = 0L
    while (i < w.length) {
      var n = 0
      var j = i
      var lastEnd = -1
      var live = true
      while (live && j < w.length) {
        val nxt = t.children(n).get(w.charAt(j))
        if (nxt != null) {
          n = nxt.intValue()
          j += 1
          if (t.terminal(n)) lastEnd = j
        } else live = false
      }
      if (lastEnd > i) { nPieces += 1L; i = lastEnd }
      else { nUnk += 1L; i += 1 }
    }
    Array(nPieces, nUnk)
  }

  def wp_token_stats(c: Column, vocab: Seq[String]): Column =
    GraftBridge.column(WpTokenStats(GraftBridge.expression(c), vocab))
}
