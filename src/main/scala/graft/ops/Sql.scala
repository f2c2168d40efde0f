package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.psn.TableStore
import graft.tables.Tables

/** SQL entry point. The reference ships SQL text to BigQuery
  * (/root/reference/main.py:153-157, 274-284); in this engine the same
  * surface is `spark.sql` over registered corpus views — parsed by Catalyst,
  * planned and executed like every DataFrame query (one engine, two
  * front-ends) — plus [[runDml]] for the reference's statement-level
  * UPDATE-FROM, routed through the versioned store's transactional merge.
  */
object Sql {
  /** Register every corpus table as a temp view named after the table. */
  def registerViews(s: SparkSession, dir: String): Unit =
    Tables.corpus.foreach { n =>
      Tables.load(s, dir, n).createOrReplaceTempView(n)
    }

  def run(s: SparkSession, dir: String, query: String): DataFrame = {
    registerViews(s, dir)
    s.sql(query)
  }

  /** The reference's upsert statement shape (main.py:274-284):
    * {{{
    * UPDATE `proj.ds.target` target
    * SET target.c1 = temp.c1, target.c2 = temp.c2 * 1.05, ...
    * FROM `proj.ds.temp` temp
    * WHERE target.id = temp.id
    * }}}
    * parsed to (target table, source table, join keys, column
    * assignments). Table ids keep only their last dotted segment — the
    * store is the single-namespace analog of `project.dataset`. */
  final case class UpdateFrom(target: String, source: String,
      targetKey: String, sourceKey: String, sets: Seq[(String, ValExpr)],
      residuals: Seq[MergePred] = Nil)

  /** A value expression in SET assignments / INSERT VALUES — the
    * statement-surface expression language: aliased columns (target OR
    * source side), numeric / string / DATE literals, `+ - * /`
    * arithmetic with the usual precedence and parentheses, and a single
    * `CASE WHEN <cmp> THEN <expr> ELSE <expr> END`. This is the surface
    * BigQuery statement users actually ship for adjustment jobs —
    * running balances (`SET t.bal = t.bal - s.amt`), guarded reprices
    * (`CASE WHEN s.d > 0.04 THEN t.p * 0.9 ELSE t.p END`). Anything
    * richer (function calls, nested CASE, AND/OR in the CASE condition)
    * stays loud-on-unsupported: the front-end covers the statement
    * surface, not general SQL expressions. */
  sealed trait ValExpr {
    /** Resolve to a Column given target-/source-side column resolvers
      * (the executors bind these to the current snapshot and the
      * collision-renamed source). */
    def toColumn(tgt: String => Column, src: String => Column): Column
    /** Source columns referenced — what the executor carries through the
      * source rename. */
    def srcCols: Set[String]
    /** Target columns referenced (INSERT VALUES rejects these — no
      * target row exists on the insert path). */
    def tgtCols: Set[String]
  }
  final case class VCol(onTarget: Boolean, column: String) extends ValExpr {
    def toColumn(tgt: String => Column, src: String => Column): Column =
      if (onTarget) tgt(column) else src(column)
    def srcCols: Set[String] = if (onTarget) Set.empty else Set(column)
    def tgtCols: Set[String] = if (onTarget) Set(column) else Set.empty
  }
  final case class VNum(raw: String) extends ValExpr {
    def toColumn(tgt: String => Column, src: String => Column): Column =
      if (raw.matches("-?\\d+")) lit(raw.toLong) else lit(raw.toDouble)
    def srcCols: Set[String] = Set.empty
    def tgtCols: Set[String] = Set.empty
  }
  final case class VStr(value: String) extends ValExpr {
    def toColumn(tgt: String => Column, src: String => Column): Column =
      lit(value)
    def srcCols: Set[String] = Set.empty
    def tgtCols: Set[String] = Set.empty
  }
  final case class VDate(iso: String) extends ValExpr {
    def toColumn(tgt: String => Column, src: String => Column): Column =
      lit(java.sql.Date.valueOf(iso))
    def srcCols: Set[String] = Set.empty
    def tgtCols: Set[String] = Set.empty
  }
  final case class VBin(l: ValExpr, op: String, r: ValExpr) extends ValExpr {
    def toColumn(tgt: String => Column, src: String => Column): Column = {
      val (a, b) = (l.toColumn(tgt, src), r.toColumn(tgt, src))
      op match {
        case "+" => a + b
        case "-" => a - b
        case "*" => a * b
        case "/" => a / b
      }
    }
    def srcCols: Set[String] = l.srcCols ++ r.srcCols
    def tgtCols: Set[String] = l.tgtCols ++ r.tgtCols
  }
  final case class VCase(cmpL: ValExpr, cmpOp: String, cmpR: ValExpr,
      thn: ValExpr, els: ValExpr) extends ValExpr {
    def toColumn(tgt: String => Column, src: String => Column): Column =
      when(cmpColumn(cmpL.toColumn(tgt, src), cmpOp,
        cmpR.toColumn(tgt, src)), thn.toColumn(tgt, src))
        .otherwise(els.toColumn(tgt, src))
    def srcCols: Set[String] =
      cmpL.srcCols ++ cmpR.srcCols ++ thn.srcCols ++ els.srcCols
    def tgtCols: Set[String] =
      cmpL.tgtCols ++ cmpR.tgtCols ++ thn.tgtCols ++ els.tgtCols
  }

  private def cmpColumn(lhs: Column, op: String, rhs: Column): Column =
    op match {
      case "=" => lhs === rhs
      case "<>" => lhs =!= rhs
      case "<" => lhs < rhs
      case ">" => lhs > rhs
      case "<=" => lhs <= rhs
      case ">=" => lhs >= rhs
    }

  /** One comparison literal as a Column: `DATE '…'`, `'…'`, or numeric
    * (integral → long, else double) — the shared typing rule for WHEN
    * predicates and WHERE residuals. */
  private def litColumn(l: String): Column = {
    val t = l.trim
    if (t.length > 4 && t.substring(0, 4).equalsIgnoreCase("DATE")) {
      val q = t.substring(4).trim
      lit(java.sql.Date.valueOf(q.substring(1, q.length - 1)))
    } else if (t.startsWith("'")) lit(t.substring(1, t.length - 1))
    else if (t.matches("-?\\d+")) lit(t.toLong)
    else lit(t.toDouble)
  }

  private def predColumn(p: MergePred, res: String => Column): Column =
    cmpColumn(res(p.column), p.op, litColumn(p.literal))

  /** Tokenizer + recursive-descent parser for [[ValExpr]] — ~40 lines
    * because the grammar is deliberately small (see the ValExpr doc).
    * Every dead end throws with the offending text: a statement surface
    * must be loud, never silently partial. */
  private object ExprParser {
    private val TokRe =
      ("""\s*(?:(<=|>=|<>|[=<>+\-*/().])|([A-Za-z_]\w*)|""" +
        """(\d+(?:\.\d+)?)|'([^']*)')""").r

    def parse(text: String, tAlias: String, sAlias: String): ValExpr = {
      // tokens: Left(op/punct) | Right(ident) | numbers/strings tagged
      val toks = scala.collection.mutable.ArrayBuffer[(String, String)]()
      var pos = 0
      while (pos < text.length && text.substring(pos).trim.nonEmpty) {
        TokRe.findPrefixMatchOf(text.substring(pos)) match {
          case Some(m) =>
            if (m.group(1) != null) toks += (("op", m.group(1)))
            else if (m.group(2) != null) toks += (("id", m.group(2)))
            else if (m.group(3) != null) toks += (("num", m.group(3)))
            else toks += (("str", m.group(4)))
            pos += m.end
          case None => throw new IllegalArgumentException(
            s"unsupported expression '$text': cannot read token at " +
              s"'${text.substring(pos).trim.take(20)}'")
        }
      }
      var i = 0
      def fail(msg: String): Nothing = throw new IllegalArgumentException(
        s"unsupported expression '$text': $msg")
      def peek: Option[(String, String)] =
        if (i < toks.length) Some(toks(i)) else None
      def isKw(t: (String, String), kw: String): Boolean =
        t._1 == "id" && t._2.equalsIgnoreCase(kw)
      def expectKw(kw: String): Unit = peek match {
        case Some(t) if isKw(t, kw) => i += 1
        case other => fail(s"expected $kw, got '${other.map(_._2).orNull}'")
      }
      def expectCmp(): String = peek match {
        case Some(("op", o))
            if Set("=", "<>", "<", ">", "<=", ">=")(o) => i += 1; o
        case other =>
          fail(s"expected comparison, got '${other.map(_._2).orNull}'")
      }
      def prim(): ValExpr = peek match {
        case Some(("op", "(")) =>
          i += 1; val e = add()
          peek match {
            case Some(("op", ")")) => i += 1; e
            case _ => fail("unbalanced '('")
          }
        case Some(("op", "-")) if i + 1 < toks.length &&
            toks(i + 1)._1 == "num" =>
          i += 2; VNum("-" + toks(i - 1)._2)
        case Some(("num", n)) => i += 1; VNum(n)
        case Some(("str", v)) => i += 1; VStr(v)
        case Some(t) if isKw(t, "DATE") && i + 1 < toks.length &&
            toks(i + 1)._1 == "str" =>
          i += 2; VDate(toks(i - 1)._2)
        case Some(("id", alias)) if i + 2 < toks.length &&
            toks(i + 1) == (("op", ".")) && toks(i + 2)._1 == "id" =>
          val c = toks(i + 2)._2; i += 3
          if (alias.equalsIgnoreCase(tAlias)) VCol(onTarget = true, c)
          else if (alias.equalsIgnoreCase(sAlias)) VCol(onTarget = false, c)
          else fail(s"alias '$alias' is neither '$tAlias' nor '$sAlias'")
        case Some(("id", bare)) =>
          fail(s"unqualified identifier '$bare': qualify columns with " +
            s"'$tAlias.' or '$sAlias.'")
        case other => fail(s"expected a value, got '${other.map(_._2).orNull}'")
      }
      def mul(): ValExpr = {
        var e = prim()
        while (peek.exists(t => t._1 == "op" && (t._2 == "*" || t._2 == "/"))) {
          val o = toks(i)._2; i += 1; e = VBin(e, o, prim())
        }
        e
      }
      def add(): ValExpr = {
        var e = mul()
        while (peek.exists(t => t._1 == "op" && (t._2 == "+" || t._2 == "-"))) {
          val o = toks(i)._2; i += 1; e = VBin(e, o, mul())
        }
        e
      }
      val result = peek match {
        case Some(t) if isKw(t, "CASE") =>
          i += 1; expectKw("WHEN")
          val cl = add(); val co = expectCmp(); val cr = add()
          expectKw("THEN"); val thn = add()
          expectKw("ELSE"); val els = add()
          expectKw("END")
          VCase(cl, co, cr, thn, els)
        case _ => add()
      }
      if (i != toks.length)
        fail(s"trailing tokens from '${toks(i)._2}'")
      result
    }
  }

  /** Split on a top-level separator, single-quote-aware (a literal
    * containing the separator never missplits), parens-aware for ','. */
  private def splitTop(s: String, onAnd: Boolean): Seq[String] = {
    val parts = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inQ = !inQ; cur += c; i += 1 }
      else if (!inQ && !onAnd && c == '(') { depth += 1; cur += c; i += 1 }
      else if (!inQ && !onAnd && c == ')') { depth -= 1; cur += c; i += 1 }
      else if (!inQ && !onAnd && depth == 0 && c == ',') {
        parts += cur.toString; cur.clear(); i += 1
      } else if (!inQ && onAnd && s.regionMatches(true, i, "AND", 0, 3) &&
          (i == 0 || s.charAt(i - 1).isWhitespace) &&
          (i + 3 >= s.length || s.charAt(i + 3).isWhitespace)) {
        parts += cur.toString; cur.clear(); i += 3
      } else { cur += c; i += 1 }
    }
    parts += cur.toString
    parts.result().map(_.trim).filter(_.nonEmpty)
  }

  private val Stmt = (
    """(?is)\s*UPDATE\s+`?([\w.-]+)`?\s+(?:AS\s+)?(\w+)\s+""" +
    """SET\s+(.+?)\s+FROM\s+`?([\w.-]+)`?\s+(?:AS\s+)?(\w+)\s+""" +
    """WHERE\s+(.+?)\s*;?\s*""").r
  private val SetItem = """(?is)\s*(?:(\w+)\.)?(\w+)\s*=\s*(.+?)\s*""".r
  private val JoinEq = """(?is)\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*""".r
  private val ResidPred = ("""(?is)\s*(\w+)\.(\w+)\s*(<=|>=|<>|=|<|>)\s*""" +
    """(DATE\s*'[^']*'|'[^']*'|-?\d+(?:\.\d+)?)\s*""").r

  private def baseName(qualified: String): String =
    qualified.split('.').last

  /** Parse the UPDATE-FROM statement. The WHERE is a conjunction:
    * exactly ONE `t.k = s.k` alias-equality (the join key) plus any
    * number of `alias.col <op> literal` residuals — the guarded-upsert
    * shape (`WHERE t.id = s.id AND t.o_orderdate >= DATE '…'`). Loud on
    * anything outside the shape — this front-end covers the statement
    * surface BigQuery DML users ship, not general SQL DML. */
  def parseUpdateFrom(sql: String): UpdateFrom = sql match {
    case Stmt(target, tAlias, setList, source, sAlias, whereText) =>
      def aliasSide(a: String): Option[Boolean] =
        if (a.equalsIgnoreCase(tAlias)) Some(true)
        else if (a.equalsIgnoreCase(sAlias)) Some(false)
        else None
      val conjs = splitTop(whereText, onAnd = true)
      val keys = conjs.collect {
        case JoinEq(a1, c1, a2, c2)
            if aliasSide(a1).isDefined && aliasSide(a2).isDefined &&
              aliasSide(a1) != aliasSide(a2) =>
          if (aliasSide(a1).get) (c1, c2) else (c2, c1)
      }
      require(keys.length == 1,
        s"WHERE needs exactly one '$tAlias.k = $sAlias.k' join equality, " +
          s"got ${keys.length} in '$whereText'")
      val (tKey, sKey) = keys.head
      val residuals = conjs.filterNot {
        case JoinEq(a1, _, a2, _) =>
          aliasSide(a1).isDefined && aliasSide(a2).isDefined &&
            aliasSide(a1) != aliasSide(a2)
        case _ => false
      }.map {
        case ResidPred(a, c, op, l) =>
          val side = aliasSide(a).getOrElse(
            throw new IllegalArgumentException(
              s"residual predicate alias '$a' is neither " +
                s"'$tAlias' nor '$sAlias'"))
          MergePred(side, c, op, l)
        case other => throw new IllegalArgumentException(
          s"unsupported WHERE conjunct '$other': expected the join " +
            "equality or <alias>.<col> <op> <literal>")
      }
      val sets = splitTop(setList, onAnd = false).map {
        case SetItem(lAlias, lCol, rhs) =>
          require(lAlias == null || lAlias.equalsIgnoreCase(tAlias),
            s"SET column '$lAlias.$lCol' must belong to target '$tAlias'")
          lCol -> ExprParser.parse(rhs, tAlias, sAlias)
        case other => throw new IllegalArgumentException(
          s"unsupported SET item '$other': expected t.col = <expression>")
      }
      UpdateFrom(baseName(target), baseName(source), tKey, sKey, sets,
        residuals)
    case _ => throw new IllegalArgumentException(
      "unsupported DML: expected UPDATE <t> a SET a.c = <expr>, ... " +
        "FROM <s> b WHERE a.k = b.k [AND <alias>.<col> <op> <literal> ...]")
  }

  /** Execute the reference's UPDATE-FROM against a [[TableStore]] table.
    * The statement routes through [[TableStore.mergeWith]], so it gets the
    * store's full transactional discipline for free: snapshot-pinned scan,
    * CAS-committed version, optimistic retry — no reader ever observes a
    * half-updated table.
    *
    * Semantics match BigQuery's UPDATE-FROM: a matched target row takes
    * the source's value for every SET column (including NULL — this is
    * assignment, not coalesce), unmatched rows are untouched, and a source
    * that matches one target key with more than one row is an error
    * (BigQuery: "UPDATE/MERGE must match at most one source row"). The
    * uniqueness probe aggregates to a bounded LIMIT-1 check, not a
    * driver-side materialization of the source.
    *
    * The source table resolves in the store first (the reference stages
    * updates as a real temp TABLE next to the target, main.py:256-273),
    * then as a session temp view. */
  def runDml(s: SparkSession, store: TableStore, sql: String): Unit = {
    val u = parseUpdateFrom(sql)
    val src0 =
      if (store.exists(u.source)) store.read(u.source) else s.table(u.source)
    store.mergeWith(u.target)(updateFromPlan(u, src0))
  }

  /** The UPDATE-FROM rewrite as a pure current→next transform — shared
    * by the committing path ([[runDml]] via mergeWith) and the
    * transactional overlay ([[runTransaction]]), so both execute the
    * IDENTICAL plan. Source-key uniqueness validates eagerly here
    * (bounded LIMIT-1 probe), once per statement. */
  private def updateFromPlan(u: UpdateFrom,
      src0: DataFrame): DataFrame => DataFrame = {
    // Source-side WHERE residuals pre-filter the source — same result as
    // post-join evaluation (they reference only source columns), pruned
    // before the shuffle instead of after.
    val (tgtResid, srcResid) = u.residuals.partition(_.onTarget)
    val src = srcResid.foldLeft(src0)((d, p) =>
      d.filter(predColumn(p, d(_))))
    val dup = src.groupBy(col(u.sourceKey)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"UPDATE FROM ${u.source}: source key ${u.sourceKey} value " +
        s"'${dup.headOption.map(_.get(0)).orNull}' matches multiple rows")
    val uKey = "__u_" + u.sourceKey
    // distinct: SET t.k = s.k would otherwise select the key rename twice
    val rhsCols =
      (u.sourceKey +: u.sets.flatMap(_._2.srcCols)).distinct
    val renamedSrc = src.select(rhsCols.map(c => col(c).as("__u_" + c)): _*)
    (cur: DataFrame) => {
      // Target-side residuals gate WHICH matched rows update (BigQuery's
      // UPDATE-FROM WHERE semantics: a join-matched row failing them is
      // left untouched, never deleted).
      val matched = tgtResid.foldLeft(col(uKey).isNotNull)((m, p) =>
        m && predColumn(p, cur(_)))
      val outCols: Seq[Column] = cur.columns.toSeq.map { c =>
        u.sets.find(_._1.equalsIgnoreCase(c)) match {
          case Some((_, ve)) =>
            when(matched, ve.toColumn(cur(_), sc => col("__u_" + sc)))
              .otherwise(cur(c)).as(c)
          case None => cur(c)
        }
      }
      cur.join(renamedSrc, cur(u.targetKey) === col(uKey), "left")
        .select(outCols: _*)
    }
  }

  /** One WHEN clause of a MERGE statement, in statement order. The
    * optional predicate is the BigQuery `AND <cond>` search condition,
    * shape-limited to one comparison between an aliased column and a
    * literal — the statement surface stays loud-on-anything-else. */
  sealed trait MergeWhen { def pred: Option[MergePred] }
  /** `alias.column <op> literal`; `onTarget` resolves the alias side. */
  final case class MergePred(onTarget: Boolean, column: String,
      op: String, literal: String)
  final case class MatchedUpdate(pred: Option[MergePred],
      sets: Seq[(String, ValExpr)]) extends MergeWhen
  final case class MatchedDelete(pred: Option[MergePred]) extends MergeWhen
  final case class NotMatchedInsert(pred: Option[MergePred],
      inserts: Seq[(String, ValExpr)]) extends MergeWhen
  /** The third ANSI/BigQuery match group — target rows with NO source
    * row (`WHEN NOT MATCHED BY SOURCE [AND <t-pred>] THEN DELETE`): the
    * dimension-sync arm that drops rows which vanished from the
    * snapshot. Predicates are target-side by construction — there is no
    * source row to read. DELETE is the only supported verb (the sync
    * statement's shape); UPDATE-by-source stays loud-on-unsupported. */
  final case class NotMatchedBySourceDelete(
      pred: Option[MergePred]) extends MergeWhen

  /** The canonical upsert/purge statement (BigQuery/ANSI shape):
    * {{{
    * MERGE INTO `proj.ds.target` t USING `proj.ds.src` s
    * ON t.k = s.k
    * [WHEN MATCHED [AND <col op literal>] THEN DELETE]
    * [WHEN MATCHED [AND …] THEN UPDATE SET t.c = s.c, ...]
    * [WHEN NOT MATCHED [AND …] THEN INSERT (k, …) VALUES (s.k, …)]
    * }}}
    * Clauses apply first-match-wins in statement order within their
    * match group (the ANSI rule). `sets`/`inserts` expose the first
    * update/insert clause for the common two-clause statement. */
  final case class MergeInto(target: String, source: String,
      targetKey: String, sourceKey: String, whens: Seq[MergeWhen]) {
    def sets: Seq[(String, ValExpr)] =
      whens.collectFirst { case MatchedUpdate(_, s) => s }.getOrElse(Nil)
    def inserts: Seq[(String, ValExpr)] =
      whens.collectFirst { case NotMatchedInsert(_, i) => i }.getOrElse(Nil)
  }

  private val MergeHead = (
    """(?is)\s*MERGE\s+INTO\s+`?([\w.-]+)`?\s+(?:AS\s+)?(\w+)\s+""" +
    """USING\s+`?([\w.-]+)`?\s+(?:AS\s+)?(\w+)\s+""" +
    """ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s+""" +
    """(WHEN\s.+?)\s*;?\s*""").r
  private val WhenUpd =
    """(?is)\s*WHEN\s+MATCHED\s*(AND\s.+?)?\s*THEN\s+UPDATE\s+SET\s+(.+?)\s*""".r
  private val WhenDel =
    """(?is)\s*WHEN\s+MATCHED\s*(AND\s.+?)?\s*THEN\s+DELETE\s*""".r
  private val WhenIns = (
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s*(?:BY\s+TARGET\s*)?(AND\s.+?)?\s*""" +
    """THEN\s+INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*""").r
  private val WhenNmbsDel = (
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s*(AND\s.+?)?\s*""" +
    """THEN\s+DELETE\s*""").r
  private val WhenOther = """(?is)\s*WHEN\s+(NOT\s+)?MATCHED\b.*""".r
  private val PredPat = (
    """(?is)\s*AND\s+(\w+)\.(\w+)\s*(<=|>=|<>|=|<|>)\s*""" +
    """(DATE\s*'[^']*'|'[^']*'|-?\d+(?:\.\d+)?)\s*""").r

  /** Parse MERGE INTO with any combination of DELETE / UPDATE / INSERT
    * WHEN clauses, each optionally predicated. Loud on anything outside
    * the shape: a clause verb on the wrong match side, a predicate that
    * is not one aliased-column-vs-literal comparison, or a non-final
    * unpredicated clause in a match group (BigQuery's reachability rule
    * — an unpredicated clause makes every later clause of its group dead
    * code, which is a user error, not a silent no-op). */
  def parseMergeInto(sql: String): MergeInto = sql match {
    case MergeHead(target, tAlias, source, sAlias,
        oa1, oc1, oa2, oc2, whensText) =>
      val (tKey, sKey) =
        if (oa1.equalsIgnoreCase(tAlias) && oa2.equalsIgnoreCase(sAlias))
          (oc1, oc2)
        else if (oa1.equalsIgnoreCase(sAlias) && oa2.equalsIgnoreCase(tAlias))
          (oc2, oc1)
        else throw new IllegalArgumentException(
          s"ON must equate the two aliases '$tAlias'/'$sAlias', " +
            s"got '$oa1.$oc1 = $oa2.$oc2'")
      def parsePred(p: String): Option[MergePred] =
        Option(p).filter(_.trim.nonEmpty).map {
          case PredPat(a, c, op, l) =>
            require(a.equalsIgnoreCase(tAlias) || a.equalsIgnoreCase(sAlias),
              s"predicate column '$a.$c' must use alias " +
                s"'$tAlias' or '$sAlias'")
            MergePred(a.equalsIgnoreCase(tAlias), c, op, l)
          case other => throw new IllegalArgumentException(
            s"unsupported WHEN predicate '$other': expected " +
              "AND <alias>.<col> <op> <literal>")
        }
      def parseSets(setList: String): Seq[(String, ValExpr)] =
        splitTop(setList, onAnd = false).map {
          case SetItem(lAlias, lCol, rhs) =>
            require(lAlias == null || lAlias.equalsIgnoreCase(tAlias),
              s"SET column '$lAlias.$lCol' must belong to target '$tAlias'")
            lCol -> ExprParser.parse(rhs, tAlias, sAlias)
          case other => throw new IllegalArgumentException(
            s"unsupported SET item '$other': expected t.col = <expression>")
        }
      def parseInserts(insCols: String,
          insVals: String): Seq[(String, ValExpr)] = {
        val cols = insCols.split(",").toSeq.map(_.trim)
        val vals = splitTop(insVals, onAnd = false).map { v =>
          val e = ExprParser.parse(v, tAlias, sAlias)
          require(e.tgtCols.isEmpty,
            s"INSERT value '$v' reads target columns " +
              s"${e.tgtCols.mkString(",")} — no target row exists on " +
              "the insert path")
          e
        }
        require(cols.length == vals.length && cols.nonEmpty,
          s"INSERT column list (${cols.length}) and VALUES " +
            s"(${vals.length}) must align")
        cols.zip(vals)
      }
      val clauses = java.util.regex.Pattern
        .compile("""(?i)(?=WHEN\s+(?:NOT\s+)?MATCHED\b)""")
        .split(whensText).toSeq.filter(_.trim.nonEmpty)
        .map {
          case WhenDel(pred) => MatchedDelete(parsePred(pred))
          case WhenUpd(pred, setList) =>
            MatchedUpdate(parsePred(pred), parseSets(setList))
          case WhenNmbsDel(pred) =>
            val p = parsePred(pred)
            p.foreach(mp => require(mp.onTarget,
              s"NOT MATCHED BY SOURCE predicate '$sAlias.${mp.column}' " +
                "reads the source — no source row exists on this arm"))
            NotMatchedBySourceDelete(p)
          case WhenIns(pred, insCols, insVals) =>
            NotMatchedInsert(parsePred(pred), parseInserts(insCols, insVals))
          case WhenOther(not) => throw new IllegalArgumentException(
            if (not == null)
              "WHEN MATCHED supports THEN UPDATE SET … or THEN DELETE only"
            else
              "WHEN NOT MATCHED [BY TARGET] supports THEN INSERT (…) " +
                "VALUES (…); WHEN NOT MATCHED BY SOURCE supports " +
                "THEN DELETE")
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE clause '$other'")
        }
      require(clauses.nonEmpty, "MERGE needs at least one WHEN clause")
      // reachability: within each match group only the LAST clause may
      // omit its predicate
      def checkGroup(group: Seq[MergeWhen], name: String): Unit =
        group.dropRight(1).foreach(w => require(w.pred.nonEmpty,
          s"non-final $name clause needs an AND predicate — an " +
            "unpredicated clause makes later clauses unreachable"))
      checkGroup(clauses.filter(w => w.isInstanceOf[MatchedUpdate] ||
        w.isInstanceOf[MatchedDelete]), "WHEN MATCHED")
      checkGroup(clauses.collect { case i: NotMatchedInsert => i },
        "WHEN NOT MATCHED")
      checkGroup(clauses.collect {
        case d: NotMatchedBySourceDelete => d }, "WHEN NOT MATCHED BY SOURCE")
      MergeInto(baseName(target), baseName(source), tKey, sKey, clauses)
    case _ => throw new IllegalArgumentException(
      "unsupported DML: expected MERGE INTO <t> a USING <s> b ON a.k = b.k " +
        "followed by WHEN [NOT] MATCHED [AND <pred>] THEN " +
        "UPDATE SET … | DELETE | INSERT (...) VALUES (...)")
  }

  /** Execute MERGE INTO against a [[TableStore]] table — same
    * transactional route as [[runDml]] (snapshot-pinned scan, CAS commit,
    * optimistic retry). Every parsed clause executes with ANSI/BigQuery
    * semantics: within each match group the FIRST clause whose `AND`
    * predicate holds fires (first-match-wins in statement order), a
    * fired UPDATE takes its SET assignments, a fired DELETE drops the
    * row, a fired INSERT materializes the source row (columns absent
    * from the list are NULL). A matched row no clause fires on passes
    * through unchanged; a source-only row no INSERT clause fires on is
    * ignored; target-only rows always pass through. Source keys must be
    * unique AND non-null — a null key can never match, and silently
    * inserting it would manufacture an unreachable row, so both are
    * loud errors (BigQuery's one-source-row rule, tightened).
    *
    * Scale shape: the whole statement is ONE full-outer equi-join on the
    * key; clause dispatch is a per-row cascaded `when()` (codegen'd, no
    * extra shuffle, no per-clause pass over the target). */
  def runMerge(s: SparkSession, store: TableStore, sql: String): Unit = {
    val u = parseMergeInto(sql)
    val src =
      if (store.exists(u.source)) store.read(u.source) else s.table(u.source)
    store.mergeWith(u.target)(mergeIntoPlan(u, src))
  }

  /** The MERGE rewrite as a pure current→next transform — shared by the
    * committing path and the transactional overlay, identical plan both
    * ways. Source-key uniqueness/nullability validates eagerly here. */
  private def mergeIntoPlan(u: MergeInto,
      src: DataFrame): DataFrame => DataFrame = {
    val bad = src.groupBy(col(u.sourceKey)).count()
      .filter(col("count") > 1 || col(u.sourceKey).isNull).limit(1).collect()
    require(bad.isEmpty,
      s"MERGE USING ${u.source}: source key ${u.sourceKey} value " +
        s"'${bad.headOption.map(_.get(0)).orNull}' is null or non-unique")
    val uKey = "__u_" + u.sourceKey
    val matchedWhens = u.whens.filter(w => w.isInstanceOf[MatchedUpdate] ||
      w.isInstanceOf[MatchedDelete])
    val insertWhens = u.whens.collect { case i: NotMatchedInsert => i }
    val nmbsWhens = u.whens.collect { case d: NotMatchedBySourceDelete => d }
    // every source column the statement touches: SET rhs, INSERT values,
    // and source-side predicate columns, all renamed out of collision
    val rhsCols = (u.sourceKey +:
      (u.whens.collect {
          case MatchedUpdate(_, ss) => ss.flatMap(_._2.srcCols) }.flatten
        ++ insertWhens.flatMap(_.inserts.flatMap(_._2.srcCols))
        ++ u.whens.flatMap(_.pred).collect {
          case MergePred(false, c, _, _) => c
        })).distinct
    // marker names live OUTSIDE the "__u_<col>" rename namespace, so a
    // real column named "pres" cannot collide with them; a column that
    // matches the marker itself is refused loudly rather than clobbered
    val (srcMark, tgtMark) = ("__graft_pres_s", "__graft_pres_t")
    require(!src.columns.exists(_.equalsIgnoreCase(srcMark)),
      s"MERGE source carries reserved column name $srcMark")
    val renamedSrc = src.select(rhsCols.map(c => col(c).as("__u_" + c))
      :+ lit(true).as(srcMark): _*)
    (cur: DataFrame) => {
      def predCol(p: Option[MergePred]): Column = p match {
        case None => lit(true)
        case Some(mp) =>
          predColumn(mp, c => if (mp.onTarget) cur(c) else col("__u_" + c))
      }
      def srcRes(c: String): Column = col("__u_" + c)
      // join-side presence is dispatched on literal MARKER columns, not
      // key nullability: a target row whose key is NULL can never match
      // any source row, and ANSI/BigQuery route it through the NOT
      // MATCHED BY SOURCE group — keying presence off the (nullable)
      // target key would silently park it in the matched cascade instead
      require(!cur.columns.exists(_.equalsIgnoreCase(tgtMark)),
        s"MERGE target carries reserved column name $tgtMark")
      // the SOURCE marker must be absent from the target too: the
      // full-outer join carries target columns unrenamed, so a target
      // column named like srcMark would make col(srcMark) ambiguous —
      // refuse loudly instead of dying in analysis (src carrying
      // tgtMark is harmless: source columns are renamed to __u_*)
      require(!cur.columns.exists(_.equalsIgnoreCase(srcMark)),
        s"MERGE target carries reserved column name $srcMark")
      val srcM = col(srcMark).isNotNull
      val tgtM = col(tgtMark).isNotNull
      // first-match-wins: index of the first clause whose predicate
      // holds, -1 when none fires (an unpredicated clause is lit(true),
      // so the reachability rule guarantees nothing after it evaluates)
      val mAct = matchedWhens.zipWithIndex.foldRight(lit(-1)) {
        case ((w, i), acc) => when(predCol(w.pred), lit(i)).otherwise(acc)
      }
      val iAct = insertWhens.zipWithIndex.foldRight(lit(-1)) {
        case ((w, i), acc) => when(predCol(w.pred), lit(i)).otherwise(acc)
      }
      // NOT MATCHED BY SOURCE: all clauses are DELETEs, so a target-only
      // row survives iff NO clause's (target-side) predicate fires
      val nmbsAct = nmbsWhens.zipWithIndex.foldRight(lit(-1)) {
        case ((w, i), acc) => when(predCol(w.pred), lit(i)).otherwise(acc)
      }
      val delIdx = matchedWhens.zipWithIndex
        .collect { case (_: MatchedDelete, i) => i }
      val keep =
        when(srcM && tgtM,
          if (delIdx.isEmpty) lit(true)
          else !mAct.isin(delIdx: _*))
        .when(srcM && !tgtM, iAct >= 0)
        .when(!srcM && tgtM,
          if (nmbsWhens.isEmpty) lit(true) else nmbsAct < 0)
        .otherwise(lit(true))
      val outCols: Seq[Column] = cur.columns.toSeq.map { c =>
        val updCase = matchedWhens.zipWithIndex.foldRight(cur(c)) {
          case ((MatchedUpdate(_, ss), i), acc) =>
            ss.find(_._1.equalsIgnoreCase(c)) match {
              case Some((_, ve)) =>
                when(mAct === i, ve.toColumn(cur(_), srcRes)).otherwise(acc)
              case None => acc
            }
          case (_, acc) => acc // fired DELETEs never reach the select
        }
        val insCase = insertWhens.zipWithIndex
          .foldRight(lit(null).cast(cur.schema(c).dataType)) {
            case ((NotMatchedInsert(_, ins), i), acc) =>
              val v = ins.find(_._1.equalsIgnoreCase(c))
                .map(p => p._2.toColumn(cur(_), srcRes))
                .getOrElse(lit(null).cast(cur.schema(c).dataType))
              when(iAct === i, v).otherwise(acc)
          }
        when(srcM && !tgtM, insCase)
          .when(srcM && tgtM, updCase)
          .otherwise(cur(c)).as(c)
      }
      cur.withColumn(tgtMark, lit(true))
        .join(renamedSrc, cur(u.targetKey) === col(uKey), "full")
        .filter(keep).select(outCols: _*)
    }
  }

  /** q57: the MERGE INTO statement end-to-end through the versioned
    * store: the target holds two thirds of `orders`, the staged source
    * carries a repriced copy of EVERY order with a sentinel status —
    * matched rows take the new price but KEEP their status (only price
    * is in SET), unmatched orders INSERT whole rows carrying the
    * sentinel. The oracle recomputes both branches declaratively, so the
    * hash gate proves parse → full-outer merge → transactional commit →
    * read-back exercises the update and insert paths distinguishably.
    *
    * Scale shape: one full outer join on the key over the store scan —
    * [[graft.psn.TableStore.mergeWith]]'s rewrite discipline unchanged. */
  def q57SqlMerge(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_m", orders(s, dir)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    store.overwrite("orders_src", orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.05).as("o_totalprice"),
        lit("N").as("o_orderstatus")))
    runMerge(s, store,
      """MERGE INTO `graft-project.store.orders_m` t
        |USING `graft-project.store.orders_src` s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice,
        |  o_orderstatus) VALUES (s.o_orderkey, s.o_totalprice,
        |  s.o_orderstatus)
        |""".stripMargin)
    store.drop("orders_src")
    store.read("orders_m")
      .select(col("o_orderkey"),
        col("o_totalprice").as("merged_price"),
        col("o_orderstatus").as("status"))
      .sortedWide("o_orderkey")
  }

  val q57Oracle: String =
    """SELECT o_orderkey, o_totalprice * 1.05 AS merged_price,
      |  CASE WHEN o_orderkey % 3 <> 0 THEN o_orderstatus
      |       ELSE 'N' END AS status
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q61: the FULL MERGE clause surface in one statement — a predicated
    * DELETE, an unpredicated UPDATE behind it (first-match-wins: only
    * non-'F' matched rows reach it), and a predicated INSERT that ignores
    * cheap unmatched source rows. The oracle recomputes all three
    * branches declaratively, so the hash gate proves clause dispatch
    * order, predicate evaluation on BOTH aliases (target-side status,
    * source-side price), DELETE-as-filter, and insert gating — the
    * exact shapes round 10's parser accepted but did not execute.
    *
    * Scale shape: still ONE full-outer join on the key; the clause
    * cascade is per-row codegen'd `when()`, no extra pass or shuffle. */
  def q61SqlMergeFull(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_f", orders(s, dir)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    store.overwrite("orders_fs", orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.05).as("o_totalprice"),
        lit("N").as("o_orderstatus")))
    runMerge(s, store,
      """MERGE INTO `graft-project.store.orders_f` t
        |USING `graft-project.store.orders_fs` s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice
        |WHEN NOT MATCHED AND s.o_totalprice > 1000 THEN INSERT
        |  (o_orderkey, o_totalprice, o_orderstatus)
        |  VALUES (s.o_orderkey, s.o_totalprice, s.o_orderstatus)
        |""".stripMargin)
    store.drop("orders_fs")
    store.read("orders_f")
      .select(col("o_orderkey"),
        col("o_totalprice").as("merged_price"),
        col("o_orderstatus").as("status"))
      .sortedWide("o_orderkey")
  }

  val q61Oracle: String =
    """SELECT o_orderkey, o_totalprice * 1.05 AS merged_price,
      |  o_orderstatus AS status
      |FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderstatus <> 'F'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice * 1.05 AS merged_price,
      |  'N' AS status
      |FROM orders WHERE o_orderkey % 3 = 0 AND o_totalprice * 1.05 > 1000
      |ORDER BY o_orderkey""".stripMargin

  /** q56: the reference's own DML statement end-to-end — stage an updates
    * table next to the target (main.py:256-273's temp-table load), run the
    * literal UPDATE-FROM text through [[runDml]], drop the temp table
    * (main.py:286-287), and read the committed result back from the store.
    * The oracle recomputes the update directly over `orders`, so the hash
    * gate proves statement parse → transactional merge → versioned commit
    * → read-back equals the declarative answer (q16's algebra, now
    * reachable from SQL text).
    *
    * Scale shape: identical to [[graft.psn.TableStore.mergeWith]] — one
    * left join on the key, full-version rewrite; the partition-pruned
    * variant is the 100 TB path and shares the same front-end. */
  def q56SqlUpdateFrom(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_t", orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    store.overwrite("orders_tmp", orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"),
        (col("o_totalprice") * 1.1).as("o_totalprice")))
    runDml(s, store,
      """UPDATE `graft-project.store.orders_t` target
        |SET target.o_totalprice = temp.o_totalprice
        |FROM `graft-project.store.orders_tmp` temp
        |WHERE target.o_orderkey = temp.o_orderkey
        |""".stripMargin)
    store.drop("orders_tmp")
    store.read("orders_t")
      .select(col("o_orderkey"), col("o_totalprice").as("merged_price"))
      .sortedWide("o_orderkey")
  }

  val q56Oracle: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
      |       ELSE o_totalprice END AS merged_price
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** The tombstone-driven delete statement (BigQuery shape):
    * {{{
    * DELETE FROM `proj.ds.target` t
    * WHERE t.k IN (SELECT k FROM `proj.ds.tombstones`)
    * }}} */
  final case class DeleteIn(target: String, targetKey: String,
      source: String, sourceKey: String)

  private val DeleteStmt = (
    """(?is)\s*DELETE\s+FROM\s+`?([\w.-]+)`?(?:\s+(?:AS\s+)?(\w+))?\s+""" +
    """WHERE\s+(?:(\w+)\.)?(\w+)\s+IN\s*""" +
    """\(\s*SELECT\s+(\w+)\s+FROM\s+`?([\w.-]+)`?\s*\)\s*;?\s*""").r

  /** Parse DELETE … WHERE k IN (SELECT k FROM s); loud on anything
    * outside the key-subquery shape (arbitrary predicates, correlated
    * subqueries) — like [[parseUpdateFrom]], this covers the statement
    * surface a reference user ships, not general SQL DML. */
  def parseDeleteIn(sql: String): DeleteIn = sql match {
    case DeleteStmt(target, alias, wAlias, wCol, sCol, source) =>
      // A qualified WHERE column requires a declared alias it matches: on
      // an alias-free target, 'WHERE x.k IN …' would otherwise silently
      // bind x.k to the target — the loud-on-anything-outside-the-shape
      // contract forbids guessing.
      require(wAlias == null ||
          (alias != null && wAlias.equalsIgnoreCase(alias)),
        s"WHERE column '$wAlias.$wCol' must belong to target alias " +
          s"'${if (alias == null) "<none declared>" else alias}'")
      DeleteIn(baseName(target), wCol, baseName(source), sCol)
    case _ => throw new IllegalArgumentException(
      "unsupported DML: expected DELETE FROM <t> [a] " +
        "WHERE [a.]k IN (SELECT k FROM <s>)")
  }

  /** Execute the tombstone delete against a [[TableStore]] table — same
    * transactional route as [[runDml]]/[[runMerge]] (snapshot-pinned scan,
    * CAS commit, optimistic retry). The rewrite is ONE left-anti equi-join
    * against the (distinct) tombstone keys: survivors stream through, the
    * condemned rows simply never ride the new version. NULL tombstone keys
    * are dropped loudly-by-contract (SQL IN never matches NULL, and an
    * anti-join key of NULL would instead keep the row on both engines —
    * same semantics, so no guard is needed). At 100 TB this is the GDPR /
    * right-to-be-forgotten pass: the tombstone side is tiny and broadcast,
    * the target pays one scan + rewrite, and the store's partition-pruned
    * merge path limits the rewrite to partitions that actually lost rows. */
  def runDelete(s: SparkSession, store: TableStore, sql: String): Unit = {
    val d = parseDeleteIn(sql)
    val src =
      if (store.exists(d.source)) store.read(d.source) else s.table(d.source)
    store.mergeWith(d.target)(deleteInPlan(d, src))
  }

  /** The DELETE-IN anti-join as a pure current→next transform — shared
    * by the committing path and the transactional overlay. */
  private def deleteInPlan(d: DeleteIn,
      src: DataFrame): DataFrame => DataFrame = {
    val keys = src.select(col(d.sourceKey).as("__d_key"))
      .filter(col("__d_key").isNotNull).distinct()
    cur => cur.join(broadcast(keys), cur(d.targetKey) === col("__d_key"),
      "left_anti")
  }

  private val DeleteWhereStmt =
    """(?is)\s*DELETE\s+FROM\s+`?([\w.-]+)`?\s+WHERE\s+(.+?)\s*;?\s*""".r

  /** Execute DELETE FROM t WHERE <predicate> as a DELETION-VECTOR commit
    * ([[graft.psn.TableStore.deleteRows]]): one scan finds the condemned
    * rows' (file, position) pairs, the commit hard-links every data file
    * and publishes the merged vector — zero data rewritten, which is what
    * a row-level DELETE must cost on a 100 TB table. The predicate is
    * arbitrary Catalyst SQL over the table's own columns (subquery shapes
    * route to [[runDelete]]'s tombstone anti-join rewrite instead — the
    * two cover BigQuery's DELETE surface between them). Returns the
    * deleted-row count. */
  def runDeleteWhere(s: SparkSession, store: TableStore,
      sql: String): Long = sql match {
    case DeleteWhereStmt(target, cond) =>
      val name = baseName(target)
      require(store.exists(name), s"DELETE FROM $name: table does not exist")
      store.deleteRows(name, expr(cond))
    case _ => throw new IllegalArgumentException(
      "unsupported DML: expected DELETE FROM <t> WHERE <predicate>")
  }

  /** q59: the DELETE statement end-to-end through the versioned store —
    * stage a tombstone table (every order key divisible by 7: the
    * erasure-request batch), run the literal DELETE text through
    * [[runDelete]], drop the tombstones, read the committed survivor set
    * back. The oracle recomputes the survivors declaratively, so the hash
    * gate proves parse → anti-join rewrite → transactional commit →
    * read-back equals the declarative answer. With q56 (UPDATE-FROM) and
    * q57 (MERGE INTO) this completes the statement-level DML surface.
    *
    * Scale shape: one broadcast anti-join over the store scan —
    * [[graft.psn.TableStore.mergeWith]]'s rewrite discipline unchanged. */
  def q59SqlDelete(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_d", orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    store.overwrite("orders_tomb", orders(s, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey")))
    runDelete(s, store,
      """DELETE FROM `graft-project.store.orders_d` t
        |WHERE t.o_orderkey IN (
        |  SELECT o_orderkey FROM `graft-project.store.orders_tomb`)
        |""".stripMargin)
    store.drop("orders_tomb")
    store.read("orders_d")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .sortedWide("o_orderkey")
  }

  val q59Oracle: String =
    """SELECT o_orderkey, o_totalprice, o_orderstatus
      |FROM orders WHERE o_orderkey % 7 <> 0
      |ORDER BY o_orderkey""".stripMargin

  private val CtasStmt =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+`?([\w.-]+)`?\s+AS\s+(SELECT\b.+?)\s*;?\s*""".r

  /** Execute CREATE [OR REPLACE] TABLE … AS SELECT against a
    * [[TableStore]]: the SELECT body is arbitrary Catalyst SQL over the
    * registered corpus views plus any store tables (registered as temp
    * views for the statement, so a CTAS can derive from managed tables),
    * and the result lands as a new versioned table via the store's
    * truncate-load commit. Returns the created table's name. Loud on
    * non-CTAS text — DML goes through [[runDml]]/[[runMerge]]/
    * [[runDelete]].
    *
    * BigQuery semantics, both ways: plain CREATE TABLE over an existing
    * store table is an ERROR (silently truncate-loading it would destroy
    * data the user never asked to replace); OR REPLACE is the explicit
    * opt-in. The store-table views are scoped to the statement — dropped
    * once the SELECT has executed — so a CTAS can never leave a managed
    * table shadowing a corpus view for later `spark.sql` users.
    *
    * Scale shape: the SELECT plans/executes like any registry query; the
    * write is the store's parquet append of the result — one pass, no
    * driver materialization. */
  /** Register corpus views plus statement-scoped store-table views, run
    * `body`, then drop the store-table views. A store table whose name
    * collides with a corpus view is a LOUD error before anything
    * executes: registering it would shadow the corpus view for the
    * statement, and dropping it afterwards would remove the name
    * entirely, leaving later `spark.sql` users with neither. */
  private def withStatementViews[T](s: SparkSession, store: TableStore,
      dir: String)(body: => T): T = {
    registerViews(s, dir)
    val storeViews = store.tables()
    // logical views register AFTER tables, in CREATION order, so a view
    // can reference tables and earlier views (its stored SQL re-plans
    // against their current state — the standard-view contract)
    val logical = store.views()
    val clash = (storeViews ++ logical).toSet.intersect(Tables.corpus.toSet)
    require(clash.isEmpty,
      s"store table(s)/view(s) ${clash.mkString(", ")} shadow corpus " +
        "views of the same name — rename them")
    storeViews.foreach(t => store.read(t).createOrReplaceTempView(t))
    // A view whose definition no longer analyzes (its base lost a column
    // it projects, say) must not poison UNRELATED statements: BigQuery's
    // standard views error when the broken view itself is queried, not
    // at catalog load. Registration therefore TOLERATES analysis
    // failure — the view is skipped, and a statement that references it
    // fails at its own resolution (unresolved relation naming the view).
    // Only ANALYSIS failures are tolerated (the broken-definition case);
    // infrastructure faults — an unreadable sidecar, a runtime error —
    // stay loud at their cause instead of surfacing later as a
    // misleading "view not found".
    val registered = logical.filter { v =>
      try { s.sql(store.viewSql(v)).createOrReplaceTempView(v); true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    }
    // body must EXECUTE its statement (not just plan it) before the
    // statement-scoped views drop in the finally.
    try body
    finally (storeViews ++ registered).foreach(t => s.catalog.dropTempView(t))
  }

  private val CloneStmt = (
    """(?is)\s*CREATE\s+(SNAPSHOT\s+)?TABLE\s+`?([\w.-]+)`?\s+(CLONE|COPY)\s+""" +
    """`?([\w.-]+)`?(?:\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)""" +
    """|\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?:TIMESTAMP\s+'([^']+)'""" +
    """|(\d{10,})))?\s*;?\s*""").r

  /** Execute `CREATE [SNAPSHOT] TABLE <t> CLONE <src> [FOR VERSION AS OF
    * <v> | FOR SYSTEM_TIME AS OF …]` and `CREATE TABLE <t> COPY <src>` —
    * the clone/copy verbs ([[TableStore.cloneTable]]): BigQuery's table
    * clone (writable), snapshot table (read-only), and table copy,
    * optionally pinned to a retained version or a commit timestamp
    * (resolved like every SYSTEM_TIME reference). COPY is BigQuery's
    * physical-copy verb; because this store's data files are IMMUTABLE
    * (every commit writes new files), the hard-link clone already has
    * physical-copy semantics — the two tables share no future state —
    * so COPY routes to the same O(files) link commit, no data moved.
    * SNAPSHOT pairs only with CLONE (as in BigQuery). */
  def runClone(store: TableStore, sql: String): String = sql match {
    case CloneStmt(snap, target, verb, source, ver, tsLit, epoch) =>
      require(snap == null || verb.equalsIgnoreCase("CLONE"),
        "CREATE SNAPSHOT TABLE pairs with CLONE, not COPY")
      val name = baseName(target)
      val src = baseName(source)
      val asOf =
        if (ver != null) Some(ver.toInt)
        else if (tsLit != null || epoch != null)
          Some(store.versionAsOf(src, parseTsMillis(tsLit, epoch)))
        else None
      store.cloneTable(src, name, asOf, snapshot = snap != null)
      name
    case _ => throw new IllegalArgumentException(
      "unsupported DDL: expected CREATE [SNAPSHOT] TABLE <t> CLONE <src> " +
        "[FOR VERSION AS OF <v> | FOR SYSTEM_TIME AS OF TIMESTAMP '<ts>'] " +
        "or CREATE TABLE <t> COPY <src>")
  }

  private val CreateMvStmt = (
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+`?([\w.-]+)`?\s+AS\s+""" +
    """SELECT\s+(.+?)\s+FROM\s+`?([\w.-]+)`?\s+GROUP\s+BY\s+""" +
    """([\w\s,]+?)\s*;?\s*""").r
  private val MvAggItem =
    """(?i)\s*(COUNT|SUM|MIN|MAX)\s*\(\s*(\*|\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MvKeyItem = """\s*(\w+)\s*""".r

  /** Execute `CREATE MATERIALIZED VIEW <mv> AS SELECT <keys, aggs> FROM
    * <base> GROUP BY <keys>` — BigQuery's aggregate materialized view,
    * with BigQuery's own restriction surfaced loudly: the select list
    * may hold only the GROUP BY keys and COUNT(*)/SUM/MIN/MAX aggregates
    * (the self-merging class that makes query-time freshness and
    * incremental REFRESH sound — [[TableStore.createMaterializedView]]).
    * `COUNT(*)` needs no argument column; aggregates need an `AS` alias
    * (they name stored columns). */
  def runCreateMv(store: TableStore, sql: String): String = sql match {
    case CreateMvStmt(target, selectList, base, groupBy) =>
      val mv = baseName(target)
      val keys = groupBy.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      require(keys.nonEmpty && keys.forall(_.matches("\\w+")),
        s"GROUP BY must list plain columns, got '$groupBy'")
      val items = splitTopLevel(selectList)
      val (keyItems, aggItems) = items.partition {
        case MvKeyItem(_) => true
        case _ => false
      }
      val keyCols = keyItems.map { case MvKeyItem(k) => k }
      require(keyCols.sorted == keys.sorted,
        s"materialized-view select list keys ${keyCols.mkString(",")} " +
          s"must equal GROUP BY ${keys.mkString(",")}")
      val aggs = aggItems.map {
        case MvAggItem(f, in, out) =>
          val func = f.toUpperCase
          require(func != "COUNT" || in == "*",
            "materialized views support COUNT(*) (not COUNT(col))")
          require(func == "COUNT" || in != "*",
            s"$func(*) is not an aggregate — name a column")
          graft.psn.MvAgg(out, func, in)
        case other => throw new IllegalArgumentException(
          s"unsupported materialized-view select item '$other': expected " +
            "a GROUP BY key or COUNT(*)/SUM(c)/MIN(c)/MAX(c) AS alias " +
            "(BigQuery's aggregate-MV restriction, enforced loudly)")
      }
      store.createMaterializedView(mv, baseName(base), keys, aggs)
      mv
    case _ => throw new IllegalArgumentException(
      "unsupported DDL: expected CREATE MATERIALIZED VIEW <mv> AS SELECT " +
        "<keys, aggs> FROM <base> GROUP BY <keys>")
  }

  /** Split a select list on top-level commas (not inside parens). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val RefreshMvStmt =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+`?([\w.-]+)`?\s*;?\s*""".r

  /** Execute REFRESH MATERIALIZED VIEW — re-materialize and re-pin
    * ([[TableStore.refreshMaterializedView]]): incremental when the base
    * only grew in place, full recompute when it was rewritten. */
  def runRefreshMv(store: TableStore, sql: String): Unit = sql match {
    case RefreshMvStmt(target) =>
      store.refreshMaterializedView(baseName(target))
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected REFRESH MATERIALIZED VIEW <mv>")
  }

  private val CreateViewStmt = (
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+`?([\w.-]+)`?\s+AS\s+""" +
    """(.+?)\s*;?\s*""").r

  private val CreateLikeStmt = (
    """(?is)\s*CREATE\s+TABLE\s+`?([\w.-]+)`?\s+LIKE\s+""" +
    """`?([\w.-]+)`?\s*;?\s*""").r

  def runCtas(s: SparkSession, store: TableStore, dir: String,
      sql: String): String = sql match {
    case CloneStmt(_*) => runClone(store, sql)
    case CreateLikeStmt(target, source) =>
      // BigQuery's CREATE TABLE LIKE: a new EMPTY table with the
      // source's schema — one empty commit, nothing scanned
      // ([[graft.psn.TableStore.createLike]]); data copies are CLONE
      val name = baseName(target)
      store.createLike(baseName(source), name)
      name
    case CreateMvStmt(_*) => runCreateMv(store, sql)
    case CreateViewStmt(orReplace, target, select) =>
      val name = baseName(target)
      // LOGICAL view (BigQuery's standard view): store the SQL text,
      // re-planned at every read — the definition is ANALYZED now (under
      // the statement-scoped catalog) so a broken view fails its CREATE,
      // not some later reader.
      withStatementViews(s, store, dir)(s.sql(select).schema)
      store.createView(name, select, orReplace = orReplace != null)
      name
    case CtasStmt(orReplace, target, select) =>
      val name = baseName(target)
      // the table/view namespace is mutually exclusive (createView checks
      // the reverse direction): a table materialized under a view's name
      // would share its directory with the stored definition, and every
      // later statement would resolve the name to the stale view SQL
      require(!store.isView(name),
        s"CREATE TABLE $name: a logical view already holds the name " +
          "(DROP VIEW first, or pick another name)")
      require(orReplace != null || !store.exists(name),
        s"CREATE TABLE $name: table already exists in the store " +
          "(use CREATE OR REPLACE TABLE to truncate-load it)")
      withStatementViews(s, store, dir)(store.overwrite(name, s.sql(select)))
      name
    case _ => throw new IllegalArgumentException(
      "unsupported DDL: expected CREATE [OR REPLACE] TABLE <t> AS SELECT …, " +
        "CREATE [SNAPSHOT] TABLE <t> CLONE <src>, or " +
        "CREATE TABLE <t> LIKE <src>")
  }

  /** q60: CREATE TABLE AS SELECT end-to-end through the versioned store —
    * the statement-level DDL that loads a derived table next to the
    * corpus (the reference's load-then-query staging shape as one
    * statement). The CTAS body aggregates per-status order totals; the
    * gate reads the created table back, so the hash proves parse →
    * Catalyst SELECT → truncate-load commit → read-back equals the
    * declarative answer. With q56/q57/q59 this completes the statement
    * surface: DDL + all three DML verbs. */
  def q60SqlCtas(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runCtas(s, store, dir,
      """CREATE TABLE `graft-project.store.status_rollup` AS
        |SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
        |    AS total_price
        |FROM orders GROUP BY o_orderstatus
        |""".stripMargin)
    store.read("status_rollup")
      .select(col("status"), col("n_orders"),
        col("total_price").cast("double").as("total_price"))
      .sortedSmall("status")
  }

  val q60Oracle: String =
    """SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS total_price
      |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin

  /** The statement-level append (BigQuery shape; the reference appends on
    * every run — main.py:62,185's `to_gbq(..., if_exists='append')`):
    * {{{
    * INSERT INTO `proj.ds.target` [(c1, c2, …)] SELECT …
    * }}} */
  final case class InsertInto(target: String, cols: Option[Seq[String]],
      select: String)

  private val InsertStmt = (
    """(?is)\s*INSERT\s+INTO\s+`?([\w.-]+)`?\s*""" +
    """(?:\(([^)]*)\)\s*)?(SELECT\b.+?)\s*;?\s*""").r

  /** Parse INSERT INTO … SELECT; the optional column list must be plain
    * column names (loud otherwise). The SELECT body stays opaque here —
    * it is arbitrary Catalyst SQL, validated by the planner at run. */
  def parseInsertInto(sql: String): InsertInto = sql match {
    case InsertStmt(target, colList, select) =>
      val cols = Option(colList)
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      cols.foreach { cs =>
        require(cs.nonEmpty && cs.forall(_.matches("\\w+")),
          s"INSERT column list '${colList}' must be plain column names")
        require(cs.map(_.toLowerCase).distinct.length == cs.length,
          s"INSERT column list '${colList}' names a column twice")
      }
      InsertInto(baseName(target), cols, select)
    case _ => throw new IllegalArgumentException(
      "unsupported DML: expected INSERT INTO <t> [(c1, …)] SELECT …")
  }

  /** Execute the statement-level append against a [[TableStore]] table.
    * The SELECT executes over corpus views + statement-scoped store
    * views (same discipline as [[runCtas]]); the result lands via
    * [[TableStore.append]], which asserts schema identity LOUDLY —
    * BigQuery's append contract, not spark's silent schema merge. With a
    * column list, the SELECT binds positionally to the named target
    * columns and every absent target column rides as a typed NULL; the
    * named columns' types must still match the table exactly (no silent
    * cast — a string SELECT item into an int column is schema drift, and
    * the append assert fires). The target must already exist: creating
    * tables is [[runCtas]]'s job, and an INSERT that silently creates
    * would hide a typo'd table name.
    *
    * Scale shape: the SELECT plans like any registry query; the write is
    * one parquet append of the result — no read-modify-write of existing
    * data, no version rewrite, no driver materialization. */
  def runInsert(s: SparkSession, store: TableStore, dir: String,
      sql: String): Unit = {
    val ins = parseInsertInto(sql)
    require(store.exists(ins.target),
      s"INSERT INTO ${ins.target}: table does not exist in the store " +
        "(CREATE TABLE … AS SELECT creates it)")
    val tgtSchema = store.read(ins.target).schema
    withStatementViews(s, store, dir) {
      store.append(ins.target, alignedInsert(s.sql(ins.select), tgtSchema, ins))
    }
  }

  /** Align an INSERT's SELECT result to the target schema (column-list
    * reorder + null-fill of unnamed columns) — shared by the appending
    * path and the transactional overlay's union. */
  private def alignedInsert(sel: DataFrame,
      tgtSchema: org.apache.spark.sql.types.StructType,
      ins: InsertInto): DataFrame = ins.cols match {
    case Some(cs) =>
      require(cs.length == sel.columns.length,
        s"INSERT column list (${cs.length}) and SELECT arity " +
          s"(${sel.columns.length}) must align")
      val unknown = cs.filterNot(c =>
        tgtSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
      require(unknown.isEmpty,
        s"INSERT column(s) ${unknown.mkString(", ")} not in " +
          s"${ins.target}")
      val named = sel.toDF(cs: _*)
      named.select(tgtSchema.fields.toSeq.map { f =>
        if (cs.exists(_.equalsIgnoreCase(f.name))) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    case None => sel
  }

  /** q62: statement-level INSERT INTO … SELECT end-to-end through the
    * store — CTAS seeds the open orders, the INSERT appends the
    * fulfilled ones (with the column-list path exercised: `note` is
    * absent from the list and must ride as a typed NULL). The oracle
    * replays both loads declaratively over `orders`, so the hash gate
    * proves parse → Catalyst SELECT → schema-asserted append →
    * read-back. Completes the statement surface: DDL + all four DML
    * verbs (UPDATE q56, MERGE q57/q61, DELETE q59, INSERT q62).
    *
    * Scale shape: append-only — the existing table is never rewritten,
    * the new rows are one SELECT + one parquet write. */
  def q62SqlInsert(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runCtas(s, store, dir,
      """CREATE TABLE `graft-project.store.order_log` AS
        |SELECT o_orderkey, o_totalprice, CAST('open' AS STRING) AS note
        |FROM orders WHERE o_orderstatus = 'O'
        |""".stripMargin)
    runInsert(s, store, dir,
      """INSERT INTO `graft-project.store.order_log`
        |  (o_orderkey, o_totalprice)
        |SELECT o_orderkey, o_totalprice * 0.9
        |FROM orders WHERE o_orderstatus = 'F'
        |""".stripMargin)
    store.read("order_log")
      .select(col("o_orderkey"), col("o_totalprice").as("logged_price"),
        col("note"))
      .sortedWide("o_orderkey", "note")
  }

  val q62Oracle: String =
    """SELECT o_orderkey, o_totalprice AS logged_price, 'open' AS note
      |FROM orders WHERE o_orderstatus = 'O'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice * 0.9 AS logged_price, NULL AS note
      |FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_orderkey, note""".stripMargin

  private val VersionRef =
    """(?i)`?([\w.-]+)`?\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val SystemTimeRef = (
    """(?i)`?([\w.-]+)`?\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+""" +
    """(?:TIMESTAMP\s+'([^']+)'|(\d{10,}))""").r

  /** `TIMESTAMP '<yyyy-MM-dd HH:mm:ss[.SSS]>'` (UTC — the store's commit
    * stamps are wall-clock UTC millis) or a bare epoch-millis literal. */
  private def parseTsMillis(tsLit: String, epoch: String): Long =
    if (epoch != null) epoch.toLong
    else java.time.LocalDateTime.parse(tsLit.trim.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  /** Execute a SELECT whose FROM/JOIN items pin store tables to a point
    * in history, in either syntax:
    *   - `<table> VERSION AS OF <v>` (Delta's spelling) — resolves
    *     through [[TableStore.readVersion]];
    *   - `<table> FOR SYSTEM_TIME AS OF TIMESTAMP '<ts>'` or
    *     `FOR SYSTEM_TIME AS OF <epochMillis>` (BigQuery's actual
    *     spelling, main-line syntax of the reference's warehouse) —
    *     resolves through [[TableStore.readAsOf]]: the newest commit at
    *     or before the timestamp, from the commit-marker stamps.
    * Each reference is loud if the version/time was never committed or
    * has aged out of retention, and registers as a statement-scoped
    * view, so one statement can join a table's history against itself
    * (the audit/debug shape: "what changed since 9am"). The rest of the
    * SELECT is arbitrary Catalyst SQL over corpus views + pinned
    * versions. `spark.sql` analyzes eagerly, so the scoped views drop
    * before the DataFrame is returned.
    *
    * Scale shape: a pinned version is just another parquet directory —
    * scans prune and push down exactly like the head version; nothing
    * is copied to pin, and timestamp resolution is a marker-log walk
    * (bounded by retention), no data I/O. */
  def runTimeTravel(s: SparkSession, store: TableStore, dir: String,
      sql: String): DataFrame = {
    require(sql.trim.toUpperCase.startsWith("SELECT"),
      "time-travel statements are SELECT-only (DML always runs at head)")
    registerViews(s, dir)
    val views = scala.collection.mutable.LinkedHashSet[String]()
    def scoped(name: String, df: => DataFrame): String = {
      if (!views.contains(name)) {
        df.createOrReplaceTempView(name)
        views += name
      }
      name
    }
    // SYSTEM_TIME first: its table-name prefix can never match
    // VersionRef (different keywords), so the rewrites compose.
    val byTime = SystemTimeRef.replaceAllIn(sql, m => {
      val t = baseName(m.group(1))
      val ms = parseTsMillis(m.group(2), m.group(3))
      scoped(s"${t}__ts$ms", store.readAsOf(t, ms))
    })
    val rewritten = VersionRef.replaceAllIn(byTime, m => {
      val (t, v) = (baseName(m.group(1)), m.group(2).toInt)
      scoped(s"${t}__v$v", store.readVersion(t, v))
    })
    require(views.nonEmpty,
      "no `<table> VERSION AS OF <v>` or `<table> FOR SYSTEM_TIME AS OF " +
        "<ts>` reference in the statement")
    try s.sql(rewritten)
    finally views.foreach(s.catalog.dropTempView(_))
  }

  /** q64: the time-travel SQL front-end end-to-end — commit v1 (the raw
    * orders), commit v2 through the transactional merge (open orders
    * repriced), then run ONE statement joining the two pinned versions
    * to report old vs new price per order. The oracle recomputes both
    * sides declaratively, so the hash gate proves version-pinned
    * resolution → cross-version join → read-back: the SQL face of q58's
    * API-level time travel (retention makes audits a query, not a
    * restore). */
  def q64SqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_tt", orders(s, dir) // commits v1
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    store.mergeWith("orders_tt") { cur => // commits v2
      cur.select(col("o_orderkey"),
        when(col("o_orderstatus") === "O", col("o_totalprice") * 1.2)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"))
    }
    runTimeTravel(s, store, dir,
      """SELECT cur.o_orderkey, old.o_totalprice AS old_price,
        |  cur.o_totalprice AS new_price
        |FROM `graft-project.store.orders_tt` VERSION AS OF 2 cur
        |JOIN `graft-project.store.orders_tt` VERSION AS OF 1 old
        |  ON cur.o_orderkey = old.o_orderkey
        |""".stripMargin)
      .sortedWide("o_orderkey")
  }

  val q64Oracle: String =
    """SELECT o_orderkey, o_totalprice AS old_price,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.2
      |       ELSE o_totalprice END AS new_price
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q66: the reference's nightly job as ONE LITERAL SCRIPT — exactly
    * main.py:256-287's statement sequence: stage the day's updates as a
    * temp table next to the target (truncate-load, main.py:256-273), run
    * the UPDATE-FROM against it (main.py:274-284, here with the SET
    * arithmetic inline — `temp.o_totalprice * 1.1` — instead of
    * pre-staging the product), and DROP the temp table (main.py:287,
    * `not_found_ok=True` spelled `IF EXISTS`). The script then re-CREATEs
    * a table under the temp's name with a PLAIN create — which
    * [[runCtas]] rejects if the name still exists, so the script
    * completing at all PROVES the drop executed mid-lineage, and the
    * re-created table's content rides into the gated output. Comments in
    * the script (including a ';' inside one) pin the comment-aware
    * splitter. The oracle replays the final state declaratively.
    *
    * Scale shape: per statement, unchanged (CTAS write / one merge join /
    * metadata drop); the script adds zero plan overhead. */
  def q66SqlNightlyScript(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    val n = runScript(s, store, dir,
      """-- nightly maintenance; statements run back-to-back (a ';' here
        |-- inside this comment must not split)
        |CREATE TABLE `graft-project.store.games_played` AS
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders;
        |CREATE TABLE `graft-project.store.temp_table` AS
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderstatus = 'O';
        |UPDATE `graft-project.store.games_played` target
        |  SET target.o_totalprice = temp.o_totalprice * 1.1
        |  FROM `graft-project.store.temp_table` temp
        |  WHERE target.o_orderkey = temp.o_orderkey;
        |DROP TABLE `graft-project.store.temp_table`;
        |DROP TABLE IF EXISTS `graft-project.store.temp_table`;
        |/* plain CREATE under the dropped name: errors unless the
        |   DROP above really executed; ';' in here must not split */
        |CREATE TABLE `graft-project.store.temp_table` AS
        |  SELECT COUNT(*) AS n_open FROM orders WHERE o_orderstatus = 'O'
        |""".stripMargin)
    require(n == 6, s"script executed $n statements, expected 6")
    store.read("games_played")
      .crossJoin(store.read("temp_table"))
      .select(col("o_orderkey"), col("o_totalprice").as("final_price"),
        col("n_open"))
      .sortedWide("o_orderkey")
  }

  val q66Oracle: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
      |       ELSE o_totalprice END AS final_price,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      |   WHERE o_orderstatus = 'O') AS n_open
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q67: `FOR SYSTEM_TIME AS OF` end-to-end — commit v1 (raw orders),
    * note the wall clock, commit v2 through the transactional merge
    * (open orders repriced), then run ONE statement joining the
    * timestamp-pinned snapshot (epoch-millis form) against the
    * TIMESTAMP-literal-pinned head: BigQuery's actual time-travel
    * spelling beside q64's Delta `VERSION AS OF`, resolved from the
    * commit-marker stamps, not version numbers. The oracle recomputes
    * both sides declaratively, so the hash gate proves stamp-based
    * resolution picks exactly the newest-commit-≤-ts snapshot.
    *
    * The 30 ms pause between the wall-clock capture and the second
    * commit keeps the two commits' millisecond stamps strictly apart —
    * the same discipline a warehouse's commit-time resolution needs at
    * any scale (ties break toward the earlier commit, so a distinct
    * stamp is what makes "as of t1" deterministic). */
  def q67SqlSystemTime(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_st", orders(s, dir) // commits v1
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    val t1 = System.currentTimeMillis()
    Thread.sleep(30)
    store.mergeWith("orders_st") { cur => // commits v2
      cur.select(col("o_orderkey"),
        when(col("o_orderstatus") === "O", col("o_totalprice") * 1.2)
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        col("o_orderstatus"))
    }
    val t2 = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(System.currentTimeMillis()),
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    runTimeTravel(s, store, dir,
      s"""SELECT cur.o_orderkey, old.o_totalprice AS old_price,
         |  cur.o_totalprice AS new_price
         |FROM `graft-project.store.orders_st`
         |  FOR SYSTEM_TIME AS OF TIMESTAMP '$t2' cur
         |JOIN `graft-project.store.orders_st`
         |  FOR SYSTEM_TIME AS OF $t1 old
         |  ON cur.o_orderkey = old.o_orderkey
         |""".stripMargin)
      .sortedWide("o_orderkey")
  }

  val q67Oracle: String = q64Oracle

  /** q68: arithmetic IN the statement — the MERGE carries
    * `s.o_totalprice * 1.05` in BOTH its SET assignment and its INSERT
    * VALUES, so the staged source holds RAW prices (q57 had to
    * pre-stage the product as a CTAS because the front-end only copied
    * columns; this is that wall removed). Same oracle as q57: the gate
    * proves the in-statement expression evaluates identically on the
    * update and insert paths, through parse → full-outer merge →
    * transactional commit → read-back. */
  def q68SqlMergeExpr(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_x", orders(s, dir)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")))
    store.overwrite("orders_xs", orders(s, dir) // RAW prices — no staging
      .select(col("o_orderkey"), col("o_totalprice"),
        lit("N").as("o_orderstatus")))
    runMerge(s, store,
      """MERGE INTO `graft-project.store.orders_x` t
        |USING `graft-project.store.orders_xs` s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice * 1.05
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice,
        |  o_orderstatus) VALUES (s.o_orderkey, s.o_totalprice * 1.05,
        |  s.o_orderstatus)
        |""".stripMargin)
    store.drop("orders_xs")
    store.read("orders_x")
      .select(col("o_orderkey"),
        col("o_totalprice").as("merged_price"),
        col("o_orderstatus").as("status"))
      .sortedWide("o_orderkey")
  }

  val q68Oracle: String = q57Oracle

  /** Split a statement script on top-level ';'. The scanner tracks the
    * four SQL span kinds a ';' can legally hide in — single-quoted
    * literals (escaped quotes are '' per SQL: two adjacent literals,
    * which nests correctly), backtick-quoted identifiers, `--` line
    * comments, and bracketed comments — so none of them ever missplits
    * a statement. Quoted spans are preserved; comments are STRIPPED
    * (replaced by whitespace), so the per-verb parsers — whose grammars
    * have no comment rule — always see a comment-free statement and verb
    * dispatch reads the first real token even under a leading comment. A
    * fragment that was only comments dissolves to whitespace and drops. */
  private[graft] def splitScript(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var inTick = false
    var inLine = false
    var inBlock = false
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      val next = if (i + 1 < script.length) script.charAt(i + 1) else ' '
      if (inLine) {
        if (c == '\n') { inLine = false; cur += '\n' }
        i += 1
      }
      else if (inBlock) {
        if (c == '*' && next == '/') { inBlock = false; cur += ' '; i += 2 }
        else i += 1
      }
      else if (inQuote) { if (c == '\'') inQuote = false; cur += c; i += 1 }
      else if (inTick) { if (c == '`') inTick = false; cur += c; i += 1 }
      else c match {
        case '\'' => inQuote = true; cur += c; i += 1
        case '`' => inTick = true; cur += c; i += 1
        case '-' if next == '-' => inLine = true; i += 2
        case '/' if next == '*' => inBlock = true; i += 2
        case ';' => out += cur.toString; cur.clear(); i += 1
        case _ => cur += c; i += 1
      }
    }
    require(!inQuote, "unterminated string literal in statement script")
    require(!inTick, "unterminated backtick identifier in statement script")
    require(!inBlock, "unterminated /* comment in statement script")
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val DropStmt =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?`?([\w.-]+)`?\s*;?\s*""".r
  private val DropViewStmt =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?`?([\w.-]+)`?\s*;?\s*""".r
  private val DropIndexStmt =
    """(?is)\s*DROP\s+INDEX\s+(IF\s+EXISTS\s+)?`?(\w+)`?\s*;?\s*""".r

  private val CreateIndexStmt = (
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?INDEX\s+`?(\w+)`?\s+ON\s+""" +
    """`?([\w.-]+)`?\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s+USING\s+(\w+)""" +
    """\s*;?\s*""").r
  private val RefreshIndexStmt =
    """(?is)\s*REFRESH\s+INDEX\s+`?(\w+)`?\s*;?\s*""".r

  /** Execute CREATE [OR REPLACE] INDEX <i> ON <t> (<key>, <col>) USING
    * <kind> — build + commit + stamp ([[Indexes.create]]). */
  def runCreateIndex(s: SparkSession, store: TableStore,
      sql: String): Unit = sql match {
    case CreateIndexStmt(orReplace, iname, target, key, column, kind) =>
      Indexes.create(s, store, iname, baseName(target), key, column,
        kind, orReplace != null)
    case _ => throw new IllegalArgumentException(
      "unsupported DDL: expected CREATE [OR REPLACE] INDEX <i> ON <t> " +
        "(<key>, <col>) USING <kind>")
  }

  /** Execute REFRESH INDEX <i> — rebuild from the current base state and
    * re-stamp ([[Indexes.refresh]]): the explicit heal for the
    * refuse-stale-probes contract. */
  def runRefreshIndex(s: SparkSession, store: TableStore,
      sql: String): Unit = sql match {
    case RefreshIndexStmt(iname) => Indexes.refresh(s, store, iname)
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected REFRESH INDEX <i>")
  }

  /** Execute DROP TABLE [IF EXISTS] — the reference's nightly job ends by
    * dropping its staging table with `not_found_ok=True`
    * (/root/reference/main.py:287); `IF EXISTS` is that flag's SQL
    * spelling. Without it a missing table is LOUD (BigQuery's
    * NotFound), so a typo'd table name can never silently "succeed". */
  def runDrop(store: TableStore, sql: String): Unit = sql match {
    case DropViewStmt(ifExists, target) =>
      val name = baseName(target)
      if (ifExists == null || store.isView(name)) store.dropView(name)
    case DropIndexStmt(ifExists, iname) =>
      Indexes.drop(store, iname, ifExists != null)
    case DropStmt(ifExists, target) =>
      val name = baseName(target)
      require(ifExists != null || store.exists(name),
        s"DROP TABLE $name: table does not exist in the store " +
          "(use DROP TABLE IF EXISTS for not-found-ok semantics)")
      store.drop(name)
      // indexes follow their base (BigQuery's search-index contract:
      // an index cannot outlive its table)
      Indexes.dropAllOn(store, name)
    case _ => throw new IllegalArgumentException(
      "unsupported DDL: expected DROP TABLE|VIEW|INDEX [IF EXISTS] <t>")
  }

  private val AnalyzeStmt =
    """(?is)\s*ANALYZE\s+TABLE\s+`?([\w.-]+)`?\s*;?\s*""".r
  private val AnalyzeBloomStmt =
    """(?is)\s*ANALYZE\s+TABLE\s+`?([\w.-]+)`?\s+BLOOM\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s*;?\s*""".r

  /** Execute ANALYZE TABLE — publish footer-derived per-file stats for
    * the table's current version ([[graft.psn.TableStore.analyze]]), the
    * explicit stats refresh every warehouse exposes (BigQuery keeps
    * clustered-table metadata implicitly; ANSI engines spell it ANALYZE).
    * O(files) metadata reads, no data scanned. `ANALYZE TABLE t BLOOM
    * (c1, …)` additionally opts the columns into per-file Bloom filters
    * for equality skipping ([[graft.psn.TableStore.analyzeBloom]] — one
    * grouped build job; maintained by every later analyze). */
  def runAnalyze(store: TableStore, sql: String): Unit = sql match {
    case AnalyzeBloomStmt(target, colList) =>
      val name = baseName(target)
      require(store.exists(name), s"ANALYZE TABLE $name: table does not exist")
      store.analyzeBloom(name, colList.split(",").toSeq.map(_.trim))
    case AnalyzeStmt(target) =>
      val name = baseName(target)
      require(store.exists(name), s"ANALYZE TABLE $name: table does not exist")
      store.analyze(name)
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected ANALYZE TABLE <t> [BLOOM (c1, …)]")
  }

  private val RestoreStmt =
    """(?is)\s*RESTORE\s+TABLE\s+`?([\w.-]+)`?\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r

  /** Execute RESTORE TABLE … TO VERSION AS OF <v> — rollback as a
    * link-only commit ([[graft.psn.TableStore.restore]]): the snapshot's
    * files, declared schema, and deletion vector become the new head;
    * the rolled-back commits stay readable until GC. */
  def runRestore(store: TableStore, sql: String): Unit = sql match {
    case RestoreStmt(target, v) =>
      val name = baseName(target)
      require(store.exists(name), s"RESTORE $name: table does not exist")
      require(store.restore(name, v.toInt),
        s"RESTORE $name lost its commit race — rerun")
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected RESTORE TABLE <t> TO VERSION AS OF <v>")
  }

  private val VacuumStmt =
    """(?is)\s*VACUUM\s+`?([\w.-]+)`?(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r

  /** Execute VACUUM — sweep orphaned claim directories left by crashed
    * writers ([[graft.psn.TableStore.vacuum]]), age-gated by the RETAIN
    * window (default 1 hour — the lease discipline: a writer silent for
    * the TTL is dead, not slow). Delta's VACUUM shape; a no-op on a
    * healthy table. */
  def runVacuum(store: TableStore, sql: String): Unit = sql match {
    case VacuumStmt(target, hours) =>
      val name = baseName(target)
      require(store.exists(name), s"VACUUM $name: table does not exist")
      store.vacuum(name,
        if (hours == null) 3600000L else hours.toLong * 3600000L)
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected VACUUM <t> [RETAIN <n> HOURS]")
  }

  private val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+`?([\w.-]+)`?(?:\s+CLUSTER\s+BY\s*\(\s*(\w+)\s*\)(?:\s+INTO\s+(\d+)\s+FILES)?)?\s*;?\s*""".r
  private val OptimizeZStmt =
    """(?is)\s*OPTIMIZE\s+`?([\w.-]+)`?\s+ZORDER\s+BY\s*\(\s*(\w+(?:\s*,\s*\w+)+)\s*\)(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*""".r

  /** Execute OPTIMIZE — the lakehouse maintenance verb. Bare
    * `OPTIMIZE t` bin-packs small files ([[graft.psn.TableStore.compact]]);
    * `OPTIMIZE t CLUSTER BY (col) [INTO n FILES]` rewrites the table
    * range-disjoint on the column and refreshes its stats
    * ([[graft.psn.TableStore.cluster]]) so data skipping prunes —
    * Delta's OPTIMIZE / OPTIMIZE ZORDER BY shape. Both are pure layout
    * transactions: a lost CAS race (concurrent writer) is LOUD here —
    * in a script, statement N+1 expects N's layout to exist. */
  def runOptimize(s: SparkSession, store: TableStore, sql: String): Unit =
    sql match {
      case OptimizeZStmt(target, colList, files) =>
        val name = baseName(target)
        require(store.exists(name), s"OPTIMIZE $name: table does not exist")
        val cols = colList.split(",").toSeq.map(_.trim)
        require(store.clusterZ(name, cols,
          if (files == null) s.sparkContext.defaultParallelism
          else files.toInt),
          s"OPTIMIZE $name ZORDER lost its commit race — rerun")
      case OptimizeStmt(target, cluster, files) =>
        val name = baseName(target)
        require(store.exists(name), s"OPTIMIZE $name: table does not exist")
        val ok =
          if (cluster == null) store.compact(name)
          else store.cluster(name, cluster,
            if (files == null) s.sparkContext.defaultParallelism
            else files.toInt)
        require(ok, s"OPTIMIZE $name lost its commit race — rerun")
      case _ => throw new IllegalArgumentException(
        "unsupported statement: expected OPTIMIZE <t> " +
          "[CLUSTER BY (<col>) [INTO <n> FILES]]")
    }

  private val AlterAddStmt =
    """(?is)\s*ALTER\s+TABLE\s+`?([\w.-]+)`?\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
  private val AlterDropStmt =
    """(?is)\s*ALTER\s+TABLE\s+`?([\w.-]+)`?\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val AlterAddColStmt =
    """(?is)\s*ALTER\s+TABLE\s+`?([\w.-]+)`?\s+ADD\s+COLUMN\s+(\w+)\s+([\w]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*;?\s*""".r
  private val AlterDropColStmt =
    """(?is)\s*ALTER\s+TABLE\s+`?([\w.-]+)`?\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r
  private val AlterRenameStmt =
    """(?is)\s*ALTER\s+TABLE\s+`?([\w.-]+)`?\s+RENAME\s+TO\s+`?([\w.-]+)`?\s*;?\s*""".r
  private val AlterRenameColStmt = (
    """(?is)\s*ALTER\s+TABLE\s+`?([\w.-]+)`?\s+RENAME\s+COLUMN\s+""" +
    """(\w+)\s+TO\s+(\w+)\s*;?\s*""").r

  /** Execute ALTER TABLE … ADD/DROP CONSTRAINT (the declarative
    * row-invariant surface — BigQuery and ANSI ship exactly these two;
    * ADD validates existing rows in one scan and is loud on violation,
    * enforcement of future writes is fused into each write's own plan,
    * [[graft.psn.TableStore.addConstraint]]) and ALTER TABLE … ADD/DROP
    * COLUMN — METADATA-ONLY schema evolution through the versioned store
    * ([[graft.psn.TableStore.addColumn]]): zero data rewritten, which is
    * the contract BigQuery's schema update and Delta's ALTER both honor
    * and a 100 TB table requires. */
  def runAlter(store: TableStore, sql: String): Unit = sql match {
    case AlterAddStmt(target, name, check) =>
      store.addConstraint(baseName(target), name, check.trim)
    case AlterDropStmt(target, name) =>
      store.dropConstraint(baseName(target), name)
    case AlterAddColStmt(target, column, typeDdl) =>
      require(store.addColumn(baseName(target), column, typeDdl),
        s"ALTER TABLE ${baseName(target)} ADD COLUMN $column lost its " +
          "commit race — rerun")
    case AlterDropColStmt(target, column) =>
      require(store.dropColumn(baseName(target), column),
        s"ALTER TABLE ${baseName(target)} DROP COLUMN $column lost its " +
          "commit race — rerun")
    case AlterRenameColStmt(target, from, to) =>
      // ONE rewrite commit ([[graft.psn.TableStore.renameColumn]] — the
      // scaladoc there records why this store can't do it metadata-only);
      // time travel keeps each snapshot's own column name, constraints
      // pinning the old name refuse
      store.renameColumn(baseName(target), from, to)
    case AlterRenameStmt(target, to) =>
      // metadata-only directory move ([[graft.psn.TableStore.rename]]):
      // versions and sidecars travel, so time travel keeps working under
      // the new name; loud when views pin the old name or the new one is
      // taken — BigQuery's ALTER TABLE RENAME TO. Secondary indexes pin
      // their base by NAME in `_idxdef` (like MVs in `_mvdef`), so a
      // rename under them would orphan the stamp — refuse.
      val pinned = Indexes.indexesOn(store, baseName(target))
      require(pinned.isEmpty,
        s"cannot rename '${baseName(target)}': index(es) " +
          s"${pinned.mkString(", ")} are stamped to it by name " +
          "(DROP INDEX or REFRESH after re-creating)")
      store.rename(baseName(target), baseName(to))
    case _ => throw new IllegalArgumentException(
      "unsupported DDL: expected ALTER TABLE <t> ADD CONSTRAINT <n> " +
        "CHECK (<expr>) | DROP CONSTRAINT <n> | ADD COLUMN <c> <type> | " +
        "DROP COLUMN <c> | RENAME TO <t2> | RENAME COLUMN <c> TO <c2>")
  }

  private val TruncateStmt =
    """(?is)\s*TRUNCATE\s+TABLE\s+`?([\w.-]+)`?\s*;?\s*""".r

  /** Execute TRUNCATE TABLE — the reference's WRITE_TRUNCATE disposition
    * with no payload (/root/reference/main.py:268-271), as its BigQuery
    * statement spelling: one empty committed version, schema and
    * constraints intact, history retained ([[graft.psn.TableStore
    * .truncate]]). */
  def runTruncate(store: TableStore, sql: String): Unit = sql match {
    case TruncateStmt(target) => store.truncate(baseName(target))
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected TRUNCATE TABLE <t>")
  }

  /** Execute a ';'-separated statement SCRIPT against one store — the
    * reference's nightly job is exactly this shape (stage a temp table,
    * UPDATE … FROM it, drop it — main.py:256-287 runs the statements
    * back-to-back). Dispatch is by leading verb to the statement
    * executors ([[runCtas]]/[[runInsert]]/[[runDml]]/[[runMerge]]/
    * [[runDelete]]/[[runDrop]]), each of which commits through the versioned store
    * before the next statement parses — so statement N+1 always reads
    * statement N's committed table state, and a crash between
    * statements leaves every table at a committed version (the
    * store's invariant, inherited by the script). Loud on any verb
    * outside the surface. Returns the number of statements executed. */
  def runScript(s: SparkSession, store: TableStore, dir: String,
      script: String): Int = {
    val stmts = splitScript(script)
    require(stmts.nonEmpty, "empty statement script")
    // heal any transaction a previous process crashed mid-publish —
    // manifests are roll-forward by construction (see
    // [[graft.psn.TableStore.recoverTransactions]]); O(1) when none
    store.recoverTransactions()
    var i = 0
    while (i < stmts.length) {
      val st = stmts(i)
      if (st.split("\\s+", 2).head.equalsIgnoreCase("BEGIN")) {
        require(st.matches("(?is)\\s*BEGIN(\\s+TRANSACTION)?\\s*"),
          s"unsupported statement: expected BEGIN [TRANSACTION], got '$st'")
        val end = stmts.indexWhere(x => {
          val v = x.split("\\s+", 2).head.toUpperCase
          v == "COMMIT" || v == "ROLLBACK"
        }, i + 1)
        require(end >= 0, "BEGIN without a matching COMMIT/ROLLBACK")
        val body = stmts.slice(i + 1, end)
        require(!body.exists(
            _.split("\\s+", 2).head.equalsIgnoreCase("BEGIN")),
          "nested BEGIN is unsupported")
        val pinned = scala.collection.mutable.ArrayBuffer[DataFrame]()
        try {
          val writes = buildTransaction(s, store, dir, body, pinned)
          if (stmts(end).split("\\s+", 2).head.equalsIgnoreCase("COMMIT"))
            store.commitTransaction(writes)
          // ROLLBACK: every statement executed and validated against the
          // overlay, nothing staged, nothing published — zero store trace
        } finally pinned.foreach(_.unpersist())
        i = end + 1
      } else {
        runStatement(s, store, dir, st)
        i += 1
      }
    }
    stmts.length
  }

  /** One non-transactional statement — the per-verb dispatch shared by
    * [[runScript]]'s sequential path. */
  private def runStatement(s: SparkSession, store: TableStore, dir: String,
      st: String): Unit = {
      st.split("\\s+", 2).head.toUpperCase match {
        case "CREATE" => st match {
          case CreateIndexStmt(_*) => runCreateIndex(s, store, st)
          case _ => runCtas(s, store, dir, st): Unit
        }
        case "INSERT" => runInsert(s, store, dir, st)
        case "UPDATE" => runDml(s, store, st)
        case "MERGE" => runMerge(s, store, st)
        case "DELETE" => st match {
          // key-subquery shape → tombstone anti-join rewrite (q59);
          // arbitrary predicate → deletion-vector commit (q78)
          case DeleteStmt(_*) => runDelete(s, store, st)
          case _ => runDeleteWhere(s, store, st): Unit
        }
        case "DROP" => runDrop(store, st)
        case "ANALYZE" => runAnalyze(store, st)
        case "OPTIMIZE" => runOptimize(s, store, st)
        case "ALTER" => runAlter(store, st)
        case "VACUUM" => runVacuum(store, st)
        case "RESTORE" => runRestore(store, st)
        case "EXPORT" => runExport(s, store, dir, st)
        case "LOAD" => runLoad(s, store, st)
        case "REFRESH" => st match {
          case RefreshIndexStmt(_*) => runRefreshIndex(s, store, st)
          case _ => runRefreshMv(store, st)
        }
        case "TRUNCATE" => runTruncate(store, st)
        case verb => throw new IllegalArgumentException(
          s"unsupported statement verb '$verb': expected CREATE/INSERT/" +
            "UPDATE/MERGE/DELETE/DROP/ANALYZE/OPTIMIZE/ALTER/VACUUM/" +
            "RESTORE/EXPORT/LOAD/REFRESH/TRUNCATE or a BEGIN … COMMIT " +
            "block")
      }
  }

  /** Execute the body of a `BEGIN … COMMIT` block WITHOUT committing:
    * each statement transforms an in-memory OVERLAY (table → its
    * would-be next state as a lazy plan) instead of publishing a store
    * version, reading its predecessors' uncommitted writes through the
    * overlay — BigQuery's multi-statement transaction semantics. Returns
    * the overlay as the transaction's write set for
    * [[graft.psn.TableStore.commitTransaction]].
    *
    * Two consequences, both the point:
    *   - ATOMICITY: a statement failing anywhere here (parse, analysis,
    *     validation probe) aborts with the store UNTOUCHED — nothing was
    *     staged, so "mid-script failure rolls back completely" holds by
    *     construction; crash-during-COMMIT is the manifest's roll-forward.
    *   - ONE MATERIALIZATION PER TABLE: a script that rewrites one table
    *     N times pays one write at COMMIT, not N versioned commits (q63:
    *     8 commits → 4 staged writes).
    *
    * Surface: the DATA statements (CREATE TABLE AS / INSERT / UPDATE /
    * MERGE / DELETE). DDL and maintenance verbs are refused inside a
    * transaction — they commit per statement outside one (BigQuery
    * similarly restricts DDL in transactions). DELETE … WHERE takes the
    * rewrite form here (the overlay IS a rewrite); outside transactions
    * it stays the deletion-vector commit. */
  private def buildTransaction(s: SparkSession, store: TableStore,
      dir: String, stmts: Seq[String],
      pinned: scala.collection.mutable.ArrayBuffer[DataFrame])
      : Seq[(String, DataFrame)] = {
    require(stmts.nonEmpty, "empty transaction block")
    val overlay = scala.collection.mutable.LinkedHashMap[String, DataFrame]()
    def tableExists(t: String) = overlay.contains(t) || store.exists(t)
    def readT(t: String): DataFrame = overlay.getOrElse(t, {
      require(store.exists(t),
        s"table $t does not exist (in the store or this transaction)")
      store.read(t)
    })
    def resolveSrc(t: String): DataFrame = overlay.getOrElse(t,
      if (store.exists(t)) store.read(t) else s.table(t))
    stmts.foreach { st =>
      st.split("\\s+", 2).head.toUpperCase match {
        case "CREATE" => st match {
          case CtasStmt(orReplace, target, select) =>
            val name = baseName(target)
            require(!store.isView(name),
              s"CREATE TABLE $name: a logical view already holds the name")
            require(orReplace != null || !tableExists(name),
              s"CREATE TABLE $name: table already exists " +
                "(use CREATE OR REPLACE TABLE)")
            // a CTAS inside a transaction is a STAGING table by shape
            // (the staged-upsert script pattern): later statements and
            // their validation probes read it repeatedly, so pin it for
            // the transaction's lifetime (memory-and-disk — the
            // in-memory twin of the parquet materialization the
            // per-statement path pays) instead of re-deriving it from
            // the corpus inside every consumer plan
            val staged = withTxnViews(s, store, dir, overlay)(
              s.sql(select)).persist()
            pinned += staged
            overlay(name) = staged
          case _ => throw new IllegalArgumentException(
            "unsupported statement in transaction: CREATE supports only " +
              "CREATE [OR REPLACE] TABLE … AS SELECT")
        }
        case "INSERT" =>
          val ins = parseInsertInto(st)
          require(tableExists(ins.target),
            s"INSERT INTO ${ins.target}: table does not exist")
          val cur = readT(ins.target)
          val rows = withTxnViews(s, store, dir, overlay)(
            alignedInsert(s.sql(ins.select), cur.schema, ins))
          overlay(ins.target) = cur.unionByName(rows)
        case "UPDATE" =>
          val u = parseUpdateFrom(st)
          overlay(u.target) =
            updateFromPlan(u, resolveSrc(u.source))(readT(u.target))
        case "MERGE" =>
          val u = parseMergeInto(st)
          overlay(u.target) =
            mergeIntoPlan(u, resolveSrc(u.source))(readT(u.target))
        case "DELETE" => st match {
          case DeleteStmt(_*) =>
            val d = parseDeleteIn(st)
            overlay(d.target) =
              deleteInPlan(d, resolveSrc(d.source))(readT(d.target))
          case DeleteWhereStmt(target, cond) =>
            val name = baseName(target)
            // DELETE removes rows where the predicate is TRUE; a NULL
            // predicate KEEPS the row (ANSI three-valued semantics)
            overlay(name) =
              readT(name).filter(!coalesce(expr(cond), lit(false)))
          case _ => throw new IllegalArgumentException(
            "unsupported DML: expected DELETE FROM <t> WHERE …")
        }
        case verb => throw new IllegalArgumentException(
          s"unsupported statement verb '$verb' inside BEGIN … COMMIT: " +
            "transactions support CREATE TABLE AS / INSERT / UPDATE / " +
            "MERGE / DELETE (DDL and maintenance verbs commit per " +
            "statement outside a transaction)")
      }
    }
    overlay.toSeq
  }

  /** [[withStatementViews]] for transaction statements: the overlay's
    * uncommitted states REGISTER LAST, shadowing the committed store
    * tables — a statement reads its predecessors' writes, the
    * read-your-own-writes contract of a transaction. */
  private def withTxnViews[T](s: SparkSession, store: TableStore,
      dir: String,
      overlay: scala.collection.Map[String, DataFrame])(body: => T): T = {
    registerViews(s, dir)
    val storeViews = store.tables()
    val logical = store.views()
    val clash = (storeViews ++ logical ++ overlay.keys).toSet
      .intersect(Tables.corpus.toSet)
    require(clash.isEmpty,
      s"store table(s)/view(s) ${clash.mkString(", ")} shadow corpus " +
        "views of the same name — rename them")
    storeViews.foreach(t => store.read(t).createOrReplaceTempView(t))
    overlay.foreach { case (t, df) => df.createOrReplaceTempView(t) }
    val registered = logical.filter { v =>
      try { s.sql(store.viewSql(v)).createOrReplaceTempView(v); true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    }
    try body
    finally (storeViews ++ overlay.keys ++ registered).toSeq.distinct
      .foreach(t => s.catalog.dropTempView(t))
  }

  /** q63: the reference's nightly-job shape end-to-end — ONE
    * TRANSACTIONAL script (`BEGIN … COMMIT`, round 15) composing every
    * DML verb against one store table, each statement reading its
    * predecessors' uncommitted writes through the overlay: CTAS seeds
    * the working table and three staging tables, UPDATE-FROM reprices
    * the open orders, DELETE erases a tombstone batch, MERGE deletes
    * the fulfilled survivors while re-inserting their erased siblings
    * repriced (predicated DELETE + INSERT in one statement), and INSERT
    * appends an adjustment log — all published as ONE atomic
    * multi-table commit (4 staged writes instead of round 14's 8
    * sequential versioned commits; order_state materializes once, not
    * four times). The oracle recomputes the final state
    * declaratively in one pass, so the hash gate proves statement
    * SEQUENCING: five different verbs, five commits, one lineage.
    *
    * Scale shape: each statement keeps its own audited plan (one join /
    * anti-join / full-outer merge / append); the script adds zero plan
    * overhead — it is the same calls a user would make, in order. */
  def q63SqlScript(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    val n = runScript(s, store, dir,
      """BEGIN;
        |CREATE TABLE `graft-project.store.order_state` AS
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders;
        |CREATE TABLE `graft-project.store.price_updates` AS
        |  SELECT o_orderkey, o_totalprice * 1.10 AS o_totalprice
        |  FROM orders WHERE o_orderstatus = 'O';
        |CREATE TABLE `graft-project.store.tombstones` AS
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0;
        |CREATE TABLE `graft-project.store.merge_src` AS
        |  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
        |    CAST('R' AS STRING) AS o_orderstatus
        |  FROM orders WHERE o_orderstatus = 'F';
        |UPDATE `graft-project.store.order_state` t
        |  SET t.o_totalprice = u.o_totalprice
        |  FROM `graft-project.store.price_updates` u
        |  WHERE t.o_orderkey = u.o_orderkey;
        |DELETE FROM `graft-project.store.order_state` t
        |  WHERE t.o_orderkey IN (
        |    SELECT o_orderkey FROM `graft-project.store.tombstones`);
        |MERGE INTO `graft-project.store.order_state` t
        |  USING `graft-project.store.merge_src` s
        |  ON t.o_orderkey = s.o_orderkey
        |  WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
        |  WHEN NOT MATCHED THEN INSERT
        |    (o_orderkey, o_totalprice, o_orderstatus)
        |    VALUES (s.o_orderkey, s.o_totalprice, s.o_orderstatus);
        |INSERT INTO `graft-project.store.order_state`
        |    (o_orderkey, o_totalprice)
        |  SELECT o_orderkey, o_totalprice * 0.5
        |  FROM orders WHERE o_orderstatus <> 'O' AND o_orderkey % 7 = 0;
        |COMMIT
        |""".stripMargin)
    require(n == 10, s"script executed $n statements, expected 10")
    store.read("order_state")
      .select(col("o_orderkey"),
        col("o_totalprice").as("final_price"),
        col("o_orderstatus").as("status"))
      .sortedWide("o_orderkey", "status")
  }

  /** Final state, replayed declaratively: survivors are non-tombstoned
    * non-'F' rows (repriced if open), the MERGE re-inserts every 'F'
    * order whose key WAS tombstoned (matched 'F' survivors are deleted
    * by the predicated clause), and the trailing INSERT appends the
    * %7 adjustment rows with a NULL status. */
  val q63Oracle: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.10
      |       ELSE o_totalprice END AS final_price,
      |  o_orderstatus AS status
      |FROM orders
      |WHERE o_orderkey % 5 <> 0 AND o_orderstatus <> 'F'
      |UNION ALL
      |SELECT o_orderkey, o_totalprice * 2 AS final_price, 'R' AS status
      |FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0
      |UNION ALL
      |SELECT o_orderkey, o_totalprice * 0.5 AS final_price,
      |  NULL AS status
      |FROM orders WHERE o_orderstatus <> 'O' AND o_orderkey % 7 = 0
      |ORDER BY o_orderkey, status""".stripMargin

  /** A wildcard table reference — BigQuery requires the backticks:
    * `` `proj.ds.orders_*` ``. The captured group excludes the `*`. */
  private val WildcardRef = """`([\w.-]+)\*`""".r

  /** Execute a SELECT whose FROM items use BigQuery wildcard tables:
    * every `` `prefix*` `` reference becomes a statement-scoped view over
    * [[TableStore.readWildcard]] — the union of all matching store
    * tables, each branch carrying its `_TABLE_SUFFIX` literal. The rest
    * of the statement is arbitrary Catalyst SQL over corpus views + the
    * wildcard views; `_TABLE_SUFFIX` predicates in the WHERE clause
    * constant-fold per branch, so non-matching shards' scans are PRUNED
    * from the plan by the optimizer (see readWildcard's contract — q84
    * asserts it on the optimized plan).
    *
    * Scale shape: shard elimination happens at plan time; the surviving
    * branches scan like any parquet table (pushdown, pruning intact).
    * The union is by name with null-fill, so a schema-drifted shard
    * cannot silently misalign columns. */
  def runWildcard(s: SparkSession, store: TableStore, dir: String,
      sql: String): DataFrame = {
    require(sql.trim.toUpperCase.startsWith("SELECT"),
      "wildcard-table statements are SELECT-only")
    registerViews(s, dir)
    val views = scala.collection.mutable.LinkedHashSet[String]()
    val rewritten = WildcardRef.replaceAllIn(sql, m => {
      val prefix = baseName(m.group(1))
      val v = s"${prefix}_wild_"
      if (!views.contains(v)) {
        store.readWildcard(prefix).createOrReplaceTempView(v)
        views += v
      }
      v
    })
    require(views.nonEmpty,
      "no wildcard `<prefix>*` table reference in the statement")
    try s.sql(rewritten)
    finally views.foreach(s.catalog.dropTempView(_))
  }

  /** q84: wildcard tables end-to-end — the orders table sharded by year
    * into `orders_<yyyy>` store tables (the BigQuery date-shard layout
    * that predates partitioned tables and still dominates public
    * datasets), then ONE statement over `` `orders_*` `` filtering
    * `_TABLE_SUFFIX` to the middle years. The in-query require proves
    * the optimizer ELIMINATED the out-of-range shards from the plan
    * (per-branch literal suffix → constant-folded filter → pruned scan);
    * the hash gate proves the suffix routing and the union semantics
    * against a declarative recompute over the unsharded table.
    *
    * Scale shape: pruning is plan-time, so a 10-year × daily-shard
    * corpus answers a one-month question by scanning ~30 shards; with
    * huge shard counts the metadata-level `suffixPred` arm of
    * [[TableStore.readWildcard]] bounds plan cost too. */
  def q84WildcardTables(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_wild_wh").toString
    val store = new TableStore(s, wh)
    val ord = orders(s, dir).select(col("o_orderkey"), col("o_totalprice"),
      year(col("o_orderdate")).as("yr"))
    // bounded collect: |distinct calendar years| (7 in this corpus)
    val years = ord.select(col("yr")).distinct()
      .collect().map(_.getInt(0)).sorted
    require(years.length >= 3,
      s"need >= 3 year shards for a strict middle band, got ${years.length}")
    years.foreach(y =>
      store.overwrite(s"orders_$y", ord.filter(col("yr") === y).drop("yr")))
    val (lo, hi) = (years(1), years(years.length - 2))
    val out = runWildcard(s, store, dir,
      s"""SELECT _TABLE_SUFFIX AS yr, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
         |    AS total
         |FROM `graft-project.store.orders_*`
         |WHERE _TABLE_SUFFIX BETWEEN '$lo' AND '$hi'
         |GROUP BY _TABLE_SUFFIX""".stripMargin)
    val scanned = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.length
    val wanted = years.count(y => y >= lo && y <= hi)
    require(scanned == wanted,
      s"shard pruning inert: plan scans $scanned relations for a " +
        s"$wanted-shard suffix range (of ${years.length} shards)")
    out.sortedSmall("yr")
  }

  val q84Oracle: String =
    """WITH yrs AS (SELECT DISTINCT CAST(EXTRACT(year FROM o_orderdate)
      |    AS BIGINT) AS y FROM orders),
      |b AS (SELECT
      |  (SELECT y FROM yrs ORDER BY y LIMIT 1 OFFSET 1) AS lo,
      |  (SELECT y FROM yrs ORDER BY y DESC LIMIT 1 OFFSET 1) AS hi)
      |SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS yr,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
      |FROM orders, b
      |WHERE EXTRACT(year FROM o_orderdate) BETWEEN b.lo AND b.hi
      |GROUP BY 1 ORDER BY yr""".stripMargin

  private val ExportStmt = (
    """(?is)\s*EXPORT\s+DATA\s+OPTIONS\s*\(\s*uri\s*=\s*'([^']+)'\s*,""" +
    """\s*format\s*=\s*'(\w+)'\s*\)\s*AS\s*(SELECT\b.+?)\s*;?\s*""").r

  /** Execute `EXPORT DATA OPTIONS(uri='…', format='PARQUET'|'CSV'|'JSON')
    * AS SELECT …` — BigQuery's bulk-export statement: the SELECT runs
    * over corpus views + statement-scoped store views and its result
    * lands as files at the uri (a BigQuery-style wildcard tail — slash,
    * star, extension — names the directory). The write is the plan's LAST stage — one
    * distributed pass, files written per partition in parallel, no
    * driver materialization; exactly how a 100 TB result leaves the
    * warehouse. Re-running replaces the target (mode overwrite): an
    * export is a publication, not a ledger. Returns the directory. */
  def runExport(s: SparkSession, store: TableStore, dir: String,
      sql: String): String = sql match {
    case ExportStmt(uri, fmt, select) =>
      val path = uri.replaceFirst("/\\*[^/]*$", "")
      val f = fmt.toUpperCase
      withStatementViews(s, store, dir) {
        val w = s.sql(select).write.mode("overwrite")
        f match {
          case "PARQUET" => w.parquet(path)
          case "CSV" => w.option("header", "true").csv(path)
          case "JSON" => w.json(path)
          case other => throw new IllegalArgumentException(
            s"EXPORT DATA format '$other' unsupported: PARQUET, CSV, JSON")
        }
      }
      path
    case _ => throw new IllegalArgumentException(
      "unsupported statement: expected EXPORT DATA OPTIONS(uri='…', " +
        "format='…') AS SELECT …")
  }

  private val LoadStmt = (
    """(?is)\s*LOAD\s+DATA\s+(INTO|OVERWRITE)\s+`?([\w.-]+)`?\s+FROM\s+""" +
    """FILES\s*\(\s*uris\s*=\s*\[([^\]]+)\]\s*,\s*format\s*=\s*'(\w+)'""" +
    """\s*\)\s*;?\s*""").r

  /** Execute `LOAD DATA INTO|OVERWRITE <t> FROM FILES(uris=[…],
    * format='PARQUET'|'CSV'|'JSON')` — BigQuery's file-ingestion
    * statement (the reference's pipeline is load-then-query:
    * load_data_first.py's load jobs and main.py:62's `to_gbq`). INTO
    * appends through the store's schema-asserted in-place append;
    * OVERWRITE truncate-loads a new version. CSV reads with header +
    * schema inference (BigQuery's autodetect). Returns the row count
    * loaded — the statement's job statistics.
    *
    * Scale shape: the read is a parquet/CSV scan like any other source
    * (splittable, parallel), the sink is the store's append — one pass,
    * no driver staging. */
  def runLoad(s: SparkSession, store: TableStore, sql: String): Long =
    sql match {
      case LoadStmt(mode, target, uriList, fmt) =>
        val name = baseName(target)
        val uris = uriList.split(",").toSeq.map(_.trim)
          .map { u =>
            require(u.length > 2 && u.head == '\'' && u.last == '\'',
              s"LOAD DATA uris must be quoted strings, got $u")
            u.substring(1, u.length - 1)
          }
        require(uris.nonEmpty, "LOAD DATA needs at least one uri")
        val df = fmt.toUpperCase match {
          case "PARQUET" => s.read.parquet(uris: _*)
          case "CSV" => s.read.option("header", "true")
            .option("inferSchema", "true").csv(uris: _*)
          case "JSON" => s.read.json(uris: _*)
          case other => throw new IllegalArgumentException(
            s"LOAD DATA format '$other' unsupported: PARQUET, CSV, JSON")
        }
        // Job statistics come from the COMMITTED result, not a pre-pass
        // over the source: a separate count() scans the input twice and
        // can diverge from the rows actually loaded if source files
        // change between the two jobs. countRows is footer metadata —
        // O(files), zero data read.
        val before =
          if (mode.equalsIgnoreCase("OVERWRITE") || !store.exists(name)) 0L
          else store.countRows(name)
        if (mode.equalsIgnoreCase("OVERWRITE")) store.overwrite(name, df)
        else store.append(name, df)
        store.countRows(name) - before
      case _ => throw new IllegalArgumentException(
        "unsupported statement: expected LOAD DATA INTO|OVERWRITE <t> " +
          "FROM FILES(uris=['…'], format='…')")
    }

  /** q85: EXPORT DATA end-to-end — one statement aggregates lineitem and
    * publishes the result as parquet files; the gate READS THE EXPORT
    * BACK, so the hash proves parse → SELECT → distributed file write →
    * re-scan equals the declarative answer (a broken exporter that
    * wrote, say, the pre-aggregation rows or lost a partition cannot
    * pass). */
  def q85SqlExport(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_exp_wh").toString
    val store = new TableStore(s, wh)
    val out = java.nio.file.Files
      .createTempDirectory("graft_exp_out").toString
    Sql.runExport(s, store, dir,
      s"""EXPORT DATA OPTIONS(uri='$out/flag_rollup/*.parquet',
         |  format='PARQUET') AS
         |SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE)
         |    AS sum_qty
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |""".stripMargin)
    s.read.parquet(s"$out/flag_rollup")
      .sortedSmall("l_returnflag", "l_linestatus")
  }

  val q85Oracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q86: LOAD DATA end-to-end — the reference's load-then-query pipeline
    * as statements: the order file is split into two halves, the first
    * LOAD creates the table, the second APPENDS (INTO), and a third
    * statement OVERWRITE-loads a scratch table to prove truncate-load
    * too; the gate aggregates the loaded table, so the hash proves both
    * load modes composed losslessly with the store's commit protocol. */
  def q86SqlLoad(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_load_wh").toString
    val store = new TableStore(s, wh)
    val stage = java.nio.file.Files
      .createTempDirectory("graft_load_src").toString
    val ord = orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice"))
    ord.filter(col("o_orderkey") % 2 === 0).write.parquet(s"$stage/even")
    ord.filter(col("o_orderkey") % 2 =!= 0).write.parquet(s"$stage/odd")
    Sql.runLoad(s, store,
      s"LOAD DATA INTO `graft-project.store.orders_ld` FROM FILES(" +
        s"uris=['$stage/even'], format='PARQUET');")
    Sql.runLoad(s, store,
      s"LOAD DATA INTO `graft-project.store.orders_ld` FROM FILES(" +
        s"uris=['$stage/odd'], format='PARQUET');")
    Sql.runLoad(s, store,
      s"LOAD DATA OVERWRITE `graft-project.store.orders_ld` FROM FILES(" +
        s"uris=['$stage/even', '$stage/odd'], format='PARQUET');")
    store.read("orders_ld")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(30, 2)))
          .cast("double").as("total"))
      .sortedSmall("o_orderstatus")
  }

  val q86Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  private val TableChangesRef = (
    """(?i)TABLE_CHANGES\s*\(\s*`?([\w.-]+)`?\s*,\s*(\d+)\s*,\s*(\d+)""" +
    """\s*,\s*'(\w+)'\s*\)""").r

  /** Execute a SELECT over `TABLE_CHANGES(<t>, <fromV>, <toV>, '<key>')`
    * references — the change-data-feed table function (Delta's
    * table_changes, keyed like [[TableStore.diffVersions]] because the
    * store's row identity is the caller's key, not a hidden rowid). Each
    * reference becomes a statement-scoped view of the version diff:
    * (key, change ∈ added|removed|changed, before, after) with the
    * non-key columns packed as two structs, so `before.col` / `after.col`
    * work in the surrounding SQL. Audit queries compose from there —
    * "what did the nightly commit actually do", grouped, joined, summed.
    *
    * Scale shape: the diff is ONE full-outer join on the key between two
    * retained snapshots (null-safe struct compare drops unchanged rows);
    * both sides scan like any parquet version directory. */
  def runTableChanges(s: SparkSession, store: TableStore, dir: String,
      sql: String): DataFrame = {
    require(sql.trim.toUpperCase.startsWith("SELECT"),
      "TABLE_CHANGES statements are SELECT-only")
    registerViews(s, dir)
    val views = scala.collection.mutable.LinkedHashSet[String]()
    val rewritten = TableChangesRef.replaceAllIn(sql, m => {
      val (t, from, to, key) =
        (baseName(m.group(1)), m.group(2).toInt, m.group(3).toInt,
          m.group(4))
      val v = s"${t}__chg${from}_$to"
      if (!views.contains(v)) {
        store.diffVersions(t, from, to, key).createOrReplaceTempView(v)
        views += v
      }
      v
    })
    require(views.nonEmpty,
      "no TABLE_CHANGES(<t>, <from>, <to>, '<key>') reference in the " +
        "statement")
    try s.sql(rewritten)
    finally views.foreach(s.catalog.dropTempView(_))
  }

  /** q89: the change data feed end-to-end — commit v1 (raw orders), then
    * ONE transactional rewrite that updates (doubles open orders'
    * prices), deletes (drops fulfilled rows), and inserts (re-keys the
    * dropped rows as fresh arrivals) in a single commit; the gated
    * statement groups TABLE_CHANGES(v1→v2) by change kind with
    * decimal-exact before/after sums. The oracle derives all three
    * classes declaratively from the raw table, so hash equality proves
    * the diff classifies every row movement correctly — the audit
    * query a 100 TB nightly pipeline runs instead of replaying the
    * transform. */
  def q89TableChanges(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val wh = java.nio.file.Files
      .createTempDirectory("graft_cdc_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_cdc", orders(s, dir).select(col("o_orderkey"),
      col("o_totalprice").cast(
        org.apache.spark.sql.types.DataTypes.createDecimalType(30, 2))
        .as("price"),
      col("o_orderstatus").as("st")))
    store.mergeWith("orders_cdc") { cur =>
      val kept = cur.filter(col("st") =!= "F")
        .select(col("o_orderkey"),
          when(col("st") === "O", col("price") * 2)
            .otherwise(col("price"))
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(30, 2)).as("price"),
          col("st"))
      val arrivals = cur.filter(col("st") === "F")
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          col("price"), col("st"))
      kept.unionByName(arrivals)
    }
    runTableChanges(s, store, dir,
      """SELECT change, COUNT(*) AS n,
        |  CAST(SUM(before.price) AS DOUBLE) AS sum_before,
        |  CAST(SUM(after.price) AS DOUBLE) AS sum_after
        |FROM TABLE_CHANGES(`graft-project.store.orders_cdc`, 1, 2,
        |  'o_orderkey')
        |GROUP BY change""".stripMargin)
      .sortedSmall("change")
  }

  val q89Oracle: String =
    """WITH b AS (SELECT o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(30,2)) AS p, o_orderstatus AS st
      |  FROM orders)
      |SELECT 'added' AS change, COUNT(*) AS n,
      |  CAST(NULL AS DOUBLE) AS sum_before,
      |  CAST(SUM(p) AS DOUBLE) AS sum_after
      |FROM b WHERE st = 'F'
      |UNION ALL
      |SELECT 'changed', COUNT(*), CAST(SUM(p) AS DOUBLE),
      |  CAST(SUM(p * 2) AS DOUBLE)
      |FROM b WHERE st = 'O'
      |UNION ALL
      |SELECT 'removed', COUNT(*), CAST(SUM(p) AS DOUBLE),
      |  CAST(NULL AS DOUBLE)
      |FROM b WHERE st = 'F'
      |ORDER BY change""".stripMargin

  /** q90: the RUNNING-BALANCE statement — column-column arithmetic and a
    * CASE expression inside SET, the two shapes round 12's front-end
    * stopped at (`SET t.c = s.c <op> <numeric literal>` was the wall).
    * A customer balance table is debited by a staged per-customer
    * adjustment (`t.bal = t.bal - s.amt` — the rhs reads BOTH aliases)
    * while the segment column takes a guarded overwrite
    * (`CASE WHEN s.amt > 100000 THEN 'HEAVY' ELSE t.seg END`). The
    * oracle recomputes both assignments declaratively over
    * customer⋈orders, so the hash gate proves target-column reads
    * resolve against the pre-update row (assignment semantics: every
    * SET reads the OLD row, BigQuery/ANSI), not a half-updated one.
    *
    * Scale shape: identical to q56 — one left equi-join on the key
    * inside [[graft.psn.TableStore.mergeWith]]'s transactional rewrite;
    * the richer rhs is still a per-row codegen'd projection. */
  def q90SqlUpdateBalance(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.{customer, orders}
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("cust_bal", customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal").cast(dec).as("bal"),
        col("c_mktsegment").as("seg")))
    store.overwrite("cust_adj", orders(s, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(col("o_totalprice").cast(dec)).as("amt")))
    runDml(s, store,
      """UPDATE `graft-project.store.cust_bal` t
        |SET t.bal = t.bal - s.amt,
        |    t.seg = CASE WHEN s.amt > 100000 THEN 'HEAVY' ELSE t.seg END
        |FROM `graft-project.store.cust_adj` s
        |WHERE t.c_custkey = s.c_custkey
        |""".stripMargin)
    store.drop("cust_adj")
    store.read("cust_bal")
      .select(col("c_custkey"), col("bal").cast("double").as("bal"),
        col("seg"))
      .sortedWide("c_custkey")
  }

  val q90Oracle: String =
    """WITH adj AS (
      |  SELECT o_custkey AS k,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS amt
      |  FROM orders GROUP BY 1)
      |SELECT c.c_custkey,
      |  CAST(CASE WHEN a.k IS NOT NULL
      |    THEN CAST(c.c_acctbal AS DECIMAL(18,2)) - a.amt
      |    ELSE CAST(c.c_acctbal AS DECIMAL(18,2)) END AS DOUBLE) AS bal,
      |  CASE WHEN a.k IS NOT NULL AND a.amt > 100000
      |    THEN 'HEAVY' ELSE c.c_mktsegment END AS seg
      |FROM customer c LEFT JOIN adj a ON c.c_custkey = a.k
      |ORDER BY c.c_custkey""".stripMargin

  /** q91: the three-arm dimension-sync MERGE — the statement the
    * reference's new_game + upsert pair (main.py:176-185, 256-287)
    * composes to, in ONE transactional commit: matched rows reprice from
    * the snapshot, snapshot-only rows INSERT (with a literal sentinel
    * status — the VALUES list mixes source columns and literals), and
    * rows that VANISHED from the snapshot are dropped by the `WHEN NOT
    * MATCHED BY SOURCE THEN DELETE` arm — except those its target-side
    * guard retains (`AND t.st <> 'F'` keeps closed orders for audit).
    * The oracle recomputes all three arms declaratively, so the hash
    * gate proves the BY SOURCE group dispatches on target-only rows
    * (and ONLY there), alongside the other two groups in one statement.
    *
    * Scale shape: still ONE full-outer equi-join on the key — the third
    * arm reuses the join's target-only stream; no extra pass, shuffle,
    * or anti-join. */
  def q91SqlMergeSync(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_sy", orders(s, dir)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_totalprice").cast(dec).as("price"),
        col("o_orderstatus").as("st")))
    store.overwrite("orders_sys", orders(s, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice").cast(dec).as("price")))
    runMerge(s, store,
      """MERGE INTO `graft-project.store.orders_sy` t
        |USING `graft-project.store.orders_sys` s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET t.price = s.price * 2
        |WHEN NOT MATCHED BY TARGET THEN INSERT (o_orderkey, price, st)
        |  VALUES (s.o_orderkey, s.price, 'I')
        |WHEN NOT MATCHED BY SOURCE AND t.st <> 'F' THEN DELETE
        |""".stripMargin)
    store.drop("orders_sys")
    store.read("orders_sy")
      .select(col("o_orderkey"), col("price").cast("double").as("price"),
        col("st"))
      .sortedWide("o_orderkey")
  }

  val q91Oracle: String =
    """WITH t AS (SELECT o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
      |    o_orderstatus AS st
      |  FROM orders WHERE o_orderkey % 3 <> 0),
      |s AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT t.o_orderkey, CAST(s.price * 2 AS DOUBLE) AS price, t.st
      |FROM t JOIN s ON t.o_orderkey = s.o_orderkey
      |UNION ALL
      |SELECT o_orderkey, CAST(price AS DOUBLE) AS price, st FROM t
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s) AND st = 'F'
      |UNION ALL
      |SELECT o_orderkey, CAST(price AS DOUBLE) AS price, 'I' AS st FROM s
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM t)
      |ORDER BY o_orderkey""".stripMargin

  /** q92: the GUARDED UPSERT — UPDATE-FROM whose WHERE carries residual
    * predicates beyond the join equality (round 12's parser rejected
    * any second conjunct): a target-side date guard (`t.od >= DATE
    * '1995-07-01'` — only recent orders reprice) and a source-side
    * value guard (`s.price > 1000` — cheap adjustments are ignored).
    * The executor pre-filters the source with the source-side residual
    * (prune before the shuffle) and folds the target-side one into the
    * matched condition — a join-matched row failing it is left
    * UNTOUCHED, never deleted (BigQuery's UPDATE-FROM WHERE semantics),
    * which is exactly what the oracle's CASE recomputation pins.
    *
    * Scale shape: q56's one left equi-join, with the source residual
    * applied scan-side (predicate pushdown does the rest). */
  def q92SqlGuardedUpdate(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    import graft.tables.Tables.orders
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    store.overwrite("orders_g", orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").cast(dec).as("price"),
        col("o_orderdate").as("od")))
    store.overwrite("orders_gs", orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice").cast(dec).as("price")))
    runDml(s, store,
      """UPDATE `graft-project.store.orders_g` t
        |SET t.price = s.price * 2
        |FROM `graft-project.store.orders_gs` s
        |WHERE t.o_orderkey = s.o_orderkey
        |  AND t.od >= DATE '1995-07-01'
        |  AND s.price > 1000
        |""".stripMargin)
    store.drop("orders_gs")
    store.read("orders_g")
      .select(col("o_orderkey"), col("price").cast("double").as("price"))
      .sortedWide("o_orderkey")
  }

  val q92Oracle: String =
    """SELECT o_orderkey,
      |  CAST(CASE WHEN o_orderdate >= DATE '1995-07-01'
      |    AND CAST(o_totalprice AS DECIMAL(18,2)) > 1000
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) * 2
      |    ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS DOUBLE) AS price
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q93: LOGICAL VIEWS end-to-end — CREATE VIEW stores the SQL text
    * (BigQuery's standard view: no rows materialized, re-planned per
    * read), and the gate pins the FRESHNESS contract that separates it
    * from a materialized view: the base table takes an INSERT *after*
    * the view is created, and a rollup built through the view must see
    * the inserted rows — the stored definition re-planned against
    * current state, not a snapshot. Parse → validate-at-create →
    * statement-scoped resolution (corpus views, store tables, then
    * logical views in creation order) → read-back, all hash-gated.
    *
    * Scale shape: a view is one sidecar file and zero storage; the read
    * pays the full underlying plan — the explicitly-priced trade against
    * q87's materialized view. */
  def q93SqlView(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_vw_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.ord_v` AS
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0;
        |CREATE VIEW `graft-project.store.big_ord` AS
        |  SELECT o_orderstatus AS status, o_totalprice FROM ord_v
        |  WHERE o_totalprice > 50000;
        |INSERT INTO `graft-project.store.ord_v`
        |  (o_orderkey, o_orderstatus, o_totalprice)
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 1;
        |CREATE TABLE `graft-project.store.view_rollup` AS
        |  SELECT status, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM big_ord GROUP BY status;
        |DROP VIEW `graft-project.store.big_ord`;
        |""".stripMargin)
    store.read("view_rollup").sortedSmall("status")
  }

  val q93Oracle: String =
    """SELECT o_orderstatus AS status, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_totalprice > 50000
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q95: TRUNCATE TABLE end-to-end — the reference's WRITE_TRUNCATE
    * disposition (/root/reference/main.py:268-271) as its SQL statement:
    * CTAS seeds the even orders, TRUNCATE commits an empty version, and
    * an INSERT of the odd orders lands on the emptied table. The INSERT
    * is the schema witness: [[runInsert]] asserts schema identity
    * against the table, so it only succeeds if TRUNCATE preserved the
    * declared schema through the empty commit — and the final state
    * carries ONLY odd keys, proving the even rows are gone (not merely
    * shadowed). History/restore semantics are pinned in SqlDmlSpec.
    *
    * Scale shape: TRUNCATE is O(1) data — one empty commit, no scan. */
  def q95SqlTruncate(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.ord_t` AS
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0;
        |TRUNCATE TABLE `graft-project.store.ord_t`;
        |INSERT INTO `graft-project.store.ord_t`
        |  (o_orderkey, o_orderstatus, o_totalprice)
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 1;
        |""".stripMargin)
    store.read("ord_t")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
      .sortedWide("o_orderkey")
  }

  val q95Oracle: String =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(o_totalprice AS DOUBLE) AS price
      |FROM orders WHERE o_orderkey % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  /** q96: ALTER TABLE … RENAME TO end-to-end — the metadata-only
    * directory move ([[graft.psn.TableStore.rename]]): CTAS seeds a
    * third of the orders, RENAME moves the table, and an INSERT lands
    * on the NEW name — proof the rename carried the declared schema and
    * committed head (the INSERT's schema assert and version chain both
    * resolve under the new name; the old name is gone, pinned in
    * SqlDmlSpec along with time travel across the rename).
    *
    * Scale shape: one atomic directory move; zero data rewritten —
    * the only rename contract a 100 TB table can afford. */
  def q96SqlRename(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.ord_pre` AS
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 0;
        |ALTER TABLE `graft-project.store.ord_pre` RENAME TO
        |  `graft-project.store.ord_post`;
        |INSERT INTO `graft-project.store.ord_post`
        |  (o_orderkey, o_orderstatus, o_totalprice)
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 1;
        |""".stripMargin)
    store.read("ord_post")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
      .sortedWide("o_orderkey")
  }

  val q96Oracle: String =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(o_totalprice AS DOUBLE) AS price
      |FROM orders WHERE o_orderkey % 3 IN (0, 1)
      |ORDER BY o_orderkey""".stripMargin

  /** q97: CREATE INDEX / REFRESH INDEX end-to-end — the secondary-index
    * statement surface ([[Indexes]], r14 verdict next-1): CTAS seeds a
    * document table, CREATE INDEX commits the HASH index (key + md5 of
    * the content column) as a versioned store table and stamps the base
    * state, an INSERT advances the base, the now-STALE index REFUSES its
    * probe loudly (asserted in-line — the refuse-stale contract, r14
    * next-8), REFRESH INDEX rebuilds + re-stamps, and the final probe
    * answers the exact-duplicate-groups question FROM THE INDEX ALONE —
    * no content rescan. The oracle recomputes the groups declaratively
    * over the same union, so the hash gate proves build → staleness →
    * refresh → probe equals the declarative answer.
    *
    * Scale shape: the build is one projection scan (codegen'd md5, no
    * shuffle); the probe scans the INDEX, not the corpus — at 100 TB
    * that is the entire point of maintaining one. */
  def q97CreateIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.docs_i` AS
        |  SELECT doc_id, text FROM documents;
        |CREATE INDEX docidx ON `graft-project.store.docs_i`
        |  (doc_id, text) USING HASH;
        |""".stripMargin)
    // fresh probe serves; the index covers the full base
    require(Indexes.probe(s, store, "docidx").count() ==
      store.read("docs_i").count(), "q97: fresh index must cover the base")
    runScript(s, store, dir,
      """INSERT INTO `graft-project.store.docs_i` (doc_id, text)
        |  SELECT doc_id + 1000000, text FROM documents
        |  WHERE doc_id % 37 = 0;
        |""".stripMargin)
    val refused =
      try { Indexes.probe(s, store, "docidx"); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("STALE") }
    require(refused,
      "q97: a probe of an index whose base advanced must refuse loudly")
    runScript(s, store, dir, "REFRESH INDEX docidx;")
    Indexes.probe(s, store, "docidx")
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("k"))
      .filter(col("n") > 1)
      .sortedWide("h")
  }

  val q97Oracle: String =
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |  WHERE doc_id % 37 = 0
      |)
      |SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS n,
      |  min(doc_id) AS k
      |FROM all_docs GROUP BY 1 HAVING count(*) > 1
      |ORDER BY h""".stripMargin

  /** q98: multi-statement transaction semantics end-to-end (r14 verdict
    * next-2) — three blocks against one seeded table:
    *
    *   1. a transaction whose SECOND statement fails (UPDATE against a
    *      missing source) after a valid first statement: the store must
    *      carry ZERO trace of it — no new version, no content change
    *      (asserted in-line on the version chain);
    *   2. an explicit `BEGIN … ROLLBACK`: statements execute and
    *      validate against the overlay, nothing publishes;
    *   3. a committed transaction (UPDATE + DELETE + INSERT over the
    *      same table): exactly ONE new version lands — three statements,
    *      one materialization, one atomic commit.
    *
    * The oracle replays block 3 declaratively over the seed, so the
    * hash gate proves the aborted/rolled-back blocks truly left
    * nothing behind AND the committed overlay chain equals the
    * declarative answer. Crash-mid-COMMIT roll-forward is pinned in
    * CrashRecoverySpec (the manifest protocol,
    * [[graft.psn.TableStore.recoverTransactions]]). */
  def q98SqlTransaction(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.acct` AS
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 4 = 0;
        |""".stripMargin)
    val v0 = store.versions("acct").max
    // 1. mid-transaction failure → complete rollback
    val aborted =
      try {
        runScript(s, store, dir,
          """BEGIN;
            |UPDATE `graft-project.store.acct` t
            |  SET t.o_totalprice = u.o_totalprice
            |  FROM `graft-project.store.acct` u
            |  WHERE t.o_orderkey = u.o_orderkey;
            |UPDATE `graft-project.store.acct` t
            |  SET t.o_totalprice = u.o_totalprice
            |  FROM `graft-project.store.no_such_src` u
            |  WHERE t.o_orderkey = u.o_orderkey;
            |COMMIT
            |""".stripMargin)
        false
      } catch { case _: Exception => true }
    require(aborted, "q98: the failing transaction must abort")
    require(store.versions("acct").max == v0,
      "q98: an aborted transaction must leave zero store trace")
    // 2. explicit ROLLBACK publishes nothing
    runScript(s, store, dir,
      """BEGIN;
        |DELETE FROM `graft-project.store.acct` WHERE o_totalprice > 0;
        |ROLLBACK
        |""".stripMargin)
    require(store.versions("acct").max == v0,
      "q98: ROLLBACK must leave zero store trace")
    // 3. the committed chain: three statements, ONE new version
    runScript(s, store, dir,
      """BEGIN;
        |UPDATE `graft-project.store.acct` t
        |  SET t.o_totalprice = t.o_totalprice * 2
        |  FROM `graft-project.store.acct` u
        |  WHERE t.o_orderkey = u.o_orderkey AND t.o_orderstatus = 'O';
        |DELETE FROM `graft-project.store.acct` WHERE o_orderkey % 3 = 0;
        |INSERT INTO `graft-project.store.acct`
        |    (o_orderkey, o_totalprice)
        |  SELECT o_orderkey + 1, o_totalprice * 0.25 FROM orders
        |  WHERE o_orderkey % 4 = 0 AND o_orderkey % 5 = 0;
        |COMMIT
        |""".stripMargin)
    require(store.versions("acct").max == v0 + 1,
      "q98: a committed transaction lands exactly one version per table")
    store.read("acct")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
      .sortedWide("o_orderkey", "price")
  }

  val q98Oracle: String =
    """WITH seed AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 4 = 0
      |)
      |SELECT o_orderkey, o_orderstatus,
      |  CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
      |       ELSE o_totalprice END AS DOUBLE) AS price
      |FROM seed WHERE o_orderkey % 3 <> 0
      |UNION ALL
      |SELECT o_orderkey + 1 AS o_orderkey, NULL AS o_orderstatus,
      |  CAST(o_totalprice * 0.25 AS DOUBLE) AS price
      |FROM seed WHERE o_orderkey % 5 = 0
      |ORDER BY o_orderkey, price""".stripMargin

  /** q99: ALTER TABLE … RENAME COLUMN end-to-end — ONE rewrite commit
    * ([[graft.psn.TableStore.renameColumn]]; the scaladoc there records
    * why this store cannot do it metadata-only). The INSERT after the
    * rename is the schema witness (it only succeeds if the head carries
    * the new name), and the in-line time-travel assert pins the q96
    * discipline: the PRE-rename snapshot keeps its OWN column name. */
  def q99RenameColumn(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.ord_rc` AS
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 2 = 0;
        |ALTER TABLE `graft-project.store.ord_rc`
        |  RENAME COLUMN o_totalprice TO price;
        |INSERT INTO `graft-project.store.ord_rc` (o_orderkey, price)
        |  SELECT o_orderkey, o_totalprice * 2 FROM orders
        |  WHERE o_orderkey % 2 = 1;
        |""".stripMargin)
    // time travel composes: the pre-rename version still reads with its
    // own declared column name, never the renamed head's
    val v0 = store.versions("ord_rc").min
    require(store.readVersion("ord_rc", v0)
        .columns.contains("o_totalprice"),
      "q99: the pre-rename snapshot must keep its own column name")
    require(!store.read("ord_rc").columns.contains("o_totalprice"),
      "q99: the head must carry only the new name")
    store.read("ord_rc")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("price").cast("double").as("price"))
      .sortedWide("o_orderkey")
  }

  val q99Oracle: String =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(o_totalprice AS DOUBLE) AS price
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, NULL AS o_orderstatus,
      |  CAST(o_totalprice * 2 AS DOUBLE) AS price
      |FROM orders WHERE o_orderkey % 2 = 1
      |ORDER BY o_orderkey""".stripMargin

  /** q100: CREATE TABLE … LIKE end-to-end — an empty table carrying the
    * source's schema ([[graft.psn.TableStore.createLike]]: one empty
    * commit, nothing scanned). The INSERT is the schema witness
    * ([[runInsert]] asserts identity against the new table), and the
    * source is PROVEN untouched by returning a join of both tables'
    * aggregate shapes. */
  def q100CreateLike(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.cust_base` AS
        |  SELECT c_custkey, c_name, c_acctbal FROM customer;
        |CREATE TABLE `graft-project.store.cust_like`
        |  LIKE `graft-project.store.cust_base`;
        |INSERT INTO `graft-project.store.cust_like`
        |    (c_custkey, c_name, c_acctbal)
        |  SELECT c_custkey, c_name, c_acctbal FROM customer
        |  WHERE c_custkey % 3 = 0;
        |""".stripMargin)
    require(store.read("cust_like").schema ==
        store.read("cust_base").schema,
      "q100: LIKE must copy the source schema exactly")
    store.read("cust_like")
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("bal"))
      .sortedWide("c_custkey")
  }

  val q100Oracle: String =
    """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
      |FROM customer WHERE c_custkey % 3 = 0
      |ORDER BY c_custkey""".stripMargin

  /** q101: CREATE TABLE … COPY end-to-end — a writable independent copy
    * ([[runClone]]: immutable data files make the O(files) hard-link
    * commit physically equivalent to BigQuery's copy job). The copy is
    * then mutated; the source must be PROVEN untouched, so the result
    * unions both tables' final states under a tag column. */
  def q101CreateCopy(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Out._
    val wh = java.nio.file.Files
      .createTempDirectory("graft_dml_wh").toString
    val store = new TableStore(s, wh)
    runScript(s, store, dir,
      """CREATE TABLE `graft-project.store.cust_src` AS
        |  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer;
        |CREATE TABLE `graft-project.store.cust_cp`
        |  COPY `graft-project.store.cust_src`;
        |DELETE FROM `graft-project.store.cust_cp`
        |  WHERE c_mktsegment <> 'BUILDING';
        |""".stripMargin)
    store.read("cust_src").withColumn("side", lit("src"))
      .unionAll(store.read("cust_cp").withColumn("side", lit("cp")))
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"),
        graft.expr.Exprs.dsum(col("c_acctbal")).as("bal"))
      .sortedWide("side")
  }

  val q101Oracle: String =
    """WITH src AS (SELECT c_custkey, c_mktsegment, c_acctbal
      |             FROM customer),
      |     cp AS (SELECT * FROM src WHERE c_mktsegment = 'BUILDING'),
      |     u AS (SELECT 'src' AS side, * FROM src
      |           UNION ALL SELECT 'cp' AS side, * FROM cp)
      |SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS bal
      |FROM u GROUP BY side ORDER BY side""".stripMargin

  val all: Seq[graft.Q] = Seq(
    graft.Q("q56_sql_update_from", q56SqlUpdateFrom, Some(q56Oracle)),
    graft.Q("q57_sql_merge", q57SqlMerge, Some(q57Oracle)),
    graft.Q("q59_sql_delete", q59SqlDelete, Some(q59Oracle)),
    graft.Q("q60_sql_ctas", q60SqlCtas, Some(q60Oracle)),
    graft.Q("q61_sql_merge_full", q61SqlMergeFull, Some(q61Oracle)),
    graft.Q("q62_sql_insert", q62SqlInsert, Some(q62Oracle)),
    graft.Q("q63_sql_script", q63SqlScript, Some(q63Oracle)),
    graft.Q("q64_sql_time_travel", q64SqlTimeTravel, Some(q64Oracle)),
    graft.Q("q66_sql_nightly_script", q66SqlNightlyScript, Some(q66Oracle)),
    graft.Q("q67_sql_system_time", q67SqlSystemTime, Some(q67Oracle)),
    graft.Q("q68_sql_merge_expr", q68SqlMergeExpr, Some(q68Oracle)),
    graft.Q("q84_wildcard_tables", q84WildcardTables, Some(q84Oracle)),
    graft.Q("q85_sql_export", q85SqlExport, Some(q85Oracle)),
    graft.Q("q86_sql_load", q86SqlLoad, Some(q86Oracle)),
    graft.Q("q89_table_changes", q89TableChanges, Some(q89Oracle)),
    graft.Q("q90_sql_update_balance", q90SqlUpdateBalance, Some(q90Oracle)),
    graft.Q("q91_sql_merge_sync", q91SqlMergeSync, Some(q91Oracle)),
    graft.Q("q92_sql_guarded_update", q92SqlGuardedUpdate, Some(q92Oracle)),
    graft.Q("q93_sql_view", q93SqlView, Some(q93Oracle)),
    graft.Q("q95_sql_truncate", q95SqlTruncate, Some(q95Oracle)),
    graft.Q("q96_sql_rename", q96SqlRename, Some(q96Oracle)),
    graft.Q("q97_create_index", q97CreateIndex, Some(q97Oracle)),
    graft.Q("q98_sql_transaction", q98SqlTransaction, Some(q98Oracle)),
    graft.Q("q99_rename_column", q99RenameColumn, Some(q99Oracle)),
    graft.Q("q100_create_like", q100CreateLike, Some(q100Oracle)),
    graft.Q("q101_create_copy", q101CreateCopy, Some(q101Oracle)))
}
