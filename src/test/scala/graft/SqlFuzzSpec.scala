package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Indexes, Sql}
import graft.psn.TableStore

/** Differential fuzz of the regex statement dispatcher (r14 verdict
  * next-3). The SQL front-end is ~20 verbs of regex parsing; the risk
  * class is a SILENT MISPARSE — a formatting variant that matches the
  * wrong branch or captures the wrong identifier. Each generated case
  * renders a statement from a STRUCTURED template (so the intended
  * parse is known independently of the regexes) under randomized
  * keyword case, whitespace (spaces / tabs / newlines), backtick
  * quoting, project.dataset qualification, and trailing-semicolon
  * choices, then asserts the parser returns exactly the template's
  * fields. Near-miss malformed statements must throw loudly — never
  * parse as something else. Statement-level DDL variants execute
  * against a real store and assert their EFFECT. */
class SqlFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  // ---- statement renderer: keyword-case / whitespace / quoting fuzz

  /** One rendering style, drawn per statement. */
  private case class Style(kwCase: Int, ws: Seq[String], quote: Boolean,
      qualify: Boolean, semi: Boolean)

  private val styleGen: Gen[Style] = for {
    kwCase <- Gen.choose(0, 2) // 0 as-is, 1 lower, 2 upper
    ws <- Gen.listOfN(8,
      Gen.oneOf(" ", "  ", "\n", "\t", " \n ", "\n\t ")).map(_.toSeq)
    quote <- Gen.oneOf(true, false)
    qualify <- Gen.oneOf(true, false)
    semi <- Gen.oneOf(true, false)
  } yield Style(kwCase, ws, quote, qualify, semi)

  /** Tokens: ("k", keyword) | ("i", identifier) | ("p", punctuation glued
    * to the previous token). Rendering joins with style whitespace. */
  private def render(tokens: Seq[(String, String)], st: Style): String = {
    var w = 0
    def nextWs: String = { val s = st.ws(w % st.ws.length); w += 1; s }
    val sb = new StringBuilder
    tokens.zipWithIndex.foreach { case ((kind, tok), ix) =>
      val t = kind match {
        case "k" => st.kwCase match {
          case 1 => tok.toLowerCase
          case 2 => tok.toUpperCase
          case _ => tok
        }
        case "i" if tok.contains("#") => // table slot: quote/qualify
          val bare = tok.stripPrefix("#")
          if (st.qualify) s"`graft-fuzz.ds.$bare`"
          else if (st.quote) s"`$bare`"
          else bare
        case _ => tok
      }
      if (ix > 0 && kind != "p") sb.append(nextWs)
      sb.append(t)
    }
    if (st.semi) sb.append(";")
    sb.toString
  }

  test("UPDATE-FROM parses to the template under formatting fuzz; near-misses are loud") {
    val cases = sample(styleGen, 60)
    cases.foreach { st =>
      val sql = render(Seq(
        "k" -> "UPDATE", "i" -> "#tgt_t", "i" -> "a",
        "k" -> "SET", "i" -> "a.c1", "p" -> " = ", "i" -> "b.c1",
        "p" -> ",", "i" -> "a.c2", "p" -> " = ", "i" -> "b.c2",
        "k" -> "FROM", "i" -> "#src_t", "i" -> "b",
        "k" -> "WHERE", "i" -> "a.k", "p" -> " = ", "i" -> "b.k"), st)
      val u = Sql.parseUpdateFrom(sql)
      assert(u.target == "tgt_t" && u.source == "src_t", sql)
      assert(u.targetKey == "k" && u.sourceKey == "k", sql)
      assert(u.sets == Seq("c1" -> Sql.VCol(false, "c1"),
        "c2" -> Sql.VCol(false, "c2")), sql)
      assert(u.residuals.isEmpty, sql)
    }
    // near-misses: must throw, never misparse
    Seq(
      "UPDATE t SET x = 1",                       // no FROM
      "UPDATE t1 a SET a.x = b.y FROM t2 b",      // no WHERE
      "UPDATE t1 a SET FROM t2 b WHERE a.k = b.k" // empty SET
    ).foreach(s => intercept[IllegalArgumentException](
      Sql.parseUpdateFrom(s)))
  }

  test("MERGE INTO parses to the template under formatting fuzz; near-misses are loud") {
    val cases = sample(styleGen, 60)
    cases.foreach { st =>
      val sql = render(Seq(
        "k" -> "MERGE", "k" -> "INTO", "i" -> "#mt", "i" -> "t",
        "k" -> "USING", "i" -> "#ms", "i" -> "s",
        "k" -> "ON", "i" -> "t.k", "p" -> " = ", "i" -> "s.k",
        "k" -> "WHEN", "k" -> "MATCHED", "k" -> "THEN",
        "k" -> "UPDATE", "k" -> "SET", "i" -> "t.v", "p" -> " = ",
        "i" -> "s.v",
        "k" -> "WHEN", "k" -> "NOT", "k" -> "MATCHED", "k" -> "THEN",
        "k" -> "INSERT", "p" -> "(", "i" -> "k", "p" -> ",", "i" -> "v",
        "p" -> ")",
        "k" -> "VALUES", "p" -> "(", "i" -> "s.k", "p" -> ",",
        "i" -> "s.v", "p" -> ")"), st)
      val m = Sql.parseMergeInto(sql)
      assert(m.target == "mt" && m.source == "ms", sql)
      assert(m.targetKey == "k" && m.sourceKey == "k", sql)
      assert(m.whens.length == 2, sql)
      assert(m.sets == Seq("v" -> Sql.VCol(false, "v")), sql)
    }
    Seq(
      "MERGE INTO t USING s ON t.k = s.k",          // no WHEN clause
      "MERGE INTO t USING s WHEN MATCHED THEN DELETE", // no ON
      "MERGE t USING s ON t.k = s.k WHEN MATCHED THEN DELETE" // no INTO
    ).foreach(s =>
      intercept[IllegalArgumentException](Sql.parseMergeInto(s)))
  }

  test("DELETE-IN and INSERT INTO parse to their templates under formatting fuzz; near-misses are loud") {
    val cases = sample(styleGen, 60)
    cases.foreach { st =>
      val del = render(Seq(
        "k" -> "DELETE", "k" -> "FROM", "i" -> "#dt", "i" -> "t",
        "k" -> "WHERE", "i" -> "t.k", "k" -> "IN",
        "p" -> "(", "k" -> "SELECT", "i" -> "k2",
        "k" -> "FROM", "i" -> "#ds", "p" -> ")"), st)
      val d = Sql.parseDeleteIn(del)
      assert(d.target == "dt" && d.source == "ds", del)
      assert(d.targetKey == "k" && d.sourceKey == "k2", del)

      val ins = render(Seq(
        "k" -> "INSERT", "k" -> "INTO", "i" -> "#it",
        "p" -> "(", "i" -> "a", "p" -> ",", "i" -> "b", "p" -> ")",
        "k" -> "SELECT", "i" -> "x", "p" -> ",", "i" -> "y",
        "k" -> "FROM", "i" -> "z"), st)
      val p = Sql.parseInsertInto(ins)
      assert(p.target == "it", ins)
      assert(p.cols == Some(Seq("a", "b")), ins)
      assert(p.select.toUpperCase.startsWith("SELECT"), ins)
    }
    Seq(
      "DELETE t WHERE k IN (SELECT k FROM s)", // no FROM
      "INSERT t (a) SELECT x FROM z"           // no INTO
    ).foreach { s =>
      intercept[IllegalArgumentException] {
        Sql.parseDeleteIn(s); Sql.parseInsertInto(s)
      }
    }
  }

  test("DDL verbs execute correctly under formatting fuzz; junk verbs and near-misses are loud") {
    import spark.implicits._
    val cases = sample(styleGen, 8)
    cases.zipWithIndex.foreach { case (st, i) =>
      val store = new TableStore(spark,
        Files.createTempDirectory(s"fuzz_wh_$i").toString)
      store.overwrite("ft", Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
      // CREATE TABLE … COPY (writable) and CREATE SNAPSHOT TABLE … CLONE
      Sql.runClone(store, render(Seq(
        "k" -> "CREATE", "k" -> "TABLE", "i" -> "#fc",
        "k" -> "COPY", "i" -> "#ft"), st))
      assert(store.read("fc").count() == 2 && !store.isSnapshot("fc"),
        s"style $i")
      Sql.runClone(store, render(Seq(
        "k" -> "CREATE", "k" -> "SNAPSHOT", "k" -> "TABLE", "i" -> "#fs",
        "k" -> "CLONE", "i" -> "#ft"), st))
      assert(store.isSnapshot("fs"), s"style $i")
      // TRUNCATE
      Sql.runTruncate(store, render(Seq(
        "k" -> "TRUNCATE", "k" -> "TABLE", "i" -> "#ft"), st))
      assert(store.read("ft").count() == 0, s"style $i")
      // ALTER RENAME TO
      Sql.runAlter(store, render(Seq(
        "k" -> "ALTER", "k" -> "TABLE", "i" -> "#ft",
        "k" -> "RENAME", "k" -> "TO", "i" -> "#ft2"), st))
      assert(store.exists("ft2") && !store.exists("ft"), s"style $i")
      // CREATE INDEX / REFRESH INDEX / DROP INDEX
      Sql.runCreateIndex(spark, store, render(Seq(
        "k" -> "CREATE", "k" -> "INDEX", "i" -> "fi",
        "k" -> "ON", "i" -> "#ft2",
        "p" -> "(", "i" -> "k", "p" -> ",", "i" -> "v", "p" -> ")",
        "k" -> "USING", "k" -> "HASH"), st))
      assert(Indexes.list(store) == Seq("fi"), s"style $i")
      Sql.runRefreshIndex(spark, store, render(Seq(
        "k" -> "REFRESH", "k" -> "INDEX", "i" -> "fi"), st))
      Sql.runDrop(store, render(Seq(
        "k" -> "DROP", "k" -> "INDEX", "i" -> "fi"), st))
      assert(Indexes.list(store).isEmpty, s"style $i")
      // DROP TABLE
      Sql.runDrop(store, render(Seq(
        "k" -> "DROP", "k" -> "TABLE", "i" -> "#ft2"), st))
      assert(!store.exists("ft2"), s"style $i")
    }
    // near-miss DDL + junk verbs stay loud through the script dispatcher
    val store = new TableStore(spark,
      Files.createTempDirectory("fuzz_wh_junk").toString)
    store.overwrite("jt", Seq((1L, 2L)).toDF("k", "v"))
    Seq(
      "TRUNCATE jt",                      // missing TABLE
      "DROP TABL jt",                     // typo'd object
      "CREATE INDEX i ON jt (k) USING HASH", // arity: needs (key, col)
      "ALTER TABLE jt RENAME jt2",        // missing TO
      "CREATE SNAPSHOT TABLE s2 COPY jt", // SNAPSHOT pairs with CLONE only
      "FROBNICATE jt",                    // unknown verb
      "COMMIT"                            // COMMIT without BEGIN
    ).foreach { s =>
      intercept[IllegalArgumentException](
        Sql.runScript(spark, store, "/root/testdata/sf0.001", s))
    }
    // the near-misses changed nothing
    assert(store.read("jt").count() == 1)
  }
}
