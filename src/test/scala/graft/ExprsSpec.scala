package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the scalar expression library (SURVEY §2.7).
  * The ddHHyyyyMM key format (reference main.py:102) is golden-tested first
  * per SURVEY §7.4 — its odd field order is part of key identity. */
class ExprsSpec extends AnyFunSuite {
  import TestSpark._
  import graft.expr.Exprs._

  private def one(c: org.apache.spark.sql.Column): String = {
    spark.range(1).select(c.cast("string").as("v")).head.getString(0)
  }

  test("keyDateFormat is ddHHyyyyMM (day, hour, year, month)") {
    val c = keyDateFormat(to_timestamp(lit("2024-03-07 15:42:10")))
    assert(one(c) == "0715202403")
  }

  test("deriveId = last7(stripped id) ++ ddHHyyyyMM(ts)") {
    val c = deriveId(lit("CUSA_12345_XY"),
      to_timestamp(lit("2023-12-31 23:59:59")))
    // strip '_' -> CUSA12345XY, last 7 -> A12345XY? no: 12345XY
    assert(one(c) == "12345XY3123202312")
  }

  test("lastChars clamps when shorter than n") {
    assert(one(lastChars(lit("abc"), 7)) == "abc")
  }

  test("isoDurationSeconds parses PT#H#M#S") {
    assert(one(isoDurationSeconds(lit("PT2H30M15S"))) == "9015.0")
    assert(one(isoDurationSeconds(lit("PT45S"))) == "45.0")
    assert(one(isoDurationSeconds(lit("PT1H"))) == "3600.0")
  }

  test("todayMidnight truncates to 00:00 of the current day") {
    val v = spark.range(1)
      .select(graft.expr.Exprs.todayMidnight().cast("string"))
      .head.getString(0)
    assert(v.endsWith("00:00:00"))
  }

  test("dsum is exact and order-independent") {
    import spark.implicits._
    val df = Seq.fill(1000)(0.1).toDF("x")
    val s = df.repartition(7).agg(dsum(col("x")).as("s"))
      .head.getDouble(0)
    assert(s == 100.0) // a naive double sum would drift
  }
}
