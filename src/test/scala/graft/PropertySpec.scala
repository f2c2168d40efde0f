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
}
