package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries

/** The mergeable heavy-hitters Aggregator behind t35: containment of
  * every key above n/(k+1) must survive ANY partitioning (the merge-order
  * invariance the oracle gate relies on), and the summary must respect
  * its capacity. */
class MisraGriesSpec extends AnyFunSuite {
  import TestSpark._

  // Zipf-ish stream: key i repeated ceil(2000/i) times for i in 1..200,
  // plus a long uniform tail of singletons. n ≈ 12.3k; with k = 31 the
  // guarantee covers freq > n/32 ≈ 385 — keys 1..5 qualify decisively.
  private val stream: Seq[String] =
    (1 to 200).flatMap(i => Seq.fill(math.ceil(2000.0 / i).toInt)(s"k$i")) ++
      (0 until 3000).map(i => s"tail$i")

  private val n = stream.size.toLong
  private val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
  private def heavies(k: Int): Set[String] =
    exact.filter(_._2 > n / (k + 1)).keys.toSet

  test("every key above n/(k+1) is contained, under any partitioning") {
    import spark.implicits._
    for (k <- Seq(15, 31, 63); parts <- Seq(1, 7, 32)) {
      val got = spark.createDataset(stream).repartition(parts)
        .select(MisraGries(k).toColumn.name("keys"))
        .head().toSet
      assert(got.size <= k, s"k=$k parts=$parts: summary over capacity")
      val missing = heavies(k) -- got
      assert(missing.isEmpty,
        s"k=$k parts=$parts: guaranteed keys missing: $missing")
    }
  }

  test("at or under capacity the summary is exactly the key set") {
    import spark.implicits._
    val small = (1 to 20).flatMap(i => Seq.fill(i)(s"x$i"))
    val got = spark.createDataset(small).repartition(5)
      .select(MisraGries(128).toColumn.name("keys"))
      .head()
    assert(got.sorted == (1 to 20).map(i => s"x$i").sorted)
  }
}
