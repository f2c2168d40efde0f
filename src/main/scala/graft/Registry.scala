package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark query over a testdata scale-factor
  * directory plus (when SQL-expressible) the DuckDB oracle the driver uses as
  * the correctness gate. Modules contribute `Seq[Q]`; SparkEntry aggregates.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    ops.Relational.all ++ ops.Relational2.all ++ ops.Bucketed.all ++
      ops.Skew.all ++ ops.Quality.all ++ ops.Sql.all ++ ops.Storage.all ++
      ext.TextOps.all ++ ext.TextOps2.all ++ ext.TextOps3.all ++
      ext.TextOps4.all ++
      ext.SimilarityOps.all ++ ext.SimilarityOps2.all ++
      ext.EventOps.all ++ ext.MultimodalOps.all ++ streaming.Streams.all
}
