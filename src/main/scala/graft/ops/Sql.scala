package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** SQL entry point. The reference ships SQL text to BigQuery
  * (/root/reference/main.py:153-157, 274-284); in this engine the same
  * surface is `spark.sql` over registered corpus views — parsed by Catalyst,
  * planned and executed like every DataFrame query (one engine, two
  * front-ends). */
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
}
