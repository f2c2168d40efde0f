package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Drives the streaming plans with the static events table as a one-batch
  * stream (memory sink, processAllAvailable). Cross-checks the tumbling
  * aggregation against its batch twin (EventOps.s01). */
class StreamsSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling windows match the batch twin") {
    val q = Streams.tumblingCounts(Streams.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .select(unix_timestamp(col("bucket_start")).as("bucket_start"),
        col("event_type"), col("n_events"))
    val batch = ext.EventOps.s01Tumbling(spark, sf)
      .select(col("bucket_start"), col("event_type"), col("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("streaming session windows produce sessions for every user") {
    val q = Streams.sessionCounts(Streams.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sessions_out")
    val users = graft.tables.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.select("user_id").distinct().count() == users)
    // session count per user never exceeds event count
    val ev = graft.tables.Tables.events(spark, sf)
      .groupBy("user_id").count().withColumnRenamed("count", "n_ev")
    val sess = out.groupBy("user_id").count().withColumnRenamed("count", "n_sess")
    assert(sess.join(ev, "user_id")
      .filter(col("n_sess") > col("n_ev")).count() == 0)
  }

  test("flatMapGroupsWithState emits per-user running deltas") {
    val q = Streams.valueDeltas(spark, Streams.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("deltas_out")
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("deltas_out")
    val expect = graft.tables.Tables.events(spark, sf)
      .groupBy("user_id").agg(sum("value").as("expect_total"))
    // single batch → one delta per user, equal to the user's value sum
    assert(out.count() == expect.count())
    val joined = out.join(expect, "user_id")
      .filter(abs(col("total") - col("expect_total")) > 1e-6)
    assert(joined.count() == 0)
  }
}
