package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  test("streaming hourly windows equal the batch twin") {
    val q = Streams.hourlyCountsStream(spark, sf).writeStream
      .format("memory").queryName("hourly_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_stream")
    val batch = Streams.eventsHourly(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("stateful streaming sessionization matches the batch twin") {
    val q = Streams.sessionizeStream(spark, Streams.eventsStream(spark, sf))
      .writeStream
      .format("memory").queryName("sessions_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions_stream")
      .select(col("user_id"), col("session_seq").cast("long").as("session_seq"),
        col("n_events").cast("long").as("n_events"),
        col("duration_secs"))
    val batch = Streams.eventsSessions(spark, sf)
      .select(col("user_id"), col("session_seq"),
        col("n_events"), col("duration_secs"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0, "streamed sessions not in batch")
    assert(batch.except(streamed).count() == 0, "batch sessions not in stream")
  }

  test("stream-stream interval join equals the batch range join") {
    val q = Streams.clickPurchaseJoinStream(spark, sf).writeStream
      .format("memory").queryName("sj_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("sj_stream")
    val batch = graft.ext.TemporalJoins.rangeClickPurchase(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0, "streamed pairs not in batch")
    assert(batch.except(streamed).count() == 0, "batch pairs not in stream")
  }

  test("foreachBatch incremental sink is idempotent under replay") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString + "/events"
    val q1 = Streams.streamToIncrementalParquet(spark, sf, out)
    q1.awaitTermination(120000)
    val n = Tables.events(spark, sf).count()
    assert(spark.read.parquet(out).count() == n)
    // replay the whole stream (fresh query, no checkpoint): the keyed
    // anti-join append must insert nothing
    val q2 = Streams.streamToIncrementalParquet(spark, sf, out)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(out).count() == n)
  }

  test("sliding windows double-count each event") {
    val total = Streams.eventsSliding(spark, sf)
      .agg(sum("n_events")).head.getLong(0)
    assert(total == 2 * Tables.events(spark, sf).count())
  }
}
