package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSessions

class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  case class Click(user_id: Long, sec: Long)

  test("native session_window splits on gap and matches q54's grouping") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Click]
    val events = mem.toDF().selectExpr("user_id", "timestamp_seconds(sec) AS ts")
    val q = StreamSessions.sessionize(events, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      // u1: two events 100s apart (one session), then an 1801s gap (new
      // session); u2: one event — the exact q54 spec scenario
      mem.addData(Click(1L, 0), Click(1L, 100), Click(1L, 1901), Click(2L, 50))
      q.processAllAvailable()
      // push the watermark far past every session end + gap so all seal
      mem.addData(Click(9L, 100000)); q.processAllAvailable()
      mem.addData(Click(9L, 100001)); q.processAllAvailable()
      val got = spark.sql(
        """SELECT user_id, n_events,
                  CAST(unix_timestamp(first_ts) AS BIGINT) AS first_s,
                  CAST(unix_timestamp(last_ts) AS BIGINT) AS last_s
           FROM sessions_test WHERE user_id < 9 ORDER BY user_id, first_s""")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got === Seq(
        (1L, 2L, 0L, 100L),    // u1 session 1: events at 0 and 100
        (1L, 1L, 1901L, 1901L), // u1 session 2: the post-gap event
        (2L, 1L, 50L, 50L)))   // u2's lone session
      // the batch twin groups these identically (q54 on the same rows)
      val batch = graft.ops.RelationalOps.sessionize(
        Seq((1L, 0L), (1L, 100L), (1L, 1901L), (2L, 50L)).toDF("user_id", "sec")
          .selectExpr("monotonically_increasing_id() AS event_id", "user_id",
            "timestamp_seconds(sec) AS ts"))
        .select("user_id", "n_events").as[(Long, Long)].collect().toSeq.sorted
      assert(batch === got.map(r => (r._1, r._2)).sorted)
    } finally q.stop()
  }
}
