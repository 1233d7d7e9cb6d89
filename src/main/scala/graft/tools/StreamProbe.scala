package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Sustained-rate probe for the streaming paths — the throughput
  * evidence behind the streaming family's SCALE.md row: the
  * correctness story is MemoryStream specs + batch-equivalent oracles,
  * and this main adds the "how many events/sec does the state machine
  * actually sustain, and does its state stay bounded" measurement.
  *
  * Two probed paths (the two production state shapes):
  *  - windowed aggregation (`Streams.windowedStream`: 1 h windows,
  *    2 h watermark) — state is the open window set;
  *  - watermark dedup (`Streams.dedupEventsStream`: 1 h horizon, ~9%
  *    planted duplicates) — state is the within-horizon key set.
  *
  * Event time advances ~1 s per event, so a run spans many watermark
  * horizons and the per-batch `stateOperators.numRowsTotal` series
  * shows eviction working: bounded state is the claim that makes the
  * path 100 TB-viable, not the local[32] rate itself. Batches are
  * pre-generated so the measured wall time is the engine's
  * (add+process), not tuple construction. Measurement tooling only.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(20)
    val perBatch = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    implicit val sc = spark.sqlContext

    val types = Array("click", "view", "signup", "purchase", "refund")
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

    // deterministic batches; every 11th event duplicates its
    // predecessor (the at-least-once shape the dedup path exists for)
    def batch(b: Int): Seq[(Long, Timestamp, String, Double)] =
      (0 until perBatch).map { i =>
        val g0 = b.toLong * perBatch + i
        val g = if (g0 % 11 == 0 && g0 > 0) g0 - 1 else g0
        (g % 10000L, new Timestamp(base + g * 1000L),
          types((g % types.length).toInt), (g % 100L).toDouble)
      }

    def run(name: String)(plan: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val batches = (0 until nBatches).map(batch) // pre-generate
      val mem = MemoryStream[(Long, Timestamp, String, Double)]
      val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      val q = plan(df).writeStream
        .outputMode(if (name == "windowed_agg") "update" else "append")
        .format("memory").queryName(s"probe_$name").start()
      try {
        val t0 = System.nanoTime()
        var stateRows = Vector.empty[Long]
        batches.foreach { rows =>
          mem.addData(rows)
          q.processAllAvailable()
          val p = q.lastProgress
          stateRows :+= (if (p == null || p.stateOperators.isEmpty) 0L
            else p.stateOperators.map(_.numRowsTotal).sum)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val n = nBatches.toLong * perBatch
        println(f"[stream] $name%-14s events=$n rate=${n / sec}%,.0f ev/s " +
          f"wall=$sec%.1f s state_rows(first,mid,last)=" +
          s"${stateRows.head},${stateRows(stateRows.size / 2)},${stateRows.last}")
      } finally q.stop()
    }

    run("windowed_agg")(df => graft.streaming.Streams.windowedStream(df, "1 hour", "2 hours"))
    run("dedup")(df => graft.streaming.Streams.dedupEventsStream(
      df, Seq("user_id", "event_type", "ts"), "ts", "1 hour"))
    spark.stop()
  }
}
