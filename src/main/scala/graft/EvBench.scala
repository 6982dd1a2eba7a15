package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-scale probe: push N synthetic events through the REAL
  * sessionization path (file-source micro-batches → watermark →
  * `flatMapGroupsWithState` with event-time timeout → sink) and report
  * events/sec — calibrates the per-key state cost of the stateful
  * operator the same way CcBench/VecBench calibrate their loops.
  *
  * The event layout is deterministic and self-verifying: per user,
  * event k fires at base + k·60 s + (k div 5)·1800 s, so each block of
  * five 1-minute-spaced events is one session and each 30-minute gap
  * splits — expected sessions = users · ceil(perUser/5), asserted after
  * the run (a probe whose output is unchecked can quietly measure a
  * broken pipeline). A far-future sentinel advances the watermark so
  * every session flushes under AvailableNow.
  *
  * Usage: runMain graft.EvBench [nEvents] [nUsers]
  */
object EvBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val users = args.lift(1).map(_.toLong).getOrElse(10000L)
    require(n >= users && users >= 1, s"need nEvents >= nUsers >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    val baseUs = 1577836800000000L // 2020-01-01 UTC
    val perUser = n / users // uniform; remainder dropped for a closed form
    val dir = java.nio.file.Files.createTempDirectory("graft_evb")
      .toString + "/events"
    spark.range(0L, users * perUser)
      .select((col("id") % users).as("user_id"),
        expr(s"id div $users").as("k")) // div, not /: / is double division
      .select(
        (col("user_id") * perUser + col("k")).as("event_id"),
        // ns-long ts, exactly the events.parquet layout
        ((lit(baseUs) + col("k") * 60000000L +
          expr("k div 5") * 1800000000L) * 1000L).as("ts"),
        col("user_id"),
        lit("x").as("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
      .repartition(8)
      .write.parquet(dir)
    // watermark sentinel: one far-future event flushes every open session
    val d = new java.io.File(dir)
    def parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
    val dataNames = parts.map(_.getName).toSet
    val dataMaxM = parts.map(_.lastModified()).max
    spark.range(1)
      .select(lit(-1L).as("event_id"),
        lit(1893456000000000000L).as("ts"), // 2030-01-01 in ns
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("append").parquet(dir)
    // FileStreamSource orders files by (mtime, path): on a coarse-mtime
    // filesystem the sentinel could tie with the data files and land in
    // an EARLY micro-batch, jumping the watermark past every 2020-era
    // session before its events arrive — pin it strictly last
    parts.filterNot(f => dataNames(f.getName))
      .foreach(f => f.setLastModified(dataMaxM + 60000L))

    // construct (and schema-probe) the stream OUTSIDE the timed region:
    // the probe's listing + footer read is setup cost, not sessionize
    // throughput
    val stream = graft.streaming.EventStreams.readEvents(spark, dir,
      Map("maxFilesPerTrigger" -> "4"))
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.sessionize(stream)
      .writeStream.format("memory").queryName("evb_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val got = spark.table("evb_out")
      .filter(col("user_id") >= 0).count()
    val want = users * ((perUser + 4L) / 5L)
    require(got == want, s"self-check failed: $got sessions, expected $want")
    val evps = (users * perUser / secs).toLong
    // scalastyle:off println
    println(s"""{"mode":"sessionize","events":${users * perUser},""" +
      s""""users":$users,"sessions":$got,"sec":$secs,"events_per_sec":$evps}""")
    spark.stop()
  }
}
