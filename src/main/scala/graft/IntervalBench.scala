package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalOps

/** Where the chunked point-in-interval join earns its shape: HOT KEYS.
  * Spark plans the naive non-equi form as an equi sort-merge join on
  * the key with the BETWEEN as a residual — correct, and at moderate
  * density its codegen'd residual loop is fast. But all of one key's
  * work lands in ONE task: a key with P points and S intervals costs
  * P·S residual checks single-threaded, and the per-key interval
  * buffer grows with S. This probe builds 4 keys × 500k points × 5000
  * sessions (2.5·10⁹ candidate checks per key, 10¹⁰ total, at most 4
  * tasks busy); the chunked form re-keys the SAME join by
  * (key, hour-chunk) — 10k chunks per key, every core busy, candidate
  * checks only among per-chunk co-occupants (~10⁵ per key). At 100 TB
  * the hot key IS the workload (a popular user, a default tenant, a
  * null-ish sentinel), and no AQE skew split can save the naive plan:
  * skew-join splitting cannot split one join KEY.
  * Self-verifying: both forms must count the same containments, and
  * that count must match the per-construction expectation.
  * Usage: runMain graft.IntervalBench [ptsPerKey]
  */
object IntervalBench {
  def main(args: Array[String]): Unit = {
    val ptsPerKey = args.headOption.map(_.toLong).getOrElse(500000L)
    val nKeys = 4L
    val sessions = 5000L
    val inside = ptsPerKey * 4 / 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    // per key: `sessions` disjoint hour-long sessions (every other
    // hour), ptsPerKey points — 80% inside (i%sessions picks the
    // session, minute (i*7)%60 the instant), 20% in the gaps
    val base = lit("2024-01-01 00:00:00").cast("timestamp")
    val ivs = spark.range(0L, nKeys).select(col("id").as("k"))
      .withColumn("s", explode(sequence(lit(0L), lit(sessions - 1))))
      .select(col("k"),
        (unix_micros(base) + col("s") * 7200L * 1000000L).as("su"))
      .select(col("k"), timestamp_micros(col("su")).as("st"),
        timestamp_micros(col("su") + 3600L * 1000000L).as("en"))
      .repartition(32).localCheckpoint()
    val pts = spark.range(0L, nKeys * ptsPerKey)
      .select((col("id") % nKeys).as("k"),
        expr(s"id div $nKeys").as("i"))
      .select(col("k"), col("i").as("pid"),
        timestamp_micros(unix_micros(base)
          + (col("i") % sessions) * 7200L * 1000000L
          + when(col("i") < inside, (col("i") * 7L % 60L) * 60L * 1000000L)
            .otherwise(5400L * 1000000L)).as("t"))
      .localCheckpoint()

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }
    val chunked = time(s"chunked_hotkeys_$ptsPerKey") {
      TemporalOps.pointInIntervalJoin(pts, ivs, "k", "t", "st", "en",
        chunkSeconds = 3600).count()
    }
    require(chunked == nKeys * inside,
      s"expected ${nKeys * inside} containments, got $chunked")
    val naive = time(s"naive_hotkeys_$ptsPerKey") {
      pts.alias("p").join(ivs.alias("i"),
          col("p.k") === col("i.k") &&
            col("p.t") >= col("i.st") && col("p.t") <= col("i.en"))
        .count()
    }
    require(naive == chunked, s"disagreement: naive=$naive chunked=$chunked")
    println(s"""{"matches":$chunked,"agree":true}""")

    // ---- skewed span mix: does the AUTO width hold up when spans are
    // not uniform? 95% 1-hour sessions + 5% 72-hour sessions per key.
    // The median (1 h) governs: auto snaps to 4096 s, the long tail
    // explodes by span/chunk ≈ 64 chunks each — bounded — where a
    // span-MEAN tuner would have been dragged to ~4.5 h and a naive
    // min-span tuner to the narrowest interval. Self-verifying: the
    // auto-chunked count must equal the naive non-equi join's.
    val skewPts = ptsPerKey / 5
    val longEvery = 20L
    val sIvs = spark.range(0L, nKeys).select(col("id").as("k"))
      .withColumn("s", explode(sequence(lit(0L), lit(sessions - 1))))
      .select(col("k"),
        (unix_micros(base) + col("s") * 7200L * 1000000L).as("su"),
        when(col("s") % longEvery === 0L, 72L * 3600L)
          .otherwise(3600L).as("spanSec"))
      .select(col("k"), timestamp_micros(col("su")).as("st"),
        timestamp_micros(col("su") + col("spanSec") * 1000000L).as("en"))
      .repartition(32).localCheckpoint()
    val sPts = spark.range(0L, nKeys * skewPts)
      .select((col("id") % nKeys).as("k"), expr(s"id div $nKeys").as("i"))
      .select(col("k"), col("i").as("pid"),
        timestamp_micros(unix_micros(base)
          + (col("i") % sessions) * 7200L * 1000000L
          + (col("i") * 7L % 60L) * 60L * 1000000L).as("t"))
      .localCheckpoint()
    val autoWidth = graft.ops.TemporalOps.autoChunkSeconds(sIvs, "st", "en")
    println(s"""{"auto_chunk_seconds":$autoWidth}""")
    val autoCount = time(s"chunked_auto_skewed_$skewPts") {
      TemporalOps.pointInIntervalJoin(sPts, sIvs, "k", "t", "st", "en")
        .count()
    }
    val naiveSkew = time(s"naive_skewed_$skewPts") {
      sPts.alias("p").join(sIvs.alias("i"),
          col("p.k") === col("i.k") &&
            col("p.t") >= col("i.st") && col("p.t") <= col("i.en"))
        .count()
    }
    require(autoCount == naiveSkew,
      s"disagreement: naive=$naiveSkew auto=$autoCount")
    println(s"""{"skew_matches":$autoCount,"agree":true}""")
    spark.stop()
  }
}
