package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.TemporalOps.asofJoin]]: 5M left + 5M
  * right rows over 100k keys (50+50 rows per key — the dense-key shape
  * where a range-join formulation would bucket-explode), timed against
  * the range-join encoding of the same query at a size the latter can
  * still finish. Self-verifying: the two formulations must agree
  * exactly on matched pairs where both are total (right rows whose
  * match exists), and the asof output must carry every right row.
  * Usage: runMain graft.AsofBench [rowsPerSide]
  */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val keys = math.max(1L, n / 50L)

    // deterministic synthetic events: ts spread over ~14 hours on a
    // second grid, so keys share instants and ties occur
    def mk(rows: Long, salt: Long) =
      spark.range(0L, rows).toDF("id")
        .select((col("id") + salt * 1000000000L).as("id"),
          pmod(xxhash64(col("id"), lit(salt)), lit(keys)).as("k"),
          timestamp_seconds(
            pmod(xxhash64(col("id"), lit(salt + 1)), lit(50000L))).as("t"))
        .localCheckpoint()
    val l = mk(n, 1L)
    val r = mk(n, 2L)

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }

    val asofCount = time("asof_5m_x_5m") {
      graft.ops.TemporalOps.asofJoin(
          l.select(col("k"), col("id").as("lid"), col("t").as("lt")),
          r.select(col("k"), col("id").as("rid"), col("t").as("rt")),
          "k", "lt", "rt", "lid")
        .count()
    }
    require(asofCount == n, s"asof must keep every right row: $asofCount != $n")

    // verification at a size the range join can finish: the max-(ts, id)
    // row among each right row's range-join candidates IS the asof match
    val vn = math.min(n, 200000L)
    val lv = l.filter(col("id") < 1000000000L + vn)
      .select(col("k"), col("id").as("lid"), col("t").as("lt"))
    val rv = r.filter(col("id") < 2000000000L + vn)
      .select(col("k"), col("id").as("rid"), col("t").as("rt"))
    val viaRange = time(s"range_join_form_${vn}") {
      rv.join(lv, Seq("k"), "inner")
        .filter(col("lt") <= col("rt"))
        .groupBy(col("rid"))
        .agg(max_by(col("lid"), struct(col("lt"), col("lid"))).as("lid"))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    val viaAsof = graft.ops.TemporalOps.asofJoin(lv, rv, "k", "lt", "rt", "lid")
      .filter(col("matched").isNotNull)
      .select(col("rid"), col("matched.lid"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    require(viaAsof == viaRange,
      s"asof != range-join max: ${viaAsof.size} vs ${viaRange.size}")
    println(s"""{"verified_rows":${viaAsof.size},"agree":true}""")

    // ---- the SERVING shape at the same scale: close the 5M-row left
    // history into a validity-interval snapshot once (the batch-side
    // cost a deployment pays per dimension close), then join the full
    // 5M-row right side against it statelessly — the plan a stream
    // runs per micro-batch. Self-verifying: row count preserved and
    // (on the verification slice) matches identical to asofJoin's.
    val snap = time("asof_snapshot_build_5m") {
      val s = graft.ops.TemporalOps.asofSnapshot(
        l.select(col("k"), col("id").as("lid"), col("t").as("lt")),
        "k", "lt", "lid").localCheckpoint()
      s.count(); s
    }
    val servedCount = time("asof_stream_static_5m") {
      graft.ops.TemporalOps.asofJoinStreamStatic(
          r.select(col("k"), col("id").as("rid"), col("t").as("rt")),
          snap, "k", "rt")
        .count()
    }
    require(servedCount == n,
      s"stream-static asof must keep every right row: $servedCount != $n")
    val viaStatic = graft.ops.TemporalOps.asofJoinStreamStatic(rv,
        graft.ops.TemporalOps.asofSnapshot(lv, "k", "lt", "lid"), "k", "rt")
      .filter(col("matched").isNotNull)
      .select(col("rid"), col("matched.lid"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    require(viaStatic == viaRange,
      s"stream-static != range-join max: ${viaStatic.size} vs ${viaRange.size}")
    println(s"""{"static_verified_rows":${viaStatic.size},"agree":true}""")
    spark.stop()
  }
}
