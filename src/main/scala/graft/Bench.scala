package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    // a misspelled query name must fail loudly, not print a success-shaped
    // zero-query JSON that a regression script would record as a pass
    val unknown = args.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")}; " +
        s"valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    // The noop sink forces full evaluation of every output column; a bare
    // count() would let Catalyst prune projections and eliminate sorts, so
    // scrub/codec/sort queries would time an empty-schema row count.
    def run(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Host-speed calibration rider: ONE fixed CPU-bound kernel
    // (CcBench's OWN windowed-graph builder at 200k nodes, warmed at
    // 20k — shared definition, so the two can never measure different
    // kernels) timed in-session and emitted beside the results, so
    // cross-round BENCH artifacts self-normalize against host drift
    // without out-of-band calibration runs. Full-suite runs only: the
    // single-query isolation mode exists for fast regression chasing
    // and must not pay a fixed multi-second CC job per invocation
    // (its numbers are compared within one session, not across hosts).
    val calibSec: Option[Double] =
      if (args.nonEmpty) None
      else Some {
        graft.ops.ClusterOps.connectedComponents(
          CcBench.windowedEdges(spark, 0L, 20000L),
          spark.range(0L, 20000L).toDF("id")).count()
        // median of three timed runs after the warm run: a one-shot
        // multi-second measurement carries JIT/GC jitter that makes the
        // normalizer itself noisy across rounds
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.ops.ClusterOps.connectedComponents(
            CcBench.windowedEdges(spark, 0L, 200000L),
            spark.range(0L, 200000L).toDF("id")).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        runs(1)
      }
    // Warmup pass: pays SparkSession/codegen/parquet-footer startup AND the
    // one-time ingest-style builds (tree labeling, fixture ingest) outside
    // the timed region — the reference likewise builds its DB before
    // serving, so steady-state query latency is the comparable number.
    // optional args: query names to run in isolation (suite contention
    // distorts single-query timings ±40% — regressions are chased here)
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    qs0.foreach { case (_, fn) =>
      try run(fn) catch { case _: Throwable => () }
    }
    val results = qs0.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn); true }
               catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // a failed query reports -1, never a fake wall-clock entry
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.filter(_._3).map(_._2).sum
    // calib_sec rides at the TAIL of the line, after the queries map and
    // beside "errors"/"sf": the driver's artifact keeps the END of long
    // lines (BENCH_r12.json preserved errors/sf but dropped the
    // early-placed calib_sec), so fields meant to survive truncation must
    // sit after the per-gate map. Single-query runs OMIT the field
    // entirely — an in-band sentinel like -1 would flow through a
    // normalizer's division as silent garbage, where a missing key fails
    // unmistakably
    val calibField =
      calibSec.map(c => s""","calib_sec":$c""").getOrElse("")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors$calibField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
