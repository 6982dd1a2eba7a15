package graft

import org.apache.spark.sql.functions._

/** Economics probe for [[graft.ops.LmStore]]: the store's claim is
  * that folding a new corpus batch into the persisted counts NEVER
  * reads history — so the fold cost tracks the batch while the
  * storeless alternative (retrain over history ∪ batch) tracks the
  * corpus. Measured by doubling history with the batch fixed; the
  * baseline is deliberately GENEROUS (it aggregates only the trigram
  * table where the fold writes all three plus parquet), so a flat fold
  * beating a growing retrain is a conservative win. Self-verifying:
  * scores against a store folded in batches equal a one-shot-trained
  * model bit for bit on a planted prefix.
  * Usage: runMain graft.LmBench [nHistoryDocs]
  */
object LmBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import graft.ops.{LmOps, LmStore}
    val n = args.headOption.map(_.toLong).getOrElse(800000L)

    val vocab = Seq("customer", "filter", "value", "key", "table", "data",
      "vector", "order", "merge", "batch", "scan", "join", "hash", "row",
      "column", "slow", "small", "line", "aggregate", "window", "fast")
    val vocabCol = array(vocab.map(lit): _*)
    def corpus(lo: Long, hi: Long) = spark.range(lo, hi).toDF("doc_id")
      .select(col("doc_id"), array_join(transform(sequence(lit(0), lit(59)),
        i => {
          val u = pmod(xxhash64(col("doc_id"), i), lit(1000000L))
            .cast("double") / lit(1000000.0)
          element_at(vocabCol, floor(u * u * vocab.size).cast("int") + 1)
        }), " ").as("text"))
      .localCheckpoint()

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }

    // the fixed incoming batch (ids disjoint from any history size)
    val batch = corpus(10000000L, 10010000L)
    val tmp = sys.props("java.io.tmpdir") +
      s"/graft_lmbench_p${ProcessHandle.current().pid()}"
    // warm BOTH code paths untimed — cold-vs-warm differs 3-10× here
    // (the graft.Bench warmup rationale), which otherwise drowns the
    // history-scaling signal this probe exists to measure
    LmStore.ingestBatch(spark, s"$tmp/warm", corpus(0L, 20000L), "text",
      Some(0L))
    LmStore.ingestBatch(spark, s"$tmp/warm", batch, "text", Some(1L))
    LmOps.trainTrigram(corpus(0L, 20000L), "text").count()
    var foldSecs = Seq.empty[Double]
    for (nn <- Seq(n, 2L * n)) {
      val hist = corpus(0L, nn)
      val store = s"$tmp/lm_$nn"
      time(s"store_build_$nn") {
        LmStore.ingestBatch(spark, store, hist, "text", Some(0L))
      }
      val t0 = System.nanoTime()
      LmStore.ingestBatch(spark, store, batch, "text", Some(1L))
      val foldSec = (System.nanoTime() - t0) / 1e9
      foldSecs :+= foldSec
      println(f"""{"which":"store_fold_10k_into_$nn","sec":$foldSec%.2f}""")
      time(s"retrain_trigram_${nn}_plus_10k") {
        LmOps.trainTrigram(hist.unionByName(batch), "text").count()
      }
    }
    // the claim in one number: doubling history must not double the fold
    require(foldSecs(1) <= foldSecs(0) * 1.7 + 2.0,
      s"fold cost grew with HISTORY (${foldSecs.mkString(", ")}) — " +
        "the no-history-read contract broke")

    // self-verification at a small size: 3-way folded store scores ==
    // one-shot-trained scores, bit for bit
    val small = corpus(0L, 5000L)
    val vstore = s"$tmp/lm_verify"
    (0 until 3).foreach { m =>
      LmStore.ingestBatch(spark, vstore,
        small.filter(col("doc_id") % 3 === m), "text", Some(m.toLong))
    }
    val st = LmStore.load(spark, vstore)
    def scores(u: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame,
        t: org.apache.spark.sql.DataFrame) =
      LmOps.scoreTrigram(small.limit(500), "doc_id", "text", u, b, t,
          broadcastCounts = true)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val grown = scores(st.uni, st.bi, st.tri)
    val one = scores(LmOps.trainUnigram(small, "text"),
      LmOps.trainBigram(small, "text"), LmOps.trainTrigram(small, "text"))
    require(grown == one && grown.nonEmpty,
      "folded-store scores diverged from the one-shot model")
    println(s"""{"verified_docs":${grown.size},"agree":true}""")

    // maintenance economics: load() re-aggregates every ingest's rows,
    // so load cost grows with batches-since-compaction — the one store
    // cost that sits on the scoring hot path. Fold 12 batches, measure
    // a load+aggregate, compact (needsCompact said so), measure again:
    // the compacted load must not be slower, and the nudge must reset.
    val mstore = s"$tmp/lm_maint"
    (0 until 12).foreach { m =>
      LmStore.ingestBatch(spark, mstore,
        corpus(m * 50000L, (m + 1) * 50000L), "text", Some(m.toLong))
    }
    def loadCost(p: String): Double = {
      val t0 = System.nanoTime()
      val s = LmStore.load(spark, p)
      s.uni.count(); s.bi.count(); s.tri.count()
      (System.nanoTime() - t0) / 1e9
    }
    loadCost(mstore) // warm listings
    val grownLoad = time("load_after_12_ingests")(loadCost(mstore))
    require(LmStore.needsCompact(spark, mstore),
      "12 uncompacted ingests must trip the default nudge")
    time("compact_12_ingests") {
      LmStore.compact(spark, mstore, s"$tmp/lm_maint_c")
    }
    require(!LmStore.needsCompact(spark, s"$tmp/lm_maint_c"),
      "compaction must reset the nudge")
    loadCost(s"$tmp/lm_maint_c")
    val compactLoad = time("load_after_compact")(loadCost(s"$tmp/lm_maint_c"))
    // the payoff is asserted STRUCTURALLY (fewer parquet files per
    // count table — what load cost is a function of), never on wall
    // clock: a contended host can make the compacted measurement slow
    // without compaction having failed. The timings above are the
    // REPORT; the file counts are the GATE (the LshStoreSpec rule).
    val dataFiles = (p: String, t: String) =>
      graft.StoreUtil.dataFileNames(spark, s"$p/$t").size
    Seq("uni", "bi", "tri").foreach { t =>
      require(dataFiles(s"$tmp/lm_maint_c", t) < dataFiles(mstore, t),
        s"compaction did not shrink the $t file set: " +
          s"${dataFiles(s"$tmp/lm_maint_c", t)} vs ${dataFiles(mstore, t)}")
    }
    println(s"""{"maint_nudge":true,"grown_load_sec":$grownLoad,""" +
      s""""compact_load_sec":$compactLoad,"agree":true}""")

    // drift-meter economics (the BpeBench bpe_drift_fold twin): the
    // lm_drift meter scores its BATCH under the served model — no
    // history input exists in its shape — so cost must track batch
    // rows, not corpus/history size. Score 1x and 2x batches against
    // the SAME loaded store and require subquadratic growth (generous
    // slack: single wall-clock samples on a shared host).
    val mst = LmStore.load(spark, s"$tmp/lm_maint_c")
    def driftCost(docs: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      LmOps.scoreTrigram(docs, "doc_id", "text", mst.uni, mst.bi, mst.tri,
          broadcastCounts = true)
        .agg(sum(col("cost_micronats"))).head.getLong(0)
      (System.nanoTime() - t0) / 1e9
    }
    driftCost(batch) // warm
    val d1 = driftCost(batch)
    val d2 = driftCost(corpus(10000000L, 10020000L))
    println(f"""{"which":"lm_drift_fold","rows_1x":10000,"sec_1x":$d1%.2f,"sec_2x":$d2%.2f}""")
    require(d2 < d1 * 4.0 + 5.0,
      f"2x batch cost ${d2 / d1}%.1fx — the drift meter is superlinear " +
        "in its batch")
    spark.stop()
  }
}
