package graft

import org.apache.spark.sql.functions._
import graft.ops.{ClusterOps, DupStore, ModelStore, PackOps, SampleOps}
import graft.queries.TrainingQueries

/** Scale probe for the pipe_pretrain COMPOSITION: each stage's cost is
  * benched alone (DupBench/BudgetBench/PackBench), but the composite's
  * scale claim — "nothing rescans history; the strip's evidence pass
  * scans the hash index once with the batch broadcast, so delivery cost
  * tracks the BATCH while the index grows" — had never been measured
  * end-to-end against a GROWING history. This bench drives the four
  * stages (stored-model quality gate → stored-index strip →
  * stored-mass budget sample → FFD pack) over one fixed batch, with
  * the dup index at 1× and then 10× history, and prints per-stage
  * walls: the probe pair is the claim in numbers. Self-verifying: the
  * grown history is vocabulary-disjoint from the batch (its windows
  * can never match), so every stage's OUTPUT must be identical at both
  * history sizes — the 10× index changes cost shape only, and the
  * require()s hold the bench to that.
  *
  * What grows and what must not: the probe's index-side scan is O(index)
  * with a broadcast semi-join against the batch's window hashes —
  * columnar scan + hash test, no shuffle of index rows — while window
  * materialization, span algebra, strip reassembly, sampling, and
  * packing are all O(batch). At 10× history the probe wall therefore
  * moves by the cheap scan term only; a super-linear move here means a
  * shuffle or a rescan crept into the evidence pass.
  * Usage: runMain graft.PipeBench [batchDocs] [histMult]
  */
object PipeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    val bn = args.headOption.map(_.toLong).getOrElse(100000L)
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    require(mult >= 2, s"histMult must be >= 2, got $mult")

    // DupBench's shared boilerplate corpus (ONE generator — see
    // DupBench.boilerplateDocs), decorated with the pipeline columns:
    // a 4-way source label and n_chars for the quality features.
    def docsOf(from: Long, until: Long) =
      DupBench.boilerplateDocs(spark, from, until)
        .withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(4L))))
        .withColumn("n_chars", length(col("text")).cast("long"))
    // vocabulary-disjoint filler history: "f"-prefixed tokens shared by
    // NOTHING in the batch, so growing the index with it cannot change
    // any answer — only the index-side scan size
    def fillerOf(from: Long, until: Long) =
      spark.range(from, until).toDF("doc_id")
        .withColumn("toks", transform(sequence(lit(0), lit(39)),
          i => concat(lit("f"), col("doc_id"), lit("x"), i)))
        .select(col("doc_id"), array_join(col("toks"), " ").as("text"))

    // corpus on parquet, as in production (same rationale as DupBench)
    val dir = java.nio.file.Files.createTempDirectory("graft_pipebench")
      .toString
    docsOf(bn, 2L * bn).write.parquet(s"$dir/batch")
    val batch = spark.read.parquet(s"$dir/batch")
    def timed[A](name: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"which":"$name","sec":$sec%.2f}""")
      (v, sec)
    }
    def time[A](name: String)(body: => A): A = timed(name)(body)._1

    // persisted artifacts the stages serve from, built once:
    // the quality model scores the SAME feature family the composite's
    // gate uses (x0 bias + centered counts); these weights keep ~every
    // boilerplate doc (p >= 1/2), so the gate pass is real scoring work
    // at full batch width, not an early filter
    val lrDir = s"$dir/lr"
    ModelStore.save(spark, Seq(("x0", 40000L), ("x1", 0L), ("x2", 0L),
      ("x3", 0L), ("x4", 0L)), lrDir)
    val model = ModelStore.load(spark, lrDir)
    val dupDir = s"$dir/dup"
    time(s"ingest_hist_1x_$bn") {
      (0 until 2).foreach { b =>
        DupStore.ingestBatch(spark, dupDir,
          docsOf(0L, bn).filter(pmod(col("doc_id"), lit(2L)) === b.toLong),
          "doc_id", "text", batchId = Some(b.toLong))
      }
    }
    import spark.implicits._
    val budgets = Seq(("s0", 10000000L), ("s1", 200000L), ("s2", 5000L),
      ("s3", 0L)).toDF("source", "budget_tok")

    def gateOf(b: org.apache.spark.sql.DataFrame) =
      b.select(col("doc_id"), col("text"))
        .join(TrainingQueries.lrFeaturesForTest(b)
          .filter(model.scoreFp >= lit(32768L)).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
    val wsTok = size(split(col("clean_text"), "\\s+"))

    // one full composite pass at a given history size; every stage
    // materializes through flatten so its wall is its own
    def pipeline(label: String) = {
      val st = DupStore.load(spark, dupDir)
      // warm the whole chain once: codegen + parquet footers, the
      // steady-state discipline every bench here follows
      val warmG = ClusterOps.flatten(gateOf(batch))
      ClusterOps.flatten(DupStore.probeStrip(st, warmG, "doc_id", "text"))
      val gated = time(s"gate_$label")(ClusterOps.flatten(gateOf(batch)))
      // the probe wall feeds a hard require below, so it is the MEDIAN
      // of three timed passes (Bench.scala's calib_sec discipline) — a
      // single measurement on a loaded or thermally-throttled host can
      // spuriously fail a healthy run; the median rejects one bad draw
      val probes = (1 to 3).map { i =>
        timed(s"probe_strip_${label}_r$i")(ClusterOps.flatten(
          DupStore.probeStrip(st, gated, "doc_id", "text")))
      }
      val stripped = probes.head._1
      val probeSec = probes.map(_._2).sorted.apply(1)
      val staged = ClusterOps.flatten(stripped
        .join(batch.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"),
          wsTok.cast("long").as("n_tok")))
      val statsDir = s"$dir/stats_$label"
      SampleOps.saveMixStats(SampleOps.tokenBucketStats(
        staged, "doc_id", "source", col("n_tok"), "pb1"), statsDir)
      val sampled = time(s"budget_sample_$label")(ClusterOps.flatten(
        SampleOps.tokenBudgetSampleWith(staged, "doc_id", "source",
          col("n_tok"), budgets, "pb1",
          SampleOps.loadMixStats(spark, statsDir))))
      val packed = time(s"pack_ffd_$label")(ClusterOps.flatten(
        PackOps.packFfd(sampled, "doc_id", col("n_tok"), ctxLen = 512,
          salt = "ep0")))
      (stripped, packed, probeSec)
    }

    val (strip1, pack1, probe1) = pipeline("hist1x")
    time(s"ingest_hist_grow_to_${mult}x") {
      (0 until 3).foreach { b =>
        val span = (mult - 1).toLong * bn
        DupStore.ingestBatch(spark, dupDir,
          fillerOf(2L * bn + b * span / 3, 2L * bn + (b + 1) * span / 3),
          "doc_id", "text", batchId = Some(10L + b))
      }
    }
    val (strip2, pack2, probe2) = pipeline(s"hist${mult}x")

    // disjoint filler must be answer-invariant at EVERY stage boundary:
    // the strip (the probed stage) and the delivered pack (the
    // composition's output) are checked distributed, both directions
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val d = a.exceptAll(b).count() + b.exceptAll(a).count()
      require(d == 0, s"$what diverged across history growth: $d rows")
    }
    same(strip1, strip2, "probeStrip output")
    same(pack1, pack2, "packed delivery")
    require(pack1.count() > 0, "fixture degenerated: nothing was packed")
    // the shape lock, scaled to the requested growth: a history RESCAN
    // moves the probe by ~mult×, while the legitimate index-scan term
    // adds a small per-mult increment (measured 1.27–1.45× for 10×
    // history at the 100k default, i.e. ~0.03–0.05 per extra history
    // unit — O(batch) terms dominate). A FIXED threshold would reject
    // healthy linear scan growth at large mult and wave a true rescan
    // through at small mult, so the bound is mult-relative: generous
    // 0.15/unit headroom, still far under rescan shape at every mult.
    require(probe2 < probe1 * (1.0 + 0.15 * mult),
      f"probe wall grew ${probe2 / probe1}%.2fx across ${mult}x history " +
        f"(bound ${1.0 + 0.15 * mult}%.2fx) — a rescan or shuffle crept " +
        "into the evidence pass")
    println(f"""{"batch_docs":$bn,"hist_mult":$mult,""" +
      f""""probe_ratio":${probe2 / probe1}%.2f,"agree":true}""")
    spark.stop()
  }
}
