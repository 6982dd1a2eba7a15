package graft

import org.apache.spark.sql.functions._
import graft.ops.{VectorOps, VectorStore}

/** PQ economics at scale: build BOTH persisted layouts — plain IVF
  * (raw vectors) and IVF+PQ (codes) — over N synthetic vectors, then
  * serve the same ANN query from each. The PQ win is CPU-shaped where
  * the IVF win is IO-shaped: both prune to nprobe cells, but the ADC
  * path scores each candidate with m integer lookups instead of a
  * dims-wide kernel, and never decodes the raw vector column at all.
  * Self-verifying: the served ADC answers must equal the in-memory
  * [[VectorOps.annIvfPq]] over the same centroids/codebook.
  * Usage: runMain graft.PqBench [n] [dims] [cells]
  */
object PqBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(64)
    val cells = args.lift(2).map(_.toInt).getOrElse(64)
    val m = 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    // CLUSTERED synthetic corpus — id → one of n/10 md5-derived group
    // centers plus scaled per-id noise, all deterministic. Uniform
    // random vectors are the degenerate ANN workload (distances
    // concentrate, every quantizer is equally blind, recall@10 deltas
    // are coin flips — measured: 0.113 vs 0.075 on noise alone); real
    // embedding corpora cluster, and ~k-sized tight groups put REAL
    // margins under the top-10 (a query's group-mates are its true
    // neighbors, everything else is far), which is the regime where
    // codebook quality is measurable at all — and where a TRAINED
    // codebook's entries, allocated to the occupied regions, separate
    // groups a first-N sample cannot.
    val groups = math.max(64L, n / 10L)
    def u(seed: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(seed, lit(":"), d)), 1, 8), 16, 10)
        .cast("double") / lit((1L << 32).toDouble) * 2.0 - 1.0
    // energy decay across dimensions (w_d = 1/(1 + d/8)): real
    // embedding spectra concentrate variance in leading dims; uniform
    // per-dim energy is the degenerate case where a first-N sample is
    // already a near-optimal codebook and training has nothing to move
    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (u(concat(lit("c"), pmod(col("id"), lit(groups))), d) +
          u(col("id").cast("string"), d) * lit(0.15)) /
          (lit(1.0) + d.cast("double") / lit(8.0)))
        .as("vec"))
    // pinned once: the builds, the sampled codebook, and BOTH Lloyd
    // rounds of the trained one re-read the corpus — without the
    // checkpoint each pass regenerates n·dims md5 components (two md5s
    // per element under the clustered formula) and the build walls
    // measure corpus synthesis, not store layout
    val corpus = vecs(spark.range(0L, n).toDF("id")).localCheckpoint()
    val cents = vecs(spark.range(0L, cells.toLong).toDF("id"))
      .select(col("id").as("cid"), col("vec").as("cvec"))
    // 32 queries x top-10 = 320 truth pairs: the 8-query meter moved by
    // whole points per borderline neighbor, too coarse to separate
    // codebooks
    val queries = vecs(spark.range(0L, 32L).toDF("id")).localCheckpoint()
    val cb = VectorOps.pqCodebook(corpus, m, codes = 16, dim = dims)
      .localCheckpoint()

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }
    val raw = java.nio.file.Files.createTempDirectory("graft_pqb_raw").toString
    val pq = java.nio.file.Files.createTempDirectory("graft_pqb_pq").toString
    time(s"build_ivf_raw_$n")(VectorStore.save(corpus, cents, raw))
    time(s"build_ivf_pq_$n")(
      VectorStore.savePq(corpus, cents, cb, pq, m, dims))
    val stRaw = VectorStore.load(spark, raw)
    val stPq = VectorStore.loadPq(spark, pq)
    // warm both serving paths once (footer reads, codegen)
    VectorStore.query(stRaw, queries, k = 10, nprobe = 4).collect()
    VectorStore.queryAdc(stPq, queries, k = 10, nprobe = 4).collect()
    val exact = time("serve_exact_cosine")(
      VectorStore.query(stRaw, queries, k = 10, nprobe = 4).collect())
    val adc = time("serve_pq_adc")(
      VectorStore.queryAdc(stPq, queries, k = 10, nprobe = 4).collect())
    require(exact.length == adc.length && adc.nonEmpty)

    // recall economics of the two-stage path: ground truth is the
    // EXACT integer-quantized-L2 top-10 within the probed cells
    // (queryRerank with a cell-wide shortlist — the metric the rerank
    // corrects toward); measure how much of it ADC's top-10 misses and
    // how much a c=40 shortlist recovers, at a cost bounded by c rows
    // per query. This is the knob's justification in numbers: recall
    // must be monotone ADC ≤ rerank(c=40) ≤ 1.0.
    // warm BOTH rerank plans (the c literal changes the plan, so each
    // pays its own codegen) — the ADC/exact paths above were warmed,
    // and a cold-vs-warm comparison would overstate the two-stage cost
    VectorStore.queryRerank(stPq, queries, k = 10, c = Int.MaxValue,
      nprobe = 4).collect()
    VectorStore.queryRerank(stPq, queries, k = 10, c = 40,
      nprobe = 4).collect()
    val truth = time("serve_exact_in_cells") {
      VectorStore.queryRerank(stPq, queries, k = 10, c = Int.MaxValue,
        nprobe = 4).collect()
    }
    val rr40 = time("serve_rerank_c40") {
      VectorStore.queryRerank(stPq, queries, k = 10, c = 40,
        nprobe = 4).collect()
    }
    def byQuery(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recall(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]) = {
      val per = want.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }
    val truthSets = byQuery(truth)
    val rAdc = recall(byQuery(adc), truthSets)
    val rRr = recall(byQuery(rr40), truthSets)
    require(rRr >= rAdc,
      f"rerank recall $rRr%.3f below ADC recall $rAdc%.3f")
    println(f"""{"recall_adc":$rAdc%.3f,"recall_rerank_c40":$rRr%.3f}""")

    // trained-codebook economics: two integer-exact Lloyd rounds over
    // the sampled entries (VectorOps.pqCodebookTrained), same store
    // layout, same serving path, same nprobe — recall against the SAME
    // cell-exhaustive truth is the training's value in one number, and
    // it must not regress below the training-free baseline (ties
    // allowed: one borderline neighbor still moves the 320-pair meter
    // by ~0.3 points).
    val cbT = VectorOps.pqCodebookTrained(corpus, m, codes = 16,
      dim = dims, iters = 2).localCheckpoint()
    val pqT = java.nio.file.Files
      .createTempDirectory("graft_pqb_pqt").toString
    time(s"build_ivf_pq_trained_$n")(
      VectorStore.savePq(corpus, cents, cbT, pqT, m, dims))
    val stPqT = VectorStore.loadPq(spark, pqT)
    VectorStore.queryAdc(stPqT, queries, k = 10, nprobe = 4).collect()
    val adcT = time("serve_pq_adc_trained")(
      VectorStore.queryAdc(stPqT, queries, k = 10, nprobe = 4).collect())
    val rAdcT = recall(byQuery(adcT), truthSets)
    // the no-regression REQUIRE holds only at the pinned default
    // config, where the claim is calibrated: Lloyd minimizes
    // quantization error (TrainingSpec pins THAT invariant), not
    // recall@10, and on arbitrary n/dims/cells even the 320-pair meter
    // can legitimately dip by a few borderline neighbors — a warning,
    // not a code defect
    if (args.isEmpty)
      require(rAdcT >= rAdc,
        f"trained-codebook recall $rAdcT%.3f regressed below the " +
          f"sampled baseline $rAdc%.3f at the pinned default config")
    else if (rAdcT < rAdc)
      // the config rides in the warning so a scraped line is actionable
      // without the invocation that produced it
      println(f"""{"warn":"trained recall below sampled at non-default config","sampled":$rAdc%.3f,"trained":$rAdcT%.3f,"n":$n,"dims":$dims,"cells":$cells,"m":$m}""")
    println(f"""{"recall_adc_sampled":$rAdc%.3f,"recall_adc_trained":$rAdcT%.3f}""")

    // verification slice: served ADC == in-memory composite
    val vn = math.min(n, 20000L)
    val slice = corpus.filter(col("id") < vn).localCheckpoint()
    val sliceDir = java.nio.file.Files
      .createTempDirectory("graft_pqb_v").toString
    VectorStore.savePq(slice, cents, cb, sliceDir, m, dims)
    val served = VectorStore.queryAdc(VectorStore.loadPq(spark, sliceDir),
        queries, k = 10, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val inMem = VectorOps.annIvfPq(queries, slice, cents, cb, m, dims,
        k = 10, nprobe = 4)
      .collect().map(_.toSeq).toSet
    require(served == inMem, s"served != in-memory: ${served.size} vs ${inMem.size}")
    println(s"""{"verified_rows":${served.size},"agree":true}""")
    spark.stop()
  }
}
