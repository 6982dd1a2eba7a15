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

    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (conv(substring(md5(concat(col("id"), lit(":"), d)), 1, 8),
          16, 10).cast("double") / lit((1L << 32).toDouble) * 2.0 - 1.0))
        .as("vec"))
    val corpus = vecs(spark.range(0L, n).toDF("id"))
    val cents = vecs(spark.range(0L, cells.toLong).toDF("id"))
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val queries = vecs(spark.range(0L, 8L).toDF("id")).localCheckpoint()
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
