package graft

import org.apache.spark.sql.functions._

/** Hybrid-retrieval serving economics: build the persisted postings
  * index AND the IVF vector store for N synthetic documents with
  * aligned embeddings, then compare the RRF hybrid SERVED from the two
  * indexes (terms' buckets of the postings table + the store's cell
  * layout) against the same fusion computed from corpus scans
  * ([[graft.ops.TextOps.bm25]] full tokenize + brute-force dense
  * top-k). Self-verifying: the two answers must be bit-identical —
  * both legs' store forms are defined as IO twins of the scan forms
  * and the fusion tail ([[graft.queries.TrainingQueries.hybridRrf]])
  * is shared verbatim. The lexical win grows with corpus size (no
  * per-query tokenization, ~|terms|/buckets of the postings bytes);
  * the dense leg at exact nprobe reads the same vector count but skips
  * re-deriving the layout, and drops below it as soon as the caller
  * trades nprobe for IO.
  *
  * Usage: runMain graft.HybridBench [nDocs] [dims]
  */
object HybridBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    // ~60-word docs over a mixed vocabulary, deterministic per doc id
    val vocab = Seq("data", "query", "table", "customer", "filter",
      "value", "key", "vector", "order", "merge", "batch", "scan",
      "join", "hash", "row", "column", "slow", "small", "line", "fast",
      "zq1", "xphi", "qqj", "group", "spark", "stream", "window")
    val vocabCol = array(vocab.map(lit): _*)
    val docs = spark.range(0L, n).toDF("doc_id")
      .select(col("doc_id"), array_join(transform(sequence(lit(0), lit(59)),
        i => element_at(vocabCol,
          pmod(xxhash64(col("doc_id"), i), lit(vocab.size.toLong))
            .cast("int") + 1)), " ").as("text"))
      .localCheckpoint()
    // deterministic float32 embeddings aligned 1:1 with doc ids:
    // coordinate j = (xxhash64(id, j) mod 2001 - 1000) / 1000
    val emb = spark.range(0L, n).toDF("id")
      .select(col("id"), transform(sequence(lit(0), lit(dims - 1)),
        j => ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L)
          .cast("double") / 1000.0d).cast("float")).as("vec"))
      .localCheckpoint()
    val cents = emb.filter(col("id") < 8)
      .select(col("id").as("cid"), col("vec").as("cvec"))
      .localCheckpoint()

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val terms = Seq("data", "query", "zq1")
    val base = java.nio.file.Files.createTempDirectory("graft_hybench")
      .toString
    timed(s"build postings index n=$n") {
      graft.ops.PostingsStore.save(docs, "doc_id", "text", s"$base/post")
    }
    timed(s"build IVF vector store n=$n dims=$dims") {
      graft.ops.VectorStore.save(emb, cents, s"$base/vec")
    }
    val pst = graft.ops.PostingsStore.load(spark, s"$base/post")
    val vst = graft.ops.VectorStore.load(spark, s"$base/vec")
    val q = emb.filter(col("id") === 0)

    def scanHybrid() = graft.queries.TrainingQueries.hybridRrf(
        graft.ops.TextOps.bm25(docs, "doc_id", "text", terms, topK = 20),
        graft.ops.VectorOps.topK(q, emb, k = 20))
      .collect().map(_.toSeq).toSeq
    def servedHybrid(nprobe: Int) = graft.queries.TrainingQueries.hybridRrf(
        graft.ops.PostingsStore.queryBm25(pst, terms, topK = 20),
        graft.ops.VectorStore.query(vst, q, k = 20, nprobe = nprobe))
      .collect().map(_.toSeq).toSeq

    // warm both paths once (codegen + file listings), then time
    servedHybrid(8); scanHybrid()
    val served = timed("hybrid from indexes (exact, nprobe=8)") {
      servedHybrid(8)
    }
    val servedNarrow = timed("hybrid from indexes (nprobe=2, pruned cells)") {
      servedHybrid(2)
    }
    val mem = timed("hybrid from corpus scans (tokenize + brute dense)") {
      scanHybrid()
    }
    require(served == mem,
      "served hybrid diverged from the scan-form fusion")
    // nprobe=2 is the IO-for-recall trade, not an equality claim — just
    // show it still returns a full page
    require(servedNarrow.size == mem.size, "pruned probe lost the page")
    println(s"""{"docs":$n,"agree":true,"top":${served.size}}""")
    spark.stop()
  }
}
