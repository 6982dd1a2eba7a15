package graft

import org.apache.spark.sql.functions._

/** Retrieval-serving economics: build the bucketed postings index for
  * N synthetic documents, then compare BM25 served from the index
  * (reads only the query terms' buckets of a pre-tokenized table)
  * against the same query as a full corpus scan + tokenize
  * ([[graft.ops.TextOps.bm25]]). Self-verifying: the two answers must
  * be bit-identical — the store changes IO, never scores. The win is
  * IO- and compute-shaped (no per-query tokenization, ~|terms|/buckets
  * of the postings bytes), so it GROWS with corpus size while the
  * build cost is paid once.
  *
  * Usage: runMain graft.PostBench [nDocs] [buckets]
  */
object PostBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val buckets = args.lift(1).map(_.toInt).getOrElse(64)
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

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val terms = Seq("data", "query", "zq1")
    val dir = java.nio.file.Files.createTempDirectory("graft_postbench")
      .toString
    timed(s"build postings index n=$n buckets=$buckets") {
      graft.ops.PostingsStore.save(docs, "doc_id", "text", dir, buckets)
    }
    val st = graft.ops.PostingsStore.load(spark, dir)
    val served = timed("BM25 from index (terms' buckets only)") {
      graft.ops.PostingsStore.queryBm25(st, terms, topK = 20)
        .collect().map(_.toSeq).toSeq
    }
    val served2 = timed("BM25 from index, repeat (warm listing)") {
      graft.ops.PostingsStore.queryBm25(st, terms, topK = 20)
        .collect().map(_.toSeq).toSeq
    }
    val mem = timed("BM25 in-memory (full corpus scan + tokenize)") {
      graft.ops.TextOps.bm25(docs, "doc_id", "text", terms, topK = 20)
        .collect().map(_.toSeq).toSeq
    }
    require(served == mem && served2 == mem,
      "served BM25 diverged from the in-memory scorer")
    println(s"""{"docs":$n,"agree":true,"top":${served.length}}""")

    // append-growth economics: each append stacks a file set into every
    // bucket, so per-query file opens grow with batches-since-compact —
    // the cost the ingests watermark (needsCompact) exists to surface.
    // Grow the store by 8 batches, measure a query and the file count,
    // compact (the nudge said so), re-measure. The GATE is structural
    // (file count shrinks, answers identical); timings are the report.
    val gdir = java.nio.file.Files.createTempDirectory("graft_postb_g")
      .toString + "/p"
    val batchN = math.max(n / 16L, 1000L)
    graft.ops.PostingsStore.save(docs.filter(col("doc_id") < batchN),
      "doc_id", "text", gdir, buckets)
    (1 to 8).foreach { b =>
      graft.ops.PostingsStore.append(spark, gdir,
        docs.filter(col("doc_id") >= b * batchN &&
          col("doc_id") < (b + 1) * batchN),
        "doc_id", "text", Some(b.toLong))
    }
    require(graft.ops.PostingsStore.needsCompact(spark, gdir),
      "8 appends must trip the default nudge")
    def dataFiles(p: String): Int =
      graft.StoreUtil.dataFileNames(spark, s"$p/postings").size
    def q(p: String): Seq[Seq[Any]] = graft.ops.PostingsStore.queryBm25(
        graft.ops.PostingsStore.load(spark, p), terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    q(gdir) // warm listings
    val grownFiles = dataFiles(gdir)
    val grownAns = timed(s"BM25 after 8 appends ($grownFiles files)")(q(gdir))
    val cdir = java.nio.file.Files.createTempDirectory("graft_postb_c")
      .toString + "/p"
    timed("compact 8-append store") {
      graft.ops.PostingsStore.compact(spark, gdir, cdir)
    }
    require(!graft.ops.PostingsStore.needsCompact(spark, cdir),
      "compaction must reset the nudge")
    q(cdir) // warm listings
    val compactFiles = dataFiles(cdir)
    val compactAns =
      timed(s"BM25 after compact ($compactFiles files)")(q(cdir))
    require(compactFiles < grownFiles,
      s"compaction did not shrink the file set: $compactFiles vs $grownFiles")
    require(compactAns == grownAns, "compaction changed BM25 answers")
    println(s"""{"grown_files":$grownFiles,"compact_files":$compactFiles,""" +
      s""""agree":true}""")
    spark.stop()
  }
}
