package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.DupStore]]: the incremental
  * substring-dedup claim is that cleaning a new snapshot costs ~the
  * batch, not the corpus. Build the window-hash index over 100k
  * synthetic docs (ingested in 4 batches so the fold path itself is
  * what's measured), then find a fresh 2.5k batch's duplicated spans
  * the two possible ways: incrementally
  * ([[graft.ops.DupStore.probeSpans]] against the stored index) vs
  * re-running [[graft.ops.TextOps.duplicatedSpans]] over history+batch
  * (what a storeless pipeline pays every snapshot). Self-verifying: the
  * incremental spans must equal the one-shot spans restricted to batch
  * docs, computed distributed (both exceptAll directions empty).
  * A compacted store is probed too — answers must match and the row
  * count must drop to one per distinct hash.
  * Usage: runMain graft.DupBench [nDocs] [batchDocs]
  */
object DupBench {
  /** The ONE synthetic boilerplate corpus the dedup benches share
    * (PipeBench decorates it with pipeline columns): every doc is 40
    * tokens — 10 unique lead tokens, then one of 64 shared 10-token
    * boilerplate blocks (cross-doc duplication the store must find),
    * then 20 more unique tokens. Duplicated spans therefore exist
    * throughout, at a known extent, across every batch boundary; a
    * change to the block scheme changes every consumer's regime
    * together instead of silently diverging per-bench copies.
    */
  private[graft] def boilerplateDocs(
      spark: org.apache.spark.sql.SparkSession, from: Long,
      until: Long): org.apache.spark.sql.DataFrame =
    spark.range(from, until).toDF("doc_id")
      .withColumn("blk", pmod(xxhash64(col("doc_id")), lit(64L)))
      .withColumn("toks", concat(
        transform(sequence(lit(0), lit(9)),
          i => concat(lit("u"), col("doc_id"), lit("x"), i)),
        transform(sequence(lit(0), lit(9)),
          i => concat(lit("b"), col("blk"), lit("x"), i)),
        transform(sequence(lit(10), lit(29)),
          i => concat(lit("u"), col("doc_id"), lit("x"), i))))
      .select(col("doc_id"), array_join(col("toks"), " ").as("text"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import graft.ops.{DupStore, TextOps}
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val bn = args.drop(1).headOption.map(_.toLong).getOrElse(2500L)

    def docsOf(from: Long, until: Long) =
      boilerplateDocs(spark, from, until).localCheckpoint()

    // the corpus lives on parquet, as in production — the re-run baseline
    // must pay the real read+tokenize+hash+shuffle over history, exactly
    // what the store exists to avoid (an in-memory corpus would hand the
    // baseline a free ride the 100 TB case never gets)
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_dupbench")
      .toString
    docsOf(0L, n).write.parquet(s"$corpusDir/corpus")
    val corpus = spark.read.parquet(s"$corpusDir/corpus")
    val store = corpusDir + "/dup"
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }

    time(s"ingest_${n}_in_4_batches") {
      (0 until 4).foreach { b =>
        DupStore.ingestBatch(spark, store,
          corpus.filter(pmod(col("doc_id"), lit(4L)) === b.toLong),
          "doc_id", "text", batchId = Some(b.toLong))
      }
    }

    val batch = docsOf(n, n + bn)
    val st = DupStore.load(spark, store)
    // warm both paths once (codegen, parquet footers, JIT) — steady-state
    // latency is the comparable number, same rationale as graft.Bench
    DupStore.probeSpans(st, batch, "doc_id", "text").count()
    TextOps.duplicatedSpans(corpus.unionByName(batch), "doc_id", "text",
      win = 4).filter(col("doc_id") >= n).count()
    val inc = time(s"incremental_probe_$bn") {
      DupStore.probeSpans(st, batch, "doc_id", "text").count()
    }
    val full = time("rerun_history_plus_batch") {
      TextOps.duplicatedSpans(corpus.unionByName(batch), "doc_id", "text",
        win = 4).filter(col("doc_id") >= n).count()
    }
    // incremental == one-shot restricted to batch docs, distributed
    val incSpans = DupStore.probeSpans(st, batch, "doc_id", "text")
    val oneShot = TextOps.duplicatedSpans(corpus.unionByName(batch),
      "doc_id", "text", win = 4).filter(col("doc_id") >= n)
    val diff = incSpans.exceptAll(oneShot).count() +
      oneShot.exceptAll(incSpans).count()
    require(diff == 0, s"incremental != one-shot restriction: $diff differ")
    require(inc == full && inc > 0, s"span counts diverge: $inc vs $full")
    println(s"""{"batch_spans":$inc,"agree":true}""")

    // compaction: 4 ingests of a 64-block boilerplate corpus guarantee
    // repeated hashes across row-sets; the compacted store must answer
    // identically from one row per distinct hash
    val cdir = java.nio.file.Files.createTempDirectory("graft_dupbench_c")
      .toString + "/dup"
    time("compact") { DupStore.compact(spark, store, cdir) }
    val cst = DupStore.load(spark, cdir)
    val rowsBefore = st.hashes.count()
    val rowsAfter = cst.hashes.count()
    require(rowsAfter == st.hashes.select("h").distinct().count(),
      "compact left duplicate hash rows")
    DupStore.probeSpans(cst, batch, "doc_id", "text").count() // warm
    val cInc = time(s"compacted_probe_$bn") {
      DupStore.probeSpans(cst, batch, "doc_id", "text").count()
    }
    require(cInc == inc, s"compacted probe diverged: $cInc vs $inc")
    println(s"""{"rows_before":$rowsBefore,"rows_after":$rowsAfter,"agree":true}""")
    spark.stop()
  }
}
