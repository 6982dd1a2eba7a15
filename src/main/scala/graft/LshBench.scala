package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.LshStore]]: the incremental-dedup claim
  * is that deduplicating a new batch costs ~the batch, not the corpus.
  * Build the band index over 200k synthetic docs (ingested in 4 batches
  * so the fold path itself is what's measured), then compare finding a
  * fresh 5k batch's near-dups the two possible ways:
  * incrementally ([[graft.ops.LshStore.candidates]] against the stored
  * index) vs re-banding history+batch from scratch (what a storeless
  * pipeline must do every snapshot). Self-verifying twice over: the
  * fold's accumulated pair log must equal the one-shot banding over the
  * same corpus (both directions of exceptAll empty, computed
  * distributed), and the incremental batch answer must equal the
  * re-band answer restricted to pairs touching the batch.
  * Usage: runMain graft.LshBench [nDocs] [batchDocs]
  */
object LshBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import graft.ops.{LshStore, TextOps}
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val bn = args.drop(1).headOption.map(_.toLong).getOrElse(5000L)

    // synthetic near-dup corpus: ids 2k and 2k+1 share a 20-token base
    // drawn from a 5k-word vocab; the odd twin mutates one token, so
    // ~Jaccard 0.9 pairs exist throughout and banding has real work
    def docsOf(from: Long, until: Long) =
      spark.range(from, until).toDF("doc_id")
        .withColumn("base", (col("doc_id") - pmod(col("doc_id"), lit(2L))))
        .withColumn("toks", transform(sequence(lit(0), lit(19)),
          i => concat(lit("w"), pmod(xxhash64(col("base"), i), lit(5000L)))))
        .withColumn("toks", when(pmod(col("doc_id"), lit(2L)) === 1L,
            concat(slice(col("toks"), 1, 19), array(concat(lit("m"),
              col("doc_id"))))).otherwise(col("toks")))
        .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
        .localCheckpoint()

    val corpus = docsOf(0L, n)
    val store = java.nio.file.Files.createTempDirectory("graft_lshbench")
      .toString + "/lsh"
    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }

    time(s"ingest_${n}_in_4_batches") {
      (0 until 4).foreach { b =>
        LshStore.ingestBatch(spark, store,
          corpus.filter(pmod(col("doc_id"), lit(4L)) === b.toLong),
          "doc_id", "text", batchId = Some(b.toLong))
      }
    }
    // fold == one-shot over the whole corpus, proven distributed
    val log = LshStore.pairLog(spark, store).select("a", "b")
    val oneShot = TextOps.minhashCandidates(corpus, "doc_id", "text")
    val diff = log.exceptAll(oneShot).count() + oneShot.exceptAll(log).count()
    require(diff == 0, s"fold != one-shot: $diff differing pairs")
    println(s"""{"fold_pairs":${log.count()},"agree":true}""")

    // the measured question: a fresh batch arrives — incremental probe
    // vs re-band everything
    val batch = docsOf(n, n + bn)
    val st = LshStore.load(spark, store)
    val inc = time(s"incremental_batch_$bn") {
      LshStore.candidates(st, batch, "doc_id", "text").count()
    }
    val full = time(s"reband_history_plus_batch") {
      TextOps.minhashCandidates(corpus.unionByName(batch), "doc_id", "text")
        .count()
    }
    // incremental answer == re-band answer restricted to batch-touching
    // pairs (history-internal pairs were already in the log)
    val incPairs = LshStore.candidates(st, batch, "doc_id", "text")
    val rebandBatchPairs = TextOps
      .minhashCandidates(corpus.unionByName(batch), "doc_id", "text")
      .filter(col("a") >= n || col("b") >= n)
    val d2 = incPairs.exceptAll(rebandBatchPairs).count() +
      rebandBatchPairs.exceptAll(incPairs).count()
    require(d2 == 0, s"incremental != re-band restriction: $d2 differ")
    println(s"""{"batch_pairs":$inc,"reband_pairs":$full,"agree":true}""")
    spark.stop()
  }
}
