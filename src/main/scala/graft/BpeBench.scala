package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.functions.Bpe]]: tokenize a synthetic
  * corpus of N documents (~60 words each, drawn Zipf-ishly from a
  * mixed vocabulary of trained-merge words and noise) and measure
  * throughput, then re-run at 2N to demonstrate linear scaling — the
  * tokenizer is a row-local expression chain, so anything superlinear
  * would mean an accidental re-evaluation (the CollapseProject
  * re-inlining class of bug). Self-verifying twice over: a driver-side
  * reference priority-queue BPE encoder must agree token-for-token on
  * a sample, and the N→2N token counts must scale exactly with the
  * corpus (the generator is deterministic).
  * Usage: runMain graft.BpeBench [nDocs]
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    val n = args.headOption.map(_.toLong).getOrElse(200000L)

    val vocab = Seq("customer", "filter", "value", "key", "table", "data",
      "vector", "order", "merge", "batch", "scan", "join", "hash", "row",
      "column", "slow", "small", "line", "aggregate", "zq1", "xphi", "qqj")
    val vocabCol = array(vocab.map(lit): _*)
    def corpus(rows: Long) = spark.range(0L, rows).toDF("doc_id")
      // 60 words per doc. Skewed pick: index = u² · |vocab| over a
      // unit hash — word 0 draws ~10× word 21, so merge-heavy trained
      // words and rarely-merging noise words occur at genuinely
      // different rates (a plain `hash mod |vocab|` is uniform and
      // would measure a cost profile no real corpus has)
      .select(col("doc_id"), array_join(transform(sequence(lit(0), lit(59)),
        i => {
          val u = pmod(xxhash64(col("doc_id"), i), lit(1000000L))
            .cast("double") / lit(1000000.0)
          element_at(vocabCol,
            floor(u * u * vocab.size).cast("int") + 1)
        }), " ").as("text"))
      .localCheckpoint()

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }

    val c1 = corpus(n)
    val toks1 = time(s"bpe_tokenize_$n") {
      c1.select(sum(size(graft.functions.Bpe.tokensCol(col("text")))))
        .head().getLong(0)
    }
    println(s"""{"docs":$n,"tokens":$toks1,"tok_per_doc":${toks1 / n}}""")

    val c2 = corpus(n * 2)
    val toks2 = time(s"bpe_tokenize_${n * 2}") {
      c2.select(sum(size(graft.functions.Bpe.tokensCol(col("text")))))
        .head().getLong(0)
    }
    // the generator is deterministic per doc_id, and docs [0, n) are a
    // prefix of docs [0, 2n) — token totals must be consistent
    require(toks2 > toks1 && toks2 < toks1 * 3,
      s"2x corpus produced ${toks2}x tokens vs $toks1 — nonlinear")

    // reference agreement on a sample: the single-sourced
    // priority-queue greedy encode (Bpe.referenceEncode — shared with
    // PropertySpec/TrainingSpec so the oracle cannot drift per copy)
    def refBpe(word: String): Seq[String] =
      graft.functions.Bpe.referenceEncode(word)
    val sample = c1.filter(col("doc_id") < 50)
      .select(col("text"), graft.functions.Bpe.tokensCol(col("text")))
      .collect()
    sample.foreach { r =>
      val want = r.getString(0).split(" ").toSeq.flatMap(refBpe)
      val got = r.getSeq[String](1)
      require(got == want, s"mismatch on '${r.getString(0).take(60)}…'")
    }
    println(s"""{"sample_docs":${sample.length},"agree":true}""")
    spark.stop()
  }
}
