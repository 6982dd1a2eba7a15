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

  /** Merge-count economics probe: train a ≥512-merge table on a
    * synthetic word-frequency frame and assert the per-merge cost is
    * FLAT — the property the every-16-merges re-checkpoint buys
    * ([[graft.functions.Bpe.RecheckpointEvery]]): without it iteration
    * i replays i `replace` projections and the second half of training
    * costs ~3× the first. Measured as t(k) vs t(k/2) on the identical
    * deterministic input (training is prefix-stable, so the difference
    * IS the second half). Also cross-checks the full k-merge table
    * against the driver-side reference trainer, rule for rule.
    */
  private def trainProbe(spark: org.apache.spark.sql.SparkSession,
      k: Int): Unit = {
    import graft.functions.Bpe
    // 2000 distinct md5-hex "words", Zipf-ish counts: hex text has
    // enormous adjacent-pair diversity (merging a pair mints a symbol
    // whose neighbors mint new pairs), so k merges never exhaust
    val wf = spark.range(0L, 2000L).toDF("id")
      .select(md5(col("id").cast("string")).as("w"),
        expr("10000 div (id + 1) + 1").as("c"))
      .localCheckpoint()
    def timed(m: Int): (Seq[(String, String)], Double) = {
      val t0 = System.nanoTime()
      val t = Bpe.train(wf, "w", "c", m)
      (t, (System.nanoTime() - t0) / 1e9)
    }
    val (half, tHalf) = timed(k / 2)
    val (full, tFull) = timed(k)
    val tSecond = tFull - tHalf
    println(f"""{"which":"bpe_train","merges":$k,"first_half_sec":$tHalf%.1f,"second_half_sec":$tSecond%.1f}""")
    require(full.take(k / 2) == half, "training is not prefix-stable")
    require(tSecond <= tHalf * 2.0 + 5.0,
      f"second-half merges cost $tSecond%.1f s vs first-half $tHalf%.1f s " +
        "— per-merge cost is growing (re-checkpoint cadence broken?)")
    val local = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(full == Bpe.referenceTrain(local, k),
      "distributed training diverged from the reference trainer")
    println(s"""{"which":"bpe_train","reference_agree":true}""")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    if (args.headOption.contains("train")) {
      trainProbe(spark, args.lift(1).map(_.toInt).getOrElse(512))
      spark.stop()
      return
    }
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

    // drift-meter economics (the VecBench driftStats probe's text
    // twin): BpeStore.driftStats reads ONLY its batch — no history
    // input exists in its signature — so cost must track batch rows
    // (with the scheduling floor), and the character-conservation law
    // (Σ err_sum = the batch's non-whitespace characters, because BPE
    // tokens PARTITION each word) cross-checks the fold EXACTLY at
    // this scale, not just on the unit-test fixture.
    val vocabDf = c1
      .select(explode(graft.functions.Bpe.tokensCol(col("text")))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .withColumn("id", (row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("token"))) - 1).cast("long"))
      .localCheckpoint()
    val st = graft.ops.BpeStore.Loaded(graft.functions.Bpe.merges, vocabDf)
    def timedV[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      (v, (System.nanoTime() - t0) / 1e9)
    }
    def foldErr(docs: org.apache.spark.sql.DataFrame): Long =
      graft.ops.BpeStore.driftStats(st, docs, "text")
        .agg(sum(col("err_sum"))).head.getLong(0)
    val (err1, t1) = timedV(foldErr(c1))
    val (err2, t2) = timedV(foldErr(c2))
    println(f"""{"which":"bpe_drift_fold","rows_1x":$n,"sec_1x":$t1%.2f,"sec_2x":$t2%.2f}""")
    val nonWs = c1
      .agg(sum(length(regexp_replace(col("text"), "\\s", ""))))
      .head.getLong(0)
    require(err1 == nonWs,
      s"conservation broken: fold covered $err1 chars, batch holds $nonWs")
    require(err2 > err1, "2x batch must cover more characters")
    // generous headroom (the PipeBench lesson: single wall-clock
    // measurements on a shared host need slack, and the floor
    // dominates small runs) — the failure this catches is the
    // superlinear re-evaluation class, not a 20% wobble
    require(t2 < t1 * 4.0 + 5.0,
      f"2x rows cost ${t2 / t1}%.1fx — the fold is superlinear in its batch")
    spark.stop()
  }
}
