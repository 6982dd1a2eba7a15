package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The corpus-prep composite (quality gate → repetition gate → exact
  * dedup by token-set fingerprint, the batch `prep_pipeline` shape)
  * under Structured Streaming — documents arrive continuously, the
  * row-local gates stream unchanged, and the dedup stage becomes
  * `dropDuplicatesWithinWatermark` on the fingerprint.
  *
  * Contract difference, stated rather than hidden: batch dedup keeps the
  * MINIMUM doc_id per fingerprint; a stream cannot know the minimum (a
  * later micro-batch may carry a smaller id), so the streaming contract
  * is FIRST ARRIVAL per fingerprint. The surviving FINGERPRINT set is
  * identical either way — one representative per distinct token set,
  * state bounded by rate × watermark horizon — and that set equality is
  * what StreamingSpec proves against the batch twin.
  *
  * Column-binding discipline (the winnowSelectCol lesson): the token and
  * gram arrays are bound as named columns BEFORE the score expressions
  * reference them — passing `tokensCol(text)` straight into the gram
  * lambda re-runs the tokenizer per gram, O(len²). `__toks` is
  * multiply-referenced (grams + quality + fingerprint), which is what
  * keeps CollapseProject from folding it back inline.
  */
object DocStreams {

  /** The shared gate+fingerprint projection (row-local, so one
    * definition serves the streaming pipeline and its batch twin — the
    * equivalence the suite checks is then about the DEDUP stage alone).
    */
  private def gated(docs: DataFrame, textCol: String, n: Int,
      minQuality: Double, maxRep: Double): DataFrame = {
    val text = col(textCol)
    docs
      .withColumn("__toks", TextOps.tokensCol(text))
      .withColumn("__g", when(size(col("__toks")) >= n,
        transform(sequence(lit(0), size(col("__toks")) - n),
          i => array_join(slice(col("__toks"), i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
      .withColumn("__quality", qualityOf(text, col("__toks")))
      .withColumn("__rep", repOf(col("__g")))
      .filter(col("__quality") > minQuality && col("__rep") < maxRep)
      .withColumn("fp",
        md5(array_join(array_sort(array_distinct(col("__toks"))), " ")))
      .drop("__toks", "__g", "__quality", "__rep")
  }

  /** floor-quantize to 4 decimals BEFORE threshold comparison — the same
    * q4 discipline as [[TextOps.quality]]/[[TextOps.repetition]]: the
    * gates compare against 0.3/0.5, and an unquantized double within an
    * ulp of the threshold would flip between engines; quantized scores
    * make the kept set oracle-hashable.
    */
  private def q4(c: Column): Column = floor(c * 10000.0) / 10000.0

  /** quality_score over a bound token array — same formula as
    * [[TextOps.quality]] (length, punctuation and stopword legs).
    */
  private def qualityOf(text: Column, toks: Column): Column = {
    val nTok = size(toks)
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    val stops = size(filter(toks,
      t => t.isin(TextOps.langMarkers.flatMap(_._2).map(lit(_)): _*)))
    q4(least(nTok.cast("double") / 100.0, lit(1.0)) * 0.5 +
      (lit(1.0) - punct.cast("double") / length(text)) * 0.3 +
      (stops.cast("double") / nTok) * 0.2)
  }

  /** rep_score over a bound gram array — same duplication ratio as
    * [[TextOps.repetition]].
    */
  private def repOf(g: Column): Column =
    when(size(g) > 0,
      q4(lit(1.0) - size(array_distinct(g)).cast("double") /
        size(g).cast("double")))
      .otherwise(lit(0.0))

  /** Streaming corpus prep. `docs` must carry an event-time column
    * `tsCol`; duplicates arriving within the watermark horizon are
    * dropped (at-least-once upstream → one doc per fingerprint
    * downstream), with per-key state expired by the watermark — the
    * bounded-state property that lets this run forever.
    */
  def prepStream(docs: DataFrame, textCol: String, tsCol: String,
      minQuality: Double = 0.3, maxRep: Double = 0.5, n: Int = 3,
      watermark: String = "1 hour"): DataFrame =
    gated(docs, textCol, n, minQuality, maxRep)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch twin: identical gates, dedup keeps the minimum doc id per
    * fingerprint (the deterministic batch convention, matching
    * `prep_pipeline`).
    */
  def prepBatch(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, maxRep: Double = 0.5,
      n: Int = 3): DataFrame = {
    val g = gated(docs, textCol, n, minQuality, maxRep)
    g.join(g.groupBy(col("fp")).agg(min(col(idCol)).as(idCol)),
      Seq(idCol, "fp"), "left_semi")
  }
}
