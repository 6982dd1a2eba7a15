package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The corpus-prep composite (quality gate → repetition gate → exact
  * dedup by token-set fingerprint, the batch `prep_pipeline` shape)
  * under Structured Streaming — documents arrive continuously, the
  * row-local gate streams unchanged, and the dedup stage becomes
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
  * Why the gate is a Scala UDF and not built-in expressions — the one
  * deliberate exception to the functions-not-UDFs rule, earned by
  * measurement: the declarative form (bound token column → bound gram
  * column → score filter) is destroyed by the optimizer. Catalyst's
  * predicate pushdown substitutes the score aliases into the filter and
  * pushes it to the scan, re-inlining the tokenizer INSIDE the
  * gram-transform lambda, and a lambda re-evaluates inlined subtrees per
  * element — O(len²) per row, measured 9–20 s vs 2 s over 5k sf0.1
  * docs. `prep_pipeline` escapes by checkpointing the score table, which
  * a stream cannot do; every declarative fence tried (nondeterministic
  * sibling column, nondeterministic always-true conjunct) is undone by
  * column pruning or conjunct simplification in Spark 4. One opaque,
  * deterministic Scala function evaluates the whole gate O(len) per row
  * and cannot be split. Its arithmetic mirrors
  * [[TextOps.quality]]/[[TextOps.repetition]]/[[TextOps.fingerprintCol]]
  * operation for operation (same IEEE double order, same q4 floor
  * quantization before thresholding, same md5-of-sorted-distinct-tokens)
  * — and StreamingSpec anchors it row-for-row to the oracle-gated
  * `prep_pipeline`, plus the `prep_stream_twin` gate puts it under the
  * driver's DuckDB hash every round, so any drift from the expression
  * semantics is caught, not assumed away. Caveat carried from the
  * column forms: token ordering is Java string order (UTF-16 units) vs
  * Spark/DuckDB binary-UTF-8 — identical for the ASCII corpus, and the
  * hash gates would flag the first non-ASCII divergence.
  */
object DocStreams {

  private val markers: Set[String] = TextOps.langMarkers.flatMap(_._2).toSet

  /** Some-fingerprint iff the doc passes both gates; None otherwise.
    * One pass over the tokens, O(len) — see the object doc for why this
    * is Scala rather than Columns.
    */
  private[streaming] def gateFp(text: String, minQuality: Double,
      maxRep: Double, n: Int): String = {
    if (text == null || text.isEmpty) return null
    // split(lower(text), "\\s+") with Spark semantics: limit -1 keeps
    // trailing empty strings (Java's default drops them)
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val nTok = toks.length.toDouble
    val punct =
      text.replaceAll("[a-zA-Z0-9\\s]", "").length.toDouble
    val stops = toks.count(markers.contains).toDouble
    // same operation order as the column form, then q4 floor-quantize —
    // IEEE doubles are deterministic given the order, which is what
    // makes this bit-equal to the Catalyst and DuckDB evaluations
    val quality = math.floor((math.min(nTok / 100.0, 1.0) * 0.5 +
      (1.0 - punct / text.length) * 0.3 +
      (stops / nTok) * 0.2) * 10000.0) / 10000.0
    if (!(quality > minQuality)) return null
    val rep = if (toks.length >= n) {
      val total = toks.length - n + 1
      val grams = new scala.collection.mutable.HashSet[String]
      var i = 0
      while (i <= toks.length - n) {
        grams += toks.slice(i, i + n).mkString(" ")
        i += 1
      }
      math.floor((1.0 - grams.size.toDouble / total.toDouble) * 10000.0) /
        10000.0
    } else 0.0
    if (!(rep < maxRep)) return null
    // md5 of the sorted distinct tokens joined by " " — fingerprintCol
    val joined = toks.distinct.sorted.mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(joined.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md.map(b => f"$b%02x").mkString
  }

  /** The shared gate+fingerprint projection (one definition serves the
    * streaming pipeline and its batch twin, so the equivalence the suite
    * checks is about the DEDUP stage alone). Null-fp rows (failed gate)
    * are dropped.
    */
  private def gated(docs: DataFrame, textCol: String, n: Int,
      minQuality: Double, maxRep: Double): DataFrame = {
    // asNondeterministic (it IS deterministic — the marker is an
    // optimizer fence): a deterministic UDF would have the
    // fp-isNotNull filter's alias substituted and pushed below the
    // projection, evaluating the whole gate twice per row (once in the
    // filter, once for the fp output); the marker pins the filter above
    // the projection, one evaluation per row
    val gate = udf((text: String) => gateFp(text, minQuality, maxRep, n))
      .asNondeterministic()
    docs.withColumn("fp", gate(col(textCol))).filter(col("fp").isNotNull)
  }

  /** Streaming corpus prep. `docs` must carry an event-time column
    * `tsCol`; duplicates arriving within the watermark horizon are
    * dropped (at-least-once upstream → one doc per fingerprint
    * downstream), with per-key state expired by the watermark — the
    * bounded-state property that lets this run forever.
    *
    * Watermark caveat (standard streaming-dedup semantics, stated
    * because it bounds the batch-equality contract): rows whose event
    * time is already below the watermark are dropped ON INPUT, so a
    * backfill arriving more than `watermark` behind the stream head
    * loses its documents entirely — including fingerprints seen nowhere
    * else. The fingerprint-set equality with [[prepBatch]] holds for
    * data delivered within the horizon; size the watermark to the
    * worst-case delivery lag, and run late backfills through the batch
    * path.
    */
  def prepStream(docs: DataFrame, textCol: String, tsCol: String,
      minQuality: Double = 0.3, maxRep: Double = 0.5, n: Int = 3,
      watermark: String = "1 hour"): DataFrame =
    gated(docs, textCol, n, minQuality, maxRep)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Batch twin: identical gate, dedup keeps the minimum doc id per
    * fingerprint (the deterministic batch convention, matching
    * `prep_pipeline`). Returns the surviving (idCol, fp) pairs — join
    * back to the corpus on id for payloads, the usual dedup-key shape,
    * which also keeps the fp exchange to two small columns instead of
    * dragging every text through the shuffle.
    */
  def prepBatch(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, maxRep: Double = 0.5,
      n: Int = 3): DataFrame =
    gated(docs, textCol, n, minQuality, maxRep)
      .select(col(idCol), col("fp"))
      .groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fp"))
}
