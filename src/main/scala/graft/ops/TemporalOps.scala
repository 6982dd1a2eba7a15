package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively.
  *
  * The as-of join — each right row matched to the LATEST left row at or
  * before its timestamp, per key — is the standard point-in-time
  * primitive (market data enrichment, last-touch attribution, slowly
  * changing dimensions). Spark has no native form; the naive encodings
  * are a non-equi range join (quadratic bucket blowup under dense keys)
  * or a groupBy+collect (state = the whole history per key). The scale
  * shape used here is union + ordered window: tag both sides, ONE hash
  * exchange of |L|+|R| rows on the key, one sort, and a single forward
  * pass carrying the last-seen left payload — the same cost class as a
  * sort-merge equi-join, with per-row state of exactly one left struct
  * regardless of history length. No candidate pairs ever materialize.
  */
object TemporalOps {

  /** As-of join: every `right` row gains a `matched` struct holding ALL
    * columns of the latest `left` row with `left.tsCol <= right.tsCol`
    * and the same `keyCol` (null when no such row). A left row at
    * exactly the right row's instant matches (<=, the standard as-of
    * contract). Among left ties at one instant the row with the LARGEST
    * `leftTieCol` wins, making the result deterministic on any data.
    *
    * SQL join-key semantics for degenerate rows: null-key rows match
    * nothing and nothing matches them, and a null-timestamp row has no
    * position in time — both are dropped from their side rather than
    * sorting first and silently becoming "the earliest row ever".
    *
    * `leftTieCol` must be an integral column (the determinism guarantee
    * rests on its total order — a cast from a string id would throw
    * under ANSI mode or, with ANSI off, null every tie and make
    * equal-instant picks partition-order dependent). The name `matched`
    * is reserved for the output and must not exist on `right`, and
    * neither input may carry `__`-prefixed columns (internal tags).
    */
  /** The deterministic-tie contract both as-of entry points share —
    * one definition, so `ev_asof_static` can never drift from
    * `ev_asof`'s accepted tie types.
    */
  private def requireIntegralTie(df: DataFrame, tieCol: String,
      opName: String): Unit = {
    val tieType = df.schema(tieCol).dataType
    require(tieType == org.apache.spark.sql.types.LongType ||
        tieType == org.apache.spark.sql.types.IntegerType ||
        tieType == org.apache.spark.sql.types.ShortType ||
        tieType == org.apache.spark.sql.types.ByteType,
      s"$opName requires an integral leftTieCol; '$tieCol' is " +
        s"$tieType (a lossy/failing cast would break the deterministic " +
        "tie order)")
  }

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      leftTieCol: String): DataFrame = {
    requireIntegralTie(left, leftTieCol, "asofJoin")
    require(!right.columns.contains("matched"),
      "right side already has a 'matched' column — the as-of output " +
        "name; rename it before joining (e.g. when chaining as-ofs)")
    (left.columns ++ right.columns).filter(_.startsWith("__")).foreach(c =>
      throw new IllegalArgumentException(
        s"column '$c' collides with asofJoin's internal __-prefixed tags"))
    val l = left
      .filter(col(keyCol).isNotNull && col(leftTsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(leftTsCol).as("__t"),
        lit(0).as("__side"), col(leftTieCol).cast("long").as("__tie"),
        struct(left.columns.map(col): _*).as("__l"))
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(rightTsCol).as("__t"),
        lit(1).as("__side"), lit(0L).as("__tie"),
        struct(right.columns.map(col): _*).as("__r"))
    // left rows sort BEFORE right rows at the same instant (side 0 < 1),
    // which is exactly the <= contract; ties among left rows resolve by
    // __tie ascending, so last() carries the largest-tie row forward
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("matched", last(col("__l"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__r.*"), col("matched"))
  }

  /** The serving form of the as-of left side: each surviving left row
    * with its VALIDITY interval. Per key, ordered by timestamp, a row
    * is the as-of answer for every instant in `[__t, __until)` (null
    * `__until` = latest row, open-ended) — so an as-of join becomes a
    * STATELESS equality-plus-residual join against this frame, the
    * shape Structured Streaming can run ([[asofJoinStreamStatic]]),
    * where [[asofJoin]]'s union+window cannot (an unbounded
    * running-`last` window has no incremental streaming plan).
    *
    * Equal-instant left ties resolve HERE, at snapshot build, with the
    * same largest-`leftTieCol` rule as [[asofJoin]]: the losers get
    * empty validity and are dropped. Build this once per snapshot
    * (batch-side, e.g. nightly dimension close), persist it, and let
    * any number of streams join it; the two windows below are
    * batch-side cost, never per-micro-batch state. Schema:
    * `(__k, __t, __until, matched)` with `matched` carrying ALL left
    * columns.
    */
  def asofSnapshot(left: DataFrame, keyCol: String, leftTsCol: String,
      leftTieCol: String): DataFrame = {
    requireIntegralTie(left, leftTieCol, "asofSnapshot")
    left.columns.filter(_.startsWith("__")).foreach(c =>
      throw new IllegalArgumentException(
        s"column '$c' collides with asofSnapshot's internal tags"))
    val tiebreak = Window.partitionBy(col("__k"), col("__t"))
      .orderBy(col("__tie").desc)
    val succession = Window.partitionBy(col("__k")).orderBy(col("__t"))
    left.filter(col(keyCol).isNotNull && col(leftTsCol).isNotNull)
      .select(col(keyCol).as("__k"), col(leftTsCol).as("__t"),
        col(leftTieCol).cast("long").as("__tie"),
        struct(left.columns.map(col): _*).as("matched"))
      .withColumn("__rn", row_number().over(tiebreak))
      .filter(col("__rn") === 1)
      .withColumn("__until", lead(col("__t"), 1).over(succession))
      .select(col("__k"), col("__t"), col("__until"), col("matched"))
  }

  /** On-disk form of [[asofSnapshot]] — the artifact a nightly
    * dimension close writes once and every stream/consumer joins
    * against. Follows the store-family conventions: a manifest marker
    * self-identifies the directory (a random parquet dir must not be
    * misread as a snapshot), carries the format version
    * ([[graft.StoreUtil.requireVersion]] refuses newer layouts), and
    * load validates the exact snapshot schema.
    */
  val SnapshotManifest = "_graft_asof.json"

  def saveSnapshot(snapshot: DataFrame, path: String): Unit = {
    require(snapshot.columns.sameElements(
        Array("__k", "__t", "__until", "matched")),
      "not an asofSnapshot frame (__k, __t, __until, matched)")
    val spark = snapshot.sparkSession
    graft.StoreUtil.deleteMarker(spark, path, SnapshotManifest)
    snapshot.write.mode("overwrite").parquet(s"$path/snapshot")
    graft.StoreUtil.writeMarker(spark, path, SnapshotManifest,
      """{"version":1,"layout":"asof-snapshot"}""")
  }

  def loadSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    graft.StoreUtil.requireManifest(spark, path, SnapshotManifest,
      "as-of snapshot store")
    val df = spark.read.parquet(s"$path/snapshot")
    require(df.columns.sameElements(
        Array("__k", "__t", "__until", "matched")),
      s"$path/snapshot does not carry the asofSnapshot schema")
    df
  }

  /** Stream-compatible as-of join: `right` rows (streamed or batch)
    * against an [[asofSnapshot]] — each row lands in exactly one
    * validity interval, so the join is a plain left-outer
    * equality-on-key join with a range residual: stateless, no
    * watermark, no per-key state, legal as a stream-static join in
    * append mode. On the same inputs the result is row-for-row equal
    * to [[asofJoin]] (`matched` null when no left row precedes);
    * null-key/null-timestamp right rows drop, as there.
    *
    * This is the feature-lookup / SCD-enrichment serving shape: the
    * dimension history closes batch-side into the snapshot, the event
    * stream enriches against it with broadcast-hash cost when the
    * snapshot is small and shuffled-hash otherwise.
    */
  def asofJoinStreamStatic(right: DataFrame, snapshot: DataFrame,
      keyCol: String, rightTsCol: String): DataFrame = {
    require(snapshot.columns.sameElements(
        Array("__k", "__t", "__until", "matched")),
      "snapshot must be an asofSnapshot frame (__k, __t, __until, matched)")
    require(!right.columns.contains("matched"),
      "right side already has a 'matched' column — the as-of output " +
        "name; rename it before joining")
    right.columns.filter(_.startsWith("__")).foreach(c =>
      throw new IllegalArgumentException(
        s"column '$c' collides with asofJoinStreamStatic's internal tags"))
    val r = right.filter(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
    r.join(snapshot,
        r(keyCol) === snapshot("__k") &&
          r(rightTsCol) >= snapshot("__t") &&
          (snapshot("__until").isNull ||
            r(rightTsCol) < snapshot("__until")),
        "left_outer")
      .select(right.columns.map(col) :+ col("matched"): _*)
  }

  /** Point-in-interval join: every `points` row paired with every
    * `intervals` row of the same key whose `[startCol, endCol]` contains
    * its `tsCol` (inclusive both ends — SQL BETWEEN). The direct
    * encoding is a non-equi join, which Spark plans as a broadcast
    * nested loop / per-key cross product — |points|·|intervals| work per
    * key, a scale-killer under dense keys. Here time is cut into
    * fixed-width chunks: each interval registers under every chunk it
    * overlaps, each point under exactly one, and the join becomes a
    * plain shuffled EQUI-join on (key, chunk) followed by the exact
    * BETWEEN residual. Cost: one hash exchange of |points| +
    * Σ⌈span/chunk⌉ rows; candidate pairs are bounded by per-chunk
    * co-occupancy, never by per-key row counts.
    *
    * `chunkSeconds` is the sole tuning knob — pick it near the typical
    * interval span (wider wastes candidate checks, narrower multiplies
    * the interval side by span/chunk). Chunk ids are exact integer
    * arithmetic on `unix_micros` (no double division — a boundary
    * timestamp must never round into the wrong chunk). Null key or
    * timestamp rows drop, matching BETWEEN's null semantics. Interval
    * columns ride along in the output after the point columns; `__`
    * prefixes are reserved, and key/chunk dedup via USING keeps one key
    * column.
    */
  /** Shared chunk machinery for the two chunked joins: exact integer
    * chunk ids on `unix_micros` (no double division — a boundary
    * timestamp must never round into the wrong chunk), the interval
    * side exploded over every chunk it overlaps (inverted intervals
    * filtered FIRST: they match nothing under BETWEEN, but `sequence()`
    * would throw on start > stop), and the input guards both joins
    * demand.
    */
  private def chunkOf(g: Long)(c: org.apache.spark.sql.Column) =
    unix_micros(c) - pmod(unix_micros(c), lit(g))

  private def chunkedIntervals(df: DataFrame, s: String, e: String,
      g: Long): DataFrame =
    df.filter(col(s) <= col(e)).withColumn("__chunk",
      explode(sequence(chunkOf(g)(col(s)), chunkOf(g)(col(e)), lit(g))))

  private def requireJoinable(a: DataFrame, b: DataFrame, keyCol: String,
      opName: String, chunkSeconds: Long): Unit = {
    require(chunkSeconds > 0, "chunkSeconds must be positive")
    (a.columns ++ b.columns).filter(_.startsWith("__")).foreach(c =>
      throw new IllegalArgumentException(
        s"column '$c' collides with $opName's internal tags"))
    require(a.columns.intersect(b.columns).sameElements(Array(keyCol)),
      s"$opName inputs may share ONLY the key column — a silently " +
        "duplicated output name would make the result ambiguous")
  }

  /** Derive `chunkSeconds` for the chunked joins from the data
    * instead of a hand-set knob — the one parameter a user can mis-set
    * by 1000× in either direction (too wide: every key's rows share a
    * chunk and the residual degenerates toward per-key quadratic; too
    * narrow: the interval side explodes by span/chunk). ONE
    * column-pruned stats pass takes the median span (approximate
    * percentile, 1-pass; the knob tolerates 2× error) and snaps UP to
    * the next power-of-two seconds, clamped to [1 s, 7 d] — snapping
    * absorbs the approximation noise, and chunk ≈ typical span keeps
    * the explode factor Σ⌈span/chunk⌉ ≈ |intervals| while candidates
    * stay co-occupancy-bounded. Inverted/null intervals are excluded
    * exactly as the join itself excludes them; an empty interval side
    * falls back to one hour (any chunk joins an empty side correctly).
    */
  def autoChunkSeconds(intervals: DataFrame, startCol: String,
      endCol: String): Long = {
    val row = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .select(percentile_approx(
        unix_micros(col(endCol)) - unix_micros(col(startCol)),
        lit(0.5), lit(1000)).as("m"))
      .head()
    if (row.isNullAt(0)) 3600L
    else {
      val medianSec = math.max(1L, row.getLong(0) / 1000000L)
      var c = 1L
      while (c < medianSec && c < 7L * 86400L) c <<= 1
      math.min(c, 7L * 86400L)
    }
  }

  /** [[pointInIntervalJoin]] with [[autoChunkSeconds]] — one extra
    * stats job over the interval side, no knob.
    */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String,
      endCol: String): DataFrame =
    pointInIntervalJoin(points, intervals, keyCol, tsCol, startCol, endCol,
      autoChunkSeconds(intervals, startCol, endCol))

  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      chunkSeconds: Long): DataFrame = {
    requireJoinable(points, intervals, keyCol, "pointInIntervalJoin",
      chunkSeconds)
    val g = chunkSeconds * 1000000L
    points.withColumn("__chunk", chunkOf(g)(col(tsCol)))
      .join(chunkedIntervals(intervals, startCol, endCol, g),
        Seq(keyCol, "__chunk"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__chunk")
  }

  /** Interval-overlap join: every `left` interval paired with every
    * `right` interval of the same key they overlap (inclusive ends:
    * `l.start <= r.end AND r.start <= l.end`) — "which browsing
    * sessions overlapped a purchase session". Same chunked shape as
    * [[pointInIntervalJoin]], with the classic duplicate guard: a pair
    * sharing several chunks would match in each one, so it is emitted
    * ONLY from the FIRST chunk both occupy — `max(chunk(l.start),
    * chunk(r.start))`, exact integer arithmetic, no `dropDuplicates`
    * shuffle. Inverted intervals match nothing on either side; the two
    * inputs may share only the key column.
    */
  /** [[intervalOverlapJoin]] with [[autoChunkSeconds]]: the WIDER
    * side's typical span governs (narrow chunks multiply the wide
    * side's explode factor; wide chunks only add residual checks), so
    * take the max of the two sides' derived widths.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCol: String, lStart: String, lEnd: String,
      rStart: String, rEnd: String): DataFrame =
    intervalOverlapJoin(left, right, keyCol, lStart, lEnd, rStart, rEnd,
      math.max(autoChunkSeconds(left, lStart, lEnd),
        autoChunkSeconds(right, rStart, rEnd)))

  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keyCol: String, lStart: String, lEnd: String,
      rStart: String, rEnd: String, chunkSeconds: Long): DataFrame = {
    requireJoinable(left, right, keyCol, "intervalOverlapJoin", chunkSeconds)
    val g = chunkSeconds * 1000000L
    chunkedIntervals(left, lStart, lEnd, g)
      .join(chunkedIntervals(right, rStart, rEnd, g), Seq(keyCol, "__chunk"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__chunk") === greatest(chunkOf(g)(col(lStart)),
          chunkOf(g)(col(rStart))))
      .drop("__chunk")
  }
}
