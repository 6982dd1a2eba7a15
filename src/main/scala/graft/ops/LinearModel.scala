package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training + scoring for corpus quality
  * classification — the linear-classifier leg of a training-data pipeline
  * (fasttext-style quality filters are exactly this: integer lexical
  * count features, a trained linear model, a per-document keep score).
  *
  * Full-batch gradient descent with the kmeansCentroids control shape:
  * the DRIVER holds the (tiny) weight vector and loops a fixed number of
  * iterations; each iteration is ONE aggregation job whose map side
  * computes per-row error·feature products and whose exchange carries
  * k+1 longs per partition — nothing about the corpus size reaches the
  * driver but k sums. At 100 TB that is `iters` column-pruned scans;
  * minibatching composes for free by pre-filtering with
  * [[SampleOps]]-style hash sampling.
  *
  * Numerics are FIXED-POINT INTEGER end to end (the [[graft.functions.Unigram]]
  * rule: no float accumulation order, no cross-engine ulp drift):
  *  - weights and probabilities carry scale 2¹⁶;
  *  - z = Σ wᵢ·xᵢ is a long (features are integer counts);
  *  - σ(z) is a 256-entry LITERAL table over z quantized to 1/16 steps
  *    on [-8, 8) — transcendentals happen once, at table-build time,
  *    never per row (piecewise-constant sigmoid: the gradient field is
  *    identical on every engine that replays the table);
  *  - the gradient Σ (σ_fp − 2¹⁶·y)·xᵢ is an order-independent long sum;
  *  - the update w ← w − ⌊g / (n·2^lrShift)⌋ uses floor-of-double
  *    division, exact here because |g| < 2⁵³ and the true quotient is a
  *    rational with denominator n·2^s — never within a double ulp of an
  *    integer it doesn't equal.
  * Two engines running [[train]] from the same data produce the same
  * bits, which is what the unrolled-SQL oracle asserts.
  */
object LinearModel {

  /** Fixed-point scale for weights and probabilities: 2¹⁶. */
  val Scale = 65536L

  /** σ table: index i ∈ [-128, 127] holds round(2¹⁶·σ(i/16)). */
  val SigTable: IndexedSeq[Long] = (-128 until 128).map { i =>
    math.round(Scale.toDouble / (1.0 + math.exp(-i / 16.0)))
  }

  private def sigLit: Column = array(SigTable.map(lit(_)): _*)

  /** σ_fp(z_fp): clamp z to the table grid (z/2¹⁶ real, 1/16 steps) and
    * look up. Saturation beyond |8| is the table's ±ends — the same
    * flat-gradient region a float sigmoid is numerically flat in anyway.
    */
  def sigmoidFp(zFp: Column): Column = {
    val idx = greatest(lit(-128L),
      least(lit(127L), floor(zFp.cast("double") / lit(4096.0)).cast("long")))
    element_at(sigLit, (idx + lit(129L)).cast("int"))
  }

  /** z_fp for one row from integer feature columns and literal weights. */
  def zFp(featCols: Seq[String], weights: Seq[Long]): Column = {
    require(featCols.size == weights.size && featCols.nonEmpty,
      s"feature/weight arity mismatch: ${featCols.size} features vs " +
        s"${weights.size} weights — zip would silently drop terms")
    featCols.zip(weights).map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _)
  }

  /** Keep-probability in fixed point (0..2¹⁶) under literal trained
    * weights — the row-local scoring column a quality gate filters on.
    */
  def scoreFp(featCols: Seq[String], weights: Seq[Long]): Column =
    sigmoidFp(zFp(featCols, weights))

  /** Train `iters` full-batch GD steps from w = 0. `df` must carry the
    * integer feature columns and a 0/1 `labelCol`; per-sample learning
    * rate is 2^-lrShift. Returns the fixed-point weight vector.
    *
    * Feature magnitudes must keep |z| well under 2⁵² (the floor-exactness
    * bound): counts in the thousands with 2¹⁷-scale weights leave >20
    * bits of headroom.
    */
  def train(df: DataFrame, featCols: Seq[String], labelCol: String,
      iters: Int, lrShift: Int): Seq[Long] = {
    require(iters > 0 && lrShift >= 0,
      s"need iters > 0 (got $iters) and lrShift >= 0 (got $lrShift)")
    // a null feature or label would null its err·x product, silently
    // vanishing from the gradient sums while still counting in n — a
    // shrunk learning rate AND a divergence from any oracle that maps
    // nulls to a value. Exclude such rows from BOTH, visibly.
    // Projected to the integer feature columns and PERSISTED once
    // (columnar cache, not a localCheckpoint row-RDD — the frame is
    // STATIC across iterations, so the stats-chain concern that forces
    // flatten in the iterative-frame loops does not apply, and every GD
    // step then runs a vectorized scan): the unmaterialized form re-ran
    // the caller's interpreted feature derivation (tokenize/count
    // chains over the corpus) per step — measured 4.4 s -> 1.9 s for
    // the 8-step gate at sf0.1.
    val clean = df.na.drop(featCols :+ labelCol)
      .select((featCols :+ labelCol).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var w = Seq.fill(featCols.size)(0L)
      for (_ <- 0 until iters) {
        val err = sigmoidFp(zFp(featCols, w)) - lit(Scale) * col(labelCol)
        val row = clean.select(
          featCols.map(c => sum(err * col(c)).as(s"g_$c")) :+
            count(lit(1)).as("_n"): _*).head()
        val n = row.getLong(featCols.size)
        require(n > 0, "refusing to train on an empty corpus")
        val denom = n.toDouble * (1L << lrShift)
        w = w.zipWithIndex.map { case (wi, i) =>
          val g = row.getLong(i)
          // the floor-of-double update is exact only while |g| < 2⁵³
          // (above that the double round-trip rounds g itself and the
          // bit-reproducibility contract silently dies — reachable
          // around 1.4e8 rows at 2¹⁶-scale errors); driver-side and
          // per-step, so the check is free
          // explicit bounds, not math.abs: abs(Long.MinValue) is
          // NEGATIVE (two's complement), so an exactly-wrapped sum
          // would slip through the abs form of this very check
          require(g > -(1L << 53) && g < (1L << 53),
            s"gradient component $i = $g exceeds the 2^53 exact-double " +
              "bound — shard the corpus or rescale features to keep " +
              "the fixed-point update bit-reproducible")
          wi - math.floor(g.toDouble / denom).toLong
        }
      }
      w
    } finally clean.unpersist(blocking = false)
  }

  /** The unrolled-SQL twin of [[train]] for a DuckDB oracle (the
    * [[graft.functions.Bpe]] pattern: the oracle replays the WHOLE
    * training loop from scratch, one CTE chain per iteration, with the
    * σ table inlined — no Spark-side artifact crosses over). `featSql`
    * are SQL expressions producing the same integer features over CTE
    * `f`, which the caller prepends; weights come out as (i, w) rows.
    */
  def trainOracleSql(featSql: Seq[String], labelSql: String,
      iters: Int, lrShift: Int): String = {
    val (ctes, wLast) = trainCtesSql(featSql, labelSql, iters, lrShift)
    val out = featSql.indices
      .map(i => s"SELECT CAST($i AS BIGINT) AS i, c$i AS w FROM $wLast")
      .mkString("\nUNION ALL ")
    s"$ctes\n$out"
  }

  /** The training replay as a bare CTE chain — (chain, final weight CTE
    * name) — so an oracle can keep going AFTER training: the
    * store-served scoring gate trains in SQL, then scores with the
    * weights it just derived (`sigt` stays in scope for the lookup).
    * [[trainOracleSql]] is this plus the weight-emitting SELECT.
    */
  def trainCtesSql(featSql: Seq[String], labelSql: String,
      iters: Int, lrShift: Int): (String, String) = {
    require(iters > 0 && lrShift >= 0, // train's guard, same bad inputs
      s"need iters > 0 (got $iters) and lrShift >= 0 (got $lrShift)")
    val k = featSql.size
    val xs = (0 until k).map(i => s"x$i")
    val feats = featSql.zip(xs).map { case (e, x) => s"$e AS $x" }
    val sig = SigTable.mkString("[", ", ", "]")
    val base =
      s"ff AS (SELECT ${feats.mkString(", ")}, $labelSql AS y FROM f),\n" +
        s"sigt AS (SELECT $sig AS l)"
    val iterCtes = (1 to iters).map { t =>
      val wPrev = s"w${t - 1}"
      val z = xs.zipWithIndex
        .map { case (x, i) => s"ff.$x * w.c$i" }.mkString(" + ")
      val sigLookup = s"sigt.l[CAST(least(127, greatest(-128, " +
        s"floor(($z) / 4096.0))) AS INT) + 129]"
      val sums = xs.zipWithIndex.map { case (x, i) =>
        s"CAST(sum(($sigLookup - 65536 * ff.y) * ff.$x) AS BIGINT) AS g$i"
      }.mkString(", ")
      val upd = (0 until k).map { i =>
        s"w.c$i - CAST(floor(g.g$i::DOUBLE / (g.n * ${1L << lrShift})) " +
          s"AS BIGINT) AS c$i"
      }.mkString(", ")
      s"it$t AS (SELECT $sums, count(*) AS n FROM ff, $wPrev w, sigt),\n" +
        s"w$t AS (SELECT $upd FROM it$t g, $wPrev w)"
    }
    val w0 = s"w0 AS (SELECT ${(0 until k)
      .map(i => s"CAST(0 AS BIGINT) AS c$i").mkString(", ")})"
    (s"$base,\n$w0,\n${iterCtes.mkString(",\n")}", s"w$iters")
  }

  /** The scoring lookup as SQL over a z expression — the oracle twin of
    * [[sigmoidFp]] (same table, same clamp, same 1/16 grid); expects
    * the `sigt` CTE in scope.
    */
  def sigmoidFpSql(zSql: String): String =
    s"sigt.l[CAST(least(127, greatest(-128, " +
      s"floor(($zSql) / 4096.0))) AS INT) + 129]"
}
