package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.IntLog

/** A bigram language model TRAINED on the corpus and scored with
  * integer micronat costs — the perplexity-style quality filter closed
  * over its own data, where [[graft.functions.Unigram]] ships a
  * compile-time table. Training is two hash aggregates (unigram and
  * bigram counts); scoring is three left joins against the count
  * frames plus [[IntLog.lnMicroCol]], so costs derived from RUNTIME
  * counts are still bit-identical across engines (the property every
  * literal-table scorer in this repo bought at the price of fixed
  * weights).
  *
  * Cost model (stupid backoff, all integer micronats):
  *  - first token:            ln N − ln c(w)         (unseen w: c := 1)
  *  - seen bigram (w1, w2):   ln c(w1) − ln c(w1 w2)
  *  - backoff:                916291 + ln N − ln c(w2)  (−ln 0.4, then
  *                            the unigram cost; unseen w2: c := 1)
  * Sums are order-independent integer additions; the per-doc mean is
  * integer division, so the caller picks no rounding.
  *
  * At 100 TB: counts are word-keyed aggregates (map-side combined);
  * scoring shuffles the corpus's token stream once per join key, with
  * the count frames broadcastable whenever the vocabulary is (AQE
  * decides — a web-scale vocabulary sort-merges instead, still
  * one-pass). Nothing is pairwise, nothing collects.
  */
object LmOps {

  /** −ln(0.4) in micronats — the stupid-backoff penalty. */
  val BackoffMicro = 916291L

  /** The tokenized corpus frame `(t: array<string>)` every trainer
    * aggregates over — one definition so [[LmStore]]'s per-batch
    * counts and the one-shot trainers can never tokenize differently.
    */
  private[ops] def tokenFrame(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(TextOps.tokensCol(col(textCol)).as("t"))

  /** Unigram counts (w, c) over a tokenized frame. */
  private[ops] def uniCountsOfTokens(toks: DataFrame): DataFrame =
    toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Bigram counts (w1, w2, c) over a tokenized frame. */
  private[ops] def biCountsOfTokens(toks: DataFrame): DataFrame =
    toks.select(col("t"), posexplode(col("t")))
      .filter(col("pos") >= 1)
      .select(element_at(col("t"), col("pos")).as("w1"),
        col("col").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))

  /** Trigram counts (w1, w2, w3, c) over a tokenized frame. */
  private[ops] def triCountsOfTokens(toks: DataFrame): DataFrame =
    toks.select(col("t"), posexplode(col("t")))
      .filter(col("pos") >= 2)
      .select(element_at(col("t"), col("pos") - 1).as("w1"),
        element_at(col("t"), col("pos")).as("w2"),
        col("col").as("w3"))
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c"))

  /** Unigram counts (w, c) over the corpus's whitespace tokens. */
  def trainUnigram(docs: DataFrame, textCol: String): DataFrame =
    uniCountsOfTokens(tokenFrame(docs, textCol))

  /** Bigram counts (w1, w2, c) over consecutive token pairs. */
  def trainBigram(docs: DataFrame, textCol: String): DataFrame =
    biCountsOfTokens(tokenFrame(docs, textCol))

  /** Trigram counts (w1, w2, w3, c) over consecutive token triples. */
  def trainTrigram(docs: DataFrame, textCol: String): DataFrame =
    triCountsOfTokens(tokenFrame(docs, textCol))

  /** Score every non-null-text doc against trained `uni`/`bi` counts.
    *
    * `broadcastCounts` is the vocab-bounded fast path: the count frames
    * are hinted broadcast, so the corpus token stream is NEVER
    * exchanged — without it each join key (w2, w1, (w1,w2)) shuffles
    * the exploded corpus once. Correct whenever the vocabulary fits an
    * executor (the common case even at web scale: counts are per
    * DISTINCT word); leave false to let AQE decide from stats.
    * @return (idCol, n_tokens, cost_micronats, mean_micronats)
    */
  def scoreBigram(docs: DataFrame, idCol: String, textCol: String,
      uni0: DataFrame, bi: DataFrame,
      broadcastCounts: Boolean = false,
      clusterCorpus: Boolean = false): DataFrame = {
    require(!(broadcastCounts && clusterCorpus),
      "clusterCorpus is the big-vocab shape — under broadcastCounts " +
        "the corpus never moves at all, so clustering it is pure waste")
    // the unigram frame feeds THREE consumers (c2 join, c1 join, the
    // N aggregate) — materialize it once so the training aggregation
    // doesn't rerun per consumer; it is vocabulary-sized, so the
    // checkpoint is bounded. `bi` has one consumer and stays lazy.
    val uni = ClusterOps.flatten(uni0)
    def h(df: DataFrame) = if (broadcastCounts) broadcast(df) else df
    val nFrame = uni.agg(sum(col("c")).as("n_total"))
    // spread the raw doc rows before the tokenize+explode+surprisal
    // chain (graft.Tables.spread — scale-gated, no-op at production
    // split counts): the exchange carries doc rows, never the exploded
    // token stream, so the scoring plan's shuffle contract stands
    val pos = graft.Tables.spread(docs, idCol)
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextOps.tokensCol(col(textCol)).as("t"))
      .select(col("id"), col("t"), posexplode(col("t")))
      .select(col("id"), col("pos").as("p"), col("col").as("w2"),
        when(col("pos") >= 1, element_at(col("t"), col("pos"))).as("w1"))
    val joined0 = pos
      .join(h(uni.select(col("w").as("w2"), col("c").as("c2"))), Seq("w2"), "left_outer")
    // big-vocab path (clusterCorpus): one explicit w1 clustering serves
    // BOTH remaining joins (w1 ⊆ each key set) — two corpus exchanges
    // total instead of three. Opt-in: with neither flag, AQE decides
    // from stats (and broadcasts a small vocab, corpus unmoved). Same
    // shape as scoreTrigram, which documents it.
    val byW1 =
      if (clusterCorpus) joined0.repartition(col("w1")) else joined0
    val joined = byW1
      .join(h(uni.select(col("w").as("w1"), col("c").as("c1"))), Seq("w1"), "left_outer")
      .join(h(bi.select(col("w1"), col("w2"), col("c").as("c12"))),
        Seq("w1", "w2"), "left_outer")
      .crossJoin(broadcast(nFrame))
      // IntLog's contract: bind computed inputs to real columns first —
      // its expression references x several times
      .withColumn("c2e", coalesce(col("c2"), lit(1L)))
      .withColumn("uni_cost",
        IntLog.lnMicroCol(col("n_total")) - IntLog.lnMicroCol(col("c2e")))
    // enforce the shared-corpus invariant (see scoreTrigram's guard): a
    // seen bigram whose w1 is unseen would null-and-skip its cost
    val cost = when(col("c12").isNotNull && col("c1").isNull,
        raise_error(concat(lit("scoreBigram: count frames are " +
          "inconsistent (a seen bigram's w1 is unseen) — train uni/bi " +
          "on the SAME corpus; offending w1="), col("w1"))))
      .when(col("p") === 0, col("uni_cost"))
      .when(col("c12").isNotNull,
        IntLog.lnMicroCol(col("c1")) - IntLog.lnMicroCol(col("c12")))
      .otherwise(lit(BackoffMicro) + col("uni_cost"))
    joined.groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(cost).as("cost_micronats"))
      .select(col("id").as(idCol), col("n_tokens"), col("cost_micronats"),
        expr("cost_micronats div n_tokens").as("mean_micronats"))
  }

  /** Trigram scoring with the full stupid-backoff CHAIN — the order-3
    * member of the family ([[scoreBigram]]'s cost model extended one
    * level): a seen trigram costs ln c(w₀w₁) − ln c(w₀w₁w₂); an unseen
    * one pays the backoff penalty and falls to the bigram rule, which
    * itself falls to the unigram rule. Position 0 scores as a unigram,
    * position 1 as a bigram — the natural short-context degradation.
    * Same integer-micronat arithmetic, same runtime-count [[IntLog]]
    * logs, and the same [[scoreBigram]] broadcast fast path — under it
    * the corpus moves exactly once: into the final per-doc aggregate.
    * When the vocabulary CANNOT broadcast, `clusterCorpus = true` is
    * the shape to ask for: the five count joins then ride TWO corpus
    * exchanges, not five — the w2 join clusters the token stream once,
    * and one explicit w1 re-clustering satisfies the four remaining
    * key sets (w1 is a subset of each), so only the vocabulary-sized
    * count frames move to meet the corpus, never the reverse (PlanSpec
    * counts the token-stream exchanges and pins the paths
    * bit-identical). With neither flag, AQE decides from stats.
    * @return (idCol, n_tokens, cost_micronats, mean_micronats)
    */
  def scoreTrigram(docs: DataFrame, idCol: String, textCol: String,
      uni0: DataFrame, bi0: DataFrame, tri: DataFrame,
      broadcastCounts: Boolean = false,
      clusterCorpus: Boolean = false): DataFrame = {
    require(!(broadcastCounts && clusterCorpus),
      "clusterCorpus is the big-vocab shape — under broadcastCounts " +
        "the corpus never moves at all, so clustering it is pure waste")
    // uni feeds three consumers, bi two (the (w1,w2) and (w0,w1)
    // joins) — materialize both once; tri has one consumer, stays lazy
    val uni = ClusterOps.flatten(uni0)
    val bi = ClusterOps.flatten(bi0)
    def h(df: DataFrame) = if (broadcastCounts) broadcast(df) else df
    val nFrame = uni.agg(sum(col("c")).as("n_total"))
    // spread the raw doc rows before the tokenize+explode+surprisal
    // chain (graft.Tables.spread — scale-gated, no-op at production
    // split counts): the exchange carries doc rows, never the exploded
    // token stream, so the scoring plan's shuffle contract stands
    val pos = graft.Tables.spread(docs, idCol)
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), TextOps.tokensCol(col(textCol)).as("t"))
      .select(col("id"), col("t"), posexplode(col("t")))
      .select(col("id"), col("pos").as("p"), col("col").as("w2"),
        when(col("pos") >= 1, element_at(col("t"), col("pos"))).as("w1"),
        when(col("pos") >= 2, element_at(col("t"), col("pos") - 1)).as("w0"))
    val joined0 = pos
      .join(h(uni.select(col("w").as("w2"), col("c").as("c2"))),
        Seq("w2"), "left_outer")
    // Big-vocab path (clusterCorpus — counts too large to broadcast):
    // the w2 join above moves the token stream once (Spark clusters it
    // by w2), and ONE explicit re-clustering by w1 here serves ALL
    // FOUR remaining joins — hash(w1) satisfies the (w1), (w1,w2),
    // (w0,w1), and (w0,w1,w2) clustering requirements because w1 is a
    // subset of each key set, so only the count sides move to meet it.
    // Without this, each shuffled join re-exchanges the corpus on its
    // own full key — five corpus-sized shuffles instead of two
    // (PlanSpec counts them). OPT-IN: with neither flag, AQE decides
    // from stats and broadcasts any small vocab (corpus unmoved) — a
    // user-specified repartition cannot be elided, so defaulting it on
    // would tax exactly the common case the fast path serves.
    val byW1 =
      if (clusterCorpus) joined0.repartition(col("w1")) else joined0
    val joined = byW1
      .join(h(uni.select(col("w").as("w1"), col("c").as("c1"))),
        Seq("w1"), "left_outer")
      .join(h(bi.select(col("w1"), col("w2"), col("c").as("c12"))),
        Seq("w1", "w2"), "left_outer")
      .join(h(bi.select(col("w1").as("w0"), col("w2").as("w1"),
          col("c").as("c01"))),
        Seq("w0", "w1"), "left_outer")
      .join(h(tri.select(col("w1").as("w0"), col("w2").as("w1"),
          col("w3").as("w2"), col("c").as("c012"))),
        Seq("w0", "w1", "w2"), "left_outer")
      .crossJoin(broadcast(nFrame))
      .withColumn("c2e", coalesce(col("c2"), lit(1L)))
      .withColumn("uni_cost",
        IntLog.lnMicroCol(col("n_total")) - IntLog.lnMicroCol(col("c2e")))
    // a seen trigram implies a seen (w0,w1) bigram (and a seen bigram a
    // seen w1) — true whenever the three count frames come from ONE
    // training corpus. ENFORCE it instead of assuming: with mismatched
    // frames (bi trained on a different slice, a pruned top-k bigram
    // table) lnMicroCol(NULL) would null the row's cost and sum() would
    // silently skip it while n_tokens still counts it — a quietly wrong
    // mean, the failure mode every other scorer requires away.
    val inconsistent =
      (col("c012").isNotNull && col("c01").isNull) ||
        (col("c12").isNotNull && col("c1").isNull)
    val cost = when(inconsistent, raise_error(concat(
        lit("scoreTrigram: count frames are inconsistent (a seen " +
          "n-gram's prefix is unseen) — train uni/bi/tri on the SAME " +
          "corpus; offending pair w1="), col("w1"), lit(" w2="), col("w2"))))
      .when(col("p") === 0, col("uni_cost"))
      .when(col("p") >= 2 && col("c012").isNotNull,
        IntLog.lnMicroCol(col("c01")) - IntLog.lnMicroCol(col("c012")))
      .when(col("p") >= 2 && col("c12").isNotNull,
        lit(BackoffMicro) +
          IntLog.lnMicroCol(col("c1")) - IntLog.lnMicroCol(col("c12")))
      .when(col("p") >= 2, lit(2L * BackoffMicro) + col("uni_cost"))
      .when(col("c12").isNotNull,
        IntLog.lnMicroCol(col("c1")) - IntLog.lnMicroCol(col("c12")))
      .otherwise(lit(BackoffMicro) + col("uni_cost"))
    joined.groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(cost).as("cost_micronats"))
      .select(col("id").as(idCol), col("n_tokens"), col("cost_micronats"),
        expr("cost_micronats div n_tokens").as("mean_micronats"))
  }

  /** The bigram-count aggregate over a tokenized CTE `tr (t)` — shared
    * between [[scoreBigramOracleSql]]'s `bi` CTE and the standalone
    * `lm_train_bi` oracle so the two can never drift.
    */
  val biCountsSql: String =
    """SELECT t[p] AS w1, t[p+1] AS w2, count(*) AS c
      |FROM tr, unnest(range(1, len(t))) r(p) GROUP BY 1, 2""".stripMargin

  /** The trigram-count aggregate over a tokenized CTE `tr (t)` — the
    * [[biCountsSql]] sibling, shared by the trigram oracles.
    */
  val triCountsSql: String =
    """SELECT t[p] AS w1, t[p+1] AS w2, t[p+2] AS w3, count(*) AS c
      |FROM tr, unnest(range(1, len(t) - 1)) r(p) GROUP BY 1, 2, 3"""
      .stripMargin

  /** The scoring pipeline as DuckDB SQL over CTEs the caller provides:
    * `t (doc_id, t)` — tokenized docs to score — and `tr (t)` — the
    * tokenized TRAINING docs. Counts, N, and every micronat cost are
    * re-derived in SQL with [[IntLog.lnMicroSql]], so the oracle
    * replays training AND scoring from raw text.
    */
  def scoreBigramOracleSql(): String = {
    def ln(e: String) = IntLog.lnMicroSql(e)
    s"""uni AS (SELECT u AS w, count(*) AS c FROM tr, unnest(t) x(u)
       |  GROUP BY 1),
       |bi AS ($biCountsSql),
       |nt AS (SELECT sum(c) AS n_total FROM uni),
       |pos AS (SELECT doc_id, p, t[p+1] AS w2,
       |    CASE WHEN p >= 1 THEN t[p] END AS w1
       |  FROM t, unnest(range(0, len(t))) r(p)),
       |j AS (SELECT pos.doc_id, pos.p, u2.c AS c2, u1.c AS c1,
       |    bi.c AS c12, nt.n_total
       |  FROM pos
       |  LEFT JOIN uni u2 ON u2.w = pos.w2
       |  LEFT JOIN uni u1 ON u1.w = pos.w1
       |  LEFT JOIN bi ON bi.w1 = pos.w1 AND bi.w2 = pos.w2
       |  CROSS JOIN nt),
       |costs AS (SELECT doc_id, CASE
       |    WHEN p = 0 THEN ${ln("n_total")} - ${ln("coalesce(c2, 1)")}
       |    WHEN c12 IS NOT NULL THEN ${ln("c1")} - ${ln("c12")}
       |    ELSE $BackoffMicro + ${ln("n_total")} - ${ln("coalesce(c2, 1)")}
       |    END AS mc FROM j)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(mc) AS BIGINT) AS cost_micronats,
       |  CAST(sum(mc) AS BIGINT) // CAST(count(*) AS BIGINT)
       |    AS mean_micronats
       |FROM costs GROUP BY 1""".stripMargin
  }

  /** [[scoreTrigram]]'s oracle over the same caller CTEs `t` / `tr` —
    * counts (all three orders), N, and the full backoff chain
    * re-derived in SQL with [[IntLog.lnMicroSql]].
    */
  def scoreTrigramOracleSql(): String = {
    def ln(e: String) = IntLog.lnMicroSql(e)
    val uniCost = s"${ln("n_total")} - ${ln("coalesce(c2, 1)")}"
    s"""uni AS (SELECT u AS w, count(*) AS c FROM tr, unnest(t) x(u)
       |  GROUP BY 1),
       |bi AS ($biCountsSql),
       |tri AS ($triCountsSql),
       |nt AS (SELECT sum(c) AS n_total FROM uni),
       |pos AS (SELECT doc_id, p, t[p+1] AS w2,
       |    CASE WHEN p >= 1 THEN t[p] END AS w1,
       |    CASE WHEN p >= 2 THEN t[p-1] END AS w0
       |  FROM t, unnest(range(0, len(t))) r(p)),
       |j AS (SELECT pos.doc_id, pos.p, u2.c AS c2, u1.c AS c1,
       |    b12.c AS c12, b01.c AS c01, tg.c AS c012, nt.n_total
       |  FROM pos
       |  LEFT JOIN uni u2 ON u2.w = pos.w2
       |  LEFT JOIN uni u1 ON u1.w = pos.w1
       |  LEFT JOIN bi b12 ON b12.w1 = pos.w1 AND b12.w2 = pos.w2
       |  LEFT JOIN bi b01 ON b01.w1 = pos.w0 AND b01.w2 = pos.w1
       |  LEFT JOIN tri tg ON tg.w1 = pos.w0 AND tg.w2 = pos.w1
       |    AND tg.w3 = pos.w2
       |  CROSS JOIN nt),
       |costs AS (SELECT doc_id, CASE
       |    WHEN p = 0 THEN $uniCost
       |    WHEN p >= 2 AND c012 IS NOT NULL THEN ${ln("c01")} - ${ln("c012")}
       |    WHEN p >= 2 AND c12 IS NOT NULL
       |      THEN $BackoffMicro + ${ln("c1")} - ${ln("c12")}
       |    WHEN p >= 2 THEN ${2L * BackoffMicro} + $uniCost
       |    WHEN c12 IS NOT NULL THEN ${ln("c1")} - ${ln("c12")}
       |    ELSE $BackoffMicro + $uniCost
       |    END AS mc FROM j)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(mc) AS BIGINT) AS cost_micronats,
       |  CAST(sum(mc) AS BIGINT) // CAST(count(*) AS BIGINT)
       |    AS mean_micronats
       |FROM costs GROUP BY 1""".stripMargin
  }
}
