package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unigram language-model surprisal as a row-local column expression —
  * the perplexity-style quality signal every large-corpus pipeline
  * filters on (a document whose words are all improbable under the
  * corpus LM is boilerplate, noise, or the wrong language). Same
  * literal-codebook pattern as [[Bpe]]: the model is a compile-time
  * word → surprisal table, so the score is a deterministic pure
  * function both engines replay exactly.
  *
  * Numerics are INTEGER millinats end to end: each table entry is
  * round(1000·ln(total/count)) computed once at training time, OOV
  * words cost a fixed ceiling (max observed surprisal + 2 nats), and a
  * document's score is the integer SUM of its word costs — no ln() at
  * query time, no float accumulation order, no cross-engine ulp drift
  * (the lesson behind every float rule in this repo's oracle
  * pitfalls). Mean surprisal, when wanted, is integer division of
  * (total, n) — both carried in the output so the caller picks the
  * rounding.
  *
  * Table: trained on the `documents` corpus word frequencies
  * (lowercased, whitespace-split, '|' stripped — the [[Bpe]]
  * normalization), most-frequent-first, lexicographic tie-break;
  * 31 words cover this corpus's vocabulary. Retraining at another
  * scale only changes the literal.
  */
object Unigram {

  /** word → surprisal in millinats, round(1000·ln(27165/count)). */
  val table: Seq[(String, Long)] = Seq(
    "join" -> 3339L, "hash" -> 3356L, "row" -> 3361L, "batch" -> 3367L,
    "scan" -> 3368L, "column" -> 3370L, "customer" -> 3370L,
    "filter" -> 3371L, "small" -> 3377L, "merge" -> 3387L, "slow" -> 3387L,
    "order" -> 3394L, "vector" -> 3394L, "line" -> 3396L, "data" -> 3398L,
    "table" -> 3398L, "agg" -> 3406L, "value" -> 3411L, "key" -> 3412L,
    "stream" -> 3421L, "window" -> 3423L, "a" -> 3430L, "spark" -> 3430L,
    "group" -> 3432L, "part" -> 3432L, "big" -> 3434L, "sort" -> 3439L,
    "query" -> 3440L, "fast" -> 3460L, "the" -> 3476L, "dup" -> 6952L)

  /** OOV ceiling: max observed surprisal + 2000 millinats. */
  val oovMillinats: Long = 8952L

  private def tableCol: Column =
    map(table.flatMap { case (w, v) => Seq(lit(w), lit(v)) }: _*)

  /** (n_tokens, surprise_millinats) of a document as a struct — one
    * pass over the token array; empty docs are (0, 0). The cleaned
    * array is bound ONCE through the single-element-array transform
    * fence (the winnowSelectCol lesson, see
    * [[graft.ops.TextOps.chunksOfTokens]]) so `toks` may be the
    * tokenizer expression itself — every reference below goes through
    * the lambda variable, never re-running the chain.
    */
  def surpriseOfTokens(toks: Column): Column =
    element_at(transform(array(filter(toks, t => t =!= lit(""))), cl => {
      val total = aggregate(cl, lit(0L), (acc, t) =>
        acc + coalesce(element_at(tableCol, t), lit(oovMillinats)))
      when(cl.isNotNull,
        struct(size(cl).cast("long").as("n_tokens"),
          total.as("surprise_millinats")))
    }), 1)

  private def q(s: String) = s.replace("'", "''")

  /** The same scorer as DuckDB SQL over a token-list expression. */
  def surpriseSql(toksExpr: String): String = {
    val m = table.map { case (w, v) => s"'${q(w)}': ${v}" }
      .mkString("MAP {", ", ", "}")
    s"coalesce(list_sum(list_transform($toksExpr, " +
      s"t -> coalesce(map_extract($m, t)[1], $oovMillinats))), 0)"
  }

  // ---- bigram conditional model ----

  /** "w1 w2" → round(1000·ln(count(w1)/count(w1 w2))) millinats — the
    * conditional surprisal of w2 given w1, trained on the same corpus
    * with the same tie-break. 64 most frequent bigrams.
    */
  val bigramTable: Seq[(String, Long)] = Seq(
    "table hash" -> 2940L, "part filter" -> 2949L, "customer join" -> 3033L,
    "merge group" -> 3016L, "slow key" -> 3016L, "vector small" -> 3009L,
    "big order" -> 2991L, "filter hash" -> 3054L, "filter small" -> 3054L,
    "merge order" -> 3038L, "row a" -> 3065L, "sort a" -> 2987L,
    "batch agg" -> 3081L, "row customer" -> 3088L, "slow query" -> 3061L,
    "slow small" -> 3061L, "table merge" -> 3050L, "agg table" -> 3066L,
    "batch scan" -> 3105L, "column big" -> 3102L, "customer vector" -> 3102L,
    "line customer" -> 3076L, "query join" -> 3032L, "value table" -> 3061L,
    "data customer" -> 3098L, "filter query" -> 3125L, "filter scan" -> 3125L,
    "join key" -> 3158L, "join row" -> 3158L, "merge column" -> 3109L,
    "merge customer" -> 3109L, "merge hash" -> 3109L, "part column" -> 3064L,
    "part stream" -> 3064L, "query merge" -> 3056L, "scan customer" -> 3128L,
    "scan table" -> 3128L, "spark big" -> 3066L, "a slow" -> 3091L,
    "column line" -> 3151L, "filter merge" -> 3150L, "filter row" -> 3150L,
    "hash vector" -> 3164L, "join vector" -> 3182L, "key filter" -> 3109L,
    "small join" -> 3144L, "small stream" -> 3144L, "small vector" -> 3144L,
    "sort slow" -> 3082L, "spark line" -> 3091L, "table line" -> 3122L,
    "value query" -> 3110L, "window customer" -> 3098L,
    "window table" -> 3098L, "a table" -> 3116L, "agg value" -> 3140L,
    "batch row" -> 3179L, "batch stream" -> 3179L, "fast hash" -> 3086L,
    "hash stream" -> 3190L, "join data" -> 3208L, "join group" -> 3208L,
    "key line" -> 3134L, "key order" -> 3134L)

  /** Backoff penalty for an unseen bigram: ln(2) millinats on top of
    * the unigram cost (stupid-backoff with α = 0.5, integerized).
    */
  val backoffMillinats: Long = 693L

  private def bigramCol: Column =
    map(bigramTable.flatMap { case (w, v) => Seq(lit(w), lit(v)) }: _*)

  private def uniCost(t: Column): Column =
    coalesce(element_at(tableCol, t), lit(oovMillinats))

  /** (n_tokens, surprise_millinats) under the BIGRAM model with
    * stupid-backoff: the first word costs its unigram surprisal, each
    * following word the conditional bigram cost when the pair is in
    * the table, else its unigram cost + [[backoffMillinats]]. Still
    * one row-local pass, still pure integers.
    */
  def bigramSurpriseOfTokens(toks: Column): Column =
    element_at(transform(array(filter(toks, t => t =!= lit(""))), cl => {
      // `cl` is the lambda variable — a leaf. Without this fence the
      // element_at(clean, i-1)/element_at(clean, i) references inside
      // the merge lambda would re-inline the whole tokenizer chain per
      // array element: O(n²) per document, minutes on a 5k-word row.
      val n = size(cl)
      val first = when(n >= 1, uniCost(element_at(cl, 1))).otherwise(0L)
      val rest = aggregate(
        when(n >= 2, sequence(lit(2), n))
          .otherwise(array().cast("array<int>")),
        lit(0L),
        (acc, i) => {
          val pair = concat(element_at(cl, i - 1), lit(" "),
            element_at(cl, i))
          acc + coalesce(element_at(bigramCol, pair),
            uniCost(element_at(cl, i)) + lit(backoffMillinats))
        })
      when(cl.isNotNull,
        struct(n.cast("long").as("n_tokens"),
          (first + rest).as("surprise_millinats")))
    }), 1)

  /** The bigram scorer as DuckDB SQL over a token-list expression. */
  def bigramSurpriseSql(toksExpr: String): String = {
    val um = table.map { case (w, v) => s"'${q(w)}': ${v}" }
      .mkString("MAP {", ", ", "}")
    val bm = bigramTable.map { case (w, v) => s"'${q(w)}': ${v}" }
      .mkString("MAP {", ", ", "}")
    def uni(t: String) = s"coalesce(map_extract($um, $t)[1], $oovMillinats)"
    s"(CASE WHEN len($toksExpr) >= 1 THEN ${uni(s"($toksExpr)[1]")} " +
      "ELSE 0 END) + " +
      s"coalesce(list_sum(list_transform(range(2, len($toksExpr) + 1), " +
      s"i -> coalesce(map_extract($bm, " +
      s"($toksExpr)[CAST(i - 1 AS INT)] || ' ' || " +
      s"($toksExpr)[CAST(i AS INT)])[1], " +
      s"${uni(s"($toksExpr)[CAST(i AS INT)]")} + $backoffMillinats))), 0)"
  }
}
