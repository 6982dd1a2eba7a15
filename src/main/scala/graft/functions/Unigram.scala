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
    * pass over the bound token array; empty docs are (0, 0). `toks`
    * must already be the normalized token array
    * (e.g. `split(lower(text), "\\s+")` with the caller's hygiene) so
    * the tokenizer is not re-run per reference.
    */
  def surpriseOfTokens(toks: Column): Column = {
    val clean = filter(toks, t => t =!= lit(""))
    val total = aggregate(clean, lit(0L), (acc, t) =>
      acc + coalesce(element_at(tableCol, t), lit(oovMillinats)))
    when(toks.isNotNull,
      struct(size(clean).cast("long").as("n_tokens"),
        total.as("surprise_millinats")))
  }

  private def q(s: String) = s.replace("'", "''")

  /** The same scorer as DuckDB SQL over a token-list expression. */
  def surpriseSql(toksExpr: String): String = {
    val m = table.map { case (w, v) => s"'${q(w)}': ${v}" }
      .mkString("MAP {", ", ", "}")
    s"coalesce(list_sum(list_transform($toksExpr, " +
      s"t -> coalesce(map_extract($m, t)[1], $oovMillinats))), 0)"
  }
}
