package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents out into fixed-token-budget training
  * sequences (the concat-and-chunk shape LLM pipelines use — documents
  * are concatenated in a deterministic shuffled order and the stream is
  * cut every `ctxLen` tokens).
  *
  * Scale design: one global stream would be a single-partition window —
  * a non-starter at 100 TB. Instead the corpus is split into `16`
  * independent shards by a salted-md5 digit, and each shard is its own
  * pack stream: the window partitions by shard, so offsets are computed
  * in parallel with one hash-partitioned exchange. Shards are
  * independent training streams (files, in practice); the salt doubles
  * as the epoch's shuffle seed, so every epoch gets a different but
  * fully reproducible order.
  */
object PackOps {

  /** Salted deterministic shuffle key (also the epoch seed). */
  def shuffleKey(id: Column, salt: String): Column =
    md5(concat_ws(":", lit(salt), id.cast("string")))

  /** Pack documents into `ctxLen`-token sequences within 16 md5 shards.
    *
    * @param docs     input rows
    * @param idCol    document id column name
    * @param nTokCol  per-document token count expression
    * @return (doc_id, shard, start_off, seq_idx): the document's TOKEN
    *         offset in its shard's concatenated stream and the sequence
    *         (chunk) its first token lands in
    */
  def packSequences(docs: DataFrame, idCol: String, nTokCol: Column,
      ctxLen: Int, salt: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("doc_id"),
      nTokCol.cast("long").as("n_tok"),
      shuffleKey(col(idCol), salt).as("key"))
      .withColumn("shard", substring(col("key"), 1, 1))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("key"), col("doc_id"))
    keyed
      .withColumn("start_off", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("seq_idx",
        floor(col("start_off") / lit(ctxLen.toDouble)).cast("long"))
      .select(col("doc_id"), col("shard"), col("start_off"), col("seq_idx"))
  }

  /** Per-sequence fill statistics — the packing-efficiency audit view:
    * how many documents start in each sequence and how many of its
    * tokens they contribute (cross-boundary tokens attributed to the
    * sequence where the document starts).
    */
  def packStats(packed: DataFrame, nTok: DataFrame): DataFrame =
    packed.join(nTok, "doc_id")
      .groupBy(col("shard"), col("seq_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
}
