package graft
import org.apache.spark.sql.functions._
/** Scratch A/B probe (not shipped): which side of the LM scorer pays for
  * the spread — the trained count tables or the scored corpus.
  */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val raw = spark.read.parquet(s"$d/documents.parquet")
    val par = spark.sparkContext.defaultParallelism
    def sp(df: org.apache.spark.sql.DataFrame) = df.repartition(par, col("doc_id"))
    def run(tag: String, all: org.apache.spark.sql.DataFrame,
        train: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      graft.ops.LmOps.scoreTrigram(all, "doc_id", "text",
        graft.ops.LmOps.trainUnigram(train, "text"),
        graft.ops.LmOps.trainBigram(train, "text"),
        graft.ops.LmOps.trainTrigram(train, "text"),
        broadcastCounts = true).write.format("noop").mode("overwrite").save()
      println(f"$tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val tr = raw.filter(col("doc_id") < 250)
    // warm
    run("warm", raw, tr)
    for (_ <- 1 to 2) {
      run("both-plain   ", raw, tr)
      run("score-spread ", sp(raw), tr)
      run("train-spread ", raw, sp(tr))
      run("both-spread  ", sp(raw), sp(tr))
    }
    spark.stop()
  }
}
