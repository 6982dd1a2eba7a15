package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence: the co-located-join pattern for repeated big-big
  * joins at scale. Writing both sides bucketed by the join key lets every
  * subsequent join run with ZERO exchanges — the shuffle is paid once at
  * write time instead of per query. This is the deployment answer for
  * "fact ⋈ fact on the same key every day at 100 TB".
  */
class BucketSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed tables join with no shuffle; unbucketed twin exchanges") {
    val wh = Files.createTempDirectory("graft_bucket").toString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val quality = graft.ops.TextOps.quality(Tables.documents(spark, sf),
      "doc_id", "text")

    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/docs_b").saveAsTable("docs_b")
    quality.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/quality_b").saveAsTable("quality_b")

    // force the big-big join shape (at 100 TB neither side broadcasts)
    val oldThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("docs_b").join(spark.table("quality_b"), "doc_id")
        .filter(col("quality_score") > 0.1)
      joined.collect()
      val bucketedPlan = joined.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"), bucketedPlan)
      assert(bucketedPlan.contains("Bucketed: true"), bucketedPlan)

      // the unbucketed twin pays the shuffle: exchange-freeness above is
      // the bucketing, not the optimizer getting lucky
      val plain = docs.join(quality, "doc_id").filter(col("quality_score") > 0.1)
      plain.collect()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))

      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      spark.sql("DROP TABLE IF EXISTS docs_b")
      spark.sql("DROP TABLE IF EXISTS quality_b")
    }
  }
}
