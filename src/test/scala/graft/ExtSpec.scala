package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MrcaIdCodec
import graft.ops.Multimodal
import graft.queries.ExtQueries

class ExtSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mrca id codec: pack/unpack roundtrip inside whole-stage codegen") {
    import spark.implicits._
    val df = Seq((123L, 45678L), (0L, 0L), (9999999L, 9999999L)).toDF("a", "b")
      .withColumn("packed", MrcaIdCodec.mrca_pack(col("a"), col("b")))
      .withColumn("ba", MrcaIdCodec.mrca_unpack_a(col("packed")))
      .withColumn("bb", MrcaIdCodec.mrca_unpack_b(col("packed")))
    val rows = df.collect()
    assert(rows.forall(r => r.getAs[Long]("ba") == r.getAs[Long]("a") &&
      r.getAs[Long]("bb") == r.getAs[Long]("b")))
    // the custom expressions must not break codegen (check on a
    // parquet-backed plan; the local relation above constant-folds)
    val plan = ExtQueries.mrcaCodec(spark, sf)
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the simple plan
    assert(plan.contains("*(1) Project") && plan.contains("mrcapack"), plan)
  }

  test("multimodal: stub decode is deterministic and schema-stable") {
    val docs = Multimodal.withMedia(Tables.documents(spark, sf))
    val m1 = Multimodal.extractMeta(spark, docs).collect().map(_.toString).sorted
    val m2 = Multimodal.extractMeta(spark, docs).collect().map(_.toString).sorted
    assert(m1.nonEmpty && m1.sameElements(m2))
    val kinds = ExtQueries.mmMediaMeta(spark, sf)
      .select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }
}
