package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Driver-data contract guard: the testdata's physical encodings have
  * changed under us before (TIMESTAMP(NANOS)-as-int64 → TIMESTAMP(micros)
  * NTZ, mid-round), and the breakage surfaced two rounds later as bench
  * errors instead of a red test. These cases pin the ingestion seam: for
  * EVERY encoding the driver has shipped, `Tables.events` must hand
  * downstream operators a plain TimestampType `ts` denoting the same
  * instant.
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestSession._

  // one instant, expressed in each shipped physical encoding
  private val instant = "2024-03-01 12:34:56.789012"
  private def baseRow = {
    import spark.implicits._
    Seq((1L, instant, 2L, "x", 1.5, "{}"))
      .toDF("event_id", "t", "user_id", "event_type", "value", "props")
  }

  private def writeEvents(ts: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft_tables").toString
    baseRow.select(col("event_id"), ts.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def readBack(dir: String): (org.apache.spark.sql.types.DataType, String) = {
    val df = Tables.events(spark, dir)
    val shown = df.select(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head.getString(0)
    (df.schema("ts").dataType, shown)
  }

  test("legacy int64-nanos events normalize to TimestampType, same instant") {
    val dir = writeEvents(unix_micros(to_timestamp(lit(instant))) * 1000L)
    val (dt, shown) = readBack(dir)
    assert(dt == TimestampType)
    assert(shown == instant)
  }

  test("TIMESTAMP_NTZ(micros) events normalize to TimestampType, same instant") {
    val dir = writeEvents(to_timestamp(lit(instant)).cast("timestamp_ntz"))
    // precondition: the raw file really reads back as NTZ — if Spark ever
    // changes its parquet inference this case must be revisited, not
    // silently pass through the `case _` arm
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val (dt, shown) = readBack(dir)
    assert(dt == TimestampType)
    assert(shown == instant)
  }

  test("UTC-adjusted TIMESTAMP(micros) events pass through as TimestampType") {
    val dir = writeEvents(to_timestamp(lit(instant)))
    val (dt, shown) = readBack(dir)
    assert(dt == TimestampType)
    assert(shown == instant)
  }

  test("the driver's CURRENT testdata normalizes to TimestampType") {
    // the live contract: whatever encoding /root/testdata ships today,
    // the seam must deliver TimestampType (this is the case that goes
    // red FIRST on the next silent refresh)
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType)
    // and the normalized instants are sane (not collapsed to 1970 by a
    // wrong-unit division — the failure mode of the last refresh)
    val years = df.select(year(col("ts"))).distinct()
      .collect().map(_.getInt(0))
    assert(years.forall(_ >= 2000), s"suspect years: ${years.mkString(",")}")
  }

  test("driver table schemas match the recorded contract snapshot") {
    // the full-width twin of the events guard: the driver refreshed
    // physical encodings once already (events ts), and the other tables
    // can drift the same way. This snapshot is the engine's read-side
    // contract — when the driver ships a new encoding, THIS test goes
    // red in the same round, and the snapshot (plus any affected
    // operator) is updated deliberately instead of gates erroring later.
    val want = Map(
      "region" -> "r_regionkey int, r_name string",
      "nation" -> "n_nationkey int, n_name string, n_regionkey int",
      "customer" -> ("c_custkey bigint, c_name string, c_nationkey int, " +
        "c_acctbal double, c_mktsegment string"),
      "supplier" -> "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
      "part" -> ("p_partkey bigint, p_name string, p_brand string, " +
        "p_type string, p_size int, p_retailprice double"),
      "orders" -> ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"),
      "lineitem" -> ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, " +
        "l_linenumber int, l_quantity double, l_extendedprice double, " +
        "l_discount double, l_tax double, l_returnflag string, " +
        "l_linestatus string, l_shipdate timestamp_ntz"),
      "documents" -> "doc_id bigint, text string, lang string, source string, n_chars bigint",
      "embeddings" -> "vec_id bigint, embedding array<float>, label int")
    for ((t, exp) <- want) {
      val got = Tables.t(spark, sf, t).schema.fields
        .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(", ")
      assert(got == exp, s"$t schema drifted:\n  got  $got\n  want $exp")
    }
    // events asserted separately above (it passes through the normalize
    // seam); raw read must be one of the encodings that seam understands
    val rawTs = spark.read.parquet(s"$sf/events.parquet")
      .schema("ts").dataType
    assert(Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampNTZType, TimestampType)(rawTs), s"events ts: $rawTs")
  }

  test("raw long ts columns stay untouched by non-events tables") {
    // normalizeEventTs is an events-only seam; generic reads must not
    // rewrite columns (guards against widening the special case)
    val dir = Files.createTempDirectory("graft_tables_raw").toString
    import spark.implicits._
    Seq((1L, 5L)).toDF("id", "ts").write.parquet(s"$dir/orders.parquet")
    assert(Tables.orders(spark, dir).schema("ts").dataType == LongType)
  }
}
