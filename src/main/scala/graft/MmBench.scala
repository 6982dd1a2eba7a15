package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal-decode throughput probe: N real media byte streams (PNG /
  * WAV / AVI round-robin, encoded distributed) flow through the REAL
  * [[Multimodal.extractMeta]] partition-batched decode path, reporting
  * rows/sec for the decode stage alone (the fixture is materialized via
  * localCheckpoint first, so encode cost stays out of the timed region).
  *
  * Self-verifying like EvBench: the per-kind n_frames totals have closed
  * forms under REAL decode (image 1/row, audio 50/row, video 100/row)
  * that the arithmetic stub cannot produce for these payloads, so a
  * silent fall-back to the stub fails the probe instead of being timed
  * as a success.
  *
  * Usage: runMain graft.MmBench [nRows]
  */
object MmBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import spark.implicits._

    val media = spark.range(0L, n).as[Long].mapPartitions { ids =>
      ids.map { i =>
        (i % 3L) match {
          case 0L => Multimodal.MediaRow(i,
            Multimodal.encodePng((i % 4 + 1).toInt, (i % 3 + 1).toInt,
              seed = i.toInt), "image")
          case 1L => Multimodal.MediaRow(i,
            Multimodal.encodeWav(8000, 1, 50, seed = i.toInt), "audio")
          case _ => Multimodal.MediaRow(i,
            Multimodal.encodeAvi(320, 180, 100), "video")
        }
      }
    }.toDF().localCheckpoint()

    val t0 = System.nanoTime()
    val perKind = Multimodal.extractMeta(spark, media).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("rows"), sum(col("n_frames")).as("frames"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val secs = (System.nanoTime() - t0) / 1e9

    // closed forms: range splits n into kinds by residue class (kinds
    // with zero rows produce no groupBy row, so drop them from `want`
    // too — otherwise nRows < 3 fails spuriously)
    def rowsOf(res: Long): Long = (n - res + 2) / 3
    val want = Map(
      "image" -> (rowsOf(0), rowsOf(0) * 1L),
      "audio" -> (rowsOf(1), rowsOf(1) * 50L),
      "video" -> (rowsOf(2), rowsOf(2) * 100L))
      .filter(_._2._1 > 0)
    require(perKind == want,
      s"decode self-check failed: got $perKind, expected $want — " +
        "a kind fell back to the stub")
    val rps = (n / secs).toLong
    // scalastyle:off println
    println(s"""{"mode":"decode_meta","rows":$n,"sec":$secs,""" +
      s""""rows_per_sec":$rps}""")
    spark.stop()
  }
}
