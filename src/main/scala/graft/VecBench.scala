package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{VectorOps, VectorStore}

/** Vector-store economics at scale: build an IVF cell layout for N
  * synthetic vectors, then compare an ANN query served from the pruned
  * store (reads nprobe cells' files) against the same query as a full
  * brute-force corpus scan. The store's win is IO-shaped — files never
  * listed, bytes never decoded — so it GROWS with corpus size, while the
  * build cost is a one-time assignment pass + partitioned write.
  *
  *   sbt "runMain graft.VecBench 1000000 64 64"   // n, dims, cells
  */
object VecBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(64)
    val cells = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)

    // deterministic synthetic embeddings: md5-derived components in [-1,1)
    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (conv(substring(md5(concat(col("id"), lit(":"), d)), 1, 8),
          16, 10).cast("double") / lit((1L << 32).toDouble) * 2.0 - 1.0))
        .as("vec"))
    val corpus = vecs(spark.range(0L, n).toDF("id"))
    val cents = vecs(spark.range(0L, cells.toLong).toDF("id"))
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val queries = vecs(spark.range(0L, 8L).toDF("id"))

    val dir = java.nio.file.Files.createTempDirectory("graft_vbench").toString
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    timed(s"build store n=$n dims=$dims cells=$cells") {
      VectorStore.save(corpus, cents, dir)
    }
    val st = VectorStore.load(spark, dir)
    timed("store ANN query (8 queries, k=10, nprobe=2: pruned cells only)") {
      VectorStore.query(st, queries, k = 10, nprobe = 2).count()
    }
    // apples-to-apples IO: the exact same stored files, WITHOUT pruning
    timed("brute-force ANN query (8 queries, k=10: full store scan)") {
      VectorOps.topK(queries,
        st.cells.select(col("id"), col("vec")), 10).count()
    }
    val totalBytes = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
      .map(d => d.listFiles().map(_.length()).sum).sum
    println(s"store bytes on disk: $totalBytes across $cells cells " +
      s"(a query touches ~2/$cells of them)")

    // incremental growth: append a 25%-sized batch — cost must track the
    // batch (one assignment pass + partitioned append), not the store
    val batch = vecs(spark.range(n, n + n / 4).toDF("id"))
    timed(s"append ${n / 4} vectors") {
      VectorStore.append(spark, dir, batch)
    }
    val st2 = VectorStore.load(spark, dir)
    timed("store ANN query after append (reads old + new cells' files)") {
      VectorStore.query(st2, queries, k = 10, nprobe = 2).count()
    }

    // drift meter economics: the retraining-cadence fold
    // (VectorOps.driftStats) reads ONLY its batch — by construction
    // there is no history term (the signature takes the batch and the
    // serving centroids, nothing else), so the per-append cost a
    // maintenance loop pays tracks BATCH rows, demonstrated by timing
    // the same fold at 1× and 4× batch size
    timed(s"driftStats fold over a ${n / 4}-row batch") {
      VectorOps.driftStats(batch, cents).count()
    }
    timed(s"driftStats fold over the full $n-row corpus (4x rows)") {
      VectorOps.driftStats(corpus, cents).count()
    }

    // the PQ-codebook twin (VectorOps.pqDriftStats): same contract —
    // the fold reads only its batch, and the encode half is the
    // scan-local literal projection (no join, no shuffle before the
    // m-rows-per-vector aggregate), so per-append cost tracks batch
    // rows exactly like the centroid meter above
    val m = if (dims % 4 == 0) 4 else 1
    val cb = VectorOps.pqCodebook(corpus, m = m, codes = 16, dim = dims)
      .localCheckpoint()
    timed(s"pqDriftStats fold over a ${n / 4}-row batch") {
      VectorOps.pqDriftStats(batch, cb, m = m, dim = dims).count()
    }
    timed(s"pqDriftStats fold over the full $n-row corpus (4x rows)") {
      VectorOps.pqDriftStats(corpus, cb, m = m, dim = dims).count()
    }
    spark.stop()
  }
}
