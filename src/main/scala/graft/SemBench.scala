package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{VectorOps, VectorStore}

/** Semantic-dedup economics at scale, self-verifying with PLANTED
  * near-duplicates: ids [half, n) are ε-perturbed copies of ids
  * [0, half), so the true near-dup pair set is known by construction
  * (random 32-dim ±1 vectors are mutually ~orthogonal, so nothing else
  * crosses a 0.8 cosine threshold).
  *
  * Measures three things the operators claim:
  * 1. bucketed pairs ([[VectorOps.nearDupPairsBucketed]]) vs the brute
  *    all-pairs form at a size where brute is still feasible — the
  *    bucketed result must be a subset of brute with ≥98% planted
  *    recall (a twin can straddle a Voronoi edge; that is the
  *    documented trade, and the probe prints the actual recall);
  * 2. bucketed pairs at 10× that size, where brute (n²/2 kernels)
  *    is out of reach — the Σ|cell|² shape must stay in seconds;
  * 3. the incremental frontier ([[VectorStore.frontier]]): history
  *    persisted once, the twin batch + fresh rows probed against it —
  *    twins must be flagged dup, fresh rows must survive.
  *
  * Usage: runMain graft.SemBench [nSmall] [dims] [cells]
  */
object SemBench {
  def main(args: Array[String]): Unit = {
    val nSmall = args.headOption.map(_.toLong).getOrElse(20000L)
    val dims = args.lift(1).map(_.toInt).getOrElse(32)
    val cells = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    val thr = 0.8

    // deterministic components in [-1,1) from a salted md5
    def h(salt: String, idCol: Column, d: Column): Column =
      conv(substring(md5(concat(lit(salt), idCol, lit(":"), d)), 1, 8),
        16, 10).cast("double") / lit((1L << 32).toDouble) * 2.0 - 1.0
    def base(idCol: Column): Column =
      transform(sequence(lit(0), lit(dims - 1)), d => h("b:", idCol, d))
    // twin = base(id - half) + 0.01·noise(id): cosine to its original
    // ≈ 0.9997, far above thr; cosine between unrelated vectors ≈ 0
    def corpusOf(n: Long): DataFrame = {
      val half = n / 2
      spark.range(0L, n).toDF("id").select(col("id"),
        when(col("id") < half, base(col("id")))
          .otherwise(zip_with(base(col("id") - half),
            transform(sequence(lit(0), lit(dims - 1)),
              d => h("n:", col("id"), d)),
            (b, no) => b + no * lit(0.01))).as("vec"))
        .localCheckpoint()
    }
    val cents = spark.range(1000000000L, 1000000000L + cells).toDF("id")
      .select((col("id") - 1000000000L).as("cid"), base(col("id")).as("cvec"))
      .localCheckpoint()

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def pairSet(df: DataFrame) = df.select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // 1. comparable size: bucketed ⊆ brute, planted recall printed
    val small = corpusOf(nSmall)
    val halfS = nSmall / 2
    val brute = timed(s"brute all-pairs n=$nSmall (n²/2 kernels)") {
      pairSet(VectorOps.nearDupPairs(small, thr))
    }
    val bucketed = timed(s"bucketed pairs n=$nSmall cells=$cells") {
      pairSet(VectorOps.nearDupPairsBucketed(small, cents, thr))
    }
    require(bucketed.subsetOf(brute), "bucketed invented a pair")
    val planted = (0L until halfS).map(i => (i, i + halfS)).toSet
    val bruteRecall = (brute intersect planted).size.toDouble / planted.size
    val buckRecall = (bucketed intersect planted).size.toDouble / planted.size
    println(f"planted recall: brute $bruteRecall%.4f, bucketed $buckRecall%.4f")
    require(bruteRecall >= 0.999, s"brute missed planted twins: $bruteRecall")
    require(buckRecall >= 0.98,
      s"bucketed recall $buckRecall below the co-cell expectation")
    require((brute -- planted).size <= planted.size / 100,
      "random vectors crossed the threshold — generator broken")

    // 2. 10× size: brute would be 100× the kernels; bucketed must hold.
    // Run at the SAME cell count (under-provisioned: Σ|cell|² grows
    // with (n/cells)²) and at 4× the cells — the honest tuning knob:
    // cells should grow with the corpus to hold per-cell population,
    // exactly as an IVF index scales its centroid count
    val big = corpusOf(nSmall * 10)
    val bigPairs = timed(s"bucketed pairs n=${nSmall * 10} cells=$cells " +
        "(brute infeasible here)") {
      VectorOps.nearDupPairsBucketed(big, cents, thr).count()
    }
    println(s"pairs found at 10x: $bigPairs (planted ${nSmall * 5})")
    val cents4 = spark.range(1000000000L, 1000000000L + cells * 4L)
      .toDF("id")
      .select((col("id") - 1000000000L).as("cid"), base(col("id")).as("cvec"))
      .localCheckpoint()
    val bigPairs4 = timed(s"bucketed pairs n=${nSmall * 10} cells=" +
        s"${cells * 4} (cells scaled with n — Σ|cell|² divided by ~16)") {
      VectorOps.nearDupPairsBucketed(big, cents4, thr).count()
    }
    println(s"pairs found at 10x/4x-cells: $bigPairs4")

    // 3. frontier: history [0, half) persisted; batch = twins + fresh
    val dir = java.nio.file.Files.createTempDirectory("graft_sembench")
      .toString
    val nBig = nSmall * 10
    val halfB = nBig / 2
    timed(s"persist history n=$halfB as IVF store") {
      VectorStore.save(big.filter(col("id") < halfB), cents, dir)
    }
    val fresh = spark.range(2000000000L, 2000000000L + halfB / 10)
      .toDF("id").select(col("id"), base(col("id")).as("vec"))
    val batch = big.filter(col("id") >= halfB).unionByName(fresh)
    val st = VectorStore.load(spark, dir)
    val kept = timed(s"frontier: batch=${halfB + halfB / 10} vs " +
        s"history=$halfB (history never rescanned)") {
      VectorStore.frontier(st, batch, thr)
        .select(col("id")).collect().map(_.getLong(0)).toSet
    }
    val twinsKept = kept.count(_ < 2000000000L)
    val freshKept = kept.count(_ >= 2000000000L)
    println(s"twins surviving (should be ~0): $twinsKept of $halfB; " +
      s"fresh surviving (should be ~all): $freshKept of ${halfB / 10}")
    require(twinsKept <= halfB / 50, s"frontier missed dups: $twinsKept")
    require(freshKept >= halfB / 10 * 99 / 100,
      s"frontier dropped fresh rows: $freshKept")
    spark.stop()
  }
}
