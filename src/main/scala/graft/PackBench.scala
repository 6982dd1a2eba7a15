package graft

import org.apache.spark.sql.functions._

/** Shard-scale probe for [[graft.ops.PackOps.packFfd]]: a shard is ONE
  * task running a sequential first-fit fold, so the per-document
  * lookup cost is the whole job at production shard sizes. The
  * distribution here is the linear scan's adversary: half the
  * documents are just over ctxLen/2 tokens (every one opens its own
  * bin and no two share), half just under (nothing fits them, but a
  * linear first-fit scans EVERY open bin before opening a new one —
  * quadratic in shard size). The segment-tree lookup must keep the
  * fold near-linear: the probe drives 1M documents through ONE md5
  * shard (ids filtered to a single first hex digit — the operator's
  * own shard routing, not a test backdoor), times the fold at N/4 and
  * N, and requires the ratio to stay far under the quadratic's 16×.
  * Self-verifying: bins never overfill, every doc is placed once, and
  * the adversarial bin count is exactly its provable value (one bin
  * per 257-doc, the 256-docs paired two to a bin).
  * Usage: runMain graft.PackBench [nDocsInShard]
  */
object PackBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import graft.ops.PackOps
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val ctx = 512

    def time[A](name: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val v = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"which":"$name","sec":$sec%.2f}""")
      (v, sec)
    }

    // ids whose md5 routes them to shard "0" — the operator's own
    // routing, so the WHOLE corpus lands in one task's fold. ~1/16 of
    // candidates survive; scan 18n to get ≥ n with slack, then cap.
    def shardIds(count: Long) = spark.range(0L, 18L * count)
      .toDF("doc_id")
      .filter(substring(PackOps.shuffleKey(col("doc_id"), "ep0"), 1, 1)
        === "0")
      .limit(count.toInt)
      .localCheckpoint()
    // the adversary: even ids 257 tokens (each opens a bin, remaining
    // 255), odd ids 256 (fits nothing open — after the decreasing sort
    // every 257 precedes every 256, so each 256 would linear-scan all
    // n/2 open bins)
    val nTok = when(col("doc_id") % 2 === 0, lit(257L)).otherwise(lit(256L))

    def run(ids: org.apache.spark.sql.DataFrame, label: String) = {
      val (packed, sec) = time(label) {
        val p = PackOps.packFfd(ids, "doc_id", nTok, ctx, "ep0")
          .localCheckpoint()
        p.count()
        p
      }
      (packed, sec)
    }

    val warm = shardIds(10000L)
    run(warm, "warmup_10k") // codegen + shuffle warmup, untimed signal

    val small = shardIds(n / 4)
    val smallN = small.count()
    val (_, secSmall) = run(small, s"ffd_one_shard_${n / 4}")
    val big = shardIds(n)
    val bigN = big.count()
    val (packed, secBig) = run(big, s"ffd_one_shard_$n")

    // self-verification: every doc placed once, in exactly the
    // provable adversarial bin count, with no overfill
    require(smallN == n / 4 && bigN == n, s"id generation came up short")
    val placed = packed.count()
    require(placed == bigN, s"$placed placements for $bigN docs")
    val stats = PackOps.packFfdStats(packed,
      big.select(col("doc_id"), nTok.cast("long").as("n_tok")), ctx)
      .agg(min(col("pad")).as("minPad"), count(lit(1)).as("bins"),
        sum(col("n_docs")).as("docs"))
      .head()
    require(stats.getLong(0) >= 0L, s"overfilled bin: pad ${stats.getLong(0)}")
    // provable adversarial bin count: every 257-doc owns a bin (two
    // can't share 512 and a 257-bin's 255 remaining fits nothing);
    // 256-docs pair up two to a bin (256+256 = 512 exactly)
    val nLarge = big.filter(col("doc_id") % 2 === 0).count()
    val nSmall = bigN - nLarge
    val wantBins = nLarge + (nSmall + 1) / 2
    require(stats.getLong(1) == wantBins,
      s"adversarial bin count: ${stats.getLong(1)} bins, provable " +
        s"value $wantBins ($nLarge large + ceil($nSmall/2) paired small)")
    // near-linear scaling: 4× the docs through one task must cost far
    // under the quadratic's 16× (tree: ~4×; generous bound for noise)
    val ratio = secBig / math.max(secSmall, 0.01)
    println(f"""{"docs":$bigN,"sec_small":$secSmall%.2f,""" +
      f""""sec_big":$secBig%.2f,"ratio":$ratio%.2f,"agree":true}""")
    require(ratio < 9.0,
      f"per-doc cost is not flat: 4x docs cost $ratio%.1fx " +
        "(quadratic first-fit would be ~16x)")

    // document the gap the tree closes: drive the SAME adversarial
    // fold driver-side at 100k docs through (a) the replaced linear
    // scan and (b) the shipped FirstFitTree — pure Scala, one thread,
    // identical inputs and outputs (asserted). The linear form is
    // quadratic here, so 100k is already minutes-scale territory at
    // the 1M shard the distributed probe above runs in seconds.
    val m = 100000
    val sizes = Array.tabulate(m)(i => if (i < m / 2) 257L else 256L)
    val t0 = System.nanoTime()
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    val linOut = sizes.map { nt =>
      var i = 0
      while (i < bins.length && bins(i) < nt) i += 1
      if (i < bins.length) { val o = ctx - bins(i); bins(i) -= nt; (i, o) }
      else { bins += (ctx - nt); (bins.length - 1, 0L) }
    }
    val linSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val tree = new graft.ops.PackOps.FirstFitTree(ctx.toLong)
    val treeOut = sizes.map(nt => tree.place(nt))
    val treeSec = (System.nanoTime() - t1) / 1e9
    require(linOut.zip(treeOut).forall { case ((b1, o1), (b2, o2)) =>
      b1.toLong == b2 && o1 == o2 }, "tree diverged from the linear scan")
    println(f"""{"linear_scan_100k_sec":$linSec%.2f,""" +
      f""""segment_tree_100k_sec":$treeSec%.3f,"identical":true}""")
    spark.stop()
  }
}
