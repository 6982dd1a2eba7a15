package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.ClusterOps.pageRank]]: the per-round
  * claim is that only the O(nodes) rank vector moves — the edge table
  * streams from its partitioned cache — and that a pathological hub
  * (one node receiving a constant fraction of ALL edges) costs nothing
  * extra, because the contribution sum combines map-side so the hub's
  * reducer receives #partitions rows, never its in-degree.
  *
  * Graph: n nodes, 4n edges; 25% of all edges point at node 0 (the
  * hub), the rest land hash-uniformly; sources are hash-uniform. The
  * probe times uniform-vs-hub at the same size (the hub must NOT be
  * slower) and doubles n to show per-round cost tracks edges linearly,
  * then self-verifies: total rank mass is conserved up to integer-floor
  * loss and dangling leakage (mass never increases), the hub outranks
  * every uniform node, and a seeded personalized run confines nonzero
  * rank to nodes reachable from the seeds.
  * Usage: runMain graft.PrBench [nNodes]
  */
object PrBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import graft.ops.ClusterOps
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }
    def edgesOf(nn: Long, hub: Boolean) = {
      val e = spark.range(0L, 4L * nn).toDF("i")
        .select(pmod(xxhash64(col("i"), lit("s")), lit(nn)).as("src"),
          (if (hub)
            when(pmod(col("i"), lit(4L)) === 0L, lit(0L))
              .otherwise(pmod(xxhash64(col("i"), lit("d")), lit(nn)))
          else pmod(xxhash64(col("i"), lit("d")), lit(nn))).as("dst"))
      e.localCheckpoint()
    }
    val nodes = spark.range(0L, n).toDF("id").localCheckpoint()

    val uni = edgesOf(n, hub = false)
    val hub = edgesOf(n, hub = true)
    // warm codegen on a small run
    ClusterOps.pageRank(uni.limit(1000), nodes.limit(100), iters = 1).count()
    val rUni = time(s"uniform_${n}_4it") {
      ClusterOps.pageRank(uni, nodes, iters = 4).localCheckpoint()
    }
    val rHub = time(s"hub25pct_${n}_4it") {
      ClusterOps.pageRank(hub, nodes, iters = 4).localCheckpoint()
    }
    // hub must dominate: its rank above every non-hub node's
    val hubRank = rHub.filter(col("id") === 0L).head().getLong(1)
    val maxOther = rHub.filter(col("id") =!= 0L)
      .agg(max(col("rank_micro"))).head().getLong(0)
    require(hubRank > maxOther,
      s"hub rank $hubRank not above max other $maxOther")
    // mass conservation: total <= n * 1e6 (floor loss + dangling leak
    // only ever SHRINK mass). The 20% slack covers BOTH: hash-uniform
    // source assignment of 4n edges leaves ~e^-4 ≈ 1.8% of nodes
    // dangling, each leaking its mass every iteration — do not tighten
    // this bound to floor-loss-only
    val mass = BigDecimal(
      rUni.agg(sum(col("rank_micro").cast("decimal(38,0)")))
        .head().getDecimal(0))
    val full = BigDecimal(n) * BigDecimal(1000000L)
    require(mass <= full && mass > full * 0.8,
      s"mass $mass vs full $full")
    println(s"""{"hub_rank":$hubRank,"max_other":$maxOther,"agree":true}""")

    // linear scaling: double the graph, per-iteration cost ~2x not 4x
    val n2 = n * 2
    val nodes2 = spark.range(0L, n2).toDF("id").localCheckpoint()
    val uni2 = edgesOf(n2, hub = false)
    time(s"uniform_${n2}_4it") {
      ClusterOps.pageRank(uni2, nodes2, iters = 4).count()
    }

    // personalized reachability: seeds in [0, 100); with edges only
    // from even to even nodes... simpler: a two-island graph — edges
    // stay within each half — PPR seeded in the lower half must leave
    // the upper half at exactly zero
    val half = n / 2
    val isl = spark.range(0L, 2L * n).toDF("i")
      .select(pmod(xxhash64(col("i"), lit("a")), lit(half)).as("src"),
        pmod(xxhash64(col("i"), lit("b")), lit(half)).as("dst"))
      .union(spark.range(0L, 2L * n).toDF("i")
        .select((pmod(xxhash64(col("i"), lit("c")), lit(half)) + half)
          .as("src"),
          (pmod(xxhash64(col("i"), lit("d")), lit(half)) + half).as("dst")))
      .localCheckpoint()
    val seeds = spark.range(0L, 100L).toDF("id")
    val ppr = time(s"ppr_two_islands_${n}_3it") {
      ClusterOps.personalizedPageRank(isl, nodes, seeds, iters = 3)
        .localCheckpoint()
    }
    val leaked = ppr.filter(col("id") >= half && col("rank_micro") > 0L)
      .count()
    require(leaked == 0L, s"$leaked unreachable nodes got nonzero rank")
    println(s"""{"ppr_leak":0,"agree":true}""")

    // fixed-point early stop == forced extra rounds, bit for bit: run
    // the monotone map to convergence (dangling redistribution on — the
    // hub graph leaves ~e⁻⁴ of nodes dangling), then again with 5 FORCED
    // extra rounds. Idempotence past the fixed point is exactly what
    // lets the unrolled oracle at any depth ≥ convergence hash-match the
    // early-stopped engine.
    val nf = math.max(n / 8, 10000L)
    val nodesF = spark.range(0L, nf).toDF("id").localCheckpoint()
    val ef = edgesOf(nf, hub = true)
    val fp = time(s"fixed_point_$nf") {
      val r = ClusterOps.pageRankFixedPoint(ef, nodesF, maxRounds = 60,
        dampingMilli = 500, redistributeDangling = true)
      r.ranks.count(); r
    }
    val again = ClusterOps.pageRankFixedPoint(ef, nodesF, maxRounds = 80,
      dampingMilli = 500, redistributeDangling = true,
      minRounds = fp.rounds + 5)
    val drifted = fp.ranks.withColumnRenamed("rank_micro", "a")
      .join(again.ranks.withColumnRenamed("rank_micro", "b"), "id")
      .filter(col("a") =!= col("b")).count()
    require(drifted == 0L,
      s"$drifted ranks changed after forced extra rounds")
    println(s"""{"fp_rounds":${fp.rounds},"idempotent":true}""")

    // store-served vs rebuild A/B: pageRank pays prEdgeCache's
    // repartition+sort+persist on EVERY call; a persisted GraphStore
    // pays the bucketed layout once at save, and each rank job then
    // pins the pre-co-located scan (no shuffle in the build). The
    // second serve shows the steady state a repeated-centrality
    // deployment actually runs — and answers must agree bit for bit.
    val gdir = java.nio.file.Files.createTempDirectory("graft_prb_gs")
      .toString + "/g"
    time(s"graph_store_save_$n") {
      graft.ops.GraphStore.save(spark, uni, gdir)
    }
    val st = graft.ops.GraphStore.load(spark, gdir)
    val s1 = time(s"served_${n}_4it") {
      ClusterOps.pageRankStored(st, iters = 4).localCheckpoint()
    }
    time(s"served_again_${n}_4it") {
      ClusterOps.pageRankStored(st, iters = 4).count()
    }
    time(s"rebuild_${n}_4it") {
      ClusterOps.pageRank(uni, nodes, iters = 4).count()
    }
    val storeDrift = rUni.withColumnRenamed("rank_micro", "a")
      .join(s1.withColumnRenamed("rank_micro", "b"), "id")
      .filter(col("a") =!= col("b")).count()
    require(storeDrift == 0L, s"$storeDrift served ranks diverge")
    println(s"""{"store_served_agree":true}""")

    // batched personalization A/B: 8 probe sets ranked in ONE loop
    // (personalizedPageRankMultiStored — (set_id, id)-keyed mass) vs 8
    // sequential store-served jobs. The batched loop pays the edge join
    // once per round for ALL sets; the sequential form re-pays the
    // whole iteration floor per set — the gap is the batching win the
    // contamination-tracing workload (many suspect sets, one graph)
    // collects. Answers must agree bit for bit per set.
    val sets8 = spark.range(0L, 800L).toDF("i")
      .select((col("i") % 8L).as("set_id"),
        pmod(xxhash64(col("i"), lit("seed8")), lit(n)).as("id"))
      .localCheckpoint()
    // SYMMETRIC terminal action on both sides (localCheckpoint): a
    // count-only sequential side would skip the row materialization the
    // batched side pays, overstating the batching win
    val batched = time(s"ppr_batched_8x_${n}_3it") {
      ClusterOps.personalizedPageRankMultiStored(st, sets8, iters = 3)
        .localCheckpoint()
    }
    time(s"ppr_sequential_8x_${n}_3it") {
      (0 until 8).foreach { k =>
        ClusterOps.personalizedPageRankStored(st,
          sets8.filter(col("set_id") === k).select(col("id")),
          iters = 3).localCheckpoint()
      }
    }
    val single3 = ClusterOps.personalizedPageRankStored(st,
      sets8.filter(col("set_id") === 3L).select(col("id")), iters = 3)
      .localCheckpoint()
    val b3 = batched.filter(col("set_id") === 3L)
    // universe equality as SET equality (both exceptAll directions), not
    // a count compare — equal-size but different-membership universes
    // would otherwise pass, with the inner join below silently dropping
    // the mismatched ids
    require(b3.select(col("id")).exceptAll(single3.select(col("id")))
        .isEmpty &&
      single3.select(col("id")).exceptAll(b3.select(col("id"))).isEmpty,
      "batched set-3 universe differs from the single-set kernel's")
    val pprDrift = b3.withColumnRenamed("rank_micro", "a")
      .join(single3.withColumnRenamed("rank_micro", "b"), "id")
      .filter(col("a") =!= col("b")).count()
    require(pprDrift == 0L, s"$pprDrift batched ranks diverge from the " +
      "single-set kernel")
    println(s"""{"ppr_multi_agree":true}""")

    // warm-start PROBE (adversarial, driver-side — small graph, same
    // integer map): after a GraphStore.append, may the fixed-point
    // iteration restart from the PREVIOUS fixed point instead of base?
    // The termination proof needs the start to be a LOWER bound of the
    // new least fixed point; edge additions BREAK that — adding
    // out-edges to a ranked node dilutes its per-edge contribution
    // (deg grows), so its old targets' new fixed point drops BELOW
    // their old one. This probe constructs exactly that and requires
    // the violation to be real; the refusal is documented at
    // pageRankFixedPointStored. (The warm iterates, squeezed above the
    // least fixed point, may still land on a HIGHER fixed point of the
    // integer map — observed drift is reported either way.)
    {
      val dm = 500L
      val base = (1000L - dm) * 1000L
      def fpFrom(edges: Seq[(Int, Int)], start: Map[Int, Long],
          nn: Int): Map[Int, Long] = {
        val deg = edges.groupBy(_._1).map { case (u, xs) => u -> xs.size }
        var r = start
        var moved = true
        var rounds = 0
        while (moved && rounds < 500) {
          val in = edges.groupBy(_._2).map { case (v, xs) =>
            v -> xs.map { case (u, _) => r(u) / deg(u) }.sum
          }
          val nxt = (0 until nn).map(v =>
            v -> (base + dm * in.getOrElse(v, 0L) / 1000L)).toMap
          moved = nxt != r
          r = nxt
          rounds += 1
        }
        r
      }
      val nn = 30
      val eA = Seq(0 -> 1, 0 -> 2, 10 -> 0, 11 -> 0, 12 -> 0) ++
        (13 until 25).map(i => i -> (i - 12))
      val baseStart = (0 until nn).map(_ -> base).toMap
      val fpA = fpFrom(eA, baseStart, nn)
      // the append: node 0 gains 8 new out-edges — its per-edge share
      // to old targets 1 and 2 is diluted
      val eB = eA ++ (20 until 28).map(0 -> _)
      val fpB = fpFrom(eB, baseStart, nn)
      val diluted = (0 until nn).filter(v => fpB(v) < fpA(v))
      require(diluted.nonEmpty,
        "dilution did not reduce any rank — probe construction broken")
      val warm = fpFrom(eB, fpA, nn)
      val warmDrift = (0 until nn).count(v => warm(v) != fpB(v))
      println(s"""{"warm_start_lower_bound_violated":true,""" +
        s""""diluted_nodes":${diluted.size},""" +
        s""""warm_drift_components":$warmDrift}""")
    }

    // the PRODUCTION variant's A/B: fixed-point iteration (converged
    // ranks + dangling redistribution) served from the store vs the
    // per-call prEdgeCache rebuild — the variant a deployment actually
    // runs, over the hub graph whose ~e⁻⁴ dangling nodes make the
    // redistribution term real. Node universe = the store's own (edge
    // endpoints): the A/B must iterate identical maps, and the hash
    // ranges leave ~e⁻⁸ of ids out of the edge list entirely.
    val fdir = java.nio.file.Files.createTempDirectory("graft_prb_fp")
      .toString + "/g"
    time(s"fp_store_save_$nf") {
      graft.ops.GraphStore.save(spark, ef, fdir)
    }
    val fst = graft.ops.GraphStore.load(spark, fdir)
    val fpServed = time(s"fp_served_$nf") {
      val r = ClusterOps.pageRankFixedPointStored(fst, maxRounds = 60,
        dampingMilli = 500, redistributeDangling = true)
      r.ranks.localCheckpoint(); r
    }
    time(s"fp_served_again_$nf") {
      ClusterOps.pageRankFixedPointStored(fst, maxRounds = 60,
        dampingMilli = 500, redistributeDangling = true).ranks.count()
    }
    val fpRebuild = time(s"fp_rebuild_$nf") {
      val r = ClusterOps.pageRankFixedPoint(ef, fst.nodes, maxRounds = 60,
        dampingMilli = 500, redistributeDangling = true)
      r.ranks.localCheckpoint(); r
    }
    require(fpServed.rounds == fpRebuild.rounds,
      s"served converged in ${fpServed.rounds} rounds, " +
        s"rebuild in ${fpRebuild.rounds}")
    // node-universe equality BEFORE the value compare: an inner join
    // would silently skip ids present on only one side — the exact
    // has_out/node-derivation regression this A/B exists to catch
    val (nServed, nRebuild) =
      (fpServed.ranks.count(), fpRebuild.ranks.count())
    require(nServed == nRebuild,
      s"served ranks cover $nServed nodes, rebuild $nRebuild")
    val fpDrift = fpServed.ranks.withColumnRenamed("rank_micro", "a")
      .join(fpRebuild.ranks.withColumnRenamed("rank_micro", "b"), "id")
      .filter(col("a") =!= col("b")).count()
    require(fpDrift == 0L, s"$fpDrift fixed-point served ranks diverge")
    println(s"""{"fp_store_served_agree":true,"fp_rounds":${fpServed.rounds}}""")
    spark.stop()
  }
}
