package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SketchOps

/** KMV distinct-count sketch: exact below k, accurate above it, and
  * partition-order independent (the property that makes it oracle-checkable
  * where HLL is not).
  */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact branch: groups with fewer than k distinct values") {
    val df = spark.range(0L, 1000L).toDF("v")
      .withColumn("key", col("v") % 4L)
      .withColumn("dup", explode(sequence(lit(0), lit(2)))) // 3x duplicates
    val r = df.groupBy(col("key"))
      .agg(SketchOps.kmvDistinct(col("v"), k = 512).as("est"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // 250 distinct per key < k=512: estimate IS the exact distinct count
    assert(r.values.forall(_ == 250.0), r)
  }

  test("count-min never undercounts, is exact at ample width, and is " +
      "partition-order independent") {
    val toks = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("item"))
    val exact = toks.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def estimates(width: Int, parts: Int): Map[String, Long] = {
      val sk = SketchOps.cmSketch(toks.repartition(parts), "item", 3, width)
      SketchOps.cmEstimate(sk, toks.distinct(), "item")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // narrow sketch: overestimates allowed, undercounts never
    val narrow = estimates(16, 4)
    assert(narrow.keySet == exact.keySet)
    assert(narrow.forall { case (t, e) => e >= exact(t) },
      narrow.filter { case (t, e) => e < exact(t) })
    assert(narrow.exists { case (t, e) => e > exact(t) },
      "width 16 should actually collide on this fixture")
    // counters are sums: the sketch is identical under any partitioning
    assert(estimates(16, 1) == narrow && estimates(16, 16) == narrow)
    // ample width: every estimate collapses to the exact count
    val wide = estimates(1 << 14, 4)
    assert(wide.forall { case (t, e) => e == exact(t) },
      wide.filter { case (t, e) => e != exact(t) }.take(5))
  }

  test("estimation branch: within KMV error bounds, reproducible across partitionings") {
    val n = 20000L
    val df = spark.range(0L, n).toDF("v").withColumn("key", lit(1L))
    def est(parts: Int): Double =
      df.repartition(parts).groupBy(col("key"))
        .agg(SketchOps.kmvDistinct(col("v"), k = 64).as("est"))
        .head().getDouble(1)
    val e8 = est(8)
    // stderr ~ 1/sqrt(k-2) ~ 12.7%; assert a generous 4-sigma band
    assert(math.abs(e8 - n) / n < 0.5, s"estimate $e8 for $n")
    // merge order must not matter: different partitionings, same estimate
    assert(est(1) == e8 && est(32) == e8)
  }

  test("reservoir: state bounded at cap, deterministic across partitionings, " +
      "and quantiles unchanged when the cap exceeds the sample") {
    import org.apache.spark.sql.Encoders
    val r5 = org.apache.spark.sql.functions.udaf(new SketchOps.ReservoirAgg(5),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val df = spark.range(0L, 1000L)
      .select((col("id") % 7L).as("k"),
        SketchOps.hash60(col("id")).as("r"), col("id").cast("double").as("v"))
    def run(parts: Int): Map[Long, Seq[Double]] =
      df.repartition(parts).groupBy(col("k")).agg(r5(col("r"), col("v")).as("vs"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Double](1).toSeq).toMap
    val a = run(4)
    // absolute per-group bound: 1000/7 ≈ 143 rows per key, 5 retained
    assert(a.values.forall(_.size == 5), a)
    // (rank, value) total order ⇒ merge-order independent
    assert(run(1) == a && run(19) == a)

    // colliding rank hashes between DISTINCT rows are retained, never
    // dropped: 100 rows sharing 10 ranks must all survive under a cap
    // that fits them (dropping one would shift every quantile)
    val rBig = org.apache.spark.sql.functions.udaf(
      new SketchOps.ReservoirAgg(1000),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val collide = spark.range(0L, 100L)
      .select(lit(1L).as("k"), (col("id") % 10L).as("r"),
        col("id").cast("double").as("v"))
    val kept = collide.repartition(7).groupBy(col("k"))
      .agg(rBig(col("r"), col("v")).as("vs"))
      .head().getSeq[Double](1)
    assert(kept.size == 100, s"${kept.size} of 100 rows survived collisions")

    // cap above the sample size ⇒ bit-identical to the unbounded form
    val docs = Tables.documents(spark, sf)
    val sampled = graft.ops.SampleOps.hashSample(docs, "doc_id", 0.5, "q")
    val qs = Seq(0.5, 0.9, 0.99)
    val unbounded = sampled.groupBy(col("source"))
      .agg(array_sort(collect_list(col("n_chars").cast("double"))).as("vs"),
        count(lit(1)).as("n_sample"))
      .select(col("source"), col("n_sample"),
        explode(array(qs.map(lit(_)): _*)).as("q"), col("vs"))
      .select(col("source"), col("n_sample"), col("q"),
        element_at(col("vs"),
          greatest(lit(1L), ceil(col("q") * col("n_sample"))).cast("int"))
          .as("quantile"))
      .collect().map(_.toSeq).toSet
    val got = SketchOps.sampledQuantiles(docs, "doc_id", "source", "n_chars",
      qs, rate = 0.5, salt = "q").collect().map(_.toSeq).toSet
    assert(got == unbounded)
  }

  test("reservoir hot-group probe: 2M rows into one cap-8192 buffer " +
      "completes in seconds") {
    // the case the cap exists for: one pathological group holding the
    // whole input. Accepted-insert probability decays as cap/i, so the
    // fill path must be ~O(n log cap) — the pre-fix per-insert re-sort
    // was minutes here; the binary-search insert is seconds
    val t0 = System.nanoTime()
    import org.apache.spark.sql.Encoders
    val r = org.apache.spark.sql.functions.udaf(
      new SketchOps.ReservoirAgg(8192),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val vs = spark.range(0L, 2000000L)
      .select(lit(1L).as("k"), SketchOps.hash60(col("id")).as("r"),
        col("id").cast("double").as("v"))
      .groupBy(col("k")).agg(r(col("r"), col("v")).as("vs"))
      .head().getSeq[Double](1)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(vs.size == 8192)
    // catastrophic-regression canary only (a per-insert re-sort measured
    // minutes here); generous bound so a loaded CI host can't flake it
    assert(secs < 120.0, f"hot-group reservoir took $secs%.1f s")
  }

  test("persisted KMV state serves identical estimates and merges batches " +
      "without rescanning history") {
    val li = Tables.lineitem(spark, sf)
    val k = 64
    val full = li.groupBy(col("l_returnflag"))
      .agg(SketchOps.kmvDistinct(col("l_orderkey"), k).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val states = li.groupBy(col("l_returnflag"))
      .agg(SketchOps.kmvState(col("l_orderkey"), k).as("state"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    SketchOps.saveKmv(states, k, dir)
    val (st, k2) = SketchOps.loadKmv(spark, dir)
    assert(k2 == k)
    val served = st.select(col("l_returnflag"),
      SketchOps.kmvEstimateFromState(col("state"), k2).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(served == full)
    // two disjoint batches sketched separately, states merged by re-fold:
    // identical to sketching everything at once
    def stOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(SketchOps.kmvState(col("l_orderkey"), k).as("state"))
    val merged = stOf(li.filter(col("l_orderkey") % 2 === 0))
      .unionByName(stOf(li.filter(col("l_orderkey") % 2 =!= 0)))
      .select(col("l_returnflag"), explode(col("state")).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(SketchOps.kmvStateOfHashes(col("h"), k).as("state"))
      .select(col("l_returnflag"),
        SketchOps.kmvEstimateFromState(col("state"), k).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged == full)
    intercept[IllegalStateException] {
      SketchOps.loadKmv(spark,
        java.nio.file.Files.createTempDirectory("graft_not_kmv").toString)
    }
  }

  test("store paths with spaces and percent escapes round-trip") {
    // the marker FileSystem resolves through hadoop Path, not
    // java.net.URI: URI threw on spaces and percent-decoded '%41'→'A',
    // writing the manifest to a DIFFERENT location than the data
    val toks = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("item"))
    val sk = SketchOps.cmSketch(toks, "item", depth = 3, width = 16)
    val base = java.nio.file.Files.createTempDirectory("graft_odd").toString
    for (odd <- Seq("with space", "pct%41dir")) {
      val dir = s"$base/$odd"
      SketchOps.saveCm(sk, dir)
      val lk = SketchOps.loadCm(spark, dir)
      assert(lk.depth == 3 && lk.width == 16, dir)
      assert(SketchOps.cmStoreExists(spark, dir), dir)
      // force the DATA read too (lazy until now) — the counters must
      // come back from the same odd path the manifest did
      assert(lk.counters.count() == sk.counters.count(), dir)
    }
  }

  test("persisted CM sketch serves identical estimates after reload") {
    val toks = Tables.documents(spark, sf).filter(col("doc_id") < 100)
      .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("item"))
    val sk = SketchOps.cmSketch(toks, "item", depth = 3, width = 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_cm").toString
    SketchOps.saveCm(sk, dir)
    val lk = SketchOps.loadCm(spark, dir)
    assert(lk.depth == 3 && lk.width == 32)
    val fresh = SketchOps.cmEstimate(sk, toks.distinct(), "item")
      .collect().map(_.toSeq).toSet
    val served = SketchOps.cmEstimate(lk, toks.distinct(), "item")
      .collect().map(_.toSeq).toSet
    assert(served == fresh)
    // counters are sums: sketching two disjoint batches and merging is
    // identical to sketching everything at once (the incremental-growth
    // path for a persisted sketch)
    def skOf(df: org.apache.spark.sql.DataFrame) =
      SketchOps.cmSketch(df, "item", depth = 3, width = 32)
    val merged = SketchOps.mergeCm(
      skOf(toks.filter(length(col("item")) % 2 === 0)),
      skOf(toks.filter(length(col("item")) % 2 =!= 0)))
    val mergedEst = SketchOps.cmEstimate(merged, toks.distinct(), "item")
      .collect().map(_.toSeq).toSet
    assert(mergedEst == fresh)
    intercept[IllegalArgumentException] {
      SketchOps.mergeCm(sk, SketchOps.cmSketch(toks, "item", 3, 16))
    }
    intercept[IllegalStateException] {
      SketchOps.loadCm(spark,
        java.nio.file.Files.createTempDirectory("graft_not_cm").toString)
    }
  }

  test("decimal-log histogram: exact under 1000, ≤1% bins above, extreme " +
      "and negative values bin safely, merge equals one-shot") {
    import spark.implicits._
    // binning truth table, including the abs(Long.MinValue) overflow trap
    val vals = Seq(0L, 7L, 999L, 1000L, 1049L, 123456L, -5L, -999L,
      -1050L, Long.MaxValue, Long.MinValue)
    val bins = SketchOps.decHist(vals.toDF("v"), "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // |v| < 1000 is exact; 1049 truncates to 1040; -1050 is already a
    // width-multiple and survives exactly; the two long extremes land
    // on ±9220000000000000000 (abs(MinValue) binning through decimal)
    assert(bins.keySet == Set(0L, 7L, 999L, 1000L, 1040L, 123000L, -5L,
      -999L, -1050L, 9220000000000000000L, -9220000000000000000L))
    assert(bins.values.sum == vals.length)

    // merge is exact: two halves folded == one-shot, any partitioning
    val df = Tables.documents(spark, sf).select(col("n_chars")
      .cast("long").as("v"))
    def binsOf(d: org.apache.spark.sql.DataFrame) =
      SketchOps.decHist(d, "v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = binsOf(df)
    val folded = SketchOps.mergeHist(
      SketchOps.decHist(df.filter(col("v") % 2 === 0), "v"),
      SketchOps.decHist(df.filter(col("v") % 2 =!= 0), "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == oneShot)
    assert(binsOf(df.repartition(17)) == oneShot)

    // quantile estimates honor the documented error envelope against
    // the EXACT kernel on the same column and rank rule
    val est = SketchOps.histQuantiles(SketchOps.decHist(df, "v"),
        Seq(1, 50, 90, 99, 100))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val exact = graft.ops.SelectOps.exactPercentilesLong(
        df.toDF("n_chars"), "n_chars", Seq(1, 50, 90, 99, 100))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    for ((p, e) <- est) {
      val t = exact(p)
      assert(e <= t && t < e + math.max(1L, e / 100L) + 1L,
        s"p$p: est $e vs exact $t outside the 1% envelope")
    }
  }

  test("decHist refuses a double column instead of truncating") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      SketchOps.decHist(Seq(1.5, 2.5).toDF("v"), "v")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("grouped histogram: per-group estimates honor the envelope " +
      "against the exact grouped kernel; grouped bins fold through the " +
      "SAME store lifecycle") {
    val df = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long").as("v"))
    val est = SketchOps.histQuantilesByGroup(
        SketchOps.decHistByGroup(df, "source", "v"), Seq(50, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    val exact = graft.ops.SelectOps.exactPercentilesLongByGroup(
        df.toDF("source", "n_chars"), "source", "n_chars", Seq(50, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    for (((g, p), e) <- est) {
      val t = exact((g, p))
      assert(e <= t && t < e + math.max(1L, e / 100L) + 1L,
        s"$g p$p: est $e vs exact $t outside the 1% envelope")
    }
    // the generalized merge: grouped halves fold bit-equal to one-shot,
    // through the SAME save/append store protocol
    val dir = java.nio.file.Files.createTempDirectory("graft_histg").toString
    SketchOps.saveHist(
      SketchOps.decHistByGroup(df.filter(col("v") % 2 === 0), "source", "v"),
      dir, batchId = Some(0L))
    SketchOps.appendHist(spark, dir,
      SketchOps.decHistByGroup(df.filter(col("v") % 2 =!= 0), "source", "v"),
      batchId = Some(1L))
    val served = SketchOps.loadHist(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = SketchOps.decHistByGroup(df, "source", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(served == want)
    // mixed-layout merge is refused loudly, never mis-keyed
    intercept[IllegalArgumentException] {
      SketchOps.mergeHist(SketchOps.decHist(df.select(col("v")), "v"),
        SketchOps.decHistByGroup(df, "source", "v"))
    }
  }

  test("histogram store: append folds without rescan, zombie no-ops, " +
      "crashed save refuses") {
    val df = Tables.documents(spark, sf).select(col("n_chars")
      .cast("long").as("v"))
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    SketchOps.saveHist(SketchOps.decHist(df.filter(col("v") < 1000), "v"),
      dir, batchId = Some(0L))
    SketchOps.appendHist(spark, dir,
      SketchOps.decHist(df.filter(col("v") >= 1000), "v"), batchId = Some(1L))
    def served = SketchOps.loadHist(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = SketchOps.decHist(df, "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(served == want)
    // re-delivered batch 1 must not double its bins
    SketchOps.appendHist(spark, dir,
      SketchOps.decHist(df.filter(col("v") >= 1000), "v"), batchId = Some(1L))
    assert(served == want)
    // bins without a manifest = crashed save, refused loudly
    val broken = java.nio.file.Files.createTempDirectory("graft_hist_b")
      .toString
    SketchOps.decHist(df, "v").write.parquet(s"$broken/bins")
    intercept[IllegalStateException](SketchOps.histStoreExists(spark, broken))
    intercept[IllegalStateException](SketchOps.loadHist(spark, broken))
  }

  test("a NEGATIVE explicit batchId round-trips through the manifest and " +
      "still arms the idempotence guard") {
    // foreachBatch ids are >= 0, but nothing stops a caller recording a
    // negative explicit id; a sign-blind parser would read it back as
    // None and let the redelivered batch double-count every counter
    val toks = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select(explode(graft.ops.TextOps.tokensCol(col("text"))).as("item"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cm_neg").toString
    SketchOps.saveCm(SketchOps.cmSketch(toks, "item", depth = 3, width = 32),
      dir, batchId = Some(-7L))
    assert(SketchOps.lastBatchId(spark, dir, SketchOps.CmManifestFile)
      == Some(-7L))
    val before = SketchOps.loadCm(spark, dir).counters
      .collect().map(_.toSeq).toSet
    SketchOps.appendCm(spark, dir,
      SketchOps.cmSketch(toks, "item", depth = 3, width = 32),
      batchId = Some(-7L)) // redelivery
    val after = SketchOps.loadCm(spark, dir).counters
      .collect().map(_.toSeq).toSet
    assert(after == before, "a redelivered negative-id batch must no-op")
  }

  test("bounded top-k per group equals the window form, is partition-" +
      "order independent, and plans no window or full sort") {
    val docs = Tables.documents(spark, sf)
    def viaAgg(parts: Int): Set[Seq[Any]] =
      SketchOps.topKPerGroup(docs.repartition(parts),
          "source", "n_chars", "doc_id", k = 3)
        .collect().map(_.toSeq).toSet
    // the window formulation over the same total order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val viaWindow = docs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("source"), col("rnk").cast("long"),
        col("n_chars"), col("doc_id"))
      .collect().map(_.toSeq).toSet
    val a4 = viaAgg(4)
    assert(a4 == viaWindow)
    assert(a4.nonEmpty)
    // merge order must not matter
    assert(viaAgg(1) == a4 && viaAgg(17) == a4)
    // tie semantics on a constructed collision: equal scores rank by id
    import spark.implicits._
    val tied = Seq((1L, 10L, 5L), (1L, 11L, 5L), (1L, 12L, 5L), (1L, 13L, 4L))
      .toDF("g", "id", "sc")
    val got = SketchOps.topKPerGroup(tied, "g", "sc", "id", 2)
      .select(col("rnk"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
    // the plan must be aggregate-shaped: no WindowExec, no SortExec over
    // the corpus (the sort a window would need under the exchange)
    val df = SketchOps.topKPerGroup(docs, "source", "n_chars", "doc_id", 3)
    df.collect()
    val all = PlanWalk.nodes(df.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      df.queryExecution.executedPlan.toString)
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
      df.queryExecution.executedPlan.toString)
  }

  test("bloom never false-negatives, merge equals full build, store " +
      "round-trips, and mismatched shapes are refused") {
    val docs = Tables.documents(spark, sf)
    val seen = docs.filter(col("doc_id") < 200).select(md5(col("text")).as("h"))
    val sk = SketchOps.bloomSketch(seen, "h", depth = 3, width = 256)

    // no false negatives: every inserted item probes true — the ONE hard
    // guarantee a frontier check rests on
    val seenProbe = SketchOps.bloomMightContain(sk, seen, "h")
    assert(seenProbe.filter(!col("might_contain")).count() == 0)
    assert(seenProbe.count() > 0)

    // the deliberately tight 3×256 shape must produce real false
    // positives on unseen probes at this corpus size — otherwise the
    // suite (and the sk_bloom oracle) is verifying a disguised exact
    // semi-join, not the filter
    val unseen = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .select(md5(col("text")).as("h"))
      .exceptAll(seen)
    val fp = SketchOps.bloomMightContain(sk, unseen, "h")
      .filter(col("might_contain")).count()
    assert(fp > 0, "shape too wide: no false positives — widen the assert's " +
      "premise or tighten the filter")

    // OR-merge of a disjoint split is bit-identical to the full build
    def of(df: org.apache.spark.sql.DataFrame) =
      SketchOps.bloomSketch(df, "h", 3, 256)
    val merged = SketchOps.mergeBloom(
      of(docs.filter(col("doc_id") < 100).select(md5(col("text")).as("h"))),
      of(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select(md5(col("text")).as("h"))))
    def bitSet(s: SketchOps.BloomSketch) =
      s.bits.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(bitSet(merged) == bitSet(sk))

    // store round-trip: served probe answers equal the fresh filter's
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    SketchOps.saveBloom(sk, dir)
    val lk = SketchOps.loadBloom(spark, dir)
    assert(lk.depth == 3 && lk.width == 256)
    assert(bitSet(lk) == bitSet(sk))

    intercept[IllegalArgumentException] {
      SketchOps.mergeBloom(sk, SketchOps.bloomSketch(seen, "h", 3, 128))
    }
    intercept[IllegalStateException] {
      SketchOps.loadBloom(spark,
        java.nio.file.Files.createTempDirectory("graft_not_bloom").toString)
    }
    // bits without a manifest is broken, not absent
    val crashed =
      java.nio.file.Files.createTempDirectory("graft_bloom_crash").toString
    sk.bits.write.parquet(s"$crashed/bits")
    intercept[IllegalStateException] {
      SketchOps.bloomStoreExists(spark, crashed)
    }
  }
}
