package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.SampleOps.tokenBudgetSample]]: the
  * sampler's claim is that the per-domain running token sum never
  * becomes a whole-domain window — the radix buckets bound the
  * doc-level ordered scan to ≤1 bucket (~1/65536 of the domain) per
  * domain. The adversary is ONE giant domain (the common real shape:
  * "web" dwarfs everything), where the naive windowed form puts every
  * document into a single task's sort. Both forms are run and must
  * agree document-for-document (count + order-free checksum); the
  * radix form must also not LOSE to the window at the probe size —
  * its real win is that the window's single task grows with the
  * domain while the radix scan grows with domain/65536, which the
  * doubled-size timing makes visible.
  * Usage: runMain graft.BudgetBench [nDocs]
  */
object BudgetBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(cpus)
    import graft.ops.SampleOps
    import spark.implicits._
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)

    def time[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val v = body
      println(f"""{"which":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      v
    }

    def docsOf(nn: Long) = spark.range(0L, nn).toDF("doc_id")
      .withColumn("source", lit("web"))
      .withColumn("ntok", (pmod(xxhash64(col("doc_id")), lit(100L)) + 1L))
      .localCheckpoint()

    def run(nn: Long): Unit = {
      val docs = docsOf(nn)
      // budget = a third of the domain's mass — a deep boundary
      val mass = docs.agg(sum(col("ntok"))).head().getLong(0)
      val budgets = Seq(("web", mass / 3L)).toDF("source", "budget_tok")
      // order-free membership checksum; the hash sum rides decimal —
      // a Long sum of ~n 64-bit values overflows under ANSI mode
      def checksum(df: org.apache.spark.sql.DataFrame): (Long, BigDecimal) = {
        val r = df.agg(count(lit(1)),
          sum(xxhash64(col("doc_id")).cast("decimal(38,0)"))).head()
        (r.getLong(0), BigDecimal(r.getDecimal(1)))
      }
      val radix = time(s"radix_${nn}") {
        checksum(SampleOps.tokenBudgetSample(docs, "doc_id", "source",
          col("ntok"), budgets, "bb1"))
      }
      // the naive reference: the SAME keep rule as one whole-domain
      // window — every row of the giant domain lands in a single
      // task's sort
      val windowed = time(s"window_${nn}") {
        val h = md5(concat(lit("bb1"), lit(":"),
          col("doc_id").cast("string")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("__h"), col("doc_id").cast("string"))
          .rowsBetween(Long.MinValue, -1)
        checksum(docs.withColumn("__h", h)
          .withColumn("__before",
            coalesce(sum(col("ntok")).over(w), lit(0L)))
          .filter(col("__before") < lit(mass / 3L)))
      }
      require(radix == windowed,
        s"radix $radix diverged from the windowed reference $windowed")
      println(s"""{"n":$nn,"kept":${radix._1},"agree":true}""")
    }

    run(math.max(n / 40L, 50000L)) // untimed-in-spirit: codegen warmup
    run(math.max(n / 4L, 100000L)) // the scaling anchor
    run(n)
    spark.stop()
  }
}
