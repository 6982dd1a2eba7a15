package graft
import java.nio.file.{Files, Paths}
/** Dump .explain("formatted") for named gates to files (plans/r15). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = args.head // e.g. "before" / "after"
    val names = args.tail
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // GRAFT_EXPLAIN_EXEC: materialize THIS QueryExecution first (a
      // noop write would execute a clone), so the dump shows the FINAL
      // adaptive plan (ReusedExchange, demoted joins) instead of the
      // pre-execution shape
      if (sys.env.contains("GRAFT_EXPLAIN_EXEC"))
        df.queryExecution.toRdd.count()
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.createDirectories(Paths.get("plans/r15"))
      Files.writeString(Paths.get(s"plans/r15/${n}_$suffix.txt"), txt)
      println(s"wrote plans/r15/${n}_$suffix.txt (${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
