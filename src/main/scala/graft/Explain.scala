package graft
import java.nio.file.{Files, Paths}
/** Dump .explain("formatted") for named gates to files (plans/r14). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val suffix = args.head // e.g. "before" / "after"
    val names = args.tail
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.createDirectories(Paths.get("plans/r14"))
      Files.writeString(Paths.get(s"plans/r14/${n}_$suffix.txt"), txt)
      println(s"wrote plans/r14/${n}_$suffix.txt (${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
