package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for plan-shape review
  * (PushedFilters / ReadSchema / broadcast / exchange counts).
  * SPARK_GRAFT_EXPLAIN_DIR=plans/r14 SPARK_GRAFT_EXPLAIN_SUFFIX=before
  * additionally writes each plan to `$dir/<query>_<suffix>.txt` — the
  * optimization-round evidence artifact. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_pricing_summary", "q_join_broadcast", "q_sessionize", "q_topk_orders",
      "q_string_funcs")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        println(plan)
        outDir.foreach { d =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"${n}_$suffix.txt"), plan)
        }
      } catch { case e: Throwable =>
        println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
