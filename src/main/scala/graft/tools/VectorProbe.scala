package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: prints the SRP-LSH candidate funnel (corpus → banded pairs →
  * distinct candidates → verified pairs) for a fixture dir — the
  * candidate-count evidence next to the vector-family growth exponents in
  * BASELINE.md. Usage: runMain graft.tools.VectorProbe <sfDir> */
object VectorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (n, raw, cand, verified) = graft.ops.VectorOps.lshCandidateStats(spark, dir)
    println(s"""{"probe":"srp_lsh_funnel","dir":"$dir","n_vectors":$n,"banded_pairs":$raw,"distinct_candidates":$cand,"verified_pairs":$verified}""")
    spark.stop()
  }
}
