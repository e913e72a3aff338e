package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated skew measurement for the sessionizer (BASELINE.md skew
  * table): times ONLY the sessionize stage — window + session aggregate,
  * reduced to one row (sum of hit_count) so the global output sort and
  * row conversion of the full q_sessionize query don't mask the hot
  * task. Compares the naive single-window plan against the time-block
  * salted two-phase plan on the same cached events table, and prints the
  * (identical) checksum so a divergence is loud.
  *
  * Usage: runMain graft.tools.SkewProbe <fixtureDir> [reps]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val fx = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables(spark, fx, "events")
    ev.persist(); ev.count() // q-cache
    def naive(): Long = graft.ops.Sessionize.sessions(ev,
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .agg(sum(col("hit_count"))).head().getLong(0)
    def salted(): Long = graft.ops.Sessionize.sessionsSalted(ev,
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .agg(sum(col("hit_count"))).head().getLong(0)
    def time(f: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f()
      ((System.nanoTime() - t0) / 1e9, v)
    }
    naive(); salted() // untimed warmup (JIT + codegen)
    for (_ <- 1 to reps) {
      val (tn, vn) = time(naive _)
      val (ts, vs) = time(salted _)
      println(f"""{"fixture":"$fx%s","naive_s":$tn%.3f,"salted_s":$ts%.3f,"sum_hits":$vn%d,"equal":${vn == vs}%b}""")
    }
    spark.stop()
  }
}
