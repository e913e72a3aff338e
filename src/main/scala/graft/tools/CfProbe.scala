package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-stage breakdown of the CF family (q_item_cf /
  * q_user_recs) — where do the ~150 task-seconds go? Prints every
  * completed stage's task time, record counts and shuffle volumes.
  * Not part of the driver contract. */
object CfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime / 1000.0}%8.2fs cpu=${m.executorCpuTime / 1e9}%8.2fs " +
          f"in=${m.inputMetrics.recordsRead}%10d sR=${m.shuffleReadMetrics.recordsRead}%10d " +
          f"sW=${m.shuffleWriteMetrics.recordsWritten}%10d sWMB=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f " +
          f"name=${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    graft.Tables.names.foreach { t =>
      try { val df = graft.Tables(spark, sfDir, t); df.persist(); df.count() } // q-cache
      catch { case _: Throwable => }
    }
    if (args.headOption.contains("obs-test")) {
      // does an eager localCheckpoint surface observe() metrics?
      val obs = org.apache.spark.sql.Observation("chk")
      val df = spark.range(100).toDF("id")
        .observe(obs, sum(when(col("id") % 2 === 0, 1L).otherwise(0L)).as("evens"))
        .localCheckpoint()
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val got = try Await.result(Future(obs.get), 5.seconds)
      catch { case e: Throwable => println(s"[obs] threw: $e"); Map.empty[String, Any] }
      println(s"[obs] metrics after localCheckpoint: $got (df rows=${df.count()})")
      spark.stop()
      return
    }
    val name = if (args.nonEmpty) args(0) else "q_user_recs"
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[total] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
