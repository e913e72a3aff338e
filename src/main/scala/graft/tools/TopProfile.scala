package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only (guide §1): per-query cost breakdown for the bench's heavy
  * tail. For each named query, runs it exactly like Bench does (count,
  * then cache hygiene) and prints wall seconds next to scheduler-level
  * counters gathered by a listener: jobs, stages, tasks, summed executor
  * task time, shuffle bytes written. wall >> task-time/cores means the
  * cost is driver-side (planning, codegen, job launch), not execution —
  * the two need different fixes. Not part of the driver contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TopProfile q_a q_b"
  */
object TopProfile {
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNs = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) {
          taskNs.addAndGet(m.executorRunTime * 1000000L)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def pinTables(): Unit = graft.Tables.names.foreach { t =>
      try { val df = graft.Tables(spark, sfDir, t); df.persist(); df.count() } // q-cache
      catch { case _: Throwable => }
    }
    pinTables()
    Seq("q_pricing_summary", "q_window_running", "q_token_stats",
        "q_elb_parse_stats", "q_json_extract").foreach { q =>
      try graft.SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => }
    }

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"task_s"}%8s ${"shufMB"}%8s")
    args.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"$name: UNKNOWN")
        case Some(fn) =>
          Thread.sleep(300) // let the async listener bus drain
          jobs.set(0); stages.set(0); tasks.set(0); taskNs.set(0); shufW.set(0)
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            println(s"[topprofile] $name FAILED: ${e.getMessage}") }
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          println(f"$name%-28s $wall%8.2f ${jobs.get()}%5d ${stages.get()}%6d ${tasks.get()}%6d ${taskNs.get() / 1e9}%8.2f ${shufW.get() / 1e6}%8.1f")
          spark.catalog.clearCache()
          pinTables()
      }
    }
    spark.stop()
  }
}
