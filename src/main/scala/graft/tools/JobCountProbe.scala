package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-key overhead attribution: run named queries (warm pass first)
  * and report wall seconds, Spark JOB count, stage count, task count
  * and summed executor task time — the scheduler-overhead signature.
  * A key whose wall-clock dwarfs its summed task time is paying for
  * sequential tiny jobs, not compute.
  *
  *   runMain graft.tools.JobCountProbe <sfDir> <key1,key2,...|top>
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys: Seq[String] =
      if (args.length < 2) graft.SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        ()
      }
    })
    def run(name: String): Unit = {
      graft.SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      ()
    }
    // warm pass (memos + codegen)
    keys.foreach { k => try run(k) catch { case _: Throwable => () } }
    println(f"${"key"}%-34s ${"wall_s"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"taskt_s"}%8s")
    keys.foreach { k =>
      Thread.sleep(200) // let queued listener events drain
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0L)
      val t0 = System.nanoTime()
      val err = try { run(k); "" } catch { case e: Throwable => " ERR " + e.toString.take(80) }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener events are async; a short drain window suffices for counts
      println(f"$k%-34s $wall%8.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${taskTimeMs.get / 1e3}%8.2f$err")
    }
    spark.stop()
  }
}
