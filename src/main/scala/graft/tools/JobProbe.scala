package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Decompose one SparkEntry query's WARM runtime into Spark jobs/stages:
  * per run, print each job's wall, stage count, task count, and summed
  * task time — the "where do 20 CPU-seconds on 2000 rows go" probe.
  *
  * Usage: runMain graft.tools.JobProbe <query> [sfDir] [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q140_ann_ivfpq_recall")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    case class JobRec(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L,
      var desMs: Long = 0L, var gcMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stageToJob = mutable.Map[Int, Int]()
    case class StageRec(id: Int, var name: String, var tasks: Int = 0,
      var taskMs: Long = 0L, var wallMs: Long = 0L)
    val stages = mutable.LinkedHashMap[Int, StageRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(e.jobId); r.t0 = e.time; r.stages = e.stageIds.size
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for (j <- stageToJob.get(e.stageId); r <- jobs.get(j)) {
          r.tasks += 1
          if (e.taskMetrics != null) {
            r.taskMs += e.taskMetrics.executorRunTime
            r.desMs += e.taskMetrics.executorDeserializeTime
            r.gcMs += e.taskMetrics.jvmGCTime
          }
        }
        val sr = stages.getOrElseUpdate(e.stageId,
          StageRec(e.stageId, ""))
        sr.tasks += 1
        if (e.taskMetrics != null) sr.taskMs += e.taskMetrics.executorRunTime
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val i = e.stageInfo
          val sr = stages.getOrElseUpdate(i.stageId, StageRec(i.stageId, ""))
          sr.name = i.name + " | " + i.details.linesIterator.filter(l =>
            l.contains("graft")).take(2).mkString(" <- ")
          sr.wallMs = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(0L)
        }
    })

    // the write command plans its own QueryExecution, so capture the
    // EXECUTED plan through the listener instead of the input df
    @volatile var lastExecuted: Option[org.apache.spark.sql.execution.QueryExecution] = None
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        lastExecuted = Some(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })

    def dumpMetrics(df0: org.apache.spark.sql.DataFrame): Unit = {
      df0.write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      import org.apache.spark.sql.execution._
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def finalPlan(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      def walk(p: SparkPlan, depth: Int): Unit = {
        val interesting = p.metrics.filter { case (_, m) =>
          m.value > 0 && (m.metricType == "timing" || m.metricType == "nsTiming" ||
            m.name.exists(n => n.contains("time") || n.contains("rows")))
        }
        val ms = interesting.map { case (k, m) =>
          val v = if (m.metricType == "nsTiming") s"${m.value / 1000000}ms"
            else if (m.metricType == "timing") s"${m.value}ms" else m.value.toString
          s"$k=$v"
        }.mkString(" ")
        println("   " + ("  " * depth) + p.getClass.getSimpleName + " " + ms)
        p.children.foreach(c => walk(finalPlan(c), depth + 1))
        p match {
          case q: QueryStageExec => walk(finalPlan(q.plan), depth + 1)
          case _ =>
        }
      }
      lastExecuted.foreach(qe => walk(finalPlan(qe.executedPlan), 0))
    }

    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm run 1 (builds artifacts/stages)
    for (i <- 1 to reps) {
      jobs.synchronized { jobs.clear(); stageToJob.clear(); stages.clear() }
      val c0 = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime
      val gm0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount
      val cg0 = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount
      val t0 = System.nanoTime()
      val timedDf = fn(spark, dir)
      timedDf.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val gmD = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_GENERATED_METHOD_BYTECODE_SIZE.getCount - gm0
      val cgD = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getCount - cg0
      if (i == reps && sys.env.contains("PROBE_METRICS")) dumpMetrics(timedDf)
      val cpu = (java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime - c0) / 1e9
      Thread.sleep(300) // let listener events drain
      jobs.synchronized {
        val js = jobs.values.toVector
        val jobWall = js.map(r => (r.t1 - r.t0).max(0L)).sum / 1e3
        println(f"== run $i: wall=$wall%.2f cpu=$cpu%.1f jobs=${js.size} " +
          f"jobWallSum=$jobWall%.2f stages=${js.map(_.stages).sum} tasks=${js.map(_.tasks).sum} " +
          f"taskTime=${js.map(_.taskMs).sum / 1e3}%.2f deser=${js.map(_.desMs).sum / 1e3}%.2f " +
          f"gc=${js.map(_.gcMs).sum / 1e3}%.2f janinoClasses=$cgD genMethods=$gmD")
        stages.values.toVector.sortBy(r => -r.taskMs).take(14).foreach { r =>
          println(f"   stage ${r.id}%4d wall=${r.wallMs / 1e3}%6.2f tasks=${r.tasks}%4d " +
            f"taskTime=${r.taskMs / 1e3}%7.2f  ${r.name.take(170)}")
        }
      }
    }
    spark.stop()
  }
}
