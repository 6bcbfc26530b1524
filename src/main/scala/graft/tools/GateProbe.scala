package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler (guide §1): run named gates under a SparkListener that
  * records every job's wall-clock, task count and the DRIVER-SIDE GAP
  * before it. At sf0.1 most gates are overhead-dominated — job count and
  * gaps are the signal, not shuffle bytes. Usage:
  *
  *   sbt "runMain graft.tools.GateProbe <gate[,gate...]> [repeats]"
  *
  * Prints, per run: wall, #jobs, sum(job time), sum(gaps), then the top
  * jobs by duration with their descriptions. Cold run 0 is labeled; use
  * the warm repeats for attribution.
  */
object GateProbe {
  private case class JobRec(id: Int, desc: String, start: Long,
      var end: Long = 0L, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val repeats = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("gate-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new ConcurrentLinkedQueue[JobRec]()
    val open = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(d => !d.contains("CompletableFuture"))
          .getOrElse(j.stageInfos.map(_.name.takeWhile(_ != '(')).distinct
            .mkString("|"))
        val rec = JobRec(j.jobId, desc.take(110), System.nanoTime(),
          tasks = j.stageInfos.map(_.numTasks).sum)
        open.put(j.jobId, rec); jobs.add(rec)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val rec = open.remove(j.jobId)
        if (rec != null) rec.end = System.nanoTime()
      }
    })

    // global warmup: JIT + codegen caches
    try SparkEntryRef.run(spark, sfDir, "q1_pricing_summary")
    catch { case _: Throwable => () }

    // driver stack sampler: every 20 ms grab the MAIN thread's stack and
    // bucket it by the deepest graft/notable-spark frame — attributes the
    // inter-job gaps (driver-side planning/IO) the job listener can't see
    val mainThread = Thread.currentThread()
    val sampleBuckets =
      new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          val all = Thread.getAllStackTraces.asScala
          def interesting(st: Array[StackTraceElement]) = st.find { e =>
            val c = e.getClassName
            c.contains("ApproximatePercentile") ||
            c.contains("StatFunctions") ||
            c.contains("RangePartitioner") ||
            c.contains("Optimizer") || c.contains("RuleExecutor") ||
            c.contains("QueryExecution") || c.contains("Analyzer") ||
            c.contains("CodeGenerator") || c.contains("CodegenContext") ||
            c.contains("ClosureCleaner") || c.contains("InMemoryFileIndex") ||
            c.contains("ParquetFileReader") || c.contains("ParquetFooters") ||
            (c.startsWith("graft.") && !c.contains("GateProbe"))
          }
          // main thread: always bucketed (its deepest interesting frame,
          // else its top frame); SQL-execution pool threads: bucketed only
          // when runnable with an interesting frame
          val mainSt = mainThread.getStackTrace
          // innermost notable frame (the Spark phase) PLUS the innermost
          // graft.* caller frame — "who asked" and "what Spark is doing"
          val phase = interesting(mainSt).orElse(mainSt.drop(2).headOption)
            .map(f => f.getClassName.split('.').takeRight(2)
              .mkString(".") + "." + f.getMethodName).getOrElse("?")
          val caller = mainSt.find(e => e.getClassName.startsWith("graft.") &&
              !e.getClassName.contains("GateProbe"))
            .map(f => f.getClassName.split('.').last + "." + f.getMethodName +
              ":" + f.getLineNumber).getOrElse("-")
          sampleBuckets.merge(s"MAIN $phase <= $caller", 1, (a, b) => a + b)
          all.foreach { case (t, st) =>
            if ((t ne mainThread) && t.getState == Thread.State.RUNNABLE &&
                st.nonEmpty) {
              val key = interesting(st) match {
                case Some(f) => "POOL " + f.getClassName.split('.')
                  .takeRight(2).mkString(".") + "." + f.getMethodName
                case None =>
                  // coarse bucket so executor work outside the notable
                  // list is still visible (top frame, class only)
                  val f = st.head
                  if (f.getClassName.startsWith("java.") ||
                      f.getClassName.startsWith("jdk.") ||
                      f.getClassName.startsWith("sun.")) null
                  else "POOL* " + f.getClassName.split('.')
                    .takeRight(2).mkString(".") + "." + f.getMethodName
              }
              if (key != null) sampleBuckets.merge(key, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (name <- names) {
      for (r <- 0 until repeats) {
        jobs.clear()
        if (r == repeats - 1) { sampleBuckets.clear(); sampling = true }
        val t0 = System.nanoTime()
        SparkEntryRef.run(spark, sfDir, name)
        val wall = (System.nanoTime() - t0) / 1e9
        sampling = false
        Thread.sleep(200)
        val recs = {
          import scala.jdk.CollectionConverters._
          jobs.asScala.toSeq.sortBy(_.start)
        }
        val jobSum = recs.map(j => math.max(0L, j.end - j.start)).sum / 1e9
        // gap before each job = job.start - max(prev ends, t0)
        var cursor = t0
        var gapSum = 0.0
        val gaps = recs.map { j =>
          val g = math.max(0L, j.start - cursor) / 1e9
          cursor = math.max(cursor, math.max(j.start, j.end))
          gapSum += g
          g
        }
        val tag = if (r == 0) "cold" else s"warm$r"
        println(f"PROBE $name $tag wall=$wall%.2f jobs=${recs.size} jobtime=$jobSum%.2f gaps=$gapSum%.2f")
        if (r == repeats - 1) {
          recs.zip(gaps).foreach { case (j, g) =>
            val d = math.max(0L, j.end - j.start) / 1e9
            if (d + g > 0.03)
              println(f"  job=${j.id}%4d dur=$d%6.3f gap=$g%6.3f tasks=${j.tasks}%4d  ${j.desc.take(130)}")
          }
          import scala.jdk.CollectionConverters._
          sampleBuckets.asScala.toSeq.sortBy(-_._2)
            .take(14).foreach { case (k, n) =>
              println(f"  stack ${n * 20 / 1000.0}%6.2fs  $k")
            }
        }
        graft.util.TempDirs.sweep()
      }
    }
    spark.stop()
  }
}

/** Indirection so GateProbe compiles without importing SparkEntry's map
  * type at the top (keeps the dev tool decoupled).
  */
private object SparkEntryRef {
  def run(spark: SparkSession, sfDir: String, name: String): Long =
    graft.SparkEntry.queries(name)(spark, sfDir).count()
}
