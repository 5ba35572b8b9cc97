package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler for optimization work (guide §1: measure first): runs the
  * named registry queries through the same noop-sink materialization the
  * bench uses, with a SparkListener recording every Spark job's wall time
  * and call site — so a 10 s row decomposes into its actual jobs (trainer
  * collects, cache fills, the final noop write) instead of being guessed
  * at. Also reports the driver-side gap (planning/codegen/collect-free
  * time) as total − Σ(job wall), the number Catalyst/Janino overhead
  * hides in.
  *
  * Usage: sbt "runMain graft.ProfileQuery <query>[,<query>...]"
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS (default 32).
  * Not part of the driver contract; prints human-readable lines only.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "pass at least one registry query name")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"),
      shufflePartitions = cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // the result stage's call site names what the job computes
        val site = js.stageInfos.sortBy(_.stageId).map(si =>
          s"${si.name.takeWhile(_ != '+').trim}[${si.numTasks}]").mkString(" <- ")
        jobs.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, je.time - t0, site))
        }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name (see SparkEntry.queries)"))
      // one untimed warm run, mirroring the bench's JIT/codegen warmup
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      finally Caches.releaseAll()
      // median of 3 timed runs — single timings spread ±25% under ambient
      // load on this box; the per-job table is from the MEDIAN run
      val timed = (0 until 3).map { _ =>
        done.clear()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        finally Caches.releaseAll()
        val totalS = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        (totalS, done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1))
      }
      val (totalS, rows) = timed.sortBy(_._1).apply(1)
      val jobSum = rows.map(_._2).sum / 1e3
      println(f"==== $name: median total $totalS%.2f s " +
        f"(runs ${timed.map(t => f"${t._1}%.2f").mkString("/")}), " +
        f"${rows.length} jobs, job-wall sum $jobSum%.2f s, " +
        f"driver gap ${totalS - jobSum}%.2f s ====")
      rows.foreach { case (id, ms, site) =>
        println(f"  job $id%4d ${ms / 1e3}%7.3f s  $site")
      }
    }
    spark.stop()
  }
}
