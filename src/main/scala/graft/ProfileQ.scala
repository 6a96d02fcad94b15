package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (optimization rounds): per-STAGE attribution for one query —
  * where TimeQ says how much a query costs, this says WHICH stage burns
  * it. Prints, for each completed stage of an isolated run: task count,
  * summed executor run time, GC time, records/bytes read and written,
  * shuffle read/write, and the first line of the stage's call-site name.
  * Also dumps `.explain("formatted")` to target/plans/<name>.txt so plan
  * claims in OPTIMIZATION notes come from the exact code measured.
  * Usage: runMain graft.ProfileQ <query-name>... [-sf <dir>] */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val dir = args.sliding(2).collectFirst { case Array("-sf", d) => d }
      .getOrElse("/root/testdata/sf0.1")
    // positional parse (ADVICE r12): drop the flag and its value by INDEX —
    // the old value-based filter silently dropped a query whose name
    // happened to equal the dir string
    val names = args.indices
      .filter(i => args(i) != "-sf" && !(i > 0 && args(i - 1) == "-sf"))
      .map(args(_))
    names.filterNot(n => SparkEntry.registry.exists(_.name == n))
      .foreach(n => System.err.println(s"[profile] unknown query: $n"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, gcMs: Long, recIn: Long, recShufR: Long, recShufW: Long,
      shufRMb: Double, shufWMb: Double)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        if (m != null) stages.synchronized {
          stages += StageRow(si.stageId, si.name.linesIterator.next(),
            si.numTasks, m.executorRunTime, m.jvmGCTime,
            m.inputMetrics.recordsRead, m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6)
        }
      }
    })

    // artifacts out of the way so stages measure the operator (Bench shape)
    try SparkEntry.prepareArtifacts(spark, dir)
    catch { case e: Throwable =>
      System.err.println(s"[profile] artifact prep failed: ${e.getMessage}") }

    for (name <- names; q <- SparkEntry.registry.find(_.name == name)) {
      // warm run (fills codegen caches), then the measured run
      spark.catalog.clearCache()
      try q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[profile] $name warm failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      stages.synchronized(stages.clear())
      val df = q.fn(spark, dir)
      try {
        val planDir = java.nio.file.Paths.get("target/plans")
        java.nio.file.Files.createDirectories(planDir)
        java.nio.file.Files.writeString(planDir.resolve(s"$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } catch { case e: Throwable =>
        System.err.println(s"[profile] $name explain failed: ${e.getMessage}") }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain the listener bus by polling for a stable snapshot (ADVICE
      // r12: a fixed sleep silently undercounts stages on a loaded host)
      var prev = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 15000) {
        Thread.sleep(250); waited += 250
        val cur = stages.synchronized(stages.size)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      val rows = stages.synchronized(stages.sortBy(-_.runMs).toVector)
      println(f"PROFILE $name wall=$wall%.2f s stages=${rows.size} " +
        f"taskTime=${rows.map(_.runMs).sum / 1e3}%.1f s gc=${rows.map(_.gcMs).sum / 1e3}%.1f s")
      rows.take(30).foreach { r =>
        println(f"  stage ${r.id}%4d run=${r.runMs / 1e3}%7.2fs gc=${r.gcMs / 1e3}%5.2fs " +
          f"tasks=${r.tasks}%3d in=${r.recIn}%9d shufR=${r.recShufR}%9d/${r.shufRMb}%7.1fMB " +
          f"shufW=${r.recShufW}%9d/${r.shufWMb}%7.1fMB  ${r.name.take(70)}")
      }
    }
    spark.stop()
  }
}
