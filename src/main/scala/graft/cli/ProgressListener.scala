package graft.cli

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Console progress for engine runs — the analog of the reference's dask
  * `ProgressBar` (`/root/reference/src/mimic2ts/__init__.py:8,535`), built
  * the Spark-native way: a `SparkListener` fed by the scheduler's own
  * events, so progress costs nothing on the executor hot path and works
  * identically on a real cluster (the reference's bar only wraps a local
  * scheduler).
  *
  * Emits one line per completed stage (tasks, input/shuffle rows, wall
  * time) and a cumulative task counter on a coarse cadence — a several-
  * hundred-stage run prints hundreds of lines, not tens of thousands.
  */
final class ProgressListener extends SparkListener {
  private val tasksDone = new AtomicLong(0)
  private val lastPrint = new AtomicLong(0)
  @volatile private var totalJobs = 0

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    totalJobs += 1
  }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val n = tasksDone.incrementAndGet()
    val now = System.currentTimeMillis()
    val last = lastPrint.get()
    // coarse heartbeat between stage lines; CAS so concurrent task-end
    // events print once per interval
    if (now - last > 5000 && lastPrint.compareAndSet(last, now))
      println(s"[progress] $n tasks done ($totalJobs jobs submitted)")
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    val m = info.taskMetrics
    val rowsIn = m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
    val secs = (for {
      s <- info.submissionTime; c <- info.completionTime
    } yield (c - s) / 1000.0).getOrElse(0.0)
    val status = info.failureReason.map(_ => "FAILED").getOrElse("done")
    println(f"[progress] stage ${info.stageId}%4d $status: " +
      f"${info.numTasks}%4d tasks, $rowsIn%,12d rows in, $secs%6.1f s  " +
      info.name.take(60))
  }
}
