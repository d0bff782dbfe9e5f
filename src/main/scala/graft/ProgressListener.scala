package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted,
  SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** D5 progress/ETA reporting + stalled-stage detection, the Spark analogue
  * of the reference's 10-second status threads
  * (/root/reference/src/main.rs:192-225 ingest bytes/%/MB/s/ETA;
  * /root/reference/src/post/mod.rs:22-94 rows/s + stuck detector :42-45).
  *
  * A `SparkListener` accumulates per-stage task/record/byte counts; a daemon
  * thread prints one line per active stage every `intervalMs`. A stage with
  * zero task completions for `stallAfterMs` gets a WARNING (the reference
  * `exit(-1)`s; under Spark a long scheduling gap is recoverable, so we warn
  * rather than kill a cluster job — the operator signal is what matters).
  *
  * Log lines go through `log` (default stderr) so they show up regardless of
  * log4j configuration, matching the reference's always-on progress.
  */
final class ProgressListener(
    intervalMs: Long = 10000,
    stallAfterMs: Long = 60000,
    log: String => Unit = s => System.err.println(s))
  extends SparkListener {

  private final class StageState(val name: String, val numTasks: Int,
      val submittedAt: Long) {
    val tasksDone = new AtomicLong(0)
    val recordsIn = new AtomicLong(0)
    val bytesIn = new AtomicLong(0)
    val recordsOut = new AtomicLong(0)
    val lastTaskAt = new AtomicLong(submittedAt)
    val stallWarned = new AtomicReference[java.lang.Boolean](false)
  }

  private val active = new ConcurrentHashMap[Int, StageState]()

  override def onStageSubmitted(ev: SparkListenerStageSubmitted): Unit =
    active.put(ev.stageInfo.stageId,
      new StageState(ev.stageInfo.name.takeWhile(_ != '\n'),
        ev.stageInfo.numTasks, System.currentTimeMillis()))

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
    active.remove(ev.stageInfo.stageId)

  override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = {
    val st = active.get(ev.stageId)
    if (st != null) {
      st.tasksDone.incrementAndGet()
      st.lastTaskAt.set(System.currentTimeMillis())
      val m = ev.taskMetrics
      if (m != null) {
        st.recordsIn.addAndGet(m.inputMetrics.recordsRead)
        st.bytesIn.addAndGet(m.inputMetrics.bytesRead)
        st.recordsOut.addAndGet(m.outputMetrics.recordsWritten)
      }
    }
  }

  /** One status line per active stage; empty when idle. */
  private[graft] def statusLines(now: Long = System.currentTimeMillis()): Seq[String] = {
    import scala.jdk.CollectionConverters._
    active.asScala.toSeq.sortBy(_._1).map { case (id, st) =>
      val done = st.tasksDone.get()
      val secs = math.max((now - st.submittedAt) / 1000.0, 1e-9)
      val rps = st.recordsIn.get() / secs
      val pct = if (st.numTasks > 0) 100.0 * done / st.numTasks else 0.0
      val eta =
        if (done > 0 && st.numTasks > done)
          f", ETA ${secs / done * (st.numTasks - done)}%.0f s"
        else ""
      f"[progress] stage $id '${st.name}': $done/${st.numTasks} tasks " +
        f"($pct%.0f%%), ${st.recordsIn.get()}%d rows in " +
        f"(${st.bytesIn.get() / 1e6}%.1f MB, $rps%.0f rows/s), " +
        f"${st.recordsOut.get()}%d rows out$eta"
    }
  }

  /** Stages with no task completion for `stallAfterMs`, not yet warned. */
  private[graft] def stalled(now: Long = System.currentTimeMillis()): Seq[String] = {
    import scala.jdk.CollectionConverters._
    active.asScala.toSeq.sortBy(_._1).flatMap { case (id, st) =>
      if (now - st.lastTaskAt.get() >= stallAfterMs &&
          st.stallWarned.compareAndSet(false, true))
        Some(s"[progress] WARNING: stage $id '${st.name}' has completed no " +
          s"task in ${(now - st.lastTaskAt.get()) / 1000} s — possibly stuck")
      else None
    }
  }

  @volatile private var reporter: Thread = _

  /** Attaches the listener and starts the 10 s reporter thread. */
  def start(spark: SparkSession): this.type = {
    spark.sparkContext.addSparkListener(this)
    reporter = new Thread(() => {
      try {
        while (!Thread.interrupted()) {
          Thread.sleep(intervalMs)
          statusLines().foreach(log)
          stalled().foreach(log)
        }
      } catch { case _: InterruptedException => () }
    }, "graft-progress")
    reporter.setDaemon(true)
    reporter.start()
    this
  }

  def stop(spark: SparkSession): Unit = {
    if (reporter != null) reporter.interrupt()
    spark.sparkContext.removeSparkListener(this)
  }
}
