package graft.spider.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.GraftListenerBridge
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Sums executor task metrics over a timed bench region, for the fixed-cost
  * decomposition the two-level scaling protocol needs (BENCH/BASELINE.md):
  *
  *   work_secs  = task_secs / cores  (ideal parallel wall for executor work)
  *   floor_secs = wall - work_secs   (driver actions, scheduling gaps,
  *                                    single-threaded planning — everything
  *                                    task execution cannot parallelize)
  *
  * Executor-work scaling between levels is task_secs(N) / task_secs(4N) —
  * 1.0 when the same total work runs at both levels with no contention
  * inflation — separating "the work scales" from "the sandbox floor does
  * not shrink", which wall-clock efficiency alone conflates at volumes
  * where floor_secs is a visible share of wall.
  */
final class TaskTimeMeter extends SparkListener {
  val runMs       = new LongAdder // executor run time (wall inside the task body)
  val cpuNs       = new LongAdder // executor CPU time
  val deserMs     = new LongAdder // task deserialization (real cost only outside local mode)
  val fetchWaitMs = new LongAdder // blocked on remote shuffle blocks (inside runMs)
  val gcMs        = new LongAdder // JVM GC attributed to the task (inside runMs)
  val tasks       = new LongAdder

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    if (te.taskMetrics != null) {
      runMs.add(te.taskMetrics.executorRunTime)
      cpuNs.add(te.taskMetrics.executorCpuTime)
      deserMs.add(te.taskMetrics.executorDeserializeTime)
      fetchWaitMs.add(te.taskMetrics.shuffleReadMetrics.fetchWaitTime)
      gcMs.add(te.taskMetrics.jvmGCTime)
      tasks.increment()
    }

  def reset(): Unit = {
    runMs.reset(); cpuNs.reset(); deserMs.reset()
    fetchWaitMs.reset(); gcMs.reset(); tasks.reset()
  }

  /** Listener events post asynchronously — drain before reading sums. */
  def drain(sc: SparkContext): Unit = GraftListenerBridge.waitUntilEmpty(sc)

  def taskSecs: Double      = runMs.sum() / 1e3
  def cpuSecs: Double       = cpuNs.sum() / 1e9
  def deserSecs: Double     = deserMs.sum() / 1e3
  def fetchWaitSecs: Double = fetchWaitMs.sum() / 1e3
  def gcSecs: Double        = gcMs.sum() / 1e3
}
