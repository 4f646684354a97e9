package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement-only listener (guide §1): attach via
  * `-Dspark.extraListeners=graft.JobDump` to print each job's wall time
  * and each stage's task count/runtime, attributing fixed per-trigger
  * or per-round overhead. Not referenced by any query path. */
class JobDump extends SparkListener {
  private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
  override def onJobStart(e: SparkListenerJobStart): Unit = {
    starts.put(e.jobId, System.nanoTime()); ()
  }
  override def onJobEnd(e: SparkListenerJobEnd): Unit = {
    val t0 = starts.remove(e.jobId)
    val ms = if (t0 == 0) -1 else (System.nanoTime() - t0) / 1000000
    System.err.println(s"[job] id=${e.jobId} ms=$ms")
  }
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    val i = e.stageInfo
    val ms = for {
      a <- i.submissionTime; b <- i.completionTime
    } yield b - a
    System.err.println(
      s"[stage] id=${i.stageId} tasks=${i.numTasks} ms=${ms.getOrElse(-1L)} name=${i.name.takeWhile(_ != '(')}")
  }
}
