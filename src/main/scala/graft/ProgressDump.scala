package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement-only listener (guide §1): attach via
  * `-Dspark.sql.streaming.streamingQueryListeners=graft.ProgressDump`
  * to print each micro-batch's duration breakdown (triggerExecution /
  * queryPlanning / walCommit / stateStoreCommit / addBatch / ...) so a
  * streaming gate's fixed per-trigger overhead can be attributed
  * before optimizing it. Not referenced by any query path. */
class ProgressDump extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val d = p.durationMs
    val keys = d.keySet().toArray(Array.empty[String]).sorted
    val parts = keys.map(k => s"$k=${d.get(k)}").mkString(" ")
    System.err.println(
      s"[progress] batch=${p.batchId} rows=${p.numInputRows} $parts")
    p.stateOperators.foreach { so =>
      System.err.println(
        s"[state] batch=${p.batchId} op=${so.operatorName} " +
          s"commitMs=${so.commitTimeMs} updMs=${so.allUpdatesTimeMs} " +
          s"rmMs=${so.allRemovalsTimeMs} rows=${so.numRowsTotal} " +
          s"mem=${so.memoryUsedBytes}")
    }
  }
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
