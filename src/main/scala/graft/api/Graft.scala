package graft.api

import graft.filters.DomainFilters
import graft.filters.DomainFilters.Filter
import graft.model.{ChangeEvent, FileState, Mode, Op}
import graft.state.{FileStateFSM, RenameExpander}
import graft.streaming.ChangeStreamPipeline
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Thin management facade — the Spark-native replacement for the
  * reference's CLI runners + Spring REST surface (SURVEY §2.12:
  * filter add/remove, snapshot run/status, edits-log processing;
  * `svc/namenode/SnapshotService.java:26-177`,
  * `svc/namenode/EditsLogReaderService.java:21-75`, and the runner
  * mains under `agent/namenode/main/`). REST is deliberately out of scope:
  * each endpoint was a thin wrapper over exactly these operations.
  *
  * Instances are driver-side session objects; all heavy lifting stays in
  * Spark jobs. The state table is a plain parquet directory — queryable
  * with any Spark/DuckDB reader (the reference's ZK tree doubled as a
  * query surface; a columnar table is the scalable form of that).
  */
final class Graft(val spark: SparkSession, stateDir: String) {
  implicit private val s: SparkSession = spark
  import spark.implicits._

  @volatile private var registered: Vector[Filter] = Vector.empty

  // ── filter registry (DomainManager parity) ────────────────────────────
  def addFilter(f: Filter): Unit = synchronized {
    registered = (registered :+ f).sortBy(_.priority)
  }
  def removeFilter(domain: String, entity: String): Unit = synchronized {
    registered = registered.filterNot(f =>
      f.domain == domain && f.entity == entity)
  }
  def filters: Seq[Filter] = registered

  /** Route a path-carrying DataFrame through the registered filters. */
  def route(events: DataFrame): DataFrame =
    DomainFilters.route(events, registered)

  // ── replay / state ───────────────────────────────────────────────────
  /** Batch replay (rename fan-out applied first), state table persisted. */
  def replay(events: Dataset[ChangeEvent]): Dataset[FileState] = {
    val st = FileStateFSM.replayAll(RenameExpander.expandFileRenames(events))
    persist(st)
    st
  }

  /** Incremental replay on top of the persisted state table. */
  def replayIncrement(events: Dataset[ChangeEvent]): Dataset[FileState] = {
    val st = FileStateFSM.replayWithInit(stateTable,
      RenameExpander.expandFileRenames(events))
    persist(st)
    st
  }

  def stateTable: Dataset[FileState] =
    spark.read.parquet(s"$stateDir/files").as[FileState]

  private def persist(st: Dataset[FileState]): Unit =
    st.toDF().write.mode("overwrite").parquet(s"$stateDir/files")

  // ── snapshot (HDFSSnapshotProcessor parity) ──────────────────────────
  /** Emit synthetic Snapshot-mode CloseFile events for every live file
    * in the state table matching the registered filters (ref
    * `agent/namenode/HDFSSnapshotProcessor.java:83-233`: bootstrap
    * downstream consumers from current state). */
  def snapshot(asOfTxId: Long): Dataset[ChangeEvent] = {
    val matched = route(stateTable.toDF())
      .filter(col("entity") =!= "IgnoreTx" &&
        col("state") =!= graft.model.FileLifecycle.Deleted)
    matched.select(col("path"), col("dataSizeCents")).as[(String, Long)]
      .map { case (p, cents) =>
        ChangeEvent(asOfTxId, Op.CloseFile, p, mode = Mode.Snapshot,
          sizeCents = cents)
      }
  }

  /** Snapshot progress — count of matching live files per entity. */
  def snapshotStatus(): DataFrame =
    route(stateTable.toDF())
      .filter(col("entity") =!= "IgnoreTx")
      .groupBy(col("domain"), col("entity"))
      .agg(count(lit(1)).as("n_files"),
        max(col("lastTxId")).as("max_txid"))

  // ── streaming / watermark ────────────────────────────────────────────
  def startStream(inDir: String, checkpoint: String,
      queryName: String): StreamingQuery =
    ChangeStreamPipeline.start(inDir, checkpoint, queryName)

  /** Tx high-watermark of the persisted state (A4 parity). */
  def watermark(): Long = {
    val r = stateTable.agg(max(col("lastTxId"))).as[Option[Long]].head()
    r.getOrElse(-1L)
  }
}
