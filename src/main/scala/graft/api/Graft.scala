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
  * mains under `agent/namenode/main/`). Each reference endpoint was a
  * thin wrapper over exactly these operations; [[GraftRest]] serves
  * the same routes over HTTP on the JDK's built-in server.
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
  // State persistence protocol (K6 at scale): the table is a sequence of
  // versioned parquet dirs `files_v<N>`. v-dirs become visible only via
  // their job-commit `_SUCCESS` marker, and readers always select the
  // highest COMPLETE version set — so a crash mid-write leaves a
  // markerless dir that readers skip, and no write ever overwrites a dir
  // a reader may be scanning (the former `mode("overwrite")` of the very
  // dir being read was timing-dependent data loss). Incremental batches
  // persist ONLY the touched paths as a delta version (the reference
  // updates per-znode, `agent/common/FileStateHelper.java:231-274`; a
  // full-table rewrite per micro-batch dies at a 100M-file namespace);
  // readers merge base+deltas with last-version-wins per path, and
  // [[compact]] folds them back into one base (auto after
  // [[Graft.AutoCompactAfter]] deltas).

  /** Batch replay (rename fan-out applied first); persisted as a new
    * full base version. */
  def replay(events: Dataset[ChangeEvent]): Dataset[FileState] = {
    val st = FileStateFSM.replayAll(RenameExpander.expandFileRenames(events))
    persist(st)
    st
  }

  /** Incremental replay: fold this batch's events into the state of the
    * TOUCHED paths only, and persist only those as a delta version. */
  def replayIncrement(events: Dataset[ChangeEvent]): Dataset[FileState] = {
    val ev = RenameExpander.expandFileRenames(events)
    val touched = ev.toDF().select(col("path")).distinct()
    val base = stateTable.toDF()
      .join(touched, Seq("path"), "left_semi").as[FileState]
    val updated = FileStateFSM.replayWithInit(base, ev)
    persist(updated)
    if (versions().size > Graft.AutoCompactAfter) compact()
    stateTable
  }

  /** Columns added to FileState after a store was written get default
    * values on read, so a persisted store survives model evolution
    * (e.g. `blocks`/`chainKnown` did not exist in early versions).
    * NOTE: streaming-FSM checkpoints do NOT get this treatment — a
    * state-schema change requires a fresh checkpoint (bootstrap from
    * the state table, then resume the stream). */
  private def backfillDefaults(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    Seq(
      "blocks" -> lit(null).cast(
        "array<struct<blockId:bigint,prevBlockId:bigint,numBytes:bigint,lastTxId:bigint>>"),
      "chainKnown" -> lit(false), // unknown provenance → chain unknown
      "nAppends" -> lit(0L))
      .foldLeft(df) { case (acc, (name, default)) =>
        if (have(name)) acc else acc.withColumn(name, default)
      }
  }

  /** Merged view: base + deltas, newest version wins per path. */
  def stateTable: Dataset[FileState] = {
    val vs = versions()
    require(vs.nonEmpty, s"no state versions under $stateDir")
    val merged = vs.map { v =>
        backfillDefaults(spark.read.parquet(s"$stateDir/files_v$v"))
          .withColumn("__v", lit(v))
      }
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("__v").desc)
    merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__v", "__rn")
      .as[FileState]
  }

  /** Fold all versions into a single new base and prune the old ones. */
  def compact(): Unit = {
    val vs = versions()
    val snapshot = stateTable.toDF().localCheckpoint(true)
    writeVersion(snapshot, allVersionDirs().maxOption.getOrElse(-1L) + 1)
    vs.foreach(v => fs.delete(hpath(s"files_v$v"), true))
  }

  /** Committed state versions, ascending (dirs with a `_SUCCESS`
    * marker; an uncommitted/crashed write is invisible). */
  def versions(): Seq[Long] = {
    val dir = hpath("")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case VersionDir(v) if fs.exists(
        hpath(s"files_v$v/_SUCCESS")) => v.toLong }
      .sorted
  }

  private val VersionDir = """files_v(\d+)""".r
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    java.net.URI.create(stateDir), spark.sparkContext.hadoopConfiguration)
  private def hpath(rel: String) =
    new org.apache.hadoop.fs.Path(if (rel.isEmpty) stateDir else s"$stateDir/$rel")

  /** Every version dir on disk, committed or not — the next write must
    * never reuse a crashed writer's dir. */
  private def allVersionDirs(): Seq[Long] = {
    val dir = hpath("")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case VersionDir(v) => v.toLong }
  }

  private def persist(st: Dataset[FileState]): Unit =
    writeVersion(st.toDF(), allVersionDirs().maxOption.getOrElse(-1L) + 1)

  private def writeVersion(df: DataFrame, v: Long): Unit =
    df.write.mode("errorifexists").parquet(s"$stateDir/files_v$v")

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

object Graft {
  /** Delta-version count that triggers auto-compaction on the next
    * incremental replay (keeps the read-side merge bounded). */
  val AutoCompactAfter = 8
}
