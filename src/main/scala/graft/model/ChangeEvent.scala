package graft.model

/** Change-event data model — the Spark-native re-expression of the
  * reference's protobuf envelope + 11 typed payloads
  * (`common/src/main/proto`, dispatch in
  * `core/messaging/ChangeDeltaSerDe.java:259-288`) and transaction model
  * (`agent/model/DFSTransactionType.java:25-120`).
  *
  * One flat case class instead of 11 protobuf messages: Spark encodes it
  * as a single wide row (nullable columns per op family), which keeps the
  * whole pipeline in Tungsten rows / whole-stage codegen instead of
  * opaque serialized payloads.
  */
object Op {
  val AddFile = "AddFile"
  val AppendFile = "AppendFile"
  val DeleteFile = "DeleteFile"
  val AddBlock = "AddBlock"
  val UpdateBlocks = "UpdateBlocks"
  val TruncateBlock = "TruncateBlock"
  val CloseFile = "CloseFile"
  val RenameFile = "RenameFile"
  val IgnoreTx = "IgnoreTx"
  val ErrorTx = "Error"
  val ChangeData = "ChangeData"
  val all: Seq[String] = Seq(AddFile, AppendFile, DeleteFile, AddBlock,
    UpdateBlocks, TruncateBlock, CloseFile, RenameFile, IgnoreTx, ErrorTx,
    ChangeData)
}

/** Message modes (ref `core/messaging/MessageObject.java:11-26`, all
  * SIX): bootstrap/catch-up/live protocol of SURVEY §2.10 T4 plus the
  * two recovery modes. `ReSend` marks an idempotent re-emit of a
  * possibly-already-delivered message (an at-least-once producer
  * replaying its tail) — folded like `New`, and a duplicate is a
  * silent no-op by design, never an anomaly. `Retry` marks an
  * error-channel reprocess: it is the ONLY mode that applies to a
  * path whose state is sticky-`Error`, un-sticking it (the reference
  * declares both modes but never produces them in-tree; checkpoint
  * replay covers ReSend's purpose and the DLQ flow covers Retry's —
  * carrying them keeps wire parity with any out-of-tree producer). */
object Mode {
  val New = "New"
  val ReSend = "ReSend"
  val Snapshot = "Snapshot"
  val Backlog = "Backlog"
  val Error = "Error"
  val Retry = "Retry"
  val all: Set[String] = Set(New, ReSend, Snapshot, Backlog, Error, Retry)
}

/** One file-system change event (envelope + payload united).
  *
  * @param txId        transaction id — the logical watermark
  * @param op          one of [[Op]]
  * @param path        file path (the state key)
  * @param mode        one of [[Mode]]
  * @param sizeCents   size delta in fixed-point hundredths (exact math —
  *                    floats never enter the FSM)
  * @param ts          event-time epoch millis (from the event, never
  *                    wall clock — determinism)
  * @param srcPath     rename source (op == RenameFile)
  * @param blockId     block payload (block ops), -1 otherwise
  * @param startOffset block delta range start, -1 if n/a
  * @param endOffset   block delta range end, -1 if n/a
  * @param prevBlockId predecessor in the file's block chain (AddBlock
  *                    ops; -1 = first block or unknown) — drives the
  *                    chain-integrity check of SURVEY §2.6 W2
  */
final case class ChangeEvent(
    txId: Long,
    op: String,
    path: String,
    mode: String = Mode.New,
    sizeCents: Long = 0L,
    ts: Long = 0L,
    srcPath: String = "",
    blockId: Long = -1L,
    startOffset: Long = -1L,
    endOffset: Long = -1L,
    prevBlockId: Long = -1L)

/** File lifecycle states (ref `core/model/EFileState.java:3-5`). */
object FileLifecycle {
  val Unknown = "Unknown"
  val New = "New"
  val Updating = "Updating"
  val Finalized = "Finalized"
  val Deleted = "Deleted"
  val Error = "Error"
}

/** Per-block state carried inside the file state (ref
  * `core/model/DFSBlockState.java:12-26`): the `prevBlockId` linked-list
  * chain is what the reference's chain-integrity check walks
  * (`agent/common/FileStateHelper.java:176-199`). Offset-range deltas
  * (the change-set compression input) live in
  * [[graft.changeset.RangeMerge]]. */
final case class BlockState(
    blockId: Long,
    prevBlockId: Long = -1L,
    numBytes: Long = 0L,
    lastTxId: Long = -1L)

/** Keyed file state — the `S` of the FSM (ref `core/model/DFSFileState
  * .java:14-29`). `blocks` mirrors the reference's `List[DFSBlockState]`
  * ordered by chain position; `numBlocks` stays denormalized because the
  * reporting queries group on it without exploding the array.
  * `chainKnown` = false marks states whose per-block chain is UNKNOWN
  * (bootstrap-loaded from fsimage/snapshot, or mutated by a chain-less
  * block event) — integrity checks must not treat an unknown chain as
  * an empty one. */
final case class FileState(
    path: String,
    state: String = FileLifecycle.Unknown,
    numBlocks: Long = 0L,
    dataSizeCents: Long = 0L,
    lastTxId: Long = -1L,
    nOps: Long = 0L,
    nAppends: Long = 0L,
    blocks: Seq[BlockState] = Nil,
    chainKnown: Boolean = true)

/** Replica bookkeeping keyed by inode (ref
  * `agent/model/DFSFileReplicaState.java:18-36`): what has been
  * *replicated* vs what has been *seen*, plus the snapshot handshake
  * fields the Snapshot→Backlog decision reads. */
final case class ReplicaState(
    inode: Long,
    path: String,
    snapshotTxId: Long = -1L,
    lastReplicatedTx: Long = -1L,
    snapshotReady: Boolean = false)
