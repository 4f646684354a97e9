package graft.state

import graft.model.{ChangeEvent, FileState, Op}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Rename fan-out and directory-op expansion — the reference's one true
  * generator/UDTF shape (SURVEY §2.11; behavior of
  * `agent/namenode/SourceTransactionProcessor.java:671-763`: a rename
  * synthesizes delete(src) + add(dest) + close(dest); a directory
  * rename/delete fans out to every live file under the prefix,
  * `FileStateHelper.listFiles` recursion + J4 prefix join
  * `SourceTransactionProcessor.java:187-207,244-262`; `/tmp` children
  * are skipped on directory delete `:250-256`).
  *
  * Cross-key event synthesis cannot happen inside the per-key FSM (src
  * and dest are different keys), so expansion is a pre-processing
  * `flatMap` over the event stream — exactly the reference's shape, but
  * distributed. Sub-transaction ordering: every original txId is scaled
  * ×4 and synthetic events take +1/+2/+3, preserving global order while
  * keeping per-key txIds strictly increasing for the FSM's duplicate
  * guard.
  *
  * Directory ops need the CURRENT state table (which paths live under
  * the prefix) — a prefix theta-join (J4). In streaming this runs in
  * foreachBatch against the state snapshot table, accepting one-batch
  * staleness exactly like the reference's lock-serialized equivalent
  * (SURVEY §7.5 risk 3).
  */
object RenameExpander {

  /** Scale a txId to its sub-tx base. */
  def baseTx(txId: Long): Long = txId * 4

  /** Expand file-level renames (no state needed). Non-rename events get
    * their txIds rebased onto the ×4 grid. */
  def expandFileRenames(events: Dataset[ChangeEvent])(
      implicit spark: SparkSession): Dataset[ChangeEvent] = {
    import spark.implicits._
    events.flatMap { ev =>
      if (ev.op == Op.RenameFile && ev.srcPath.nonEmpty)
        Seq(
          ev.copy(op = Op.DeleteFile, path = ev.srcPath, srcPath = "",
            sizeCents = 0, txId = baseTx(ev.txId)),
          ev.copy(op = Op.AddFile, srcPath = "", sizeCents = 0,
            txId = baseTx(ev.txId) + 1),
          // carry the renamed file's size (caller populates sizeCents
          // from state) so dest state accrues it
          ev.copy(op = Op.AppendFile, srcPath = "",
            txId = baseTx(ev.txId) + 2),
          ev.copy(op = Op.CloseFile, srcPath = "", sizeCents = 0,
            txId = baseTx(ev.txId) + 3))
      else
        Seq(ev.copy(txId = baseTx(ev.txId)))
    }
  }

  /** Prefix rewrite (C2 semantics: `concat(destDir, substring(path,
    * length(srcDir)+1))` — safer than string replace). */
  def rewritePrefix(path: String, srcDir: String, dstDir: String): String =
    dstDir + path.substring(srcDir.length)

  /** Directory rename: fan out one synthetic (delete@old, add@new,
    * close@new) triple per live file under `srcDir` in the given state
    * table. Returns the synthetic events (already on the ×4 grid). */
  def expandDirRename(state: Dataset[FileState], srcDir: String,
      dstDir: String, txId: Long)(
      implicit spark: SparkSession): Dataset[ChangeEvent] = {
    import spark.implicits._
    val prefix = if (srcDir.endsWith("/")) srcDir else srcDir + "/"
    state
      .filter(st => st.path.startsWith(prefix) &&
        st.state != graft.model.FileLifecycle.Deleted)
      .flatMap { st =>
        val dest = rewritePrefix(st.path, prefix,
          if (dstDir.endsWith("/")) dstDir else dstDir + "/")
        Seq(
          ChangeEvent(baseTx(txId), Op.DeleteFile, st.path),
          ChangeEvent(baseTx(txId) + 1, Op.AddFile, dest),
          ChangeEvent(baseTx(txId) + 2, Op.AppendFile, dest,
            sizeCents = st.dataSizeCents),
          ChangeEvent(baseTx(txId) + 3, Op.CloseFile, dest))
      }
  }

  /** Directory delete: one synthetic delete per live file under the
    * prefix; children under /tmp are skipped (F6). */
  def expandDirDelete(state: Dataset[FileState], dir: String, txId: Long)(
      implicit spark: SparkSession): Dataset[ChangeEvent] = {
    import spark.implicits._
    val prefix = if (dir.endsWith("/")) dir else dir + "/"
    state
      .filter(st => st.path.startsWith(prefix) &&
        !st.path.startsWith("/tmp/") &&
        st.state != graft.model.FileLifecycle.Deleted)
      .map(st => ChangeEvent(baseTx(txId) + 1, Op.DeleteFile, st.path))
  }
}
