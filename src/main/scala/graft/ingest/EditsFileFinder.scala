package graft.ingest

/** Edit-log segment discovery (SURVEY §2.1 S1; behavior of
  * `agent/common/DFSEditsFileFinder.java:37-140`): given a directory of
  * HDFS-style segment files `edits_<start19>-<end19>` /
  * `edits_inprogress_<start19>` plus a `seen_txid` marker, select the
  * segments overlapping a txId range, in order.
  *
  * Pure functions over listed names — the Spark source wraps this in its
  * file-listing step; at scale the listing itself stays driver-side
  * (directory metadata, not data).
  */
object EditsFileFinder {

  final case class Segment(name: String, startTx: Long, endTx: Long,
      inProgress: Boolean)

  private val Finalized = """edits_(\d{19})-(\d{19})""".r
  private val InProgress = """edits_inprogress_(\d{19})""".r

  def parse(name: String): Option[Segment] = name match {
    case Finalized(s, e) => Some(Segment(name, s.toLong, e.toLong, false))
    case InProgress(s) => Some(Segment(name, s.toLong, Long.MaxValue, true))
    case _ => None
  }

  /** Segments overlapping [startTx, endTx] (use -1 for an open bound),
    * ordered by start txId. */
  def findEditsFiles(names: Seq[String], startTx: Long, endTx: Long): Seq[Segment] = {
    val lo = if (startTx < 0) Long.MinValue else startTx
    val hi = if (endTx < 0) Long.MaxValue else endTx
    names.flatMap(parse)
      .filter(s => s.startTx <= hi && s.endTx >= lo)
      .sortBy(_.startTx)
  }

  /** The currently-open segment, if any. */
  def currentSegment(names: Seq[String]): Option[Segment] =
    names.flatMap(parse).filter(_.inProgress).sortBy(_.startTx).lastOption

  /** Parse the `seen_txid` marker file contents. */
  def parseSeenTxId(contents: String): Option[Long] =
    contents.trim.toLongOption
}
