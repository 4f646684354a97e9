package graft.ingest

import graft.model.{FileLifecycle, FileState}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** FSImage-equivalent namespace bootstrap (SURVEY §2.1 S4; behavior of
  * `agent/namenode/main/NameNodeReplicator.java:98-360`: run the image
  * through the offline viewer to XML, parse the INode and directory
  * sections, rebuild full paths including block lists, and load the
  * initial state store).
  *
  * The XML shape consumed here is the standard `hdfs oiv -p XML` layout:
  * `<INodeSection><inode><id/><type/><name/><blocks>…` plus
  * `<INodeDirectorySection><directory><parent/><child/>…`.
  *
  * Scale design: inodes and parent-child edges are parsed in
  * `mapPartitions` (StAX pull parser, streaming — never materializes the
  * document); full paths are resolved by ITERATIVE equi-joins parent
  * pointer at a time (namespace depth ≈ ≤ 64), not a driver-side walk —
  * a 100M-inode namespace resolves in depth-many shuffles of (id,
  * partialPath) pairs. The result feeds
  * [[graft.state.FileStateFSM.replayWithInit]] as the T4 bootstrap
  * state.
  */
object FsImageBootstrap {

  final case class INode(id: Long, inodeType: String, name: String,
      numBlocks: Long, totalBytes: Long)
  final case class Edge(childId: Long, parentId: Long)

  /** Parse the XML (all files under `path`) into inodes + edges. */
  def parse(spark: SparkSession, path: String): (Dataset[INode], Dataset[Edge]) = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile").load(path).select("content")
    val inodes = raw.as[Array[Byte]].mapPartitions(_.flatMap(parseInodes))
    val edges = raw.as[Array[Byte]].mapPartitions(_.flatMap(parseEdges))
    (inodes, edges)
  }

  private def reader(bytes: Array[Byte]) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  private[ingest] def parseInodes(bytes: Array[Byte]): Iterator[INode] = {
    val r = reader(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[INode]
    var id = -1L; var tpe = ""; var name = ""; var nBlocks = 0L
    var totBytes = 0L; var inInode = false; var field = ""
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "inode" =>
              inInode = true; id = -1; tpe = ""; name = ""
              nBlocks = 0; totBytes = 0
            case "block" if inInode => nBlocks += 1
            case other if inInode => field = other
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inInode =>
          val t = r.getText.trim
          if (t.nonEmpty) field match {
            case "id" if id < 0 => id = t.toLong
            case "type" if tpe.isEmpty => tpe = t
            case "name" if name.isEmpty => name = t
            case "numBytes" => totBytes += t.toLong
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "inode" && inInode) {
            inInode = false
            if (id >= 0) out += INode(id, tpe, name, nBlocks, totBytes)
          } else if (inInode) field = ""
        case _ =>
      }
    }
    r.close()
    out.iterator
  }

  private[ingest] def parseEdges(bytes: Array[Byte]): Iterator[Edge] = {
    val r = reader(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[Edge]
    var inDir = false; var parent = -1L; var field = ""
    var inDirSection = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "INodeDirectorySection" => inDirSection = true
            case "directory" if inDirSection => inDir = true; parent = -1
            case other if inDir => field = other
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inDir =>
          val t = r.getText.trim
          if (t.nonEmpty) field match {
            case "parent" => parent = t.toLong
            case "child" | "inode" if parent >= 0 => out += Edge(t.toLong, parent)
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "directory" => inDir = false
            case "INodeDirectorySection" => inDirSection = false
            case _ => if (inDir) field = ""
          }
        case _ =>
      }
    }
    r.close()
    out.iterator
  }

  /** Resolve full paths by iterative parent joins (≤ maxDepth shuffles).
    * Returns (inodeId, fullPath) for every inode reachable from the
    * root. */
  def resolvePaths(inodes: Dataset[INode], edges: Dataset[Edge],
      maxDepth: Int = 64)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val named = inodes.select(col("id"), col("name"))
    val withParent = named.join(edges.toDF(), col("id") === col("childId"),
      "left")
      .select(col("id"), col("name"), col("parentId"))
    var current = withParent
      .withColumn("partial", col("name"))
      .withColumn("nextUp", col("parentId"))
    var i = 0
    var continue = true
    while (i < maxDepth && continue) {
      val parents = withParent.select(
        col("id").as("pid"), col("name").as("pname"),
        col("parentId").as("pparent"))
      val stepped = current.join(parents, col("nextUp") === col("pid"), "left")
        .select(col("id"), col("name"),
          when(col("pid").isNotNull && col("pname") =!= "",
            concat(col("pname"), lit("/"), col("partial")))
            .otherwise(col("partial")).as("partial"),
          col("pparent").as("nextUp"))
      // truncate lineage each round — without this the plan nests one
      // join per depth level and the optimizer re-walks it every action
      current = stepped.transform(graft.util.Pin.apply)
      // fixpoint when nobody has a parent left to climb
      continue = current.filter(col("nextUp").isNotNull).limit(1).count() > 0
      i += 1
    }
    current.select(col("id").as("inodeId"),
      concat(lit("/"), col("partial")).as("path"))
  }

  /** Build the bootstrap FileState table: every FILE inode becomes a
    * Finalized state (the reference loads the image then the snapshot
    * processor emits synthetic CloseFile events — same end state). */
  def bootstrapState(spark: SparkSession, xmlPath: String,
      asOfTxId: Long): Dataset[FileState] = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    val (inodes, edges) = parse(spark, xmlPath)
    val paths = resolvePaths(inodes, edges)
    inodes.toDF().filter(col("inodeType") === "FILE")
      .join(paths, col("id") === col("inodeId"))
      .select(col("path"), col("numBlocks"), col("totalBytes"))
      .as[(String, Long, Long)]
      .map { case (p, nb, bytes) =>
        FileState(p, FileLifecycle.Finalized, numBlocks = nb,
          dataSizeCents = bytes * 100, // fixed-point hundredths convention
          lastTxId = asOfTxId, nOps = 1, nAppends = 0,
          chainKnown = false) // per-block chain not loaded
      }
  }
}
