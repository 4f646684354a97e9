package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scratch-directory scope for the streaming gate queries (q63 / q72 /
  * q77): stage inputs, run the stream, read the result back — and
  * delete the staged corpus + sink + checkpoint even when the stream
  * or the read-back THROWS, so a failed run never leaks a copy of the
  * event log under /tmp. */
object StreamScratch {
  def withScratch[T](prefix: String)(body: String => T)(
      implicit spark: SparkSession): T = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(tmp)
    finally {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(tmp), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
  }
}
