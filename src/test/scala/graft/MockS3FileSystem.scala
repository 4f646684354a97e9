package graft

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** Hermetic object-store stand-in for the S3 contract test — the same
  * role S3Mock plays in the reference's one hermetic e2e
  * (`FileDeltaProcessorTest.java:21-73`), without the unavailable AWS
  * jars: a `mocks3://` Hadoop FileSystem, discovered through the
  * standard `META-INF/services` mechanism (so `FileSystem.get` resolves
  * it from ANY `Configuration`, including the bare `new Configuration()`
  * an executor-side writer constructs), that stores bytes locally but
  * imposes the semantics that make object stores different:
  *
  *  - **rename is COPY + DELETE, never atomic** — exactly S3A's
  *    contract. Anything in the pipeline that silently relies on an
  *    atomic posix rename (job-commit protocols, `_SUCCESS` gating,
  *    staging-dir moves) exercises the object-store code path here.
  *
  * The spec asserts the non-atomic rename path actually engaged, so a
  * green run proves the replica/delta/state machinery works against an
  * FS with S3 semantics — the reference's `core/io/impl/s3/
  * S3FileSystem.java:42-445` collapses to the same Hadoop FS surface. */
final class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: URI = URI.create("mocks3:///")

  override def rename(src: Path, dst: Path): Boolean = {
    MockS3FileSystem.renames.incrementAndGet()
    if (!exists(src)) false
    // copy+delete, the S3A shape: a crash mid-rename leaves BOTH paths
    else FileUtil.copy(this, src, this, dst, true, getConf)
  }
}

object MockS3FileSystem {
  /** Spied by the contract spec: proof the object-store rename path ran. */
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}
