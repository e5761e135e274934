package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test stand-in for a target store that accepts the copy ISSUANCE
  * (exists/mkdirs succeed) but rejects the write itself — the failure
  * mode CopyAsync's fire-and-forget contract must stay truthful under:
  * status `pending` was already reported when the detached transfer
  * dies. Registered under `failwrite:` via fs.failwrite.impl; every
  * create() throws, and a counter lets specs await the rejection
  * deterministically instead of sleeping.
  */
object FailingWriteFs {
  val createAttempts = new AtomicInteger(0)
}

class FailingWriteFs extends RawLocalFileSystem {
  override def getScheme: String = "failwrite"
  override def getUri: URI = URI.create("failwrite:///")

  // FileUtil.copy reaches the FS through the non-permission create
  // overload; the permission variant is covered too so no path writes
  private def reject(f: Path): Nothing = {
    FailingWriteFs.createAttempts.incrementAndGet()
    throw new java.io.IOException(s"injected write rejection for $f")
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = reject(f)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = reject(f)
}
