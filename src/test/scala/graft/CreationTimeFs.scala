package graft

import java.net.URI

import org.apache.hadoop.fs.{BlockLocation, FileStatus, LocatedFileStatus, Path, RawLocalFileSystem, RemoteIterator}

/** Test stand-in for a cloud connector whose FileStatus subclass
  * exposes a creation time distinct from the modification time (the
  * store-side property the reference consumes at app/main.py:120-124).
  * Registered under the `mockct:` scheme via fs.mockct.impl, it serves
  * local files whose statuses report creation = mtime − 30 days, so a
  * spec can prove the reflective probe + O13 coalesce take the cloud
  * branch, not just the file:// (null) fallback.
  *
  * `FileSystem.listFiles(recursive)` routes through
  * `listLocatedStatus`, so that is the override point — exactly where
  * a real connector's subclass statuses enter the listing.
  */
class CreationTimeStatus(st: FileStatus, loc: Array[BlockLocation])
    extends LocatedFileStatus(st, loc) {
  def getCreationTime: Long =
    getModificationTime - CreationTimeFs.CreationLagMs
}

object CreationTimeFs {
  /** creation precedes mtime by 30 days — far enough that a filter
    * bound can sit strictly between the two. */
  val CreationLagMs: Long = 30L * 24 * 3600 * 1000
}

class CreationTimeFs extends RawLocalFileSystem {
  override def getScheme: String = "mockct"
  override def getUri: URI = URI.create("mockct:///")

  // RawLocalFileSystem's statuses load permissions lazily via
  // `new java.io.File(uri)`, which rejects any scheme but file: —
  // materialize plain statuses with explicit fields instead
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map { s =>
      new FileStatus(s.getLen, s.isDirectory, s.getReplication,
        s.getBlockSize, s.getModificationTime, 0L,
        org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
        null, null, s.getPath)
    }

  override def listLocatedStatus(f: Path): RemoteIterator[LocatedFileStatus] = {
    val it = super.listLocatedStatus(f)
    new RemoteIterator[LocatedFileStatus] {
      override def hasNext: Boolean = it.hasNext
      override def next(): LocatedFileStatus = {
        val s = it.next()
        if (s.isFile) new CreationTimeStatus(s, s.getBlockLocations) else s
      }
    }
  }
}
