package graft

import java.net.URI
import java.util.Collections
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test stand-in for an object store without atomic rename (the s3a
  * semantics the reference's Azure SDK also lives with: every "move" is
  * copy+delete, app/main.py:174-185). `rename` always returns false and
  * is counted; `delete` records which paths were destroyed so specs can
  * prove the sink never pre-deletes a destination it hasn't replaced.
  * Paths whose name contains "contested" report exists=false exactly
  * once — the check-then-act window in which a concurrent writer lands
  * the destination between our existence probe and our write.
  * Registered under `nonatomic:` via fs.nonatomic.impl.
  */
object NonAtomicRenameFs {
  val renameAttempts = new AtomicInteger(0)
  val deletedPaths: java.util.Set[String] =
    Collections.synchronizedSet(new java.util.HashSet[String]())
  val contestedLies = new AtomicInteger(0)
  def reset(): Unit = {
    renameAttempts.set(0); deletedPaths.clear(); contestedLies.set(0)
  }
}

class NonAtomicRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean = {
    NonAtomicRenameFs.renameAttempts.incrementAndGet()
    false // object stores have no atomic rename
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    NonAtomicRenameFs.deletedPaths.add(f.toUri.getPath)
    super.delete(f, recursive)
  }

  override def exists(f: Path): Boolean =
    if (f.getName.contains("contested") &&
        NonAtomicRenameFs.contestedLies.getAndDecrement() > 0) false
    else super.exists(f)
}
