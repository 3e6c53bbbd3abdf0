package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

/** Atomic small-file publication through the Hadoop FS API.
  *
  * The naive `delete(target); rename(tmp, target)` sequence (the classic
  * FileSystem.rename can't overwrite) leaves a window where the target does
  * not exist: a concurrent reader fails, and a crash between the two calls
  * loses the previously committed file. FileContext.rename with
  * Options.Rename.OVERWRITE is a single atomic replace on HDFS-like stores
  * and on the local POSIX filesystem, so readers always see either the old
  * or the new content — never neither. */
object FsAtomic {

  /** Write `bytes` to `path` via a writer-unique temp file + one atomic
    * overwrite-rename. Parent directories are created as needed. */
  def overwriteFile(conf: Configuration, path: Path, bytes: Array[Byte]): Unit = {
    val fc = FileContext.getFileContext(path.toUri, conf)
    // writer-unique temp name: two racing writers must never share a tmp
    // file, or one could publish the other's half-written bytes
    val tmp = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(bytes) finally out.close()
    fc.rename(tmp, path, Options.Rename.OVERWRITE)
  }
}
