package graft.util

import java.nio.file.{Files, Path, Paths}

/** Local-filesystem helpers shared by jobs, table maintenance, and tests
  * (one definition for the recursive delete — it previously existed in
  * five places; review finding). */
object Fs {

  /** Recursive delete, no-op when the path does not exist. Does not
    * follow symlinks (Files.walk default): a link inside the tree is
    * removed, its target left alone. */
  def rmrf(p: Path): Unit = if (Files.exists(p)) {
    val stream = Files.walk(p)
    try stream.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(x => Files.delete(x))
    finally stream.close()
  }

  def rmrf(p: String): Unit = rmrf(Paths.get(p))
}
