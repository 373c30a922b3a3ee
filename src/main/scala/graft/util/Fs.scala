package graft.util

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Local-filesystem helpers shared by the probe/verify harnesses. */
object Fs {

  /** Recursively delete `dir` if it exists (children before parents).
    * Harness-side only — the engine's data paths go through Hadoop
    * filesystems, never this.
    */
  def deleteRecursively(dir: String): Unit = {
    val root: Path = Paths.get(dir)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists)
      finally walk.close()
    }
  }
}
