package graft

import java.nio.file.{Files, Path}

/** Tiny filesystem helpers shared by the driver-facing mains and dev
  * tools — one copy of deletion-ordering-sensitive idioms. */
object Fs {
  /** Recursively delete `p` if it exists (children before parents; no-op
    * on a missing path). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
}
