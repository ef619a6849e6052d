package graft

/** Best-effort recursive delete for driver-LOCAL temp resources
  * (per-run checkpoint dirs, per-JVM artifact dirs, managed-table
  * leftovers) — the shared helper behind the streaming twins and the
  * lineage queries (previously two byte-identical private copies; a
  * fix to one would silently miss the other). Deliberately java.nio:
  * these paths are always on the driver's local disk — a DISTRIBUTED
  * store path goes through Hadoop's FileSystem instead
  * (graft.lineage.LineageStore). */
private[graft] object Cleanup {
  def deleteRecursively(p: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    } catch { case _: Throwable => () }
}
