package graft

/** Prints the library's checkable surface sizes — consumed by
  * `scripts/update_counts.sh`, which rewrites the README/SKILL.md
  * count lines so they can never hand-drift again (r13 verdict item 5:
  * four consecutive rounds shipped a stale count somewhere). No Spark
  * session: the maps are values. */
object SurfaceCounts {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keys.toSeq
    println(s"queries=${qs.size}")
    println(s"oracles=${SparkEntry.oracleSql.size}")
    val maxId = qs.map(_.takeWhile(_ != '_').stripPrefix("q"))
      .flatMap(s => scala.util.Try(s.toInt).toOption).max
    println(s"max_query_id=$maxId")
  }
}
