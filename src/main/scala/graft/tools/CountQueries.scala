package graft.tools

/** Dev utility: prints the registered query/oracle counts and any
  * query keys lacking an oracle (driver records those as rows-only).
  */
object CountQueries {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries
    val o = graft.SparkEntry.oracleSql
    println(s"QUERIES=${q.size} ORACLES=${o.size}")
    val noOracle = q.keySet -- o.keySet
    println(s"NO_ORACLE=${noOracle.toSeq.sorted.mkString(",")}")
    val orphan = o.keySet -- q.keySet
    println(s"ORPHAN_ORACLE=${orphan.toSeq.sorted.mkString(",")}")
  }
}
