package graft.cli

/** Dev utility: print gate/oracle counts and any mismatched registrations. */
object CountGates {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("q-o: " + (q -- o).toSeq.sorted.mkString(","))
    println("o-q: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
