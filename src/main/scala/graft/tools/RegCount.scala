package graft.tools

import graft.SparkEntry

/** Prints registry/oracle counts and any asymmetry between the two maps. */
object RegCount {
  def main(a: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println("queries w/o oracle: " + (q -- o).toSeq.sorted.mkString(","))
    println("oracles w/o query: " + (o -- q).toSeq.sorted.mkString(","))
  }
}
