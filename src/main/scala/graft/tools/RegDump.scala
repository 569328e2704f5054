package graft.tools

import graft.SparkEntry

/** Dumps the sorted registry id list (one per line) for tooling diffs. */
object RegDump {
  def main(a: Array[String]): Unit =
    SparkEntry.queries.keySet.toSeq.sorted.foreach(println)
}
