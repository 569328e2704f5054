package graft.tools

import graft.SparkEntry

/** Prints the formatted physical plan of named registry queries — the
  * op-review loop (`.explain("formatted")` + iterate until the plan is the
  * one you'd want at 100 TB) as a one-command tool.
  *
  * usage: run_main.sh graft.tools.PlanDump <sfDir> q1[,q2,...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(SparkEntry.queries.keySet.toSeq.sorted)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-plandump")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(fn) =>
          println(s"===== $n =====")
          fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
