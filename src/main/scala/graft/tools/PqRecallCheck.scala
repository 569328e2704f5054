package graft.tools
object PqRecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("8", "pq-check")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = graft.ops.Similarity.sCosineTopk(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      val pq = graft.ops.Similarity.sPqTopk(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      println(s"[pq] $sf recall@5 = ${exact.intersect(pq).size.toDouble / exact.size}")
    }
    spark.stop()
  }
}
