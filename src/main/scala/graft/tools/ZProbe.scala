package graft.tools

/** Ad-hoc probe for the c_zorder prune geometry at a given SF — not part of
  * the driver contract. Reuses the op's OWN layout+bounds derivation
  * ([[graft.ops.CatalogOps7.zorderLayoutAndBounds]]) so the probed geometry
  * is exactly what the gate measures. */
object ZProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "graft-zprobe")
    val (cat, uLo, uHi, tLo, tHi) =
      graft.ops.CatalogOps7.zorderLayoutAndBounds(spark, sfDir)
    println(s"user slab: $uLo .. $uHi   time slab: $tLo .. $tHi")
    val timeSlab = Seq(("ts_us", tLo.toDouble, tHi.toDouble))
    val box = Seq(("user_id", uLo.toDouble, uHi.toDouble),
      ("ts_us", tLo.toDouble, tHi.toDouble))
    val (linSlabRead, linSlabSkip) = cat.pruneFilesBox("scratch", "ev_linear", timeSlab)
    val (zSlabRead, zSlabSkip) = cat.pruneFilesBox("scratch", "ev_zorder", timeSlab)
    val (zBoxRead, zBoxSkip) = cat.pruneFilesBox("scratch", "ev_zorder", box)
    println(s"linear slab: read=${linSlabRead.size} skip=${linSlabSkip.size}")
    println(s"zorder slab: read=${zSlabRead.size} skip=${zSlabSkip.size}")
    println(s"zorder box : read=${zBoxRead.size} skip=${zBoxSkip.size}")
    spark.stop()
  }
}
