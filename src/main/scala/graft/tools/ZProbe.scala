package graft.tools

import graft.Tables
import graft.catalog.LakeCatalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ad-hoc probe for the c_zorder prune geometry at a given SF — not part of
  * the driver contract. */
object ZProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "graft-zprobe")
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val cat = new LakeCatalog(spark, scratch)
    val src = Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        expr("ts div 1000").as("ts_us"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("ts_us", LongType)))
    cat.dropTable("scratch", "ev_zorder")
    cat.createTable("scratch", "ev_zorder", schema)
    cat.appendZOrdered("scratch", "ev_zorder", src, "user_id", "ts_us", 32)
    cat.dropTable("scratch", "ev_linear")
    cat.createTable("scratch", "ev_linear", schema)
    cat.appendClustered("scratch", "ev_linear", src, Seq("user_id"), 32)

    val r = src.agg(min("user_id"), max("user_id"), min("ts_us"), max("ts_us")).head()
    val (umn, umx) = (r.getLong(0), r.getLong(1))
    val (tmn, tmx) = (r.getLong(2), r.getLong(3))
    println(s"user range: $umn .. $umx   ts_us range: $tmn .. $tmx")
    val uLo = umn + (umx - umn) * 3 / 8
    val uHi = umn + (umx - umn) * 5 / 8
    val tLo = tmn + (tmx - tmn) * 3 / 8
    val tHi = tmn + (tmx - tmn) * 4 / 8

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
