package graft

import graft.catalog.{CommitConflictException, LakeCatalog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 batch i: optimistic-concurrency commit validation. */
class Round5iSpec extends SparkSpec {

  private def freshCat: LakeCatalog = {
    val root = java.nio.file.Files.createTempDirectory("graft_r5i").toString
    new LakeCatalog(spark, root)
  }

  test("stale COW rewrite conflicts; valid CAS commit succeeds; retry composes") {
    import spark.implicits._
    val cat = freshCat
    cat.createTable("ns", "cc", StructType(Seq(StructField("id", LongType))))
    cat.append("ns", "cc", (1L to 20L).toDF("id")) // v1
    val base = cat.headVersion("ns", "cc")

    // CAS against an unmoved head succeeds
    cat.deleteWhereAt("ns", "cc", col("id") > 18, base) // v2
    assert(cat.load("ns", "cc").count() == 18)

    // now a concurrent append lands...
    val base2 = cat.headVersion("ns", "cc")
    cat.append("ns", "cc", (100L to 109L).toDF("id")) // v3
    // ...and the writer planning from base2 must NOT publish
    intercept[CommitConflictException] {
      cat.deleteWhereAt("ns", "cc", col("id") % 2 === 0, base2)
    }
    // the failed commit changed nothing: B's rows all present, no deletes
    assert(cat.load("ns", "cc").count() == 28)
    // retry from the CURRENT head composes both writers' effects
    cat.deleteWhere("ns", "cc", col("id") % 2 === 0)
    val ids = cat.load("ns", "cc").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ((1L to 18L) ++ (100L to 109L)).filter(_ % 2 == 1).sorted)
    // the aborted rewrite's staged files are unreferenced debris → swept
    assert(cat.orphanFiles("ns", "cc").nonEmpty,
      "aborted commit left no orphans — staged files leaked into a snapshot?")
    val swept = cat.removeOrphans("ns", "cc")
    assert(swept.nonEmpty)
    // and history + current reads survive the sweep
    assert(cat.load("ns", "cc").count() == ids.size)
    assert(cat.loadSnapshot("ns", "cc", 1).count() == 20)
  }
}
