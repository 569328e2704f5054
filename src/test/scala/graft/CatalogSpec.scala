package graft

import graft.catalog.LakeCatalog
import graft.ops.{CatalogOps, Multimodal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CatalogSpec extends SparkSpec {

  test("flat warehouse: namespaces/tables/describe mirror the test data layout") {
    val cat = new LakeCatalog(spark, sfDir)
    assert(cat.listNamespaces() == Seq("main"))
    assert(cat.listTables().map(_._2).toSet == Tables.names.toSet)
    val desc = cat.describe("main", "lineitem")
    assert(desc.exists { case (n, t, _) => n == "l_orderkey" && t == "bigint" })
  }

  test("create/insert/append/drop round trip on a scratch warehouse") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_spec").toString
    val cat = new LakeCatalog(spark, root)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    cat.createTable("ns1", "t1", schema)
    assert(cat.listNamespaces() == Seq("ns1"))
    assert(cat.listTables() == Seq(("ns1", "t1")))
    cat.insertRow("ns1", "t1", Seq[Any](1L, 2.5d))
    import spark.implicits._
    cat.append("ns1", "t1", Seq((2L, 3.5d), (3L, 4.5d)).toDF("id", "v"))
    val rows = cat.load("ns1", "t1").orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    cat.dropTable("ns1", "t1")
    assert(cat.listTables().isEmpty)
  }

  test("c_scan_pushdown: the passthrough SQL pushes its filter into the scan") {
    val plan = planOf(CatalogOps.cScanPushdown(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,150000.0)]"), plan)
  }

  test("c_partition_prune: the event_type predicate prunes partitions at the scan") {
    CatalogOps.cPartitionPrune(spark, sfDir).collect() // materialize the scratch table
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse"
    val pruned = new LakeCatalog(spark, scratch).load("scratch", "events_by_type")
      .where(col("event_type") === "purchase")
    val plan = planOf(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // partition column never materializes as a data filter
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"), plan)
  }

  test("m_frame_sample: frame counts follow byte lengths; deterministic across runs") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("bytes"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val frames = Multimodal.mFrameSample(spark, sfDir).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val nFrames = math.ceil(docs(id) / 64.0).toInt
      val expect = (0 until nFrames).count(_ % 4 == 0)
      assert(rs.length == expect, s"doc $id: ${rs.length} sampled frames, want $expect")
      assert(rs.forall(r => r.getInt(3) >= 0 && r.getInt(3) < 256))
    }
    val again = Multimodal.mFrameSample(spark, sfDir).collect()
    assert(frames.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "not deterministic")
  }

  test("m_frame_embed: fixed-width deterministic vectors, ANN-compatible") {
    val vecs = Multimodal.mFrameEmbed(spark, sfDir).collect()
    assert(vecs.nonEmpty)
    vecs.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(v.length == 8, s"frame vec width ${v.length}")
      assert(v.forall(x => x >= 0f && x <= 1f))
    }
    val again = Multimodal.mFrameEmbed(spark, sfDir).collect()
    assert(vecs.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "not deterministic")
    // the vector column drives the same scoring path as §2.5 (vdot works)
    val scored = Multimodal.mFrameEmbed(spark, sfDir)
      .limit(10)
      .select(graft.functions.Vec.vdot(col("frame_vec"), col("frame_vec")).as("d"))
      .collect()
    assert(scored.forall(_.getDouble(0) >= 0))
    // driver-facing render: scalar columns only, values round-trip at 4dp
    val flat = Multimodal.mFrameEmbedFlat(spark, sfDir).collect()
    assert(flat.length == vecs.length)
    assert(flat.forall(r => r.schema.fields.forall(!_.dataType.typeName.startsWith("array"))))
    val rendered = flat.head.getString(2).split(",").map(_.toDouble)
    val raw = vecs.head.getSeq[Float](2)
    assert(rendered.length == 8)
    rendered.zip(raw).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
  }
}
