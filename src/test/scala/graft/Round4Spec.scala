package graft

import graft.ops.{ChunkOps, Events, Pipeline2, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics specs for the round-4 operators: chunk-level dedup/boilerplate,
  * event funnel, sequence packing, and the kNN self-join. The SQL-expressible
  * four are ALSO DuckDB-hash-gated by the driver; these tests pin the
  * invariants a hash compare can't state (keep-first identity, packing
  * conservation, funnel ordering, blocked-join recall). */
class Round4Spec extends SparkSpec {

  test("d_paragraph_dedup: keep-first identity — dup occurrences = total - distinct chunks") {
    val docs = Tables.table(spark, sfDir, "documents")
    val ch = ChunkOps.chunksOf(docs)
    val total = ch.count()
    val distinctChunks = ch.select("chunk").distinct().count()
    val dupReported = ChunkOps.dParagraphDedup(spark, sfDir)
      .agg(sum("n_dup_chunks")).collect()(0).getLong(0)
    assert(dupReported == total - distinctChunks,
      s"dup chunks $dupReported != $total - $distinctChunks")
    // chunking is total: every doc's complete 5-word windows, no overlap
    val docWords = docs
      .select(size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("nw"))
      .agg(sum(expr("nw div 5"))).collect()(0).getLong(0)
    assert(total == docWords, s"chunk count $total != sum of per-doc 5-word windows $docWords")
  }

  test("t_boilerplate: df values are true distinct-doc counts and >= 3") {
    val bp = ChunkOps.tBoilerplate(spark, sfDir).collect()
    assert(bp.forall(_.getLong(1) >= 3))
    val truth = ChunkOps.chunksOf(Tables.table(spark, sfDir, "documents"))
      .groupBy("chunk").agg(countDistinct("doc_id").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bp.foreach { r =>
      assert(truth(r.getString(0)) == r.getLong(1),
        s"df mismatch for chunk '${r.getString(0)}'")
    }
  }

  test("q_funnel: stage timestamps strictly ordered; stage matches null pattern") {
    val f = Events.qFunnel(spark, sfDir).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val stage = r.getInt(1)
      val tv = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val tc = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val tp = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(stage == Seq(tv, tc, tp).takeWhile(_.isDefined).size,
        s"user ${r.getLong(0)}: stage $stage vs ($tv,$tc,$tp)")
      for (a <- tv; b <- tc) assert(a <= b)
      for (b <- tc; c <- tp) assert(b <= c)
    }
  }

  test("p_pack_sequences: two-level prefix sum == naive global cumsum; ranges tile") {
    val packed = Pipeline2.pPackSequences(spark, sfDir).collect()
    // naive single-window reference, computed here where scale is bounded
    val naive = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))
          .cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("n_tokens"),
        expr("(cum - n_tokens) div 512").as("start_seq"),
        expr("(cum - 1) div 512").as("end_seq"))
      .orderBy("doc_id").collect()
    assert(packed.length == naive.length)
    packed.zip(naive).foreach { case (p, n) =>
      assert(p.getLong(0) == n.getLong(0) && p.getLong(2) == n.getLong(2) &&
        p.getLong(3) == n.getLong(3),
        s"doc ${p.getLong(0)}: two-level (${p.getLong(2)},${p.getLong(3)}) != naive (${n.getLong(2)},${n.getLong(3)})")
    }
    // ranges tile the sequence axis: consecutive docs never skip a sequence
    packed.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) >= a.getLong(2) && b.getLong(2) <= a.getLong(3) + 1,
          s"gap between doc ${a.getLong(0)} and ${b.getLong(0)}")
      case _ => ()
    }
  }

  test("s_kmeans_train: Lloyd inertia non-increasing; partition is total and deterministic") {
    val hist = (0 to 3).map(r =>
      ops.Cluster.inertia(spark, sfDir, ops.Cluster.train(spark, sfDir, 8, r)))
    hist.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, s"inertia rose: $hist")
      case _ => ()
    }
    assert(hist.last < hist.head, s"training did nothing: $hist")
    val out = ops.Cluster.sKmeansTrain(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sum ==
      Tables.table(spark, sfDir, "embeddings").count(),
      "cluster populations do not partition the corpus")
    val again = ops.Cluster.sKmeansTrain(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "k-means output not deterministic across runs")
  }

  test("s_knn_join: recall@5 >= 0.6 vs brute-force all-pairs exact top-k") {
    val e = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        graft.functions.Vec.vnorm(col("embedding")).as("nrm"))
    val exact = e.select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
      .crossJoin(e)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(graft.functions.Vec.vdot(col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6).as("c"))
      .withColumn("r", row_number().over(
        Window.partitionBy("q_id").orderBy(col("c").desc, col("vec_id"))))
      .where(col("r") <= 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.sKnnJoin(spark, sfDir)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"knn-join recall@5 $recall < 0.6 (${(ann & exact).size}/${exact.size})")
    // every vector is a query (the self-join contract, not a query subset)
    val nq = Similarity.sKnnJoin(spark, sfDir).select("q_id").distinct().count()
    assert(nq == e.count(), s"only $nq of ${e.count()} vectors got neighbors")
  }
}
