package graft

/** Systematic plan hygiene across the ENTIRE query surface: no operator may
  * compile to a cartesian product or nested-loop join unless it is one of
  * the explicitly-bounded brute-force baselines (query-batch × corpus
  * scoring, where the probe side is capped by construction and the op's
  * Scaladoc documents the bound). A new operator that accidentally
  * introduces an unbounded cross product fails here before it ever ships.
  */
class PlanAuditSpec extends SparkSpec {

  /** Ops whose cross product is the documented, bounded baseline:
    * brute-force similarity scoring (|queries| capped at |corpus|/20) and
    * the spine-broadcast of a one-row min/max aggregate (gap fill). */
  private val boundedCross = Set(
    "s_cosine_topk", "s_radius", "d_embed_neardup", // capped probe batches
    "s_pq_topk",      // capped probe batch × 8-byte code scan (the ADC design)
    "s_opq_topk",     // same bounded ADC scan, rotated space
    "t_tfidf",        // one-row corpus-size N broadcast
    "t_bm25",         // one-row N/avgdl stats broadcast
    "q_time_gapfill", // one-row min/max spine source
    "q_null_suite",   // one-row NOT-IN-count broadcast + null-aware anti join
    "s_hybrid_search", // one-row max-kw + query-centroid broadcasts
    "d_bloom_ingest", // one-row bloom-bitset-map broadcast
    "t_nb_classify",  // one-row vocab-size/doc-total + |langs|-row broadcasts
    "s_label_probe"   // |labels|-row centroid-matrix broadcast
  )

  test("window top-k gets map-side WindowGroupLimit (Partial before the shuffle)") {
    // The design reason graft has no custom top-k-per-key operator: Spark
    // 4's InferWindowGroupLimit already turns `rank/row_number <= k` into a
    // Partial (map-side) + Final group-limit pair, so each partition ships
    // at most k rows per key into the window shuffle — the exact
    // optimization a custom SparkPlan would exist to provide. This spec
    // pins that property so a regression (or a future pattern the rule
    // can't see) is caught here instead of at 100 TB.
    val plan = SparkEntry.queries("q_window_rank")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "WindowGroupLimit missing")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
      "map-side (Partial) WindowGroupLimit missing — top-k no longer pushed below the shuffle")
    assert("WindowGroupLimit.*Final".r.findFirstIn(plan).isDefined)
    // the same must hold for the tf-idf per-doc top-3
    val tfidf = SparkEntry.queries("t_tfidf")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit.*Partial".r.findFirstIn(tfidf).isDefined,
      "t_tfidf window top-k lost its map-side group limit")
  }

  test("no unpartitioned window (all-rows-to-one-partition) anywhere in the surface") {
    // WindowExec with an empty partition spec moves EVERY row to a single
    // partition — fine on 60k rows, fatal on a 100 TB vocabulary. Every
    // global ranking in the surface must bound its input first (top-k via
    // TakeOrderedAndProject) or partition the window. Pinned here so the
    // pattern can never silently return.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAggregate, Window => LWindow}
    // p_pack_sequences' two-level prefix-sum deliberately runs ONE global
    // window — over per-bucket token totals (corpus/bucketW rows), never raw
    // docs. The whitelist is conditional: the assertion below proves the
    // global window's input went through the cardinality-reducing Aggregate,
    // so the exemption dies if the op ever degrades to a raw-row window.
    val boundedGlobalWindow = Set("p_pack_sequences")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val global = try {
        fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
      } catch { case e: Throwable =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
      if (boundedGlobalWindow(name)) {
        assert(global.forall(
            _.child.collectFirst { case a: LAggregate => a }.isDefined),
          s"$name: whitelisted global window no longer consumes an aggregate")
        None
      } else if (global.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows in: ${offenders.mkString(", ")}")
  }

  test("no unintended cartesian / nested-loop joins anywhere in the surface") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // skip side-effecting catalog ops at audit time? no — audit them too;
      // they build scratch tables on sfDir and their plans matter equally
      val plan = try planOf(fn(spark, sfDir)) catch { case e: Throwable =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !boundedCross(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded cross products in: ${offenders.mkString(", ")}")
  }
}
