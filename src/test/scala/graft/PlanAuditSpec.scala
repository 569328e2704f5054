package graft

/** Systematic plan hygiene across the ENTIRE query surface: no operator may
  * compile to a cartesian product or nested-loop join unless it is one of
  * the explicitly-bounded brute-force baselines (query-batch × corpus
  * scoring, where the probe side is capped by construction and the op's
  * Scaladoc documents the bound). A new operator that accidentally
  * introduces an unbounded cross product fails here before it ever ships.
  *
  * The audit PLANS EVERY QUERY EXACTLY ONCE (several ops build scratch
  * catalog state during DataFrame construction — planning them per-test
  * would triple that cost) and runs all assertions over the cached plans.
  */
class PlanAuditSpec extends SparkSpec {

  /** Ops whose cross product is the documented, bounded baseline:
    * brute-force similarity scoring (|queries| capped at |corpus|/20) and
    * one-row/model-row broadcasts. */
  private val boundedCross = Set(
    "s_cosine_topk", "s_radius", "d_embed_neardup", // capped probe batches
    "s_pq_topk",      // capped probe batch × 8-byte code scan (the ADC design)
    "s_opq_topk",     // same bounded ADC scan, rotated space
    "t_tfidf",        // one-row corpus-size N broadcast
    "t_bm25",         // one-row N/avgdl stats broadcast
    "t_index_search", // same one-row merged-stats broadcast, index-served
    "q_time_gapfill", // one-row min/max spine source
    "q_null_suite",   // one-row NOT-IN-count broadcast + null-aware anti join
    "s_hybrid_search", // one-row max-kw + query-centroid broadcasts
    "d_bloom_ingest", // one-row bloom-bitset-map broadcast
    "t_nb_classify",  // one-row vocab-size/doc-total + |langs|-row broadcasts
    "s_label_probe",  // |labels|-row centroid-matrix broadcast
    "p_domain_mix",   // one-row min-count broadcast
    "p_epoch_mix",    // one-row corpus-total/budget broadcast
    "q_cms_topk",     // one-row N broadcast (CMS bound check)
    "s_mmr_diversify", // one-row query broadcast + 30-row pool self-join
    "c_incremental_read", // one-row full-scan-total broadcast
    "s_rrf_fusion",   // one-row N + one-row query-embedding broadcasts
    "q_pagerank",     // one-row dangling-mass broadcast per iteration
    "q_theta_sketch", // one-row θ∩ / intersection-estimate broadcasts
    "s_sq8_topk",     // capped probe batch × dequantized corpus (ADC design)
                      //   + one-row per-dim-bounds broadcast
    "s_matryoshka_rerank", // capped probe batch × 16-dim prefix scan (stage 1)
    "c_rollback",     // one-row time-travel-count broadcast
    "m_phash_dedup",  // one-row candidate-stats broadcast
    "s_ann_recall",   // composes s_cosine_topk's capped probe batch (the
                      //   exact side of the recall report) — same bound
    "s_tau_sweep",    // 5-row τ-grid broadcast over the kNN graph
    "p_quality_curve", // 5-row threshold-grid broadcast over per-doc scores
    "q_triangle_count", // one-row census assembly (nodes × edges × wedges × triangles)
    "s_hamming_topk",  // capped probe batch × 16-byte signature scan
    "t_pmi_bigrams",   // one-row unigram/bigram-total broadcasts
    "t_word_lm",       // one-row train-token-total/vocab (T, V) broadcast
    "q_hll_merge",     // one-row estimate/consistency broadcasts over 256-row register frames
    "d_cdc_chunks",    // one-row doc-count broadcast onto the summary row
    "q_time_to_event", // one-row viewer/converted-count broadcasts
    "q_benford",       // one-row digit-total broadcast onto the 9-row expectation grid
    "s_tier_report",   // composes the capped probe batches + one-row hit/total broadcasts
    "s_nsw_search",    // brute ground-truth baseline: capped |corpus|/100 query
                       //   batch × corpus (same bound as s_ann_recall); the
                       //   search itself is frontier equi-joins
    "p_temperature_mix", // one-row corpus/weight-totals broadcast onto |langs| rows
    "q_bootstrap_ci",  // one-row ci_lo/ci_hi broadcasts onto the summary row
    "q_dau_mau",       // |days|-row spine broadcast range-joined to the user-day grid
    "q_rfm",           // one-row U/max-day broadcast + value-domain score-map joins
    "q_exp_smooth",    // 20-row weight-grid + one-row day-bounds broadcasts
    "st_forecast",     // same 20-row weight-grid broadcast
    "d_dup_profile",   // one-row corpus-total broadcast onto the k-histogram rows
    "q_chi2_test",     // one-row grand-total broadcast onto the |prio|×|status| cells
    "q_ks_test",       // one-row n1/n2 broadcast onto the distinct-value rank rows
    "q_autocorr",      // 7-row lag-grid broadcast over per-DAY aggregate rows
    "q_basket_lift",   // one-row basket-total broadcast onto the pair rows
    "q_kcore",         // one-row removed×surviving count assembly per round
    "st_backfill",     // one-row min-day broadcast onto the event scan
    "q_modularity",    // one-row edge-count broadcast onto the community rows
    "q_abc_analysis",  // one-row revenue-total broadcast onto the part rows
    "q_control_chart", // one-row control-limits broadcast onto the day rows
    "q_backlog_age",   // one-row horizon-date broadcast onto the open orders
    "d_band_sweep",    // one-row hit/true-count broadcasts per (b,r) config row
    "q_hazard_curve",  // one-row initial-risk-set broadcast onto the day spine
    "q_tukey_fence",   // one-row quartile/total broadcasts onto the cents scan
    "q_purchase_cadence", // one-row interval-total broadcast onto the gap histogram
    "q_cuped",         // one-row window-start broadcast onto the event scan
    "d_cross_source_dup", // |sources|x|sources| pair spine (bounded by the source domain)
    "d_cross_source_neardup", // same bounded source-pair spine, near-dup twins
    "q_xcorr",         // 7-row lag-grid broadcast onto per-DAY aggregate rows
    "q_mann_kendall",  // |days|² calendar-bounded day-pair BNLJ (a.day < b.day over
                       //   per-DAY aggregates — grows with the calendar, not the data)
                       //   + one-row S/tie-term broadcasts onto the summary row
    "q_theil_sen",     // same calendar-bounded |days|² day-pair BNLJ
    "c_add_files",     // one-row adopted-file-count broadcast onto the count row
    "s_pca_power",     // one-row k×d component-matrix broadcast onto the corpus scan
    "c_cbo_route",     // one-row narrow-agg × wide-agg assembly row
    "c_cbo_planner",   // same one-row assembly over the planner-routed probes
    "c_cbo_stale",     // same one-row assembly across the growth boundary
    "c_stats_refresh", // same one-row assembly across the refresh boundary
    "q_conductance",   // one-row edge-count broadcast onto the community rows
    "q_degree_distribution", // one-row node-total broadcast onto histogram rows
    "c_cbo_semijoin",  // one-row narrow × wide × anti assembly row (+ the
                       //   narrow NOT IN probe's null-aware anti join is a
                       //   BROADCAST hash join by the rule's own routing)
    "s_nprobe_sweep",  // 4-row nprobe-level broadcast onto scored candidates
    "s_hnsw_search",   // brute ground-truth baseline: the same capped
                       //   |corpus|/100 query batch × corpus as s_nsw_search,
                       //   + the one-row entry-node broadcast seeding descent;
                       //   search itself is frontier equi-joins
    "p_dsir_sample",   // one-row corpus-totals broadcast onto the 64-bucket
                       //   LLR spine (model-scale, fixed by the hash width)
    "st_dsir_screen",  // same one-row totals broadcast onto the 64-row spine
                       //   + one-row truth-total broadcast; truth itself is
                       //   the capped s_cosine_topk probe batch
    "st_quality_drift", // two one-row corpus-total broadcasts onto the 10-row
                       //   decile spine
    "s_hnsw_pq",       // brute ground-truth baseline (same capped |corpus|/100
                       //   query batch × corpus as s_hnsw_search) + the one-row
                       //   entry-node broadcast; the walk itself is frontier
                       //   equi-joins over PQ codes
    "c_mor_changes",   // three one-row per-window feed aggregates assembled
                       //   into the single report row
    "p_select_mix_pack", // p_dsir_sample's one-row totals broadcast onto the
                       //   64-bucket LLR spine + p_domain_mix's one-row
                       //   min-count broadcast, composed
    "s_hnsw_delete",   // brute LIVE-corpus ground-truth baseline over the
                       //   same FIXED 1000-query panel as its siblings; the
                       //   tombstone walk itself is frontier equi-joins
    "q_sax_discord"    // |uniques|×|words| calendar-bounded day-pair BNLJ
                       //   (q_mann_kendall's contract — grows with the
                       //   calendar, never event volume)
  )

  /** p_pack_sequences' two-level prefix-sum deliberately runs ONE global
    * window — over per-bucket token totals (corpus/bucketW rows), never raw
    * docs. The whitelist is conditional: the audit proves the global
    * window's input went through the cardinality-reducing Aggregate, so
    * the exemption dies if the op ever degrades to a raw-row window. */
  private val boundedGlobalWindow = Set(
    "p_pack_sequences",
    "st_late_audit",   // prefix-max over per-HOUR bucket maxes (same two-level scan)
    "p_shard_manifest", // prefix-sum over per-bucket token totals (p_pack_sequences' shape)
    "q_skyline",       // prefix-max over per-PRICE-BAND maxes (same two-level scan)
    "q_time_to_event", // prefix-sum over per-HOUR-BUCKET counts (same two-level scan)
    "q_bootstrap_ci",  // nearest-rank over the B=200 per-REPLICATE means
    "q_rfm",           // cumulatives over METRIC-VALUE-domain aggregate rows
    "q_mann_whitney",  // bucket prefix over per-VALUE-BUCKET aggregate rows
    "q_ks_test",       // same two-level rank table
    "q_gini",          // band prefix over per-REVENUE-BAND aggregate rows
    "q_runs_test",     // lag/run windows over per-DAY aggregate rows
    "q_spearman",      // bucket prefixes over per-VALUE-BUCKET aggregate rows
    "q_abc_analysis",  // band prefix over per-REVENUE-BAND aggregate sums
    "q_control_chart", // lag window over per-DAY aggregate rows
    "q_hazard_curve",  // exit prefix over per-DAY aggregate rows
    "q_tukey_fence",   // band prefix over per-CENTS-BAND aggregate rows
    "q_seasonal_decompose", // centered 7-day window over per-DAY aggregate rows
    "q_theil_sen",     // median-rank windows over the calendar-bounded |days|²
                       //   day-pair frame (both inputs per-DAY aggregates)
    "q_harmonic_centrality", // row_number over a post-limit(20) frame
    "q_degree_distribution", // cumulative over DEGREE-histogram aggregate rows
    "m_token_budget",  // prefix-sum over per-bucket token totals (the
                       //   p_pack_sequences two-level shape, mixed-modality)
    "p_select_mix_pack", // prefix-sum over per-bucket token totals of the
                       //   ≤200-doc selected slice (p_pack_sequences' shape)
    "q_sax_motif",     // ntile/lead over per-DAY aggregate rows (the
                       //   calendar-bounded daily spine, q_dau_mau's contract)
    "q_sax_discord"    // same ntile/lead daily-spine windows (shared saxWords)
  )

  // one planning pass over the whole surface, shared by every assertion
  private lazy val plans: Seq[(String, org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try name -> fn(spark, sfDir)
      catch { case e: Throwable => fail(s"$name failed to build: ${e.getMessage}") }
    }
  private lazy val optimized = plans.map { case (n, df) =>
    try n -> df.queryExecution.optimizedPlan
    catch { case e: Throwable => fail(s"$n failed to optimize: ${e.getMessage}") }
  }
  private lazy val physical = plans.map { case (n, df) =>
    try n -> planOf(df)
    catch { case e: Throwable => fail(s"$n failed to plan: ${e.getMessage}") }
  }.toMap

  test("every brute-force recall panel carries a FIXED literal bound (VERDICT r12 #3)") {
    // the exact-scored arm of each recall gate must be panel(const) ×
    // corpus — linear in corpus — never proportional-panel × corpus
    // (0.01·n², the shape that grows 10,000× at 100× data). The fixed cap
    // is a literal pushdown filter on the panel side (vec_id < 20000 for
    // %20 panels, < 100000 for %100 panels; doc_id < 100000 for
    // d_lsh_recall's anchor side), visible in the optimized plan.
    val panelBound = Map(
      "s_cosine_topk" -> "20000",
      "s_ann_recall" -> "20000",
      "s_nsw_search" -> "100000",
      "s_hnsw_search" -> "100000",
      "s_hnsw_pq" -> "100000",
      "s_hnsw_delete" -> "100000",
      "d_lsh_recall" -> "100000")
    val byName = optimized.toMap
    panelBound.foreach { case (op, bound) =>
      val p = byName(op).toString
      assert(p.contains(bound),
        s"$op: fixed panel bound $bound missing from the optimized plan")
    }
  }

  test("window top-k gets map-side WindowGroupLimit (Partial before the shuffle)") {
    // The design reason graft has no custom top-k-per-key operator: Spark
    // 4's InferWindowGroupLimit already turns `rank/row_number <= k` into a
    // Partial (map-side) + Final group-limit pair, so each partition ships
    // at most k rows per key into the window shuffle — the exact
    // optimization a custom SparkPlan would exist to provide. Pinned so a
    // regression is caught here instead of at 100 TB.
    val plan = plans.toMap.apply("q_window_rank")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "WindowGroupLimit missing")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
      "map-side (Partial) WindowGroupLimit missing — top-k no longer pushed below the shuffle")
    assert("WindowGroupLimit.*Final".r.findFirstIn(plan).isDefined)
    // the same must hold for the tf-idf per-doc top-3
    val tfidf = plans.toMap.apply("t_tfidf")
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit.*Partial".r.findFirstIn(tfidf).isDefined,
      "t_tfidf window top-k lost its map-side group limit")
    // and for the KMV sketch's rank ≤ k selection — the property that makes
    // the theta-sketch shuffle k·|sets| rows instead of corpus-sized
    val theta = plans.toMap.apply("q_theta_sketch")
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit.*Partial".r.findFirstIn(theta).isDefined,
      "q_theta_sketch k-min selection lost its map-side group limit")
  }

  test("no unpartitioned window (all-rows-to-one-partition) anywhere in the surface") {
    // WindowExec with an empty partition spec moves EVERY row to a single
    // partition — fine on 60k rows, fatal on a 100 TB vocabulary. Every
    // global ranking in the surface must bound its input first (top-k via
    // TakeOrderedAndProject) or partition the window.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate => LAggregate, GlobalLimit => LGlobalLimit, LeafNode => LLeaf,
      LocalLimit => LLocalLimit, LocalRelation => LLocalRel,
      OneRowRelation => LOneRow, Range => LRange, Window => LWindow}
    // Structural boundedness proof: TRUE iff every path from the window down
    // to a data-bearing leaf passes through a cardinality-reducing node
    // (Aggregate or Limit) first — i.e. NO raw table rows can reach the
    // global window. Literal leaves (LocalRelation / Range spines /
    // OneRowRelation) are bounded by construction. Joins/unions between
    // bounded inputs stay bounded (|days|²-style frames grow with the key
    // domain, never with data volume) — which is exactly the exemption's
    // claim, and exactly what dies if an op ever windows over a raw scan.
    def boundedInput(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = p match {
      case _: LAggregate | _: LGlobalLimit | _: LLocalLimit => true
      case _: LLocalRel | _: LOneRow | _: LRange => true
      case leaf: LLeaf => false // raw relation reached without reduction
      case other => other.children.forall(boundedInput)
    }
    val offenders = optimized.flatMap { case (name, plan) =>
      val global = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (boundedGlobalWindow(name)) {
        assert(global.forall(w => boundedInput(w.child)),
          s"$name: whitelisted global window no longer consumes a " +
            "cardinality-bounded input (raw rows reach the single partition)")
        None
      } else if (global.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows in: ${offenders.mkString(", ")}")
  }

  test("no window partitions on a content-derived key anywhere in the surface") {
    // VERDICT r4 "What's wrong" #2: a window PARTITIONED BY a text-derived
    // key (chunk text, md5 fingerprint) ships every occurrence of one hot
    // value into a single task — and content frequency is Zipfian, so at
    // 100 TB one boilerplate chunk = one straggler holding 10% of the
    // corpus. Keep-first semantics only ever need min(struct(...)) — a
    // map-side-combined aggregate — so NO query may window over a string
    // key except bounded-cardinality METADATA strings (source/lang/kind:
    // cardinality = number of domains/languages, fixed by the corpus
    // design, not by its size).
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.types.StringType
    val metadataKeys = Set("source", "lang", "kind", "side", "event",
      "event_type", "modality",
      "l_returnflag", // fixed 3-value TPC-H domain (A/N/R), not content-derived
      "prio") // o_orderpriority: fixed 5-value TPC-H domain
    val offenders = optimized.flatMap { case (name, plan) =>
      val bad = plan.collect { case w: LWindow =>
        w.partitionSpec.filter(_.dataType == StringType).filter {
          case a: Attribute => !metadataKeys(a.name)
          case _ => true // computed string partition key: always content-derived
        }
      }.flatten
      if (bad.nonEmpty) Some(s"$name[${bad.map(_.sql).mkString(",")}]") else None
    }
    assert(offenders.isEmpty,
      s"content-keyed (string) window partitions in: ${offenders.mkString(", ")}")
  }

  test("the graph substrate's top-decile selection plans without GlobalLimit") {
    // VERDICT r8 "What's wrong" #1: a data-proportional `orderBy.limit(k)`
    // plans as a GlobalLimit squeezing k ∝ |pairs| rows through ONE
    // partition (and k.toInt overflows past 2³¹). The selection is now
    // histogram-threshold-then-filter (Graph.topKByRank); this pins the
    // physical shape so a regression is caught here, not at 100×. The edge
    // frame feeds ~12 graph ops — asserting the substrate covers them all.
    val edges = graft.ops.Graph.coSupplyEdges(spark, sfDir)
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("GlobalLimit"),
      "coSupplyEdges regressed to a single-partition GlobalLimit")
    assert(!plan.contains("TakeOrderedAndProject"),
      "coSupplyEdges regressed to a driver-bounded global top-k")
  }

  test("no unintended cartesian / nested-loop joins anywhere in the surface") {
    val offenders = physical.toSeq.sortBy(_._1).flatMap { case (name, plan) =>
      val bad = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (bad && !boundedCross(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded cross products in: ${offenders.mkString(", ")}")
  }
}
