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
    "s_hybrid_search" // one-row max-kw + query-centroid broadcasts
  )

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
