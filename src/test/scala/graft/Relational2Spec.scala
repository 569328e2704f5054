package graft

import graft.ops.{Relational2, Relational3}
import org.apache.spark.sql.functions._

/** Round-2 relational operators: smoke + plan-shape assertions (the plans
  * that must hold at 100 TB, not just produce correct rows at sf0.001). */
class Relational2Spec extends SparkSpec {

  // sf0.001 events are ~2/hour: a ±2-min window legitimately matches nothing,
  // so q_range_join's rows>0 and lossless checks run at sf0.01 instead.
  private val sf01 = "/root/testdata/sf0.01"

  test("every round-2 relational query runs and returns rows on sf0.001") {
    (Relational2.queries ++ Relational3.queries).foreach { case (name, fn) =>
      val dir = if (name == "q_range_join") sf01 else sfDir
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q_range_join is a bin equi-join — no nested-loop, no cartesian") {
    val plan = planOf(Relational2.qRangeJoin(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the interval predicate runs INSIDE the hash/SMJ join on the bin key
    assert(plan.toLowerCase.contains("join"), plan)
  }

  test("q_range_join bin blocking is lossless vs the naive inequality join") {
    val e = Tables.table(spark, sf01, "events")
      .select(col("event_id"), col("ts"), col("value"))
    val naive = e.as("p").join(e.as("e"),
        abs(col("e.ts") - col("p.ts")) <= 120_000_000_000L
          && col("e.event_id") =!= col("p.event_id"))
      .where(col("p.event_id") % 200 === 0)
      .groupBy(col("p.event_id").as("p_id"))
      .agg(count(lit(1)).as("n_near"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val banded = Relational2.qRangeJoin(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded.nonEmpty && banded == naive,
      s"banded=${banded.size} naive=${naive.size}")
  }

  test("q_scalar_correlated broadcasts the per-nation aggregate") {
    val plan = planOf(Relational2.qScalarCorrelated(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_lateral_corr pushes the custkey bound into the orders scan") {
    // without the explicit in-lateral predicate the decorrelated window
    // ranks EVERY customer's orders before the 500-key join prunes them
    val desc = graft.ops.Relational3.qLateralCorr(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(desc.contains("LessThanOrEqual(o_custkey,500)"),
      s"o_custkey bound not pushed to the orders parquet scan:\n$desc")
  }

  test("q_grouping_sets computes all levels in one Expand pass") {
    val plan = planOf(Relational2.qGroupingSets(spark, sfDir))
    assert(plan.contains("Expand"), plan)
  }

  test("q_time_gapfill emits a dense day spine with zero-filled gaps") {
    val rows = Relational2.qTimeGapfill(spark, sfDir).collect()
    val days = rows.map(_.getLong(0))
    assert(days.toSeq == (days.min to days.max).toSeq, "spine has holes")
  }

  test("q_approx_quantile stays within 1% rank error of exact percentiles") {
    val approx = Relational3.approxQuantileRaw(spark, sf01).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // and the driver-facing hash-gated query reports every bound as held
    val gated = Relational3.qApproxQuantile(spark, sf01).collect()
    assert(gated.nonEmpty && gated.forall(r =>
      r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)),
      "in-plan rank-bound check failed for some group")
    val exact = Tables.table(spark, sf01, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_extendedprice)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    approx.foreach { case (flag, (a50, a90)) =>
      val (e50, e90) = exact(flag)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$flag p50 $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.02, s"$flag p90 $a90 vs $e90")
    }
  }

  test("q_intersect_except partitions: both + only_f = all F customers") {
    val rows = Relational2.qIntersectExcept(spark, sfDir).collect()
    val byTag = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val f = Tables.table(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(byTag("both").intersect(byTag("only_f")).isEmpty)
    assert(byTag("both") ++ byTag("only_f") == f)
  }
}
