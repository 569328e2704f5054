package graft

import graft.ops.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q1_agg groups are the 6 flag/status pairs with positive sums") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 0))
    assert(rows.forall(r => r.getAs[Double]("avg_qty") > 0))
  }

  test("q_filter_project pushes filters and prunes columns at the scan") {
    val plan = planOf(Relational.qFilterProject(spark, sfDir))
    assert(plan.contains("PushedFilters"), "no PushedFilters in scan")
    assert(plan.contains("l_discount"), "discount filter missing from plan")
    // read schema must not include unprojected, unfiltered columns
    assert(!plan.contains("l_comment") && !plan.contains("l_returnflag"),
      "scan reads columns the query never uses")
  }

  test("q_sort_limit compiles to TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Relational.qSortLimit(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_join_broadcast uses a broadcast hash join") {
    val plan = planOf(Relational.qJoinBroadcast(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_semi_anti is a left-anti hash join, not a cartesian") {
    val plan = planOf(Relational.qSemiAnti(spark, sfDir))
    assert(plan.toLowerCase.contains("leftanti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q_approx_distinct HLL stays within 5% of exact") {
    Relational.approxDistinctRaw(spark, sfDir).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL error too high: approx=$approx exact=$exact")
    }
  }

  test("q_sessionize: no session spans a >30min gap and sessions partition events") {
    val total = Tables.table(spark, sfDir, "events").count()
    val sessions = Relational.qSessionize(spark, sfDir)
    val summed = sessions.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    assert(summed == total, s"sessions cover $summed of $total events")
  }
}
