package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties PlanCheck audits manually,
  * enforced as tests so a refactor can't silently regress them — filter
  * pushdown reaching the scan, broadcast joins on dim tables, no accidental
  * cartesian products, and the bounded dedup aggregate actually planning as
  * an object-hash aggregate (partial merge, no full-bucket sort buffer).
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  /** Executed plan of the INTERNAL action for the eagerly-materialized
    * dedup calls: minhashLsh/simhashDedup persist their signature stage and
    * checkpoint the verified output, so the returned DataFrame's own plan
    * is just a checkpoint scan — the real pipeline plan is captured from
    * the listener channel, keyed by the observe-node metric name.
    */
  private def internalExecutedPlan(name: String, metricName: String): String = {
    @volatile var captured: Option[String] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.observedMetrics.contains(metricName))
          captured = Some(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries(name)(spark, sf).collect()
      val deadline = System.nanoTime() + 10000000000L
      while (captured.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      captured.getOrElse(fail(s"internal plan for $name never surfaced"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("filters are pushed to the parquet scan (p13)") {
    val p = executedPlan("p13_filter_guards")
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,200)")
      || p.contains("GreaterThan(n_chars,200)"), p.take(800))
  }

  test("dim joins broadcast; no sort-merge on the dim side (j2)") {
    val p = executedPlan("j2_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("no cartesian product in any oracle query except the documented broadcast-NL baseline") {
    // brute-force ANN is an intentional broadcast nested-loop (tiny side
    // broadcast); everything else must be equi-join shaped
    val exempt = Set("sim_topk_bruteforce")
    // keep runtime bounded: guard the join-bearing query family
    val guarded = Seq("j1_join_lineage", "j2_broadcast_dim",
      "j_anti_no_orders", "j_semi_sold_high", "dedup_embedding_cos",
      "sim_topk_lsh", "sim_topk_ivf",
      "tq_contamination", "dedup_cluster_pick")
    guarded.filterNot(exempt).foreach { name =>
      val p = executedPlan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n${p.take(800)}")
    }
    // the eagerly-materialized dedup calls: audit the INTERNAL plan
    Seq("dedup_minhash_lsh" -> "graft.dedup.minhash_buckets",
      "dedup_simhash" -> "graft.dedup.simhash_buckets").foreach {
      case (name, metric) =>
        val p = internalExecutedPlan(name, metric)
        assert(!p.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n${p.take(800)}")
    }
  }

  test("the capped dedup bucket stage plans as ObjectHashAggregate") {
    val p = internalExecutedPlan("dedup_simhash", "graft.dedup.simhash_buckets")
    assert(p.contains("ObjectHashAggregate"), p.take(1200))
    // and the old full-bucket collect_list is gone from the bucket stage
    assert(!p.contains("collect_list"), "collect_list back in the cap path")
    // the persisted signature stage is actually read from cache in the
    // internal plan (the single-pass contract)
    assert(p.contains("InMemoryTableScan"), "sigs cache not in the plan")
  }

  test("as-of join is ONE window over the union — no join operator at all") {
    val df = SparkEntry.queries("ev_asof_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("Join"), s"as-of must not plan a join:\n${p.take(800)}")
  }

  test("range-count and triangle counting plan as equi-joins (no nested loop)") {
    val pr = executedPlan("ev_range_join")
    assert(!pr.contains("CartesianProduct") &&
      !pr.contains("BroadcastNestedLoopJoin"), pr.take(800))
    // triangles return a checkpoint scan; the real plan surfaces through
    // the observe-metric listener channel (the minhashLsh audit pattern)
    val pt = internalExecutedPlan("web_host_triangles",
      "graft.webgraph.triangles")
    assert(!pt.contains("CartesianProduct") &&
      !pt.contains("BroadcastNestedLoopJoin"), pt.take(800))
    // and the wedge stage is really join-shaped (not collapsed to a scan)
    assert(pt.contains("Join"), pt.take(800))
  }

  test("langid stays a narrow single-scan aggregation (no join, no extra scan)") {
    val df = SparkEntry.queries("tq_langid")(spark, sf)
    df.collect()
    // AQE plan strings embed an "Initial Plan" section that duplicates
    // every node — count scans in the Final Plan part only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Join"), p.take(800))
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans")
  }
}
