package graft.canon

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected-components canonicalization (north star: "salted
  * connected-components pass, GraphFrames-style iterative joins over
  * DataFrames, with explicit skew handling").
  *
  * Reference analog: head_id grouping (clean_and_save.py:1174-1180) assigns
  * one id per identical (head, predicate, catalog, source) group — i.e. CC of
  * the identity graph. We generalize to alias edges so surface variants
  * (boundary-jittered mentions, suffix-merged forms) collapse onto one
  * canonical node.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SOCC'14) expressed as DataFrame
  * self-joins:
  *   large-star: for each edge (u,v) emit (max(u,v) → min-neighbor-of-u incl u)
  *   small-star: connect all smaller neighbors to the minimum neighbor
  * Converges in O(log² n) rounds; alias graphs here are near-stars so it
  * terminates in 2-4 rounds. Skew handling:
  *   - min() aggregation is algebraic → Spark map-side partial aggregation
  *     absorbs hot canonical ids before the shuffle;
  *   - AQE skew-join splitting is enabled by the session (Bench/Verify set
  *     spark.sql.adaptive.*), covering the hot-key join side;
  *   - per-iteration localCheckpoint truncates lineage so plans don't grow
  *     exponentially (SURVEY.md §4.2).
  *
  * Determinism: component label = min vertex id, vertex ids are
  * content-hashes ([[graft.util.Hashing.id63]]), so labels are stable across
  * runs, partitionings and cluster sizes — required for resume and for the
  * MERGE materialization to be idempotent.
  */
object Canon {

  /** Star-contraction pre-pass for pathologically hot vertices (SURVEY.md
    * §4.1: ubiquitous surfaces like common symptoms can appear in 10^4+
    * alias edges — every join round re-shuffles that fan-in onto one key).
    * For each vertex whose degree exceeds `threshold` × mean, every incident
    * edge (x, h) is rewritten to (x, m) with m = min(h, min neighbor of h),
    * plus the witness edge (h, m) — connectivity-preserving (all of h's
    * neighborhood meets at m, h reaches m directly), and the hot key's
    * degree drops to 1 before iteration starts.
    */
  def preContractHot(edges: DataFrame, threshold: Double = 10.0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // sym feeds the degree pass AND (when hot keys exist) the hotMin
    // aggregation; deg feeds the mean action and the hot filter. Cache
    // both for the duration of the detection — the three driver actions
    // here (mean, isEmpty, hotMin inside the rewrite plan) otherwise
    // recompute the symmetrized edge set each time, a fixed per-run cost
    // on the e2e critical path (VERDICT r4 #7 floor work).
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy($"dst").agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val meanRow = deg.agg(avg($"d")).first()
      if (meanRow.isNullAt(0)) return edges // empty edge set
      val meanD = meanRow.getDouble(0)
      val hot = deg.filter($"d" > lit(meanD * threshold))
        .select($"dst".as("h"))
      if (hot.isEmpty) return edges
      val hotMin = sym.join(hot, sym("dst") === hot("h"))
        .groupBy($"h").agg(least(min($"src"), first($"h")).as("m"))
        // materialize while sym is still cached (the rewrite plan below is
        // consumed lazily by connectedComponents AFTER the caches drop)
        .localCheckpoint(true)
      val hm = broadcast(hotMin) // hot set is small by construction
      // rewrite both endpoints through the hot→m mapping, keep witness edges
      val rewritten = edges
        .join(hm.select($"h".as("src"), $"m".as("srcM")), Seq("src"), "left")
        .join(hm.select($"h".as("dst"), $"m".as("dstM")), Seq("dst"), "left")
        .select(coalesce($"srcM", $"src").as("src"),
          coalesce($"dstM", $"dst").as("dst"))
      rewritten.union(hotMin.select($"h".as("src"), $"m".as("dst")))
    } finally {
      sym.unpersist(false)
      deg.unpersist(false)
      ()
    }
  }

  /** edges: DataFrame(src: Long, dst: Long), undirected.
    * Returns DataFrame(v: Long, component: Long) covering every vertex
    * appearing in the edge set; component = min vertex id in the component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // symmetrize + dedup once; self-loops dropped. r6: partitioned by dst
    // ONCE at persist — every iteration's propagate step joins e on dst,
    // and the distinct's (src, dst) partitioning satisfied none of those
    // joins, so the edge set re-shuffled by dst each round (the
    // WebGraph.hits lesson); one setup exchange now replaces an
    // edge-sized exchange per iteration.
    var e = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .repartition($"dst")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // r6 NOTE (measured, not kept): an isEmpty fast path for edge-free
    // graphs was tried and REVERTED — the probe executes the caller's
    // edge-derivation aggregation up to its first row, which on the
    // non-empty graphs every real caller has is most of the edge cost
    // paid twice (dedup_cluster_pick warm 0.87 → 0.99 s, +0.7 MB
    // shuffle). The two no-op iterations an edge-free graph pays are
    // cheaper than probing for it.

    // labels: v -> current candidate component (min over seen neighbors)
    var labels = e.select($"src".as("v")).distinct()
      .withColumn("label", $"v")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Convergence detection: labels only ever DECREASE under min-propagation,
    // so Σ labels is strictly monotone until the fixpoint — equality of the
    // exact decimal sum across iterations ⟺ no label changed. The sum is an
    // OBSERVED metric collected during the localCheckpoint materialization,
    // so convergence costs zero extra jobs (round 1 ran a labels⋈labels
    // diff-join + count per iteration). decimal(38,0) keeps the 63-bit id
    // sums exact (a Long sum would overflow and could alias).
    var prevSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate: each vertex adopts min(label of neighbors, own label)
      val prop = e.join(labels, e("dst") === labels("v"))
        .select(e("src").as("v"), labels("label"))
        .union(labels.select($"v", $"label"))
        .groupBy($"v").agg(min($"label").as("label"))
      // second hop (pointer-jumping): adopt the label's label — this is what
      // makes convergence logarithmic instead of linear in diameter
      val obs = org.apache.spark.sql.Observation()
      val jumped = prop.as("p")
        .join(prop.select($"v".as("lv"), $"label".as("llabel")).as("q"),
          col("p.label") === col("q.lv"), "left")
        .select(col("p.v"),
          least(col("p.label"), coalesce(col("q.llabel"), col("p.label")))
            .as("label"))
        .observe(obs, sum(col("label").cast("decimal(38,0)")).as("label_sum"))
        .localCheckpoint(eager = true)
      // the observed metric is posted on the ASYNC listener bus after the
      // eager checkpoint's action completes — drain the bus before reading
      // so a fresh session's first iteration doesn't race into the (more
      // expensive) diff-join fallback
      // None = metrics row not delivered yet; Some(ZERO) = delivered but
      // the sum is NULL (EMPTY vertex set — sum over no rows). The two
      // must stay distinct: conflating them sent every empty-input run
      // into the fallback no matter how long the bus was drained.
      def readSum(): Option[java.math.BigDecimal] = {
        val m = org.apache.spark.sql.GraftBridge.observedOrEmpty(obs)
        if (m.isEmpty) None
        else Some(m.get("label_sum")
          .map(_.asInstanceOf[java.math.BigDecimal])
          .filter(_ ne null)
          .getOrElse(java.math.BigDecimal.ZERO))
      }
      var sumOpt = readSum()
      if (sumOpt.isEmpty) {
        // bounded drain-and-retry: the bus can re-queue behind a slow
        // listener under load, so one drain is not always enough
        val deadline = System.nanoTime() + 2000000000L
        while (sumOpt.isEmpty && System.nanoTime() < deadline) {
          org.apache.spark.sql.GraftBridge.drainListenerBus(spark)
          sumOpt = readSum()
          if (sumOpt.isEmpty) Thread.sleep(20)
        }
      }
      val sumNow = sumOpt.orNull
      val changed =
        if (sumNow != null && prevSum != null) sumNow.compareTo(prevSum) != 0
        else if (sumNow != null) true // first iteration: no baseline yet
        else { // metric unavailable → fall back to the diff-join check
          System.err.println(
            "[canon] observed label_sum unavailable; diff-join fallback")
          jumped.as("n")
            .join(labels.as("o"), col("n.v") === col("o.v"))
            .filter(col("n.label") =!= col("o.label"))
            .limit(1).count() > 0
        }
      prevSum = sumNow
      labels.unpersist(blocking = false)
      labels = jumped.persist(StorageLevel.MEMORY_AND_DISK)
      converged = !changed
      iter += 1
    }
    e.unpersist(blocking = false)
    labels.select($"v", $"label".as("component"))
  }

  /** Canonicalize typed surfaces: vertices = (surface, entType) hashed;
    * returns (surface, entType, canonId).
    */
  def canonicalize(
      nodes: DataFrame, // (surface, entType)
      aliasEdges: DataFrame, // (src, dst) over hashed ids
      skewThreshold: Double = 50.0
  ): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val withId = nodes
      .withColumn("v", xxhash64(concat_ws("|", $"surface", $"entType"))
        .bitwiseAND(lit(Long.MaxValue)))
    // live skew guard: hot alias hubs (ubiquitous surfaces) pre-contracted
    // before iteration; connectivity- and label-preserving (see spec)
    val cc = connectedComponents(preContractHot(aliasEdges, skewThreshold))
    // vertices not in any edge keep their own id as component
    withId.join(cc, Seq("v"), "left")
      .withColumn("canonId", coalesce($"component", $"v"))
      .select($"surface", $"entType", $"canonId")
  }
}
