package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph computation on DataFrames — the GraphX-less shape that
  * survives 100 TB edge lists: each iteration is one join of the (big,
  * hash-partitioned) edge list against the (small, broadcast) rank vector
  * plus one aggregation shuffle on `dst`; the rank vector is
  * `localCheckpoint`ed per iteration so the plan/lineage stays O(1) deep
  * instead of O(iterations).
  *
  * Reference has no graph operator — this extends the §2 surface the same
  * way connected components ([[graft.llm.Dedup.connectedComponents]]) does
  * for dedup clustering.
  */
object Graph {

  /** Classic (non-normalized) PageRank: `r(v) = (1-d) + d · Σ_{u→v}
    * r(u)/outdeg(u)`, `iters` synchronous iterations from `r = 1`.
    * Dangling mass is dropped (the classic simplification).
    *
    * Deterministic to the bit: the per-edge contribution is IEEE double
    * division (exactly rounded, engine-independent), rounded to 12
    * decimals and summed as DECIMAL(28,12) — so partial-aggregation order
    * can't shift bits and the whole recurrence replays exactly in ANSI
    * SQL (the oracle unrolls the iterations as CTEs).
    *
    * Output: (node: long, rank: double). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val withDeg = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")

    // 1-d via decimal-string arithmetic: binary `1.0 - 0.85` is
    // 0.15000000000000002, but the SQL oracle's literal `0.15` is the
    // nearest double to decimal 0.15 — compute the same value here.
    val teleport = (BigDecimal(1) - BigDecimal(damping.toString)).toDouble

    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          round(col("rank") / col("outdeg"), 12).cast(DecimalType(28, 12)).as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            coalesce(col("s"), lit(0).cast(DecimalType(28, 12))).cast("double")).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Multi-source BFS: minimum hop distance from any source to every
    * reachable node, bounded by `maxHops`. Classic frontier expansion —
    * per hop, only the just-discovered frontier joins the edge list (one
    * equi-join shuffle on `src`), then a min-reduce folds new labels into
    * the distance table. Lineage is pinned with `localCheckpoint` only
    * every `checkpointEvery` hops — shallow searches run as ONE job with
    * zero materialization barriers (each hop ends in a shuffle, so
    * nothing recomputes), while deep searches keep the plan O(1) like
    * [[pageRank]]. Directed over the given edges — symmetrize first for
    * undirected reachability. Output: (node: long, dist: long). */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], maxHops: Int, checkpointEvery: Int = 4): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
    var dist = sources.distinct.map((_, 0L)).toDF("node", "dist")
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === (h - 1))
        .withColumnRenamed("node", "src")
      val next = e.join(frontier, "src")
        .select(col("dst").as("node"), lit(h.toLong).as("dist"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      if (h % checkpointEvery == 0 && h < maxHops) dist = dist.localCheckpoint(true)
    }
    dist
  }

  /** k-core of an undirected graph: iteratively peel nodes of degree < k
    * until a fixpoint — the classic cohesion/influence subgraph (and the
    * degeneracy-ordering building block). Each round is one degree
    * aggregation plus two anti-joins on the (shrinking, checkpointed)
    * edge list — all equi-joins on node ids; the only driver traffic is
    * the per-round convergence count. The fixpoint is unique and
    * order-independent, so extra rounds are no-ops — which is what lets
    * the DuckDB oracle replay it as a fixed unrolled peel chain.
    * Rounds needed in practice ≈ a small constant (peeling cascades are
    * shallow on real graphs); `maxIters` bounds adversarial chains.
    * Output: (node, deg) of k-core members with their in-core degree. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxIters: Int = 100): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    def degrees(edgs: DataFrame): DataFrame = edgs
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val bad = degrees(e).filter(col("deg") < k).select("node")
        .localCheckpoint(true)
      if (bad.isEmpty) converged = true
      else {
        e = e
          .join(bad.withColumnRenamed("node", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("node", "b"), Seq("b"), "left_anti")
          .localCheckpoint(true)
        it += 1
      }
    }
    degrees(e)
  }

  /** Per-node triangle counts via degree orientation (the standard
    * O(m^1.5)-work algorithm): canonicalize the undirected edge list,
    * orient every edge from its lower-(degree, id) endpoint to the higher,
    * enumerate wedges only at each edge's low end, and close them against
    * the oriented edge list. Hubs never generate wedges — a node of degree
    * d contributes at most min(d, √(2m)) wedge partners, so the skew that
    * kills the naive `e ⋈ e ⋈ e` plan (a celebrity node would expand to
    * d² wedge rows) is structurally bounded before any shuffle happens.
    *
    * All joins are equi-joins on node ids (hash-partitioned, AQE-eligible);
    * nothing touches the driver. Orientation order is the lexicographic
    * (deg, node) pair packed into one long (`deg * 10^9 + node` — callers
    * must keep node ids < 10^9, plenty for any id space we generate).
    *
    * Output: (node: long, triangles: long) for nodes in ≥1 triangle. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

    val keyed = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(col("a"), col("b"),
        (col("da") * lit(1000000000L) + col("a")).as("ka"),
        (col("db") * lit(1000000000L) + col("b")).as("kb"))
    val o = keyed.select(
      when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("u"),
      when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("v"),
      greatest(col("ka"), col("kb")).as("kv"))

    val wedges = o.select(col("u"), col("v").as("v1"), col("kv").as("k1"))
      .join(o.select(col("u"), col("v").as("v2"), col("kv").as("k2")), Seq("u"))
      .filter(col("k1") < col("k2"))
    val tris = wedges.join(
      o.select(col("v").as("v2"), col("u").as("v1")), Seq("v1", "v2"))

    tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }
}
