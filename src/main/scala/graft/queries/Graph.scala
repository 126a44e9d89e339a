package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Iterative graph analytics as repeated join+aggregate — the Pregel shape
  * every distributed graph engine reduces to. Connected components
  * (llm/Dedup.connectedComponentsLogN) covers the unbounded-iteration
  * case with a convergence test; this family covers the FIXED-iteration
  * case (PageRank-style scoring), where the loop unrolls into one Catalyst
  * plan. At 100 TB scale each iteration is one edges⋈ranks join + one
  * aggregate on the destination key — the ranks relation stays
  * node-sized (broadcast here; when a node table outgrows the broadcast
  * budget, the same plan runs as a shuffle join co-partitioned with the
  * src-bucketed edge relation), and a real deployment checkpoints ranks
  * every few iterations to cut lineage (here 3 iterations ride one plan
  * comfortably).
  *
  * Determinism contract: ranks are scaled longs (1e9 = mass 1.0), every
  * per-edge contribution is a truncating integer division (`div` in
  * Spark, `//` in DuckDB — identical on non-negatives), the damping is
  * the exact integer (m·17)//20, and sums are long sums — bit-equal under
  * ANY partitioning or iteration order, which is what lets an oracle
  * replay an iterative algorithm at all.
  */
object Graph {

  private def li(s: SparkSession, d: String): DataFrame = Tables.lineitem(s, d)

  /** Scaled-integer PageRank constants: total mass 1e9, damping 17/20
    * (= 0.85), teleport mass 15% of 1e9. */
  private val Mass = 1000000000L
  private val Teleport = 150000000L
  private val Iterations = 3

  val defs: Vector[Q] = Vector(

    // ── PageRank over the part co-occurrence graph: parts are linked when
    //    they appear in the same order (the market-basket graph), and 3
    //    damped iterations score each part's centrality. The edge build is
    //    the one genuinely large step — a self-join of the distinct
    //    (order, part) pairs on the order key, bounded per order by the
    //    basket size (never catalog×catalog) — then each iteration joins
    //    the node-sized rank relation to edges and re-aggregates by
    //    destination. Dangling mass (deg-0 nodes) is dropped identically
    //    in both engines; isolated nodes keep their teleport share.
    Q("q105_pagerank",
      s"""WITH pairs AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |edges AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
         |          FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.pk <> b.pk),
         |nodes AS (SELECT DISTINCT pk FROM pairs),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
         |r0 AS (SELECT pk, $Mass // (SELECT n FROM nn) AS r FROM nodes),
         |i1 AS (SELECT n.pk, $Teleport // (SELECT n FROM nn)
         |              + (COALESCE(s.m, 0) * 17) // 20 AS r
         |       FROM nodes n LEFT JOIN (
         |         SELECT e.dst AS pk, CAST(sum(p.r // deg.d) AS BIGINT) AS m
         |         FROM edges e JOIN r0 p ON p.pk = e.src JOIN deg ON deg.src = e.src
         |         GROUP BY e.dst) s ON s.pk = n.pk),
         |i2 AS (SELECT n.pk, $Teleport // (SELECT n FROM nn)
         |              + (COALESCE(s.m, 0) * 17) // 20 AS r
         |       FROM nodes n LEFT JOIN (
         |         SELECT e.dst AS pk, CAST(sum(p.r // deg.d) AS BIGINT) AS m
         |         FROM edges e JOIN i1 p ON p.pk = e.src JOIN deg ON deg.src = e.src
         |         GROUP BY e.dst) s ON s.pk = n.pk),
         |i3 AS (SELECT n.pk, $Teleport // (SELECT n FROM nn)
         |              + (COALESCE(s.m, 0) * 17) // 20 AS r
         |       FROM nodes n LEFT JOIN (
         |         SELECT e.dst AS pk, CAST(sum(p.r // deg.d) AS BIGINT) AS m
         |         FROM edges e JOIN i2 p ON p.pk = e.src JOIN deg ON deg.src = e.src
         |         GROUP BY e.dst) s ON s.pk = n.pk)
         |SELECT i3.pk AS p_partkey, pt.p_name, CAST(i3.r AS BIGINT) AS rank_scaled
         |FROM i3 JOIN part pt ON pt.p_partkey = i3.pk
         |ORDER BY rank_scaled DESC, p_partkey LIMIT 10""".stripMargin) { (s, d) =>
      val pairs = li(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // The static graph relations feed every iteration of the unrolled
      // plan; without persistence Catalyst re-runs the edge self-join once
      // per iteration reference (3-5 recomputes of the only large step).
      // At cluster scale this persist is the per-iteration checkpoint every
      // Pregel-style runner does. The out-degree is folded INTO the
      // checkpointed edge relation once (via a broadcast of the node-sized
      // degree table), so each iteration is a single map-side join plus
      // one aggregate — no per-round deg join, and the edge relation
      // never shuffles after the build.
      val edges = pairs.alias("a")
        .join(pairs.alias("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
      // localCheckpoint (eager) for the static relations and each rank
      // round: truncated leaf plans keep per-iteration analyze/optimize
      // cost flat (a persist variant benched 1.6× slower — Catalyst
      // re-walks the full cached lineage every round). Checkpoint blocks
      // are RDD-level, invisible to Dataset.unpersist/clearCache, so
      // superseded rounds are released deterministically via
      // graft.etl.Ckpt.release; the FINAL round's blocks back the
      // returned plan and are swept by the harness after consumption.
      val nodes = pairs.select("pk").distinct().localCheckpoint()
      // node count as a literal: the previous scalar relation re-broadcast
      // one single-row plan per iteration (3 extra broadcast-build jobs);
      // a count() here is the sanctioned O(1)-row scalar class and embeds
      // the same integer in every iteration's plan.
      val n = nodes.count()
      // deg re-references the edges subplan; its distinct's exchange is
      // reused (one self-join run), so only the degree-annotated relation
      // needs materializing — one 3-column edge checkpoint, not two.
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val edgesD = edges.join(broadcast(deg), "src").localCheckpoint()
      var ranks = nodes.select(col("pk"), lit(Mass / n).as("r"))
      var prev: Option[DataFrame] = None
      for (_ <- 1 to Iterations) {
        val inbound = edgesD
          .join(broadcast(ranks.withColumnRenamed("pk", "src")), "src")
          .groupBy(col("dst").as("pk"))
          .agg(sum(expr("r div d")).cast("long").as("m"))
        // checkpoint the node-sized rank relation each round: iteration
        // k's plan then contains exactly ONE edges⋈ranks join instead of
        // the whole k-deep lineage, and storage holds at most two rank
        // copies — the per-iteration cut every Pregel runner makes.
        // `inbound` is node-sized by construction (grouped on the node
        // key), so the left join broadcasts it — the checkpointed `nodes`
        // leaf carries no stats, and unhinted the planner sort-merged
        // this join with two exchanges and two sorts EVERY round.
        ranks = nodes
          .join(broadcast(inbound), Seq("pk"), "left")
          .select(col("pk"),
            (lit(Teleport / n) +
              expr("(COALESCE(m, 0) * 17) div 20")).as("r"))
          .localCheckpoint()
        prev.foreach(graft.etl.Ckpt.release)
        prev = Some(ranks)
      }
      // the last checkpoint (still in `prev`) backs the returned plan;
      // everything else was superseded and is releasable now
      graft.etl.Ckpt.release(nodes)
      graft.etl.Ckpt.release(edgesD)
      ranks.join(Tables.part(s, d), col("pk") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("r").cast("long").as("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("p_partkey"))
        .limit(10)
    },

    // ── Triangle counting + global clustering coefficient over the part
    //    co-occurrence graph — the graph-quality metric next to q105's
    //    centrality (how clique-ish are the baskets?). The algorithm is
    //    the degree-safe ORIENTED form: edges stored once as src < dst,
    //    wedges enumerated as e1(a,b)⋈e2(b,c) (so a<b<c and each triangle
    //    is counted exactly once), then closed by a hash join against the
    //    edge set. Intermediate size is the wedge count — bounded here by
    //    the documented p_partkey < 300 eval slice (q105 runs the full
    //    graph as the scale sibling); at production scale the standard
    //    orientation-by-degree bound applies unchanged, and every step is
    //    a hash join + aggregate, nothing per-node. Wedge total comes
    //    from degrees (Σ d·(d−1)/2, exact integer); the one float is the
    //    final clustering ratio, micro-rounded.
    Q("q139_triangle_count",
      """WITH pairs AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |               FROM lineitem WHERE l_partkey < 300),
        |edges AS (SELECT DISTINCT a.pk AS src, b.pk AS dst
        |          FROM pairs a JOIN pairs b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (SELECT pk, count(*) AS d FROM (
        |          SELECT src AS pk FROM edges
        |          UNION ALL SELECT dst AS pk FROM edges) GROUP BY 1),
        |wedge AS (SELECT CAST(sum(d * (d - 1)) AS BIGINT) // 2 AS wedges,
        |                 count(*) AS n_nodes FROM deg),
        |tri AS (SELECT count(*) AS triangles
        |        FROM edges e1
        |        JOIN edges e2 ON e1.dst = e2.src
        |        JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst),
        |ne AS (SELECT count(*) AS n_edges FROM edges)
        |SELECT wedge.n_nodes, ne.n_edges, wedge.wedges, tri.triangles,
        |       round(1e6 * 3 * tri.triangles / CAST(wedge.wedges AS DOUBLE)) / 1e6
        |         AS clustering
        |FROM wedge CROSS JOIN tri CROSS JOIN ne""".stripMargin) { (s, d) =>
      val pairs = li(s, d)
        .filter(col("l_partkey") < 300)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = pairs.alias("a")
        .join(pairs.alias("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
        .localCheckpoint() // leaf plan; blocks swept by the harness (see q105)
      val deg = edges.select(col("src").as("pk"))
        .unionByName(edges.select(col("dst").as("pk")))
        .groupBy("pk").agg(count(lit(1)).as("d"))
      val wedge = deg.agg(
        expr("CAST(sum(d * (d - 1)) AS BIGINT) div 2").as("wedges"),
        count(lit(1)).as("n_nodes"))
      val tri = edges.alias("e1")
        .join(edges.alias("e2"), col("e1.dst") === col("e2.src"))
        .join(edges.alias("e3"),
          col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
        .agg(count(lit(1)).as("triangles"))
      val ne = edges.agg(count(lit(1)).as("n_edges"))
      wedge.crossJoin(tri).crossJoin(ne)
        .select(col("n_nodes"), col("n_edges"), col("wedges"), col("triangles"),
          (round(lit(1e6) * lit(3) * col("triangles") / col("wedges").cast("double")) / 1e6)
            .as("clustering"))
    }
  )
}
