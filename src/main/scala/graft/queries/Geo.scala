package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** Grid-bucketed spatial self-join — the geohash/S2 pattern expressed on
  * an exact integer grid. Points are scattered deterministically from the
  * part table (md5-derived 32-bit uniform mod a prime — the repo's
  * cross-engine hash idiom — so both engines compute identical
  * coordinates in exact BIGINT arithmetic); the task is "all pairs
  * within Chebyshev distance r".
  *
  * The scale shape is the whole point: a naive formulation is an O(n²)
  * cross join, which PlanGuardSpec bans inventory-wide. Instead each
  * point is assigned to a grid cell of side r, ONE side of the join is
  * exploded into its 3×3 cell neighborhood (with cell side = r, a
  * qualifying pair can differ by at most one cell per axis), and the join
  * runs as a plain equi-join on the cell key — candidate volume is
  * 9·n·(cell occupancy), not n², and every qualifying pair is produced
  * exactly once (the cell offset between the two points is unique) before
  * the exact distance filter. This is precisely how geohash-bucketed
  * spatial joins dodge the cross product at planetary row counts; the
  * DuckDB oracle runs the honest quadratic formulation over the same
  * coordinates, so the bucketed plan is verified pair-for-pair against
  * the semantics it optimizes.
  */
object Geo {

  /** Grid/search parameters: prime field size, multiplicative scatter
    * constants, and the search radius (= cell side). */
  private val P = 997L
  private val R = 8L

  val defs: Vector[Q] = Vector(

    Q("q145_grid_spatial_pairs",
      s"""WITH pts AS (
         |  SELECT p_partkey AS k,
         |         ('0x' || substr(md5('x:' || CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % $P AS x,
         |         ('0x' || substr(md5('y:' || CAST(p_partkey AS VARCHAR)), 1, 8))::BIGINT % $P AS y
         |  FROM part),
         |pairs AS (
         |  SELECT greatest(abs(a.x - b.x), abs(a.y - b.y)) AS cheby,
         |         a.k AS ak
         |  FROM pts a JOIN pts b
         |    ON a.k < b.k
         |   AND abs(a.x - b.x) <= $R AND abs(a.y - b.y) <= $R)
         |SELECT CAST(cheby AS BIGINT) AS cheby,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(count(DISTINCT ak) AS BIGINT) AS n_anchor_parts
         |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      def scatter(prefix: String) =
        conv(substring(md5(concat(lit(prefix), col("p_partkey").cast("string"))),
          1, 8), 16, 10).cast("long") % P
      val pts = Tables.part(s, d).select(
        col("p_partkey").as("k"),
        scatter("x:").as("x"),
        scatter("y:").as("y"))
        .withColumn("cx", floor(col("x") / R))
        .withColumn("cy", floor(col("y") / R))
      // Anchor side exploded into its 3×3 neighborhood; probe side keyed
      // by its own cell — each qualifying pair matches on exactly one
      // (ox, oy) offset, so no post-join dedup is needed.
      val offsets = array((-1L to 1L).map(lit): _*)
      val anchors = pts
        .withColumn("ox", explode(offsets))
        .withColumn("oy", explode(offsets))
        .select(col("k").as("ak"), col("x").as("ax"), col("y").as("ay"),
          (col("cx") + col("ox")).as("jcx"), (col("cy") + col("oy")).as("jcy"))
      val probes = pts.select(col("k").as("bk"), col("x").as("bx"),
        col("y").as("by"), col("cx").as("jcx"), col("cy").as("jcy"))
      anchors.join(probes, Seq("jcx", "jcy"))
        .filter(col("ak") < col("bk") &&
          abs(col("ax") - col("bx")) <= R && abs(col("ay") - col("by")) <= R)
        .select(greatest(abs(col("ax") - col("bx")), abs(col("ay") - col("by")))
          .cast("long").as("cheby"), col("ak"))
        .groupBy("cheby")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("ak")).as("n_anchor_parts"))
        .orderBy("cheby")
    }
  )
}
