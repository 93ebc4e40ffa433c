package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.PageRank

/** Graph-signal queries (SURVEY §2 rows 151+): link-graph ranking over a
  * relationally-derived edge list — the source-quality-prior family of a
  * crawl-curation stack, expressed on the TPC-H-ish purchase graph (who
  * buys from whom) so the oracle can rebuild the identical graph.
  */
object GraphQueries {

  /** The bipartite purchase graph, bidirectional: customer c and supplier
    * s are linked iff some order of c has a lineitem supplied by s. Node
    * ids are made disjoint arithmetically (2k customers / 2k+1 suppliers
    * — portable in any engine, unlike a hash). */
  private val iters = 3
  private val prScale = 8

  private def edgesSql: String =
    """p AS (SELECT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
             FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       e AS (SELECT DISTINCT src, dst FROM (
               SELECT cnode AS src, snode AS dst FROM p
               UNION ALL
               SELECT snode AS src, cnode AS dst FROM p)),
       deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
       n AS (SELECT DISTINCT node FROM (
               SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))"""

  /** The unrolled-walk oracle; `seedsSql` = a CTE body selecting seed
    * `node`s restricts the teleport (personalized walk), None = uniform. */
  private def walkSql(seedsSql: Option[String]): String = {
    val seedCtes = seedsSql match {
      case Some(sql) =>
        s""",
        seeds AS ($sql),
        ns AS (SELECT n.node,
                 (CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END) AS seed
               FROM n LEFT JOIN seeds s ON s.node = n.node)"""
      case None => ",\n        ns AS (SELECT node, 1 AS seed FROM n)"
    }
    val baseTerm = "(CASE WHEN ns.seed = 1 THEN 0.15 ELSE 0.0 END)"
    val iterations = (1 to iters).map { i =>
      s"""i$i AS (SELECT e.dst AS node,
                 sum(${PageRank.sqlContrib(s"r${i - 1}.rank", "deg.out_deg", prScale)}) AS s
               FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
               GROUP BY e.dst),
         r$i AS (SELECT ns.node,
                 floor(($baseTerm + 0.85 * coalesce(CAST(i$i.s AS DOUBLE), 0.0))
                   * 1e$prScale + 0.5) / 1e$prScale AS rank
               FROM ns LEFT JOIN i$i ON ns.node = i$i.node)"""
    }.mkString(",\n")
    s"""
      WITH $edgesSql$seedCtes,
      r0 AS (SELECT node,
               CASE WHEN seed = 1 THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END AS rank
             FROM ns),
      $iterations
      SELECT node, rank FROM r$iters ORDER BY node"""
  }

  val all: Seq[Q] = Seq(

    // Fixed-iteration PageRank on the purchase graph (§2 row 151): the
    // decimal-accumulator discipline makes every iteration's ranks
    // bit-identical across engines, so the oracle replays the WHOLE walk
    // (3 unrolled rounds), not just a summary — rank flow, out-degree
    // division, base/damping arithmetic and the left-join zero-in-degree
    // case are all hash-pinned.
    Q("graph_pagerank",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        val p = o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select((col("o_custkey") * 2).as("cnode"),
            (col("l_suppkey") * 2 + 1).as("snode"))
        val edges = p.select(col("cnode").as("src"), col("snode").as("dst"))
          .union(p.select(col("snode").as("src"), col("cnode").as("dst")))
        PageRank.ranks(edges, "src", "dst",
            iterations = iters, damping = 0.85, base = 0.15, scale = prScale)
          .orderBy("node")
      },
      Some(walkSql(None))),

    // Personalized PageRank (§2 row 151): teleport restricted to
    // high-balance suppliers — the seed-expansion curation pattern
    // (trusted seeds endorse their neighborhood). Same full-walk oracle,
    // with the seed-gated base term and the 0-start for non-seeds also
    // replayed round by round.
    Q("graph_ppr",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
        val p = o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select((col("o_custkey") * 2).as("cnode"),
            (col("l_suppkey") * 2 + 1).as("snode"))
        val edges = p.select(col("cnode").as("src"), col("snode").as("dst"))
          .union(p.select(col("snode").as("src"), col("cnode").as("dst")))
        val seeds = Tables.supplier(s, dir)
          .where(col("s_acctbal") > 5000)
          .select((col("s_suppkey") * 2 + 1).as("node"))
        PageRank.personalizedRanks(edges, "src", "dst", seeds, "node",
            iterations = iters, damping = 0.85, base = 0.15, scale = prScale)
          .orderBy("node")
      },
      Some(walkSql(Some(
        """SELECT DISTINCT s_suppkey * 2 + 1 AS node
           FROM supplier WHERE s_acctbal > 5000"""))))
  )
}
