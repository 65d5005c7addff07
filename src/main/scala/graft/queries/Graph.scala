package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryPack}
import graft.core.Tables.t

/** Graph analytics over the document-similarity graph: the corpus as
  * a network. Edges are derived the q157 way (df-capped shared-rare-
  * shingle posting join — never all-pairs), then counted for
  * triangles and local clustering structure.
  *
  * Scale notes: triangle enumeration joins ORIENTED edges (u < v by
  * id here; by ascending degree in the canonical 100 TB variant,
  * which bounds each node's out-degree by O(sqrt(m)) and is a
  * drop-in swap of the orientation predicate) so each wedge is
  * generated once, and the closing-edge probe is an equi-join on the
  * (b, c) pair — three skinny int-pair exchanges, no text anywhere.
  */
object Graph extends QueryPack {

  /** Undirected similarity edges (u < v): docs sharing >= 2 rare
    * 3-gram shingles with tf-dot >= 4 — the q157 feature space, one
    * threshold up, so the graph is sparse but non-trivial at every
    * SF (36 edges at sf0.01, ~1.2k at sf0.1). The underlying gram
    * pass is materialized ONCE per session/dataset ([[SimGraph]]) and
    * shared with q157/q187 — each graph query here pays only the
    * skinny edge-table scan plus its own joins.
    */
  private def simEdges(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    SimGraph.edges(s, d)

  def defs: Seq[QueryDef] = Seq(
    // ---- q162: triangle counting + local clustering structure ----
    // Per node: degree, wedge count C(deg,2), and the number of
    // triangles through it — the exact integer numerator/denominator
    // of the local clustering coefficient (no float division crosses
    // the engines). Triangles close densely-duplicated content
    // families that pairwise similarity alone understates.
    QueryDef(
      "q162_doc_triangles",
      (s, d) => {
        val edges = simEdges(s, d).persist()
        try {
          val deg = edges
            .select(explode(array(col("u"), col("v"))).as("node"))
            .groupBy("node").agg(count(lit(1)).as("degree"))
          val tri = edges.as("e1")
            .join(edges.as("e2"),
              col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
            .select(col("e1.u").as("a"), col("e1.v").as("b"),
              col("e2.v").as("c"))
            .join(edges.select(col("u").as("b"), col("v").as("c")),
              Seq("b", "c"))
          val triPerNode = tri
            .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
            .groupBy("node").agg(count(lit(1)).as("n_tri"))
          deg.join(triPerNode, Seq("node"), "left")
            .filter(col("degree") >= 2)
            .select(col("node"), col("degree"),
              expr("degree * (degree - 1) div 2").as("wedges"),
              coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        } finally edges.unpersist()
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
          FROM tk),
        tf AS (
          SELECT doc_id, g, COUNT(*) AS tf FROM sh GROUP BY 1, 2),
        rare AS (
          SELECT g FROM tf GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND 50),
        posting AS (
          SELECT tf.doc_id, tf.g, tf.tf FROM tf JOIN rare USING (g)),
        edges AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM posting a JOIN posting b
            ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING SUM(a.tf * b.tf) >= 4 AND COUNT(*) >= 2),
        deg AS (
          SELECT node, COUNT(*) AS degree FROM (
            SELECT u AS node FROM edges
            UNION ALL SELECT v FROM edges)
          GROUP BY 1),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM edges e1
          JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
          JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v),
        tn AS (
          SELECT node, COUNT(*) AS n_tri FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
          GROUP BY 1)
        SELECT d.node, d.degree,
          d.degree * (d.degree - 1) // 2 AS wedges,
          COALESCE(t.n_tri, 0) AS n_tri
        FROM deg d LEFT JOIN tn t USING (node)
        WHERE d.degree >= 2""")),

    // ---- q167: hierarchical subtree rollup — the recursive-CTE
    //      workload done Spark-style. The hierarchy is the binary
    //      tree parent(id) = id div 2 over ids 1..N (doc_id + 1), a
    //      stand-in for any org-chart / BOM / category edge list.
    //      [[graft.operators.TreeClosure]] closes the ancestor
    //      relation by POINTER DOUBLING (ceil(log2 depth) self-joins,
    //      localCheckpointed — never a driver-side loop over rows),
    //      then the rollup is one ancestor-keyed aggregate. The
    //      oracle is DuckDB's WITH RECURSIVE — hash equality proves
    //      log-round doubling == linear recursion. ----
    QueryDef(
      "q167_tree_rollup",
      (s, d) => {
        val nodes = t(s, d, "documents")
          .select((col("doc_id") + 1).as("id"),
            col("n_chars").as("w"))
        val edges = nodes.filter(col("id") >= 2)
          .select(col("id").as("child"), expr("id div 2").as("parent"))
        val anc = graft.operators.TreeClosure.ancestors(edges)
        val withSelf = anc.union(
          nodes.select(col("id").as("node"), col("id").as("anc")))
        val depth = anc.groupBy("node").agg(count(lit(1)).as("depth"))
        val sub = withSelf
          .join(nodes.select(col("id").as("node"), col("w")), Seq("node"))
          .groupBy("anc")
          .agg(count(lit(1)).as("n_subtree"), sum("w").as("w_subtree"))
        nodes.select(col("id"))
          .join(sub.select(col("anc").as("id"), col("n_subtree"),
            col("w_subtree")), Seq("id"))
          .join(depth.select(col("node").as("id"), col("depth")),
            Seq("id"), "left")
          .select(col("id"), coalesce(col("depth"), lit(0L)).as("depth"),
            col("n_subtree"), col("w_subtree"))
      },
      Some("""
        WITH RECURSIVE anc AS (
          SELECT id AS node, id // 2 AS anc
          FROM (SELECT doc_id + 1 AS id FROM documents)
          WHERE id >= 2
          UNION ALL
          SELECT node, anc // 2 FROM anc WHERE anc >= 2),
        nodes AS (
          SELECT doc_id + 1 AS id, n_chars AS w FROM documents),
        withself AS (
          SELECT node, anc FROM anc
          UNION ALL SELECT id, id FROM nodes),
        sub AS (
          SELECT ws.anc AS id, COUNT(*) AS n_subtree,
            CAST(SUM(n.w) AS BIGINT) AS w_subtree
          FROM withself ws JOIN nodes n ON ws.node = n.id
          GROUP BY 1),
        dep AS (
          SELECT node AS id, COUNT(*) AS depth FROM anc GROUP BY 1)
        SELECT n.id, COALESCE(d.depth, 0) AS depth,
          s.n_subtree, s.w_subtree
        FROM nodes n
        JOIN sub s USING (id)
        LEFT JOIN dep d USING (id)""")),

    // ---- q186: walk-mass centrality — two EXACT power-iteration
    //      steps of eigenvector centrality with integer weights:
    //      x₁(v) = deg(v), x₂(v) = Σ_{u∈N(v)} deg(u), x₃(v) =
    //      Σ_{u∈N(v)} x₂(u) (2- and 3-step walk counts from v). No
    //      damping float ever crosses the engines; the ORDER of
    //      centrality scores — what consumers rank by — is already
    //      fixed by these integer iterates. Scale: each step is one
    //      edge-keyed join + aggregate over the symmetrized edge
    //      list. ----
    QueryDef(
      "q186_walk_centrality",
      (s, d) => {
        val e = simEdges(s, d)
        val sym = e.select(col("u").as("a"), col("v").as("b"))
          .union(e.select(col("v").as("a"), col("u").as("b")))
          .persist()
        try {
          val deg = sym.groupBy("a").agg(count(lit(1)).as("x1"))
          val x2 = sym
            .join(deg.select(col("a").as("b"), col("x1")), Seq("b"))
            .groupBy("a").agg(sum(col("x1")).as("x2"))
          val x3 = sym
            .join(x2.select(col("a").as("b"), col("x2")), Seq("b"))
            .groupBy("a").agg(sum(col("x2")).as("x3"))
          deg.join(x2, Seq("a")).join(x3, Seq("a"))
            .select(col("a").as("node"), col("x1").as("degree"),
              col("x2").as("walk2"), col("x3").as("walk3"))
            .filter(col("degree") >= 2)
        } finally sym.unpersist()
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
          FROM tk),
        tf AS (
          SELECT doc_id, g, COUNT(*) AS tf FROM sh GROUP BY 1, 2),
        rare AS (
          SELECT g FROM tf GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND 50),
        posting AS (
          SELECT tf.doc_id, tf.g, tf.tf FROM tf JOIN rare USING (g)),
        edges AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM posting a JOIN posting b
            ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING SUM(a.tf * b.tf) >= 4 AND COUNT(*) >= 2),
        sym AS (
          SELECT u AS a, v AS b FROM edges
          UNION ALL SELECT v, u FROM edges),
        deg AS (SELECT a, COUNT(*) AS x1 FROM sym GROUP BY 1),
        x2 AS (
          SELECT s.a, CAST(SUM(d.x1) AS BIGINT) AS x2
          FROM sym s JOIN deg d ON d.a = s.b GROUP BY 1),
        x3 AS (
          SELECT s.a, CAST(SUM(x.x2) AS BIGINT) AS x3
          FROM sym s JOIN x2 x ON x.a = s.b GROUP BY 1)
        SELECT d.a AS node, d.x1 AS degree, x2.x2 AS walk2, x3.x3 AS walk3
        FROM deg d JOIN x2 USING (a) JOIN x3 USING (a)
        WHERE d.x1 >= 2""")),

    // ---- q187: mutual nearest neighbors — reciprocal best matches
    //      on the similarity graph: A's top-1 neighbor is B AND B's
    //      top-1 is A (ties broken by id). The high-precision dedup-
    //      candidate filter: reciprocity removes the hub artifacts
    //      that one-directional top-1 lists are full of. ----
    QueryDef(
      "q187_mutual_nn",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // the directed pair view of the SHARED materialized gram pass
        // (SimGraph) — this query pays only the ranking window
        val pairs = SimGraph.directedPairs(s, d)
          .select(col("da"), col("db"), col("dot"))
        val w = Window.partitionBy("da")
          .orderBy(col("dot").desc, col("db"))
        val best = pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("da"), col("db"), col("dot"))
        best.as("f")
          .join(best.as("g"),
            col("f.da") === col("g.db") && col("f.db") === col("g.da"))
          .filter(col("f.da") < col("f.db"))
          .select(col("f.da").as("doc_a"), col("f.db").as("doc_b"),
            col("f.dot").as("dot"))
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
          FROM tk),
        tf AS (
          SELECT doc_id, g, COUNT(*) AS tf FROM sh GROUP BY 1, 2),
        rare AS (
          SELECT g FROM tf GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND 50),
        posting AS (
          SELECT tf.doc_id, tf.g, tf.tf FROM tf JOIN rare USING (g)),
        pairs AS (
          SELECT a.doc_id AS da, b.doc_id AS db,
            CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
          FROM posting a JOIN posting b
            ON a.g = b.g AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
        best AS (
          SELECT da, db, dot FROM (
            SELECT *, row_number() OVER (PARTITION BY da
              ORDER BY dot DESC, db) AS rn
            FROM pairs)
          WHERE rn = 1)
        SELECT f.da AS doc_a, f.db AS doc_b, f.dot AS dot
        FROM best f JOIN best g ON f.da = g.db AND f.db = g.da
        WHERE f.da < f.db""")),

    // ---- q214: degree assortativity — do similar documents cluster
    //      with similarly-connected documents? Pearson correlation of
    //      endpoint degrees over the SYMMETRIZED edge list (Newman
    //      2002). All moment sums are exact integers (degrees are
    //      ints), shipped alongside the one IEEE-identical r — the
    //      q49 discipline applied to graph structure. Cost: the edge
    //      derivation plus two degree joins and a one-row reduce. ----
    QueryDef(
      "q214_degree_assortativity",
      (s, d) => {
        val e = simEdges(s, d)
        val sym = e.select(col("u").as("a"), col("v").as("b"))
          .union(e.select(col("v").as("a"), col("u").as("b")))
        val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
        val m = sym
          .join(deg.select(col("a"), col("deg").as("dx")), Seq("a"))
          .join(deg.select(col("a").as("b"), col("deg").as("dy")),
            Seq("b"))
          .agg(count(lit(1)).as("n_dir_edges"),
            sum(col("dx")).as("sx"),
            sum(col("dx") * col("dx")).as("sxx"),
            sum(col("dx") * col("dy")).as("sxy"))
        val nD = col("n_dir_edges").cast("double")
        m.withColumn("r_assort",
          when(nD * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") =!= 0.0,
            (nD * col("sxy").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) /
              (nD * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double"))))
      },
      Some("""
        WITH tk AS (
          SELECT doc_id,
            regexp_split_to_array(trim(lower(text)), '\s+') AS tk
          FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
          FROM tk),
        tf AS (
          SELECT doc_id, g, COUNT(*) AS tf FROM sh GROUP BY 1, 2),
        rare AS (
          SELECT g FROM tf GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND 50),
        posting AS (
          SELECT tf.doc_id, tf.g, tf.tf FROM tf JOIN rare USING (g)),
        edges AS (
          SELECT a.doc_id AS u, b.doc_id AS v
          FROM posting a JOIN posting b
            ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING SUM(a.tf * b.tf) >= 4 AND COUNT(*) >= 2),
        sym AS (
          SELECT u AS a, v AS b FROM edges
          UNION ALL SELECT v, u FROM edges),
        deg AS (SELECT a, COUNT(*) AS deg FROM sym GROUP BY 1),
        m AS (
          SELECT COUNT(*) AS n_dir_edges,
            CAST(SUM(dx.deg) AS BIGINT) AS sx,
            CAST(SUM(dx.deg * dx.deg) AS BIGINT) AS sxx,
            CAST(SUM(dx.deg * dy.deg) AS BIGINT) AS sxy
          FROM sym s
          JOIN deg dx ON dx.a = s.a
          JOIN deg dy ON dy.a = s.b)
        SELECT n_dir_edges, sx, sxx, sxy,
          CASE WHEN CAST(n_dir_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0.0
            THEN (CAST(n_dir_edges AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n_dir_edges AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          END AS r_assort
        FROM m""")),

    // ---- q234: materialized paths — the '/1/2/5/11' path-string
    //      denormalization every hierarchy UI and prefix-filterable
    //      path index wants, built from the SAME pointer-doubling
    //      closure as q167 (log-depth self-joins, never a driver
    //      loop). This tree's parents are always smaller than their
    //      children, so root-first ordering is a plain value sort of
    //      the ancestor set — one node-keyed aggregate after the
    //      closure. Oracle: DuckDB's linear recursion builds the path
    //      directly; hash equality proves closure+sort ≡ recursion.
    //      ----
    QueryDef(
      "q234_materialized_path",
      (s, d) => {
        val nodes = t(s, d, "documents")
          .select((col("doc_id") + 1).as("id"))
        val edges = nodes.filter(col("id") >= 2)
          .select(col("id").as("child"), expr("id div 2").as("parent"))
        val anc = graft.operators.TreeClosure.ancestors(edges)
        val withSelf = anc.union(
          nodes.select(col("id").as("node"), col("id").as("anc")))
        withSelf.groupBy("node")
          .agg(concat(lit("/"),
            array_join(sort_array(collect_list(col("anc"))), "/"))
            .as("path"),
            (count(lit(1)) - 1).as("depth"))
          .select(col("node").as("id"), col("depth"), col("path"))
      },
      Some("""
        WITH RECURSIVE nodes AS (
          SELECT doc_id + 1 AS id FROM documents),
        walk AS (
          SELECT id AS node, id AS cur,
            CAST(id AS VARCHAR) AS path, 0 AS depth
          FROM nodes
          UNION ALL
          SELECT node, cur // 2,
            CAST(cur // 2 AS VARCHAR) || '/' || path, depth + 1
          FROM walk WHERE cur >= 2)
        SELECT node AS id, CAST(depth AS BIGINT) AS depth,
          '/' || path AS path
        FROM walk WHERE cur = 1 OR (cur = node AND node = 1)""")),

    // ---- q325: k-core decomposition (3-core) by iterative peeling
    //      (Matula & Beck 1983) over the part co-purchase graph
    //      (parts sharing ≥ 2 orders). The k-core is the standard
    //      "dense engagement nucleus" extractor — recommendation
    //      seeds, spam-ring detection, tightly-coupled duplicate
    //      families. Peeling repeatedly deletes nodes of degree < k;
    //      the fixpoint is order-independent (the k-core is unique),
    //      which is what makes the distributed version safe.
    //
    //      Spark runs a DRIVER-COORDINATED loop of bounded depth
    //      [[KcoreMaxIter]]: each round is one combinable degree
    //      aggregate plus two semi-joins (ids only), materialized
    //      via persist + count so the next round plans over the
    //      cached relation, with early exit at the fixpoint. The
    //      oracle unrolls exactly [[KcoreMaxIter]] peel steps as
    //      MATERIALIZED CTEs (inlining would expand the chain
    //      exponentially), so both engines compute the identical
    //      bounded iterate — and since a converged peel is the
    //      identity, early exit cannot diverge. At sf0.01 the peel
    //      converges in 11 rounds (verified); a non-converged run
    //      still matches because both sides run the same N.
    //
    //      Scale shape: per-order pair fan-out is bounded by order
    //      size (≤ ~7 items); every round exchanges only (id) /
    //      (u,v) integer rows; the loop is O(peel depth) jobs, the
    //      classic Pregel-style iterate. ----
    QueryDef(
      "q325_kcore",
      (s, d) => {
        val k = 3
        // the initial edge list IS q185's pair-support table (same
        // p1<p2 / co-order-count ≥ 2 definition) — consume the shared
        // Baskets artifact instead of re-running the within-order
        // self-join; the oracle still derives it from scratch. The
        // artifact contract (build-once, value-identity vs fresh
        // recomputation) is pinned by Round12Spec's "Baskets pair
        // artifact" tests — edits here must keep those asserts green
        // LAZY checkpoints throughout the peel (r14): the counts below
        // are the materializing actions, so each round runs ONE job
        // instead of checkpoint-job + count-job (TreeClosure idiom)
        var edges = Baskets.pairSupports(s, d)
          .select(col("p1").as("u"), col("p2").as("v"))
          .localCheckpoint(false) // truncate lineage per round
        var prev = edges.count()
        var iter = 0
        var changed = true
        while (changed && iter < KcoreMaxIter) {
          val keep = edges
            .select(explode(array(col("u"), col("v"))).as("n"))
            .groupBy("n").agg(count(lit(1)).as("deg"))
            .filter(col("deg") >= k)
            .select("n")
          val next = edges
            .join(keep.select(col("n").as("u")), Seq("u"))
            .join(keep.select(col("n").as("v")), Seq("v"))
            .select("u", "v")
            .localCheckpoint(false)
          val cur = next.count()
          edges.unpersist()
          edges = next
          changed = cur != prev
          prev = cur
          iter += 1
        }
        edges
          .select(explode(array(col("u"), col("v"))).as("n"))
          .groupBy("n").agg(count(lit(1)).as("deg_core"))
      },
      Some(kcoreOracle)),
  )

  /** Bounded peel depth shared by the Spark loop and the unrolled
    * oracle — MUST stay equal on both sides (equality of the bounded
    * iterate is the correctness contract; convergence within the
    * bound is the performance expectation, asserted at sf0.01). */
  private val KcoreMaxIter = 16

  private def kcoreOracle: String = {
    val steps = (0 until KcoreMaxIter).map { i =>
      s"""k${i + 1} AS MATERIALIZED (
          SELECT n FROM (SELECT u AS n FROM e$i
                         UNION ALL SELECT v FROM e$i) t
          GROUP BY n HAVING COUNT(*) >= 3),
        e${i + 1} AS MATERIALIZED (
          SELECT u, v FROM e$i
          WHERE u IN (SELECT n FROM k${i + 1})
            AND v IN (SELECT n FROM k${i + 1}))"""
    }.mkString(",\n        ")
    s"""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e0 AS MATERIALIZED (
          SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        $steps
        SELECT n, COUNT(*) AS deg_core FROM
          (SELECT u AS n FROM e$KcoreMaxIter
           UNION ALL SELECT v FROM e$KcoreMaxIter) t
        GROUP BY n"""
  }
}
