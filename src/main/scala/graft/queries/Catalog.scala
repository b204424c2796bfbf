package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

import graft.engine._
import graft.engine.Exact._

/** One named query per implemented operator (SURVEY.md §2 checklist +
  * north-star extensions). Each spec pairs the Spark-first
  * implementation with equivalent ANSI SQL for the DuckDB oracle;
  * `oracle = None` marks operators that are not SQL-expressible
  * (sketches, seeded sampling, ML) — those get rows-only checks plus
  * ScalaTest coverage.
  *
  * Determinism contract (SURVEY §5.2): every query ends in an ORDER BY
  * over a unique key; fp-order-sensitive aggregates go through
  * [[graft.engine.Exact]]; derived integers are BIGINT on both sides.
  */
/** Oracle side-artifact declaration: `path` is the stable /tmp
  * location the oracle SQL embeds (e.g.
  * [[graft.engine.SimilarityOps.IvfOracleDumpPath]]), `run` writes it.
  * Registration lives ON the query so the dump set is derived, never
  * hand-maintained — the round-11 q255 failure mode (an oracle reading
  * an artifact nobody writes) is structurally impossible: Verify
  * executes the union of selected queries' dumps after a clean-/tmp
  * sweep, and CoreSpec asserts every `read_parquet('/tmp/…` in every
  * oracle is covered by a registered dump path (and vice versa). */
final case class OracleDump(path: String, run: (SparkSession, String) => Unit)

final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    dumps: Seq[OracleDump] = Nil)

object Catalog {

  /** The three oracle side-artifacts, shared across every query whose
    * SQL replays fitted index state (dedupe key = path; each dump is
    * memoized upstream so repeated registration costs one write). */
  private val ivfDump = OracleDump(SimilarityOps.IvfOracleDumpPath,
    (s, dir) => SimilarityOps.dumpIvfOracle(Tables.embeddings(s, dir), tag = dir))
  private val pqDump = OracleDump(SimilarityOps.PqOracleDumpPath,
    (s, dir) => SimilarityOps.dumpPqOracle(Tables.embeddings(s, dir), tag = dir))
  private val ivfPqDump = OracleDump(SimilarityOps.IvfPqOracleDumpPath,
    (s, dir) => SimilarityOps.dumpIvfPqOracle(
      SimilarityOps.ivfIndexFor(Tables.embeddings(s, dir), tag = dir), tag = dir))

  /** STORE-MEMBERSHIP dumps (r16, VERDICT r15 #4): the takedown
    * oracles previously ASSUMED the persisted sketch and
    * binary-signature stores are 1:1 with documents/embeddings — true
    * today (both builders run unfiltered), but a future
    * quality-filtered store would keep passing the oracle against a
    * WRONG engine count. Dumping each store's key column lets the SQL
    * derive membership from the ACTUAL store, the ivfDump pattern;
    * key multiplicity is preserved (no DISTINCT) so the counts match
    * the engine's row-level probes exactly. */
  private val sketchDump = OracleDump("/tmp/graft_sketch_oracle",
    (s, dir) => SketchShared.sketches(s, dir).select(col("doc_id"))
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/graft_sketch_oracle/docids"))
  private val binSigDump = OracleDump("/tmp/graft_binsig_oracle",
    (s, dir) => SimilarityOps.binarySigsFor(Tables.embeddings(s, dir), tag = dir)
      .select(col("vec_id")).coalesce(1).write.mode("overwrite")
      .parquet("/tmp/graft_binsig_oracle/vecids"))
  private val binSigWideDump = OracleDump("/tmp/graft_binsigw_oracle",
    (s, dir) => SimilarityOps.binarySigsWideFor(wideEmbeddings(s, dir),
        tag = "w" + dir)
      .select(col("vec_id")).coalesce(1).write.mode("overwrite")
      .parquet("/tmp/graft_binsigw_oracle/vecids"))

  /** The q259 flood batch: 1/7 of the corpus mapped to a far cluster
    * near (100, …, 100) with per-vector jitter — every row argmins
    * into the same stored list and pushes it past the q235 gate, so
    * the applier's split branch is exercised at any SF. Shared by the
    * query and the child-centroid dump so both see one batch. */
  private def rebalanceBatch(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, pmod}
    emb.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        expr("transform(embedding, x -> 100.0D + CAST(x AS DOUBLE) * 0.01D)")
          .as("embedding"))
  }

  /** The q244/q260 drift batch: subspace 0 (first 16 dims) scaled ×3,
    * the rest passed through — localized drift so subspace 0 fires
    * the refit trigger while 1–3 certify the no-fire path. One
    * builder keeps q244's trigger and q260's applier on the SAME
    * batch (and the v2-codebook dump on the same union corpus). */
  private def driftBatch(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, pmod}
    emb.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        expr("concat(transform(slice(embedding, 1, 16), " +
          "x -> CAST(x AS DOUBLE) * 3.0D), " +
          "transform(slice(embedding, 17, 48), x -> CAST(x AS DOUBLE)))")
          .as("embedding"))
  }

  private val rebDump = OracleDump(SimilarityOps.IvfRebOracleDumpPath,
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SimilarityOps.dumpIvfRebalanceOracle(
        SimilarityOps.ivfIndexFor(emb, tag = dir), rebalanceBatch(emb), tag = dir)
    })

  private val pqV2Dump = OracleDump(SimilarityOps.PqV2OracleDumpPath,
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SimilarityOps.dumpPqV2Oracle(emb, driftBatch(emb), tag = dir)
    })

  /** Shared by q45 (runtime co-partitioning) and q69 (persisted
    * bucketing): the two queries MUST stay result-identical — one SQL
    * text keeps the equivalence claim from drifting. */
  private val segmentRollupOracle: String =
    s"""SELECT c_mktsegment, ${Exact.decSumSql("o_totalprice")} AS total_price,
       |       COUNT(*) AS n_orders
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  /** Shared by q57 (in-memory model) and q65 (save→load→serve): the
    * same bounded inference slice, so the two queries differ ONLY in
    * where the model comes from. */
  private def inferSlice(s: SparkSession, dir: String,
                         model: org.apache.spark.ml.PipelineModel): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (feats, _) = MLShared.features(s, dir)
    val in = feats.orderBy(col("o_orderkey")).limit(20)
    MLPipelines.withConfidence(model.transform(in))
      .select(col("o_orderkey"), col("pred_label"), col("confidence"))
      .orderBy(col("o_orderkey"))
  }

  def specs: Seq[QuerySpec] =
    relational ++ joinsAndSets ++ stats ++ scalars ++ windows ++ eventWindows ++
      textQueries ++ dedupQueries ++ similarityQueries ++ multimodalQueries ++
      graphQueries ++ mlQueries ++ ingestAndServing

  // ---------------------------------------------------------------- //
  // §2.1-2.7 reference-parity relational operators
  // ---------------------------------------------------------------- //
  private def relational: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q01_flagship_geo_rollup",
      (s, dir) => RelationalOps.geoRollup(
        Tables.lineitem(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir)),
      Some(s"""SELECT s_name, n_name, ${decSumSql("l_extendedprice")} AS total_amount,
              |       COUNT(*) AS n_items
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |GROUP BY s_name, n_name
              |ORDER BY s_name""".stripMargin)),

    // share-of-parent contribution report: nation revenue with
    // share-of-region and share-of-total — all three totals exact
    // DECIMAL, one double division per share; dim frames broadcast.
    QuerySpec(
      "q190_share_of_parent",
      (s, dir) => RelationalOps.shareOfParent(
        Tables.lineitem(s, dir), Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.region(s, dir)),
      Some("""WITH j AS (
             |  SELECT r_name, n_name, l_extendedprice FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey),
             |bn AS (SELECT r_name, n_name,
             |              SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS np,
             |              CAST(COUNT(*) AS BIGINT) AS n_items
             |       FROM j GROUP BY r_name, n_name),
             |br AS (SELECT r_name, SUM(np) AS rp FROM bn GROUP BY r_name),
             |g AS (SELECT SUM(np) AS gp FROM bn)
             |SELECT bn.r_name, n_name, n_items,
             |       CAST(np AS DOUBLE) AS total_price,
             |       (CAST(np AS DOUBLE) / CAST(rp AS DOUBLE)) AS share_of_region,
             |       (CAST(np AS DOUBLE) / CAST(gp AS DOUBLE)) AS share_of_total
             |FROM bn JOIN br USING (r_name) CROSS JOIN g
             |ORDER BY r_name, n_name""".stripMargin)),

    QuerySpec(
      "q02_two_key_rollup",
      (s, dir) => RelationalOps.twoKeyRollup(Tables.lineitem(s, dir)),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       ${decSumSql("l_quantity")} AS sum_qty,
              |       ${decSumSql("l_extendedprice")} AS sum_price,
              |       COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QuerySpec(
      "q03_month_rollup",
      (s, dir) => RelationalOps.monthRollup(Tables.orders(s, dir)),
      Some(s"""SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS o_month,
              |       ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders
              |GROUP BY o_orderpriority, o_month
              |ORDER BY o_orderpriority, o_month""".stripMargin)),

    QuerySpec(
      "q04_filter_project",
      (s, dir) => RelationalOps.filterProject(Tables.lineitem(s, dir)),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
             |FROM lineitem
             |WHERE l_extendedprice > 30000 AND l_discount > 0.02
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QuerySpec(
      "q05_dropna_rollup",
      (s, dir) => RelationalOps.dropRequired(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")),
      Some("""SELECT l_returnflag, COUNT(*) AS n_rows
             |FROM lineitem
             |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
             |  AND l_returnflag IS NOT NULL AND l_shipdate IS NOT NULL
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec(
      "q06_conditional_label",
      (s, dir) => RelationalOps.conditionalLabel(Tables.orders(s, dir), 100000.0),
      Some(s"""SELECT CAST(CASE WHEN o_totalprice > 100000 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS label,
              |       COUNT(*) AS n_rows,
              |       ${decSumSql("o_totalprice")} AS sum_price
              |FROM orders
              |GROUP BY label
              |ORDER BY label""".stripMargin)),

    QuerySpec(
      "q07_topk",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        RelationalOps.topK(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          col("o_totalprice"), col("o_orderkey"), 15)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 15""".stripMargin)),

    QuerySpec(
      "q08_global_sort",
      (s, dir) => RelationalOps.globalSortByTotal(Tables.orders(s, dir)),
      Some(s"""SELECT o_custkey, ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders
              |GROUP BY o_custkey
              |ORDER BY total_price DESC, o_custkey""".stripMargin)),

    QuerySpec(
      "q09_join_inner",
      (s, dir) => RelationalOps.innerJoin(Tables.orders(s, dir), Tables.customer(s, dir)),
      Some("""SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_totalprice > 400000
             |ORDER BY o_orderkey""".stripMargin)),

    QuerySpec(
      "q44_salted_rollup",
      (s, dir) => RelationalOps.saltedRollup(Tables.lineitem(s, dir), 16),
      Some(s"""SELECT l_returnflag, ${decSumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY l_returnflag
              |ORDER BY l_returnflag""".stripMargin)),

    // skew-resilient salted JOIN (q44's companion for the join
    // itself): fact rows salt on a row-unique hash, the dim
    // replicates once per salt, the sort-merge join keys on
    // (suppkey, salt) — each hot key spreads over 8 reducers; the
    // salt drops before the rollup so the oracle is the PLAIN join.
    QuerySpec(
      "q156_salted_join",
      (s, dir) => RelationalOps.saltedJoinRollup(
        Tables.lineitem(s, dir), Tables.supplier(s, dir)),
      Some(s"""SELECT s_name, ${decSumSql("l_extendedprice")} AS total_amount,
              |       COUNT(*) AS n_items
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_name
              |ORDER BY s_name""".stripMargin)),

    QuerySpec(
      "q45_copartition_join",
      (s, dir) => RelationalOps.coPartitionedJoin(Tables.orders(s, dir), Tables.customer(s, dir), 32),
      Some(segmentRollupOracle)),

    // Non-equi range join: broadcast band dim, nested-loop plan; the
    // oracle computes the same bands arithmetically (the bucketize
    // rewrite big-big range joins use).
    QuerySpec(
      "q75_range_band_join",
      (s, dir) => RelationalOps.priceBandRollup(Tables.orders(s, dir)),
      Some(s"""SELECT LEAST(CAST(FLOOR(o_totalprice / 100000) AS BIGINT), 5) AS band_id,
              |       ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders
              |WHERE o_totalprice >= 0
              |GROUP BY band_id
              |ORDER BY band_id""".stripMargin)),

    // Bucketed storage layer: the same segment rollup as q45, but the
    // orders ⋈ customer join reads bucketed tables co-distributed on
    // the key — no join-side shuffle (plan asserted in ScaleSpec).
    QuerySpec(
      "q69_bucketed_join",
      (s, dir) => PartitionedTables.bucketedJoinRollup(s, dir),
      Some(segmentRollupOracle)),

    // Partitioned storage layer + dynamic partition pruning: the month
    // filter reaches the fact scan only through the dim join (DPP
    // evidence in ScaleSpec / SCALE.md); the oracle applies the
    // equivalent static predicate to the raw table.
    QuerySpec(
      "q64_partitioned_dpp",
      (s, dir) => PartitionedTables.quarterRollup(s, dir, quarter = 1),
      Some(s"""SELECT CAST(month(o_orderdate) AS BIGINT) AS o_month,
              |       ${decSumSql("o_totalprice")} AS total_price,
              |       COUNT(*) AS n_orders
              |FROM orders
              |WHERE month(o_orderdate) IN (1, 2, 3)
              |GROUP BY o_month
              |ORDER BY o_month""".stripMargin))
  )

  // ---------------------------------------------------------------- //
  // §2.3/§2.6 join variants + set operations
  // ---------------------------------------------------------------- //
  private def joinsAndSets: Seq[QuerySpec] = {
    import org.apache.spark.sql.functions._
    Seq(
      QuerySpec(
        "q10_join_left_semi",
        (s, dir) => {
          val c = Tables.customer(s, dir)
          val big = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
            .withColumnRenamed("o_custkey", "c_custkey")
          RelationalOps.joinSemi(c, big, Seq("c_custkey"))
            .select(col("c_custkey"), col("c_name"))
            .orderBy(col("c_custkey"))
        },
        Some("""SELECT c_custkey, c_name FROM customer
               |WHERE EXISTS (SELECT 1 FROM orders
               |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
               |ORDER BY c_custkey""".stripMargin)),

      QuerySpec(
        "q11_join_left_anti",
        (s, dir) => {
          val c = Tables.customer(s, dir)
          val o = Tables.orders(s, dir).withColumnRenamed("o_custkey", "c_custkey")
          RelationalOps.joinAnti(c, o, Seq("c_custkey"))
            .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
            .orderBy(col("c_custkey"))
        },
        Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
               |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
               |ORDER BY c_custkey""".stripMargin)),

      QuerySpec(
        "q12_join_left_outer",
        (s, dir) => {
          val c = Tables.customer(s, dir)
          val per = Tables.orders(s, dir)
            .groupBy(col("o_custkey").as("c_custkey"))
            .agg(count(lit(1)).as("n_o"), decSum(col("o_totalprice")).as("sum_o"))
          RelationalOps.joinLeftOuter(c, per, Seq("c_custkey"))
            .select(col("c_custkey"), col("c_name"),
                    coalesce(col("n_o"), lit(0L)).as("n_orders"),
                    coalesce(col("sum_o"), lit(0.0)).as("total_price"))
            .orderBy(col("c_custkey"))
        },
        Some(s"""SELECT c_custkey, c_name,
                |       COALESCE(n_o, 0) AS n_orders,
                |       COALESCE(sum_o, 0.0) AS total_price
                |FROM customer LEFT JOIN (
                |  SELECT o_custkey, COUNT(*) AS n_o,
                |         ${decSumSql("o_totalprice")} AS sum_o
                |  FROM orders GROUP BY o_custkey
                |) ON o_custkey = c_custkey
                |ORDER BY c_custkey""".stripMargin)),

      QuerySpec(
        "q13_union_all",
        (s, dir) => {
          val o = Tables.orders(s, dir)
          val hi = o.filter(col("o_totalprice") > 500000)
            .select(col("o_orderkey"), lit("high_value").as("tag"))
          val ur = o.filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey"), lit("urgent").as("tag"))
          hi.unionAll(ur).orderBy(col("o_orderkey"), col("tag"))
        },
        Some("""SELECT o_orderkey, 'high_value' AS tag FROM orders WHERE o_totalprice > 500000
               |UNION ALL
               |SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
               |ORDER BY o_orderkey, tag""".stripMargin)),

      QuerySpec(
        "q14_intersect",
        (s, dir) => {
          val seg = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey").as("k"))
          val big = Tables.orders(s, dir).filter(col("o_totalprice") > 300000)
            .select(col("o_custkey").as("k"))
          seg.intersect(big).orderBy(col("k"))
        },
        Some("""SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
               |INTERSECT
               |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
               |ORDER BY k""".stripMargin)),

      QuerySpec(
        "q15_except",
        (s, dir) => {
          val all = Tables.customer(s, dir).select(col("c_custkey").as("k"))
          val big = Tables.orders(s, dir).filter(col("o_totalprice") > 200000)
            .select(col("o_custkey").as("k"))
          all.except(big).orderBy(col("k"))
        },
        Some("""SELECT c_custkey AS k FROM customer
               |EXCEPT
               |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
               |ORDER BY k""".stripMargin))
    )
  }

  // ---------------------------------------------------------------- //
  // §2.4 statistics (A4-A10) + grouping-sets extensions
  // ---------------------------------------------------------------- //
  private def stats: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q16_distinct_counts",
      (s, dir) => AggregateOps.distinctCounts(Tables.lineitem(s, dir)),
      Some("""SELECT COUNT(*) AS n_rows,
             |       COUNT(DISTINCT l_returnflag) AS d_returnflag,
             |       COUNT(DISTINCT l_linestatus) AS d_linestatus,
             |       COUNT(DISTINCT l_suppkey) AS d_suppkey,
             |       COUNT(DISTINCT l_partkey) AS d_partkey
             |FROM lineitem""".stripMargin)),

    QuerySpec(
      "q17_approx_distinct",
      (s, dir) => AggregateOps.approxDistinct(Tables.lineitem(s, dir)),
      Some(q17OracleSql)),

    QuerySpec(
      "q18_quantiles",
      (s, dir) => AggregateOps.quantiles(Tables.orders(s, dir)),
      Some("""SELECT quantile_cont(o_totalprice, 0.25) AS p25,
             |       quantile_cont(o_totalprice, 0.5)  AS p50,
             |       quantile_cont(o_totalprice, 0.75) AS p75
             |FROM orders""".stripMargin)),

    // GK sketch with the rank window pinned below one rank: the
    // sketch's answer is the deterministic order statistic at
    // ⌈p·n⌉, which is exactly DuckDB's quantile_disc (VERDICT r4
    // missing item 5 — q19 converted from rows-only to hash-match).
    QuerySpec(
      "q19_approx_quantiles",
      (s, dir) => AggregateOps.approxQuantileOracle(Tables.orders(s, dir)),
      Some("""SELECT quantile_disc(o_totalprice, 0.25) AS p25,
             |       quantile_disc(o_totalprice, 0.5)  AS p50,
             |       quantile_disc(o_totalprice, 0.75) AS p75
             |FROM orders""".stripMargin)),

    QuerySpec(
      "q20_describe_stats",
      (s, dir) => AggregateOps.describeStats(Tables.lineitem(s, dir)),
      Some(s"""SELECT * FROM (
              |  SELECT 'l_quantity' AS col_name, COUNT(l_quantity) AS n,
              |         ${decAvgSql("l_quantity")} AS mean,
              |         ROUND(stddev_samp(l_quantity), 4) AS stddev,
              |         MIN(l_quantity) AS min_v, MAX(l_quantity) AS max_v FROM lineitem
              |  UNION ALL
              |  SELECT 'l_extendedprice', COUNT(l_extendedprice),
              |         ${decAvgSql("l_extendedprice")},
              |         ROUND(stddev_samp(l_extendedprice), 4),
              |         MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
              |  UNION ALL
              |  SELECT 'l_discount', COUNT(l_discount),
              |         ${decAvgSql("l_discount")},
              |         ROUND(stddev_samp(l_discount), 4),
              |         MIN(l_discount), MAX(l_discount) FROM lineitem
              |) ORDER BY col_name""".stripMargin)),

    // schema evolution: old-schema slice ∪ current schema by NAME,
    // missing fields null-filled
    QuerySpec(
      "q98_schema_evolution",
      (s, dir) => RelationalOps.evolvedUnion(Tables.lineitem(s, dir)),
      Some("""SELECT * FROM (
             |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |         l_quantity, CAST(NULL AS DOUBLE) AS l_tax
             |  FROM lineitem WHERE l_orderkey < 3000
             |  UNION ALL
             |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
             |         l_quantity, l_tax
             |  FROM lineitem WHERE l_orderkey >= 3000)
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // the general grouping-family member (rollup/cube are special
    // cases): one Expand + one aggregate pass
    QuerySpec(
      "q96_grouping_sets",
      (s, dir) => AggregateOps.groupingSetsAgg(Tables.lineitem(s, dir)),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       ${decSumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // the SQL entry path + correlated-subquery decorrelation (same
    // physical semi join as q10's API form)
    QuerySpec(
      "q97_sql_exists",
      (s, dir) => AggregateOps.sqlExistsSubquery(
        Tables.orders(s, dir), Tables.lineitem(s, dir)),
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_extendedprice > 50000)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // wide/long reshape pair (§2.4 extensions): pivot with PINNED
    // values (single aggregate pass, stable schema — no
    // values-discovery job over the fact) and its unpivot inverse
    QuerySpec(
      "q78_pivot",
      (s, dir) => AggregateOps.pivotAgg(Tables.lineitem(s, dir)),
      Some("""SELECT l_returnflag,
             |       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
             |       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS O
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    QuerySpec(
      "q79_unpivot",
      (s, dir) => AggregateOps.unpivotMetrics(Tables.lineitem(s, dir)),
      Some("""SELECT * FROM (
             |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |         'l_quantity' AS metric, l_quantity AS value
             |  FROM lineitem WHERE l_orderkey <= 2000
             |  UNION ALL
             |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
             |         'l_extendedprice', l_extendedprice
             |  FROM lineitem WHERE l_orderkey <= 2000
             |  UNION ALL
             |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
             |         'l_discount', l_discount
             |  FROM lineitem WHERE l_orderkey <= 2000
             |) ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // A10 family widened: seeded Bernoulli sample and per-stratum
    // sampleBy — deterministic given (seed, partitioning), both pinned
    // by the session; seeded ⇒ rows-only, determinism + realized
    // fractions asserted in CoreSpec
    QuerySpec(
      "q81_seeded_sample",
      (s, dir) => AggregateOps.seededSample(Tables.orders(s, dir)),
      None),

    QuerySpec(
      "q82_stratified_sample",
      (s, dir) => AggregateOps.stratifiedSampleCounts(Tables.lineitem(s, dir)),
      None),

    // sketch family completed: CMS heavy-hitter estimates (never
    // under-counts; ≤ eps·n over — CoreSpec) beside HLL (q17), GK
    // (q19), Bloom (q85)
    QuerySpec(
      "q86_cms_heavy_hitters",
      (s, dir) => AggregateOps.cmsHeavyHitters(Tables.orders(s, dir)),
      Some(q86OracleSql)),

    QuerySpec(
      "q21_corr_pairs",
      (s, dir) => AggregateOps.corrPairs(Tables.lineitem(s, dir)),
      Some("""SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             |       ROUND(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
             |       ROUND(corr(l_quantity, l_tax), 6) AS corr_qty_tax
             |FROM lineitem""".stripMargin)),

    QuerySpec(
      "q22_freq_topk",
      (s, dir) => AggregateOps.freqTopK(Tables.customer(s, dir), "c_mktsegment", 5),
      Some("""SELECT c_mktsegment, COUNT(*) AS n FROM customer
             |GROUP BY c_mktsegment
             |ORDER BY n DESC, c_mktsegment
             |LIMIT 5""".stripMargin)),

    // join-key skew diagnostic: per-key counts bucketed by exact
    // integer log2 (length(bin(cnt)) - 1 — no floating log), with the
    // global max/mean skew factor. The histogram you read before
    // deciding to salt a 100 TB join; run here on the order fact's
    // customer key.
    QuerySpec(
      "q137_key_skew",
      (s, dir) => AggregateOps.keySkewHistogram(Tables.orders(s, dir), "o_custkey"),
      Some("""WITH c AS (
             |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey),
             |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
             |             CAST(COUNT(*) AS BIGINT) AS total_keys,
             |             CAST(MAX(cnt) AS BIGINT) AS max_cnt FROM c),
             |h AS (SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS bucket,
             |             CAST(COUNT(*) AS BIGINT) AS n_keys,
             |             CAST(SUM(cnt) AS BIGINT) AS n_rows
             |      FROM c GROUP BY 1)
             |SELECT bucket, n_keys, n_rows,
             |       (CAST(n_rows AS DOUBLE) / total_rows) AS row_share,
             |       (CAST(max_cnt AS DOUBLE) * total_keys / total_rows) AS skew_factor
             |FROM h CROSS JOIN t ORDER BY bucket""".stripMargin)),

    // exact-arithmetic outlier report: the |x−μ|>2σ test decided by
    // the INTEGER inequality (n·c−s)² > 4(n·ss−s²) over cent-
    // quantized prices — no fp comparison anywhere near the 2σ edge;
    // μ/σ are display-only doubles cast from exact decimals.
    QuerySpec(
      "q162_z_outliers",
      (s, dir) => AggregateOps.zOutlierReport(Tables.lineitem(s, dir)),
      Some("""WITH cents AS (
             |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS HUGEINT) AS c
             |  FROM lineitem),
             |m AS (SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
             |             SUM(c) AS s, SUM(c * c) AS ss
             |      FROM cents GROUP BY 1),
             |o AS (SELECT cents.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_outliers
             |      FROM cents JOIN m USING (l_returnflag)
             |      WHERE (m.n * cents.c - m.s) * (m.n * cents.c - m.s)
             |            > (m.n * m.ss - m.s * m.s) * 4
             |      GROUP BY 1)
             |SELECT m.l_returnflag, CAST(m.n AS BIGINT) AS n_rows,
             |       (CAST(m.s AS DOUBLE) / (CAST(m.n AS DOUBLE) * 100)) AS mean_price,
             |       (sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE))
             |             / (CAST(m.n AS DOUBLE) * 100)) AS stddev_price,
             |       COALESCE(n_outliers, 0) AS n_outliers
             |FROM m LEFT JOIN o USING (l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // equi-width price histogram: integer floor-div bins, empty
    // interior bins restored from a sequence span.
    QuerySpec(
      "q217_price_histogram",
      (s, dir) => AggregateOps.priceHistogram(Tables.orders(s, dir)),
      Some("""WITH b AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 2500000 AS bin,
             |         CAST(COUNT(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1),
             |s AS (SELECT MIN(bin) AS lo, MAX(bin) AS hi, SUM(n) AS total FROM b),
             |g AS (SELECT unnest(range(lo, hi + 1)) AS bin, total FROM s)
             |SELECT g.bin, CAST((25000.0 * g.bin) AS DOUBLE) AS bin_lo_price,
             |       COALESCE(b.n, 0) AS n,
             |       (CAST(COALESCE(b.n, 0) AS DOUBLE) / g.total) AS share
             |FROM g LEFT JOIN b USING (bin)
             |ORDER BY bin""".stripMargin)),

    // k-anonymity / l-diversity audit over the quasi-identifier
    // classes — the pre-release privacy gate; one hash rollup.
    QuerySpec(
      "q213_k_anonymity",
      (s, dir) => AggregateOps.kAnonymityAudit(Tables.orders(s, dir)),
      Some("""SELECT o_orderpriority, o_orderstatus,
             |       CAST(month(o_orderdate) AS BIGINT) AS order_month,
             |       CAST(COUNT(*) AS BIGINT) AS class_size,
             |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS l_diversity,
             |       (COUNT(*) < 5 OR COUNT(DISTINCT o_custkey) < 3) AS at_risk
             |FROM orders GROUP BY 1, 2, 3
             |ORDER BY o_orderpriority, o_orderstatus, order_month""".stripMargin)),

    // t-closeness audit: per quasi-id class, L1 distance (integer
    // ppm) between the class's sensitive price-band distribution and
    // the global one; flags L1 > 2t — the distribution-skew leak the
    // q213 k/l gates cannot see.
    QuerySpec(
      "q252_t_closeness",
      (s, dir) => AggregateOps.tClosenessAudit(Tables.orders(s, dir)),
      Some("""WITH b AS (
             |  SELECT o_orderpriority, o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS band
             |  FROM orders),
             |g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS g_n FROM b GROUP BY 1),
             |gt AS (SELECT CAST(SUM(g_n) AS BIGINT) AS g_tot FROM g),
             |cl AS (SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS class_size
             |       FROM b GROUP BY 1, 2),
             |cb AS (SELECT o_orderpriority, o_orderstatus, band, CAST(COUNT(*) AS BIGINT) AS c_n
             |       FROM b GROUP BY 1, 2, 3),
             |f AS (SELECT cl.o_orderpriority, cl.o_orderstatus, cl.class_size, g.band, g.g_n,
             |             COALESCE(cb.c_n, 0) AS c_n
             |      FROM cl CROSS JOIN g
             |      LEFT JOIN cb ON cb.o_orderpriority = cl.o_orderpriority
             |                  AND cb.o_orderstatus = cl.o_orderstatus AND cb.band = g.band)
             |SELECT o_orderpriority, o_orderstatus,
             |       CAST(MIN(class_size) AS BIGINT) AS class_size,
             |       CAST(SUM(abs((c_n * 1000000) // class_size - (g_n * 1000000) // g_tot)) AS BIGINT) AS dist_l1_ppm,
             |       CAST(SUM(abs((c_n * 1000000) // class_size - (g_n * 1000000) // g_tot)) AS BIGINT) > 300000 AS at_risk
             |FROM f CROSS JOIN gt
             |GROUP BY 1, 2
             |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)),

    // RANDOMIZED-RESPONSE private release (q278, r15): the RELEASE
    // mechanism completing the privacy family — each doc reports its
    // true source with p = 0.9 and a uniform category draw otherwise
    // (local plausible deniability), the unbiased estimator recovers
    // the true histogram in exact integer ppm arithmetic. Both draws
    // are bit-exact XXH64 chains (the q175/q184 idioms), so the
    // oracle replays every per-row flip and the estimator.
    QuerySpec(
      "q278_randomized_response",
      (s, dir) => AggregateOps.randomizedResponseRelease(
        Tables.documents(s, dir)),
      Some {
        import Xxh64DocIdSql.{ctes, chainFrom, tos}
        s"""WITH $ctes,
           |${chainFrom("SELECT doc_id, CAST(doc_id * 1000003 + 1 AS HUGEINT) AS k FROM documents", "doc_id", "p")},
           |cats AS (SELECT source,
           |                CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS ci
           |         FROM (SELECT DISTINCT source FROM documents)),
           |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS kc FROM cats),
           |keepd AS (SELECT doc_id,
           |                 ((${tos("h8")} % 1000000) + 1000000) % 1000000 AS kd
           |          FROM s10),
           |pickd AS (SELECT doc_id, ((${tos("h8")} % kc) + kc) % kc AS pd
           |          FROM s10p CROSS JOIN kk),
           |obs AS (
           |  SELECT CASE WHEN keepd.kd < 900000 THEN d.source
           |              ELSE c2.source END AS source
           |  FROM documents d JOIN keepd USING (doc_id)
           |  JOIN pickd USING (doc_id) JOIN cats c2 ON c2.ci = pickd.pd),
           |oc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_obs
           |       FROM obs GROUP BY 1),
           |tc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_true
           |       FROM documents GROUP BY 1),
           |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
           |SELECT tc.source, n_true, COALESCE(n_obs, 0) AS n_obs,
           |       CAST(GREATEST(0, COALESCE(n_obs, 0) * kc * 1000000 - n * 100000)
           |            // (900000 * kc) AS BIGINT) AS n_est
           |FROM tc LEFT JOIN oc USING (source) CROSS JOIN nt CROSS JOIN kk
           |ORDER BY tc.source""".stripMargin
      }),

    // k-anonymization applier: the q213 audit ENFORCED — rows in
    // failing classes generalize level by level (drop month, then
    // status, then all) until their class passes both gates; the
    // terminal remainder releases as one suppressed class so row
    // counts reconcile exactly.
    QuerySpec(
      "q229_k_anonymize",
      (s, dir) => AggregateOps.kAnonymize(Tables.orders(s, dir)),
      Some("""WITH b AS (
             |  SELECT o_orderpriority AS pr, o_orderstatus AS st,
             |         CAST(month(o_orderdate) AS BIGINT) AS mo, o_custkey AS ck
             |  FROM orders),
             |c0 AS (SELECT pr, st, mo, COUNT(*) AS n, COUNT(DISTINCT ck) AS d
             |       FROM b GROUP BY 1, 2, 3),
             |rem0 AS (SELECT b.* FROM b JOIN c0 USING (pr, st, mo)
             |         WHERE NOT (c0.n >= 5 AND c0.d >= 3)),
             |c1 AS (SELECT pr, st, COUNT(*) AS n, COUNT(DISTINCT ck) AS d
             |       FROM rem0 GROUP BY 1, 2),
             |rem1 AS (SELECT rem0.* FROM rem0 JOIN c1 USING (pr, st)
             |         WHERE NOT (c1.n >= 5 AND c1.d >= 3)),
             |c2 AS (SELECT pr, COUNT(*) AS n, COUNT(DISTINCT ck) AS d
             |       FROM rem1 GROUP BY 1),
             |rem2 AS (SELECT rem1.* FROM rem1 JOIN c2 USING (pr)
             |         WHERE NOT (c2.n >= 5 AND c2.d >= 3)),
             |c3 AS (SELECT COUNT(*) AS n, COUNT(DISTINCT ck) AS d FROM rem2)
             |SELECT * FROM (
             |  SELECT CAST(0 AS BIGINT) AS level, pr AS o_orderpriority,
             |         st AS o_orderstatus, mo AS order_month,
             |         CAST(n AS BIGINT) AS n_rows, CAST(d AS BIGINT) AS n_custkeys
             |  FROM c0 WHERE n >= 5 AND d >= 3
             |  UNION ALL
             |  SELECT CAST(1 AS BIGINT), pr, st, CAST(NULL AS BIGINT),
             |         CAST(n AS BIGINT), CAST(d AS BIGINT)
             |  FROM c1 WHERE n >= 5 AND d >= 3
             |  UNION ALL
             |  SELECT CAST(2 AS BIGINT), pr, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
             |         CAST(n AS BIGINT), CAST(d AS BIGINT)
             |  FROM c2 WHERE n >= 5 AND d >= 3
             |  UNION ALL
             |  SELECT CAST(3 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             |         CAST(NULL AS BIGINT), CAST(n AS BIGINT), CAST(d AS BIGINT)
             |  FROM c3 WHERE n > 0)
             |ORDER BY level, o_orderpriority, o_orderstatus, order_month""".stripMargin)),

    // exact weighted lower median: smallest value whose running
    // weight reaches half the total (2·cumw >= W, pure integers);
    // tie blocks are safe because their last row carries the full
    // block weight under any intra-block order.
    QuerySpec(
      "q214_weighted_median",
      (s, dir) => AggregateOps.weightedMedian(Tables.lineitem(s, dir)),
      Some("""WITH cents AS (
             |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
             |         CAST(l_quantity AS BIGINT) AS wt
             |  FROM lineitem),
             |t AS (SELECT l_returnflag, CAST(SUM(wt) AS BIGINT) AS tw,
             |             CAST(COUNT(*) AS BIGINT) AS n_rows
             |      FROM cents GROUP BY 1),
             |r AS (SELECT cents.l_returnflag, c,
             |             SUM(wt) OVER (PARTITION BY cents.l_returnflag ORDER BY c
             |                           ROWS UNBOUNDED PRECEDING) AS cumw,
             |             t.tw, t.n_rows
             |      FROM cents JOIN t USING (l_returnflag))
             |SELECT l_returnflag, MIN(n_rows) AS n_rows,
             |       CAST(MIN(tw) AS BIGINT) AS total_weight,
             |       (CAST(MIN(c) AS DOUBLE) / 100) AS weighted_median_price
             |FROM r WHERE cumw * 2 >= tw
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // exact-order-statistic winsorized mean: p5/p95 bounds are the
    // k-th smallest cent values (k = (n−1)p/100 + 1 integer), the
    // clamped mean accumulates in DECIMAL — rank-k VALUES are
    // tie-order-invariant, so both engines agree bit-exactly.
    QuerySpec(
      "q165_winsorized_mean",
      (s, dir) => AggregateOps.winsorizedMean(Tables.lineitem(s, dir)),
      Some("""WITH cents AS (
             |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |r AS (SELECT l_returnflag, c,
             |             CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY c) AS BIGINT) AS rn
             |      FROM cents),
             |n AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM cents GROUP BY 1),
             |b AS (SELECT r.l_returnflag,
             |             MIN(CASE WHEN rn = ((n - 1) * 5) // 100 + 1 THEN c END) AS c_lo,
             |             MIN(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN c END) AS c_hi
             |      FROM r JOIN n USING (l_returnflag)
             |      WHERE rn = ((n - 1) * 5) // 100 + 1 OR rn = ((n - 1) * 95) // 100 + 1
             |      GROUP BY 1)
             |SELECT cents.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       (CAST(MIN(c_lo) AS DOUBLE) / 100) AS lo_price,
             |       (CAST(MIN(c_hi) AS DOUBLE) / 100) AS hi_price,
             |       (CAST(SUM(CAST(LEAST(GREATEST(c, c_lo), c_hi) AS HUGEINT)) AS DOUBLE)
             |             / (CAST(COUNT(*) AS DOUBLE) * 100)) AS winsorized_mean
             |FROM cents JOIN b USING (l_returnflag)
             |GROUP BY cents.l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // robust MAD outlier report: median and MAD are exact lower-order
    // statistics (value at rank (n+1) div 2 — tie-order-invariant),
    // the |c−med| > 3·MAD test is a pure integer comparison. The
    // heavy-tail-safe complement of q162's μ/σ gate.
    QuerySpec(
      "q167_mad_outliers",
      (s, dir) => AggregateOps.madOutlierReport(Tables.lineitem(s, dir)),
      Some("""WITH cents AS (
             |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |n AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM cents GROUP BY 1),
             |mr AS (SELECT cents.l_returnflag, c,
             |              CAST(row_number() OVER (PARTITION BY cents.l_returnflag ORDER BY c) AS BIGINT) AS rn,
             |              n.n
             |       FROM cents JOIN n USING (l_returnflag)),
             |med AS (SELECT l_returnflag, MIN(c) AS med FROM mr
             |        WHERE rn = (n + 1) // 2 GROUP BY 1),
             |dev AS (SELECT cents.l_returnflag, abs(c - med) AS d
             |        FROM cents JOIN med USING (l_returnflag)),
             |dr AS (SELECT dev.l_returnflag, d,
             |              CAST(row_number() OVER (PARTITION BY dev.l_returnflag ORDER BY d) AS BIGINT) AS rn,
             |              n.n
             |       FROM dev JOIN n USING (l_returnflag)),
             |mad AS (SELECT l_returnflag, MIN(d) AS mad FROM dr
             |        WHERE rn = (n + 1) // 2 GROUP BY 1),
             |o AS (SELECT dev.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_outliers
             |      FROM dev JOIN mad USING (l_returnflag)
             |      WHERE d > mad * 3 GROUP BY 1)
             |SELECT n.l_returnflag, n.n AS n_rows,
             |       (CAST(med AS DOUBLE) / 100) AS median_price,
             |       (CAST(mad AS DOUBLE) / 100) AS mad_price,
             |       COALESCE(n_outliers, 0) AS n_outliers
             |FROM n JOIN med USING (l_returnflag) JOIN mad USING (l_returnflag)
             |LEFT JOIN o USING (l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // sketch-bracketed EXACT order statistics: GK brackets the target
    // ranks, one refine pass ranks only the in-bracket sliver — the
    // answer is exact, so the oracle is plain rank selection (no
    // sketch replay); the 100 TB plan for the q165/q167 rank family.
    QuerySpec(
      "q194_bracketed_quantiles",
      (s, dir) => AggregateOps.bracketedOrderStats(Tables.lineitem(s, dir)),
      Some("""WITH cents AS (
             |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |n AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n FROM cents GROUP BY 1),
             |r AS (SELECT cents.l_returnflag, c,
             |             CAST(row_number() OVER (PARTITION BY cents.l_returnflag ORDER BY c) AS BIGINT) AS rn,
             |             n.n
             |      FROM cents JOIN n USING (l_returnflag)),
             |v AS (SELECT l_returnflag,
             |             MIN(CASE WHEN rn = (n + 1) // 2 THEN c END) AS c50,
             |             MIN(CASE WHEN rn = ((n - 1) * 95) // 100 + 1 THEN c END) AS c95
             |      FROM r GROUP BY 1)
             |SELECT n.l_returnflag, n.n AS n_rows,
             |       (CAST(c50 AS DOUBLE) / 100) AS median_price,
             |       (CAST(c95 AS DOUBLE) / 100) AS p95_price
             |FROM n JOIN v USING (l_returnflag)
             |ORDER BY l_returnflag""".stripMargin)),

    // mergeable HLL distinct sketches: per-(type, day) stored
    // partials, rollup = sketch UNION (register-max, lossless) —
    // COUNT(DISTINCT) as a maintainable MV; DataSketches estimates
    // have no DuckDB replay ⇒ rows-only + CoreSpec merge identity.
    QuerySpec(
      "q188_hll_mergeable",
      (s, dir) => AggregateOps.hllMergeableDistinct(Tables.events(s, dir)),
      None),

    // salting plan from the key histogram: hot keys get integer
    // ⌈cnt/target⌉ salt factors as DATA — only hot keys replicate in
    // the salted join, cold keys stay factor 1.
    QuerySpec(
      "q183_salt_plan",
      (s, dir) => AggregateOps.saltPlan(Tables.lineitem(s, dir)),
      Some("""SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey,
             |       CAST(COUNT(*) AS BIGINT) AS cnt,
             |       CAST((COUNT(*) + 499) // 500 AS BIGINT) AS salt_factor
             |FROM lineitem GROUP BY l_suppkey
             |HAVING (COUNT(*) + 499) // 500 > 1
             |ORDER BY l_suppkey""".stripMargin)),

    // two-sample KS distance of each source's length distribution
    // from the corpus: evaluated on the distinct-value grid, max
    // decided by exact integer cross-multiplication — the
    // distribution-drift gate for mixing weights.
    QuerySpec(
      "q179_ks_drift",
      (s, dir) => AggregateOps.ksPerSource(Tables.documents(s, dir)),
      Some("""WITH vals AS (
             |  SELECT source, CAST(length(text) AS BIGINT) AS v FROM documents),
             |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM vals GROUP BY source),
             |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
             |g AS (SELECT v, COUNT(*) AS c FROM vals GROUP BY v),
             |gc AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_g
             |       FROM g),
             |sv AS (SELECT source, v, COUNT(*) AS cs FROM vals GROUP BY source, v),
             |sc AS (SELECT ns.source, gc.v, ns.n_s, gc.cum_g,
             |              SUM(COALESCE(cs, 0)) OVER (PARTITION BY ns.source ORDER BY gc.v
             |                                         ROWS UNBOUNDED PRECEDING) AS cum_s
             |       FROM gc CROSS JOIN ns
             |       LEFT JOIN sv ON sv.source = ns.source AND sv.v = gc.v)
             |SELECT sc.source, sc.n_s AS n_source,
             |       CAST(MAX(abs(cum_s * n - cum_g * n_s)) AS BIGINT) AS ks_num,
             |       (CAST(MAX(abs(cum_s * n - cum_g * n_s)) AS DOUBLE)
             |             / (n_s * n)) AS ks
             |FROM sc CROSS JOIN nt
             |GROUP BY sc.source, sc.n_s, nt.n
             |ORDER BY source""".stripMargin)),

    // categorical total-variation drift per source vs corpus (the
    // discrete complement of q179's KS): exact integer Σ|o·N − g·n_s|
    // over the full sources × langs grid, zero cells included.
    QuerySpec(
      "q191_tv_drift",
      (s, dir) => AggregateOps.tvDriftPerSource(Tables.documents(s, dir)),
      Some("""WITH cells AS (
             |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
             |  FROM documents GROUP BY source, lang),
             |ns AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_s FROM cells GROUP BY source),
             |gl AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS g FROM cells GROUP BY lang),
             |nt AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM ns),
             |grid AS (SELECT ns.source, ns.n_s, gl.lang, gl.g,
             |                COALESCE(cells.o, 0) AS o
             |         FROM ns CROSS JOIN gl
             |         LEFT JOIN cells ON cells.source = ns.source AND cells.lang = gl.lang)
             |SELECT source, n_s AS n_source,
             |       CAST(SUM(abs(o * n - g * n_s)) AS BIGINT) AS tv_num,
             |       (CAST(SUM(abs(o * n - g * n_s)) AS DOUBLE)
             |             / (2.0 * n_s * n)) AS tv
             |FROM grid CROSS JOIN nt
             |GROUP BY source, n_s, n
             |ORDER BY source""".stripMargin)),

    // chi-square-style categorical association (feature-selection /
    // shortcut-leakage audit): integer-exact ppm scores over the full
    // grid — e = (r·c) DIV N, cell = ((o−e)²·10⁶) DIV (e+1) — the
    // chance-corrected companion of q191's marginal-drift view.
    QuerySpec(
      "q196_chi_square",
      (s, dir) => AggregateOps.chiSquareRelevance(Tables.documents(s, dir)),
      Some("""WITH c AS (
             |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
             |  FROM documents GROUP BY source, lang),
             |r AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM c GROUP BY source),
             |l AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS cc FROM c GROUP BY lang),
             |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM c),
             |g AS (SELECT r.source, l.lang, r.r, l.cc, COALESCE(c.o, 0) AS o
             |      FROM r CROSS JOIN l
             |      LEFT JOIN c ON c.source = r.source AND c.lang = l.lang),
             |s AS (SELECT source, lang, o, (r * cc) // nn AS e
             |      FROM g CROSS JOIN nn),
             |sc AS (SELECT source, lang, o, e,
             |              (CAST(o - e AS HUGEINT) * (o - e) * 1000000) // (e + 1) AS cell_ppm
             |       FROM s),
             |t AS (SELECT CAST(SUM(cell_ppm) AS BIGINT) AS chi2_ppm FROM sc)
             |SELECT source, lang, o AS n_docs, CAST(e AS BIGINT) AS expected,
             |       CAST(cell_ppm AS BIGINT) AS cell_ppm, chi2_ppm
             |FROM sc CROSS JOIN t
             |ORDER BY source, lang""".stripMargin)),

    // Benford first-digit audit: the digit comes off the cent-
    // quantized BIGINT's decimal string (never double formatting),
    // expected shares are shared INTEGER-PPM literals, and every
    // derived column is pure BIGINT arithmetic (truncating integer
    // division, subtraction, abs) — no ROUND over DOUBLE anywhere,
    // so the result replays bit-identically under any DuckDB build.
    QuerySpec(
      "q174_benford",
      (s, dir) => AggregateOps.benfordReport(Tables.orders(s, dir)),
      Some {
        val pList = AggregateOps.benfordPpm.mkString("[", ", ", "]")
        s"""WITH d AS (
           |  SELECT o_orderpriority,
           |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           |  FROM orders),
           |dg AS (SELECT o_orderpriority,
           |              CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |       FROM d WHERE cents >= 1),
           |c AS (SELECT o_orderpriority, digit, CAST(COUNT(*) AS BIGINT) AS n_obs
           |      FROM dg GROUP BY o_orderpriority, digit),
           |t AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_tot
           |      FROM dg GROUP BY o_orderpriority),
           |j AS (SELECT c.o_orderpriority, digit, n_obs, n_tot,
           |             CAST((n_obs * 1000000) // n_tot AS BIGINT) AS obs_share_ppm,
           |             CAST(list_extract($pList, CAST(digit AS INT)) AS BIGINT) AS benford_ppm
           |      FROM c JOIN t USING (o_orderpriority))
           |SELECT o_orderpriority, digit, n_obs, n_tot, obs_share_ppm, benford_ppm,
           |       CAST(abs(obs_share_ppm - benford_ppm) AS BIGINT) AS gap_ppm
           |FROM j
           |ORDER BY o_orderpriority, digit""".stripMargin
      }),

    QuerySpec(
      "q23_rollup",
      (s, dir) => AggregateOps.rollupAgg(Tables.lineitem(s, dir)),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       ${decSumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    QuerySpec(
      "q24_cube",
      (s, dir) => AggregateOps.cubeAgg(Tables.lineitem(s, dir)),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       ${decSumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
              |FROM lineitem
              |GROUP BY CUBE (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))
  )

  // ---------------------------------------------------------------- //
  // §2.7 scalar functions
  // ---------------------------------------------------------------- //
  private def scalars: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q25_date_parts",
      (s, dir) => ScalarOps.dateParts(Tables.orders(s, dir)),
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |       CAST(month(o_orderdate) AS BIGINT) AS o_month,
             |       COUNT(*) AS n_orders,
             |       MIN(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
             |       MIN(CAST(o_orderdate AS DATE)) AS first_date
             |FROM orders
             |GROUP BY o_year, o_month
             |ORDER BY o_year, o_month""".stripMargin)),

    QuerySpec(
      "q26_try_cast",
      (s, dir) => ScalarOps.tryCasts(Tables.orders(s, dir)),
      Some("""SELECT o_orderkey,
             |       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
             |       TRY_CAST(o_orderstatus AS DOUBLE) AS status_num
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    QuerySpec(
      "q27_audit_row",
      (s, dir) => ScalarOps.auditRow(s, Tables.orders(s, dir)),
      None),

    // audit metrics observed DURING the pass (no second count job);
    // the observed values must equal the oracle's direct aggregate
    QuerySpec(
      "q87_observe_metrics",
      (s, dir) => ScalarOps.observedStats(s, dir),
      Some(s"""SELECT COUNT(*) AS n_rows, ${decSumSql("o_totalprice")} AS total_price
              |FROM orders""".stripMargin)),

    // distributed id assignment: shuffle-free collision-free 64-bit
    // ids; the emitted invariants (count == distinct, min id 0) hold
    // at ANY parallelism, which is what the oracle states
    QuerySpec(
      "q88_distributed_ids",
      (s, dir) => ScalarOps.distributedIds(Tables.orders(s, dir)),
      Some("""SELECT COUNT(*) AS n_rows, COUNT(*) AS n_distinct_ids,
             |       CAST(0 AS BIGINT) AS min_id
             |FROM orders""".stripMargin)),

    // the Dataset[T] typed surface: compile-checked lambdas, oracle
    // proves semantics equal the declarative form
    QuerySpec(
      "q89_typed_dataset",
      (s, dir) => RelationalOps.typedPriorityCounts(Tables.orders(s, dir)),
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
             |FROM orders WHERE o_totalprice > 1000.0
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // grouped GK quantiles with the q19 rank-window-collapse trick
    // applied per group
    QuerySpec(
      "q90_grouped_quantiles",
      (s, dir) => ScalarOps.groupedQuantiles(Tables.orders(s, dir)),
      Some("""SELECT o_orderpriority,
             |       quantile_disc(o_totalprice, 0.5) AS p50,
             |       quantile_disc(o_totalprice, 0.9) AS p90
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // JSON EMIT direction: struct → to_json → from_json round trip;
    // the oracle reads the source columns directly, so any formatting
    // loss (doubles especially) hash-mismatches.
    QuerySpec(
      "q84_json_roundtrip",
      (s, dir) => ScalarOps.jsonRoundTrip(Tables.orders(s, dir)),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // two-decimal display values computed in pure BIGINT from exact
    // cents (round_half_up(cents/divD) = (2·cents + divD) // (2·divD))
    // — no ROUND over DOUBLE, bit-stable under any DuckDB build
    QuerySpec(
      "q60_display_format",
      (s, dir) => ScalarOps.displayFormat(Tables.orders(s, dir)),
      Some {
        def d2Total(divD: Long) = s"(2*ct + $divD) // ${2 * divD}"
        def d2Avg(divD: Long) = s"(2*ct + n*$divD) // (2*n*$divD)"
        def render(d2: String, suffix: String) =
          s"CAST(($d2) // 100 AS VARCHAR) || '.' || " +
            s"lpad(CAST(($d2) % 100 AS VARCHAR), 2, '0')$suffix"
        def fmt(c: String, d2: Long => String) =
          s"""CASE WHEN $c >= 1.0e12 THEN ${render(d2(1000000000000L), " || ' Trillion'")}
             |     WHEN $c >= 1.0e9  THEN ${render(d2(1000000000L), " || ' Billion'")}
             |     WHEN $c >= 1.0e6  THEN ${render(d2(1000000L), " || ' Million'")}
             |     WHEN $c >= 1.0e3  THEN ${render(d2(1000L), " || ' Thousand'")}
             |     ELSE ${render(d2(1L), "")} END""".stripMargin
        s"""WITH t AS (
           |  SELECT o_orderpriority,
           |         ${decSumSql("o_totalprice")} AS total_price,
           |         ${decAvgSql("o_totalprice")} AS avg_price,
           |         CAST(COUNT(*) AS BIGINT) AS n
           |  FROM orders GROUP BY o_orderpriority),
           |tc AS (SELECT *, CAST(round(total_price * 100) AS BIGINT) AS ct FROM t)
           |SELECT o_orderpriority, total_price,
           |       ${fmt("total_price", d2Total)} AS display_total,
           |       ${fmt("avg_price", d2Avg)} AS display_avg
           |FROM tc ORDER BY o_orderpriority""".stripMargin
      })
  )

  // ---------------------------------------------------------------- //
  // §2.8 window functions
  // ---------------------------------------------------------------- //
  private def windows: Seq[QuerySpec] = Seq(
    // percent_rank/cume_dist complete the ranking family beside
    // rank/row_number (q28) and ntile (q93)
    QuerySpec(
      "q100_distribution_position",
      (s, dir) => WindowOps.distributionPosition(Tables.orders(s, dir)),
      Some("""SELECT * FROM (
             |  SELECT o_orderpriority, o_orderkey,
             |         percent_rank() OVER w AS pr,
             |         cume_dist() OVER w AS cd,
             |         CAST(row_number() OVER w AS BIGINT) AS rn
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
             |) WHERE rn <= 20
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // time-RANGE frame (the kind ROWS frames can't express): per
    // event, count + exact-decimal sum of the same user's events in
    // the trailing 60 min of EVENT time; RANGE includes same-instant
    // peers on both engines.
    QuerySpec(
      "q163_trailing_time_agg",
      (s, dir) => WindowOps.trailingTimeAgg(Tables.events(s, dir)),
      Some("""SELECT user_id, event_id,
             |       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing,
             |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_trailing
             |FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    QuerySpec(
      "q28_window_rank",
      (s, dir) => WindowOps.topPerGroup(Tables.customer(s, dir), 3),
      Some("""SELECT * FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |         CAST(row_number() OVER w AS BIGINT) AS rn,
             |         CAST(rank() OVER w AS BIGINT) AS rnk
             |  FROM customer
             |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
             |) WHERE rn <= 3
             |ORDER BY c_mktsegment, rn""".stripMargin)),

    QuerySpec(
      "q29_window_running",
      (s, dir) => WindowOps.runningTotal(Tables.orders(s, dir)),
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
             |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
             |       CAST(row_number() OVER (PARTITION BY o_custkey
             |            ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
             |FROM orders WHERE o_custkey < 100
             |ORDER BY o_custkey, order_seq""".stripMargin)),

    QuerySpec(
      "q30_window_lag",
      (s, dir) => WindowOps.monthDelta(Tables.orders(s, dir)),
      Some(s"""WITH monthly AS (
              |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |         CAST(month(o_orderdate) AS BIGINT) AS o_month,
              |         ${decSumSql("o_totalprice")} AS total_price
              |  FROM orders GROUP BY o_year, o_month)
              |SELECT o_year, o_month, total_price,
              |       lag(total_price) OVER (ORDER BY o_year, o_month) AS prev_total,
              |       total_price - lag(total_price) OVER (ORDER BY o_year, o_month) AS delta
              |FROM monthly
              |ORDER BY o_year, o_month""".stripMargin)),

    // time-series densification: the (priority × month) rollup onto
    // the complete integer month grid with explicit zero rows, then a
    // 3-month centered moving average whose frame re-accumulates in
    // exact DECIMAL (sliding add-subtract double sums drift).
    QuerySpec(
      "q178_month_gap_fill",
      (s, dir) => TemporalOps.monthGapFill(Tables.orders(s, dir)),
      Some(s"""WITH base AS (
              |  SELECT o_orderpriority,
              |         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS mi,
              |         o_totalprice
              |  FROM orders),
              |monthly AS (SELECT o_orderpriority, mi, CAST(COUNT(*) AS BIGINT) AS n_orders,
              |                   ${decSumSql("o_totalprice")} AS total_price
              |            FROM base GROUP BY o_orderpriority, mi),
              |b AS (SELECT MIN(mi) AS lo, MAX(mi) AS hi FROM base),
              |grid AS (SELECT p.o_orderpriority, g.mi
              |         FROM (SELECT DISTINCT o_orderpriority FROM base) p
              |         CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS mi FROM b) g),
              |filled AS (SELECT grid.o_orderpriority, grid.mi,
              |                  CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
              |                  COALESCE(total_price, 0.0) AS total_price
              |           FROM grid LEFT JOIN monthly USING (o_orderpriority, mi)),
              |ma AS (SELECT *,
              |              (CAST(SUM(CAST(total_price AS DECIMAL(18,4))) OVER w AS DOUBLE)
              |                    / (COUNT(*) OVER w)) AS ma3
              |       FROM filled
              |       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY mi
              |                    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING))
              |SELECT o_orderpriority, CAST(mi // 12 AS BIGINT) AS o_year,
              |       CAST(mi % 12 + 1 AS BIGINT) AS o_month,
              |       n_orders, total_price, ma3
              |FROM ma ORDER BY o_orderpriority, o_year, o_month""".stripMargin))
  )

  // ---------------------------------------------------------------- //
  // §2.9 event-time windows (batch-equivalent forms; streaming
  // equivalence asserted in StreamingSpec) + JSON extraction
  // ---------------------------------------------------------------- //
  private def eventWindows: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q31_events_tumbling",
      (s, dir) => StreamOps.tumbling(Tables.events(s, dir)),
      Some(s"""SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
              |       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS win_end,
              |       event_type, COUNT(*) AS n_events,
              |       ${decSumSql("value")} AS sum_value
              |FROM events
              |GROUP BY win_start, win_end, event_type
              |ORDER BY win_start, event_type""".stripMargin)),

    QuerySpec(
      "q32_events_sliding",
      (s, dir) => StreamOps.sliding(Tables.events(s, dir)),
      Some(s"""WITH b AS (
              |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start, event_type, value
              |  FROM events
              |  UNION ALL
              |  SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type, value
              |  FROM events)
              |SELECT win_start, win_start + INTERVAL '10 minutes' AS win_end,
              |       event_type, COUNT(*) AS n_events,
              |       ${decSumSql("value")} AS sum_value
              |FROM b
              |GROUP BY win_start, event_type
              |ORDER BY win_start, event_type""".stripMargin)),

    QuerySpec(
      "q33_events_session",
      (s, dir) => StreamOps.sessions(Tables.events(s, dir)),
      Some(s"""WITH m AS (
              |  SELECT user_id, ts, value,
              |         CASE WHEN lag(ts) OVER w IS NULL
              |                   OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
              |              THEN 1 ELSE 0 END AS new_s
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |g AS (
              |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
              |                             ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM m)
              |SELECT MIN(ts) AS session_start,
              |       MAX(ts) + INTERVAL '5 minutes' AS session_end,
              |       user_id, COUNT(*) AS n_events,
              |       ${decSumSql("value")} AS sum_value
              |FROM g GROUP BY user_id, sid
              |ORDER BY user_id, session_start""".stripMargin)),

    // As-of join (custom temporal operator re-expressed as
    // union + keyed time window): each event picks up the user's most
    // recent order at or before the event time. DuckDB's native ASOF
    // JOIN is the oracle.
    QuerySpec(
      "q74_asof_join",
      (s, dir) => TemporalOps.asofLatestOrder(Tables.events(s, dir), Tables.orders(s, dir)),
      Some("""WITH od AS (
             |  SELECT o_custkey, o_orderdate,
             |         MAX(o_orderkey) AS o_orderkey,
             |         max_by(o_totalprice, o_orderkey) AS o_totalprice
             |  FROM orders GROUP BY o_custkey, o_orderdate)
             |SELECT e.event_id, e.user_id, e.value,
             |       o.o_orderkey AS asof_orderkey, o.o_totalprice AS asof_totalprice
             |FROM events e ASOF LEFT JOIN od o
             |  ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
             |ORDER BY e.event_id""".stripMargin)),

    // CONVERSATION PACKING manifest (q280, r15): gap-sessionize each
    // user's event stream (the q33 semantics, lag-expressed for
    // stable session ordinals), pack conversations in order into
    // fixed-length training sequences under the q105 packing law —
    // multi-turn training data from logs. Turns stay contiguous;
    // over-long conversations split visibly (start_seq < end_seq).
    QuerySpec(
      "q280_session_pack",
      (s, dir) => TemporalOps.sessionPackManifest(Tables.events(s, dir)),
      Some("""WITH m AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                   OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
             |                             ORDER BY ts, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m),
             |ps AS (
             |  SELECT user_id, CAST(sid AS BIGINT) AS session_id,
             |         CAST(COUNT(*) AS BIGINT) AS n_events,
             |         MIN(ts) AS t_start, MAX(ts) AS t_end
             |  FROM g GROUP BY user_id, sid),
             |pk AS (
             |  SELECT *, SUM(n_events) OVER (PARTITION BY user_id
             |                                ORDER BY session_id
             |                                ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM ps)
             |SELECT user_id, session_id, n_events, t_start, t_end,
             |       CAST((cum - n_events) // 64 AS BIGINT) AS start_seq,
             |       CAST((cum - 1) // 64 AS BIGINT) AS end_seq,
             |       CAST((cum - n_events) % 64 AS BIGINT) AS tok_offset
             |FROM pk ORDER BY user_id, session_id""".stripMargin)),

    // INCREMENTAL conversation packing (q281, r15): the mid-month
    // event slice folds into the STORED manifest — untouched users
    // pass through, only each touched user's LAST conversation can
    // change (pseudo-row-seeded sessionization), the packed mass
    // resumes from the stored offsets, stored events never re-scan.
    // The oracle is the FULL q280 rebuild over all events: the hash
    // match IS the incremental ≡ rebuild proof.
    QuerySpec(
      "q281_session_pack_incremental",
      (s, dir) => {
        import org.apache.spark.sql.functions.lit
        val ev = Tables.events(s, dir)
        val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
        TemporalOps.sessionPackIncremental(
          TemporalOps.sessionPackManifest(ev.filter(col("ts") < cutoff)),
          ev.filter(col("ts") >= cutoff))
      },
      Some("""WITH m AS (
             |  SELECT user_id, ts, event_id,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                   OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
             |              THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |g AS (
             |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id
             |                             ORDER BY ts, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM m),
             |ps AS (
             |  SELECT user_id, CAST(sid AS BIGINT) AS session_id,
             |         CAST(COUNT(*) AS BIGINT) AS n_events,
             |         MIN(ts) AS t_start, MAX(ts) AS t_end
             |  FROM g GROUP BY user_id, sid),
             |pk AS (
             |  SELECT *, SUM(n_events) OVER (PARTITION BY user_id
             |                                ORDER BY session_id
             |                                ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM ps)
             |SELECT user_id, session_id, n_events, t_start, t_end,
             |       CAST((cum - n_events) // 64 AS BIGINT) AS start_seq,
             |       CAST((cum - 1) // 64 AS BIGINT) AS end_seq,
             |       CAST((cum - n_events) % 64 AS BIGINT) AS tok_offset
             |FROM pk ORDER BY user_id, session_id""".stripMargin)),

    QuerySpec(
      "q34_json_extract",
      (s, dir) => ScalarOps.jsonExtract(Tables.events(s, dir)),
      Some("""SELECT event_id,
             |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_get,
             |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
             |FROM events
             |ORDER BY event_id""".stripMargin)),

    // linear multi-touch attribution: equal 10⁶ DIV n ppm shares over
    // the lookback touches, remainder to the last touch — credit per
    // purchase conserves to exactly one million ppm.
    QuerySpec(
      "q215_linear_attribution",
      (s, dir) => EventOps.linearAttribution(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
             |mkt AS (SELECT user_id, event_id AS touch_id, us AS touch_us,
             |               event_type AS touch_type
             |        FROM e WHERE event_type IN ('view', 'click')),
             |pur AS (SELECT user_id, event_id AS purchase_id, us AS p_us
             |        FROM e WHERE event_type = 'purchase'),
             |j AS (SELECT pur.user_id, purchase_id, touch_id, touch_type, touch_us
             |      FROM pur JOIN mkt ON pur.user_id = mkt.user_id
             |       AND touch_us < p_us AND touch_us >= p_us - 604800000000),
             |c AS (SELECT *,
             |             CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
             |             row_number() OVER (PARTITION BY purchase_id
             |                                ORDER BY touch_us DESC, touch_id DESC) AS rk
             |      FROM j)
             |SELECT user_id, purchase_id, touch_id, touch_type, n_touches,
             |       CASE WHEN rk = 1
             |            THEN 1000000 - (n_touches - 1) * (1000000 // n_touches)
             |            ELSE 1000000 // n_touches END AS share_ppm
             |FROM c ORDER BY purchase_id, touch_id""".stripMargin)),

    // per-type daily-volume OLS trend slope, evaluated entirely in
    // integers (n·Σxy − Σx·Σy over n·Σx² − (Σx)², ppm floor-div) —
    // "is this event type growing" with zero fp accumulation.
    QuerySpec(
      "q216_trend_slopes",
      (s, dir) => EventOps.trendSlopes(Tables.events(s, dir)),
      Some("""WITH daily AS (
             |  SELECT event_type,
             |         epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) // 86400000000 AS x,
             |         CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             |             SUM(CAST(x AS HUGEINT)) AS sx,
             |             SUM(CAST(y AS HUGEINT)) AS sy,
             |             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             |             SUM(CAST(x AS HUGEINT) * x) AS sxx
             |      FROM daily GROUP BY 1)
             |SELECT event_type, n_days, CAST(sy AS BIGINT) AS n_events,
             |       CAST((n_days * sxy - sx * sy) * 1000000
             |            // NULLIF(n_days * sxx - sx * sx, 0) AS BIGINT) AS slope_ppm
             |FROM a ORDER BY event_type""".stripMargin)),

    // watermark-setting lateness audit: per-event disorder vs the
    // strictly-earlier arrival max, computed with a SUB-SHARDED
    // running max (q148 pattern) — the oracle is the single global
    // ordered window, proving the parallel form exact.
    QuerySpec(
      "q225_lateness_audit",
      (s, dir) => EventOps.latenessAudit(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
             |r AS (SELECT event_type, us,
             |             MAX(us) OVER (ORDER BY event_id
             |                           ROWS BETWEEN UNBOUNDED PRECEDING
             |                           AND 1 PRECEDING) AS pm
             |      FROM e),
             |d AS (SELECT event_type,
             |             GREATEST(COALESCE(pm, us) - us, 0) AS disorder_us
             |      FROM r)
             |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(CASE WHEN disorder_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
             |       CAST(MAX(disorder_us) AS BIGINT) AS max_disorder_us
             |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // INCREMENTAL entity resolution: a modular key split plays the
    // stored dim (80%) vs the arriving batch (20%); the stored alias
    // table comes from the memoized closure, the batch resolves
    // against it via cross-block edges + star edges, and only touched
    // groups re-close. The oracle replays the stored closure, the
    // delta edge set (batch×stored + batch×batch — NEVER
    // stored×stored beyond the frozen star edges), and the combined
    // closure as recursive CTEs — proving the touched-groups-only
    // engine path equals the global recomputation.
    QuerySpec(
      "q226_incremental_entities",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val part = Tables.part(s, dir)
        val storedDim = part.filter(pmod(col("p_partkey"), lit(10)) < 8)
        val batch = part.filter(pmod(col("p_partkey"), lit(10)) >= 8)
        DedupOps.incrementalEntityGroups(
          DedupOps.entityGroupsFor(storedDim, tag = s"$dir:stored"),
          storedDim, batch)
      },
      Some("""WITH RECURSIVE
             |st AS (SELECT * FROM part WHERE p_partkey % 10 < 8),
             |ba AS (SELECT * FROM part WHERE p_partkey % 10 >= 8),
             |spr AS (SELECT a.p_partkey AS i, b.p_partkey AS j
             |        FROM st a JOIN st b
             |          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |        WHERE levenshtein(a.p_name, b.p_name) <= 2),
             |se AS (SELECT i AS src, j AS dst FROM spr UNION ALL SELECT j, i FROM spr),
             |sreach(node, lbl) AS (
             |  SELECT p_partkey, p_partkey FROM st
             |  UNION
             |  SELECT se.dst, r.lbl FROM sreach r JOIN se ON se.src = r.node),
             |scl AS (SELECT node AS pk, MIN(lbl) AS old_entity FROM sreach GROUP BY node),
             |dpr AS (SELECT LEAST(a.p_partkey, b.p_partkey) AS i,
             |               GREATEST(a.p_partkey, b.p_partkey) AS j
             |        FROM ba a JOIN st b ON a.p_brand = b.p_brand
             |        WHERE levenshtein(a.p_name, b.p_name) <= 2
             |        UNION
             |        SELECT a.p_partkey, b.p_partkey
             |        FROM ba a JOIN ba b
             |          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |        WHERE levenshtein(a.p_name, b.p_name) <= 2),
             |star AS (SELECT old_entity AS i, pk AS j FROM scl WHERE old_entity <> pk),
             |al AS (SELECT i, j FROM dpr UNION SELECT i, j FROM star),
             |e AS (SELECT i AS src, j AS dst FROM al UNION ALL SELECT j, i FROM al),
             |reach(node, lbl) AS (
             |  SELECT p_partkey, p_partkey FROM part
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS pk, MIN(lbl) AS entity_id FROM reach GROUP BY node),
             |agg AS (SELECT cl.entity_id,
             |               CAST(COUNT(*) AS BIGINT) AS n_members,
             |               CAST(COUNT(DISTINCT scl.old_entity) AS BIGINT) AS n_stored_groups,
             |               CAST(SUM(CASE WHEN scl.old_entity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |                 AS n_batch_members
             |        FROM cl LEFT JOIN scl USING (pk)
             |        GROUP BY cl.entity_id)
             |SELECT cl.pk AS p_partkey, cl.entity_id, agg.n_members,
             |       agg.n_stored_groups, agg.n_batch_members,
             |       CASE WHEN agg.n_stored_groups >= 2 THEN 'merged'
             |            WHEN agg.n_stored_groups = 0 THEN 'new'
             |            WHEN agg.n_batch_members > 0 THEN 'extended'
             |            ELSE 'unchanged' END AS group_status,
             |       cn.p_name AS canonical_name
             |FROM cl JOIN agg USING (entity_id)
             |JOIN part cn ON cn.p_partkey = cl.entity_id
             |ORDER BY p_partkey""".stripMargin)),

    // INCREMENTAL cluster-aware split: stored assignments FROZEN
    // (rerunning q227 after growth can silently move stored docs
    // between train and test when a new doc changes a cluster's min
    // id); batch docs adopt the stored cluster's split through
    // condensed closure over df-capped cross + batch edges, new
    // components hash fresh, and bridges between differently-split
    // stored clusters flag `conflict` instead of reshuffling history.
    QuerySpec(
      "q231_incremental_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val storedAssign = DedupOps.clusterSplitFor(
          docs.filter(col("doc_id") < 400), tag = s"$dir:storedSplit")
        val pairs = SketchShared.dfCappedJaccardPairs(s, dir)
        DedupOps.incrementalClusterSplit(
          storedAssign,
          pairs.filter(col("doc_i") < 400 && col("doc_j") >= 400),
          pairs.filter(col("doc_i") >= 400),
          docs.filter(col("doc_id") >= 400).select(col("doc_id")))
      },
      Some(q231OracleSql)),

    // water-filling token-budget allocation: exact integer water
    // level over per-source demand — sources under the level keep
    // full demand, the rest are leveled, remainder tokens dealt to
    // the next ranks; Σ alloc = min(B, Σ demand) exactly.
    QuerySpec(
      "q228_token_waterfill",
      (s, dir) => CorpusOps.tokenWaterFill(Tables.documents(s, dir)),
      Some(s"""WITH $waterFillCtes
              |SELECT source, n_docs, demand, alloc_tokens,
              |       (alloc_tokens = demand) AS filled
              |FROM a ORDER BY source""".stripMargin)),

    // budget-gated admission: the q228 allocation ENFORCED in ingest
    // order — per source, docs admit while the running token count
    // stays within the source's water-fill allocation (whole docs
    // only). One per-source cumsum window + a dim-sized join.
    QuerySpec(
      "q230_budget_admission",
      (s, dir) => CorpusOps.budgetAdmission(Tables.documents(s, dir)),
      Some(s"""WITH $waterFillCtes,
              |pd AS (SELECT doc_id, source,
              |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_toks
              |       FROM documents),
              |cm AS (SELECT doc_id, source, n_toks,
              |         CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
              |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
              |       FROM pd)
              |SELECT cm.doc_id, cm.source, cm.n_toks, cm.cum_tokens,
              |       (cm.cum_tokens <= a.alloc_tokens) AS admitted
              |FROM cm JOIN a USING (source)
              |ORDER BY cm.doc_id""".stripMargin)),

    // data-constrained epoch schedule: when the training budget
    // EXCEEDS the corpus (B = 4× token mass), how many times each
    // source repeats — temperature target (q124's ⌊√tokens⌋ weights)
    // capped at 4 full epochs (the published diminishing-returns
    // bound for repeated data) + an exact integer tail. The ⌊B·w/W⌋
    // decomposition keeps every product under 2⁶³ at 100 TB masses;
    // mult=4 sits on the upweight=1 boundary, so the oracle exercises
    // capped and uncapped sources at every SF.
    QuerySpec(
      "q293_epoch_schedule",
      (s, dir) => CorpusOps.epochSchedule(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochScheduleCtes
              |SELECT source, n_docs, n_tokens, w_sqrt, target_tokens,
              |       full_epochs,
              |       CAST(realized_tokens - full_epochs * n_tokens AS BIGINT)
              |         AS tail_tokens,
              |       realized_tokens, capped
              |FROM sch ORDER BY source""".stripMargin)),

    // the q293 schedule ENFORCED at document granularity (the q230
    // admission pattern lifted to epochs): full epochs admit every
    // doc; the partial epoch admits in ingest order while the
    // per-source cumsum stays within the tail — whole docs only, so
    // per-source realized mass ≤ the schedule's by construction, and
    // `epoch` is the loader's repeat index.
    QuerySpec(
      "q294_epoch_admission",
      (s, dir) => CorpusOps.epochAdmission(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochAdmissionCtes
              |SELECT doc_id, source, epoch, n_toks, cum_tokens, admitted
              |FROM adm ORDER BY doc_id, epoch""".stripMargin)),

    // the loader-facing composition: admitted (doc, epoch) pairs →
    // the actual training order. Epoch folds into the key domain
    // (xxhash64(doc_id·8 + epoch), injective at epochs ≤ 5) so each
    // pass is an independent deterministic permutation replayable
    // through the same bit-exact XXH64 chain as q141; shard/pos is
    // the no-global-sort permutation shape.
    QuerySpec(
      "q295_epoch_order",
      (s, dir) => CorpusOps.epochTrainingOrder(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(q295OracleSql)),

    // the capstone the q293→q294→q295 chain feeds: the admitted
    // (doc, epoch) pairs concatenate IN SHUFFLE ORDER and cut into
    // 2048-token sequences per shard — each repeat of a document maps
    // to its own sequence span at its own epoch-shuffled position,
    // the fixed-length batches a multi-epoch run actually reads.
    QuerySpec(
      "q297_epoch_pack",
      (s, dir) => CorpusOps.epochPack(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochPackCtes
              |SELECT shard, pos, doc_id, epoch, n_toks, start_seq, end_seq,
              |       tok_offset,
              |       CAST(end_seq - start_seq + 1 AS BIGINT) AS n_seqs
              |FROM pk2 ORDER BY shard, pos""".stripMargin)),

    // resume-from-step manifest: a data-parallel run maps rank r to
    // shard r and global step s to sequence s of EVERY shard, so
    // "resume at step 2" consumes sequences 0..1 everywhere. The
    // manifest is the q297 spans still intersecting the un-consumed
    // region, with the doc-granular restart state: consumed/remaining
    // tokens and the first sequence each span feeds on restart.
    // Conservation vs the dropped spans is pinned in CoreSpec.
    QuerySpec(
      "q298_loader_resume",
      (s, dir) => CorpusOps.loaderResume(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochPackCtes
              |SELECT shard, pos, doc_id, epoch, n_toks, start_seq, end_seq,
              |       CAST(GREATEST(start_seq, 2) AS BIGINT) AS resume_seq,
              |       CAST(GREATEST(0, 4096 - (cum - n_toks)) AS BIGINT) AS consumed_toks,
              |       CAST(n_toks - GREATEST(0, 4096 - (cum - n_toks)) AS BIGINT) AS remaining_toks
              |FROM pk2 WHERE end_seq >= 2 ORDER BY shard, pos""".stripMargin)),

    // shuffle-quality audit: per shard, observed adjacent same-source
    // pairs + longest same-source run vs the EXACT expected adjacency
    // rate under a uniform permutation of the shard's multiset
    // (Σ n_s(n_s−1) / (n(n−1)), integer ppm via the overflow-safe
    // decomposition); `clustered` fires when observed > 2× expected —
    // the degenerate-shuffle alarm.
    QuerySpec(
      "q299_shuffle_quality",
      (s, dir) => CorpusOps.shuffleQualityAudit(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochOrderSrcCtes,
              |mk AS (SELECT shard, pos, source,
              |         lag(source) OVER (PARTITION BY shard ORDER BY pos) AS prev_src
              |       FROM ords),
              |mk2 AS (SELECT shard, pos, source,
              |          CASE WHEN prev_src = source THEN 1 ELSE 0 END AS same,
              |          CASE WHEN prev_src IS NULL OR prev_src <> source THEN 1 ELSE 0 END AS chg
              |        FROM mk),
              |mk3 AS (SELECT shard, source, same,
              |          SUM(chg) OVER (PARTITION BY shard ORDER BY pos
              |            ROWS UNBOUNDED PRECEDING) AS run_id
              |        FROM mk2),
              |adj AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
              |          CAST(SUM(same) AS BIGINT) AS same_pairs
              |        FROM mk3 GROUP BY shard),
              |rn AS (SELECT shard, CAST(MAX(run_len) AS BIGINT) AS max_run FROM
              |         (SELECT shard, run_id, COUNT(*) AS run_len
              |          FROM mk3 GROUP BY 1, 2) GROUP BY shard),
              |sc AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_sources,
              |          CAST(SUM(n_s * (n_s - 1)) AS BIGINT) AS s2 FROM
              |         (SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS n_s
              |          FROM mk3 GROUP BY 1, 2) GROUP BY shard)
              |SELECT adj.shard, n_rows, n_sources, same_pairs, max_run,
              |       CAST(CASE WHEN n_rows > 1
              |         THEN (same_pairs * 1000000) // (n_rows - 1) ELSE 0 END
              |         AS BIGINT) AS obs_ppm,
              |       CAST(CASE WHEN n_rows > 1
              |         THEN (s2 // (n_rows * (n_rows - 1))) * 1000000
              |            + ((s2 % (n_rows * (n_rows - 1))) * 1000000) // (n_rows * (n_rows - 1))
              |         ELSE 0 END AS BIGINT) AS exp_ppm,
              |       (obs_ppm > 2 * exp_ppm) AS clustered
              |FROM adj JOIN rn USING (shard) JOIN sc USING (shard)
              |ORDER BY adj.shard""".stripMargin)),

    // inter-epoch spacing audit: per repeated doc, the step (global
    // sequence index) of each occurrence and the minimum step gap
    // between consecutive occurrences; `too_close` = two repeats of
    // the SAME doc begin inside the same global step (the same
    // data-parallel batch sees it twice) — the pathology the
    // epoch-folded shuffle key is supposed to make rare.
    QuerySpec(
      "q300_epoch_spacing",
      (s, dir) => CorpusOps.epochSpacing(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochPackCtes,
              |g AS (SELECT doc_id, start_seq,
              |        start_seq - lag(start_seq) OVER (PARTITION BY doc_id
              |          ORDER BY start_seq, shard, epoch) AS gap
              |      FROM pk2),
              |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_reps,
              |        CAST(MIN(start_seq) AS BIGINT) AS first_step,
              |        CAST(MAX(start_seq) AS BIGINT) AS last_step,
              |        CAST(MIN(gap) AS BIGINT) AS min_gap
              |      FROM g GROUP BY doc_id)
              |SELECT doc_id, n_reps, first_step, last_step, min_gap,
              |       (min_gap < 1) AS too_close
              |FROM a WHERE n_reps >= 2 ORDER BY doc_id""".stripMargin)),

    // quality-annealed order: full epochs keep the q295 hash shuffle,
    // the partial (tail) epoch moves to the END of every shard sorted
    // by ASCENDING quality — the run finishes on its highest-quality
    // data (the published end-of-training annealing recipe). The
    // quality double is the exact-reproducible q93 expression tree,
    // so the oracle replays the full order bit-exactly.
    QuerySpec(
      "q301_anneal_order",
      (s, dir) => CorpusOps.annealOrder(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(q301OracleSql)),

    // pack-efficiency report: per shard, sequences/spans, spans per
    // sequence, boundary-cut counts, ragged-tail fill and overall
    // utilization ppm — the numbers that justify sequence packing
    // over pad-to-max batching (interior padding is zero by
    // construction; fill < 10^6 comes only from the tail).
    QuerySpec(
      "q302_pack_efficiency",
      (s, dir) => CorpusOps.packEfficiency(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochPackCtes
              |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_spans,
              |       CAST(MAX(end_seq) + 1 AS BIGINT) AS n_seqs,
              |       CAST(SUM(n_toks) AS BIGINT) AS shard_toks,
              |       CAST(SUM(CASE WHEN end_seq - start_seq + 1 >= 2
              |         THEN 1 ELSE 0 END) AS BIGINT) AS split_spans,
              |       CAST(SUM(end_seq - start_seq) AS BIGINT) AS n_cuts,
              |       CAST(SUM(n_toks) - MAX(end_seq) * 2048 AS BIGINT) AS tail_fill,
              |       CAST((COUNT(*) * 1000000) // (MAX(end_seq) + 1) AS BIGINT)
              |         AS spans_per_seq_ppm,
              |       CAST((SUM(n_toks) * 1000000) // ((MAX(end_seq) + 1) * 2048)
              |         AS BIGINT) AS fill_ppm
              |FROM pk2 GROUP BY shard ORDER BY shard""".stripMargin)),

    // incremental-rebuild planner: corpus delta (docs with
    // doc_id % 37 == 0 removed) → per shard, the first position where
    // the v1 and v2 span streams disagree and the number of REUSABLE
    // full sequences (the identical prefix pins the running mass).
    // A later re-sync of the streams does NOT count — reuse stops at
    // the first dirty span.
    QuerySpec(
      "q303_pack_invalidation",
      (s, dir) => CorpusOps.packInvalidation(
        Tables.documents(s, dir),
        Tables.documents(s, dir).filter(expr("doc_id % 37 != 0")),
        budgetMult = 4L),
      Some(q303OracleSql)),

    // per-step batch-mixture audit: in the data-parallel reading,
    // step s trains on sequence s of EVERY shard; per step — spans
    // and distinct docs touched, token mass, the dominant source's
    // share (integer ppm) and a skew flag past 50% — the batch-level
    // mixing check q299's shard-level audit cannot see.
    QuerySpec(
      "q304_batch_mixture",
      (s, dir) => CorpusOps.batchMixture(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochPackCtes,
              |ex AS (SELECT p.shard, p.doc_id, d.source, p.n_toks, p.cum, e.step
              |       FROM pk2 p JOIN documents d ON p.doc_id = d.doc_id,
              |            UNNEST(generate_series(p.start_seq, p.end_seq)) AS e(step)),
              |ct AS (SELECT step, source, doc_id,
              |         CAST(LEAST(cum, (step + 1) * 2048)
              |            - GREATEST(cum - n_toks, step * 2048) AS BIGINT) AS toks
              |       FROM ex),
              |bs AS (SELECT step, source, CAST(SUM(toks) AS BIGINT) AS src_toks
              |       FROM ct GROUP BY 1, 2),
              |tp AS (SELECT step, source AS top_source, src_toks AS top_toks,
              |         row_number() OVER (PARTITION BY step
              |           ORDER BY src_toks DESC, source DESC) AS rn,
              |         SUM(src_toks) OVER (PARTITION BY step) AS step_toks_u
              |       FROM bs),
              |sp AS (SELECT step, CAST(COUNT(*) AS BIGINT) AS n_spans,
              |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
              |       FROM ct GROUP BY step)
              |SELECT sp.step, n_spans, n_docs,
              |       CAST(step_toks_u AS BIGINT) AS step_toks, top_source,
              |       CAST((top_toks * 1000000) // step_toks_u AS BIGINT) AS top_share_ppm,
              |       ((top_toks * 1000000) // step_toks_u > 500000) AS skewed
              |FROM sp JOIN tp USING (step) WHERE rn = 1
              |ORDER BY sp.step""".stripMargin)),

    // the q297 packing law over the q301 anneal permutation: the
    // run's fixed-length batches themselves end on the
    // quality-ascending tail — every span carries is_anneal, and the
    // anneal spans occupy each shard's final sequences.
    QuerySpec(
      "q309_anneal_pack",
      (s, dir) => CorpusOps.annealPack(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(q309OracleSql)),

    // training-order reproducibility commitment: per shard, Σh and
    // Σh·pos over the admitted stream in exact DECIMAL(38,0) — the
    // cheap cross-run handshake (commitments equal ⇒ packs identical;
    // mismatch ⇒ run the q303 first-dirty diff).
    QuerySpec(
      "q307_order_commitment",
      (s, dir) => CorpusOps.orderCommitment(Tables.documents(s, dir),
        budgetMult = 4L),
      Some(s"""WITH $epochOrderCtes
              |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              |       CAST(SUM(CAST(shuffle_key AS HUGEINT)) AS VARCHAR)
              |         AS member_commit,
              |       CAST(SUM(CAST(shuffle_key AS HUGEINT) * pos) AS VARCHAR)
              |         AS order_commit
              |FROM ord GROUP BY shard ORDER BY shard""".stripMargin)),

    // ANALYZE-style table profile: per column — row/null/distinct
    // counts plus canonically-rendered min/max (doubles round-trip
    // through DECIMAL(38,6) so both engines print identical digits) —
    // one scan, exact NDV; the stats pass a cost-based planner or
    // data catalog runs per table refresh.
    QuerySpec(
      "q305_table_profile",
      (s, dir) => AggregateOps.tableProfile(Tables.lineitem(s, dir)),
      Some(q305OracleSql)),

    // referential-integrity audit: every FK edge of the star schema
    // (null-excluded anti-join counts) and every PK (rows − distinct
    // keys), one row per constraint with an ok flag — the DQ pass a
    // warehouse runs per load.
    QuerySpec(
      "q306_referential_audit",
      (s, dir) => RelationalOps.referentialAudit(
        Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
        Tables.supplier(s, dir), Tables.part(s, dir), Tables.nation(s, dir),
        Tables.region(s, dir)),
      Some(q306OracleSql)),

    // mixture-realization audit — the monitoring leg of the epoch
    // family: realized (admitted-epoch) token share vs the
    // temperature target share, both exact integer ppm, drift flag
    // at |drift| > 50000 ppm. Caps make drift intentional (a capped
    // source under-realizes and the surplus dilutes over the rest);
    // the audit prices exactly that. Streaming twin:
    // StreamOps.streamingMixMonitor.
    QuerySpec(
      "q296_mix_realization",
      (s, dir) => CorpusOps.mixRealization(Tables.documents(s, dir)),
      Some(s"""WITH $epochAdmissionCtes,
              |realz AS (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS realized_tokens
              |          FROM adm WHERE admitted GROUP BY 1),
              |tw AS (SELECT w.source, w.n_tokens, w.w_sqrt,
              |         CAST(COALESCE(realz.realized_tokens, 0) AS BIGINT) AS realized_tokens
              |       FROM w LEFT JOIN realz USING (source)),
              |tt AS (SELECT CAST(SUM(w_sqrt) AS BIGINT) AS tot_w,
              |              CAST(SUM(realized_tokens) AS BIGINT) AS tot_realized FROM tw),
              |pp AS (SELECT source, n_tokens, realized_tokens,
              |         CAST((w_sqrt * 1000000) // tot_w AS BIGINT) AS target_share_ppm,
              |         CAST(CASE WHEN tot_realized > 0
              |           THEN (realized_tokens * 1000000) // tot_realized
              |           ELSE 0 END AS BIGINT) AS realized_share_ppm
              |       FROM tw CROSS JOIN tt)
              |SELECT source, n_tokens, realized_tokens, target_share_ppm,
              |       realized_share_ppm,
              |       CAST(realized_share_ppm - target_share_ppm AS BIGINT) AS drift_ppm,
              |       (ABS(realized_share_ppm - target_share_ppm) > 50000) AS drifted
              |FROM pp ORDER BY source""".stripMargin)),

    // leakage-safe split: near-dup clusters (the q61 demonstrator
    // closure) assign train/val/test as a UNIT via
    // xxhash64(cluster_id) — preventing at assignment time the
    // cross-split duplicate leakage q122/q218 detect; `moved` counts
    // the docs cluster-pinning relocated vs their own doc-hash
    // split. Oracle: the recursive closure + TWO bit-exact XXH64
    // avalanche chains (cluster key and doc key).
    QuerySpec(
      "q227_cluster_split",
      (s, dir) => DedupOps.clusterAwareSplitFromClusters(
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some(q227OracleSql)),

    // the certified end-to-end chain: cluster-aware split (q227) →
    // split-isolated packing (q234) → cross-split audit (q122
    // machinery) over the COMPOSED output — cluster leakage is zero
    // by construction (and the matrix proves it on the shipped
    // artifact), residual gram-level contamination is reported
    // honestly. One oracle replays all three stages.
    QuerySpec(
      "q236_leakage_safe_pipeline",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        CorpusOps.leakageSafePipelineReport(docs,
          DedupOps.clusterAwareSplitFromClusters(
            DedupOps.clustersFor(docs, tag = dir)))
      },
      Some(q236OracleSql)),

    // watermark advice: exact p50/p95/p99 per-event disorder per type
    // — the number withWatermark should be SET to, from data. The
    // oracle's disorder comes from one global ordered window (proving
    // the sub-sharded engine path again) and the same integer rank
    // algebra (100·cum ≥ N·n).
    QuerySpec(
      "q233_watermark_advice",
      (s, dir) => EventOps.watermarkAdvice(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
             |r AS (SELECT event_type, us,
             |             MAX(us) OVER (ORDER BY event_id
             |                           ROWS BETWEEN UNBOUNDED PRECEDING
             |                           AND 1 PRECEDING) AS pm
             |      FROM e),
             |d AS (SELECT event_type,
             |             GREATEST(COALESCE(pm, us) - us, 0) AS dus
             |      FROM r),
             |vc AS (SELECT event_type, dus, CAST(COUNT(*) AS BIGINT) AS c
             |       FROM d GROUP BY 1, 2),
             |cm AS (SELECT event_type, dus, c,
             |              CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY dus
             |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |              CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
             |       FROM vc),
             |agg AS (SELECT event_type, MIN(n) AS n_events,
             |          CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN dus END) AS BIGINT) AS p50_disorder_us,
             |          CAST(MIN(CASE WHEN cum * 100 >= 95 * n THEN dus END) AS BIGINT) AS p95_disorder_us,
             |          CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN dus END) AS BIGINT) AS p99_disorder_us,
             |          CAST(MAX(dus) AS BIGINT) AS max_disorder_us
             |        FROM cm GROUP BY event_type)
             |SELECT agg.event_type, agg.n_events, agg.p50_disorder_us,
             |       agg.p95_disorder_us, agg.p99_disorder_us, agg.max_disorder_us,
             |       CAST((cm.cum * 1000000) // cm.n AS BIGINT) AS covered_ppm
             |FROM agg JOIN cm ON agg.event_type = cm.event_type
             |                AND agg.p99_disorder_us = cm.dus
             |ORDER BY agg.event_type""".stripMargin)),

    // Theil–Sen robust trend: exact lower median of all pairwise
    // daily slopes, sign·(|Δy|·10⁶ DIV Δx) so truncation direction
    // agrees across engines; pair frame is C(days,2) per type.
    QuerySpec(
      "q219_theil_sen",
      (s, dir) => EventOps.theilSenSlopes(Tables.events(s, dir)),
      Some("""WITH daily AS (
             |  SELECT event_type,
             |         epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) // 86400000000 AS x,
             |         CAST(COUNT(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |p AS (SELECT a.event_type,
             |             CASE WHEN b.y - a.y >= 0
             |                  THEN ((b.y - a.y) * 1000000) // (b.x - a.x)
             |                  ELSE -(((a.y - b.y) * 1000000) // (b.x - a.x)) END AS s_ppm
             |      FROM daily a JOIN daily b
             |        ON a.event_type = b.event_type AND a.x < b.x),
             |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs
             |      FROM p GROUP BY 1),
             |r AS (SELECT p.event_type, s_ppm,
             |             CAST(row_number() OVER (PARTITION BY p.event_type
             |                                     ORDER BY s_ppm) AS BIGINT) AS rn,
             |             n.n_pairs
             |      FROM p JOIN n USING (event_type))
             |SELECT event_type, n_pairs, CAST(s_ppm AS BIGINT) AS theilsen_ppm
             |FROM r WHERE rn = (n_pairs + 1) // 2
             |ORDER BY event_type""".stripMargin)),

    // daily volume spike detector: today vs the trailing-7-day mean
    // as pure integer cross-multiplication (n·days > 2·Σtrailing) —
    // the pipeline-monitoring rollup; cold-start days unflagged.
    QuerySpec(
      "q211_daily_spikes",
      (s, dir) => EventOps.dailySpikes(Tables.events(s, dir)),
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, d, n,
             |             CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trailing_n,
             |             CAST(COUNT(n) OVER w AS BIGINT) AS trailing_days
             |      FROM daily
             |      WINDOW w AS (PARTITION BY event_type ORDER BY d
             |                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, d, n, trailing_n, trailing_days,
             |       trailing_days > 0 AND n * trailing_days > trailing_n * 2 AS spike
             |FROM t ORDER BY event_type, d""".stripMargin)),

    // first-order next-event transition matrix: adjacent pairs off
    // the shared (user, ts, event_id) sort, |types|²-row totals join,
    // floor-divided ppm probabilities — the user-journey Markov table.
    QuerySpec(
      "q199_event_transitions",
      (s, dir) => EventOps.eventTransitions(Tables.events(s, dir)),
      Some("""WITH p AS (
             |  SELECT user_id, event_type,
             |         lead(event_type) OVER (PARTITION BY user_id
             |                                ORDER BY ts, event_id) AS next_type
             |  FROM events),
             |c AS (SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
             |      FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
             |      FROM c GROUP BY 1)
             |SELECT c.event_type, c.next_type, c.n_transitions, t.n_from,
             |       (c.n_transitions * 1000000) // t.n_from AS p_ppm
             |FROM c JOIN t USING (event_type)
             |ORDER BY event_type, next_type""".stripMargin)),

    // USER-LEVEL takedown (q284, r16 — VERDICT r15 missing #2):
    // "delete user X" across every event-derived store the doc/vector
    // takedown family never reaches. User-partitioned stores (the
    // q280 conversation manifest, q161 sessions, q172 attribution)
    // purge by anti-join — per-user independence makes the purge THE
    // rebuild; user-decomposable aggregates (q146 funnel stages, q147
    // retention cells + cohort sizes, q199 transition matrix)
    // DECREMENT by the removed users' own contributions. The oracle
    // recomputes every section from events and events-minus-users, so
    // a hash match proves store freshness AND decrement ≡ rebuild.
    QuerySpec(
      "q284_user_takedown",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val ev = Tables.events(s, dir)
        EventOps.userTakedown(
          ev,
          ev.filter(pmod(col("user_id"), lit(13)) === 5).select(col("user_id")),
          TemporalOps.sessionPackManifest(ev),
          EventOps.sessionize(ev),
          EventOps.funnel(ev),
          EventOps.retentionCohorts(ev),
          EventOps.eventTransitions(ev),
          EventOps.lastTouchAttribution(ev))
      },
      Some(q284OracleSql)),

    // AGE-BASED RETENTION SWEEP (q286, r16): the TIME-keyed complement
    // to q284 — a data-retention policy expires every event older than
    // the horizon and corrects the event-derived stores by what their
    // order-sensitivity allows: untouched users VERBATIM; session
    // ordinals / packing offsets / funnel reach / cohort assignment
    // RE-DERIVED from touched users' kept events (cohort migration
    // can create cells the store never had); the transition matrix
    // purely DECREMENTED (expiry is a strict per-user prefix, so
    // corrected = stored − within-expired − one boundary edge per
    // user). Conservation identities ride as clean flags. The oracle
    // recomputes every section from events-at-or-after-cutoff, so a
    // hash match proves the classification ≡ a full rebuild.
    QuerySpec(
      "q286_retention_sweep",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        EventOps.retentionSweep(
          ev, "2024-01-05 00:00:00",
          TemporalOps.sessionPackManifest(ev),
          EventOps.sessionize(ev),
          EventOps.funnel(ev),
          EventOps.retentionCohorts(ev),
          EventOps.eventTransitions(ev),
          EventOps.lastTouchAttribution(ev))
      },
      Some(q286OracleSql)),

    // USER-LEVEL QUARANTINE ROUND-TRIP (q290, r17 — VERDICT r16
    // missing #3): q287's soft-delete/restore certification for the
    // q284 event-store family. The quarantine retains ONLY the
    // removed users' raw events; every derived store hard-purges
    // (anti-join) or decrements (the q284 corrections); restore
    // re-derives the partitioned stores from the quarantined events
    // through the engine's own builders and re-increments the
    // aggregates by the identical d-frames — merge ≡ the q284
    // decrement run backwards. Clean = restored ≡ original by
    // order-insensitive Σxxhash64 multiset commitment; the oracle
    // recomputes every section's before/purged masses from events
    // and events-minus-users and pins restored = before with clean
    // TRUE, so a hash match proves the round trip loses nothing.
    QuerySpec(
      "q290_user_quarantine_roundtrip",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val ev = Tables.events(s, dir)
        EventOps.userQuarantineRoundTrip(
          ev,
          ev.filter(pmod(col("user_id"), lit(13)) === 5).select(col("user_id")),
          TemporalOps.sessionPackManifest(ev),
          EventOps.sessionize(ev),
          EventOps.funnel(ev),
          EventOps.retentionCohorts(ev),
          EventOps.eventTransitions(ev),
          EventOps.lastTouchAttribution(ev))
      },
      Some(q290OracleSql)),

    // ordered conversion funnel view→click→purchase: stage k counts
    // only events at or after the user's stage-k−1 conversion; the
    // oracle replays the identical chained-window prefix flags
    // (ROWS frames, (ts, event_id) tiebreak).
    QuerySpec(
      "q146_event_funnel",
      (s, dir) => EventOps.funnel(Tables.events(s, dir)),
      Some("""WITH f AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w AS s1
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
             |f2 AS (
             |  SELECT *, MAX(CASE WHEN event_type = 'click' AND s1 = 1 THEN 1 ELSE 0 END) OVER w AS s2
             |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
             |f3 AS (
             |  SELECT *, MAX(CASE WHEN event_type = 'purchase' AND s2 = 1 THEN 1 ELSE 0 END) OVER w AS s3
             |  FROM f2 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
             |pu AS (SELECT user_id, MAX(s1) AS r1, MAX(s2) AS r2, MAX(s3) AS r3 FROM f3 GROUP BY user_id),
             |one AS (SELECT CAST(COUNT(*) AS BIGINT) AS total, CAST(SUM(r1) AS BIGINT) AS n1,
             |               CAST(SUM(r2) AS BIGINT) AS n2, CAST(SUM(r3) AS BIGINT) AS n3 FROM pu),
             |st AS (SELECT 1 AS stage_idx, 'view' AS stage, n1 AS n_users, total AS prev, total FROM one
             |       UNION ALL
             |       SELECT 2, 'click', n2, n1, total FROM one
             |       UNION ALL
             |       SELECT 3, 'purchase', n3, n2, total FROM one)
             |SELECT CAST(stage_idx AS BIGINT) AS stage_idx, stage, n_users,
             |       (CAST(n_users AS DOUBLE) / total) AS frac_of_total,
             |       (CAST(n_users AS DOUBLE) / NULLIF(prev, 0)) AS frac_of_prev
             |FROM st ORDER BY stage_idx""".stripMargin)),

    // weekly retention cohorts: cohort = ISO week of first event,
    // retained-at-offset-k = any event in cohort week + k; integer
    // week arithmetic, one BIGINT÷BIGINT per output row.
    QuerySpec(
      "q147_retention_cohorts",
      (s, dir) => EventOps.retentionCohorts(Tables.events(s, dir)),
      Some("""WITH fs AS (
             |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
             |  FROM events GROUP BY user_id),
             |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
             |j AS (SELECT a.user_id, f.cohort_week,
             |             CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT) AS week_offset
             |      FROM act a JOIN fs f USING (user_id)),
             |sz AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM fs GROUP BY cohort_week),
             |g AS (SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active
             |      FROM j GROUP BY cohort_week, week_offset)
             |SELECT g.cohort_week, g.week_offset, g.n_active,
             |       (CAST(n_active AS DOUBLE) / cohort_size) AS retention
             |FROM g JOIN sz USING (cohort_week)
             |ORDER BY cohort_week, week_offset""".stripMargin)),

    // gaps-and-islands sessionization: per-user session ids from
    // 30-minute inactivity gaps, exact integer microsecond
    // durations; the session-ID complement of q33's session-WINDOW
    // aggregate (this one keeps the assignment joinable).
    QuerySpec(
      "q161_sessionize",
      (s, dir) => EventOps.sessionize(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us FROM events),
             |f AS (SELECT *, lag(ts_us) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM e),
             |g AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
             |                     THEN 1 ELSE 0 END AS new_sess FROM f),
             |h AS (SELECT *, SUM(new_sess) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS UNBOUNDED PRECEDING) AS session_id FROM g)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |       CAST(COUNT(*) AS BIGINT) AS n_events,
             |       MIN(ts) AS session_start, MAX(ts) AS session_end,
             |       CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
             |FROM h GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // SCD2 state history: consecutive same-state runs compress into
    // versioned half-open validity intervals (valid_to = next run's
    // valid_from, NULL ⇒ current) — the CDC/warehouse dimension
    // build; run detection and versioning share one per-user sort.
    QuerySpec(
      "q166_scd2_history",
      (s, dir) => EventOps.scd2History(Tables.events(s, dir)),
      Some("""WITH runs AS (
             |  SELECT user_id, event_id, ts, event_type,
             |         CASE WHEN lag(event_type) OVER w IS NULL
             |                OR lag(event_type) OVER w <> event_type
             |              THEN 1 ELSE 0 END AS chg
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |ver AS (
             |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS version
             |  FROM runs),
             |hist AS (
             |  SELECT user_id, version, event_type,
             |         CAST(COUNT(*) AS BIGINT) AS n_events,
             |         MIN(ts) AS valid_from, MAX(ts) AS last_seen
             |  FROM ver GROUP BY user_id, version, event_type)
             |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             |       n_events, valid_from,
             |       lead(valid_from) OVER wv AS valid_to, last_seen,
             |       CAST(lead(valid_from) OVER wv IS NULL AS BIGINT) AS is_current
             |FROM hist
             |WINDOW wv AS (PARTITION BY user_id ORDER BY version)
             |ORDER BY user_id, version""".stripMargin)),

    // last-touch attribution: each purchase credits the user's most
    // recent PRIOR view/click via last(_, ignoreNulls) over a
    // strictly-preceding frame — no event×event self-join; unattri-
    // buted purchases surface as NULLs.
    QuerySpec(
      "q172_last_touch",
      (s, dir) => EventOps.lastTouchAttribution(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS ts_us
             |  FROM events),
             |a AS (SELECT user_id, event_id, ts, event_type, ts_us,
             |        last_value(CASE WHEN event_type IN ('view', 'click')
             |                        THEN event_id END IGNORE NULLS) OVER w AS attr_event_id,
             |        last_value(CASE WHEN event_type IN ('view', 'click')
             |                        THEN event_type END IGNORE NULLS) OVER w AS attr_type,
             |        last_value(CASE WHEN event_type IN ('view', 'click')
             |                        THEN ts_us END IGNORE NULLS) OVER w AS attr_us
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT user_id, event_id AS purchase_id, ts, attr_event_id, attr_type,
             |       CAST(ts_us - attr_us AS BIGINT) AS gap_us
             |FROM a WHERE event_type = 'purchase'
             |ORDER BY purchase_id""".stripMargin)),

    // attribution-window sensitivity: the last-touch gaps rolled up
    // against a literal window ladder — one gap computation, each
    // window a predicate; integer µs comparisons.
    QuerySpec(
      "q192_attribution_windows",
      (s, dir) => EventOps.attributionWindows(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS ts_us
             |  FROM events),
             |a AS (SELECT user_id, event_id, event_type, ts_us,
             |        last_value(CASE WHEN event_type IN ('view', 'click')
             |                        THEN ts_us END IGNORE NULLS) OVER w AS attr_us
             |      FROM e
             |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |p AS (SELECT event_id AS purchase_id,
             |             CAST(ts_us - attr_us AS BIGINT) AS gap_us
             |      FROM a WHERE event_type = 'purchase'),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases FROM p),
             |w AS (SELECT unnest([300000000, 1800000000, 3600000000, 86400000000])
             |        AS window_us)
             |SELECT CAST(window_us AS BIGINT) AS window_us, n_purchases,
             |       CAST(COUNT(CASE WHEN gap_us IS NOT NULL AND gap_us <= window_us
             |                       THEN 1 END) AS BIGINT) AS n_credited,
             |       (CAST(COUNT(CASE WHEN gap_us IS NOT NULL AND gap_us <= window_us
             |                             THEN 1 END) AS DOUBLE) / n_purchases)
             |         AS credit_rate
             |FROM p CROSS JOIN w CROSS JOIN t
             |GROUP BY window_us, n_purchases
             |ORDER BY window_us""".stripMargin)),

    // DAU + trailing-7-day distinct actives per day: the rolling
    // distinct is an explode-to-covered-days + keyed distinct rollup
    // (linear in activity×7), never a per-row frame re-scan.
    QuerySpec(
      "q182_rolling_actives",
      (s, dir) => EventOps.rollingActiveUsers(Tables.events(s, dir)),
      Some("""WITH active AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
             |dau AS (SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
             |        FROM active GROUP BY d),
             |cov AS (SELECT d + CAST(off AS INT) AS day, user_id
             |        FROM active CROSS JOIN (SELECT unnest(range(0, 7)) AS off)),
             |wau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
             |        FROM cov GROUP BY day)
             |SELECT d, dau, wau7 FROM dau JOIN wau ON wau.day = dau.d
             |ORDER BY d""".stripMargin)),

    // union-of-intervals activity coverage: running-max interval
    // merge (handles nesting a lag compare misses), per-user merged
    // count + exact covered microseconds.
    QuerySpec(
      "q176_interval_coverage",
      (s, dir) => EventOps.intervalCoverage(Tables.events(s, dir)),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS start_us,
             |         epoch_us(ts) + 300000000 AS end_us
             |  FROM events),
             |m AS (SELECT *, MAX(end_us) OVER (PARTITION BY user_id
             |        ORDER BY start_us, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
             |      FROM e),
             |g AS (SELECT *, CASE WHEN prev_max IS NULL OR start_us > prev_max
             |                     THEN 1 ELSE 0 END AS new_island FROM m),
             |i AS (SELECT *, SUM(new_island) OVER (PARTITION BY user_id
             |        ORDER BY start_us, event_id ROWS UNBOUNDED PRECEDING) AS island
             |      FROM g),
             |s AS (SELECT user_id, island, MIN(start_us) AS s, MAX(end_us) AS e
             |      FROM i GROUP BY user_id, island)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
             |       CAST(SUM(e - s) AS BIGINT) AS covered_us,
             |       CAST(MIN(s) AS BIGINT) AS first_start_us,
             |       CAST(MAX(e) AS BIGINT) AS last_end_us
             |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin))
  )

  // ---------------------------------------------------------------- //
  // north-star: text analysis over `documents`
  // ---------------------------------------------------------------- //
  /** Per-doc quality-score subquery shared by the q37/q91/q93/q110/
    * q243 oracles — the hash-match is sensitive to the exact FP
    * association order of the component sum, so the formula exists
    * ONCE here, mirroring `TextOps.qualityScore` term for term.
    * Emits (doc_id, n_chars, n_tokens, n_punct, n_stop, quality).
    * Parameterized on the source relation so the q243 rebuild oracle
    * can score the stored ∪ batch union with the same text. */
  private def qualityPerDocSqlOver(rel: String): String =
    s"""SELECT doc_id, n_chars, n_tokens, n_punct, n_stop,
      |       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
      |           + (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 10.0, 1.0)) * 0.3
      |           + least(CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) * 5.0, 1.0) * 0.3 AS quality
      |FROM (
      |  SELECT doc_id,
      |         CAST(length(text) AS BIGINT) AS n_chars,
      |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens,
      |         CAST(length(regexp_replace(text, '[A-Za-z0-9_ ]', '', 'g')) AS BIGINT) AS n_punct,
      |         CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a)\\b')) AS BIGINT) AS n_stop
      |  FROM $rel)""".stripMargin

  private val qualityPerDocSql: String = qualityPerDocSqlOver("documents")

  private def textQueries: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q35_text_stats",
      (s, dir) => TextOps.textStats(Tables.documents(s, dir)),
      Some("""SELECT doc_id,
             |       CAST(length(text) AS BIGINT) AS n_chars,
             |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens,
             |       CAST(length(regexp_replace(text, '[^A-Za-z0-9_]', '', 'g')) AS BIGINT) AS n_alnum,
             |       CASE WHEN n_tokens > 0 THEN CAST(n_alnum AS DOUBLE) / n_tokens ELSE 0.0 END AS avg_token_len,
             |       CASE WHEN n_chars > 0
             |            THEN CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / n_chars
             |            ELSE 0.0 END AS space_ratio
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "q36_lang_id",
      (s, dir) => TextOps.langId(Tables.documents(s, dir)),
      Some("""SELECT doc_id,
             |       CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS BIGINT) AS n_en,
             |       CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein)\b')) AS BIGINT) AS n_de,
             |       CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|un)\b')) AS BIGINT) AS n_fr,
             |       CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|una)\b')) AS BIGINT) AS n_es,
             |       CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
             |            WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
             |            WHEN n_fr >= n_es THEN 'fr'
             |            ELSE 'es' END AS lang_guess
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // Metadata-vs-content audit: declared lang × classifier guess
    // contingency table with per-declared-language shares — one scan,
    // the share window runs over the langs×langs matrix frame.
    QuerySpec(
      "q132_lang_agreement",
      (s, dir) => TextOps.langAgreementMatrix(Tables.documents(s, dir)),
      Some("""WITH sig AS (
             |  SELECT lang,
             |         CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS BIGINT) AS n_en,
             |         CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein)\b')) AS BIGINT) AS n_de,
             |         CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|un)\b')) AS BIGINT) AS n_fr,
             |         CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|una)\b')) AS BIGINT) AS n_es
             |  FROM documents),
             |g AS (SELECT lang,
             |             CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
             |                  WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
             |                  WHEN n_fr >= n_es THEN 'fr'
             |                  ELSE 'es' END AS lang_guess
             |      FROM sig)
             |SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       (CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY lang)) AS lang_frac
             |FROM g GROUP BY lang, lang_guess
             |ORDER BY lang, lang_guess""".stripMargin)),

    // Chance-corrected rater agreement: Cohen's kappa per source
    // between declared lang and the classifier guess — fully rational
    // ((D·N − S)/(N² − S) as truncating ppm; both engines truncate
    // toward zero), degenerate marginals (pe = 1) are NULL.
    QuerySpec(
      "q254_rater_kappa",
      (s, dir) => TextOps.raterKappa(Tables.documents(s, dir)),
      Some("""WITH sig AS (
             |  SELECT source, lang,
             |         CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS BIGINT) AS n_en,
             |         CAST(len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein)\b')) AS BIGINT) AS n_de,
             |         CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|un)\b')) AS BIGINT) AS n_fr,
             |         CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|una)\b')) AS BIGINT) AS n_es
             |  FROM documents),
             |g AS (SELECT source, lang,
             |             CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
             |                  WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
             |                  WHEN n_fr >= n_es THEN 'fr'
             |                  ELSE 'es' END AS lang_guess
             |      FROM sig),
             |cells AS (SELECT source, lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
             |          FROM g GROUP BY source, lang, lang_guess),
             |nn AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs FROM cells GROUP BY source),
             |dd AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_agree
             |       FROM cells WHERE lang = lang_guess GROUP BY source),
             |rm AS (SELECT source, lang, CAST(SUM(n) AS BIGINT) AS rk FROM cells GROUP BY source, lang),
             |cm AS (SELECT source, lang_guess AS lang, CAST(SUM(n) AS BIGINT) AS ck
             |       FROM cells GROUP BY source, lang_guess),
             |ss AS (SELECT COALESCE(rm.source, cm.source) AS source,
             |              CAST(SUM(COALESCE(rk, 0) * COALESCE(ck, 0)) AS BIGINT) AS s_marg
             |       FROM rm FULL JOIN cm ON rm.source = cm.source AND rm.lang = cm.lang
             |       GROUP BY 1)
             |SELECT nn.source, n_docs, COALESCE(n_agree, 0) AS n_agree, s_marg,
             |       CASE WHEN n_docs * n_docs = s_marg THEN CAST(NULL AS BIGINT)
             |            ELSE CAST((COALESCE(n_agree, 0) * n_docs - s_marg) * 1000000
             |                      // (n_docs * n_docs - s_marg) AS BIGINT) END AS kappa_ppm
             |FROM nn LEFT JOIN dd USING (source) JOIN ss USING (source)
             |ORDER BY source""".stripMargin)),

    QuerySpec(
      "q37_quality_score",
      (s, dir) => TextOps.qualityScore(Tables.documents(s, dir)),
      Some(s"""SELECT doc_id, n_tokens, n_punct, n_stop, quality
             |FROM ($qualityPerDocSql)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "q38_doc_fingerprint",
      (s, dir) => TextOps.fingerprints(Tables.documents(s, dir)),
      Some("""SELECT doc_id, md5(text) AS fp_md5, CAST(length(text) AS BIGINT) AS n_chars
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // The rolling fingerprint IS oracle-expressible (new in r7): the
    // fold h = h*31 + byte over UTF-8 bytes is reproduced in DuckDB by
    // hex-decoding the payload and list_reduce-ing in HUGEINT mod 2^64
    // (wrap-around semantics), then converting to signed BIGINT.
    QuerySpec(
      "q39_rolling_hash",
      (s, dir) => TextOps.rollingFingerprints(Tables.documents(s, dir)),
      Some(s"""WITH b AS (
              |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
              |  FROM documents
              |),
              |byt AS (
              |  SELECT doc_id, $hexBytesSql AS bytes FROM b
              |),
              |h AS (
              |  SELECT doc_id,
              |    list_reduce(list_prepend(CAST(0 AS HUGEINT), bytes),
              |      (acc, x) -> (acc*31 + x) % CAST(18446744073709551616 AS HUGEINT)) AS uh
              |  FROM byt
              |)
              |SELECT doc_id, $toSignedSql AS fp_rolling
              |FROM h ORDER BY doc_id""".stripMargin)),

    // PII scrub over a deterministically PII-injected corpus (the
    // synthetic docs contain no emails/numbers, which would make the
    // check vacuous): both engines append the same synthetic contact
    // string, then redact it.
    QuerySpec(
      "q71_pii_scrub",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, concat, lit}
        TextOps.piiScrub(Tables.documents(s, dir)
          .withColumn("text", concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@example.com id 123456789"))))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com id 123456789' AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'), '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+')) AS BIGINT) AS n_numbers,
             |  md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'), '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUMBER>', 'g')) AS clean_fp
             |FROM d ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "q72_repetition_signals",
      (s, dir) => TextOps.repetitionSignals(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks,
             |         string_split(text, '. ') AS sentences
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(toks) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             |  (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS distinct_ratio,
             |  (CAST(list_max(list_transform(list_distinct(toks), x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks)) AS top_tok_share,
             |  (CAST(len(sentences) - len(list_distinct(sentences)) AS DOUBLE) / GREATEST(len(sentences), 1)) AS dup_sentence_frac
             |FROM t WHERE len(toks) > 0 ORDER BY doc_id""".stripMargin)),

    // Published-rule repetition gate: the q72 signals composed into a
    // first-failing-rule verdict; comparisons on the rounded signals
    // so both engines gate bit-identical inputs. Token-less docs are
    // restored by a left join (n_tokens 0, NULL signals, 'too_short')
    // so gate accounting never loses the most droppable docs.
    QuerySpec(
      "q114_repetition_filter",
      (s, dir) => TextOps.repetitionRuleFilter(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks,
             |         string_split(text, '. ') AS sentences
             |  FROM documents),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_tokens,
             |    (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS distinct_ratio,
             |    (CAST(list_max(list_transform(list_distinct(toks), x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks)) AS top_tok_share,
             |    (CAST(len(sentences) - len(list_distinct(sentences)) AS DOUBLE) / GREATEST(len(sentences), 1)) AS dup_sentence_frac
             |  FROM t WHERE len(toks) > 0),
             |v AS (
             |  SELECT d.doc_id,
             |         CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
             |         s.distinct_ratio, s.top_tok_share, s.dup_sentence_frac,
             |         CASE WHEN COALESCE(s.n_tokens, 0) < 5 THEN 'too_short'
             |              WHEN s.dup_sentence_frac > 0.30 THEN 'dup_sentences'
             |              WHEN s.top_tok_share > 0.20 THEN 'top_token'
             |              WHEN s.distinct_ratio < 0.30 THEN 'low_diversity'
             |              ELSE 'keep' END AS verdict
             |  FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id)
             |SELECT doc_id, n_tokens, distinct_ratio, top_tok_share, dup_sentence_frac,
             |       verdict, verdict = 'keep' AS kept
             |FROM v ORDER BY doc_id""".stripMargin)),

    // quality-rule ablation: every q114 rule evaluated independently —
    // n_fail / n_solo / n_first per rule exposes shadowed and
    // redundant rules the first-failing verdict chain hides.
    QuerySpec(
      "q202_rule_ablation",
      (s, dir) => TextOps.ruleAblationReport(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks,
             |         string_split(text, '. ') AS sentences
             |  FROM documents),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_tokens,
             |    (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS distinct_ratio,
             |    (CAST(list_max(list_transform(list_distinct(toks), x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks)) AS top_tok_share,
             |    (CAST(len(sentences) - len(list_distinct(sentences)) AS DOUBLE) / GREATEST(len(sentences), 1)) AS dup_sentence_frac
             |  FROM t WHERE len(toks) > 0),
             |v AS (
             |  SELECT d.doc_id,
             |         CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
             |         COALESCE(s.n_tokens, 0) < 5 AS f_short,
             |         COALESCE(s.dup_sentence_frac > 0.30, FALSE) AS f_dup,
             |         COALESCE(s.top_tok_share > 0.20, FALSE) AS f_top,
             |         COALESCE(s.distinct_ratio < 0.30, FALSE) AS f_div,
             |         CASE WHEN COALESCE(s.n_tokens, 0) < 5 THEN 'too_short'
             |              WHEN s.dup_sentence_frac > 0.30 THEN 'dup_sentences'
             |              WHEN s.top_tok_share > 0.20 THEN 'top_token'
             |              WHEN s.distinct_ratio < 0.30 THEN 'low_diversity'
             |              ELSE 'keep' END AS verdict
             |  FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id),
             |w AS (SELECT *, CAST(f_short AS INT) + CAST(f_dup AS INT)
             |               + CAST(f_top AS INT) + CAST(f_div AS INT) AS n_fails
             |      FROM v),
             |m AS (
             |  SELECT doc_id, n_tokens, verdict, n_fails, 'too_short' AS rule, f_short AS fails FROM w
             |  UNION ALL
             |  SELECT doc_id, n_tokens, verdict, n_fails, 'dup_sentences', f_dup FROM w
             |  UNION ALL
             |  SELECT doc_id, n_tokens, verdict, n_fails, 'top_token', f_top FROM w
             |  UNION ALL
             |  SELECT doc_id, n_tokens, verdict, n_fails, 'low_diversity', f_div FROM w)
             |SELECT rule,
             |  CAST(SUM(CASE WHEN fails THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
             |  CAST(SUM(CASE WHEN fails AND n_fails = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_solo,
             |  CAST(SUM(CASE WHEN verdict = rule THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
             |  CAST(SUM(CASE WHEN fails THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_fail
             |FROM m GROUP BY rule ORDER BY rule""".stripMargin)),

    // CCNet-style statistical quality: corpus-trained bigram MLE,
    // probabilities floor-quantized to integer ppb, per-doc mean a
    // pure-BIGINT sum + truncating div — outlier/glitch docs score low
    QuerySpec(
      "q120_ngram_lm_score",
      (s, dir) => TextOps.ngramLmScore(Tables.documents(s, dir)),
      Some(s"""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
             |        FROM t WHERE len(toks) >= 2)),
             |b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM o GROUP BY 1, 2),
             |u AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM o GROUP BY 1),
             |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz
             |      FROM (SELECT w1 AS w FROM o UNION SELECT w2 FROM o)),
             |pr AS (SELECT b.w1, b.w2,
             |              CAST(floor(CAST(c2 + 1 AS DOUBLE) / (c1 + vsz) * 1000000000.0) AS BIGINT) AS p_ppb
             |       FROM b JOIN u USING (w1) CROSS JOIN v)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |       CAST(CAST(SUM(p_ppb) AS BIGINT) // COUNT(*) AS BIGINT) AS lm_score_ppb
             |FROM o JOIN pr USING (w1, w2)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // q120's production form: the bigram model trains on a REFERENCE
    // slice and scores every doc against it (the actual CCNet
    // design); unseen bigrams back off through zero counts, and
    // n_seen/seen_frac report reference coverage (domain shift).
    QuerySpec(
      "q135_cross_lm_score",
      (s, dir) => TextOps.crossLmScore(Tables.documents(s, dir)),
      Some(s"""WITH t AS (
             |  SELECT doc_id, source, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
             |  FROM documents),
             |o AS (
             |  SELECT doc_id, source, toks[i] AS w1, toks[i + 1] AS w2
             |  FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks))) AS i
             |        FROM t WHERE len(toks) >= 2)),
             |r AS (SELECT w1, w2 FROM o WHERE source = 'src0'),
             |b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM r GROUP BY 1, 2),
             |u AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM r GROUP BY 1),
             |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz
             |      FROM (SELECT w1 AS w FROM r UNION SELECT w2 FROM r)),
             |sc AS (
             |  SELECT o.doc_id, b.c2,
             |         CAST(floor(CAST(COALESCE(b.c2, 0) + 1 AS DOUBLE) / (COALESCE(u.c1, 0) + vsz)
             |                    * 1000000000.0) AS BIGINT) AS p_ppb
             |  FROM o LEFT JOIN b USING (w1, w2) LEFT JOIN u USING (w1) CROSS JOIN v)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |       CAST(SUM(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
             |       CAST(CAST(SUM(p_ppb) AS BIGINT) // COUNT(*) AS BIGINT) AS xlm_score_ppb,
             |       CAST(SUM(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS seen_frac
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // DSIR-style importance resampling: target-LM / pool-LM weight in
    // capped integer ppm, acceptance by the bit-exact XXH64 chain the
    // q94/q227 oracles replay — one hash match certifies both model
    // fits, the weight arithmetic, and every accept/reject draw.
    QuerySpec(
      "q251_importance_resample",
      (s, dir) => TextOps.importanceResample(Tables.documents(s, dir)),
      Some {
        import Xxh64DocIdSql.{ctes, tos}
        s"""WITH $ctes,
           |t0 AS (
           |  SELECT doc_id, source, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
           |  FROM documents),
           |o AS (
           |  SELECT doc_id, source, toks[i] AS w1, toks[i + 1] AS w2
           |  FROM (SELECT doc_id, source, toks, unnest(range(1, len(toks))) AS i
           |        FROM t0 WHERE len(toks) >= 2)),
           |tr AS (SELECT w1, w2 FROM o WHERE source = 'src0'),
           |tb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS tc2 FROM tr GROUP BY 1, 2),
           |tu AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS tc1 FROM tr GROUP BY 1),
           |tv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
           |       FROM (SELECT w1 AS w FROM tr UNION SELECT w2 FROM tr)),
           |pb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pc2 FROM o GROUP BY 1, 2),
           |pu AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS pc1 FROM o GROUP BY 1),
           |pv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
           |       FROM (SELECT w1 AS w FROM o UNION SELECT w2 FROM o)),
           |pr AS (
           |  SELECT pb.w1, pb.w2,
           |         CAST(floor(CAST(COALESCE(tb.tc2, 0) + 1 AS DOUBLE)
           |                    / (COALESCE(tu.tc1, 0) + tv.v) * 1000000000.0) AS BIGINT) AS t_ppb,
           |         CAST(floor(CAST(pb.pc2 + 1 AS DOUBLE)
           |                    / (pu.pc1 + pv.v) * 1000000000.0) AS BIGINT) AS p_ppb
           |  FROM pb LEFT JOIN tb USING (w1, w2) JOIN pu USING (w1)
           |          LEFT JOIN tu USING (w1) CROSS JOIN tv CROSS JOIN pv),
           |dc AS (
           |  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           |         CAST(SUM(t_ppb) AS BIGINT) AS st, CAST(SUM(p_ppb) AS BIGINT) AS sp
           |  FROM o JOIN pr USING (w1, w2) GROUP BY 1, 2),
           |dr AS (
           |  SELECT doc_id, source, n_bigrams,
           |         CAST(least(1000000, ((st // n_bigrams) * 1000000)
           |                             // greatest(sp // n_bigrams, 1)) AS BIGINT) AS ratio_ppm
           |  FROM dc),
           |ac AS (
           |  SELECT dr.source, dr.n_bigrams, dr.ratio_ppm,
           |         (((${tos("h8")} % 1000000) + 1000000) % 1000000) < dr.ratio_ppm AS accepted
           |  FROM dr JOIN s10 USING (doc_id))
           |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_scored,
           |       CAST(CAST(SUM(ratio_ppm) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_ratio_ppm,
           |       CAST(SUM(CASE WHEN accepted THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
           |       CAST(SUM(CASE WHEN accepted THEN n_bigrams ELSE 0 END) AS BIGINT) AS accepted_bigrams
           |FROM ac GROUP BY 1 ORDER BY source""".stripMargin
      }),

    // INCREMENTAL LM maintenance: the STORED count tables (persisted
    // at fit time) fold a new batch in additively — keyed count sums
    // + vocab distinct-union, batch-only scan — and the batch scores
    // under the merged model. The batch carries NOVEL tokens
    // (' zqxN' markers) so both merge branches are live: existing
    // bigrams accumulate, novel bigrams/vocab insert and move the
    // smoothing denominator. The oracle retrains from RAW TEXT over
    // stored ∪ batch and scores the batch — a hash match proves the
    // incremental model ≡ a full retrain (the q243 merge≡rebuild
    // certificate, certified THROUGH the scoring arithmetic).
    QuerySpec(
      "q245_incremental_lm",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, concat, lit, pmod}
        val docs = Tables.documents(s, dir)
        val batch = docs.filter(pmod(col("doc_id"), lit(7)) === 3)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat(col("text"), lit(" zqx"),
              pmod(col("doc_id"), lit(5)).cast("string")).as("text"))
        val stored = TextOps.lmModelFor(docs, tag = dir)
        TextOps.lmScoreWith(TextOps.lmModelMerge(stored, batch), batch)
      },
      Some(s"""WITH alltx AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000,
             |         text || ' zqx' || CAST(doc_id % 5 AS VARCHAR)
             |  FROM documents WHERE doc_id % 7 = 3),
             |t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
             |  FROM alltx),
             |o AS (
             |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
             |        FROM t WHERE len(toks) >= 2)),
             |b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM o GROUP BY 1, 2),
             |u AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM o GROUP BY 1),
             |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vsz
             |      FROM (SELECT w1 AS w FROM o UNION SELECT w2 FROM o)),
             |pr AS (SELECT b.w1, b.w2,
             |              CAST(floor(CAST(c2 + 1 AS DOUBLE) / (c1 + vsz) * 1000000000.0) AS BIGINT) AS p_ppb
             |       FROM b JOIN u USING (w1) CROSS JOIN v)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |       CAST(CAST(SUM(p_ppb) AS BIGINT) // COUNT(*) AS BIGINT) AS lm_score_ppb
             |FROM o JOIN pr USING (w1, w2)
             |WHERE doc_id >= 1000000
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // per-DOC top-k keywords by the same transcendental-free lift —
    // doc tagging; rk-bounded window plans WindowGroupLimit.
    QuerySpec(
      "q203_doc_keywords",
      (s, dir) => TextOps.docKeywords(Tables.documents(s, dir)),
      Some("""WITH words AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf_dw
             |       FROM words GROUP BY 1, 2),
             |pd AS (SELECT doc_id, CAST(SUM(tf_dw) AS BIGINT) AS toks_d FROM tf GROUP BY 1),
             |pw AS (SELECT w, CAST(SUM(tf_dw) AS BIGINT) AS tf_g FROM tf GROUP BY 1
             |       HAVING SUM(tf_dw) >= 10),
             |tot AS (SELECT CAST(SUM(toks_d) AS BIGINT) AS toks_g FROM pd),
             |sc AS (SELECT tf.doc_id, tf.w, tf.tf_dw, pw.tf_g,
             |              ((CAST(tf.tf_dw AS DOUBLE) / toks_d)
             |                    / (CAST(pw.tf_g AS DOUBLE) / toks_g)) AS lift
             |       FROM tf JOIN pw USING (w) JOIN pd USING (doc_id) CROSS JOIN tot),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             |                     ORDER BY lift DESC, w) AS BIGINT) AS rk
             |      FROM sc)
             |SELECT doc_id, rk, w, tf_dw, tf_g, lift
             |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // per-source distinctive vocabulary by frequency lift — TF-IDF's
    // ranking intent with no transcendental in the score (ln is not
    // correctly rounded; IEEE division of exact BIGINT counts is).
    QuerySpec(
      "q144_distinctive_terms",
      (s, dir) => TextOps.distinctiveTerms(Tables.documents(s, dir)),
      Some("""WITH words AS (
             |  SELECT source, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |  FROM documents),
             |tf AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS tf_sw
             |       FROM words GROUP BY source, w),
             |ps AS (SELECT source, CAST(SUM(tf_sw) AS BIGINT) AS toks_s FROM tf GROUP BY source),
             |pw AS (SELECT w, CAST(SUM(tf_sw) AS BIGINT) AS tf_g FROM tf GROUP BY w
             |       HAVING SUM(tf_sw) >= 20),
             |tot AS (SELECT CAST(SUM(toks_s) AS BIGINT) AS toks_g FROM ps),
             |sc AS (SELECT tf.source, tf.w, tf.tf_sw, pw.tf_g,
             |              ((CAST(tf.tf_sw AS DOUBLE) / toks_s) /
             |                    (CAST(pw.tf_g AS DOUBLE) / toks_g)) AS lift
             |       FROM tf JOIN pw USING (w) JOIN ps USING (source) CROSS JOIN tot),
             |r AS (SELECT source, w, tf_sw, tf_g, lift,
             |             CAST(row_number() OVER (PARTITION BY source
             |                                     ORDER BY lift DESC, w) AS BIGINT) AS rk
             |      FROM sc)
             |SELECT source, rk, w, tf_sw, tf_g, lift
             |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin)),

    // term co-occurrence PMI collocations: document co-occurrence vs
    // independence as the single-division rational (c_ab·n)/(c_a·c_b)
    // over a broadcast top-df vocabulary — the vocab cap bounds the
    // pair space at vocabK², independent of corpus size.
    QuerySpec(
      "q171_pmi_pairs",
      (s, dir) => TextOps.pmiPairs(Tables.documents(s, dir)),
      Some("""WITH dt AS (
             |  SELECT DISTINCT doc_id, w FROM (
             |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |    FROM documents)),
             |dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY w),
             |vocab AS (SELECT w FROM dfw ORDER BY df DESC, w LIMIT 100),
             |iv AS (SELECT dt.doc_id, dt.w FROM dt JOIN vocab USING (w)),
             |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
             |p AS (SELECT a.w AS wa, b.w AS wb, CAST(COUNT(*) AS BIGINT) AS c_ab
             |      FROM iv a JOIN iv b ON a.doc_id = b.doc_id AND a.w < b.w
             |      GROUP BY a.w, b.w HAVING COUNT(*) >= 5),
             |sc AS (SELECT p.wa, p.wb, p.c_ab, da.df AS c_a, db.df AS c_b,
             |              (CAST(p.c_ab * n_docs AS DOUBLE) /
             |                    CAST(da.df * db.df AS DOUBLE)) AS lift
             |       FROM p JOIN dfw da ON da.w = p.wa JOIN dfw db ON db.w = p.wb
             |       CROSS JOIN nd),
             |top AS (SELECT * FROM sc ORDER BY lift DESC, wa, wb LIMIT 50)
             |SELECT wa, wb, c_ab, c_a, c_b, lift FROM top
             |ORDER BY wa, wb""".stripMargin)),

    // BM25 top-k retrieval with the RATIONAL idf (N−df+0.5)/(df+0.5)
    // — same ranking signal as the ln() form, but built only from
    // correctly-rounded IEEE ops on exact counts (the q144
    // transcendental-free discipline). Per-term scores quantize to
    // integer ppb via floor (exact in every engine — ROUND over
    // DOUBLE is not), per-doc sums are exact BIGINTs. Query-term
    // postings only ever flow.
    QuerySpec(
      "q145_bm25_topk",
      // probes the persisted inverted index (RetrievalShared) — no
      // text pass at query time; the oracle recomputes from scratch,
      // so a hash match also certifies the stored index
      (s, dir) => RetrievalOps.bm25TopKFromIndex(
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir)),
      Some(s"""WITH q(qid, w) AS (
             |  VALUES (0, 'hash'), (0, 'join'), (1, 'table'), (1, 'scan'),
             |         (2, 'stream'), (2, 'filter')),
             |toks AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |  FROM documents),
             |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
             |       WHERE w IN (SELECT w FROM q) GROUP BY doc_id, w),
             |dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
             |dl AS (SELECT doc_id,
             |              CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
             |       FROM documents),
             |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
             |s AS (SELECT q.qid, tf.doc_id,
             |             CAST(floor((((nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
             |                   (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(sumdl AS DOUBLE) / nn))))
             |                  * 1000000000.0) AS BIGINT) AS score_t_ppb
             |      FROM tf JOIN q USING (w) JOIN dfw USING (w) JOIN dl USING (doc_id) CROSS JOIN c),
             |pd AS (SELECT qid, doc_id, CAST(SUM(score_t_ppb) AS BIGINT) AS score_ppb,
             |              CAST(COUNT(*) AS BIGINT) AS n_terms
             |       FROM s GROUP BY qid, doc_id),
             |r AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_ppb, n_terms,
             |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score_ppb DESC, doc_id) AS BIGINT) AS rk
             |      FROM pd)
             |SELECT qid, rk, doc_id, score_ppb, n_terms FROM r WHERE rk <= 10
             |ORDER BY qid, rk""".stripMargin)),

    // Pseudo-relevance-feedback query expansion: feedback docs from
    // the stored index, distinctive-term mining (integer-ppm lift,
    // original terms excluded), re-retrieval with the expanded set.
    // The ranking depends on the chosen terms, so one hash match
    // certifies selection + re-retrieval + the stored index.
    QuerySpec(
      "q248_query_expansion",
      (s, dir) => RetrievalOps.queryExpansion(
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir)),
      Some(s"""WITH q(qid, w) AS (
             |  VALUES (0, 'hash'), (0, 'join'), (1, 'table'), (1, 'scan'),
             |         (2, 'stream'), (2, 'filter')),
             |toks AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |  FROM documents),
             |tall AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
             |dl AS (SELECT doc_id,
             |              CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
             |       FROM documents),
             |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
             |tf1 AS (SELECT doc_id, w, tf FROM tall WHERE w IN (SELECT w FROM q)),
             |dfw1 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf1 GROUP BY w),
             |s1 AS (SELECT q.qid, tf1.doc_id,
             |              CAST(floor((((nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
             |                    (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(sumdl AS DOUBLE) / nn))))
             |                   * 1000000000.0) AS BIGINT) AS score_t_ppb
             |       FROM tf1 JOIN q USING (w) JOIN dfw1 USING (w) JOIN dl USING (doc_id) CROSS JOIN c),
             |pd1 AS (SELECT qid, doc_id, CAST(SUM(score_t_ppb) AS BIGINT) AS score_ppb
             |        FROM s1 GROUP BY qid, doc_id),
             |fb AS (SELECT qid, doc_id FROM (
             |         SELECT qid, doc_id,
             |                row_number() OVER (PARTITION BY qid ORDER BY score_ppb DESC, doc_id) AS rk
             |         FROM pd1) WHERE rk <= 5),
             |fbp AS (SELECT fb.qid, tall.w, CAST(SUM(tf) AS BIGINT) AS fb_tf
             |        FROM tall JOIN fb USING (doc_id) GROUP BY 1, 2),
             |fblen AS (SELECT qid, CAST(SUM(fb_tf) AS BIGINT) AS fb_len FROM fbp GROUP BY qid),
             |dfc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tall
             |        WHERE w IN (SELECT DISTINCT w FROM fbp) GROUP BY w),
             |ex0 AS (SELECT f.qid, f.w,
             |               CAST(floor(CAST(fb_tf * nn AS DOUBLE) / CAST(fb_len * df AS DOUBLE)
             |                    * 1000000.0) AS BIGINT) AS lift_ppm
             |        FROM fbp f JOIN fblen USING (qid) JOIN dfc USING (w) CROSS JOIN c
             |        WHERE NOT EXISTS (SELECT 1 FROM q WHERE q.qid = f.qid AND q.w = f.w)),
             |expt AS (SELECT qid, w FROM (
             |           SELECT qid, w,
             |                  row_number() OVER (PARTITION BY qid ORDER BY lift_ppm DESC, w) AS rk
             |           FROM ex0) WHERE rk <= 3),
             |q2 AS (SELECT qid, w FROM q UNION SELECT qid, w FROM expt),
             |tf2 AS (SELECT doc_id, w, tf FROM tall WHERE w IN (SELECT w FROM q2)),
             |dfw2 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf2 GROUP BY w),
             |s2 AS (SELECT q2.qid, tf2.doc_id,
             |              CAST(floor((((nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
             |                    (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(sumdl AS DOUBLE) / nn))))
             |                   * 1000000000.0) AS BIGINT) AS score_t_ppb
             |       FROM tf2 JOIN q2 USING (w) JOIN dfw2 USING (w) JOIN dl USING (doc_id) CROSS JOIN c),
             |pd2 AS (SELECT qid, doc_id, CAST(SUM(score_t_ppb) AS BIGINT) AS score_ppb,
             |               CAST(COUNT(*) AS BIGINT) AS n_terms
             |        FROM s2 GROUP BY qid, doc_id),
             |r2 AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_ppb, n_terms,
             |              CAST(row_number() OVER (PARTITION BY qid ORDER BY score_ppb DESC, doc_id) AS BIGINT) AS rk
             |       FROM pd2)
             |SELECT qid, rk, doc_id, score_ppb, n_terms FROM r2 WHERE rk <= 10
             |ORDER BY qid, rk""".stripMargin)),

    // BM25 hard-negative mining: per anchor doc, top-k docs scoring
    // high on the anchor's own salient terms but OUTSIDE its near-dup
    // cluster (the positives — excluded and counted). Probes the
    // stored postings + the memoized closure; the oracle recomputes
    // both from scratch, certifying the stored artifacts again.
    QuerySpec(
      "q232_hard_negatives",
      (s, dir) => RetrievalOps.hardNegatives(
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir),
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some(q232OracleSql)),

    // Stored-index coverage audit: the engine reads the PERSISTED
    // postings/doclens tables, the oracle re-derives the expected
    // values from raw text — a stale or partial index hash-mismatches
    // instead of silently serving (the q212 pattern for the lexical
    // artifacts).
    QuerySpec(
      "q239_postings_coverage",
      (s, dir) => RetrievalOps.postingsCoverageAudit(
        Tables.documents(s, dir),
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir)),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
             |  FROM documents),
             |c AS (
             |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
             |         (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_doclens,
             |         (SELECT CAST(COUNT(*) AS BIGINT) FROM d WHERE dl > 0) AS n_docs_with_postings,
             |         (SELECT CAST(COUNT(*) AS BIGINT) FROM d WHERE dl = 0) AS n_tokenless)
             |SELECT n_docs, n_doclens, n_docs_with_postings, n_tokenless,
             |       (n_doclens = n_docs AND n_docs_with_postings = n_docs - n_tokenless) AS covered
             |FROM c""".stripMargin)),

    // INCREMENTAL postings maintenance: a synthetic new-doc batch
    // (shifted ids, every 13th doc) produces its postings delta and
    // the per-touched-term df reconciliation + corpus-stat shift.
    // The oracle recomputes stored df from raw text, certifying the
    // persisted postings/doclens tables once more.
    QuerySpec(
      "q237_postings_incremental",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, lit, pmod}
        val batch = Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(13)) === 5)
          .withColumn("doc_id", col("doc_id") + lit(2000000L))
        RetrievalOps.bm25IncrementalAppend(
          RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir), batch)
      },
      Some("""WITH b AS (
             |  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 5),
             |btoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |          FROM b),
             |btf AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM btoks GROUP BY 1, 2),
             |dn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df_new,
             |              CAST(SUM(tf) AS BIGINT) AS tf_new
             |       FROM btf GROUP BY w),
             |stoks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |          FROM documents),
             |stf AS (SELECT w, doc_id FROM stoks WHERE w IN (SELECT w FROM dn) GROUP BY 1, 2),
             |dold AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df_before FROM stf GROUP BY w),
             |sdl AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb,
             |               CAST(SUM(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'))) AS BIGINT) AS sb
             |        FROM documents),
             |bdl AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn2,
             |               CAST(SUM(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+'))) AS BIGINT) AS s2
             |        FROM b)
             |SELECT dn.w, COALESCE(dold.df_before, 0) AS df_before, dn.df_new,
             |       COALESCE(dold.df_before, 0) + dn.df_new AS df_after, dn.tf_new,
             |       sdl.nb + bdl.nn2 AS n_docs_after, sdl.sb + bdl.s2 AS sumdl_after
             |FROM dn LEFT JOIN dold USING (w) CROSS JOIN sdl CROSS JOIN bdl
             |ORDER BY dn.w""".stripMargin)),

    // the postings cap's flip side: the corpus-wide template/footer
    // grams reported top-k — word-count shaped, total-order cut
    QuerySpec(
      "q119_boilerplate_grams",
      (s, dir) => TextOps.boilerplateGrams(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |         unnest(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS gram
             |  FROM t WHERE len(toks) >= 3),
             |c AS (
             |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_postings,
             |         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
             |  FROM g GROUP BY gram)
             |SELECT gram, n_postings, n_docs FROM c WHERE n_postings >= 5
             |ORDER BY n_postings DESC, gram LIMIT 20""".stripMargin)),

    // The gate's accounting rollup: per verdict, docs and token mass
    // kept/removed plus corpus share — the tally the q114 zero-token
    // fix keeps honest (token-less docs count into 'too_short'
    // instead of vanishing).
    QuerySpec(
      "q116_gate_accounting",
      (s, dir) => TextOps.gateAccounting(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks,
             |         string_split(text, '. ') AS sentences
             |  FROM documents),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(len(toks) AS BIGINT) AS n_tokens,
             |    (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) AS distinct_ratio,
             |    (CAST(list_max(list_transform(list_distinct(toks), x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE) / len(toks)) AS top_tok_share,
             |    (CAST(len(sentences) - len(list_distinct(sentences)) AS DOUBLE) / GREATEST(len(sentences), 1)) AS dup_sentence_frac
             |  FROM t WHERE len(toks) > 0),
             |v AS (
             |  SELECT d.doc_id,
             |         CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
             |         CASE WHEN COALESCE(s.n_tokens, 0) < 5 THEN 'too_short'
             |              WHEN s.dup_sentence_frac > 0.30 THEN 'dup_sentences'
             |              WHEN s.top_tok_share > 0.20 THEN 'top_token'
             |              WHEN s.distinct_ratio < 0.30 THEN 'low_diversity'
             |              ELSE 'keep' END AS verdict
             |  FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id)
             |SELECT verdict,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |       (CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER ()) AS doc_frac
             |FROM v GROUP BY verdict
             |ORDER BY verdict""".stripMargin)),

    QuerySpec(
      "q66_token_estimate",
      (s, dir) => TextOps.tokenEstimate(Tables.documents(s, dir)),
      Some("""SELECT doc_id,
             |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_pieces,
             |       CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_ws_tokens,
             |       (CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS DOUBLE)
             |             / GREATEST(len(regexp_extract_all(text, '[^ ]+')), 1)) AS pieces_per_token
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // token frequency-of-frequencies spectrum with integer
    // Good-Turing adjusted counts r* = (r+1)·n_{r+1}·10⁶ DIV n_r —
    // one word-count shuffle, then spectrum-sized (max-freq rows)
    // self-join work only.
    QuerySpec(
      "q198_freq_spectrum",
      (s, dir) => TextOps.tokenFrequencySpectrum(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS tok
             |  FROM documents),
             |f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM t GROUP BY tok),
             |s AS (SELECT freq, CAST(COUNT(*) AS BIGINT) AS n_types FROM f GROUP BY freq)
             |SELECT s.freq, s.n_types, s.freq * s.n_types AS n_tokens,
             |       ((s.freq + 1) * COALESCE(nx.n_types, 0) * 1000000) // s.n_types AS gt_rstar_ppm
             |FROM s LEFT JOIN s nx ON nx.freq = s.freq + 1
             |ORDER BY s.freq""".stripMargin)),

    // Zipf head: corpus token-frequency distribution, top-30 with
    // corpus share + cumulative coverage — TakeOrdered cuts to k rows
    // BEFORE the rank/cumsum window, so the unpartitioned window only
    // ever sees k rows.
    QuerySpec(
      "q123_zipf_head",
      (s, dir) => TextOps.zipfReport(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS tok
             |  FROM documents),
             |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ,
             |             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
             |      FROM t GROUP BY tok),
             |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t),
             |top AS (SELECT * FROM c ORDER BY n_occ DESC, tok LIMIT 30),
             |r AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, tok) AS BIGINT) AS tok_rank,
             |             tok, n_occ, n_docs,
             |             SUM(n_occ) OVER (ORDER BY n_occ DESC, tok ROWS UNBOUNDED PRECEDING) AS cum_occ
             |      FROM top)
             |SELECT tok_rank, tok, n_occ, n_docs,
             |       (CAST(n_occ AS DOUBLE) / total) AS share,
             |       (CAST(cum_occ AS DOUBLE) / total) AS cum_share
             |FROM r CROSS JOIN tot ORDER BY tok_rank""".stripMargin)),

    // Vocabulary growth: never-seen-before tokens per doc-id decile +
    // cumulative vocab — the Heaps-law saturation curve. First-seen is
    // a min aggregate; the bucket cut is integer DIV on (doc_id,
    // max_id), no rank or global sort.
    QuerySpec(
      "q129_vocab_growth",
      (s, dir) => TextOps.vocabGrowth(Tables.documents(s, dir)),
      Some("""WITH m AS (SELECT MAX(doc_id) AS max_id FROM documents),
             |t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS tok
             |      FROM documents),
             |fs AS (SELECT tok, MIN(doc_id) AS first_doc FROM t GROUP BY tok),
             |nb AS (SELECT (first_doc * 10) // (max_id + 1) AS bucket,
             |              CAST(COUNT(*) AS BIGINT) AS n_new_tokens
             |       FROM fs CROSS JOIN m GROUP BY 1),
             |db AS (SELECT (doc_id * 10) // (max_id + 1) AS bucket,
             |              CAST(COUNT(*) AS BIGINT) AS n_docs
             |       FROM documents CROSS JOIN m GROUP BY 1)
             |SELECT CAST(db.bucket AS BIGINT) AS bucket, db.n_docs,
             |       COALESCE(nb.n_new_tokens, 0) AS n_new_tokens,
             |       CAST(SUM(COALESCE(nb.n_new_tokens, 0))
             |            OVER (ORDER BY db.bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
             |FROM db LEFT JOIN nb ON db.bucket = nb.bucket
             |ORDER BY bucket""".stripMargin)),

    // Inter-source vocabulary Jaccard: the corpus redundancy map.
    // Dictionary self-join on TOKEN — per-token fanout bounded by the
    // source dimension, never doc count.
    QuerySpec(
      "q125_source_vocab_overlap",
      (s, dir) => TextOps.sourceVocabOverlap(Tables.documents(s, dir)),
      Some("""WITH v AS (
             |  SELECT DISTINCT source, tok FROM (
             |    SELECT source, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS tok
             |    FROM documents)),
             |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab FROM v GROUP BY source),
             |p AS (SELECT a.source AS source_a, b.source AS source_b,
             |             CAST(COUNT(*) AS BIGINT) AS n_common
             |      FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
             |      GROUP BY 1, 2)
             |SELECT p.source_a, p.source_b, sa.n_vocab AS n_vocab_a, sb.n_vocab AS n_vocab_b,
             |       p.n_common,
             |       (CAST(p.n_common AS DOUBLE) / (sa.n_vocab + sb.n_vocab - p.n_common)) AS jaccard
             |FROM p JOIN sz sa ON p.source_a = sa.source
             |       JOIN sz sb ON p.source_b = sb.source
             |ORDER BY source_a, source_b""".stripMargin)),

    // sketch-estimated source-pair vocab similarity — q125's scale
    // path: per-source 64-lane MinHash over the distinct word set
    // (mergeable min partials), agreement rate estimates Jaccard;
    // the oracle replays md5-prefix word keys through the XXH64 chain.
    QuerySpec(
      "q197_vocab_minhash",
      (s, dir) => TextOps.sourceVocabMinhash(Tables.documents(s, dir)),
      Some(q197OracleSql)),

    // Cross-split contamination matrix over the EXACT q94 xxhash64
    // split — ordered split pairs with leaked-doc counts, shared-gram
    // counts and the zero rows kept (left joins from the complete
    // split×split frame).
    QuerySpec(
      "q122_split_contamination",
      (s, dir) => TextOps.crossSplitContamination(Tables.documents(s, dir)),
      Some(q122OracleSql)),

    // Sentence-level exact dedup: first corpus occurrence (min
    // (doc_id, pos)) of each sentence kept, docs reassembled from
    // survivors. Spark keeps via a min-struct AGGREGATE (map-side
    // combine kills boilerplate-sentence skew); the oracle's window
    // expresses the same keeper rule.
    QuerySpec(
      "q126_sentence_dedup",
      (s, dir) => TextOps.sentenceDedup(Tables.documents(s, dir)),
      Some("""WITH t AS (SELECT doc_id, string_split(text, '. ') AS ss FROM documents),
             |s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, ss[i] AS s
             |      FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM t)),
             |k AS (SELECT doc_id, pos, s,
             |             ROW_NUMBER() OVER (PARTITION BY s ORDER BY doc_id, pos) = 1 AS kept
             |      FROM s)
             |SELECT doc_id,
             |       CAST(COUNT(*) AS BIGINT) AS n_sentences,
             |       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       CAST(COUNT(*) - SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             |       md5(COALESCE(array_to_string(list(s ORDER BY pos) FILTER (WHERE kept), '. '), '')) AS clean_fp
             |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Learned-stopword ratio: the corpus's own Zipf head (q123's
    // top-30) is the stopword list; per-doc share of head tokens.
    QuerySpec(
      "q127_stopword_ratio",
      (s, dir) => TextOps.stopwordRatio(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS tok
             |  FROM documents),
             |c AS (SELECT tok, COUNT(*) AS n_occ FROM t GROUP BY tok),
             |stop AS (SELECT tok FROM c ORDER BY n_occ DESC, tok LIMIT 30),
             |agg AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |               CAST(SUM(CASE WHEN stop.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
             |        FROM t LEFT JOIN stop ON t.tok = stop.tok
             |        GROUP BY t.doc_id)
             |SELECT d.doc_id, COALESCE(agg.n_tokens, 0) AS n_tokens,
             |       COALESCE(agg.n_stop, 0) AS n_stop,
             |       (CAST(COALESCE(agg.n_stop, 0) AS DOUBLE)
             |             / GREATEST(COALESCE(agg.n_tokens, 0), 1)) AS stop_ratio
             |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Per-language length gate: p10/p90 token-count thresholds
    // learned per lang (GK sketch ≡ quantile_disc at this distinct
    // count — the q90 contract), then a broadcast threshold join.
    QuerySpec(
      "q128_lang_length_gate",
      (s, dir) => TextOps.langLengthGate(Tables.documents(s, dir)),
      Some("""WITH n AS (
             |  SELECT doc_id, lang,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |th AS (SELECT lang, quantile_disc(n_tokens, 0.1) AS p_lo,
             |              quantile_disc(n_tokens, 0.9) AS p_hi
             |       FROM n GROUP BY lang),
             |cls AS (SELECT n.lang, th.p_lo, th.p_hi,
             |               CASE WHEN n_tokens < p_lo THEN 'short'
             |                    WHEN n_tokens > p_hi THEN 'long'
             |                    ELSE 'keep' END AS cls
             |        FROM n JOIN th USING (lang))
             |SELECT lang, MAX(p_lo) AS p_lo, MAX(p_hi) AS p_hi,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(CASE WHEN cls = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |       CAST(SUM(CASE WHEN cls = 'short' THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
             |       CAST(SUM(CASE WHEN cls = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
             |       (CAST(SUM(CASE WHEN cls = 'keep' THEN 1 ELSE 0 END) AS DOUBLE)
             |             / COUNT(*)) AS kept_frac
             |FROM cls GROUP BY lang ORDER BY lang""".stripMargin)),

    // The 100 TB decontamination shape: held-out grams folded into a
    // broadcast Bloom filter, corpus grams tested locally — no join
    // shuffle. The filter is deterministic (Murmur3 seed 0), so the
    // oracle replays it bit-exactly — false positives included (see
    // q85OracleSql); the no-false-negative superset property vs q62
    // is additionally asserted in TextDedupSpec.
    QuerySpec(
      "q85_decontamination_bloom",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        TextOps.bloomContaminationCheck(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50))
      },
      Some(q85OracleSql)),

    // Fuzzy entity matching: per-block (brand) Levenshtein pairs —
    // blocking keeps the quadratic edit distance inside equi-join
    // buckets, never all-pairs.
    QuerySpec(
      "q83_fuzzy_match",
      (s, dir) => TextOps.fuzzyNameMatch(Tables.part(s, dir)),
      Some("""SELECT a.p_partkey AS key_i, b.p_partkey AS key_j,
             |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |WHERE levenshtein(a.p_name, b.p_name) <= 2
             |ORDER BY key_i, key_j""".stripMargin)),

    // the alias table in action: lineitem revenue rolled up through
    // entity ids — alias fragmentation stops splitting revenue lines.
    QuerySpec(
      "q223_entity_revenue",
      (s, dir) => DedupOps.entityRevenue(Tables.lineitem(s, dir),
        DedupOps.entityGroupsFor(Tables.part(s, dir), tag = dir)),
      Some(s"""WITH RECURSIVE pr AS (
              |  SELECT a.p_partkey AS doc_i, b.p_partkey AS doc_j
              |  FROM part a JOIN part b
              |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
              |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
              |e AS (SELECT doc_i AS src, doc_j AS dst FROM pr
              |      UNION ALL SELECT doc_j, doc_i FROM pr),
              |reach(node, lbl) AS (
              |  SELECT p_partkey, p_partkey FROM part
              |  UNION
              |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
              |cl AS (SELECT node AS p_partkey, MIN(lbl) AS entity_id
              |       FROM reach GROUP BY node),
              |sz AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
              |       FROM cl GROUP BY 1),
              |al AS (SELECT cl.p_partkey, cl.entity_id, sz.n_members,
              |              cn.p_name AS canonical_name
              |       FROM cl JOIN sz USING (entity_id)
              |       JOIN part cn ON cn.p_partkey = cl.entity_id)
              |SELECT al.entity_id, al.canonical_name, al.n_members,
              |       CAST(COUNT(*) AS BIGINT) AS n_items,
              |       ${decSumSql("l_extendedprice")} AS total_amount
              |FROM lineitem JOIN al ON l_partkey = al.p_partkey
              |GROUP BY 1, 2, 3 ORDER BY entity_id""".stripMargin)),

    // entity resolution: the q83 pairs closed transitively into alias
    // groups — stable min-key entity ids + the canonical name; the
    // lookup table a pipeline joins through.
    QuerySpec(
      "q222_entity_groups",
      (s, dir) => DedupOps.entityGroupsFor(Tables.part(s, dir), tag = dir),
      Some("""WITH RECURSIVE pr AS (
             |  SELECT a.p_partkey AS doc_i, b.p_partkey AS doc_j
             |  FROM part a JOIN part b
             |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
             |e AS (SELECT doc_i AS src, doc_j AS dst FROM pr
             |      UNION ALL SELECT doc_j, doc_i FROM pr),
             |reach(node, lbl) AS (
             |  SELECT p_partkey, p_partkey FROM part
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS p_partkey, MIN(lbl) AS entity_id
             |       FROM reach GROUP BY node),
             |sz AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
             |       FROM cl GROUP BY 1)
             |SELECT cl.p_partkey, cl.entity_id, sz.n_members,
             |       cn.p_name AS canonical_name
             |FROM cl JOIN sz USING (entity_id)
             |JOIN part cn ON cn.p_partkey = cl.entity_id
             |ORDER BY cl.p_partkey""".stripMargin)),

    // ingest-order novelty: share of a doc's distinct 5-grams it
    // introduced (first-seen = min doc_id) — crawl-frontier and
    // curriculum signal; one map-combinable MIN rollup + join back.
    QuerySpec(
      "q224_gram_novelty",
      (s, dir) => TextOps.gramNovelty(Tables.documents(s, dir)),
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t
             |  FROM documents),
             |ng AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, gi, gi + 4), ' ') AS g
             |       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS gi
             |             FROM tok WHERE len(t) >= 5)),
             |fs AS (SELECT g, MIN(doc_id) AS first_doc FROM ng GROUP BY g)
             |SELECT ng.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             |       CAST(SUM(CASE WHEN fs.first_doc = ng.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |       CAST((SUM(CASE WHEN fs.first_doc = ng.doc_id THEN 1 ELSE 0 END) * 1000000)
             |         // COUNT(*) AS BIGINT) AS novelty_ppm
             |FROM ng JOIN fs USING (g)
             |GROUP BY ng.doc_id ORDER BY doc_id""".stripMargin)),

    // Decontamination: corpus docs (doc_id >= 50) sharing word 5-grams
    // with the held-out slice (doc_id < 50).
    QuerySpec(
      "q62_decontamination",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        TextOps.contaminationCheck(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t
             |  FROM documents),
             |ng AS (
             |  SELECT DISTINCT doc_id, array_to_string(list_slice(t, gi, gi + 4), ' ') AS g
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS gi
             |        FROM tok WHERE len(t) >= 5)),
             |hg AS (SELECT DISTINCT g FROM ng WHERE doc_id < 50),
             |shr AS (SELECT doc_id, COUNT(*) AS n_shared
             |        FROM ng JOIN hg USING (g)
             |        WHERE doc_id >= 50 GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(shr.n_shared, 0) AS n_shared,
             |       COALESCE(shr.n_shared, 0) >= 5 AS flagged
             |FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
             |LEFT JOIN shr USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // SUBSTRING-level decontamination: held-out sentences compiled
    // into ONE broadcast Aho–Corasick automaton, the corpus decided in
    // a single scan — the shape gram joins can't reach (no shuffle,
    // token-boundary-crossing matches). The oracle replays the exact
    // semantics as a contains() join, bounded at oracle SF.
    QuerySpec(
      "q253_substring_contamination",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        TextOps.substringContamination(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50))
      },
      Some("""WITH t AS (SELECT string_split(text, '. ') AS ss
             |          FROM documents WHERE doc_id < 50),
             |s AS (SELECT lower(trim(ss[i])) AS nd
             |      FROM (SELECT ss, unnest(range(1, len(ss) + 1)) AS i FROM t)),
             |nd AS (SELECT DISTINCT nd FROM s WHERE length(nd) >= 20),
             |d AS (SELECT doc_id, lower(text) AS lt
             |      FROM documents WHERE doc_id >= 50),
             |h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
             |      FROM d JOIN nd ON contains(d.lt, nd.nd)
             |      GROUP BY doc_id)
             |SELECT d.doc_id, COALESCE(h.n, 0) AS n_needles_hit,
             |       COALESCE(h.n, 0) >= 1 AS flagged
             |FROM d LEFT JOIN h USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // One BPE/WordPiece merge round's counting core: adjacent-pair
    // frequencies, top-k with a total-order tie-break. Word-count
    // shaped — one shuffle with map-side combine.
    QuerySpec(
      "q106_bpe_merge_pairs",
      (s, dir) => TextOps.bpeMergePairs(Tables.documents(s, dir)),
      Some("""WITH tok AS (
             |  SELECT regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t FROM documents),
             |p AS (
             |  SELECT t[gi] AS tok_left, t[gi + 1] AS tok_right
             |  FROM (SELECT t, unnest(range(1, len(t))) AS gi FROM tok WHERE len(t) >= 2))
             |SELECT tok_left, tok_right, COUNT(*) AS n_pair
             |FROM p GROUP BY tok_left, tok_right
             |ORDER BY n_pair DESC, tok_left, tok_right
             |LIMIT 20""".stripMargin)),

    // Repeated-span detection: positioned grams join on the string,
    // shared hits grouped by alignment diagonal — a copied L-token
    // passage is L-n+1 hits on one diagonal. Postings-capped, never
    // all-pairs.
    QuerySpec(
      "q113_shared_spans",
      (s, dir) => TextOps.sharedSpans(Tables.documents(s, dir)),
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t FROM documents),
             |ng AS (
             |  SELECT doc_id, gi AS pos, array_to_string(list_slice(t, gi, gi + 9), ' ') AS g
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS gi
             |        FROM tok WHERE len(t) >= 10)),
             |keep AS (SELECT g FROM ng GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 50),
             |capped AS (SELECT ng.* FROM ng JOIN keep USING (g)),
             |dh AS (
             |  SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, a.pos - b.pos AS diag,
             |         CAST(COUNT(*) AS BIGINT) AS diag_hits
             |  FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2, 3)
             |SELECT doc_i, doc_j,
             |       CAST(SUM(diag_hits) AS BIGINT) AS n_shared_spans,
             |       CAST(COUNT(*) AS BIGINT) AS n_diags,
             |       CAST(MAX(diag_hits) AS BIGINT) AS max_diag_hits
             |FROM dh GROUP BY doc_i, doc_j
             |HAVING SUM(diag_hits) >= 3
             |ORDER BY doc_i, doc_j""".stripMargin)),

    // The excision side of exact-substring dedup: per-document
    // maximal duplicated-passage ranges (gaps-and-islands over the
    // positions whose gram occurs in >= 2 distinct docs) — the cut
    // list a span-dedup writer splices out. Same postings cap as
    // q113; the island merge is a per-doc window, never all-pairs.
    QuerySpec(
      "q133_duplicate_spans",
      (s, dir) => TextOps.duplicateSpans(Tables.documents(s, dir)),
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t FROM documents),
             |ng AS (
             |  SELECT doc_id, gi AS pos, array_to_string(list_slice(t, gi, gi + 9), ' ') AS g
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS gi
             |        FROM tok WHERE len(t) >= 10)),
             |keep AS (SELECT g FROM ng GROUP BY g
             |         HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= 50),
             |hit AS (SELECT doc_id, pos FROM ng JOIN keep USING (g)),
             |isl AS (SELECT doc_id, pos,
             |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             |        FROM hit)
             |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
             |       CAST(COUNT(*) AS BIGINT) AS n_grams,
             |       CAST(COUNT(*) + 9 AS BIGINT) AS span_tokens
             |FROM isl GROUP BY doc_id, grp
             |ORDER BY doc_id, span_start""".stripMargin)),

    // the writer side of q133: splice out every token position
    // covered by a cross-doc duplicated gram and fingerprint the
    // cleaned text (q71's clean_fp convention); every tokenful doc
    // keeps an accounting row, n_cut = 0 when untouched.
    QuerySpec(
      "q140_span_excision",
      (s, dir) => TextOps.exciseDuplicateSpans(Tables.documents(s, dir)),
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t FROM documents),
             |tp AS (SELECT doc_id, CAST(i AS BIGINT) AS tpos, t[i] AS tok
             |       FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
             |             FROM tok WHERE len(t) >= 1)),
             |ng AS (SELECT doc_id, gi AS pos, array_to_string(list_slice(t, gi, gi + 9), ' ') AS g
             |       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS gi
             |             FROM tok WHERE len(t) >= 10)),
             |keep AS (SELECT g FROM ng GROUP BY g
             |         HAVING COUNT(DISTINCT doc_id) >= 2 AND COUNT(*) <= 50),
             |hit AS (SELECT doc_id, pos FROM ng JOIN keep USING (g)),
             |cov AS (SELECT DISTINCT doc_id, CAST(pos + o AS BIGINT) AS tpos
             |        FROM (SELECT doc_id, pos, unnest(range(0, 10)) AS o FROM hit)),
             |kept AS (SELECT tp.doc_id, tp.tpos, tp.tok FROM tp
             |         WHERE NOT EXISTS (SELECT 1 FROM cov
             |                           WHERE cov.doc_id = tp.doc_id AND cov.tpos = tp.tpos)),
             |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             |              array_to_string(list(tok ORDER BY tpos), ' ') AS clean_text
             |       FROM kept GROUP BY doc_id),
             |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM tp GROUP BY doc_id)
             |SELECT t.doc_id, t.n_tokens,
             |       CAST(t.n_tokens - COALESCE(k.n_kept, 0) AS BIGINT) AS n_cut,
             |       md5(COALESCE(k.clean_text, '')) AS clean_fp
             |FROM tot t LEFT JOIN ka k USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // The real tokenizer-training loop: 5 character-level BPE merge
    // rounds over the distinct-word frequency table; the oracle
    // replays every round unrolled (see q108OracleSql). Trained ONCE
    // per corpus via BpeShared (catalog tables) — q111 applies the
    // same stored state instead of re-running the rounds.
    QuerySpec(
      "q108_bpe_learn",
      (s, dir) => BpeShared.merges(s, dir),
      Some(q108OracleSql)),

    // The learned vocabulary applied back to the corpus: per-lang
    // token mass and units-per-token compression under the k merges —
    // learn (q108) and apply, closed loop, from the SHARED stored
    // word table (zero training rounds in this query's path).
    QuerySpec(
      "q111_bpe_vocab_report",
      (s, dir) => TextOps.bpeVocabReportFromState(
        Tables.documents(s, dir), BpeShared.words(s, dir)),
      Some(q111OracleSql)),

    // encode-time segmentation: the STORED merge schedule (a
    // round-bounded driver-side list — 5 rows here, the q108
    // artifact) replayed over the corpus's distinct words, per-doc
    // cost rollup. Works on unseen words by construction
    // (TextDedupSpec); here train==apply corpus, so the oracle's
    // seen-word vocabulary covers every token.
    QuerySpec(
      "q118_bpe_segment_cost",
      (s, dir) => {
        val m = BpeShared.merges(s, dir).collect() // bounded: ≤ rounds rows
          .map(r => (r.getString(1), r.getString(2))).toSeq
        TextOps.bpeSegmentCost(Tables.documents(s, dir), m)
      },
      Some(q118OracleSql)),

    // tokenizer drift: the STORED merge schedule scored against a
    // batch with a planted novel token — per-source unit cost + the
    // novel-word ppm, the re-train signal a tokenizer owner watches.
    // Unseen words segment through the same frozen merges both sides.
    QuerySpec(
      "q240_bpe_drift",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, concat, lit, pmod}
        val m = BpeShared.merges(s, dir).collect() // bounded: <= rounds rows
          .map(r => (r.getString(1), r.getString(2))).toSeq
        val batch = Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(17)) === 3)
          .withColumn("text", concat(col("text"), lit(" zzdrift zzdrift")))
        TextOps.bpeDriftReport(batch, m, BpeShared.words(s, dir))
      },
      Some(q240OracleSql))
  )

  /** q108 oracle: BPE learning is deterministic — the corpus only
    * enters through the distinct-word frequency table, the best pair
    * per round has a total-order tie-break (count desc, pair asc),
    * and the greedy left-to-right merge is a pure fold — so the whole
    * `rounds`-iteration loop unrolls into chained CTEs: pair-count →
    * 1-row best → per-word unit rewrite, repeated. The rewrite
    * mirrors the Spark side exactly: fold units into a '|'-delimited
    * string, gluing y onto x when x's last unit is the best left and
    * y is the best right ('|' cannot occur inside a unit, so the
    * boundary test is exact; list_reduce seeds with the first element
    * exactly like Spark's aggregate(slice(...,2,...), units[0], …)).
    * Assumes ≥ rounds mergeable pairs exist (true for any real text
    * corpus; the Spark side stops early on exhaustion). */
  private val (q108OracleSql, q111OracleSql, q118OracleSql, q240OracleSql)
      : (String, String, String, String) = {
    val rounds = 5
    def pairsCte(u: String, p: String) =
      s"""$p AS (
         |  SELECT units[gi] AS bl, units[gi + 1] AS br, CAST(SUM(freq) AS BIGINT) AS n
         |  FROM (SELECT freq, units, unnest(range(1, len(units))) AS gi
         |        FROM $u WHERE len(units) >= 2)
         |  GROUP BY 1, 2)""".stripMargin
    def bestCte(p: String, b: String) =
      s"$b AS (SELECT bl, br, n FROM $p ORDER BY n DESC, bl, br LIMIT 1)"
    def mergeCte(u0: String, b: String, u1: String) =
      s"""$u1 AS (
         |  SELECT w, freq,
         |         CASE WHEN len(units) <= 1 THEN units
         |              ELSE string_split(list_reduce(units, (x, y) ->
         |                CASE WHEN (x = bb.bl OR ends_with(x, '|' || bb.bl)) AND y = bb.br
         |                     THEN x || y ELSE x || '|' || y END), '|') END AS units
         |  FROM $u0, $b bb)""".stripMargin
    val u0 =
      """u0 AS (
        |  SELECT w, freq,
        |         list_transform(range(1, length(w) + 1), i -> substr(w, CAST(i AS INT), 1)) AS units
        |  FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
        |        FROM (SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
        |              FROM documents)
        |        GROUP BY w))""".stripMargin
    // every round rewrites (q111 reads the FINAL u$rounds state; q108
    // only reads the b$r best rows, so the extra last rewrite is free)
    val ctes = (1 to rounds).flatMap { r =>
      Seq(pairsCte(s"u${r - 1}", s"p$r"), bestCte(s"p$r", s"b$r"),
          mergeCte(s"u${r - 1}", s"b$r", s"u$r"))
    }
    val union = (1 to rounds)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, bl AS tok_left, br AS tok_right, n AS n_pair FROM b$r")
      .mkString("\n  UNION ALL ")
    val q108 = s"""WITH $u0,
       |${ctes.mkString(",\n")}
       |SELECT * FROM (
       |  $union)
       |ORDER BY round""".stripMargin
    val q111 = s"""WITH $u0,
       |${ctes.mkString(",\n")},
       |occ AS (
       |  SELECT lang, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |  FROM documents),
       |voc AS (SELECT w, CAST(len(units) AS BIGINT) AS nu FROM u$rounds)
       |SELECT o.lang,
       |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(SUM(v.nu) AS BIGINT) AS n_units,
       |       (CAST(SUM(v.nu) AS DOUBLE) / COUNT(*)) AS units_per_token
       |FROM occ o JOIN voc v USING (w)
       |GROUP BY o.lang
       |ORDER BY o.lang""".stripMargin
    // q118: the same unrolled vocabulary applied per DOCUMENT — the
    // encode-time cost signal (training corpus == applied corpus in
    // the catalog form, so the seen-word join covers every token)
    val q118 = s"""WITH $u0,
       |${ctes.mkString(",\n")},
       |occ AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |  FROM documents),
       |voc AS (SELECT w, CAST(len(units) AS BIGINT) AS nu FROM u$rounds)
       |SELECT o.doc_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(SUM(v.nu) AS BIGINT) AS n_units,
       |       (CAST(SUM(v.nu) AS DOUBLE) / COUNT(*)) AS units_per_token
       |FROM occ o JOIN voc v USING (w)
       |GROUP BY o.doc_id
       |ORDER BY o.doc_id""".stripMargin
    // q240: the FROZEN schedule (the b$r best rows learned on the
    // training corpus) applied to a DRIFTED batch's own word list —
    // unseen words segment toward characters — plus the novel-word
    // occurrence share (ppm, integer) against the training
    // vocabulary (u0's word set).
    val batchCtes = (1 to rounds)
      .map(r => mergeCte(s"bu${r - 1}", s"b$r", s"bu$r")).mkString(",\n")
    val q240 = s"""WITH $u0,
       |${ctes.mkString(",\n")},
       |bdocs AS (SELECT source, text || ' zzdrift zzdrift' AS text
       |          FROM documents WHERE doc_id % 17 = 3),
       |bw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |         SELECT unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |         FROM bdocs) GROUP BY w),
       |bu0 AS (SELECT w, freq,
       |          list_transform(range(1, length(w) + 1), i -> substr(w, CAST(i AS INT), 1)) AS units
       |        FROM bw),
       |$batchCtes,
       |bvoc AS (SELECT w, CAST(len(units) AS BIGINT) AS nu FROM bu$rounds),
       |known AS (SELECT DISTINCT w FROM u0),
       |bocc AS (SELECT source, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |         FROM bdocs),
       |agg AS (
       |  SELECT o.source,
       |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(v.nu) AS BIGINT) AS n_units,
       |         CAST(SUM(CASE WHEN k.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM bocc o JOIN bvoc v USING (w) LEFT JOIN known k USING (w)
       |  GROUP BY o.source)
       |SELECT source, n_tokens, n_units,
       |       CAST(n_units AS DOUBLE) / n_tokens AS units_per_token,
       |       n_novel, CAST((n_novel * 1000000) // n_tokens AS BIGINT) AS novel_ppm
       |FROM agg ORDER BY source""".stripMargin
    (q108, q111, q118, q240)
  }

  // ---------------------------------------------------------------- //
  // north-star: deduplication over `documents`
  // ---------------------------------------------------------------- //
  private def dedupQueries: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q40_dedup_exact",
      (s, dir) => DedupOps.exactDedup(Tables.documents(s, dir)),
      Some("""SELECT doc_id, md5(text) AS fp_md5, lang, source FROM documents
             |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
             |ORDER BY doc_id""".stripMargin)),

    // canonicalize-before-hash: case folding + whitespace collapse +
    // punctuation-run trim, so reformatted copies collapse that
    // byte-exact hashing misses
    QuerySpec(
      "q99_normalized_dedup",
      (s, dir) => DedupOps.normalizedDedup(Tables.documents(s, dir)),
      Some("""WITH nrm AS (
             |  SELECT doc_id, lang, source,
             |         md5(trim(regexp_replace(regexp_replace(lower(text), '[ \t\r\n]+', ' ', 'g'),
             |                                 '[.!?,;:]+', '.', 'g'))) AS norm_fp
             |  FROM documents)
             |SELECT doc_id, norm_fp, lang, source FROM nrm
             |WHERE doc_id IN (SELECT min(doc_id) FROM nrm GROUP BY norm_fp)
             |ORDER BY doc_id""".stripMargin)),

    QuerySpec(
      "q41_jaccard_pairs",
      (s, dir) => DedupOps.jaccardPairs(Tables.documents(s, dir)),
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents WHERE doc_id < 60)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM sh a JOIN sh b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT doc_i, doc_j, common,
             |       (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) AS jaccard
             |FROM c JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15
             |ORDER BY doc_i, doc_j""".stripMargin)),

    // asymmetric CONTAINMENT |∩|/|A| per direction — the quote/
    // excerpt signal resemblance dilutes; the df cap on shingle
    // postings (Σdf² bound) replaces q41's doc-subset cap, so this
    // one runs corpus-wide.
    QuerySpec(
      "q186_containment_pairs",
      (s, dir) => DedupOps.containmentPairs(Tables.documents(s, dir)),
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents)),
             |rare AS (SELECT sh.doc_id, sh.s FROM sh
             |         JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 30) d
             |         USING (s)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM rare GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM rare a JOIN rare b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
             |SELECT doc_i, doc_j, CAST(common AS BIGINT) AS common,
             |       (CAST(common AS DOUBLE) / ni.n_sh) AS containment_i,
             |       (CAST(common AS DOUBLE) / nj.n_sh) AS containment_j
             |FROM c JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |WHERE GREATEST((CAST(common AS DOUBLE) / ni.n_sh),
             |               (CAST(common AS DOUBLE) / nj.n_sh)) >= 0.5
             |ORDER BY doc_i, doc_j""".stripMargin)),

    // q42/q43/q70/q73 all draw on ONE persisted sketch pass
    // (SketchShared): the (doc_id, sh, sig, simhash) column table plus
    // the two candidate-pair tables built from it — value-identical to
    // the standalone per-query forms (TextDedupSpec equivalence test).
    QuerySpec(
      "q42_minhash_lsh_pairs",
      (s, dir) => SketchShared.minhashPairs(s, dir)
        .orderBy(col("doc_i"), col("doc_j")),
      Some(q42OracleSql)),

    QuerySpec(
      "q43_simhash_pairs",
      (s, dir) => SketchShared.simhashPairs(s, dir)
        .orderBy(col("doc_i"), col("doc_j")),
      Some(q43OracleSql)),

    // End-to-end near-dup dedup: candidate pairs -> connected
    // components -> canonical corpus. Edges here are the
    // SQL-expressible exact-Jaccard pairs (q41), so DuckDB can
    // reproduce the transitive closure with a recursive CTE; the
    // sketch-edge production pipeline (nearDedupSketch) is covered by
    // TextDedupSpec.
    QuerySpec(
      "q61_near_dedup",
      // reads the memoized corpus closure (DedupOps.clustersFor) —
      // the oracle still replays edges + closure from scratch, so a
      // hash match certifies the shared label table for every
      // consumer behind it
      (s, dir) => DedupOps.nearDedupFromClusters(
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents WHERE doc_id < 60)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM sh a JOIN sh b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
             |p AS (SELECT doc_i, doc_j FROM c
             |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
             |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
             |      UNION ALL SELECT doc_j, doc_i FROM p),
             |reach(node, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
             |SELECT cluster_id AS doc_id, COUNT(*) AS n_members
             |FROM cl GROUP BY cluster_id
             |ORDER BY doc_id""".stripMargin)),

    // contrastive triplets off the same closure: anchors = multi-doc
    // cluster members, positive = smallest other member, negatives =
    // q184 hash draws anti-checked against the anchor's own cluster —
    // dedup byproducts as embedding-model supervision.
    QuerySpec(
      "q201_contrastive_triplets",
      (s, dir) => CorpusOps.contrastiveTripletsFromClusters(
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some(q201OracleSql)),

    // duplication-aware training weights over the same closure: every
    // doc kept at loss weight 1000000 DIV cluster_size ppm — the soft
    // alternative to dropping near-dups.
    QuerySpec(
      "q209_dup_weights",
      (s, dir) => DedupOps.dupTrainingWeightsFromClusters(
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents WHERE doc_id < 60)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM sh a JOIN sh b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
             |p AS (SELECT doc_i, doc_j FROM c
             |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
             |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
             |      UNION ALL SELECT doc_j, doc_i FROM p),
             |reach(node, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
             |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
             |       FROM cl GROUP BY 1)
             |SELECT cl.doc_id, cl.cluster_id, sz.n_members,
             |       1000000 // sz.n_members AS weight_ppm
             |FROM cl JOIN sz USING (cluster_id)
             |ORDER BY doc_id""".stripMargin)),

    // quality-aware canonical selection over the same closure: the
    // LONGEST member represents each cluster (most-complete-variant
    // policy) instead of q61's min-id — one per-cluster window after
    // the transitive closure, nothing else moves.
    QuerySpec(
      "q139_canonical_by_quality",
      (s, dir) => DedupOps.canonicalByQualityFromClusters(
        Tables.documents(s, dir),
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents WHERE doc_id < 60)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM sh a JOIN sh b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
             |p AS (SELECT doc_i, doc_j FROM c
             |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
             |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
             |      UNION ALL SELECT doc_j, doc_i FROM p),
             |reach(node, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
             |j AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
             |      FROM cl JOIN documents d USING (doc_id)),
             |r AS (SELECT doc_id, cluster_id, n_chars,
             |             row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk,
             |             CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
             |      FROM j)
             |SELECT cluster_id, doc_id AS kept_doc_id, n_chars, n_members
             |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin)),

    // Dedup-health histogram over the same closure: clusters per size
    // + docs they hold — singleton-dominated is healthy, a fat tail
    // means the threshold is loose or a flood slipped the caps.
    QuerySpec(
      "q130_cluster_histogram",
      (s, dir) => DedupOps.clusterSizeHistogramFromClusters(
        DedupOps.clustersFor(Tables.documents(s, dir), tag = dir)),
      Some("""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents WHERE doc_id < 60)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM sh a JOIN sh b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
             |p AS (SELECT doc_i, doc_j FROM c
             |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
             |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
             |      UNION ALL SELECT doc_j, doc_i FROM p),
             |reach(node, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
             |sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
             |          FROM cl GROUP BY cluster_id)
             |SELECT n_members, CAST(COUNT(*) AS BIGINT) AS n_clusters,
             |       CAST(n_members * COUNT(*) AS BIGINT) AS n_docs
             |FROM sizes GROUP BY n_members
             |ORDER BY n_members""".stripMargin)),

    // incremental corpus build: new batch deduplicated against the
    // existing corpus's fingerprint set — one anti-join, no pairwise
    // work against history
    QuerySpec(
      "q92_incremental_dedup",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        DedupOps.incrementalExactDedup(
          docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 400))
      },
      Some("""WITH ex AS (SELECT DISTINCT md5(text) AS fp_md5 FROM documents WHERE doc_id < 400),
             |b AS (SELECT doc_id, md5(text) AS fp_md5, lang, source,
             |             MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
             |      FROM documents WHERE doc_id >= 400)
             |SELECT doc_id, fp_md5, lang, source FROM b
             |WHERE doc_id = keeper AND fp_md5 NOT IN (SELECT fp_md5 FROM ex)
             |ORDER BY doc_id""".stripMargin)),

    // incremental NEAR-dedup: the new batch band-joins the STORED
    // corpus signatures — catches the reformatted copies q92's byte
    // hash misses; cost scales with the batch, never history². The
    // stored side IS the SketchShared table: the suite query re-reads
    // sketches computed once at "ingest", re-shingling nothing.
    QuerySpec(
      "q109_incremental_near_dedup",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val sk = SketchShared.sketches(s, dir)
          .filter(col("sig").isNotNull).select(col("doc_id"), col("sig"))
        DedupOps.incrementalNearDedupFromSigs(
          Tables.documents(s, dir).filter(col("doc_id") >= 450).select(col("doc_id")),
          sk.filter(col("doc_id") >= 450), sk.filter(col("doc_id") < 450))
      },
      Some(q109OracleSql)),

    // data-mixing buckets: quality deciles via ntile with total
    // deterministic order
    QuerySpec(
      "q93_quality_deciles",
      (s, dir) => TextOps.qualityDeciles(Tables.documents(s, dir)),
      Some(s"""WITH q AS (SELECT doc_id, quality FROM ($qualityPerDocSql)),
             |d AS (SELECT doc_id, quality,
             |             CAST(ntile(10) OVER (ORDER BY quality, doc_id) AS BIGINT) AS decile
             |      FROM q)
             |SELECT decile, COUNT(*) AS n_docs, MIN(quality) AS min_q, MAX(quality) AS max_q
             |FROM d GROUP BY decile
             |ORDER BY decile""".stripMargin)),

    // growth-stable split assignment by key hash (engine-specific
    // growth-stable split: bucket = pmod(xxhash64(doc_id), 10) — the
    // hash is reproduced bit-exact in the oracle (q94OracleSql);
    // determinism + disjointness additionally pinned in CoreSpec
    QuerySpec(
      "q94_hash_split",
      (s, dir) => TextOps.hashSplit(Tables.documents(s, dir)),
      Some(q94OracleSql)),

    // END-TO-END corpus curation: near-dedup → canonical docs → PII
    // scrub → quality score → token estimate, ONE plan, ONE oracle
    // (the recursive-CTE closure composed with every metric's SQL).
    // The production form swaps the capped exact edge set for the
    // sketch generator with no other change.
    QuerySpec(
      "q91_corpus_pipeline",
      (s, dir) => CorpusOps.curate(Tables.documents(s, dir)),
      Some(s"""WITH RECURSIVE sh AS (
             |  SELECT DISTINCT doc_id, s FROM (
             |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
             |    FROM documents WHERE doc_id < 60)),
             |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
             |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
             |      FROM sh a JOIN sh b USING (s)
             |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
             |p AS (SELECT doc_i, doc_j FROM c
             |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
             |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
             |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
             |      UNION ALL SELECT doc_j, doc_i FROM p),
             |reach(node, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
             |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
             |sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM cl GROUP BY cluster_id),
             |canon AS (SELECT doc_id, n_members FROM cl JOIN sizes USING (cluster_id)
             |          WHERE doc_id = cluster_id),
             |qsc AS ($qualityPerDocSql)
             |SELECT d.doc_id, canon.n_members,
             |  CAST(len(regexp_extract_all(d.text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(regexp_replace(d.text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'), '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+')) AS BIGINT) AS n_numbers,
             |  md5(regexp_replace(regexp_replace(d.text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'), '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUMBER>', 'g')) AS clean_fp,
             |  qsc.quality,
             |  CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_pieces
             |FROM documents d JOIN canon USING (doc_id) JOIN qsc USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // The production near-dedup pipeline: MinHash-LSH ∪ SimHash sketch
    // edges (full corpus, no doc cap) -> connected components ->
    // canonical corpus. Both sketch chains are deterministic, so the
    // whole pipeline oracles: sketch CTEs + the q61 recursive-CTE
    // transitive closure. Recall behavior asserted in TextDedupSpec.
    QuerySpec(
      "q70_near_dedup_sketch",
      (s, dir) => DedupOps.nearDedupFromPairSets(
        Tables.documents(s, dir),
        SketchShared.minhashPairs(s, dir), SketchShared.simhashPairs(s, dir)),
      Some(q70OracleSql)),

    // LSH candidates verified with EXACT Jaccard on the pair's shingle
    // sets — exactness bounded to candidates, never all pairs.
    QuerySpec(
      "q73_verified_jaccard",
      (s, dir) => DedupOps.verifiedJaccardPairsFromShared(
        SketchShared.sketches(s, dir), SketchShared.minhashPairs(s, dir)),
      Some(q73OracleSql)),

    // banding calibration: candidates/recall/precision per (bands,
    // width) config over the STORED 32-lane signatures vs exact
    // shingle-Jaccard truth on the calibration sample — the report
    // that sizes q42's banding before a full pair-generation run.
    QuerySpec(
      "q159_lsh_tuning",
      (s, dir) => DedupOps.lshTuningReportFromTruth(
        SketchShared.sketches(s, dir), SketchShared.calibrationTruth(s, dir)),
      Some(q159OracleSql)),

    // sparse-vector all-pairs similarity over the STORED postings:
    // inverted-index self-join with common terms pruned (df ≤ 25 —
    // Σdf² ≤ cap·|postings| bounds the join), BIGINT dot/norms, one
    // sqrt + one division at the end.
    QuerySpec(
      "q160_sparse_cosine_pairs",
      (s, dir) => RetrievalOps.sparseCosinePairs(RetrievalShared.postings(s, dir)),
      Some("""WITH p AS (
             |  SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM (
             |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |    FROM documents) GROUP BY w, doc_id),
             |rare AS (SELECT p.* FROM p
             |         JOIN (SELECT w FROM p GROUP BY w HAVING COUNT(*) <= 25) u USING (w)),
             |norms AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
             |          FROM rare GROUP BY doc_id),
             |dots AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
             |                CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
             |         FROM rare a JOIN rare b ON a.w = b.w AND a.doc_id < b.doc_id
             |         GROUP BY 1, 2),
             |sc AS (SELECT doc_i, doc_j, dot,
             |              (CAST(dot AS DOUBLE)
             |                    / sqrt(CAST(ni.n2 AS DOUBLE) * CAST(nj.n2 AS DOUBLE))) AS cosine
             |       FROM dots JOIN norms ni ON doc_i = ni.doc_id
             |                 JOIN norms nj ON doc_j = nj.doc_id)
             |SELECT doc_i, doc_j, dot, cosine FROM sc
             |WHERE cosine >= 0.3 ORDER BY doc_i, doc_j""".stripMargin)),

    // Deterministic data mixing: per-source weights 0 / 0.5 / 2 / 2.25
    // exercise drop, down-sample, integer and fractional up-sample;
    // membership from xxhash64(doc_id), never rand() (see
    // CorpusOps.mixCorpus for why that is the production property).
    QuerySpec(
      "q104_corpus_mix",
      (s, dir) => CorpusOps.mixCorpus(Tables.documents(s, dir),
        Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.0, "src3" -> 2.25)),
      Some(q104OracleSql)),

    // The mix-design INPUT: temperature-scaled (α = 1/2) per-source
    // weights — ⌊√tokens⌋ quantized to BIGINT so every share divides
    // exact integer sums (deterministic cross-engine; IEEE sqrt is
    // correctly rounded in both). Feeds q104's weight map.
    QuerySpec(
      "q124_temperature_mix",
      (s, dir) => CorpusOps.temperatureMixWeights(Tables.documents(s, dir)),
      Some("""WITH per AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source),
             |w AS (SELECT source, n_docs, n_tokens,
             |             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
             |      FROM per),
             |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
             |               CAST(SUM(w_sqrt) AS BIGINT) AS tot_w FROM w)
             |SELECT source, n_docs, n_tokens, w_sqrt,
             |       (CAST(n_tokens AS DOUBLE) / tot_tokens) AS raw_share,
             |       (CAST(w_sqrt AS DOUBLE) / tot_w) AS temp_share,
             |       ((CAST(w_sqrt AS DOUBLE) / tot_w) / (CAST(n_tokens AS DOUBLE) / tot_tokens)) AS upweight
             |FROM w CROSS JOIN tot ORDER BY source""".stripMargin)),

    // budget → allocation: the temperature split applied to a fixed
    // token budget as exact integer floor division (DECIMAL(38,0)
    // product — overflow-free at 100 TB masses), with implied epochs
    // and single-pass sampling rates per source.
    QuerySpec(
      "q134_token_budget",
      (s, dir) => CorpusOps.tokenBudgetPlan(Tables.documents(s, dir)),
      Some("""WITH per AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source),
             |w AS (SELECT source, n_docs, n_tokens,
             |             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
             |      FROM per),
             |tot AS (SELECT CAST(SUM(w_sqrt) AS BIGINT) AS tot_w FROM w),
             |plan AS (
             |  SELECT source, n_docs, n_tokens, w_sqrt,
             |         CAST((CAST(w_sqrt AS HUGEINT) * 200000) // tot_w AS BIGINT) AS target_tokens
             |  FROM w CROSS JOIN tot)
             |SELECT source, n_docs, n_tokens, w_sqrt, target_tokens,
             |       (CAST(target_tokens AS DOUBLE) / n_tokens) AS epochs,
             |       (LEAST(1.0, CAST(target_tokens AS DOUBLE) / n_tokens)) AS sample_rate
             |FROM plan ORDER BY source""".stripMargin)),

    // the q134 plan EXECUTED as a deterministic hash-Bernoulli draw:
    // integer ppm thresholds from the exact-DECIMAL targets,
    // membership = pmod(xxh64(doc_id), 1e6) < ppm — rate-based (doc
    // verdicts independent of the rest of the corpus), stateless,
    // shuffle-free.
    QuerySpec(
      "q175_rate_sample_exec",
      (s, dir) => CorpusOps.executeTokenBudgetPlan(Tables.documents(s, dir)),
      Some {
        import Xxh64DocIdSql.{ctes, tos}
        s"""WITH $ctes,
           |per AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT) AS n_tokens
           |  FROM documents GROUP BY source),
           |w AS (SELECT source, n_tokens,
           |             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt
           |      FROM per),
           |tot AS (SELECT CAST(SUM(w_sqrt) AS BIGINT) AS tot_w FROM w),
           |plan AS (
           |  SELECT source, n_tokens,
           |         CAST((CAST(w_sqrt AS HUGEINT) * 200000) // tot_w AS BIGINT) AS target_tokens
           |  FROM w CROSS JOIN tot),
           |pp AS (SELECT source,
           |              CAST(LEAST(1000000, (CAST(target_tokens AS HUGEINT) * 1000000)
           |                   // n_tokens) AS BIGINT) AS ppm
           |       FROM plan),
           |k AS (SELECT doc_id,
           |             ((${tos("h8")} % 1000000) + 1000000) % 1000000 AS sample_key
           |      FROM s10)
           |SELECT d.doc_id, d.source, pp.ppm, CAST(k.sample_key AS BIGINT) AS sample_key
           |FROM documents d JOIN pp USING (source) JOIN k USING (doc_id)
           |WHERE k.sample_key < pp.ppm
           |ORDER BY d.doc_id""".stripMargin
      }),

    // cross-source quantile calibration table: per (source, decile),
    // the exact k-th order statistic next to the corpus-wide one —
    // built on value grids (the q179 machinery), no per-row global
    // rank window.
    QuerySpec(
      "q181_quantile_calibration",
      (s, dir) => CorpusOps.quantileCalibration(Tables.documents(s, dir)),
      Some("""WITH vals AS (
             |  SELECT source, CAST(length(text) AS BIGINT) AS v FROM documents),
             |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s FROM vals GROUP BY source),
             |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
             |scum AS (SELECT source, v, SUM(c) OVER (PARTITION BY source ORDER BY v
             |                                        ROWS UNBOUNDED PRECEDING) AS cum
             |         FROM (SELECT source, v, COUNT(*) AS c FROM vals GROUP BY source, v)),
             |gcum AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
             |         FROM (SELECT v, COUNT(*) AS c FROM vals GROUP BY v)),
             |dec AS (SELECT unnest(range(0, 10)) AS decile),
             |sk AS (SELECT ns.source, dec.decile, ((n_s - 1) * decile) // 9 + 1 AS k
             |       FROM ns CROSS JOIN dec),
             |sval AS (SELECT sk.source, sk.decile, sk.k, MIN(scum.v) AS src_value
             |         FROM sk JOIN scum ON scum.source = sk.source AND scum.cum >= sk.k
             |         GROUP BY sk.source, sk.decile, sk.k),
             |gk AS (SELECT dec.decile, ((n - 1) * decile) // 9 + 1 AS kg
             |       FROM nt CROSS JOIN dec),
             |gval AS (SELECT gk.decile, MIN(gcum.v) AS global_value
             |         FROM gk JOIN gcum ON gcum.cum >= gk.kg GROUP BY gk.decile)
             |SELECT sval.source, CAST(sval.decile AS BIGINT) AS decile,
             |       CAST(sval.k AS BIGINT) AS k_src, src_value, global_value
             |FROM sval JOIN gval USING (decile)
             |ORDER BY source, decile""".stripMargin)),

    // deterministic contrastive negatives: negative j of anchor a is
    // pmod(xxh64(a·1000003 + j), n) — stateless, reproducible, no
    // RNG; accidental self-pairs dropped.
    QuerySpec(
      "q184_negative_samples",
      (s, dir) => CorpusOps.negativeSamples(Tables.documents(s, dir)),
      Some {
        import Xxh64DocIdSql.{chainFrom, tos}
        s"""WITH ${chainFrom(
             "SELECT doc_id, j, CAST(doc_id * 1000003 + j AS HUGEINT) AS k " +
               "FROM documents CROSS JOIN (SELECT unnest(range(0, 4)) AS j)",
             "doc_id, j")},
           |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
           |neg AS (SELECT doc_id, j, ((${tos("h8")} % n) + n) % n AS neg_id
           |        FROM s10 CROSS JOIN nn)
           |SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(neg_id AS BIGINT) AS neg_id
           |FROM neg WHERE neg_id <> doc_id
           |ORDER BY doc_id, j""".stripMargin
      }),

    // deterministic training-order shuffle: xxhash64(doc_id) as the
    // permutation key, shard = key mod 8, pos = rank within shard —
    // no global sort; the oracle replays the exact XXH64 chain.
    QuerySpec(
      "q141_seeded_shuffle",
      (s, dir) => CorpusOps.seededShuffle(Tables.documents(s, dir)),
      Some(q141OracleSql)),

    // exactly-k-per-stratum deterministic sample by smallest
    // xxhash64(doc_id) — q82's seeded Bernoulli is rows-only by
    // design; this form is fully hash-match-able.
    QuerySpec(
      "q142_hash_stratified_sample",
      (s, dir) => CorpusOps.hashStratifiedSample(Tables.documents(s, dir)),
      Some(q142OracleSql)),

    // deterministic WEIGHTED priority sample: inclusion odds rise
    // with token mass via priority = xxh64-uniform DIV weight, k
    // smallest per source — weighted sampling with no RNG state and
    // no pow/ln replay risk (pure BIGINT ops on both engines).
    QuerySpec(
      "q195_weighted_sample",
      (s, dir) => CorpusOps.weightedPrioritySample(Tables.documents(s, dir)),
      Some(q195OracleSql)),

    // dynamic-batching planner: smallest power-of-two length bucket
    // per doc (integer array-min over a literal bucket list — no
    // log2), batches of 8 in doc_id order, per-batch fill accounting.
    QuerySpec(
      "q148_length_batches",
      (s, dir) => CorpusOps.lengthBucketBatches(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents WHERE regexp_matches(text, '[^ ]')),
             |b AS (SELECT doc_id, n_tokens,
             |             COALESCE(CAST(list_min(list_filter([16,32,64,128,256,512,1024,2048,4096,8192],
             |                                                x -> x >= n_tokens)) AS BIGINT), 8192) AS bucket
             |      FROM t),
             |c AS (SELECT *, LEAST(n_tokens, bucket) AS carried,
             |             CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS rk
             |      FROM b),
             |g AS (SELECT bucket, (rk - 1) // 8 AS batch_id, CAST(COUNT(*) AS BIGINT) AS n_seqs,
             |             CAST(SUM(carried) AS BIGINT) AS n_tokens,
             |             CAST(SUM(bucket - carried) AS BIGINT) AS pad_tokens
             |      FROM c GROUP BY bucket, batch_id)
             |SELECT bucket, batch_id, n_seqs, n_tokens, pad_tokens,
             |       (CAST(n_tokens AS DOUBLE) / (n_seqs * bucket)) AS fill_frac
             |FROM g ORDER BY bucket, batch_id""".stripMargin)),

    // per-registered-domain corpus profile: volume, hosts, token
    // mass, within-domain exact-dup mass + rate — the rollup that
    // drives per-domain dedup budgets and mixing priors. The url is
    // the deterministic fixture synthesis (WebOps.syntheticUrls);
    // real corpora feed their crawl url column.
    QuerySpec(
      "q149_domain_profile",
      (s, dir) => WebOps.domainProfile(Tables.documents(s, dir)),
      Some("""WITH u AS (
             |  SELECT doc_id, text,
             |         'https://' || (['www','cdn','blog'])[CAST(doc_id % 3 AS INT) + 1]
             |           || '.' || source || '.example/' || lang || '/' || doc_id AS url
             |  FROM documents),
             |h AS (
             |  SELECT doc_id, text,
             |         regexp_extract(url, '^https?://([^/]+)', 1) AS host
             |  FROM u),
             |b AS (
             |  SELECT doc_id, host,
             |         regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
             |         md5(text) AS fp,
             |         CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS ntok
             |  FROM h),
             |pf AS (SELECT domain, fp, CAST(COUNT(*) AS BIGINT) AS c,
             |              CAST(SUM(ntok) AS BIGINT) AS t
             |       FROM b GROUP BY domain, fp),
             |r AS (SELECT domain, CAST(SUM(c) AS BIGINT) AS n_docs,
             |             CAST(SUM(t) AS BIGINT) AS n_tokens,
             |             CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS n_dup_docs
             |      FROM pf GROUP BY domain),
             |hh AS (SELECT domain, CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
             |       FROM b GROUP BY domain)
             |SELECT r.domain, n_docs, n_hosts, n_tokens, n_dup_docs,
             |       (CAST(n_dup_docs AS DOUBLE) / n_docs) AS dup_rate
             |FROM r JOIN hh USING (domain)
             |ORDER BY domain""".stripMargin)),

    // hot-domain flattener: at most k docs per registered domain by
    // smallest xxhash64(doc_id) — q142's exactly-k contract keyed on
    // the domain; the oracle replays the full XXH64 chain.
    QuerySpec(
      "q150_domain_capped_sample",
      (s, dir) => WebOps.domainCappedSample(Tables.documents(s, dir)),
      Some(q150OracleSql)),

    // perceptual near-dup over media payloads: 64-bit window-energy
    // pHash stub → the SimHash band machinery at the scale-safe
    // defaults (bands=8 → 256-value chunks, radius 7). The fixture's
    // docs are genuinely unrelated (min pairwise hamming 8), so the
    // CORRECT answer here is zero pairs — the oracle replays the
    // integer phash and brute-forces pairs, certifying that
    // emptiness; injected-near-dup pair semantics are pinned in
    // SimilarityMultimodalSpec. (A bands=16/radius-12 run surfaces
    // the fixture's random near-collisions but costs width-4 chunk
    // buckets — measured 11.7 s at sf0.1 vs sub-second here — the
    // LSH trade the mediaNearDupPairs scaladoc documents.)
    QuerySpec(
      "q151_media_near_dup",
      (s, dir) => MultimodalOps.mediaNearDupPairs(Tables.documents(s, dir)),
      Some(q151OracleSql)),

    // two-stage hybrid retrieval: BM25 recall from the stored index,
    // embedding-cosine rerank against each query's rank-1 anchor doc
    // — stage 2 is candidate-sized (queries × kLex), never corpus-
    // sized; the oracle replays BM25 + the q46 cosine end to end.
    QuerySpec(
      "q152_hybrid_rerank",
      (s, dir) => RetrievalOps.hybridRerank(
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir),
        Tables.embeddings(s, dir)),
      Some(q152OracleSql)),

    // reciprocal-rank fusion over the same candidate set: blends the
    // lexical and cosine RANKS (1/(60+r_lex) + 1/(60+r_cos)) instead
    // of replacing one order with the other — integer ranks, two IEEE
    // divisions in fixed order, no transcendentals.
    QuerySpec(
      "q173_rrf_fusion",
      (s, dir) => RetrievalOps.rrfFusion(
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir),
        Tables.embeddings(s, dir)),
      Some(q173OracleSql)),

    // retrieval eval harness: recall@10 + first-relevant reciprocal
    // rank per query against the deterministic boolean-AND relevance
    // oracle (doc relevant iff it contains every query term) — no
    // labels needed, exact counts, replayable.
    QuerySpec(
      "q180_retrieval_metrics",
      (s, dir) => RetrievalOps.retrievalMetrics(
        RetrievalShared.postings(s, dir), RetrievalShared.docLengths(s, dir)),
      Some(q180OracleSql)),

    // q134's sqrt-weighted token budget keyed on the registered
    // domain + the hard per-domain share cap (20% of budget) —
    // domain-aware mixing's hot-domain guard; integer-exact targets.
    QuerySpec(
      "q153_domain_token_budget",
      (s, dir) => WebOps.domainTokenBudget(Tables.documents(s, dir)),
      Some("""WITH u AS (
             |  SELECT doc_id, text,
             |         'https://' || (['www','cdn','blog'])[CAST(doc_id % 3 AS INT) + 1]
             |           || '.' || source || '.example/' || lang || '/' || doc_id AS url
             |  FROM documents),
             |h AS (
             |  SELECT doc_id, text,
             |         regexp_extract(regexp_extract(url, '^https?://([^/]+)', 1),
             |                        '([^.]+\.[^.]+)$', 1) AS domain
             |  FROM u),
             |t AS (SELECT domain,
             |             CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_toks
             |      FROM h),
             |w AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             |             CAST(FLOOR(SQRT(CAST(SUM(n_toks) AS DOUBLE))) AS BIGINT) AS w_sqrt
             |      FROM t GROUP BY domain),
             |tot AS (SELECT SUM(w_sqrt) AS tot_w FROM w),
             |plan AS (SELECT domain, n_docs, n_tokens, w_sqrt,
             |                CAST((CAST(w_sqrt AS HUGEINT) * 200000) // tot_w AS BIGINT) AS target_tokens
             |         FROM w CROSS JOIN tot)
             |SELECT domain, n_docs, n_tokens, w_sqrt, target_tokens,
             |       LEAST(target_tokens, 40000) AS capped_tokens,
             |       (LEAST(1.0, CAST(LEAST(target_tokens, 40000) AS DOUBLE) / n_tokens)) AS sample_rate
             |FROM plan ORDER BY domain""".stripMargin)),

    // URL canonicalization + URL-level dup-group election: the messy
    // crawl-frontier fixture reaches each content page via two
    // mangled aliases; the canonical chain (fragment/utm strip,
    // scheme+host lowercase, non-root trailing-slash trim — all
    // backreference-free, Java/RE2-identical) must collapse each
    // pair. DuckDB replays with the 'g' flag to match Spark's
    // replace-all regexp_replace.
    QuerySpec(
      "q154_url_canonical_groups",
      (s, dir) => WebOps.canonicalDupGroups(Tables.documents(s, dir)),
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    CASE CAST(doc_id % 4 AS INT)
             |      WHEN 0 THEN 'HTTPS://WWW.SRC' || ((doc_id // 2) % 20) || '.EXAMPLE/page/' || (doc_id // 2)
             |      WHEN 1 THEN 'https://www.src' || ((doc_id // 2) % 20) || '.example/page/' || (doc_id // 2) || '?utm_source=feed'
             |      WHEN 2 THEN 'https://www.src' || ((doc_id // 2) % 20) || '.example/page/' || (doc_id // 2) || '#section-2'
             |      ELSE 'https://www.src' || ((doc_id // 2) % 20) || '.example/page/' || (doc_id // 2) || '/'
             |    END AS url
             |  FROM documents),
             |c1 AS (SELECT doc_id, url,
             |              regexp_replace(regexp_replace(regexp_replace(url,
             |                '#.*$', '', 'g'),
             |                'utm_[A-Za-z]+=[^&#]*&', '', 'g'),
             |                '[?&]utm_[A-Za-z]+=[^&#]*', '', 'g') AS a
             |       FROM u),
             |c2 AS (SELECT doc_id, url,
             |              lower(regexp_extract(a, '^([A-Za-z]+://[^/]*)', 1))
             |                || substr(a, len(regexp_extract(a, '^([A-Za-z]+://[^/]*)', 1)) + 1) AS b
             |       FROM c1),
             |c3 AS (SELECT doc_id, url,
             |              CASE WHEN regexp_matches(b, '://[^/]+/.+/$')
             |                   THEN substr(b, 1, len(b) - 1) ELSE b END AS canon_url
             |       FROM c2)
             |SELECT canon_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
             |       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_urls,
             |       MIN(doc_id) AS keeper
             |FROM c3 GROUP BY canon_url ORDER BY canon_url""".stripMargin)),

    // train/test leakage through URL mirrors: q154 canonical groups ×
    // the exact q94 split — leaking groups only, the fix list.
    QuerySpec(
      "q218_url_split_leakage",
      (s, dir) => WebOps.urlSplitLeakage(Tables.documents(s, dir)),
      Some(q218OracleSql)),

    // curation attrition funnel: docs/token mass surviving each q91
    // stage (q40 keeper → q61 closure → q114 gate → q62 decontam)
    // with the per-stage drop — the run's own datasheet.
    QuerySpec(
      "q220_curation_funnel",
      (s, dir) => CorpusOps.curationFunnel(Tables.documents(s, dir)),
      Some(q220OracleSql)),

    // License/compliance gate composed into the q220 funnel (VERDICT
    // r11 stretch): stage 5 admits only decontam survivors whose
    // source-domain registry verdict is `allow` — the one curation
    // gate family the engine lacked. Stages 0-4 replay the SAME CTEs
    // as q220's oracle, so the composition (not just the gate) is
    // what the oracle certifies.
    QuerySpec(
      "q257_license_funnel",
      (s, dir) => CorpusOps.licensedCurationFunnel(Tables.documents(s, dir)),
      Some(q257OracleSql)),

    // The q116 accounting pattern on the compliance dimension: every
    // document lands in exactly one (source, license, verdict) cell,
    // so Σ n_docs over the report = corpus count — the conservation
    // property the q257 gate composition depends on (asserted
    // cross-query in TextDedupSpec).
    QuerySpec(
      "q258_license_accounting",
      (s, dir) => CorpusOps.licenseAccounting(Tables.documents(s, dir)),
      Some(s"""WITH $licenseDimCte
              |SELECT source, license, verdict,
              |       CAST(COUNT(*) AS BIGINT) AS n_docs,
              |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
              |FROM documents JOIN ldv USING (source)
              |GROUP BY 1, 2, 3
              |ORDER BY source""".stripMargin)),

    // q220's per-tick form: the batch flows through the INCREMENTAL
    // curation stages — exact vs the stored fingerprint space, the
    // per-doc quality gate, and the q109 near-dup probe of the stored
    // sketch table — and the report prices what the tick admitted.
    // The stored corpus text is never read; the oracle replays every
    // stage including the full embedded q109 minhash chain.
    QuerySpec(
      "q247_ingest_funnel",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        val sk = SketchShared.sketches(s, dir)
          .filter(col("sig").isNotNull).select(col("doc_id"), col("sig"))
        CorpusOps.ingestFunnel(
          DedupOps.fingerprintStore(docs.filter(col("doc_id") < 450)),
          sk.filter(col("doc_id") < 450),
          docs.filter(col("doc_id") >= 450), sk.filter(col("doc_id") >= 450))
      },
      Some(q247OracleSql)),

    // q247 + the q257 compliance stage (q262): the incremental ingest
    // funnel with license_gate appended as stage 4 — the registry dim
    // broadcast-semi-joins the near-dup survivors; stages 0-3 share
    // q247's CTE text verbatim, so the composition cannot drift. The
    // streaming form (StreamOps.streamingLicensedIngestTick) runs this
    // per tick, with store growth gated on the final stage.
    QuerySpec(
      "q262_licensed_ingest_funnel",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        val sk = SketchShared.sketches(s, dir)
          .filter(col("sig").isNotNull).select(col("doc_id"), col("sig"))
        CorpusOps.licensedIngestFunnel(
          DedupOps.fingerprintStore(docs.filter(col("doc_id") < 450)),
          sk.filter(col("doc_id") < 450),
          docs.filter(col("doc_id") >= 450), sk.filter(col("doc_id") >= 450),
          CorpusOps.sourceLicenseDim(docs))
      },
      Some(q262OracleSql)),

    // incremental-refresh work list: full-outer fingerprint diff of
    // the current snapshot vs a deterministic prior one — only the
    // added/changed/removed rows survive (the rows a refresh must
    // touch); fingerprints computed BEFORE the join so text never
    // ships through the shuffle.
    QuerySpec(
      "q155_snapshot_diff",
      (s, dir) => CorpusOps.snapshotDiff(Tables.documents(s, dir)),
      Some("""WITH cur AS (
             |  SELECT doc_id, md5(text) AS cur_fp, lang, source FROM documents),
             |prev AS (
             |  SELECT doc_id,
             |         md5(CASE WHEN doc_id % 7 = 5 THEN substr(text, 1, 40)
             |                  ELSE text END) AS prev_fp
             |  FROM documents WHERE doc_id % 7 <> 3
             |  UNION ALL
             |  SELECT doc_id + 1000000, md5('retired-' || doc_id)
             |  FROM documents WHERE doc_id % 97 = 0),
             |j AS (
             |  SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id, cur_fp, prev_fp,
             |         lang, source,
             |         CASE WHEN prev_fp IS NULL THEN 'added'
             |              WHEN cur_fp IS NULL THEN 'removed'
             |              WHEN cur_fp = prev_fp THEN 'unchanged'
             |              ELSE 'changed' END AS status
             |  FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id)
             |SELECT doc_id, status, cur_fp, prev_fp, lang, source
             |FROM j WHERE status <> 'unchanged'
             |ORDER BY doc_id""".stripMargin)),

    // CDC APPLY: the MERGE of q155's work list onto the previous
    // snapshot. The oracle is md5(text) of the CURRENT table — the
    // identity apply(prev, diff(cur, prev)) ≡ cur IS the check: a
    // hash match proves the merge reconstructs the table losslessly.
    QuerySpec(
      "q189_apply_diff",
      (s, dir) => CorpusOps.applySnapshotDiff(Tables.documents(s, dir)),
      Some("""SELECT doc_id, md5(text) AS fp FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // recency-weighted refresh plan: 30-day age buckets, halving
    // integer weights, exact integer budget split — ≤12-row output
    // regardless of corpus size.
    QuerySpec(
      "q157_freshness_plan",
      (s, dir) => CorpusOps.freshnessSamplePlan(Tables.documents(s, dir)),
      Some("""WITH aged AS (
             |  SELECT doc_id, (doc_id * 131 + 17) % 360 AS age_days FROM documents),
             |b AS (SELECT age_days // 30 AS age_bucket,
             |             CAST(COUNT(*) AS BIGINT) AS n_docs
             |      FROM aged GROUP BY 1),
             |w AS (SELECT age_bucket, n_docs,
             |             CAST(CAST(1 AS BIGINT) << CAST(11 - age_bucket AS INT) AS BIGINT) AS weight
             |      FROM b),
             |m AS (SELECT age_bucket, n_docs, weight, weight * n_docs AS mass FROM w),
             |tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS tot_mass FROM m)
             |SELECT age_bucket, n_docs, weight,
             |       LEAST(n_docs, CAST((mass * 2000) // tot_mass AS BIGINT)) AS target_docs,
             |       (CAST(LEAST(n_docs, CAST((mass * 2000) // tot_mass AS BIGINT)) AS DOUBLE)
             |             / n_docs) AS sample_rate
             |FROM m CROSS JOIN tot ORDER BY age_bucket""".stripMargin)),

    // partition fingerprint manifest: per-(source, lang) count, char
    // mass, and an order-independent md5-prefix-sum checksum — the
    // O(partitions) audit artifact two snapshots diff to localize
    // change.
    QuerySpec(
      "q158_partition_manifest",
      (s, dir) => AggregateOps.partitionManifest(Tables.documents(s, dir)),
      Some("""SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             |       CAST(SUM(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)) AS BIGINT)
             |         AS content_checksum
             |FROM documents GROUP BY source, lang
             |ORDER BY source, lang""".stripMargin)),

    // clustering-depth audit: per file, how many other files' sort-
    // column ranges overlap — the re-sort/Z-order trigger evidence;
    // everything past one rollup is manifest-sized.
    QuerySpec(
      "q204_clustering_depth",
      (s, dir) => WriteOps.clusteringDepthReport(Tables.orders(s, dir)),
      Some("""WITH m AS (
             |  SELECT o_orderkey // 2000 AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |         MIN(o_orderdate) AS d_lo, MAX(o_orderdate) AS d_hi
             |  FROM orders GROUP BY 1),
             |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_files FROM m),
             |ov AS (SELECT a.file_id, CAST(COUNT(b.file_id) AS BIGINT) AS overlap_files
             |       FROM m a LEFT JOIN m b
             |         ON a.d_lo <= b.d_hi AND b.d_lo <= a.d_hi AND a.file_id <> b.file_id
             |       GROUP BY a.file_id)
             |SELECT m.file_id, m.n_rows, m.d_lo, m.d_hi, ov.overlap_files, nf.n_files,
             |       (CAST(ov.overlap_files AS DOUBLE)
             |             / GREATEST(n_files - 1, 1)) AS overlap_frac
             |FROM m JOIN ov USING (file_id) CROSS JOIN nf
             |ORDER BY file_id""".stripMargin)),

    // Z-order layout zone maps: rows bucket by equal-width ranges of
    // the 16-bit Morton interleave (pure >>/&/*/+ arithmetic — the
    // oracle evaluates the IDENTICAL expression text); per-file
    // min/max of BOTH dims is the rectangle scans prune against.
    QuerySpec(
      "q193_zorder_layout",
      (s, dir) => WriteOps.zorderLayout(Tables.lineitem(s, dir)),
      Some(s"""WITH z AS (
              |  SELECT l_partkey, l_suppkey,
              |         ${WriteOps.mortonSqlExpr("l_partkey", "l_suppkey")} AS zval
              |  FROM lineitem),
              |b AS (SELECT MIN(zval) AS zlo, MAX(zval) AS zhi FROM z),
              |f AS (SELECT z.*, ((zval - zlo) * 64) // (zhi - zlo + 1) AS file_id
              |      FROM z CROSS JOIN b)
              |SELECT CAST(file_id AS BIGINT) AS file_id,
              |       CAST(COUNT(*) AS BIGINT) AS n_rows,
              |       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
              |       CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
              |       CAST(MAX(l_suppkey) AS BIGINT) AS max_supp,
              |       CAST((MAX(l_partkey) - MIN(l_partkey) + 1)
              |            * (MAX(l_suppkey) - MIN(l_suppkey) + 1) AS BIGINT) AS rect_area
              |FROM f GROUP BY file_id ORDER BY file_id""".stripMargin)),

    // small-file compaction plan: files (never split, file_id order)
    // bin-pack into ≈target-byte output groups by offset packing over
    // a per-partition running byte sum — the scheduled coalesce pass
    // an incremental table needs; input is the O(files) manifest.
    QuerySpec(
      "q168_compaction_plan",
      (s, dir) => CorpusOps.compactionPlan(
        CorpusOps.syntheticFileManifest(Tables.documents(s, dir))),
      Some("""WITH files AS (
             |  SELECT source, file_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(nb) AS BIGINT) AS n_bytes
             |  FROM (SELECT source, doc_id, length(text) AS nb,
             |               (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) // 4
             |                 AS file_id
             |        FROM documents)
             |  GROUP BY source, file_id),
             |packed AS (
             |  SELECT *, SUM(n_bytes) OVER (PARTITION BY source ORDER BY file_id
             |                               ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM files)
             |SELECT source, CAST((cum - 1) // 4096 AS BIGINT) AS group_id,
             |       CAST(COUNT(*) AS BIGINT) AS n_files,
             |       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
             |       CAST(MIN(file_id) AS BIGINT) AS file_lo,
             |       CAST(MAX(file_id) AS BIGINT) AS file_hi
             |FROM packed GROUP BY source, group_id
             |ORDER BY source, group_id""".stripMargin)),

    // retrieval-side splitter: fixed token windows with overlap,
    // exact integer ceiling division for the chunk count — per-row
    // projection work, no shuffle.
    QuerySpec(
      "q136_token_chunks",
      (s, dir) => CorpusOps.chunkTokenWindows(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks,
             |         CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS n
             |  FROM documents),
             |c AS (SELECT doc_id, toks, n,
             |             1 + CASE WHEN n > 64 THEN (n - 64 + 47) // 48 ELSE 0 END AS n_chunks
             |      FROM t WHERE n > 0),
             |e AS (SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM c)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |       CAST(chunk_id * 48 + 1 AS BIGINT) AS start_tok,
             |       CAST(LEAST(64, n - chunk_id * 48) AS BIGINT) AS n_toks,
             |       array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + LEAST(64, n - chunk_id * 48)), ' ') AS chunk_text
             |FROM e ORDER BY doc_id, chunk_id""".stripMargin)),

    // mix → pack composition: the loader's sequence spans over the
    // MIXED corpus, epochs as separate stream occupants (ordered by
    // (doc_id, epoch) so up-sampled copies are never window peers).
    QuerySpec(
      "q117_mixed_pack",
      (s, dir) => CorpusOps.packMixedSequences(Tables.documents(s, dir),
        Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.0, "src3" -> 2.25)),
      Some(q117OracleSql)),

    // Concat-and-chunk sequence packing: per-lang streams, window
    // cumsum → each doc's training-sequence span. Integer arithmetic
    // end to end → hash-match oracle (see CorpusOps.packSequences for
    // the per-stream 100 TB posture).
    QuerySpec(
      "q103_sequence_pack",
      (s, dir) => CorpusOps.packSequences(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM t WHERE n_tokens > 0)
             |SELECT lang, doc_id, n_tokens,
             |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |       CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
             |       CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset,
             |       CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
             |FROM c ORDER BY lang, doc_id""".stripMargin)),

    // packing provenance: per (lang, source) token/sequence footprint
    // through the q103 packing, plus the boundary-mixing count —
    // sequences a source SHARES with another source (invisible at doc
    // level, real at training time). Exact integers + one long/long
    // share division.
    QuerySpec(
      "q250_packing_provenance",
      (s, dir) => CorpusOps.packingProvenance(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT lang, source, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT lang, source, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM t WHERE n_tokens > 0),
             |p AS (
             |  SELECT lang, source, doc_id, n_tokens,
             |         CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |         CAST((cum - 1) // 2048 AS BIGINT) AS end_seq
             |  FROM c),
             |spans AS (
             |  SELECT DISTINCT lang, source, CAST(sq AS BIGINT) AS seq
             |  FROM p, unnest(range(start_seq, end_seq + 1)) AS u(sq)),
             |mixed AS (
             |  SELECT lang, seq FROM (
             |    SELECT lang, seq, COUNT(DISTINCT source) AS n_sources
             |    FROM spans GROUP BY lang, seq)
             |  WHERE n_sources >= 2),
             |base AS (
             |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
             |  FROM p GROUP BY lang, source),
             |nsq AS (
             |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_seqs
             |  FROM spans GROUP BY lang, source),
             |shr AS (
             |  SELECT spans.lang, spans.source, CAST(COUNT(*) AS BIGINT) AS n_shared_seqs
             |  FROM spans JOIN mixed ON mixed.lang = spans.lang AND mixed.seq = spans.seq
             |  GROUP BY spans.lang, spans.source),
             |lt AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens
             |       FROM base GROUP BY lang)
             |SELECT base.lang, base.source, n_docs, base.n_tokens, n_seqs,
             |       COALESCE(n_shared_seqs, 0) AS n_shared_seqs,
             |       CAST(base.n_tokens AS DOUBLE) / lang_tokens AS tok_share
             |FROM base
             |JOIN nsq ON nsq.lang = base.lang AND nsq.source = base.source
             |LEFT JOIN shr ON shr.lang = base.lang AND shr.source = base.source
             |JOIN lt ON lt.lang = base.lang
             |ORDER BY base.lang, base.source""".stripMargin)),

    // split-isolated packing: the q103 stream key extended to
    // (split, lang) so test tokens can never leak into train
    // sequences through concatenation — the document-level split
    // survives the packing step by construction. Split = the q94
    // doc-hash rule (production feeds q227/q231 cluster-aware
    // assignments instead — same column, nothing else moves).
    QuerySpec(
      "q234_split_packing",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod, when, xxhash64}
        val docs = Tables.documents(s, dir).withColumn("bucket",
          pmod(xxhash64(col("doc_id")), lit(10)))
          .withColumn("split", when(col("bucket") < 8, "train")
            .when(col("bucket") === 8, "val").otherwise("test"))
        CorpusOps.packSequencesBy(docs, Seq("split", "lang"))
      },
      Some(q234OracleSql)),

    // INCREMENTAL packing: a new-doc batch (shifted ids — the
    // monotone ingest-order contract) continues each stream from its
    // stored token mass instead of repacking the corpus; the oracle
    // repacks stored ∪ batch from scratch and keeps the batch rows,
    // proving the continuation exact.
    QuerySpec(
      "q238_incremental_pack",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, lit, pmod}
        val docs = Tables.documents(s, dir)
        val batch = docs.filter(pmod(col("doc_id"), lit(11)) === 7)
          .withColumn("doc_id", col("doc_id") + lit(3000000L))
        CorpusOps.packSequencesIncremental(docs, batch)
      },
      Some("""WITH b AS (
             |  SELECT doc_id + 3000000 AS doc_id, lang, text FROM documents WHERE doc_id % 11 = 7),
             |u AS (SELECT doc_id, lang, text FROM documents
             |      UNION ALL SELECT doc_id, lang, text FROM b),
             |t AS (SELECT lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |      FROM u),
             |c AS (SELECT lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |      FROM t WHERE n_tokens > 0)
             |SELECT lang, doc_id, n_tokens,
             |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |       CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
             |       CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset,
             |       CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
             |FROM c WHERE doc_id >= 3000000 ORDER BY lang, doc_id""".stripMargin)),

    // The per-stream corpus card: volume, token mass, ppm-integer
    // quality mean (floor-quantized per doc, exact BIGINT sum +
    // truncating div), exact-dup rate — the report mix weights are
    // set from. Composition of proven stages, one rollup.
    QuerySpec(
      "q110_corpus_card",
      (s, dir) => CorpusOps.corpusCard(Tables.documents(s, dir)),
      Some(s"""WITH q AS (SELECT doc_id, n_tokens, quality FROM ($qualityPerDocSql)),
             |d AS (
             |  SELECT doc_id, lang, source,
             |         doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
             |  FROM documents)
             |SELECT d.lang, d.source,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(q.n_tokens) AS BIGINT) AS n_tokens,
             |       CAST(CAST(SUM(CAST(floor(q.quality * 1000000.0) AS BIGINT)) AS BIGINT)
             |            // COUNT(*) AS BIGINT) AS avg_quality_ppm,
             |       CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
             |       CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate
             |FROM d JOIN q USING (doc_id)
             |GROUP BY d.lang, d.source
             |ORDER BY d.lang, d.source""".stripMargin)),

    // INCREMENTAL corpus card: the batch (shifted ids, every other
    // text perturbed so both the seen-fingerprint and the
    // batch-internal-keeper dup branches are live) folds into the
    // stored card state + fingerprint store; the oracle REBUILDS the
    // card from stored ∪ batch, so the hash match proves the merge
    // algebra and the monotone-id keeper stability.
    QuerySpec(
      "q243_incremental_card",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, lit, pmod, concat, when}
        val docs = Tables.documents(s, dir)
        val batch = docs.filter(pmod(col("doc_id"), lit(13)) === 5)
          .select((col("doc_id") + lit(3000000L)).as("doc_id"),
            col("lang"), col("source"),
            when(pmod(col("doc_id"), lit(2)) === 0,
              concat(col("text"), lit(" r11"))).otherwise(col("text")).as("text"))
        CorpusOps.corpusCardIncremental(
          CorpusOps.corpusCardState(docs),
          DedupOps.fingerprintStore(docs), batch)
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id + 3000000 AS doc_id, lang, source,
             |         CASE WHEN doc_id % 2 = 0 THEN text || ' r11' ELSE text END AS text
             |  FROM documents WHERE doc_id % 13 = 5),
             |u AS (SELECT doc_id, lang, source, text FROM documents
             |      UNION ALL SELECT doc_id, lang, source, text FROM b),
             |q AS (SELECT doc_id, n_tokens, quality FROM (${qualityPerDocSqlOver("u")})),
             |d AS (
             |  SELECT doc_id, lang, source,
             |         doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup,
             |         doc_id >= 3000000 AS is_batch
             |  FROM u)
             |SELECT d.lang, d.source,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(q.n_tokens) AS BIGINT) AS n_tokens,
             |       CAST(CAST(SUM(CAST(floor(q.quality * 1000000.0) AS BIGINT)) AS BIGINT)
             |            // COUNT(*) AS BIGINT) AS avg_quality_ppm,
             |       CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups,
             |       CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate,
             |       CAST(SUM(CASE WHEN d.is_batch THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_docs
             |FROM d JOIN q USING (doc_id)
             |GROUP BY d.lang, d.source
             |ORDER BY d.lang, d.source""".stripMargin)),

    // Post-packing decontamination: an eval-leaked doc poisons every
    // sequence it touches — manifest × per-doc flags → per-sequence
    // drop/keep rollup, hash-matched as one composed oracle.
    QuerySpec(
      "q107_contaminated_sequences",
      (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        CorpusOps.contaminatedSequences(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50))
      },
      Some("""WITH t AS (
             |  SELECT lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id >= 50),
             |c AS (
             |  SELECT lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM t WHERE n_tokens > 0),
             |sp AS (
             |  SELECT lang, doc_id, n_tokens,
             |         CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |         CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
             |         CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset
             |  FROM c),
             |e AS (
             |  SELECT lang, doc_id, n_tokens, tok_offset, start_seq,
             |         CAST(unnest(range(start_seq, end_seq + 1)) AS BIGINT) AS seq_id
             |  FROM sp),
             |mani AS (
             |  SELECT lang, seq_id, doc_id,
             |         CAST(LEAST(start_seq * 2048 + tok_offset + n_tokens, seq_id * 2048 + 2048)
             |              - GREATEST(start_seq * 2048 + tok_offset, seq_id * 2048) AS BIGINT) AS n_from_doc
             |  FROM e),
             |tok2 AS (
             |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t2 FROM documents),
             |ng AS (
             |  SELECT DISTINCT doc_id, array_to_string(list_slice(t2, gi, gi + 4), ' ') AS g
             |  FROM (SELECT doc_id, t2, unnest(range(1, len(t2) - 3)) AS gi
             |        FROM tok2 WHERE len(t2) >= 5)),
             |hg AS (SELECT DISTINCT g FROM ng WHERE doc_id < 50),
             |shr AS (SELECT doc_id, COUNT(*) AS n_shared
             |        FROM ng JOIN hg USING (g)
             |        WHERE doc_id >= 50 GROUP BY doc_id),
             |fl AS (SELECT d.doc_id, COALESCE(shr.n_shared, 0) >= 5 AS flagged
             |       FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
             |       LEFT JOIN shr USING (doc_id))
             |SELECT m.lang, m.seq_id,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(CASE WHEN f.flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated_docs,
             |       CAST(SUM(CASE WHEN f.flagged THEN m.n_from_doc ELSE 0 END) AS BIGINT) AS n_contaminated_tokens,
             |       SUM(CASE WHEN f.flagged THEN 1 ELSE 0 END) > 0 AS drop_seq
             |FROM mani m JOIN fl f USING (doc_id)
             |GROUP BY m.lang, m.seq_id
             |ORDER BY m.lang, m.seq_id""".stripMargin)),

    // The packer's inverse: per training sequence, which docs compose
    // it and where — the loader-side artifact. Same stream posture,
    // same exact-integer oracle path.
    QuerySpec(
      "q105_sequence_manifest",
      (s, dir) => CorpusOps.sequenceManifest(Tables.documents(s, dir)),
      Some("""WITH t AS (
             |  SELECT lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM t WHERE n_tokens > 0),
             |sp AS (
             |  SELECT lang, doc_id, n_tokens,
             |         CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |         CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
             |         CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset
             |  FROM c),
             |e AS (
             |  SELECT lang, doc_id, n_tokens, tok_offset, start_seq,
             |         CAST(unnest(range(start_seq, end_seq + 1)) AS BIGINT) AS seq_id
             |  FROM sp),
             |g AS (
             |  SELECT lang, seq_id, doc_id, n_tokens,
             |         start_seq * 2048 + tok_offset AS g0,
             |         seq_id * 2048 AS s0,
             |         GREATEST(start_seq * 2048 + tok_offset, seq_id * 2048) AS take_from
             |  FROM e)
             |SELECT lang, seq_id, doc_id,
             |       CAST(take_from - s0 AS BIGINT) AS offset_in_seq,
             |       CAST(LEAST(g0 + n_tokens, s0 + 2048) - take_from AS BIGINT) AS n_from_doc,
             |       CAST(take_from - g0 AS BIGINT) AS doc_skip
             |FROM g ORDER BY lang, seq_id, offset_in_seq""".stripMargin)),

    // The corpus→loader terminus: manifest rows land sharded by
    // (lang, seq_id DIV 16) — one dir per shard, one file unless
    // maxRecordsPerFile rolls it — and the emitted shard manifest is
    // recomputed from the READ-BACK layout, so the oracle match
    // proves what landed, not what was meant to land. File-level
    // bounds asserted in IngestWriteSpec.
    QuerySpec(
      "q115_training_shards",
      (s, dir) => CorpusOps.writeTrainingShards(
        Tables.documents(s, dir), Catalog.tmpDir("shards", dir)),
      Some("""WITH t AS (
             |  SELECT lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM t WHERE n_tokens > 0),
             |sp AS (
             |  SELECT lang, doc_id, n_tokens,
             |         CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |         CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
             |         CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset
             |  FROM c),
             |e AS (
             |  SELECT lang, doc_id, n_tokens, tok_offset, start_seq,
             |         CAST(unnest(range(start_seq, end_seq + 1)) AS BIGINT) AS seq_id
             |  FROM sp),
             |g AS (
             |  SELECT lang, seq_id, doc_id, n_tokens,
             |         start_seq * 2048 + tok_offset AS g0,
             |         seq_id * 2048 AS s0,
             |         GREATEST(start_seq * 2048 + tok_offset, seq_id * 2048) AS take_from
             |  FROM e),
             |m AS (
             |  SELECT lang, seq_id,
             |         CAST(LEAST(g0 + n_tokens, s0 + 2048) - take_from AS BIGINT) AS n_from_doc
             |  FROM g)
             |SELECT lang, CAST(seq_id // 16 AS BIGINT) AS shard_id,
             |       MIN(seq_id) AS first_seq, MAX(seq_id) AS last_seq,
             |       CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs,
             |       CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       CAST(SUM(n_from_doc) AS BIGINT) AS n_tokens
             |FROM m GROUP BY lang, seq_id // 16
             |ORDER BY lang, shard_id""".stripMargin))
  )

  // ---------------------------------------------------------------- //
  // north-star: similarity search over `embeddings`
  // ---------------------------------------------------------------- //
  private def similarityQueries: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q46_cosine_topk",
      (s, dir) => SimilarityOps.cosineTopK(Tables.embeddings(s, dir)),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
             |s AS (SELECT qid, vec_id,
             |             list_inner_product(qe, e) /
             |               (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))) AS score
             |      FROM v CROSS JOIN q WHERE vec_id <> qid),
             |r AS (SELECT qid, vec_id, score,
             |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
             |      FROM s)
             |SELECT qid, vec_id, score, rn FROM r WHERE rn <= 10
             |ORDER BY qid, rn""".stripMargin)),

    QuerySpec(
      "q47_ann_lsh_topk",
      (s, dir) => SimilarityOps.annTopK(Tables.embeddings(s, dir)),
      Some(q47OracleSql)),

    QuerySpec(
      "q63_semantic_dedup",
      (s, dir) => SimilarityOps.semanticDedup(Tables.embeddings(s, dir)),
      Some(q63OracleSql)),

    // probe-only: the quantizer fit + assignments are built once per
    // (dir, nLists) via the session memo (VERDICT r4 "what's wrong" #1
    // — the index build does not belong in the query path). The
    // k-means FIT stays non-SQL, but the PROBE is pure relational
    // algebra over the persisted index state, which Verify exports to
    // SimilarityOps.IvfOracleDumpPath — so the oracle replays centroid
    // ranking, nProbe pruning, and exact in-list cosine from the SAME
    // fitted state (r7 verdict item 2; the q47/q102 pattern).
    QuerySpec(
      "q67_ivf_topk",
      (s, dir) => SimilarityOps.ivfTopK(
        SimilarityOps.ivfIndexFor(Tables.embeddings(s, dir), tag = dir),
        nQueries = 5, k = 10, nProbe = 4),
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
             |  FROM embeddings),
             |assign AS (
             |  SELECT vec_id, list_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |centers AS (
             |  SELECT c_list_id, CAST(centroid AS DOUBLE[]) AS c FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnorm FROM v WHERE vec_id < 5),
             |qd AS (
             |  SELECT qid, qe, qnorm, c_list_id,
             |         list_sum(list_transform(list_zip(qe, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM q CROSS JOIN centers),
             |probes AS (
             |  SELECT qid, qe, qnorm, c_list_id AS list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, c_list_id) AS pr FROM qd)
             |  WHERE pr <= 4),
             |cand AS (
             |  SELECT p.qid, p.qe, p.qnorm, v.vec_id, v.e, v.nrm
             |  FROM probes p JOIN assign a ON p.list_id = a.list_id JOIN v ON v.vec_id = a.vec_id
             |  WHERE v.vec_id <> p.qid),
             |s AS (
             |  SELECT qid, vec_id, list_inner_product(qe, e) / (qnorm * nrm) AS score
             |  FROM cand),
             |r AS (SELECT qid, vec_id, score,
             |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
             |      FROM s)
             |SELECT qid, vec_id, score, rn FROM r WHERE rn <= 10
             |ORDER BY qid, rn""".stripMargin),
      dumps = Seq(ivfDump)),

    // index health: per-list population/share from the persisted
    // assignments — the balance view that bounds probe cost; oracle
    // reads the same exported index state as q67
    QuerySpec(
      "q121_ivf_list_stats",
      (s, dir) => SimilarityOps.ivfListStats(
        SimilarityOps.ivfIndexFor(Tables.embeddings(s, dir), tag = dir)),
      Some("""WITH a AS (
             |  SELECT list_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |c AS (
             |  SELECT CAST(list_id AS BIGINT) AS list_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
             |  FROM a GROUP BY list_id)
             |SELECT list_id, n_vectors,
             |       CAST(n_vectors AS DOUBLE) / SUM(n_vectors) OVER () AS share
             |FROM c ORDER BY list_id""".stripMargin),
      dumps = Seq(ivfDump)),

    // IVF list label-purity: per-list majority label + ppm share off
    // the persisted assignment — list MEANING next to q121's balance.
    QuerySpec(
      "q221_ivf_purity",
      (s, dir) => SimilarityOps.ivfLabelPurity(
        Tables.embeddings(s, dir),
        SimilarityOps.ivfIndexFor(Tables.embeddings(s, dir), tag = dir)),
      Some("""WITH a AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |c AS (SELECT list_id, CAST(e.label AS BIGINT) AS label,
             |             CAST(COUNT(*) AS BIGINT) AS o
             |      FROM a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
             |m AS (SELECT list_id, label AS majority_label, o AS n_majority,
             |             row_number() OVER (PARTITION BY list_id
             |                                ORDER BY o DESC, label) AS rk
             |      FROM c),
             |t AS (SELECT list_id, CAST(SUM(o) AS BIGINT) AS n_vectors FROM c GROUP BY 1)
             |SELECT t.list_id, t.n_vectors, m.majority_label, m.n_majority,
             |       (m.n_majority * 1000000) // t.n_vectors AS purity_ppm
             |FROM t JOIN m ON m.list_id = t.list_id AND m.rk = 1
             |ORDER BY t.list_id""".stripMargin),
      dumps = Seq(ivfDump)),

    // ANN index coverage audit: full-outer vec_id reconciliation of
    // the vector table vs the persisted IVF assignment — missing
    // vectors and orphaned postings as one go/no-go report row.
    QuerySpec(
      "q212_index_coverage",
      (s, dir) => SimilarityOps.ivfCoverageAudit(
        Tables.embeddings(s, dir),
        SimilarityOps.ivfIndexFor(Tables.embeddings(s, dir), tag = dir)),
      Some("""WITH a AS (
             |  SELECT vec_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |v AS (SELECT vec_id FROM embeddings)
             |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_vectors,
             |       (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_indexed,
             |       CAST((SELECT COUNT(*) FROM v
             |             WHERE vec_id NOT IN (SELECT vec_id FROM a)) AS BIGINT) AS n_missing,
             |       CAST((SELECT COUNT(*) FROM a
             |             WHERE vec_id NOT IN (SELECT vec_id FROM v)) AS BIGINT) AS n_orphaned,
             |       (SELECT COUNT(*) FROM v WHERE vec_id NOT IN (SELECT vec_id FROM a)) = 0
             |         AND (SELECT COUNT(*) FROM a WHERE vec_id NOT IN (SELECT vec_id FROM v)) = 0
             |         AS covered""".stripMargin),
      dumps = Seq(ivfDump)),

    // JL random-projection audit: 64-d -> 16-d through the q47
    // deterministic +/-1 planes, distance-distortion ratios on a pair
    // sample — integer-exact end to end (quantized inputs, integer
    // projections and squared distances, one display division).
    QuerySpec(
      "q208_jl_projection",
      (s, dir) => SimilarityOps.jlProjectionAudit(Tables.embeddings(s, dir)),
      Some(q208OracleSql)),

    // Index-quality view for the int8 path: per-vector max/mean
    // reconstruction error of the symmetric quantization — every op
    // is correctly-rounded IEEE, replayed bit-for-bit by the oracle.
    QuerySpec(
      "q131_quantization_error",
      (s, dir) => SimilarityOps.quantizationErrorReport(Tables.embeddings(s, dir)),
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
             |  WHERE len(list_filter(CAST(embedding AS DOUBLE[]), x -> x <> 0)) > 0),
             |a AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM v),
             |er AS (SELECT vec_id, amax,
             |              list_transform(e, x -> abs(x - CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT) * amax / 127.0)) AS errs
             |       FROM a)
             |SELECT vec_id, amax,
             |       list_max(errs) AS max_abs_err,
             |       CAST(CAST(list_sum(list_transform(errs, x -> CAST(floor(x * 1000000000.0) AS BIGINT))) AS BIGINT)
             |            // len(errs) AS BIGINT) AS mean_abs_err_ppb
             |FROM er ORDER BY vec_id""".stripMargin)),

    // int8 scalar-quantized cosine: per-vector max-abs scales cancel
    // in cosine, so scoring is exact integer dot products — the one
    // ANN family member that hash-matches without fold-order care
    // (see SimilarityOps.quantizeInt8). 4× scan-bandwidth cut at
    // 100 TB; recall vs exact measured in SimilarityMultimodalSpec.
    QuerySpec(
      "q102_quantized_ann",
      (s, dir) => SimilarityOps.quantizedCosineTopK(Tables.embeddings(s, dir)),
      Some(s"""WITH $q102QuantChainCtes
              |SELECT qid, vec_id, score, rn FROM r WHERE rn <= 10
              |ORDER BY qid, rn""".stripMargin)),

    // int8 recall rung (q267): the q102 quantized ranking measured
    // against the exact top-k — the fidelity report that prices the
    // 4× rung for the q266 ladder. Shares q102's CTE text verbatim.
    QuerySpec(
      "q267_int8_recall",
      (s, dir) => SimilarityOps.int8Recall(Tables.embeddings(s, dir)),
      Some(q267OracleSql)),

    // domain-proximity matrix: per-label centroids with per-dimension
    // ppb-integer means (components floor-quantized, exact BIGINT
    // sums — the one cross-row float accumulation in the similarity
    // family, made order-independent), then pairwise cosine on the
    // k-centroid frame — catalog-scale after one (label, dim)-keyed
    // shuffle. The 1e9 scale cancels in cosine.
    QuerySpec(
      "q138_label_centroid_sim",
      (s, dir) => SimilarityOps.labelCentroidSim(Tables.embeddings(s, dir)),
      Some("""WITH t AS (
             |  SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e
             |  FROM embeddings),
             |comp AS (
             |  SELECT label, i AS pos, CAST(floor(e[i] * 1000000000.0) AS BIGINT) AS v_ppb
             |  FROM (SELECT label, e, unnest(range(1, len(e) + 1)) AS i FROM t)),
             |cent AS (
             |  SELECT label, pos,
             |         CAST(CAST(SUM(v_ppb) AS BIGINT) AS DOUBLE) / COUNT(*) AS c
             |  FROM comp GROUP BY label, pos),
             |arr AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label)
             |SELECT a.label AS label_a, b.label AS label_b,
             |       list_inner_product(a.cv, b.cv) /
             |         (sqrt(list_inner_product(a.cv, a.cv)) * sqrt(list_inner_product(b.cv, b.cv))) AS cos_sim
             |FROM arr a JOIN arr b ON a.label < b.label
             |ORDER BY label_a, label_b""".stripMargin)),

    // vector-side quality gate: per-label unusable-vector counts
    // (zero-norm / non-finite) and the norm distribution of the rest;
    // per-row norms are index-order folds (the q138 cross-engine
    // contract), the one cross-row mean is a ppb-integer sum + div.
    QuerySpec(
      "q143_embedding_hygiene",
      (s, dir) => SimilarityOps.embeddingHygiene(Tables.embeddings(s, dir)),
      Some(s"""WITH t AS (
             |  SELECT CAST(label AS BIGINT) AS label, CAST(embedding AS DOUBLE[]) AS e
             |  FROM embeddings),
             |per AS (
             |  SELECT label,
             |         len(list_filter(e, x -> isnan(x) OR isinf(x))) > 0 AS bad,
             |         sqrt(list_inner_product(e, e)) AS norm
             |  FROM t),
             |g AS (
             |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             |         CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
             |         CAST(SUM(CASE WHEN NOT bad AND norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             |         MIN(CASE WHEN NOT bad AND norm > 0 THEN norm END) AS min_norm,
             |         MAX(CASE WHEN NOT bad AND norm > 0 THEN norm END) AS max_norm,
             |         CASE WHEN COUNT(CASE WHEN NOT bad AND norm > 0 THEN 1 END) > 0
             |              THEN CAST(CAST(SUM(CASE WHEN NOT bad AND norm > 0
             |                                  THEN CAST(floor(norm * 1000000000.0) AS BIGINT) END) AS BIGINT)
             |                   // COUNT(CASE WHEN NOT bad AND norm > 0 THEN 1 END) AS BIGINT)
             |         END AS mean_norm_ppb
             |  FROM per GROUP BY label)
             |SELECT label, n_vecs, n_nonfinite, n_zero, min_norm, max_norm, mean_norm_ppb
             |FROM g ORDER BY label""".stripMargin)),

    // INCREMENTAL index maintenance: a deterministic synthetic batch
    // (reversed embeddings, shifted ids) assigns to the STORED
    // centroids — never a re-fit — and the report reconciles list
    // populations before/after with the integer-exact re-balance
    // trigger. The oracle replays assignment as an argmin CTE over
    // the dumped centroid/assignment state (the q67/q121 machinery),
    // so a hash match certifies the stored artifacts AND the append.
    QuerySpec(
      "q235_ivf_incremental",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, lit, pmod, reverse}
        val emb = Tables.embeddings(s, dir)
        val batch = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            reverse(col("embedding")).as("embedding"))
        SimilarityOps.ivfIncrementalAppend(
          SimilarityOps.ivfIndexFor(emb, tag = dir), batch)
      },
      Some("""WITH centers AS (
             |  SELECT c_list_id, CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |assign AS (
             |  SELECT list_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lists FROM centers),
             |b AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_reverse(CAST(embedding AS DOUBLE[])) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |d AS (
             |  SELECT vec_id, c_list_id,
             |         list_sum(list_transform(list_zip(e, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM b CROSS JOIN centers),
             |a AS (
             |  SELECT vec_id, c_list_id AS list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_list_id) AS rk
             |        FROM d) WHERE rk = 1),
             |nb AS (SELECT CAST(list_id AS BIGINT) AS list_id, CAST(COUNT(*) AS BIGINT) AS n_before
             |       FROM assign GROUP BY 1),
             |nn AS (SELECT CAST(list_id AS BIGINT) AS list_id, CAST(COUNT(*) AS BIGINT) AS n_new
             |       FROM a GROUP BY 1),
             |r AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS list_id,
             |         COALESCE(n_before, 0) AS n_before, COALESCE(n_new, 0) AS n_new,
             |         COALESCE(n_before, 0) + COALESCE(n_new, 0) AS n_after
             |  FROM centers LEFT JOIN nb ON nb.list_id = c_list_id
             |               LEFT JOIN nn ON nn.list_id = c_list_id),
             |t AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total_after FROM r)
             |SELECT list_id, n_before, n_new, n_after,
             |       CAST(n_after AS DOUBLE) / total_after AS share_after,
             |       n_after * n_lists > 2 * total_after AS imbalanced
             |FROM r CROSS JOIN t CROSS JOIN nl
             |ORDER BY list_id""".stripMargin),
      dumps = Seq(ivfDump)),

    // Matryoshka truncation fidelity: per prefix length, the top-k by
    // prefix-dim cosine is scored against the full-dim exact top-k —
    // the serve-fewer-bytes decision, pure integers out. Prefix
    // slices + the q67-proven fold parity make the whole report
    // SQL-replayable.
    QuerySpec(
      "q249_truncation_fidelity",
      (s, dir) => SimilarityOps.truncationFidelity(Tables.embeddings(s, dir)),
      Some(q249OracleSql)),

    // INCREMENTAL semantic dedup: new vectors probe the STORED IVF
    // index (broadcast centroid ranking → nProbe list pruning → exact
    // in-list cosine) for a dup verdict — never re-clustering or
    // re-scanning the corpus, never pairing batch×batch. The batch
    // keeps both branches live: %14==3 vectors are EXACT COPIES of
    // stored vectors (dup, best_score ~1 against their original),
    // %14==10 are reversed (novel). Oracle replays the whole probe
    // from the dumped index state — the q67 CTE chain with the batch
    // as the query side.
    QuerySpec(
      "q246_semantic_probe",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, lit, pmod, reverse, when}
        val emb = Tables.embeddings(s, dir)
        val batch = emb.filter(pmod(col("vec_id"), lit(14)).isin(3, 10))
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            when(pmod(col("vec_id"), lit(14)) === 3, col("embedding"))
              .otherwise(reverse(col("embedding"))).as("embedding"))
        SimilarityOps.ivfSemanticProbe(
          SimilarityOps.ivfIndexFor(emb, tag = dir), batch)
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
             |  FROM embeddings),
             |assign AS (
             |  SELECT vec_id, list_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |centers AS (
             |  SELECT c_list_id, CAST(centroid AS DOUBLE[]) AS c FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |b AS (
             |  SELECT vec_id + 1000000 AS bid,
             |         CASE WHEN vec_id % 14 = 3 THEN CAST(embedding AS DOUBLE[])
             |              ELSE list_reverse(CAST(embedding AS DOUBLE[])) END AS be
             |  FROM embeddings WHERE vec_id % 14 IN (3, 10)),
             |bn AS (SELECT bid, be, sqrt(list_inner_product(be, be)) AS bnorm FROM b),
             |qd AS (
             |  SELECT bid, be, bnorm, c_list_id,
             |         list_sum(list_transform(list_zip(be, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM bn CROSS JOIN centers),
             |probes AS (
             |  SELECT bid, be, bnorm, c_list_id AS list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY bid ORDER BY d2, c_list_id) AS pr FROM qd)
             |  WHERE pr <= 4),
             |cand AS (
             |  SELECT p.bid, v.vec_id,
             |         list_inner_product(p.be, v.e) / (p.bnorm * v.nrm) AS score
             |  FROM probes p JOIN assign a ON p.list_id = a.list_id
             |                JOIN v ON v.vec_id = a.vec_id),
             |r AS (SELECT bid, vec_id, score,
             |             row_number() OVER (PARTITION BY bid ORDER BY score DESC, vec_id) AS rn
             |      FROM cand),
             |sm AS (SELECT bid, CAST(COUNT(*) AS BIGINT) AS n_cand,
             |              MAX(CASE WHEN rn = 1 THEN vec_id END) AS best_match,
             |              MAX(CASE WHEN rn = 1 THEN score END) AS best_score
             |       FROM r GROUP BY bid)
             |SELECT bn.bid AS vec_id, COALESCE(n_cand, 0) AS n_cand,
             |       best_match, best_score,
             |       COALESCE(best_score >= 0.95, FALSE) AS is_dup
             |FROM bn LEFT JOIN sm ON sm.bid = bn.bid
             |ORDER BY vec_id""".stripMargin),
      dumps = Seq(ivfDump)),

    // Product quantization ENCODE off the persisted codebook: each
    // vector's 4 sub-codes (d2 argmin, code breaks ties) + the exact
    // reconstruction error, summed in pinned subspace order. The
    // oracle replays argmin + error from the dumped codebook table
    // (the q235 argmin-CTE pattern), so a hash match certifies the
    // stored codebook AND the encode. Sub-slices are literal 16s on
    // both sides — the testdata embedding dim is 64 at every SF.
    QuerySpec(
      "q241_pq_codes",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqEncode(SimilarityOps.pqCodebookFor(emb, tag = dir), emb)
      },
      Some("""WITH cb AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |d AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN cb),
             |b AS (
             |  SELECT vec_id, subspace, code, d2
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d)
             |  WHERE rk = 1),
             |p AS (
             |  SELECT vec_id,
             |         MAX(CASE WHEN subspace = 0 THEN code END) AS code_0,
             |         MAX(CASE WHEN subspace = 1 THEN code END) AS code_1,
             |         MAX(CASE WHEN subspace = 2 THEN code END) AS code_2,
             |         MAX(CASE WHEN subspace = 3 THEN code END) AS code_3,
             |         MAX(CASE WHEN subspace = 0 THEN d2 END) AS e0,
             |         MAX(CASE WHEN subspace = 1 THEN d2 END) AS e1,
             |         MAX(CASE WHEN subspace = 2 THEN d2 END) AS e2,
             |         MAX(CASE WHEN subspace = 3 THEN d2 END) AS e3
             |  FROM b GROUP BY vec_id)
             |SELECT vec_id, code_0, code_1, code_2, code_3,
             |       e0 + e1 + e2 + e3 AS recon_err
             |FROM p ORDER BY vec_id""".stripMargin),
      dumps = Seq(pqDump)),

    // ADC top-k fidelity: hits of the code-lookup ranking inside the
    // exact euclidean top-k, per query — pure-integer output. The
    // oracle replays the whole chain (encode + per-query LUT + both
    // rankings + the intersection) from the dumped codebook, making
    // this the end-to-end certificate for the PQ family the way q220
    // is for curation.
    QuerySpec(
      "q242_pq_adc_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqAdcRecall(SimilarityOps.pqCodebookFor(emb, tag = dir), emb)
      },
      Some(q242OracleSql),
      dumps = Seq(pqDump)),

    // PQ codebook DRIFT: the new batch encodes map-only against the
    // stored codebook; its per-subspace mean quantization error
    // compares against the STORED training baseline and `refit` fires
    // past 2×. The planted shift is LOCALIZED — the batch's first 16
    // dims (subspace 0) scale ×3, the rest pass through — so the
    // output exercises both branches: subspace 0 fires, 1–3 certify
    // the no-fire path. The oracle replays BOTH sides from the dumped
    // codebook — baseline rebuild hash-matching the stored table is
    // the merge≡rebuild certificate (q243's pattern) for the second
    // PQ artifact.
    QuerySpec(
      "q244_pq_drift",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqDrift(
          SimilarityOps.pqCodebookFor(emb, tag = dir),
          s.read.table(SimilarityOps.ensurePqBaseline(emb, tag = dir)),
          driftBatch(emb))
      },
      Some("""WITH cb AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |bt AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_concat(
             |           list_transform(
             |             list_slice(CAST(embedding AS DOUBLE[]), 1, 16),
             |             x -> x * 3.0),
             |           list_slice(CAST(embedding AS DOUBLE[]), 17, 64)) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |dv AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN cb),
             |db AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM bt CROSS JOIN cb),
             |bestv AS (
             |  SELECT subspace, d2
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM dv)
             |  WHERE rk = 1),
             |bestb AS (
             |  SELECT subspace, d2
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM db)
             |  WHERE rk = 1),
             |base AS (
             |  SELECT subspace, CAST(COUNT(*) AS BIGINT) AS n_base,
             |         CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) AS base_err_sum
             |  FROM bestv GROUP BY subspace),
             |probe AS (
             |  SELECT subspace, CAST(COUNT(*) AS BIGINT) AS n_batch,
             |         CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) AS batch_err_sum
             |  FROM bestb GROUP BY subspace)
             |SELECT subspace, n_base, n_batch,
             |       base_err_sum / n_base AS base_mse,
             |       batch_err_sum / n_batch AS batch_mse,
             |       (batch_err_sum / n_batch) / (base_err_sum / n_base) AS drift_ratio,
             |       batch_err_sum / n_batch > 2.0 * (base_err_sum / n_base) AS refit
             |FROM base JOIN probe USING (subspace)
             |ORDER BY subspace""".stripMargin),
      dumps = Seq(pqDump)),

    // IVF-PQ end-to-end read path (the FAISS `IVF16,PQ4` composition):
    // coarse probe over the stored IVF centroids, ADC over RESIDUAL
    // codes with a per-(query, list) LUT; per query the report is pure
    // integers — candidates scanned (≈ nProbe/nLists of the corpus),
    // hits inside the exact euclidean top-k, and k. The oracle replays
    // the ENTIRE chain (residuals → code argmin → coarse ranking →
    // LUT → ADC rollup → both top-ks → intersection) from the two
    // dumped artifacts, certifying the stored IVF index AND the stored
    // residual codebook together.
    QuerySpec(
      "q255_ivfpq_recall",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        SimilarityOps.ivfPqRecall(
          idx, SimilarityOps.ivfPqCodebookFor(idx, tag = dir), emb,
          SimilarityOps.ivfPqCodesFor(idx, tag = dir))
      },
      Some(q255OracleSql),
      dumps = Seq(ivfDump, ivfPqDump)),

    // Incremental PQ code maintenance (q256) — the write path the q255
    // read path now depends on: a NEW batch assigns to the stored
    // coarse centroids, takes residuals, encodes against the stored
    // residual codebook, and the report reconciles code volume with
    // the PERSISTED codes table at (list_id, subspace, code) cell
    // granularity. The oracle replays BOTH sides independently from
    // the two dumped artifacts — full-corpus residual-argmin for
    // n_before (certifying every stored code) and the batch's
    // assign→residual→encode chain for n_new — so the persisted codes
    // table itself is oracle-certified, not just the report over it.
    QuerySpec(
      "q256_ivfpq_code_maintain",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, lit, pmod, reverse}
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        val cb = SimilarityOps.ivfPqCodebookFor(idx, tag = dir)
        val batch = emb.filter(pmod(col("vec_id"), lit(7)) === 3)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            reverse(col("embedding")).as("embedding"))
        SimilarityOps.ivfPqCodeMaintain(
          SimilarityOps.ivfPqCodesFor(idx, tag = dir),
          SimilarityOps.ivfPqIncrementalCodes(idx, cb, batch))
      },
      Some("""WITH a AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |ic AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS list_id,
             |         CAST(centroid AS DOUBLE[]) AS icent
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |cb AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivfpq_oracle/centers/*.parquet')),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |r AS (
             |  SELECT v.vec_id, a.list_id,
             |         list_transform(list_zip(e, icent), p -> p[1] - p[2]) AS res
             |  FROM v JOIN a USING (vec_id) JOIN ic USING (list_id)),
             |d AS (
             |  SELECT vec_id, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM r CROSS JOIN cb),
             |stored AS (
             |  SELECT list_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d)
             |  WHERE rk = 1),
             |b AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_reverse(CAST(embedding AS DOUBLE[])) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |bd AS (
             |  SELECT vec_id, ic.list_id, icent, e,
             |         list_sum(list_transform(list_zip(e, icent),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM b CROSS JOIN ic),
             |ba AS (
             |  SELECT vec_id, list_id,
             |         list_transform(list_zip(e, icent), p -> p[1] - p[2]) AS res
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
             |                                     ORDER BY d2, list_id) AS rk FROM bd)
             |  WHERE rk = 1),
             |bdc AS (
             |  SELECT vec_id, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM ba CROSS JOIN cb),
             |newc AS (
             |  SELECT list_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM bdc)
             |  WHERE rk = 1),
             |nb AS (SELECT list_id, subspace, code, CAST(COUNT(*) AS BIGINT) AS n_before
             |       FROM stored GROUP BY 1, 2, 3),
             |nn AS (SELECT list_id, subspace, code, CAST(COUNT(*) AS BIGINT) AS n_new
             |       FROM newc GROUP BY 1, 2, 3)
             |SELECT COALESCE(nb.list_id, nn.list_id) AS list_id,
             |       COALESCE(nb.subspace, nn.subspace) AS subspace,
             |       COALESCE(nb.code, nn.code) AS code,
             |       COALESCE(n_before, 0) AS n_before,
             |       COALESCE(n_new, 0) AS n_new,
             |       COALESCE(n_before, 0) + COALESCE(n_new, 0) AS n_after
             |FROM nb FULL OUTER JOIN nn
             |  ON nb.list_id = nn.list_id AND nb.subspace = nn.subspace
             | AND nb.code = nn.code
             |ORDER BY list_id, subspace, code""".stripMargin),
      dumps = Seq(ivfDump, ivfPqDump)),

    // IVF RE-BALANCE applier (q259): act on the q235 flag — the flood
    // batch pushes one list past the gate; the applier re-fits k=2
    // sub-centroids over ONLY that list's members, replaces the
    // parent centroid with the children, and reassigns only those
    // members. The oracle replays everything EXCEPT the seeded 2-means
    // fit (certified via the dumped child-centroid table, the q67
    // build-vs-probe split): batch assignment argmin, the integer
    // flag gate, the member reassignment argmin against the dumped
    // children, and the post-split balance report. One round may
    // leave a degenerate flood child still over the gate (reported
    // honestly via `imbalanced`); the clearing case is asserted on a
    // crafted fixture in SimilarityMultimodalSpec.
    QuerySpec(
      "q259_ivf_rebalance",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.ivfRebalanceFor(
          SimilarityOps.ivfIndexFor(emb, tag = dir),
          rebalanceBatch(emb), tag = dir).report
      },
      Some("""WITH centers AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS list_id, CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |assign AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |ch AS (
             |  SELECT CAST(parent_list_id AS BIGINT) AS parent_list_id,
             |         CAST(child_list_id AS BIGINT) AS child_list_id,
             |         CAST(centroid AS DOUBLE[]) AS cc
             |  FROM read_parquet('/tmp/graft_ivfreb_oracle/children/*.parquet')),
             |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lists FROM centers),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |b AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_transform(CAST(embedding AS DOUBLE[]), x -> 100.0 + x * 0.01) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |bd AS (
             |  SELECT b.vec_id, centers.list_id,
             |         list_sum(list_transform(list_zip(e, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM b CROSS JOIN centers),
             |ba AS (
             |  SELECT vec_id, list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rk
             |        FROM bd) WHERE rk = 1),
             |nb AS (SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_before FROM assign GROUP BY 1),
             |nn AS (SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_new FROM ba GROUP BY 1),
             |r AS (
             |  SELECT centers.list_id,
             |         COALESCE(n_before, 0) + COALESCE(n_new, 0) AS n_after
             |  FROM centers LEFT JOIN nb USING (list_id) LEFT JOIN nn USING (list_id)),
             |t AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total_after FROM r),
             |flags AS (SELECT r.list_id FROM r CROSS JOIN t CROSS JOIN nl
             |          WHERE n_after * n_lists > 2 * total_after),
             |mem AS (
             |  SELECT a.vec_id, a.list_id AS parent_list_id, v.e
             |  FROM assign a JOIN v USING (vec_id)
             |  WHERE a.list_id IN (SELECT list_id FROM flags)
             |  UNION ALL
             |  SELECT ba.vec_id, ba.list_id, b.e
             |  FROM ba JOIN b USING (vec_id)
             |  WHERE ba.list_id IN (SELECT list_id FROM flags)),
             |md AS (
             |  SELECT mem.vec_id, ch.parent_list_id, ch.child_list_id,
             |         list_sum(list_transform(list_zip(e, cc), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM mem JOIN ch ON mem.parent_list_id = ch.parent_list_id),
             |re AS (
             |  SELECT vec_id, parent_list_id, child_list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, child_list_id) AS rk
             |        FROM md) WHERE rk = 1),
             |sc AS (
             |  SELECT child_list_id AS list_id, parent_list_id, TRUE AS split,
             |         CAST(COUNT(*) AS BIGINT) AS n_members
             |  FROM re GROUP BY 1, 2),
             |unt AS (
             |  SELECT r.list_id, r.list_id AS parent_list_id, FALSE AS split,
             |         CAST(r.n_after AS BIGINT) AS n_members
             |  FROM r WHERE r.list_id NOT IN (SELECT list_id FROM flags)),
             |allr AS (SELECT * FROM unt UNION ALL SELECT * FROM sc),
             |nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_flagged FROM flags),
             |nch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ch FROM ch)
             |SELECT list_id, parent_list_id, split, n_members,
             |       CAST(n_members AS DOUBLE) / total_after AS share_after,
             |       n_members * (n_lists - n_flagged + n_ch) > 2 * total_after AS imbalanced
             |FROM allr CROSS JOIN t CROSS JOIN nl CROSS JOIN nf CROSS JOIN nch
             |ORDER BY list_id""".stripMargin),
      dumps = Seq(ivfDump, rebDump)),

    // PQ REFIT applier (q260): act on the q244 flag — the drift batch
    // fires the trigger, codebook v2 fits over stored∪batch as a NEW
    // versioned catalog table (v1 untouched — old encodes stay
    // reproducible), and the report prices the swap: ADC top-k recall
    // v1 vs v2 over the grown corpus, per query. The oracle replays
    // the trigger (the q244 drift chain) and BOTH recall passes (the
    // q242 chain, once per dumped codebook) plus the exact top-k —
    // certifying the stored v1, the fitted v2, and the decision in one
    // hash. The no-op path (in-distribution batch → no fit, no table)
    // is asserted in SimilarityMultimodalSpec.
    QuerySpec(
      "q260_pq_refit",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqRefitApply(emb, driftBatch(emb), tag = dir)
      },
      Some("""WITH cb1 AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
             |cb2 AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_pqv2_oracle/centers/*.parquet')),
             |v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |bt AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_concat(
             |           list_transform(
             |             list_slice(CAST(embedding AS DOUBLE[]), 1, 16),
             |             x -> x * 3.0),
             |           list_slice(CAST(embedding AS DOUBLE[]), 17, 64)) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |v AS (SELECT vec_id, e FROM v0 UNION ALL SELECT vec_id, e FROM bt),
             |dv AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v0 CROSS JOIN cb1),
             |db AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM bt CROSS JOIN cb1),
             |bestv AS (
             |  SELECT subspace, d2
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM dv)
             |  WHERE rk = 1),
             |bestb AS (
             |  SELECT subspace, d2
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM db)
             |  WHERE rk = 1),
             |base AS (
             |  SELECT subspace, CAST(COUNT(*) AS BIGINT) AS n_base,
             |         CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) AS base_err_sum
             |  FROM bestv GROUP BY subspace),
             |probe AS (
             |  SELECT subspace, CAST(COUNT(*) AS BIGINT) AS n_batch,
             |         CAST(SUM(CAST(d2 AS DECIMAL(30,10))) AS DOUBLE) AS batch_err_sum
             |  FROM bestb GROUP BY subspace),
             |fired AS (
             |  SELECT COUNT(*) > 0 AS refit_fired
             |  FROM base JOIN probe USING (subspace)
             |  WHERE batch_err_sum / n_batch > 2.0 * (base_err_sum / n_base)),
             |d1 AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN cb1),
             |codes1 AS (
             |  SELECT vec_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d1)
             |  WHERE rk = 1),
             |d2c AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN cb2),
             |codes2 AS (
             |  SELECT vec_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d2c)
             |  WHERE rk = 1),
             |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
             |lut1 AS (
             |  SELECT qid, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
             |  FROM q CROSS JOIN cb1),
             |lut2 AS (
             |  SELECT qid, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
             |  FROM q CROSS JOIN cb2),
             |adc1 AS (
             |  SELECT qid, vec_id,
             |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
             |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
             |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
             |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
             |  FROM codes1 s JOIN lut1 USING (subspace, code)
             |  WHERE vec_id <> qid GROUP BY qid, vec_id),
             |adct1 AS (
             |  SELECT qid, vec_id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |        FROM adc1) WHERE rn <= 10),
             |adc2 AS (
             |  SELECT qid, vec_id,
             |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
             |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
             |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
             |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
             |  FROM codes2 s JOIN lut2 USING (subspace, code)
             |  WHERE vec_id <> qid GROUP BY qid, vec_id),
             |adct2 AS (
             |  SELECT qid, vec_id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |        FROM adc2) WHERE rn <= 10),
             |ex AS (
             |  SELECT qid, vec_id,
             |         list_sum(list_transform(list_zip(e, qe),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN q WHERE vec_id <> qid),
             |ext AS (
             |  SELECT qid, vec_id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
             |        FROM ex) WHERE rn <= 10)
             |SELECT ext.qid, refit_fired,
             |       CAST(SUM(CASE WHEN adct1.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_v1,
             |       CAST(SUM(CASE WHEN adct2.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits_v2,
             |       CAST(COUNT(*) AS BIGINT) AS k
             |FROM ext
             |CROSS JOIN fired
             |LEFT JOIN adct1 ON ext.qid = adct1.qid AND ext.vec_id = adct1.vec_id
             |LEFT JOIN adct2 ON ext.qid = adct2.qid AND ext.vec_id = adct2.vec_id
             |GROUP BY ext.qid, refit_fired ORDER BY ext.qid""".stripMargin),
      dumps = Seq(pqDump, pqV2Dump)),

    // INDEX A/B SHADOW COMPARE (q279, r15): the rollout gate between
    // q260's drift report and flipping traffic — v1 and v2 codebooks
    // serve the SAME stored∪batch corpus shadow, and the report
    // measures per query how much the listing moves (overlap, churn,
    // rank displacement of survivors) — computable at serving time
    // with no exact baseline scan. The oracle replays both ADC
    // listings from the two dumped codebooks and every count.
    QuerySpec(
      "q279_index_ab_shadow",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqShadowFor(emb, driftBatch(emb), tag = dir)
      },
      Some(q279OracleSql),
      dumps = Seq(pqDump, pqV2Dump)),

    // CONTRASTIVE hard-negative mining (q265): per anchor, the top-k
    // candidates with cosine in the hard band [0.10, 0.95) — similar
    // enough to teach the margin, below the dup threshold so no
    // positive leaks in as a negative; hardest first. The q46-proven
    // cosine forms make scores and ranks engine-identical.
    QuerySpec(
      "q265_hard_negatives",
      (s, dir) => SimilarityOps.hardNegatives(Tables.embeddings(s, dir)),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |a AS (SELECT vec_id AS anchor_id, e AS ae FROM v WHERE vec_id < 5),
             |s AS (
             |  SELECT anchor_id, vec_id,
             |         list_inner_product(ae, e) /
             |           (sqrt(list_inner_product(ae, ae)) * sqrt(list_inner_product(e, e))) AS score
             |  FROM v CROSS JOIN a WHERE vec_id <> anchor_id),
             |b AS (SELECT anchor_id, vec_id, score FROM s
             |      WHERE score >= 0.10 AND score < 0.95),
             |r AS (
             |  SELECT anchor_id, vec_id AS neg_id, score,
             |         CAST(row_number() OVER (PARTITION BY anchor_id
             |           ORDER BY score DESC, vec_id) AS BIGINT) AS rn
             |  FROM b)
             |SELECT anchor_id, neg_id, score, rn
             |FROM r WHERE rn <= 5
             |ORDER BY anchor_id, rn""".stripMargin)),

    // BINARY (sign-bit) quantization + Hamming re-rank (q264): the
    // 32× rung of the ANN memory ladder — 8-byte signatures, popcount
    // candidate ranking, exact re-rank of the top candidates, hits
    // vs the exact top-k. Signature arithmetic is exact integer
    // (distinct powers of two; bit 63 through the q39/q49 signed/
    // unsigned two's-complement contract), so the ENTIRE chain —
    // fold, xor, popcount, both rankings — replays in SQL with no
    // fitted state and no dump.
    QuerySpec(
      "q264_binary_ann",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.binaryHammingRecall(emb,
          storedSigs = Some(SimilarityOps.binarySigsFor(emb, tag = dir)))
      },
      Some(q264OracleSql)),

    // MULTI-WORD binary signatures (q275, r15): the d > 64 production
    // form of q264 — real embedding dims are 256-4096, where the
    // single-long form refuses (its ADVICE-r13 guard). A 128-d
    // fixture derives deterministically from the 64-d corpus (second
    // half 0.5 − x: one exact IEEE double subtraction both engines
    // evaluate identically), signatures are m = ⌈d/64⌉ = 2 long words
    // read from the PERSISTED wide-sig table, Hamming is the summed
    // per-word popcount of the xor, and the exact cosine re-rank runs
    // on the full 128-d vectors. The oracle replays the entire chain
    // per word — fold, signed cast, xor, popcount sum, both rankings.
    QuerySpec(
      "q275_binary_ann_wide",
      (s, dir) => {
        val emb = wideEmbeddings(s, dir)
        SimilarityOps.binaryHammingRecallWide(emb,
          storedSigs = Some(SimilarityOps.binarySigsWideFor(emb, tag = "w" + dir)))
      },
      Some(q275OracleSql)),

    // ANN LADDER decision table (q266): one row per quantization rung
    // (binary sign-bit / PQ ADC / IVF-PQ / matryoshka 16 & 32) with
    // bytes-per-vector and integer-exact recall_ppm vs the exact
    // top-k — the "which index do we ship" report. The oracle
    // aggregates the SAME factored SQL each rung's own query
    // certifies, so the capstone cannot drift from its constituents.
    QuerySpec(
      "q266_ann_ladder",
      (s, dir) => SimilarityOps.annLadder(Tables.embeddings(s, dir), tag = dir),
      Some(s"""SELECT method, bytes_per_vec, sum_hits, sum_k,
              |       CAST(sum_hits * 1000000 // sum_k AS BIGINT) AS recall_ppm
              |FROM (
              |  SELECT 'binary_sign64' AS method, CAST(8 AS BIGINT) AS bytes_per_vec,
              |         CAST(SUM(n_hits) AS BIGINT) AS sum_hits, CAST(SUM(k) AS BIGINT) AS sum_k
              |  FROM ($q264OracleSql)
              |  UNION ALL
              |  SELECT 'int8_sym127', CAST(72 AS BIGINT), CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q267OracleSql)
              |  UNION ALL
              |  SELECT 'pq4x16', CAST(4 AS BIGINT), CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q242OracleSql)
              |  UNION ALL
              |  SELECT 'ivf16_pq4', CAST(12 AS BIGINT), CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q255OracleSql)
              |  UNION ALL
              |  SELECT 'trunc_' || CAST(dim AS VARCHAR), CAST(dim * 4 AS BIGINT),
              |         CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q249OracleSql) GROUP BY dim
              |) ORDER BY method""".stripMargin),
      dumps = Seq(pqDump, ivfDump, ivfPqDump)),

    // nProbe SWEEP (q269): recall@k vs candidates-scanned per
    // nProbe ∈ {1,2,4,8,16} — the second serving-policy axis beside
    // q266's bytes ladder (q67 measures ONE fixed operating point;
    // this prices the dial that picks it). The oracle is the q67 CTE
    // chain parameterized by a literal rung table and aggregated in
    // one SQL, replaying centroid ranking, per-rung pruning, in-list
    // cosine, and the shared exact baseline from the SAME dumped
    // index state.
    QuerySpec(
      "q269_nprobe_sweep",
      (s, dir) => SimilarityOps.ivfProbeSweepFor(
        SimilarityOps.ivfIndexFor(Tables.embeddings(s, dir), tag = dir),
        tag = dir),
      Some(q269OracleSql),
      dumps = Seq(ivfDump)),

    // TAKEDOWN propagation (q268): a removal list (doc_id % 17 = 4)
    // fans out into ONE conservation-checked purge work list across
    // every persisted derived artifact — fingerprints, sketches,
    // postings (with the per-term df correction), corpus stats, IVF
    // assignments, IVF-PQ codes (certified 1:1 with assignments),
    // affected packed sequences (via the q105 manifest) and the q115
    // shards needing rebuild. The Spark side reads the STORED
    // artifacts (RetrievalShared / SketchShared / ivf catalog tables);
    // the oracle recomputes every membership from raw text minus the
    // removal set — the stored-artifact certification pattern — so a
    // hash match proves both the stores and the accounting
    // (n_after = n_before - n_remove on every row).
    QuerySpec(
      "q268_takedown_propagation",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        CorpusOps.takedownPropagation(
          docs,
          docs.filter(pmod(col("doc_id"), lit(17)) === 4).select(col("doc_id")),
          RetrievalShared.postings(s, dir),
          RetrievalShared.docLengths(s, dir),
          SketchShared.sketches(s, dir),
          idx.assigned,
          SimilarityOps.ivfPqCodesFor(idx, tag = dir),
          storedManifest = Some(CorpusOps.sequenceManifestFor(docs, tag = dir)))
      },
      Some("""WITH rm AS (
             |  SELECT DISTINCT doc_id FROM documents WHERE doc_id % 17 = 4),
             |fp AS (SELECT doc_id, md5(text) AS fp_md5 FROM documents),
             |fprm AS (
             |  SELECT fp_md5, CAST(COUNT(*) AS BIGINT) AS n_remove
             |  FROM fp JOIN rm USING (doc_id) GROUP BY 1),
             |fpsec AS (
             |  SELECT 'fingerprints' AS artifact, fp.fp_md5 AS "key",
             |         fprm.n_remove, CAST(COUNT(*) AS BIGINT) AS n_before
             |  FROM fp JOIN fprm USING (fp_md5) GROUP BY fp.fp_md5, fprm.n_remove),
             |post AS (
             |  SELECT w, doc_id
             |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |        FROM documents) GROUP BY 1, 2),
             |trm AS (
             |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_remove
             |  FROM post JOIN rm USING (doc_id) GROUP BY w),
             |postsec AS (
             |  SELECT 'postings', post.w, trm.n_remove, CAST(COUNT(*) AS BIGINT)
             |  FROM post JOIN trm USING (w) GROUP BY post.w, trm.n_remove),
             |dl AS (
             |  SELECT doc_id,
             |         CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
             |  FROM documents),
             |statsec AS (
             |  SELECT 'corpus_stats', 'n_docs',
             |         CAST((SELECT COUNT(*) FROM dl JOIN rm USING (doc_id)) AS BIGINT),
             |         CAST((SELECT COUNT(*) FROM dl) AS BIGINT)
             |  UNION ALL
             |  SELECT 'corpus_stats', 'sum_dl',
             |         CAST(COALESCE((SELECT SUM(dl) FROM dl JOIN rm USING (doc_id)), 0) AS BIGINT),
             |         CAST((SELECT SUM(dl) FROM dl) AS BIGINT)),
             |sksec AS (
             |  SELECT 'sketches', CAST(sk.doc_id AS VARCHAR),
             |         CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
             |  FROM (SELECT doc_id
             |        FROM read_parquet('/tmp/graft_sketch_oracle/docids/*.parquet')) sk
             |  JOIN rm USING (doc_id) GROUP BY sk.doc_id),
             |assign AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |arm AS (
             |  SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_remove
             |  FROM assign JOIN rm ON assign.vec_id = rm.doc_id GROUP BY 1),
             |acnt AS (
             |  SELECT assign.list_id, arm.n_remove, CAST(COUNT(*) AS BIGINT) AS n_before
             |  FROM assign JOIN arm USING (list_id) GROUP BY assign.list_id, arm.n_remove),
             |asec AS (
             |  SELECT 'ivf_assign', CAST(list_id AS VARCHAR), n_remove, n_before FROM acnt),
             |psec AS (
             |  SELECT 'pq_codes', CAST(list_id AS VARCHAR), n_remove, n_before FROM acnt),
             |mt AS (
             |  SELECT lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |mc AS (
             |  SELECT lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id) AS cum
             |  FROM mt WHERE n_tokens > 0),
             |msp AS (
             |  SELECT lang, doc_id,
             |         CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |         CAST((cum - 1) // 2048 AS BIGINT) AS end_seq
             |  FROM mc),
             |mani AS (
             |  SELECT lang, doc_id, CAST(unnest(range(start_seq, end_seq + 1)) AS BIGINT) AS seq_id
             |  FROM msp),
             |srm AS (
             |  SELECT lang, seq_id, CAST(COUNT(*) AS BIGINT) AS n_remove
             |  FROM mani JOIN rm USING (doc_id) GROUP BY 1, 2),
             |ssec AS (
             |  SELECT 'sequences', mani.lang || ':' || CAST(mani.seq_id AS VARCHAR),
             |         srm.n_remove, CAST(COUNT(*) AS BIGINT)
             |  FROM mani JOIN srm USING (lang, seq_id)
             |  GROUP BY mani.lang, mani.seq_id, srm.n_remove),
             |shrm AS (
             |  SELECT lang, CAST(seq_id // 16 AS BIGINT) AS shard_id,
             |         CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_remove
             |  FROM srm GROUP BY 1, 2),
             |shall AS (
             |  SELECT lang, CAST(seq_id // 16 AS BIGINT) AS shard_id,
             |         CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_before
             |  FROM (SELECT DISTINCT lang, seq_id FROM mani) GROUP BY 1, 2),
             |shsec AS (
             |  SELECT 'shards', shall.lang || ':' || CAST(shall.shard_id AS VARCHAR),
             |         shrm.n_remove, shall.n_before
             |  FROM shall JOIN shrm USING (lang, shard_id)),
             |certsec AS (
             |  SELECT 'manifest_cert', lang || ':n_docs',
             |         CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT)
             |  FROM mt WHERE n_tokens > 0 GROUP BY lang
             |  UNION ALL
             |  SELECT 'manifest_cert', lang || ':n_tokens',
             |         CAST(0 AS BIGINT), CAST(SUM(n_tokens) AS BIGINT)
             |  FROM mt WHERE n_tokens > 0 GROUP BY lang),
             |anchor AS (
             |  SELECT 'removal' AS artifact, 'n_docs' AS "key",
             |         CAST((SELECT COUNT(*) FROM rm) AS BIGINT) AS n_remove,
             |         CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_before),
             |allr AS (
             |  SELECT * FROM anchor  UNION ALL SELECT * FROM fpsec
             |  UNION ALL SELECT * FROM sksec  UNION ALL SELECT * FROM postsec
             |  UNION ALL SELECT * FROM statsec UNION ALL SELECT * FROM asec
             |  UNION ALL SELECT * FROM psec  UNION ALL SELECT * FROM ssec
             |  UNION ALL SELECT * FROM shsec UNION ALL SELECT * FROM certsec)
             |SELECT artifact, "key", n_remove, n_before,
             |       n_before - n_remove AS n_after
             |FROM allr ORDER BY artifact, "key"""".stripMargin),
      dumps = Seq(ivfDump, sketchDump)),

    // TAKEDOWN APPLY (q270): execute the q268 plan — every artifact
    // anti-joined into its purged successor, the audit RECOUNTED from
    // the purged frame itself (`clean` = a semi-join probe proving no
    // removed key survives; the oracle expects TRUE, so a hash match
    // certifies the executed purge, not the intention), and the
    // packed sequences REBUILT over documents-minus-removal with
    // exact token-mass conservation per lang. The flag→action pattern
    // (q235→q259, q244→q260) applied to q268.
    QuerySpec(
      "q270_takedown_apply",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        CorpusOps.takedownApply(
          docs,
          docs.filter(pmod(col("doc_id"), lit(17)) === 4).select(col("doc_id")),
          RetrievalShared.postings(s, dir),
          RetrievalShared.docLengths(s, dir),
          SketchShared.sketches(s, dir),
          idx.assigned,
          SimilarityOps.ivfPqCodesFor(idx, tag = dir),
          storedManifest = Some(CorpusOps.sequenceManifestFor(docs, tag = dir)))
      },
      Some(q270OracleSqlOver("doc_id % 17 = 4")),
      dumps = Seq(ivfDump, sketchDump)),

    // TAKEDOWN of the REMAINING stores (q273, r15): the q268/q270
    // purge extended to the stores that would otherwise still serve a
    // deleted document's content — the LM count tables (decremented:
    // the q245 merge run backwards), the additive corpus-card state
    // (folded out, keeper re-evaluation included — one ledger row per
    // (cell, measure) so every corrected sum enters the hash), the
    // binary-signature table (anti-join), and the non-decrementable
    // held-out-gram Bloom, whose honest row is clean = FALSE with the
    // rebuild's key-set size. The oracle recomputes every section from
    // raw tables minus the removal set — a hash match proves the
    // decrement/fold-out algebra equals a full retrain.
    QuerySpec(
      "q273_takedown_stores",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, md5, pmod}
        val docs = Tables.documents(s, dir)
        CorpusOps.takedownStores(
          docs,
          docs.filter(pmod(col("doc_id"), lit(17)) === 4).select(col("doc_id")),
          TextOps.lmModelFor(docs, tag = dir),
          CorpusOps.corpusCardState(docs),
          docs.select(col("doc_id"), md5(col("text")).as("fp_md5")),
          SimilarityOps.binarySigsFor(Tables.embeddings(s, dir), tag = dir),
          binarySigsWide = Some(SimilarityOps.binarySigsWideFor(
            wideEmbeddings(s, dir), tag = "w" + dir)))
      },
      Some(q273OracleSqlOver("doc_id % 17 = 4")),
      dumps = Seq(binSigDump, binSigWideDump)),

    // DOCUMENT-AGE RETENTION SWEEP (q291, r17 — VERDICT r16 missing
    // #4): the q286 time predicate on the corpus side — expire every
    // document ingested before the horizon and drive the expired set
    // through the TWO already-certified purge appliers: q270's
    // (postings df ledger, doc lengths, fingerprints, sketches, IVF
    // assignments + IVF-PQ codes, packed-manifest rebuild with
    // token-mass conservation) and q273's (LM decrements, card
    // fold-out, signature anti-join, the honest bloom_rebuild flag).
    // The synthetic ingest timestamp is a deterministic function of
    // doc_id (day = doc_id mod 28 from 2024-01-01), so the oracle
    // replays the SAME factored q270+q273 chains with the time
    // predicate in place of the id list — one conservation ledger,
    // every section recomputed from documents at-or-after the cutoff.
    QuerySpec(
      "q291_doc_retention_sweep",
      (s, dir) => {
        import org.apache.spark.sql.functions.{expr, md5}
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        CorpusOps.docRetentionSweep(
          docs,
          expr("CAST(date_add(DATE'2024-01-01', CAST(doc_id % 28 AS INT)) AS TIMESTAMP)"),
          "2024-01-08 00:00:00",
          RetrievalShared.postings(s, dir),
          RetrievalShared.docLengths(s, dir),
          SketchShared.sketches(s, dir),
          idx.assigned,
          SimilarityOps.ivfPqCodesFor(idx, tag = dir),
          TextOps.lmModelFor(docs, tag = dir),
          CorpusOps.corpusCardState(docs),
          SimilarityOps.binarySigsFor(emb, tag = dir),
          storedManifest = Some(CorpusOps.sequenceManifestFor(docs, tag = dir)),
          binarySigsWide = Some(SimilarityOps.binarySigsWideFor(
            wideEmbeddings(s, dir), tag = "w" + dir)))
      },
      Some(s"""SELECT * FROM (${q270OracleSqlOver("doc_id % 28 < 7")})
              |UNION ALL
              |SELECT * FROM (${q273OracleSqlOver("doc_id % 28 < 7")})
              |ORDER BY artifact, "key"""".stripMargin),
      dumps = Seq(ivfDump, sketchDump, binSigDump, binSigWideDump)),

    // BLOOM REBUILD applier (q283, r16 — VERDICT r15 missing #1): the
    // follow-through on q273's honest `bloom_rebuild, clean=false`
    // flag. The decontamination Bloom cannot decrement, so the
    // applier REBUILDS it from held-out-minus-removal and certifies:
    // key-set conservation (the q273 row flipped to clean=true),
    // removed-only grams now unservable (pre: all probe positive —
    // no false negatives; post: FP-only survivors), and the q85
    // serving verdicts over the purged corpus under old vs new
    // filter. The oracle replays BOTH filter generations bit-exactly
    // (each with its own geometry), so a hash match certifies the
    // executed rebuild, false positives included.
    QuerySpec(
      "q283_bloom_rebuild",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val docs = Tables.documents(s, dir)
        TextOps.bloomRebuildApply(
          docs,
          docs.filter(pmod(col("doc_id"), lit(17)) === 4).select(col("doc_id")))
      },
      Some(q283OracleSql)),

    // QUARANTINE ROUND-TRIP (q287, r16): soft delete with a
    // legal-hold restore — the quarantine retains ONLY source rows
    // (removed docs + their vectors), every derived store
    // hard-purges, and restore RE-DERIVES the removed rows through
    // the engine's own incremental machinery (re-tokenize, recompute
    // fingerprints/sketches/signatures, re-assign + re-encode against
    // the unchanged quantizers, LM merge-back, card fold-in with
    // keeper re-evaluation inverted). clean = the restored store is
    // row-identical to the original — the proof that hard-deleting
    // every derived row while quarantining only source loses nothing.
    // The oracle recomputes each store's before/purged/restored
    // counts from raw tables and dumped store keys and expects every
    // clean flag TRUE, so an engine whose restore drifts by even one
    // row fails loudly.
    QuerySpec(
      "q287_quarantine_roundtrip",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, md5, pmod}
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        CorpusOps.quarantineRoundTrip(
          docs, emb,
          docs.filter(pmod(col("doc_id"), lit(17)) === 4).select(col("doc_id")),
          RetrievalShared.postings(s, dir),
          RetrievalShared.docLengths(s, dir),
          SketchShared.sketches(s, dir),
          docs.select(col("doc_id"), md5(col("text")).as("fp_md5")),
          TextOps.lmModelFor(docs, tag = dir),
          CorpusOps.corpusCardState(docs),
          idx,
          SimilarityOps.ivfPqCodesFor(idx, tag = dir),
          SimilarityOps.ivfPqCodebookFor(idx, tag = dir),
          SimilarityOps.binarySigsFor(emb, tag = dir),
          wide = Some((wideEmbeddings(s, dir),
            SimilarityOps.binarySigsWideFor(wideEmbeddings(s, dir),
              tag = "w" + dir))))
      },
      Some(s"""WITH rm AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 17 = 4),
              |keep AS (SELECT * FROM documents
              |         WHERE doc_id NOT IN (SELECT doc_id FROM rm)),
              |t AS (SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
              |      FROM documents),
              |post AS (SELECT w, doc_id
              |         FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
              |o AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
              |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
              |            FROM t WHERE len(toks) >= 2)),
              |ok AS (SELECT * FROM o WHERE doc_id NOT IN (SELECT doc_id FROM rm)),
              |skst AS (SELECT doc_id
              |         FROM read_parquet('/tmp/graft_sketch_oracle/docids/*.parquet')),
              |sgst AS (SELECT vec_id
              |         FROM read_parquet('/tmp/graft_binsig_oracle/vecids/*.parquet')),
              |sgwst AS (SELECT vec_id
              |         FROM read_parquet('/tmp/graft_binsigw_oracle/vecids/*.parquet')),
              |assign AS (SELECT vec_id
              |           FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
              |rows_ AS (
              |  SELECT 'postings' AS artifact, 'all' AS "key",
              |         CAST((SELECT COUNT(*) FROM post) AS BIGINT) AS n_before,
              |         CAST((SELECT COUNT(*) FROM post
              |               WHERE doc_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT) AS n_purged,
              |         CAST((SELECT COUNT(*) FROM post) AS BIGINT) AS n_restored,
              |         TRUE AS clean
              |  UNION ALL
              |  SELECT a, 'all',
              |         CAST((SELECT COUNT(*) FROM documents) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM keep) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM documents) AS BIGINT), TRUE
              |  FROM (VALUES ('doc_lengths'), ('fingerprints')) AS v(a)
              |  UNION ALL
              |  SELECT 'sketches', 'all',
              |         CAST((SELECT COUNT(*) FROM skst) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM skst
              |               WHERE doc_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM skst) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT 'binary_sigs', 'all',
              |         CAST((SELECT COUNT(*) FROM sgst) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM sgst
              |               WHERE vec_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM sgst) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT 'binary_sigs_wide', 'all',
              |         CAST((SELECT COUNT(*) FROM sgwst) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM sgwst
              |               WHERE vec_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM sgwst) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT a, 'all',
              |         CAST((SELECT COUNT(*) FROM assign) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM assign
              |               WHERE vec_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM assign) AS BIGINT), TRUE
              |  FROM (VALUES ('ivf_assign'), ('pq_codes')) AS v(a)
              |  UNION ALL
              |  SELECT 'lm_bigrams', 'all',
              |         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT w1, w2 FROM o) x) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT w1, w2 FROM ok) x) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT w1, w2 FROM o) x) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT 'lm_contexts', 'all',
              |         CAST((SELECT COUNT(DISTINCT w1) FROM o) AS BIGINT),
              |         CAST((SELECT COUNT(DISTINCT w1) FROM ok) AS BIGINT),
              |         CAST((SELECT COUNT(DISTINCT w1) FROM o) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT 'lm_vocab', 'all',
              |         CAST((SELECT COUNT(DISTINCT w) FROM
              |               (SELECT w1 AS w FROM o UNION SELECT w2 FROM o) x) AS BIGINT),
              |         CAST((SELECT COUNT(DISTINCT w) FROM
              |               (SELECT w1 AS w FROM ok UNION SELECT w2 FROM ok) x) AS BIGINT),
              |         CAST((SELECT COUNT(DISTINCT w) FROM
              |               (SELECT w1 AS w FROM o UNION SELECT w2 FROM o) x) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT 'card_state', 'all',
              |         CAST((SELECT COUNT(*) FROM
              |               (SELECT DISTINCT lang, source FROM documents) x) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM
              |               (SELECT DISTINCT lang, source FROM keep) x) AS BIGINT),
              |         CAST((SELECT COUNT(*) FROM
              |               (SELECT DISTINCT lang, source FROM documents) x) AS BIGINT), TRUE)
              |SELECT artifact, "key", n_before, n_purged, n_restored, clean
              |FROM rows_ ORDER BY artifact""".stripMargin),
      // pq_codes counts derive from the assign dump (codes are 1:1
      // with assignments), so only four dumps are actually read
      dumps = Seq(ivfDump, sketchDump, binSigDump, binSigWideDump)),

    // ENTITY-ALIAS takedown (q276, r15): removal of dim records from
    // the persisted alias store by touched-group re-close — a removed
    // BRIDGE record legitimately SPLITS its group, which no row-delete
    // can express. The oracle rebuilds the closure over
    // part-minus-removal from scratch (and the old closure for the
    // touched set), so a hash match proves the touched-only re-close
    // equals the full rebuild, splits included.
    QuerySpec(
      "q276_entity_takedown",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val part = Tables.part(s, dir)
        DedupOps.entityTakedown(
          part,
          part.filter(pmod(col("p_partkey"), lit(17)) === 4)
            .select(col("p_partkey")),
          DedupOps.entityGroupsFor(part, tag = dir))
      },
      Some("""WITH RECURSIVE rm AS (
             |  SELECT p_partkey FROM part WHERE p_partkey % 17 = 4),
             |pro AS (
             |  SELECT a.p_partkey AS doc_i, b.p_partkey AS doc_j
             |  FROM part a JOIN part b
             |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
             |eo AS (SELECT doc_i AS src, doc_j AS dst FROM pro
             |       UNION ALL SELECT doc_j, doc_i FROM pro),
             |reacho(node, lbl) AS (
             |  SELECT p_partkey, p_partkey FROM part
             |  UNION
             |  SELECT eo.dst, r.lbl FROM reacho r JOIN eo ON eo.src = r.node),
             |oldcl AS (SELECT node AS p_partkey, MIN(lbl) AS old_entity
             |          FROM reacho GROUP BY node),
             |touched AS (
             |  SELECT DISTINCT old_entity FROM oldcl JOIN rm USING (p_partkey)),
             |keep AS (SELECT * FROM part
             |         WHERE p_partkey NOT IN (SELECT p_partkey FROM rm)),
             |prn AS (
             |  SELECT a.p_partkey AS doc_i, b.p_partkey AS doc_j
             |  FROM keep a JOIN keep b
             |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
             |en AS (SELECT doc_i AS src, doc_j AS dst FROM prn
             |       UNION ALL SELECT doc_j, doc_i FROM prn),
             |reachn(node, lbl) AS (
             |  SELECT p_partkey, p_partkey FROM keep
             |  UNION
             |  SELECT en.dst, r.lbl FROM reachn r JOIN en ON en.src = r.node),
             |newcl AS (SELECT node AS p_partkey, MIN(lbl) AS entity_id
             |          FROM reachn GROUP BY node),
             |sz AS (SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_members
             |       FROM newcl GROUP BY 1)
             |SELECT newcl.p_partkey, newcl.entity_id, sz.n_members,
             |       cn.p_name AS canonical_name,
             |       CASE WHEN oc.old_entity IN (SELECT old_entity FROM touched)
             |            THEN 'reclosed' ELSE 'untouched' END AS status
             |FROM newcl JOIN sz USING (entity_id)
             |JOIN keep cn ON cn.p_partkey = newcl.entity_id
             |JOIN oldcl oc ON oc.p_partkey = newcl.p_partkey
             |ORDER BY newcl.p_partkey""".stripMargin)),

    // TAKEDOWN SERVING CERTIFICATION (q277, r15): after the q270/q273
    // purge, every serving surface (BM25, exact cosine, IVF probe,
    // PQ ADC, binary hamming) runs against its purged store; the
    // report certifies zero removed-doc leakage, full listing
    // availability, and the blast radius (slots lost / backfilled).
    // Removal is doc_id % 17 = 6 so the shared query set (qid < 5,
    // BM25 qids 0-2) survives the purge — querying with removed
    // content would itself be a leak. The oracle replays all TEN
    // listings (five surfaces × pre/post) from the raw tables + the
    // dumped IVF/PQ state and recomputes every count.
    QuerySpec(
      "q277_takedown_cert",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        CorpusOps.takedownServingCert(
          docs.filter(pmod(col("doc_id"), lit(17)) === 6)
            .select(col("doc_id")),
          RetrievalShared.postings(s, dir),
          RetrievalShared.docLengths(s, dir),
          emb, idx,
          SimilarityOps.pqCodebookFor(emb, tag = dir),
          SimilarityOps.binarySigsFor(emb, tag = dir))
      },
      Some(q277OracleSql),
      dumps = Seq(ivfDump, pqDump)),

    // TAKEDOWN SERVING CERT, COMPRESSED PATH (q282, r15): q277 for
    // the IVF-PQ read path — a purged assignment store does not stop
    // the CODES table from serving a removed id, so the production
    // path gets its own pre/post listing cert (zero leakage,
    // conserved slots, 1:1 backfill — ADC pointwise, routes fixed).
    // The oracle replays the full q255 chain (residual encode, coarse
    // probe, LUT, ADC) from the dumped quantizers, both listings.
    QuerySpec(
      "q282_takedown_cert_ivfpq",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val docs = Tables.documents(s, dir)
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        CorpusOps.takedownServingCertIvfPq(
          docs.filter(pmod(col("doc_id"), lit(17)) === 6)
            .select(col("doc_id")),
          emb, idx,
          SimilarityOps.ivfPqCodebookFor(idx, tag = dir),
          SimilarityOps.ivfPqCodesFor(idx, tag = dir))
      },
      Some(s"""WITH rm AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 17 = 6),
             |a AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |ic AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS list_id,
             |         CAST(centroid AS DOUBLE[]) AS icent
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |cb AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivfpq_oracle/centers/*.parquet')),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |r AS (
             |  SELECT v.vec_id, a.list_id,
             |         list_transform(list_zip(e, icent), p -> p[1] - p[2]) AS res
             |  FROM v JOIN a USING (vec_id) JOIN ic USING (list_id)),
             |d AS (
             |  SELECT vec_id, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM r CROSS JOIN cb),
             |codes AS (
             |  SELECT vec_id, list_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d)
             |  WHERE rk = 1),
             |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
             |co0 AS (
             |  SELECT qid, list_id, icent, qe,
             |         list_sum(list_transform(list_zip(qe, icent),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS cd2
             |  FROM q CROSS JOIN ic),
             |coarse AS (
             |  SELECT qid, list_id,
             |         list_transform(list_zip(qe, icent), p -> p[1] - p[2]) AS qres
             |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
             |                                     ORDER BY cd2, list_id) AS rk FROM co0)
             |  WHERE rk <= 4),
             |lut AS (
             |  SELECT qid, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(qres, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
             |  FROM coarse CROSS JOIN cb),
             |adc0 AS (
             |  SELECT qid, vec_id,
             |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
             |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
             |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
             |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
             |  FROM codes s JOIN lut USING (list_id, subspace, code)
             |  WHERE vec_id <> qid GROUP BY qid, vec_id),
             |pre1 AS (
             |  SELECT qid, vec_id AS id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |        FROM adc0) WHERE rn <= 10),
             |post1 AS (
             |  SELECT qid, vec_id AS id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |        FROM adc0 WHERE vec_id % 17 <> 6) WHERE rn <= 10),
             |certrows AS (
             |  ${q277CertRow("ivfpq_adc", "pre1", "post1")})
             |SELECT surface, n_slots_pre, n_slots_post, n_removed_pre,
             |       n_leaked_post, n_backfilled,
             |       (n_leaked_post = 0 AND n_slots_post = n_slots_pre) AS clean
             |FROM certrows ORDER BY surface""".stripMargin),
      dumps = Seq(ivfDump, ivfPqDump)),

    // IVF MERGE applier (q271): the fit-free inverse of the q259
    // split and the takedown's index-side follow-up — a deletion-heavy
    // purge (here: lists 0-2 keep only every 7th vector) leaves
    // underfull lists; the gate (n·nLists·factor < total, the integer
    // mirror of q235) flags them, their members reassign per-member to
    // the nearest SURVIVING centroid, and the flagged centroids are
    // removed. No fit anywhere, so the oracle replays the ENTIRE
    // action — gate, survivor set, per-member argmin, absorption,
    // conservation — from the dumped index state.
    QuerySpec(
      "q271_ivf_merge",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod, not}
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        val purged = SimilarityOps.IvfIndex(
          idx.assigned.filter(not(
            col("list_id").cast("long") < 3 &&
              pmod(col("vec_id"), lit(7)) =!= 0)),
          idx.centers, idx.nLists)
        SimilarityOps.ivfMergeApply(purged).report
      },
      Some("""WITH assign0 AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |centers AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS c_list_id, CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |assign AS (
             |  SELECT * FROM assign0 WHERE NOT (list_id < 3 AND vec_id % 7 <> 0)),
             |cnt AS (
             |  SELECT centers.c_list_id AS list_id,
             |         CAST(COALESCE(a.n, 0) AS BIGINT) AS n_before
             |  FROM centers LEFT JOIN
             |    (SELECT list_id, COUNT(*) AS n FROM assign GROUP BY 1) a
             |    ON centers.c_list_id = a.list_id),
             |t AS (SELECT CAST(SUM(n_before) AS BIGINT) AS total,
             |             CAST(COUNT(*) AS BIGINT) AS n_lists FROM cnt),
             |fl AS (
             |  SELECT list_id, n_before,
             |         n_before * n_lists * 4 < total AS underfull
             |  FROM cnt CROSS JOIN t),
             |surv AS (
             |  SELECT c_list_id, c FROM centers
             |  JOIN fl ON centers.c_list_id = fl.list_id WHERE NOT underfull),
             |mov AS (
             |  SELECT a.vec_id, v.e
             |  FROM assign a JOIN fl ON a.list_id = fl.list_id
             |  JOIN v ON a.vec_id = v.vec_id
             |  WHERE fl.underfull),
             |md AS (
             |  SELECT mov.vec_id, surv.c_list_id,
             |         list_sum(list_transform(list_zip(e, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM mov CROSS JOIN surv),
             |re AS (
             |  SELECT vec_id, c_list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_list_id) AS rk
             |        FROM md) WHERE rk = 1),
             |ab AS (
             |  SELECT c_list_id AS list_id, CAST(COUNT(*) AS BIGINT) AS n_absorbed
             |  FROM re GROUP BY 1)
             |SELECT fl.list_id, underfull AS merged, n_before,
             |       CAST(COALESCE(ab.n_absorbed, 0) AS BIGINT) AS n_absorbed,
             |       CAST(CASE WHEN underfull THEN 0
             |            ELSE n_before + COALESCE(ab.n_absorbed, 0) END AS BIGINT) AS n_after,
             |       CAST(CASE WHEN underfull THEN 0
             |            ELSE n_before + COALESCE(ab.n_absorbed, 0) END AS DOUBLE) / total AS share_after
             |FROM fl LEFT JOIN ab USING (list_id) CROSS JOIN t
             |ORDER BY fl.list_id""".stripMargin),
      dumps = Seq(ivfDump)),

    // IVF-PQ nProbe SWEEP (q272): q269's dial priced on the PRODUCTION
    // read path — the q255 compressed chain (stored residual codes +
    // ADC) per nProbe ∈ {1,2,4,8,16}. Completes the serving-policy
    // surface: q266 picks the rung (bytes), q269/q272 pick its dial
    // (probes) for the exact and compressed scan respectively. The
    // oracle is the q255 chain with the coarse stage parameterized by
    // a literal rung table — codes replayed from the dumped
    // quantizers, aggregated in one SQL like q266/q269.
    QuerySpec(
      "q272_ivfpq_nprobe_sweep",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        SimilarityOps.ivfPqProbeSweepFor(idx,
          SimilarityOps.ivfPqCodebookFor(idx, tag = dir), emb,
          SimilarityOps.ivfPqCodesFor(idx, tag = dir), tag = dir)
      },
      Some(q272OracleSql),
      dumps = Seq(ivfDump, ivfPqDump)),

    // SERVING-POLICY SELECTOR (q274, r15): q266's bytes ladder ×
    // q269's exact nProbe curve × q272's compressed nProbe curve
    // joined into the decision those three reports exist to feed —
    // per target recall tier, the CHEAPEST (rung, nProbe) config
    // meeting it, ordered (bytes_per_vec, candidates, name). The
    // oracle unions the constituents' already-certified SQL (the
    // q266 aggregation pattern) and replays the argmin, so the
    // selector cannot drift from the reports it summarizes. The
    // ladder's fixed ivf16_pq4 row is excluded — q272's rungs are
    // that operating point with honest candidate counts.
    QuerySpec(
      "q274_serving_policy",
      (s, dir) => SimilarityOps.servingPolicySelector(
        Tables.embeddings(s, dir), tag = dir),
      Some(s"""WITH cfg AS (
              |  SELECT 'binary_sign64' AS config, CAST(8 AS BIGINT) AS bytes_per_vec,
              |         CAST(5 * ((SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT) AS n_candidates,
              |         CAST(SUM(n_hits) AS BIGINT) AS sum_hits, CAST(SUM(k) AS BIGINT) AS sum_k
              |  FROM ($q264OracleSql)
              |  UNION ALL
              |  SELECT 'int8_sym127', CAST(72 AS BIGINT),
              |         CAST(5 * ((SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT),
              |         CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q267OracleSql)
              |  UNION ALL
              |  SELECT 'pq4x16', CAST(4 AS BIGINT),
              |         CAST(5 * ((SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT),
              |         CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q242OracleSql)
              |  UNION ALL
              |  SELECT 'trunc_' || CAST(dim AS VARCHAR), CAST(dim * 4 AS BIGINT),
              |         CAST(5 * ((SELECT COUNT(*) FROM embeddings) - 1) AS BIGINT),
              |         CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM ($q249OracleSql) GROUP BY dim
              |  UNION ALL
              |  SELECT 'ivf_exact_np' || CAST(n_probe AS VARCHAR), CAST(520 AS BIGINT),
              |         n_candidates, sum_hits, sum_k
              |  FROM ($q269OracleSql)
              |  UNION ALL
              |  SELECT 'ivf16_pq4_np' || CAST(n_probe AS VARCHAR), CAST(12 AS BIGINT),
              |         n_candidates, sum_hits, sum_k
              |  FROM ($q272OracleSql)),
              |cfgr AS (
              |  SELECT *, CAST(sum_hits * 1000000 // sum_k AS BIGINT) AS recall_ppm
              |  FROM cfg),
              |tiers AS (
              |  SELECT CAST(t AS BIGINT) AS target_recall_ppm
              |  FROM (VALUES (500000), (700000), (800000), (900000),
              |               (950000), (1000000)) AS v(t)),
              |ranked AS (
              |  SELECT tiers.target_recall_ppm, cfgr.*,
              |         row_number() OVER (PARTITION BY tiers.target_recall_ppm
              |           ORDER BY bytes_per_vec, n_candidates, config) AS rn
              |  FROM tiers JOIN cfgr ON cfgr.recall_ppm >= tiers.target_recall_ppm)
              |SELECT target_recall_ppm, config, bytes_per_vec, n_candidates,
              |       sum_hits, sum_k, recall_ppm
              |FROM ranked WHERE rn = 1
              |ORDER BY target_recall_ppm""".stripMargin),
      dumps = Seq(pqDump, ivfDump, ivfPqDump)),

    // ANN LADDER on a PRODUCTION-WIDTH corpus (q285, r16 — VERDICT
    // r15 missing #3): the q266 decision table driven over the 128-d
    // q275 fixture, proving the ladder runs past the d ≤ 64 guard —
    // its binary rung is SCORED by the multi-word Hamming path over
    // the persisted wide-sig table and PRICED by the 8·⌈d/64⌉ law
    // (16 B here), int8 by d + 8 (136 B). The oracle aggregates the
    // per-word q275 chain plus the int8/trunc chains instantiated on
    // the SAME wide corpus expression (quantChainCtes /
    // q249OracleSqlOver parameterized over the corpus), so the wide
    // ladder cannot drift from the laws its 64-d constituents
    // certify. The fitted PQ/IVF-PQ rungs also run (the ladder is
    // the real operator, not a scan-rung subset) but are filtered
    // from the compared frame — their wide fitted state has no
    // dumped oracle; the 64-d q242/q255 chains certify those laws.
    QuerySpec(
      "q285_ann_ladder_wide",
      (s, dir) => SimilarityOps.annLadder(wideEmbeddings(s, dir), tag = "w" + dir)
        .filter(col("method").isin(
          "binary_sign64", "int8_sym127", "trunc_16", "trunc_32"))
        .orderBy(col("method")),
      Some(s"""SELECT method, bytes_per_vec, sum_hits, sum_k,
              |       CAST(sum_hits * 1000000 // sum_k AS BIGINT) AS recall_ppm
              |FROM (
              |  SELECT 'binary_sign64' AS method, CAST(16 AS BIGINT) AS bytes_per_vec,
              |         CAST(SUM(n_hits) AS BIGINT) AS sum_hits, CAST(SUM(k) AS BIGINT) AS sum_k
              |  FROM ($q275OracleSql)
              |  UNION ALL
              |  SELECT 'int8_sym127', CAST(136 AS BIGINT), CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM (${q267OracleSqlOver(wideCorpusSql)})
              |  UNION ALL
              |  SELECT 'trunc_' || CAST(dim AS VARCHAR), CAST(dim * 4 AS BIGINT),
              |         CAST(SUM(n_hits) AS BIGINT), CAST(SUM(k) AS BIGINT)
              |  FROM (${q249OracleSqlOver(wideCorpusSql)}) GROUP BY dim
              |) ORDER BY method""".stripMargin)),

    // IVF-PQ CODES REPAIR (q288, r17 — VERDICT r16 missing #1): make
    // the persisted codes table FOLLOW the q259 split. The stored
    // codes are residuals against the pre-split centroids; after the
    // applier replaces a flagged parent with fitted children, every
    // member of that parent (including child 0's, which keeps the
    // parent's list id but gets a re-fit centroid) re-takes its
    // residual against its child centroid and re-encodes under the
    // UNCHANGED stored codebook, while unflagged lists' rows ride
    // verbatim and the appended batch encodes fresh. The report is
    // cell-granular (the q256 posture), so the oracle certifies BOTH
    // sides: n_kept only matches if the kept rows equal the original
    // residual-argmin replay, n_reencoded only if the repaired rows
    // equal an independent replay against the post-split centroid
    // set (the q259 reassignment chain composed with the q256 encode
    // chain — three dumped artifacts, zero trusted intermediates).
    QuerySpec(
      "q288_ivfpq_codes_repair",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val idx = SimilarityOps.ivfIndexFor(emb, tag = dir)
        SimilarityOps.ivfPqCodesRepair(
          SimilarityOps.ivfPqCodesFor(idx, tag = dir),
          idx,
          SimilarityOps.ivfRebalanceFor(idx, rebalanceBatch(emb), tag = dir)
            .updated,
          SimilarityOps.ivfPqCodebookFor(idx, tag = dir)).report
      },
      Some("""WITH centers AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS list_id, CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |assign AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |ch AS (
             |  SELECT CAST(parent_list_id AS BIGINT) AS parent_list_id,
             |         CAST(child_list_id AS BIGINT) AS child_list_id,
             |         CAST(centroid AS DOUBLE[]) AS cc
             |  FROM read_parquet('/tmp/graft_ivfreb_oracle/children/*.parquet')),
             |cb AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivfpq_oracle/centers/*.parquet')),
             |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lists FROM centers),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |b AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_transform(CAST(embedding AS DOUBLE[]), x -> 100.0 + x * 0.01) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |bd AS (
             |  SELECT b.vec_id, centers.list_id,
             |         list_sum(list_transform(list_zip(e, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM b CROSS JOIN centers),
             |ba AS (
             |  SELECT vec_id, list_id
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, list_id) AS rk
             |        FROM bd) WHERE rk = 1),
             |nb AS (SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_before FROM assign GROUP BY 1),
             |nn AS (SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_new FROM ba GROUP BY 1),
             |r AS (
             |  SELECT centers.list_id,
             |         COALESCE(n_before, 0) + COALESCE(n_new, 0) AS n_after
             |  FROM centers LEFT JOIN nb USING (list_id) LEFT JOIN nn USING (list_id)),
             |t AS (SELECT CAST(SUM(n_after) AS BIGINT) AS total_after FROM r),
             |flags AS (SELECT r.list_id FROM r CROSS JOIN t CROSS JOIN nl
             |          WHERE n_after * n_lists > 2 * total_after),
             |mem AS (
             |  SELECT a.vec_id, a.list_id AS parent_list_id, v.e
             |  FROM assign a JOIN v USING (vec_id)
             |  WHERE a.list_id IN (SELECT list_id FROM flags)
             |  UNION ALL
             |  SELECT ba.vec_id, ba.list_id, b.e
             |  FROM ba JOIN b USING (vec_id)
             |  WHERE ba.list_id IN (SELECT list_id FROM flags)),
             |md AS (
             |  SELECT mem.vec_id, ch.child_list_id, ch.cc, mem.e,
             |         list_sum(list_transform(list_zip(e, cc), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM mem JOIN ch ON mem.parent_list_id = ch.parent_list_id),
             |re AS (
             |  SELECT vec_id, child_list_id AS list_id, cc, e
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, child_list_id) AS rk
             |        FROM md) WHERE rk = 1),
             |renc AS (
             |  SELECT vec_id, list_id,
             |         list_transform(list_zip(e, cc), p -> p[1] - p[2]) AS res
             |  FROM re
             |  UNION ALL
             |  SELECT ba.vec_id, ba.list_id,
             |         list_transform(list_zip(b.e, centers.c), p -> p[1] - p[2]) AS res
             |  FROM ba JOIN b USING (vec_id) JOIN centers ON ba.list_id = centers.list_id
             |  WHERE ba.list_id NOT IN (SELECT list_id FROM flags)),
             |rd AS (
             |  SELECT vec_id, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM renc CROSS JOIN cb),
             |rcodes AS (
             |  SELECT list_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM rd)
             |  WHERE rk = 1),
             |kmem AS (
             |  SELECT a.vec_id, a.list_id,
             |         list_transform(list_zip(v.e, centers.c), p -> p[1] - p[2]) AS res
             |  FROM assign a JOIN v USING (vec_id) JOIN centers ON a.list_id = centers.list_id
             |  WHERE a.list_id NOT IN (SELECT list_id FROM flags)),
             |kd AS (
             |  SELECT vec_id, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM kmem CROSS JOIN cb),
             |kcodes AS (
             |  SELECT list_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM kd)
             |  WHERE rk = 1),
             |nk AS (SELECT list_id, subspace, code, CAST(COUNT(*) AS BIGINT) AS n_kept
             |       FROM kcodes GROUP BY 1, 2, 3),
             |nr AS (SELECT list_id, subspace, code, CAST(COUNT(*) AS BIGINT) AS n_reencoded
             |       FROM rcodes GROUP BY 1, 2, 3)
             |SELECT COALESCE(nk.list_id, nr.list_id) AS list_id,
             |       COALESCE(nk.subspace, nr.subspace) AS subspace,
             |       COALESCE(nk.code, nr.code) AS code,
             |       COALESCE(n_kept, 0) AS n_kept,
             |       COALESCE(n_reencoded, 0) AS n_reencoded,
             |       COALESCE(n_kept, 0) + COALESCE(n_reencoded, 0) AS n_total
             |FROM nk FULL OUTER JOIN nr
             |  ON nk.list_id = nr.list_id AND nk.subspace = nr.subspace
             | AND nk.code = nr.code
             |ORDER BY list_id, subspace, code""".stripMargin),
      dumps = Seq(ivfDump, ivfPqDump, rebDump)),

    // PQ V2 PROMOTION applier (q289, r17 — VERDICT r16 missing #2):
    // execute the rollout the q279 shadow gate prices. The gate is a
    // deterministic integer rule (every query's churn within the
    // budget); on approval the corpus∪batch re-encodes under the v2
    // codebook into a NEW versioned codes table (v1 untouched — the
    // q260 contract) and the serving pointer flips; on rejection the
    // applier is a no-op on artifacts. The cert probes PERSISTED
    // state (pointer re-read, availability anti-join against the
    // pointed-at table, served codes at cell granularity), and the
    // oracle replays the gate from the q279 chain plus BOTH codes
    // tables from the dumped codebooks — so the decision, the flip,
    // and every served code are independently certified whichever
    // branch fires at this SF.
    QuerySpec(
      "q289_pq_v2_promotion",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqPromoteApply(emb, driftBatch(emb), tag = dir)
      },
      Some(s"""WITH cb1 AS (
              |  SELECT CAST(subspace AS BIGINT) AS subspace,
              |         CAST(code AS BIGINT) AS code,
              |         CAST(centroid AS DOUBLE[]) AS c
              |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
              |cb2 AS (
              |  SELECT CAST(subspace AS BIGINT) AS subspace,
              |         CAST(code AS BIGINT) AS code,
              |         CAST(centroid AS DOUBLE[]) AS c
              |  FROM read_parquet('/tmp/graft_pqv2_oracle/centers/*.parquet')),
              |v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              |bt AS (
              |  SELECT vec_id + 1000000 AS vec_id,
              |         list_concat(
              |           list_transform(
              |             list_slice(CAST(embedding AS DOUBLE[]), 1, 16),
              |             x -> x * 3.0),
              |           list_slice(CAST(embedding AS DOUBLE[]), 17, 64)) AS e
              |  FROM embeddings WHERE vec_id % 7 = 3),
              |v AS (SELECT vec_id, e FROM v0 UNION ALL SELECT vec_id, e FROM bt),
              |d1 AS (
              |  SELECT vec_id, subspace, code,
              |         list_sum(list_transform(
              |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
              |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
              |  FROM v0 CROSS JOIN cb1),
              |c1 AS (
              |  SELECT vec_id, subspace, code
              |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
              |                                     ORDER BY d2, code) AS rk FROM d1)
              |  WHERE rk = 1),
              |d2c AS (
              |  SELECT vec_id, subspace, code,
              |         list_sum(list_transform(
              |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
              |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
              |  FROM v CROSS JOIN cb2),
              |c2 AS (
              |  SELECT vec_id, subspace, code
              |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
              |                                     ORDER BY d2, code) AS rk FROM d2c)
              |  WHERE rk = 1),
              |promo AS (
              |  SELECT CAST(MAX(n_churned) AS BIGINT) AS max_churn,
              |         MAX(n_churned) <= 5 AS promoted
              |  FROM ($q279OracleSql)),
              |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v0),
              |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
              |srv AS (
              |  SELECT subspace, code FROM c2
              |  WHERE (SELECT promoted FROM promo)
              |  UNION ALL
              |  SELECT subspace, code FROM c1
              |  WHERE NOT (SELECT promoted FROM promo)),
              |cell1 AS (SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS n_v1
              |          FROM c1 GROUP BY 1, 2),
              |cells AS (SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS n_v2
              |          FROM srv GROUP BY 1, 2),
              |rows_all AS (
              |  SELECT 'gate_max_churn' AS step, CAST(0 AS BIGINT) AS key,
              |         max_churn AS n_v1, CAST(5 AS BIGINT) AS n_v2,
              |         promoted, promoted AS clean
              |  FROM promo
              |  UNION ALL
              |  SELECT 'pointer', 0, 1,
              |         CASE WHEN promoted THEN 2 ELSE 1 END, promoted, TRUE
              |  FROM promo
              |  UNION ALL
              |  SELECT 'codes_rows', 0, (SELECT n FROM n0),
              |         CASE WHEN promoted THEN (SELECT n FROM nu)
              |              ELSE (SELECT n FROM n0) END, promoted, TRUE
              |  FROM promo
              |  UNION ALL
              |  SELECT 'availability', 0, (SELECT n FROM nu),
              |         CASE WHEN promoted THEN (SELECT n FROM nu)
              |              ELSE (SELECT n FROM n0) END, promoted, TRUE
              |  FROM promo
              |  UNION ALL
              |  SELECT 'codes_cell', subspace * 100 + code,
              |         COALESCE(n_v1, 0), COALESCE(n_v2, 0), promoted, TRUE
              |  FROM cell1 FULL OUTER JOIN cells USING (subspace, code)
              |  CROSS JOIN promo)
              |SELECT step, key, n_v1, n_v2, promoted, clean
              |FROM rows_all ORDER BY step, key""".stripMargin),
      dumps = Seq(pqDump, pqV2Dump)),

    // FLAT-PQ SERVING TAKEDOWN cert (q292, r17): the q289 promotion
    // creates a new persisted serving surface — versioned codes
    // tables behind a pointer — and every serving surface must obey
    // takedown (the invariant the wide-signature ledger row closed
    // for the binary path). A removal purges BOTH versioned tables
    // (a rollback must not resurrect a removed vector) and the
    // pointer-resolved ADC listing is driven over the PURGED serving
    // store with a leak probe. The oracle replays the gate (which
    // version serves), both purge recounts, and the full listing —
    // candidates from the purged store only — so n_slots certifies
    // the end-to-end surface, not a re-encode.
    QuerySpec(
      "q292_pq_serving_takedown",
      (s, dir) => {
        import org.apache.spark.sql.functions.{lit, pmod}
        val emb = Tables.embeddings(s, dir)
        SimilarityOps.pqServingTakedown(emb, driftBatch(emb), tag = dir,
          Tables.documents(s, dir)
            .filter(pmod(col("doc_id"), lit(17)) === 4)
            .select(col("doc_id")))
      },
      Some(s"""WITH cb1 AS (
              |  SELECT CAST(subspace AS BIGINT) AS subspace,
              |         CAST(code AS BIGINT) AS code,
              |         CAST(centroid AS DOUBLE[]) AS c
              |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
              |cb2 AS (
              |  SELECT CAST(subspace AS BIGINT) AS subspace,
              |         CAST(code AS BIGINT) AS code,
              |         CAST(centroid AS DOUBLE[]) AS c
              |  FROM read_parquet('/tmp/graft_pqv2_oracle/centers/*.parquet')),
              |v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              |bt AS (
              |  SELECT vec_id + 1000000 AS vec_id,
              |         list_concat(
              |           list_transform(
              |             list_slice(CAST(embedding AS DOUBLE[]), 1, 16),
              |             x -> x * 3.0),
              |           list_slice(CAST(embedding AS DOUBLE[]), 17, 64)) AS e
              |  FROM embeddings WHERE vec_id % 7 = 3),
              |v AS (SELECT vec_id, e FROM v0 UNION ALL SELECT vec_id, e FROM bt),
              |promo AS (
              |  SELECT MAX(n_churned) <= 5 AS promoted
              |  FROM ($q279OracleSql)),
              |rm AS (SELECT DISTINCT doc_id AS vec_id FROM documents
              |       WHERE doc_id % 17 = 4),
              |cand AS (
              |  SELECT vec_id, e FROM v
              |  WHERE vec_id NOT IN (SELECT vec_id FROM rm)
              |    AND ((SELECT promoted FROM promo) OR vec_id < 1000000)),
              |scb AS (
              |  SELECT * FROM cb2 WHERE (SELECT promoted FROM promo)
              |  UNION ALL
              |  SELECT * FROM cb1 WHERE NOT (SELECT promoted FROM promo)),
              |cdist AS (
              |  SELECT vec_id, subspace, code,
              |         list_sum(list_transform(
              |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
              |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
              |  FROM cand CROSS JOIN scb),
              |cd AS (
              |  SELECT vec_id, subspace, code
              |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
              |                                     ORDER BY d2, code) AS rk FROM cdist)
              |  WHERE rk = 1),
              |q AS (SELECT vec_id AS qid, e AS qe FROM cand WHERE vec_id < 5),
              |lut AS (
              |  SELECT qid, subspace, code,
              |         list_sum(list_transform(
              |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
              |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
              |  FROM q CROSS JOIN scb),
              |a AS (
              |  SELECT qid, vec_id,
              |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
              |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
              |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
              |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
              |  FROM cd s JOIN lut USING (subspace, code)
              |  WHERE vec_id <> qid GROUP BY qid, vec_id),
              |l AS (SELECT qid, vec_id FROM (
              |        SELECT qid, vec_id,
              |               row_number() OVER (PARTITION BY qid
              |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
              |        FROM a) WHERE rn <= 10),
              |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v0),
              |n0k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v0
              |        WHERE vec_id NOT IN (SELECT vec_id FROM rm)),
              |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
              |nuk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
              |        WHERE vec_id NOT IN (SELECT vec_id FROM rm)),
              |rows_ AS (
              |  SELECT 'pointer' AS artifact, 'all' AS "key",
              |         CAST(1 AS BIGINT) AS n_before,
              |         CASE WHEN promoted THEN CAST(2 AS BIGINT)
              |              ELSE CAST(1 AS BIGINT) END AS n_after,
              |         CAST(0 AS BIGINT) AS n_removed, TRUE AS clean
              |  FROM promo
              |  UNION ALL
              |  SELECT 'codes_v1', 'all', (SELECT n FROM n0), (SELECT n FROM n0k),
              |         (SELECT n FROM n0) - (SELECT n FROM n0k), TRUE
              |  UNION ALL
              |  SELECT 'codes_v2', 'all',
              |         CASE WHEN promoted THEN (SELECT n FROM nu) ELSE 0 END,
              |         CASE WHEN promoted THEN (SELECT n FROM nuk) ELSE 0 END,
              |         CASE WHEN promoted
              |              THEN (SELECT n FROM nu) - (SELECT n FROM nuk)
              |              ELSE 0 END, TRUE
              |  FROM promo
              |  UNION ALL
              |  SELECT 'serving', 'all',
              |         (SELECT CAST(COUNT(*) AS BIGINT) FROM l),
              |         CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE)
              |SELECT artifact, "key", n_before, n_after, n_removed, clean
              |FROM rows_ ORDER BY artifact""".stripMargin),
      dumps = Seq(pqDump, pqV2Dump))
  )


  /** The q102 int8 chain (quantize → exact-integer dot → score →
    * rank), factored so the q102 listing, the q267 recall report and
    * the q266 ladder all replay ONE text. */
  /** The int8/trunc rung chains parameterized over the corpus
    * expression (r16): `stdCorpusSql` is the raw embeddings table,
    * `wideCorpusSql` the deterministic 128-d doubling the q275/q285
    * wide fixtures share — so the q285 wide ladder aggregates the
    * SAME chain text its 64-d constituents certify, instantiated on
    * the wide corpus. */
  private val stdCorpusSql = "CAST(embedding AS DOUBLE[])"
  private val wideCorpusSql =
    "list_concat(CAST(embedding AS DOUBLE[]), " +
      "list_transform(CAST(embedding AS DOUBLE[]), x -> 0.5 - x))"

  private def quantChainCtes(corpus: String): String =
    s"""v0 AS (
      |  SELECT vec_id, $corpus AS e FROM embeddings),
      |v1 AS (
      |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS amax FROM v0),
      |v AS (
      |  SELECT vec_id,
      |         list_transform(e, x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT)) AS qv
      |  FROM v1 WHERE amax > 0),
      |nn AS (
      |  SELECT vec_id, qv, CAST(list_inner_product(qv, qv) AS BIGINT) AS qn
      |  FROM v),
      |q AS (SELECT vec_id AS qid, qv AS qq, qn AS qqn FROM nn WHERE vec_id < 5),
      |s AS (SELECT qid, vec_id,
      |             list_inner_product(qq, qv) / (sqrt(CAST(qqn AS DOUBLE)) * sqrt(CAST(qn AS DOUBLE))) AS score
      |      FROM nn CROSS JOIN q WHERE vec_id <> qid),
      |r AS (SELECT qid, vec_id, score,
      |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
      |      FROM s)""".stripMargin

  private val q102QuantChainCtes: String = quantChainCtes(stdCorpusSql)

  private def q267OracleSql: String = q267OracleSqlOver(stdCorpusSql)

  private def q267OracleSqlOver(corpus: String): String =
    s"""WITH ${quantChainCtes(corpus)},
       |qt AS (SELECT qid, vec_id FROM r WHERE rn <= 10),
       |ve AS (SELECT vec_id, $corpus AS e FROM embeddings),
       |qe AS (SELECT vec_id AS qid, e AS fqe FROM ve WHERE vec_id < 5),
       |ex AS (
       |  SELECT qid, ve.vec_id,
       |         list_inner_product(fqe, e) /
       |           (sqrt(list_inner_product(fqe, fqe)) * sqrt(list_inner_product(e, e))) AS score
       |  FROM ve CROSS JOIN qe WHERE ve.vec_id <> qid),
       |ext AS (SELECT qid, vec_id FROM (
       |          SELECT qid, vec_id,
       |                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |          FROM ex) WHERE rn <= 10)
       |SELECT ext.qid,
       |       CAST(SUM(CASE WHEN qt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(COUNT(*) AS BIGINT) AS k
       |FROM ext LEFT JOIN qt ON ext.qid = qt.qid AND ext.vec_id = qt.vec_id
       |GROUP BY ext.qid ORDER BY ext.qid""".stripMargin

  /** The ANN-rung recall oracles, factored so the q266 ladder
    * aggregates the EXACT SQL its constituent queries certify —
    * shared text keeps the capstone from drifting against the rungs
    * (the q45/q69 and q220/q257 pattern). */
  private def q249OracleSql: String = q249OracleSqlOver(stdCorpusSql)

  private def q249OracleSqlOver(corpus: String): String =
    s"""WITH v AS (SELECT vec_id, $corpus AS e FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
       |dims(d) AS (VALUES (16), (32)),
       |ex0 AS (
       |  SELECT qid, v.vec_id,
       |         list_inner_product(qe, e) /
       |         (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))) AS score
       |  FROM v CROSS JOIN q WHERE v.vec_id <> qid),
       |ext AS (SELECT qid, vec_id FROM (
       |          SELECT qid, vec_id,
       |                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
       |          FROM ex0) WHERE rn <= 10),
       |tr0 AS (
       |  SELECT d, qid, v.vec_id,
       |         list_inner_product(list_slice(qe, 1, d), list_slice(e, 1, d)) /
       |         (sqrt(list_inner_product(list_slice(qe, 1, d), list_slice(qe, 1, d))) *
       |          sqrt(list_inner_product(list_slice(e, 1, d), list_slice(e, 1, d)))) AS score
       |  FROM v CROSS JOIN q CROSS JOIN dims WHERE v.vec_id <> qid),
       |trt AS (SELECT d, qid, vec_id FROM (
       |          SELECT d, qid, vec_id,
       |                 row_number() OVER (PARTITION BY d, qid ORDER BY score DESC, vec_id) AS rn
       |          FROM tr0) WHERE rn <= 10)
       |SELECT CAST(dims.d AS BIGINT) AS dim, ext.qid AS qid,
       |       CAST(SUM(CASE WHEN trt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(COUNT(*) AS BIGINT) AS k
       |FROM ext CROSS JOIN dims
       |LEFT JOIN trt ON trt.d = dims.d AND trt.qid = ext.qid AND trt.vec_id = ext.vec_id
       |GROUP BY dims.d, ext.qid
       |ORDER BY dim, ext.qid""".stripMargin

  private def q242OracleSql: String =
    """WITH cb AS (
       |  SELECT CAST(subspace AS BIGINT) AS subspace,
       |         CAST(code AS BIGINT) AS code,
       |         CAST(centroid AS DOUBLE[]) AS c
       |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |d AS (
       |  SELECT vec_id, subspace, code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
       |  FROM v CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, subspace, code
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
       |                                     ORDER BY d2, code) AS rk FROM d)
       |  WHERE rk = 1),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
       |lut AS (
       |  SELECT qid, subspace, code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
       |  FROM q CROSS JOIN cb),
       |adc0 AS (
       |  SELECT qid, vec_id,
       |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
       |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
       |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
       |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
       |  FROM codes s JOIN lut USING (subspace, code)
       |  WHERE vec_id <> qid GROUP BY qid, vec_id),
       |adct AS (
       |  SELECT qid, vec_id
       |  FROM (SELECT qid, vec_id,
       |               row_number() OVER (PARTITION BY qid
       |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
       |        FROM adc0) WHERE rn <= 10),
       |ex AS (
       |  SELECT qid, vec_id,
       |         list_sum(list_transform(list_zip(e, qe),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
       |  FROM v CROSS JOIN q WHERE vec_id <> qid),
       |ext AS (
       |  SELECT qid, vec_id
       |  FROM (SELECT qid, vec_id,
       |               row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
       |        FROM ex) WHERE rn <= 10)
       |SELECT ext.qid,
       |       CAST(SUM(CASE WHEN adct.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(COUNT(*) AS BIGINT) AS k
       |FROM ext LEFT JOIN adct ON ext.qid = adct.qid AND ext.vec_id = adct.vec_id
       |GROUP BY ext.qid ORDER BY ext.qid""".stripMargin

  /** q279 oracle: both ADC listings replayed from the two dumped
    * codebooks over the stored∪batch corpus — factored so the q289
    * promotion gate replays the SAME text. */
  private def q279OracleSql: String =
    """WITH cb1 AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
             |cb2 AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_pqv2_oracle/centers/*.parquet')),
             |v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |bt AS (
             |  SELECT vec_id + 1000000 AS vec_id,
             |         list_concat(
             |           list_transform(
             |             list_slice(CAST(embedding AS DOUBLE[]), 1, 16),
             |             x -> x * 3.0),
             |           list_slice(CAST(embedding AS DOUBLE[]), 17, 64)) AS e
             |  FROM embeddings WHERE vec_id % 7 = 3),
             |v AS (SELECT vec_id, e FROM v0 UNION ALL SELECT vec_id, e FROM bt),
             |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
             |d1 AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN cb1),
             |codes1 AS (
             |  SELECT vec_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d1)
             |  WHERE rk = 1),
             |d2c AS (
             |  SELECT vec_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN cb2),
             |codes2 AS (
             |  SELECT vec_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d2c)
             |  WHERE rk = 1),
             |lut1 AS (
             |  SELECT qid, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
             |  FROM q CROSS JOIN cb1),
             |lut2 AS (
             |  SELECT qid, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
             |  FROM q CROSS JOIN cb2),
             |a1 AS (
             |  SELECT qid, vec_id,
             |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
             |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
             |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
             |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
             |  FROM codes1 s JOIN lut1 USING (subspace, code)
             |  WHERE vec_id <> qid GROUP BY qid, vec_id),
             |a2 AS (
             |  SELECT qid, vec_id,
             |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
             |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
             |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
             |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
             |  FROM codes2 s JOIN lut2 USING (subspace, code)
             |  WHERE vec_id <> qid GROUP BY qid, vec_id),
             |l1 AS (SELECT qid, vec_id, rn FROM (
             |         SELECT qid, vec_id,
             |                row_number() OVER (PARTITION BY qid
             |                  ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |         FROM a1) WHERE rn <= 10),
             |l2 AS (SELECT qid, vec_id, rn FROM (
             |         SELECT qid, vec_id,
             |                row_number() OVER (PARTITION BY qid
             |                  ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |         FROM a2) WHERE rn <= 10),
             |ov AS (
             |  SELECT l1.qid, CAST(COUNT(*) AS BIGINT) AS n_overlap,
             |         CAST(SUM(ABS(l1.rn - l2.rn)) AS BIGINT) AS rank_l1
             |  FROM l1 JOIN l2 ON l1.qid = l2.qid AND l1.vec_id = l2.vec_id
             |  GROUP BY l1.qid),
             |kk AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS k FROM l1 GROUP BY qid)
             |SELECT kk.qid, k, COALESCE(n_overlap, 0) AS n_overlap,
             |       CAST(k - COALESCE(n_overlap, 0) AS BIGINT) AS n_churned,
             |       COALESCE(rank_l1, 0) AS rank_l1
             |FROM kk LEFT JOIN ov USING (qid) ORDER BY kk.qid""".stripMargin

  private def q255OracleSql: String =
    """WITH a AS (
             |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
             |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |ic AS (
             |  SELECT CAST(c_list_id AS BIGINT) AS list_id,
             |         CAST(centroid AS DOUBLE[]) AS icent
             |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
             |cb AS (
             |  SELECT CAST(subspace AS BIGINT) AS subspace,
             |         CAST(code AS BIGINT) AS code,
             |         CAST(centroid AS DOUBLE[]) AS c
             |  FROM read_parquet('/tmp/graft_ivfpq_oracle/centers/*.parquet')),
             |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
             |r AS (
             |  SELECT v.vec_id, a.list_id,
             |         list_transform(list_zip(e, icent), p -> p[1] - p[2]) AS res
             |  FROM v JOIN a USING (vec_id) JOIN ic USING (list_id)),
             |d AS (
             |  SELECT vec_id, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM r CROSS JOIN cb),
             |codes AS (
             |  SELECT vec_id, list_id, subspace, code
             |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
             |                                     ORDER BY d2, code) AS rk FROM d)
             |  WHERE rk = 1),
             |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
             |co0 AS (
             |  SELECT qid, list_id, icent, qe,
             |         list_sum(list_transform(list_zip(qe, icent),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS cd2
             |  FROM q CROSS JOIN ic),
             |coarse AS (
             |  SELECT qid, list_id,
             |         list_transform(list_zip(qe, icent), p -> p[1] - p[2]) AS qres
             |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
             |                                     ORDER BY cd2, list_id) AS rk FROM co0)
             |  WHERE rk <= 4),
             |lut AS (
             |  SELECT qid, list_id, subspace, code,
             |         list_sum(list_transform(
             |           list_zip(list_slice(qres, subspace * 16 + 1, subspace * 16 + 16), c),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
             |  FROM coarse CROSS JOIN cb),
             |adc0 AS (
             |  SELECT qid, vec_id,
             |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
             |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
             |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
             |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
             |  FROM codes s JOIN lut USING (list_id, subspace, code)
             |  WHERE vec_id <> qid GROUP BY qid, vec_id),
             |cand AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_candidates
             |         FROM adc0 GROUP BY qid),
             |adct AS (
             |  SELECT qid, vec_id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid
             |                 ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
             |        FROM adc0) WHERE rn <= 10),
             |ex AS (
             |  SELECT qid, vec_id,
             |         list_sum(list_transform(list_zip(e, qe),
             |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
             |  FROM v CROSS JOIN q WHERE vec_id <> qid),
             |ext AS (
             |  SELECT qid, vec_id
             |  FROM (SELECT qid, vec_id,
             |               row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
             |        FROM ex) WHERE rn <= 10)
             |SELECT ext.qid, COALESCE(cand.n_candidates, 0) AS n_candidates,
             |       CAST(SUM(CASE WHEN adct.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
             |       CAST(COUNT(*) AS BIGINT) AS k
             |FROM ext
             |LEFT JOIN adct ON ext.qid = adct.qid AND ext.vec_id = adct.vec_id
             |LEFT JOIN cand ON ext.qid = cand.qid
             |GROUP BY ext.qid, cand.n_candidates ORDER BY ext.qid""".stripMargin

  /** 128-d fixture for the multi-word signature path (q275): the 64-d
    * corpus concatenated with (0.5 − x) per component — exact IEEE
    * double arithmetic both engines replicate bit-identically, giving
    * the second signature word a non-trivial sign pattern. */
  private def wideEmbeddings(s: org.apache.spark.sql.SparkSession,
                             dir: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      expr("concat(transform(embedding, x -> CAST(x AS DOUBLE)), " +
           "transform(embedding, x -> 0.5D - CAST(x AS DOUBLE)))").as("embedding"))

  /** The q264 chain generalized to two signature words over the 128-d
    * fixture: per-word sign-bit folds, per-word signed casts, Hamming
    * as the summed per-word popcount; candidate cap, re-rank, exact
    * baseline and the report shape are q264's verbatim. */
  private def q275OracleSql: String = {
    def signed(c: String) = toSignedSql.replace("uh", c)
    s"""WITH v AS (
       |  SELECT vec_id,
       |         list_concat(CAST(embedding AS DOUBLE[]),
       |                     list_transform(CAST(embedding AS DOUBLE[]), x -> 0.5 - x)) AS e
       |  FROM embeddings),
       |sg0 AS (
       |  SELECT vec_id, e,
       |         list_sum(list_transform(list_zip(e[1:64], range(0, 64)),
       |           p -> CASE WHEN p[1] > 0 THEN CAST(2.0 ** p[2] AS HUGEINT)
       |                ELSE CAST(0 AS HUGEINT) END)) AS uh0,
       |         list_sum(list_transform(list_zip(e[65:128], range(0, 64)),
       |           p -> CASE WHEN p[1] > 0 THEN CAST(2.0 ** p[2] AS HUGEINT)
       |                ELSE CAST(0 AS HUGEINT) END)) AS uh1
       |  FROM v),
       |sg AS (SELECT vec_id, e, ${signed("uh0")} AS s0, ${signed("uh1")} AS s1 FROM sg0),
       |q AS (SELECT vec_id AS qid, e AS qe, s0 AS q0, s1 AS q1 FROM sg WHERE vec_id < 5),
       |h AS (
       |  SELECT qid, sg.vec_id, e, qe,
       |         bit_count(xor(s0, q0)) + bit_count(xor(s1, q1)) AS hd
       |  FROM sg CROSS JOIN q WHERE sg.vec_id <> qid),
       |cand AS (
       |  SELECT qid, vec_id, e, qe
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
       |                                     ORDER BY hd, vec_id) AS cr FROM h)
       |  WHERE cr <= 50),
       |nc AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_candidates
       |       FROM cand GROUP BY qid),
       |sb AS (
       |  SELECT qid, vec_id,
       |         list_inner_product(qe, e) /
       |           (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))) AS score
       |  FROM cand),
       |bt AS (SELECT qid, vec_id FROM (
       |         SELECT qid, vec_id,
       |                row_number() OVER (PARTITION BY qid
       |                  ORDER BY score DESC, vec_id) AS rn FROM sb)
       |       WHERE rn <= 10),
       |ex AS (
       |  SELECT qid, v.vec_id,
       |         list_inner_product(qe, e) /
       |           (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))) AS score
       |  FROM v CROSS JOIN q WHERE v.vec_id <> qid),
       |ext AS (SELECT qid, vec_id FROM (
       |          SELECT qid, vec_id,
       |                 row_number() OVER (PARTITION BY qid
       |                   ORDER BY score DESC, vec_id) AS rn FROM ex)
       |        WHERE rn <= 10)
       |SELECT ext.qid, COALESCE(nc.n_candidates, 0) AS n_candidates,
       |       CAST(SUM(CASE WHEN bt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(COUNT(*) AS BIGINT) AS k
       |FROM ext
       |LEFT JOIN bt ON ext.qid = bt.qid AND ext.vec_id = bt.vec_id
       |LEFT JOIN nc ON ext.qid = nc.qid
       |GROUP BY ext.qid, nc.n_candidates ORDER BY ext.qid""".stripMargin
  }

  /** q269's full replay (factored in r15 so q274 can aggregate it):
    * centroid ranking, per-rung pruning, in-list cosine, shared exact
    * baseline from the dumped index state. */
  private def q269OracleSql: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |assign AS (
      |  SELECT vec_id, list_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
      |centers AS (
      |  SELECT c_list_id, CAST(centroid AS DOUBLE[]) AS c FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
      |q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnorm FROM v WHERE vec_id < 5),
      |qd AS (
      |  SELECT qid, qe, qnorm, c_list_id,
      |         list_sum(list_transform(list_zip(qe, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      |  FROM q CROSS JOIN centers),
      |ranked AS (
      |  SELECT qid, qe, qnorm, c_list_id AS list_id,
      |         row_number() OVER (PARTITION BY qid ORDER BY d2, c_list_id) AS pr
      |  FROM qd),
      |cand AS (
      |  SELECT r.qid, v.vec_id,
      |         list_inner_product(r.qe, v.e) / (r.qnorm * v.nrm) AS score, r.pr
      |  FROM ranked r JOIN assign a ON r.list_id = a.list_id JOIN v ON v.vec_id = a.vec_id
      |  WHERE v.vec_id <> r.qid),
      |ex AS (
      |  SELECT qid, vec_id
      |  FROM (SELECT q.qid, v.vec_id,
      |               row_number() OVER (PARTITION BY q.qid
      |                 ORDER BY list_inner_product(q.qe, v.e) / (q.qnorm * v.nrm) DESC, v.vec_id) AS rn
      |        FROM q CROSS JOIN v WHERE v.vec_id <> q.qid) WHERE rn <= 10),
      |rungs AS (SELECT n_probe FROM (VALUES (1), (2), (4), (8), (16)) AS t(n_probe)),
      |rt AS (
      |  SELECT rungs.n_probe, cand.qid, cand.vec_id, cand.score
      |  FROM rungs JOIN cand ON cand.pr <= rungs.n_probe),
      |nc AS (SELECT n_probe, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM rt GROUP BY 1),
      |top AS (
      |  SELECT n_probe, qid, vec_id
      |  FROM (SELECT n_probe, qid, vec_id,
      |               row_number() OVER (PARTITION BY n_probe, qid ORDER BY score DESC, vec_id) AS rn
      |        FROM rt) WHERE rn <= 10),
      |h AS (
      |  SELECT rungs.n_probe,
      |         CAST(SUM(CASE WHEN top.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sum_hits,
      |         CAST(COUNT(*) AS BIGINT) AS sum_k
      |  FROM rungs CROSS JOIN ex
      |  LEFT JOIN top ON top.n_probe = rungs.n_probe AND top.qid = ex.qid AND top.vec_id = ex.vec_id
      |  GROUP BY rungs.n_probe)
      |SELECT CAST(h.n_probe AS BIGINT) AS n_probe, nc.n_candidates,
      |       sum_hits, sum_k,
      |       CAST(sum_hits * 1000000 // sum_k AS BIGINT) AS recall_ppm
      |FROM h JOIN nc USING (n_probe)
      |ORDER BY n_probe""".stripMargin

  /** q272's full replay (factored in r15 so q274 can aggregate it):
    * the q255 compressed chain — stored residual codes + ADC — with
    * the coarse stage parameterized by the rung table. */
  private def q272OracleSql: String =
    """WITH a AS (
      |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
      |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
      |ic AS (
      |  SELECT CAST(c_list_id AS BIGINT) AS list_id,
      |         CAST(centroid AS DOUBLE[]) AS icent
      |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
      |cb AS (
      |  SELECT CAST(subspace AS BIGINT) AS subspace,
      |         CAST(code AS BIGINT) AS code,
      |         CAST(centroid AS DOUBLE[]) AS c
      |  FROM read_parquet('/tmp/graft_ivfpq_oracle/centers/*.parquet')),
      |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |r AS (
      |  SELECT v.vec_id, a.list_id,
      |         list_transform(list_zip(e, icent), p -> p[1] - p[2]) AS res
      |  FROM v JOIN a USING (vec_id) JOIN ic USING (list_id)),
      |d AS (
      |  SELECT vec_id, list_id, subspace, code,
      |         list_sum(list_transform(
      |           list_zip(list_slice(res, subspace * 16 + 1, subspace * 16 + 16), c),
      |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      |  FROM r CROSS JOIN cb),
      |codes AS (
      |  SELECT vec_id, list_id, subspace, code
      |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
      |                                     ORDER BY d2, code) AS rk FROM d)
      |  WHERE rk = 1),
      |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
      |co0 AS (
      |  SELECT qid, list_id, icent, qe,
      |         list_sum(list_transform(list_zip(qe, icent),
      |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS cd2
      |  FROM q CROSS JOIN ic),
      |coarse AS (
      |  SELECT qid, list_id, CAST(rk AS BIGINT) AS pr,
      |         list_transform(list_zip(qe, icent), p -> p[1] - p[2]) AS qres
      |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
      |                                     ORDER BY cd2, list_id) AS rk FROM co0)
      |  WHERE rk <= 16),
      |lut AS (
      |  SELECT qid, list_id, pr, subspace, code,
      |         list_sum(list_transform(
      |           list_zip(list_slice(qres, subspace * 16 + 1, subspace * 16 + 16), c),
      |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
      |  FROM coarse CROSS JOIN cb),
      |adc0 AS (
      |  SELECT qid, vec_id, pr,
      |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
      |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
      |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
      |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
      |  FROM codes s JOIN lut USING (list_id, subspace, code)
      |  WHERE vec_id <> qid GROUP BY qid, vec_id, pr),
      |rungs AS (SELECT n_probe FROM (VALUES (1), (2), (4), (8), (16)) AS t(n_probe)),
      |rt AS (
      |  SELECT rungs.n_probe, adc0.qid, adc0.vec_id,
      |         e0 + e1 + e2 + e3 AS adc_d2
      |  FROM rungs JOIN adc0 ON adc0.pr <= rungs.n_probe),
      |nc AS (SELECT n_probe, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM rt GROUP BY 1),
      |top AS (
      |  SELECT n_probe, qid, vec_id
      |  FROM (SELECT n_probe, qid, vec_id,
      |               row_number() OVER (PARTITION BY n_probe, qid ORDER BY adc_d2, vec_id) AS rn
      |        FROM rt) WHERE rn <= 10),
      |ex AS (
      |  SELECT qid, vec_id,
      |         list_sum(list_transform(list_zip(e, qe),
      |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
      |  FROM v CROSS JOIN q WHERE vec_id <> qid),
      |ext AS (
      |  SELECT qid, vec_id
      |  FROM (SELECT qid, vec_id,
      |               row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
      |        FROM ex) WHERE rn <= 10),
      |h AS (
      |  SELECT rungs.n_probe,
      |         CAST(SUM(CASE WHEN top.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sum_hits,
      |         CAST(COUNT(*) AS BIGINT) AS sum_k
      |  FROM rungs CROSS JOIN ext
      |  LEFT JOIN top ON top.n_probe = rungs.n_probe AND top.qid = ext.qid AND top.vec_id = ext.vec_id
      |  GROUP BY rungs.n_probe)
      |SELECT CAST(h.n_probe AS BIGINT) AS n_probe, nc.n_candidates,
      |       sum_hits, sum_k,
      |       CAST(sum_hits * 1000000 // sum_k AS BIGINT) AS recall_ppm
      |FROM h JOIN nc USING (n_probe)
      |ORDER BY n_probe""".stripMargin

  private def q264OracleSql: String =
    s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              |sg0 AS (
              |  SELECT vec_id, e,
              |         list_sum(list_transform(list_zip(e, range(0, 64)),
              |           p -> CASE WHEN p[1] > 0 THEN CAST(2.0 ** p[2] AS HUGEINT)
              |                ELSE CAST(0 AS HUGEINT) END)) AS uh
              |  FROM v),
              |sg AS (SELECT vec_id, e, $toSignedSql AS sig FROM sg0),
              |q AS (SELECT vec_id AS qid, e AS qe, sig AS qsig FROM sg WHERE vec_id < 5),
              |h AS (
              |  SELECT qid, sg.vec_id, e, qe,
              |         bit_count(xor(sig, qsig)) AS hd
              |  FROM sg CROSS JOIN q WHERE sg.vec_id <> qid),
              |cand AS (
              |  SELECT qid, vec_id, e, qe
              |  FROM (SELECT *, row_number() OVER (PARTITION BY qid
              |                                     ORDER BY hd, vec_id) AS cr FROM h)
              |  WHERE cr <= 50),
              |nc AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_candidates
              |       FROM cand GROUP BY qid),
              |sb AS (
              |  SELECT qid, vec_id,
              |         list_inner_product(qe, e) /
              |           (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))) AS score
              |  FROM cand),
              |bt AS (SELECT qid, vec_id FROM (
              |         SELECT qid, vec_id,
              |                row_number() OVER (PARTITION BY qid
              |                  ORDER BY score DESC, vec_id) AS rn FROM sb)
              |       WHERE rn <= 10),
              |ex AS (
              |  SELECT qid, v.vec_id,
              |         list_inner_product(qe, e) /
              |           (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e))) AS score
              |  FROM v CROSS JOIN q WHERE v.vec_id <> qid),
              |ext AS (SELECT qid, vec_id FROM (
              |          SELECT qid, vec_id,
              |                 row_number() OVER (PARTITION BY qid
              |                   ORDER BY score DESC, vec_id) AS rn FROM ex)
              |        WHERE rn <= 10)
              |SELECT ext.qid, COALESCE(nc.n_candidates, 0) AS n_candidates,
              |       CAST(SUM(CASE WHEN bt.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
              |       CAST(COUNT(*) AS BIGINT) AS k
              |FROM ext
              |LEFT JOIN bt ON ext.qid = bt.qid AND ext.vec_id = bt.vec_id
              |LEFT JOIN nc ON ext.qid = nc.qid
              |GROUP BY ext.qid, nc.n_candidates ORDER BY ext.qid""".stripMargin

  /** q277 oracle building block: the five serving-surface top-k
    * listings as named CTEs with suffix `sfx`, each optionally
    * corpus-filtered by the removal predicate (`purged` = the
    * post-takedown store). Shares the suffix-free CTEs (rm/q/toks/
    * dl0/nv/qv/assign/centers/cb/codes/lut/sgn/qb) emitted once by
    * [[q277OracleSql]]. */
  private def q277Chains(sfx: String, purged: Boolean): String = {
    def f(c: String) = if (purged) s" AND $c % 17 <> 6" else ""
    s"""tf$sfx AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |        WHERE w IN (SELECT w FROM q)${f("doc_id")} GROUP BY doc_id, w),
       |dfw$sfx AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf$sfx GROUP BY w),
       |dl$sfx AS (SELECT doc_id, dl FROM dl0 WHERE TRUE${f("doc_id")}),
       |c$sfx AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl$sfx),
       |s$sfx AS (SELECT q.qid, t.doc_id,
       |            CAST(floor((((nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
       |                  (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(sumdl AS DOUBLE) / nn))))
       |                 * 1000000000.0) AS BIGINT) AS score_t_ppb
       |     FROM tf$sfx t JOIN q USING (w) JOIN dfw$sfx USING (w)
       |     JOIN dl$sfx USING (doc_id) CROSS JOIN c$sfx),
       |bm$sfx AS (SELECT qid, id FROM (
       |     SELECT qid, doc_id AS id,
       |            row_number() OVER (PARTITION BY qid
       |              ORDER BY SUM(score_t_ppb) DESC, doc_id) AS rk
       |     FROM s$sfx GROUP BY qid, doc_id) WHERE rk <= 10),
       |xc$sfx AS (SELECT qid, id FROM (
       |     SELECT qid, vec_id AS id,
       |            row_number() OVER (PARTITION BY qid
       |              ORDER BY list_inner_product(qe, e) / (qn * nrm) DESC, vec_id) AS rn
       |     FROM nv CROSS JOIN qv WHERE vec_id <> qid${f("vec_id")}) WHERE rn <= 10),
       |iv$sfx AS (SELECT qid, id FROM (
       |     SELECT p.qid, a.vec_id AS id,
       |            row_number() OVER (PARTITION BY p.qid
       |              ORDER BY list_inner_product(q2.qe, nv.e) / (q2.qn * nv.nrm) DESC,
       |                       a.vec_id) AS rn
       |     FROM probes p JOIN assign a USING (list_id)
       |     JOIN nv ON nv.vec_id = a.vec_id JOIN qv q2 ON q2.qid = p.qid
       |     WHERE a.vec_id <> p.qid${f("a.vec_id")}) WHERE rn <= 10),
       |adc$sfx AS (
       |  SELECT qid, vec_id,
       |         MAX(CASE WHEN s.subspace = 0 THEN qd2 END) AS e0,
       |         MAX(CASE WHEN s.subspace = 1 THEN qd2 END) AS e1,
       |         MAX(CASE WHEN s.subspace = 2 THEN qd2 END) AS e2,
       |         MAX(CASE WHEN s.subspace = 3 THEN qd2 END) AS e3
       |  FROM codes s JOIN lut USING (subspace, code)
       |  WHERE vec_id <> qid${f("vec_id")} GROUP BY qid, vec_id),
       |pq$sfx AS (SELECT qid, id FROM (
       |     SELECT qid, vec_id AS id,
       |            row_number() OVER (PARTITION BY qid
       |              ORDER BY e0 + e1 + e2 + e3, vec_id) AS rn
       |     FROM adc$sfx) WHERE rn <= 10),
       |h$sfx AS (SELECT qid, s.vec_id, bit_count(xor(sig, qsig)) AS hd
       |     FROM sgn s CROSS JOIN qb WHERE s.vec_id <> qid${f("s.vec_id")}),
       |cnd$sfx AS (SELECT qid, vec_id FROM (
       |     SELECT *, row_number() OVER (PARTITION BY qid ORDER BY hd, vec_id) AS cr
       |     FROM h$sfx) WHERE cr <= 50),
       |bi$sfx AS (SELECT qid, id FROM (
       |     SELECT c.qid, c.vec_id AS id,
       |            row_number() OVER (PARTITION BY c.qid
       |              ORDER BY list_inner_product(qb.qe, nv.e) / (qb.qn * nv.nrm) DESC,
       |                       c.vec_id) AS rn
       |     FROM cnd$sfx c JOIN nv ON nv.vec_id = c.vec_id
       |     JOIN qb ON qb.qid = c.qid) WHERE rn <= 10)""".stripMargin
  }

  /** q277 oracle building block: one certification row from a
    * (pre, post) listing pair. */
  private def q277CertRow(surface: String, pre: String, post: String): String =
    s"""SELECT '$surface' AS surface,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $pre) AS n_slots_pre,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $post) AS n_slots_post,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $pre
       |   WHERE id IN (SELECT doc_id FROM rm)) AS n_removed_pre,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $post
       |   WHERE id IN (SELECT doc_id FROM rm)) AS n_leaked_post,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $post p2
       |   WHERE NOT EXISTS (SELECT 1 FROM $pre p1
       |                     WHERE p1.qid = p2.qid AND p1.id = p2.id)) AS n_backfilled""".stripMargin

  private def q277OracleSql: String =
    s"""WITH rm AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 17 = 6),
       |q(qid, w) AS (
       |  VALUES (0, 'hash'), (0, 'join'), (1, 'table'), (1, 'scan'),
       |         (2, 'stream'), (2, 'filter')),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |  FROM documents),
       |dl0 AS (SELECT doc_id,
       |               CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
       |        FROM documents),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |nv AS (SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS nrm FROM v),
       |qv AS (SELECT vec_id AS qid, e AS qe, nrm AS qn FROM nv WHERE vec_id < 5),
       |assign AS (
       |  SELECT vec_id, CAST(list_id AS BIGINT) AS list_id
       |  FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
       |centers AS (
       |  SELECT CAST(c_list_id AS BIGINT) AS c_list_id, CAST(centroid AS DOUBLE[]) AS c
       |  FROM read_parquet('/tmp/graft_ivf_oracle/centers/*.parquet')),
       |qd AS (
       |  SELECT qid, c_list_id,
       |         list_sum(list_transform(list_zip(qe, c), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
       |  FROM qv CROSS JOIN centers),
       |probes AS (
       |  SELECT qid, list_id FROM (
       |    SELECT qid, c_list_id AS list_id,
       |           row_number() OVER (PARTITION BY qid ORDER BY d2, c_list_id) AS pr
       |    FROM qd) WHERE pr <= 4),
       |cb AS (
       |  SELECT CAST(subspace AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
       |         CAST(centroid AS DOUBLE[]) AS c
       |  FROM read_parquet('/tmp/graft_pq_oracle/centers/*.parquet')),
       |d AS (
       |  SELECT vec_id, subspace, code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(e, subspace * 16 + 1, subspace * 16 + 16), c),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
       |  FROM v CROSS JOIN cb),
       |codes AS (
       |  SELECT vec_id, subspace, code
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
       |                                     ORDER BY d2, code) AS rk FROM d)
       |  WHERE rk = 1),
       |lut AS (
       |  SELECT qid, subspace, code,
       |         list_sum(list_transform(
       |           list_zip(list_slice(qe, subspace * 16 + 1, subspace * 16 + 16), c),
       |           p -> (p[1] - p[2]) * (p[1] - p[2]))) AS qd2
       |  FROM qv CROSS JOIN cb),
       |sg0 AS (
       |  SELECT vec_id, e,
       |         list_sum(list_transform(list_zip(e, range(0, 64)),
       |           p -> CASE WHEN p[1] > 0 THEN CAST(2.0 ** p[2] AS HUGEINT)
       |                ELSE CAST(0 AS HUGEINT) END)) AS uh
       |  FROM v),
       |sgn AS (SELECT sg0.vec_id, $toSignedSql AS sig, nrm
       |        FROM sg0 JOIN nv ON nv.vec_id = sg0.vec_id),
       |qb AS (SELECT sgn.vec_id AS qid, qe, qn, sig AS qsig
       |       FROM sgn JOIN qv ON qv.qid = sgn.vec_id),
       |${q277Chains("a", purged = false)},
       |${q277Chains("p", purged = true)},
       |certrows AS (
       |  ${q277CertRow("bm25", "bma", "bmp")}
       |  UNION ALL
       |  ${q277CertRow("exact_cosine", "xca", "xcp")}
       |  UNION ALL
       |  ${q277CertRow("ivf_exact", "iva", "ivp")}
       |  UNION ALL
       |  ${q277CertRow("pq_adc", "pqa", "pqp")}
       |  UNION ALL
       |  ${q277CertRow("binary_hamming", "bia", "bip")})
       |SELECT surface, n_slots_pre, n_slots_post, n_removed_pre,
       |       n_leaked_post, n_backfilled,
       |       (n_leaked_post = 0 AND n_slots_post = n_slots_pre) AS clean
       |FROM certrows ORDER BY surface""".stripMargin

  // ---------------------------------------------------------------- //
  // north-star: multimodal binary columns
  // ---------------------------------------------------------------- //
  private def multimodalQueries: Seq[QuerySpec] = Seq(
    // media payloads → batched feature extraction → similarity search,
    // through SimilarityOps' (vec_id, embedding) contract — the
    // image-dedup composition (deterministic stub ⇒ oracle since r7)
    QuerySpec(
      "q95_media_ann",
      (s, dir) => MultimodalOps.mediaAnnTopK(Tables.documents(s, dir)),
      Some(q95OracleSql)),

    // CROSS-MODAL alignment gate (q261): the CLIP-score filter shape —
    // caption embedding (decode stub over the 64-char caption
    // stand-in) vs media embedding (the q95 contract), per-pair
    // cosine, threshold gate, per-source conservation accounting
    // (q116/q258 pattern: Σ n_docs = corpus count). Deterministic
    // stub ⇒ the oracle replays BOTH FNV folds, both feature vectors,
    // the cosine and the gate end-to-end (q49/q95 machinery); real
    // towers swap into the two encode passes and nothing downstream
    // changes.
    QuerySpec(
      "q261_crossmodal_gate",
      (s, dir) => MultimodalOps.crossModalAlignmentGate(Tables.documents(s, dir)),
      Some(s"""WITH bm AS (
              |  SELECT doc_id AS media_id, source, hex(encode(text)) AS hx,
              |         octet_length(encode(text)) AS n
              |  FROM documents),
              |bc AS (
              |  SELECT doc_id AS media_id, hex(encode(substr(text, 1, 64))) AS hx,
              |         octet_length(encode(substr(text, 1, 64))) AS n
              |  FROM documents),
              |bym AS (SELECT media_id, source, $hexBytesSql AS bytes FROM bm),
              |byc AS (SELECT media_id, $hexBytesSql AS bytes FROM bc),
              |hm AS (
              |  SELECT media_id, source,
              |    list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), bytes),
              |      (acc, x) -> ((acc - (acc % 256) + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
              |                   * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS uh
              |  FROM bym),
              |hc AS (
              |  SELECT media_id,
              |    list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), bytes),
              |      (acc, x) -> ((acc - (acc % 256) + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
              |                   * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS uh
              |  FROM byc),
              |fm AS (
              |  SELECT media_id, source,
              |    [CAST((uh // 1) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 65536) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 4294967296) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 281474976710656) % 65536 AS DOUBLE) / 65535.0] AS f
              |  FROM hm),
              |fc AS (
              |  SELECT media_id,
              |    [CAST((uh // 1) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 65536) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 4294967296) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 281474976710656) % 65536 AS DOUBLE) / 65535.0] AS f
              |  FROM hc),
              |g AS (
              |  SELECT fm.media_id, source,
              |         list_inner_product(fm.f, fc.f) >
              |           CAST(0.9 AS DOUBLE) * sqrt(list_inner_product(fm.f, fm.f))
              |                               * sqrt(list_inner_product(fc.f, fc.f)) AS aligned
              |  FROM fm JOIN fc USING (media_id))
              |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |       CAST(SUM(CASE WHEN aligned THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned,
              |       CAST(SUM(CASE WHEN aligned THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
              |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    // CROSS-MODAL retrieval eval (q263): each query doc's caption
    // embedding searches the media embedding space; the rank of its
    // OWN media among all candidates is the per-query retrieval
    // fidelity (recall@k = pair_rank <= k). The q95-proven cosine
    // forms make ranks engine-identical; pure-integer output.
    QuerySpec(
      "q263_crossmodal_retrieval",
      (s, dir) => MultimodalOps.crossModalRetrieval(Tables.documents(s, dir)),
      Some(s"""WITH bm AS (
              |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
              |         octet_length(encode(text)) AS n
              |  FROM documents),
              |bc AS (
              |  SELECT doc_id AS media_id, hex(encode(substr(text, 1, 64))) AS hx,
              |         octet_length(encode(substr(text, 1, 64))) AS n
              |  FROM documents WHERE doc_id < 5),
              |bym AS (SELECT media_id, $hexBytesSql AS bytes FROM bm),
              |byc AS (SELECT media_id, $hexBytesSql AS bytes FROM bc),
              |hm AS (
              |  SELECT media_id,
              |    list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), bytes),
              |      (acc, x) -> ((acc - (acc % 256) + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
              |                   * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS uh
              |  FROM bym),
              |hc AS (
              |  SELECT media_id,
              |    list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), bytes),
              |      (acc, x) -> ((acc - (acc % 256) + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
              |                   * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS uh
              |  FROM byc),
              |fm AS (
              |  SELECT media_id,
              |    [CAST((uh // 1) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 65536) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 4294967296) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 281474976710656) % 65536 AS DOUBLE) / 65535.0] AS mf
              |  FROM hm),
              |fc AS (
              |  SELECT media_id AS qid,
              |    [CAST((uh // 1) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 65536) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 4294967296) % 65536 AS DOUBLE) / 65535.0,
              |     CAST((uh // 281474976710656) % 65536 AS DOUBLE) / 65535.0] AS cf
              |  FROM hc),
              |s AS (
              |  SELECT qid, media_id,
              |         list_inner_product(cf, mf) /
              |           (sqrt(list_inner_product(cf, cf)) * sqrt(list_inner_product(mf, mf))) AS score
              |  FROM fm CROSS JOIN fc),
              |r AS (
              |  SELECT qid, media_id,
              |         CAST(row_number() OVER (PARTITION BY qid
              |           ORDER BY score DESC, media_id) AS BIGINT) AS pair_rank,
              |         CAST(COUNT(*) OVER (PARTITION BY qid) AS BIGINT) AS n_candidates
              |  FROM s)
              |SELECT qid, pair_rank, n_candidates
              |FROM r WHERE media_id = qid
              |ORDER BY qid""".stripMargin)),

    QuerySpec(
      "q48_multimodal_meta",
      (s, dir) => MultimodalOps.mediaMeta(Tables.documents(s, dir)),
      Some("""SELECT doc_id AS media_id, 'text/plain' AS mime, source,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             |FROM documents
             |ORDER BY media_id""".stripMargin)),

    // The decode STUB is deterministic byte arithmetic (FNV-1a fold +
    // 16-bit feature slices), so it IS oracle-expressible (new in r7):
    // DuckDB reproduces the fold in HUGEINT mod 2^64, emulating the
    // low-byte XOR with (acc - acc%256 + xor(acc%256, b)). A real
    // codec swap-in would return this query to rows-only.
    QuerySpec(
      "q49_multimodal_decode",
      (s, dir) => MultimodalOps.decodeFeatures(Tables.documents(s, dir)),
      Some(s"""WITH b AS (
              |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
              |         octet_length(encode(text)) AS n
              |  FROM documents
              |),
              |byt AS (
              |  SELECT media_id, CAST(n AS BIGINT) AS n_bytes, $hexBytesSql AS bytes FROM b
              |),
              |h AS (
              |  SELECT media_id, n_bytes, bytes,
              |    list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), bytes),
              |      (acc, x) -> ((acc - (acc % 256) + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
              |                   * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS uh
              |  FROM byt
              |)
              |SELECT media_id, n_bytes,
              |  CASE WHEN len(bytes) > 0 THEN CAST(bytes[1] AS BIGINT) ELSE -1 END AS first_byte,
              |  $toSignedSql AS content_hash,
              |  CAST((uh // 1) % 65536 AS DOUBLE) / 65535.0 AS f0,
              |  CAST((uh // 65536) % 65536 AS DOUBLE) / 65535.0 AS f1,
              |  CAST((uh // 4294967296) % 65536 AS DOUBLE) / 65535.0 AS f2,
              |  CAST((uh // 281474976710656) % 65536 AS DOUBLE) / 65535.0 AS f3
              |FROM h ORDER BY media_id""".stripMargin)),

    // Frame sampling over the stand-in payload: every 128th 64-char
    // window is a "frame" with its md5 fingerprint — the video
    // frame-sample explode shape, oracle-expressible on text.
    QuerySpec(
      "q68_frame_sample",
      (s, dir) => MultimodalOps.frameSample(Tables.documents(s, dir)),
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id,
             |         CAST((length(text) - 64) // 128 + 1 AS BIGINT) AS n_frames, text
             |  FROM documents WHERE length(text) >= 64)
             |SELECT media_id, CAST(gi AS BIGINT) AS frame_idx, n_frames,
             |       md5(substr(text, CAST(gi * 128 + 1 AS INT), 64)) AS frame_fp
             |FROM (SELECT media_id, n_frames, text, unnest(range(0, n_frames)) AS gi FROM f)
             |ORDER BY media_id, frame_idx""".stripMargin)),

    // cross-media duplicate frames: any q68 frame fingerprint in ≥2
    // distinct media is re-used material (stock footage / shared
    // intros) — fingerprint-keyed rollup, duplicate-rate-sized output.
    QuerySpec(
      "q200_cross_media_frames",
      (s, dir) => MultimodalOps.crossMediaDupFrames(Tables.documents(s, dir)),
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id,
             |         CAST((length(text) - 64) // 128 + 1 AS BIGINT) AS n_frames, text
             |  FROM documents WHERE length(text) >= 64),
             |fr AS (SELECT media_id,
             |              md5(substr(text, CAST(gi * 128 + 1 AS INT), 64)) AS frame_fp
             |       FROM (SELECT media_id, n_frames, text,
             |                    unnest(range(0, n_frames)) AS gi FROM f))
             |SELECT frame_fp, CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
             |       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             |       CAST(MIN(media_id) AS BIGINT) AS first_media,
             |       CAST(MAX(media_id) AS BIGINT) AS last_media
             |FROM fr GROUP BY frame_fp HAVING COUNT(DISTINCT media_id) >= 2
             |ORDER BY frame_fp""".stripMargin))
  )

  // ---------------------------------------------------------------- //
  // §2.10 ML pipelines (M1-M9) — not SQL-expressible; rows-only here,
  // semantics covered by MLSpec. All four draw on [[MLShared]]: ONE
  // persisted feature table + ONE set of fitted encoder stages per
  // run (round 1 rebuilt/cached/unpersisted per query — the top bench
  // cost); Verify/Bench release the shared cache at end of run.
  // ---------------------------------------------------------------- //
  /** Shared SQL fragments for the byte-fold oracles (q39/q49): UTF-8
    * bytes of `hx`/`n` (hex payload + octet length) as an int list,
    * and unsigned-HUGEINT `uh` → signed BIGINT two's-complement. */
  private val hexBytesSql: String =
    """list_transform(range(0, n),
      |      i -> 16*(strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1))-1)
      |           + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1))-1))""".stripMargin

  private val toSignedSql: String =
    """CAST(CASE WHEN uh >= CAST(9223372036854775808 AS HUGEINT)
      |       THEN uh - CAST(18446744073709551616 AS HUGEINT) ELSE uh END AS BIGINT)""".stripMargin

  /** XXH64(seed 42) of the BIGINT `doc_id` — Spark's `xxhash64` over
    * a LONG column: a FIXED sequence of mod-2^64 multiplies, rotates
    * and xors (single 8-byte block + avalanche), reproduced in DuckDB
    * HUGEINT arithmetic. The 64×64 multiply is split at 32 bits so
    * intermediates stay inside the signed 128-bit HUGEINT range; xor
    * runs through signed BIGINT (bitwise identity). Emitted as the
    * CTE chain `d, s3..s10` ending in unsigned `h8`, plus the
    * signed-BIGINT converter for the caller's mod — shared by the
    * q94 (hash split) and q104 (corpus mixing) oracles; validated
    * bit-exact against the Spark per-doc values. */
  private object Xxh64DocIdSql {
    private val M64 = "18446744073709551616"
    private val B32 = "4294967296"
    private def mul(a: String, b: String) =
      s"((((($a)//$B32)*($b))%$B32)*$B32 + (($a)%$B32)*($b)) % $M64"
    private def rotl(x: String, r: Int) =
      s"((($x)*${1L << r} + ($x)//${1L << (64 - r)}) % $M64)"
    def tos(x: String) =
      s"(CASE WHEN ($x) >= 9223372036854775808 THEN CAST(($x) - $M64 AS BIGINT) ELSE CAST(($x) AS BIGINT) END)"
    private def xor64(a: String, b: String) =
      s"(CASE WHEN xor(${tos(a)}, ${tos(b)}) < 0 THEN CAST(xor(${tos(a)}, ${tos(b)}) AS HUGEINT) + $M64 ELSE CAST(xor(${tos(a)}, ${tos(b)}) AS HUGEINT) END)"
    private val p1 = s"CAST(11400714785074694791 AS HUGEINT)"
    private val p2 = s"CAST(14029467366897019727 AS HUGEINT)"
    private val p3 = s"CAST(1609587929392839161 AS HUGEINT)"
    private val p4 = "9650029242287828579"
    private val h0 = "CAST(2870177450012600311 AS HUGEINT)" // (seed 42 + PRIME64_5 + len 8) mod 2^64
    /** The avalanche chain over an arbitrary keyed input: `dCte` must
      * yield the carried id columns plus `k` (the BIGINT key as
      * nonnegative HUGEINT); `carry` is the id column list threaded
      * through every stage. Ends in `s10$sfx(carry…, h8)`; pass a
      * suffix to run two chains in one statement (q227 hashes BOTH
      * cluster_id and doc_id). */
    def chainFrom(dCte: String, carry: String, sfx: String = ""): String =
      s"""d$sfx AS ($dCte),
         |s3$sfx AS (SELECT $carry, ${mul(rotl(mul("k", p2), 31), p1)} AS k1c FROM d$sfx),
         |s5$sfx AS (SELECT $carry, (${mul(rotl(xor64(h0, "k1c"), 27), p1)} + $p4) % $M64 AS h3 FROM s3$sfx),
         |s6$sfx AS (SELECT $carry, ${xor64("h3", "h3//8589934592")} AS h4 FROM s5$sfx),
         |s7$sfx AS (SELECT $carry, ${mul("h4", p2)} AS h5 FROM s6$sfx),
         |s8$sfx AS (SELECT $carry, ${xor64("h5", "h5//536870912")} AS h6 FROM s7$sfx),
         |s9$sfx AS (SELECT $carry, ${mul("h6", p3)} AS h7 FROM s8$sfx),
         |s10$sfx AS (SELECT $carry, ${xor64("h7", "h7//4294967296")} AS h8 FROM s9$sfx)""".stripMargin

    /** CTEs computing h8 = xxhash64(doc_id, 42) as unsigned HUGEINT. */
    val ctes: String =
      chainFrom("SELECT doc_id, CAST(doc_id AS HUGEINT) AS k FROM documents", "doc_id")
  }

  /** Shared by q228 (the allocation table itself) and q230 (admission
    * gated by it): the integer water-fill CTE chain ending in
    * `a(source, n_docs, demand, alloc_tokens)`. One SQL text keeps
    * the two queries' allocations provably identical. */
  /** Shared CTE chain for q293/q294: the data-constrained epoch
    * schedule at budgetMult=4, maxEpochs=4 — per-source temperature
    * target via the overflow-safe ⌊B·w/W⌋ decomposition
    * (B div W)·w + ((B mod W)·w) div W, then the epoch split. mult=4
    * sits ON the upweight=1 boundary, so sources smaller than average
    * cap at 4 epochs and larger ones keep a partial tail — both
    * branches live in the oracle at every SF. */
  private def epochScheduleCtesOver(rel: String, z: String): String =
    s"""per$z AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT) AS n_tokens
      |  FROM $rel GROUP BY 1),
      |w$z AS (SELECT source, n_docs, n_tokens,
      |        CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS w_sqrt FROM per$z),
      |tot$z AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
      |               CAST(SUM(w_sqrt) AS BIGINT) AS tot_w FROM w$z),
      |tgt$z AS (SELECT source, n_docs, n_tokens, w_sqrt,
      |          CAST(((4 * tot_tokens) // tot_w) * w_sqrt
      |             + (((4 * tot_tokens) % tot_w) * w_sqrt) // tot_w AS BIGINT) AS target_tokens
      |        FROM w$z CROSS JOIN tot$z),
      |sch$z AS (SELECT source, n_docs, n_tokens, w_sqrt, target_tokens,
      |          CAST(LEAST(4, CASE WHEN n_tokens > 0
      |            THEN target_tokens // n_tokens ELSE 0 END) AS BIGINT) AS full_epochs,
      |          (target_tokens > 4 * n_tokens) AS capped,
      |          CAST(LEAST(target_tokens, 4 * n_tokens) AS BIGINT) AS realized_tokens
      |        FROM tgt$z)""".stripMargin

  private val epochScheduleCtes: String = epochScheduleCtesOver("documents", "")

  /** q293's schedule extended to document granularity, ending in
    * `adm(doc_id, source, epoch, n_toks, cum_tokens, admitted)` —
    * shared by q294 (the admission report itself) and q295 (the
    * training order built from the admitted pairs), so the two
    * queries' admissions are provably identical. */
  private def epochAdmissionCtesOver(rel: String, z: String): String =
    s"""${epochScheduleCtesOver(rel, z)},
       |cm$z AS (SELECT doc_id, source,
       |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_toks,
       |         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+')))
       |           OVER (PARTITION BY source ORDER BY doc_id
       |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |       FROM $rel),
       |j$z AS (SELECT cm$z.doc_id, cm$z.source, cm$z.n_toks, cm$z.cum_tokens,
       |        sch$z.full_epochs,
       |        CAST(sch$z.realized_tokens - sch$z.full_epochs * sch$z.n_tokens
       |          AS BIGINT) AS tail_tokens
       |      FROM cm$z JOIN sch$z USING (source)),
       |j2$z AS (SELECT *, CAST(full_epochs +
       |         CASE WHEN tail_tokens > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_slots
       |       FROM j$z),
       |adm$z AS (SELECT doc_id, source, CAST(e.epoch AS BIGINT) AS epoch,
       |          n_toks, cum_tokens,
       |          (e.epoch <= full_epochs OR cum_tokens <= tail_tokens) AS admitted
       |        FROM j2$z, UNNEST(generate_series(1, n_slots)) AS e(epoch))""".stripMargin

  private val epochAdmissionCtes: String = epochAdmissionCtesOver("documents", "")

  /** The XXH64 chain over the epoch-folded key doc_id·8+epoch with
    * shard/pos exactly as q141's oracle, n_toks carried through —
    * ends in `ord(doc_id, epoch, n_toks, shuffle_key, shard, pos)`;
    * shared by q295 (the order itself) and q297 (packing by it). */
  private def epochOrderCtesOver(rel: String, z: String): String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    s"""${epochAdmissionCtesOver(rel, z)},
       |${chainFrom(
        s"SELECT doc_id, epoch, n_toks, CAST(doc_id * 8 + epoch AS HUGEINT) AS k " +
          s"FROM adm$z WHERE admitted", "doc_id, epoch, n_toks", z)},
       |kk$z AS (SELECT doc_id, epoch, n_toks, ${tos("h8")} AS shuffle_key FROM s10$z),
       |sh$z AS (SELECT doc_id, epoch, n_toks, shuffle_key,
       |         CAST(((shuffle_key % 8) + 8) % 8 AS BIGINT) AS shard FROM kk$z),
       |ord$z AS (SELECT doc_id, epoch, n_toks, shuffle_key, shard,
       |          CAST(row_number() OVER (PARTITION BY shard
       |              ORDER BY shuffle_key, doc_id, epoch) AS BIGINT) AS pos
       |        FROM sh$z)""".stripMargin
  }

  private val epochOrderCtes: String = epochOrderCtesOver("documents", "")

  private val q295OracleSql: String =
    s"""WITH $epochOrderCtes
       |SELECT doc_id, epoch, shuffle_key, shard, pos
       |FROM ord ORDER BY shard, pos""".stripMargin

  /** The q297 per-shard packing cumsum + sequence-span arithmetic
    * over `ord`, ending in `pk2(shard, pos, doc_id, epoch, n_toks,
    * cum, start_seq, end_seq, tok_offset)` — shared by q297 (the
    * pack itself), q298 (resume manifest over the same spans) and
    * q300 (spacing audit over the same spans). */
  private def epochPackCtesOver(rel: String, z: String): String =
    s"""${epochOrderCtesOver(rel, z)},
       |pk$z AS (SELECT shard, pos, doc_id, epoch, n_toks,
       |         CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY pos
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |       FROM ord$z WHERE n_toks > 0),
       |pk2$z AS (SELECT shard, pos, doc_id, epoch, n_toks, cum,
       |          CAST((cum - n_toks) // 2048 AS BIGINT) AS start_seq,
       |          CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
       |          CAST((cum - n_toks) % 2048 AS BIGINT) AS tok_offset
       |        FROM pk$z)""".stripMargin

  private val epochPackCtes: String = epochPackCtesOver("documents", "")

  /** q301 oracle: the admission chain re-joined to the schedule for
    * full_epochs (is_anneal = epoch beyond the full passes), the
    * XXH64 chain over the epoch-folded key carrying the anneal flag,
    * the exact-reproducible quality tree, and the per-shard window
    * whose order key switches to ascending quality for anneal rows. */
  /** Shared CTE chain for q301/q309, ending in `ordq(shard, pos,
    * doc_id, epoch, is_anneal, n_toks, quality)` — the anneal
    * permutation with token masses carried so q309 can pack by it. */
  private val annealOrderCtes: String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    s"""$epochAdmissionCtes,
       |fe AS (SELECT adm.doc_id, adm.epoch, adm.n_toks,
       |         (adm.epoch > sch.full_epochs) AS is_anneal
       |       FROM adm JOIN sch USING (source) WHERE adm.admitted),
       |${chainFrom(
        "SELECT doc_id, epoch, n_toks, is_anneal, CAST(doc_id * 8 + epoch AS HUGEINT) AS k FROM fe",
        "doc_id, epoch, n_toks, is_anneal")},
       |kk AS (SELECT doc_id, epoch, n_toks, is_anneal, ${tos("h8")} AS shuffle_key FROM s10),
       |sh2 AS (SELECT doc_id, epoch, n_toks, is_anneal, shuffle_key,
       |          CAST(((shuffle_key % 8) + 8) % 8 AS BIGINT) AS shard FROM kk),
       |qsc AS ($qualityPerDocSql),
       |jq AS (SELECT sh2.doc_id, sh2.epoch, sh2.n_toks, sh2.is_anneal,
       |         sh2.shuffle_key, sh2.shard, qsc.quality
       |       FROM sh2 JOIN qsc USING (doc_id)),
       |ordq AS (SELECT shard, doc_id, epoch, is_anneal, n_toks, quality,
       |          CAST(row_number() OVER (PARTITION BY shard ORDER BY is_anneal,
       |            CASE WHEN is_anneal THEN quality ELSE 0.0 END,
       |            CASE WHEN is_anneal THEN 0 ELSE shuffle_key END,
       |            doc_id, epoch) AS BIGINT) AS pos
       |        FROM jq)""".stripMargin
  }

  private val q301OracleSql: String =
    s"""WITH $annealOrderCtes
       |SELECT shard, pos, doc_id, epoch, is_anneal, quality
       |FROM ordq ORDER BY shard, pos""".stripMargin

  private val q309OracleSql: String =
    s"""WITH $annealOrderCtes,
       |apk AS (SELECT shard, pos, doc_id, epoch, is_anneal, n_toks,
       |          CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY pos
       |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |        FROM ordq WHERE n_toks > 0)
       |SELECT shard, pos, doc_id, epoch, is_anneal, n_toks,
       |       CAST((cum - n_toks) // 2048 AS BIGINT) AS start_seq,
       |       CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
       |       CAST((cum - 1) // 2048 - (cum - n_toks) // 2048 + 1 AS BIGINT)
       |         AS n_seqs
       |FROM apk ORDER BY shard, pos""".stripMargin

  /** q305 oracle: one UNION ALL branch per lineitem column, each
    * computing that column's stats with the same canonical rendering
    * (doubles through DECIMAL(38,6)); dtype literals mirror Spark's
    * simpleString for the parquet-read schema. */
  private val q305OracleSql: String = {
    val cols = Seq(
      ("l_orderkey", "bigint", false), ("l_partkey", "bigint", false),
      ("l_suppkey", "bigint", false), ("l_linenumber", "int", false),
      ("l_quantity", "double", true), ("l_extendedprice", "double", true),
      ("l_discount", "double", true), ("l_tax", "double", true),
      ("l_returnflag", "string", false), ("l_linestatus", "string", false),
      ("l_shipdate", "timestamp_ntz", false))
    cols.map { case (c, t, dbl) =>
      def mm(f: String) =
        if (dbl) s"CAST(CAST($f($c) AS DECIMAL(38,6)) AS VARCHAR)"
        else s"CAST($f($c) AS VARCHAR)"
      s"""SELECT '$c' AS col_name, '$t' AS dtype,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
         |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       ${mm("MIN")} AS min_str, ${mm("MAX")} AS max_str
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** q306 oracle: one UNION ALL branch per constraint — FK orphans
    * via null-excluded NOT EXISTS counts, PK duplicates via
    * rows − distinct keys. */
  private val q306OracleSql: String = {
    def fkRow(child: String, ck: String, parent: String, pk: String) =
      s"""SELECT 'fk $child.$ck -> $parent.$pk' AS check_name,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child
         |   WHERE $ck IS NOT NULL) AS n_rows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child c
         |   WHERE c.$ck IS NOT NULL AND NOT EXISTS
         |     (SELECT 1 FROM $parent p WHERE p.$pk = c.$ck)) AS n_violations""".stripMargin
    def pkRow(table: String, key: String) =
      s"""SELECT 'pk $table.$key' AS check_name,
         |  (SELECT CAST(COUNT($key) AS BIGINT) FROM $table) AS n_rows,
         |  (SELECT CAST(COUNT($key) - COUNT(DISTINCT $key) AS BIGINT)
         |   FROM $table) AS n_violations""".stripMargin
    val rows = Seq(
      fkRow("lineitem", "l_orderkey", "orders", "o_orderkey"),
      fkRow("lineitem", "l_partkey", "part", "p_partkey"),
      fkRow("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      fkRow("orders", "o_custkey", "customer", "c_custkey"),
      fkRow("customer", "c_nationkey", "nation", "n_nationkey"),
      fkRow("supplier", "s_nationkey", "nation", "n_nationkey"),
      fkRow("nation", "n_regionkey", "region", "r_regionkey"),
      pkRow("orders", "o_orderkey"), pkRow("customer", "c_custkey"),
      pkRow("part", "p_partkey"), pkRow("supplier", "s_suppkey"),
      pkRow("nation", "n_nationkey"), pkRow("region", "r_regionkey"))
      .mkString("\nUNION ALL\n")
    s"""SELECT check_name, n_rows, n_violations, n_violations = 0 AS ok
       |FROM ($rows)
       |ORDER BY check_name""".stripMargin
  }

  /** q303 oracle: TWO full pack chains — v1 over documents, v2 over
    * documents minus the removed set — full-outer joined on
    * (shard, pos); reuse stops at the FIRST dirty position (the
    * window min), so a later re-sync of the streams cannot count. */
  private val q303OracleSql: String =
    s"""WITH ${epochPackCtesOver("documents", "v1")},
       |${epochPackCtesOver("(SELECT * FROM documents WHERE doc_id % 37 <> 0)", "v2")},
       |jj AS (SELECT COALESCE(a.shard, b.shard) AS shard,
       |         COALESCE(a.pos, b.pos) AS pos,
       |         a.doc_id AS v1_doc, a.epoch AS v1_epoch, a.n_toks AS v1_toks,
       |         a.cum AS v1_cum, a.end_seq AS v1_end,
       |         b.doc_id AS v2_doc, b.epoch AS v2_epoch, b.n_toks AS v2_toks
       |       FROM pk2v1 a FULL OUTER JOIN pk2v2 b
       |         ON a.shard = b.shard AND a.pos = b.pos),
       |jd AS (SELECT *, (v1_doc IS NULL OR v2_doc IS NULL OR v1_doc <> v2_doc
       |         OR v1_epoch <> v2_epoch OR v1_toks <> v2_toks) AS dirty FROM jj),
       |jf AS (SELECT *, MIN(CASE WHEN dirty THEN pos END)
       |         OVER (PARTITION BY shard) AS fd FROM jd),
       |ag AS (SELECT shard,
       |         CAST(SUM(CASE WHEN v1_doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1_spans,
       |         CAST(SUM(CASE WHEN v2_doc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2_spans,
       |         CAST(MAX(CASE WHEN v1_doc IS NOT NULL THEN v1_end END) + 1 AS BIGINT) AS v1_seqs,
       |         CAST(MIN(CASE WHEN dirty THEN pos END) AS BIGINT) AS first_dirty_pos,
       |         CAST(MAX(CASE WHEN pos < COALESCE(fd, 9223372036854775807)
       |           THEN v1_cum END) AS BIGINT) AS clean_cum
       |       FROM jf GROUP BY shard)
       |SELECT shard, v1_spans, v2_spans, v1_seqs, first_dirty_pos,
       |       CAST(CASE WHEN first_dirty_pos IS NULL THEN v1_seqs
       |            WHEN first_dirty_pos = 1 THEN 0
       |            ELSE clean_cum // 2048 END AS BIGINT) AS reusable_seqs
       |FROM ag ORDER BY shard""".stripMargin

  /** The q295 XXH64 order chain with `source` carried through every
    * stage, ending in `ords(doc_id, source, epoch, n_toks,
    * shuffle_key, shard, pos)` — q299's shuffle-quality audit needs
    * the source label at every position. */
  private val epochOrderSrcCtes: String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    s"""$epochAdmissionCtes,
       |${chainFrom(
        "SELECT doc_id, source, epoch, n_toks, CAST(doc_id * 8 + epoch AS HUGEINT) AS k " +
          "FROM adm WHERE admitted", "doc_id, source, epoch, n_toks")},
       |kk AS (SELECT doc_id, source, epoch, n_toks, ${tos("h8")} AS shuffle_key FROM s10),
       |sh AS (SELECT doc_id, source, epoch, n_toks, shuffle_key,
       |         CAST(((shuffle_key % 8) + 8) % 8 AS BIGINT) AS shard FROM kk),
       |ords AS (SELECT doc_id, source, epoch, n_toks, shuffle_key, shard,
       |          CAST(row_number() OVER (PARTITION BY shard
       |              ORDER BY shuffle_key, doc_id, epoch) AS BIGINT) AS pos
       |        FROM sh)""".stripMargin
  }

  private val waterFillCtes: String =
    """dem AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9_]+'))) AS BIGINT) AS demand
      |  FROM documents GROUP BY 1),
      |rk AS (SELECT source, n_docs, demand,
      |         CAST(row_number() OVER (ORDER BY demand, source) AS BIGINT) AS r,
      |         CAST(COALESCE(SUM(demand) OVER (ORDER BY demand, source
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix,
      |         CAST(COUNT(*) OVER () AS BIGINT) AS n_src
      |       FROM dem),
      |lv AS (SELECT MIN(r) AS r_star FROM rk
      |       WHERE prefix + (n_src - r + 1) * demand >= 26000),
      |lr AS (SELECT lv.r_star,
      |         CAST((26000 - rk.prefix) // (rk.n_src - lv.r_star + 1) AS BIGINT) AS level,
      |         CAST((26000 - rk.prefix) % (rk.n_src - lv.r_star + 1) AS BIGINT) AS res
      |       FROM lv LEFT JOIN rk ON rk.r = lv.r_star),
      |a AS (SELECT rk.source, rk.n_docs, rk.demand,
      |        CAST(CASE WHEN lr.r_star IS NULL OR rk.r < lr.r_star THEN rk.demand
      |             ELSE lr.level + CASE WHEN rk.r < lr.r_star + lr.res THEN 1 ELSE 0 END
      |             END AS BIGINT) AS alloc_tokens
      |      FROM rk CROSS JOIN lr)""".stripMargin

  /** q227 oracle: the q61 demonstrator closure labels every doc with
    * its near-dup cluster, then TWO XXH64 avalanche chains — one over
    * cluster_id (suffix "c", the unit-split key) and the standard
    * doc_id chain — derive the cluster-pinned and naive splits; moved
    * = the two disagree. */
  private val q227OracleSql: String = {
    import Xxh64DocIdSql.{chainFrom, ctes, tos}
    val bucket = s"((${tos("h8")} % 10) + 10) % 10"
    def splitCase(b: String) =
      s"CASE WHEN $b < 8 THEN 'train' WHEN $b = 8 THEN 'val' ELSE 'test' END"
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |    FROM documents WHERE doc_id < 60)),
       |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |      FROM sh a JOIN sh b USING (s)
       |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |p AS (SELECT doc_i, doc_j FROM c
       |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
       |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
       |      UNION ALL SELECT doc_j, doc_i FROM p),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |${chainFrom("SELECT doc_id, cluster_id, CAST(cluster_id AS HUGEINT) AS k FROM cl",
                    "doc_id, cluster_id", "c")},
       |$ctes,
       |cb AS (SELECT doc_id, cluster_id, ${splitCase(bucket)} AS split FROM s10c),
       |nb AS (SELECT doc_id, ${splitCase(bucket)} AS naive_split FROM s10)
       |SELECT cb.doc_id, cb.cluster_id, cb.split,
       |       (cb.split <> nb.naive_split) AS moved
       |FROM cb JOIN nb USING (doc_id)
       |ORDER BY cb.doc_id""".stripMargin
  }

  /** q236 oracle: the q227 closure + cluster-hash split chain, the
    * q234 per-(split, lang) packing algebra, the q122 gram matrix and
    * the cluster-span leak count — all over the SAME cb assignment,
    * certifying the composed pipeline in one statement. */
  private val q236OracleSql: String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    val bucket = s"((${tos("h8")} % 10) + 10) % 10"
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |    FROM documents WHERE doc_id < 60)),
       |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |      FROM sh a JOIN sh b USING (s)
       |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |p AS (SELECT doc_i, doc_j FROM c
       |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
       |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
       |      UNION ALL SELECT doc_j, doc_i FROM p),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |${chainFrom("SELECT doc_id, cluster_id, CAST(cluster_id AS HUGEINT) AS k FROM cl",
                    "doc_id, cluster_id", "c")},
       |cb AS (SELECT doc_id, cluster_id,
       |              CASE WHEN $bucket < 8 THEN 'train' WHEN $bucket = 8 THEN 'val'
       |                   ELSE 'test' END AS split
       |       FROM s10c),
       |pk0 AS (SELECT cb.split, d.lang, d.doc_id,
       |          CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
       |        FROM documents d JOIN cb USING (doc_id)),
       |pk AS (SELECT split, lang, doc_id, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY split, lang ORDER BY doc_id) AS cum
       |       FROM pk0 WHERE n_tokens > 0),
       |ns AS (SELECT split, CAST(SUM(mx) AS BIGINT) AS n_seqs_a
       |       FROM (SELECT split, lang, MAX((cum - 1) // 2048) + 1 AS mx
       |             FROM pk GROUP BY split, lang) GROUP BY split),
       |tokg AS (SELECT d.doc_id, cb.split, regexp_extract_all(lower(d.text), '[A-Za-z0-9_]+') AS t
       |         FROM documents d JOIN cb USING (doc_id)),
       |g AS (SELECT DISTINCT doc_id, split, array_to_string(list_slice(t, gi, gi + 4), ' ') AS gram
       |      FROM (SELECT doc_id, split, t, unnest(range(1, len(t) - 3)) AS gi
       |            FROM tokg WHERE len(t) >= 5)),
       |gs AS (SELECT DISTINCT split, gram FROM g),
       |tot AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs_a FROM cb GROUP BY split),
       |frame AS (SELECT a.split AS split_a, a.n_docs_a, b.split AS split_b
       |          FROM tot a CROSS JOIN tot b WHERE a.split <> b.split),
       |cont AS (SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_docs_contaminated
       |         FROM (SELECT DISTINCT g.split AS split_a, gs.split AS split_b, g.doc_id
       |               FROM g JOIN gs ON g.gram = gs.gram AND g.split <> gs.split)
       |         GROUP BY 1, 2),
       |shg AS (SELECT a.split AS split_a, b.split AS split_b,
       |               CAST(COUNT(*) AS BIGINT) AS n_shared_grams
       |        FROM gs a JOIN gs b ON a.gram = b.gram AND a.split <> b.split
       |        GROUP BY 1, 2),
       |csd AS (SELECT DISTINCT cluster_id, split FROM cb),
       |lk AS (SELECT sa.split AS split_a, sb.split AS split_b,
       |              CAST(COUNT(DISTINCT cb.doc_id) AS BIGINT) AS n_leaked_docs
       |       FROM csd sa JOIN csd sb ON sa.cluster_id = sb.cluster_id AND sa.split <> sb.split
       |       JOIN cb ON cb.cluster_id = sa.cluster_id AND cb.split = sa.split
       |       GROUP BY 1, 2)
       |SELECT f.split_a, f.split_b, f.n_docs_a,
       |       COALESCE(ns.n_seqs_a, 0) AS n_seqs_a,
       |       COALESCE(lk.n_leaked_docs, 0) AS n_leaked_docs,
       |       COALESCE(ct.n_docs_contaminated, 0) AS n_docs_contaminated,
       |       COALESCE(sg.n_shared_grams, 0) AS n_shared_grams
       |FROM frame f LEFT JOIN ns ON ns.split = f.split_a
       |             LEFT JOIN lk ON lk.split_a = f.split_a AND lk.split_b = f.split_b
       |             LEFT JOIN cont ct ON ct.split_a = f.split_a AND ct.split_b = f.split_b
       |             LEFT JOIN shg sg ON sg.split_a = f.split_a AND sg.split_b = f.split_b
       |ORDER BY f.split_a, f.split_b""".stripMargin
  }

  /** q231 oracle: (1) the stored-slice q227 closure + XXH64 split
    * (suffix "c" chain over stored cluster ids); (2) the df-capped
    * exact-Jaccard pair set over ALL docs; (3) the condensed combined
    * closure over batch ids + stored cluster ids; (4) per-component
    * anchor/conflict algebra with a fresh-hash chain (suffix "n")
    * for batch-only components. Stored nodes are recognizable as
    * node < 400 (cluster ids are stored doc ids). */
  private val q231OracleSql: String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    val bucket = s"((${tos("h8")} % 10) + 10) % 10"
    def splitCase(b: String) =
      s"CASE WHEN $b < 8 THEN 'train' WHEN $b = 8 THEN 'val' ELSE 'test' END"
    s"""WITH RECURSIVE ssh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |    FROM documents WHERE doc_id < 60)),
       |sn AS (SELECT doc_id, COUNT(*) AS n_sh FROM ssh GROUP BY doc_id),
       |sc AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |       FROM ssh a JOIN ssh b USING (s)
       |       WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |sp AS (SELECT doc_i, doc_j FROM sc
       |       JOIN sn ni ON doc_i = ni.doc_id JOIN sn nj ON doc_j = nj.doc_id
       |       WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |se AS (SELECT doc_i AS src, doc_j AS dst FROM sp
       |       UNION ALL SELECT doc_j, doc_i FROM sp),
       |sreach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 400
       |  UNION
       |  SELECT se.dst, r.lbl FROM sreach r JOIN se ON se.src = r.node),
       |scl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM sreach GROUP BY node),
       |sclu AS (SELECT DISTINCT cluster_id FROM scl),
       |${chainFrom("SELECT cluster_id, CAST(cluster_id AS HUGEINT) AS k FROM sclu",
                    "cluster_id", "c")},
       |csplit AS (SELECT cluster_id, ${splitCase(bucket)} AS split FROM s10c),
       |gsh AS (SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |    FROM documents)),
       |gdf AS (SELECT s FROM gsh GROUP BY s HAVING COUNT(*) <= 30),
       |gshf AS (SELECT gsh.doc_id, gsh.s FROM gsh JOIN gdf USING (s)),
       |gn AS (SELECT doc_id, COUNT(*) AS n_sh FROM gshf GROUP BY 1),
       |gc AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
       |       FROM gshf a JOIN gshf b USING (s)
       |       WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |gp AS (SELECT i, j FROM gc
       |       JOIN gn ni ON i = ni.doc_id JOIN gn nj ON j = nj.doc_id
       |       WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |xe AS (SELECT scl.cluster_id AS i, gp.j FROM gp
       |       JOIN scl ON gp.i = scl.doc_id WHERE gp.i < 400 AND gp.j >= 400),
       |be AS (SELECT i, j FROM gp WHERE i >= 400),
       |al AS (SELECT i, j FROM xe UNION SELECT i, j FROM be),
       |ee AS (SELECT i AS src, j AS dst FROM al UNION ALL SELECT j, i FROM al),
       |creach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents WHERE doc_id >= 400
       |  UNION
       |  SELECT cluster_id, cluster_id FROM sclu
       |  UNION
       |  SELECT ee.dst, r.lbl FROM creach r JOIN ee ON ee.src = r.node),
       |ccl AS (SELECT node, MIN(lbl) AS comp_id FROM creach GROUP BY node),
       |agg AS (SELECT ccl.comp_id,
       |               MIN(CASE WHEN ccl.node < 400 THEN ccl.node END) AS anchor_cluster,
       |               CAST(COUNT(DISTINCT CASE WHEN ccl.node < 400 THEN cs.split END) AS BIGINT) AS n_splits
       |        FROM ccl LEFT JOIN csplit cs ON ccl.node = cs.cluster_id
       |        GROUP BY ccl.comp_id),
       |${chainFrom("SELECT comp_id, CAST(comp_id AS HUGEINT) AS k FROM (SELECT DISTINCT comp_id FROM ccl)",
                    "comp_id", "n")},
       |nsplit AS (SELECT comp_id, ${splitCase(bucket)} AS hsplit FROM s10n)
       |SELECT ccl.node AS doc_id,
       |       COALESCE(agg.anchor_cluster, ccl.comp_id) AS assigned_cluster,
       |       CASE WHEN agg.anchor_cluster IS NOT NULL THEN cs.split
       |            ELSE ns.hsplit END AS split,
       |       CASE WHEN agg.anchor_cluster IS NOT NULL THEN 'adopted'
       |            ELSE 'hashed' END AS origin,
       |       (agg.n_splits >= 2) AS conflict
       |FROM ccl JOIN agg USING (comp_id)
       |LEFT JOIN csplit cs ON cs.cluster_id = agg.anchor_cluster
       |JOIN nsplit ns ON ns.comp_id = ccl.comp_id
       |WHERE ccl.node >= 400
       |ORDER BY doc_id""".stripMargin
  }

  /** q232 oracle: the q61 demonstrator closure (positives), anchor
    * top-tf term selection, and the q145 BM25 expression tree
    * replayed from the raw text — a hash match certifies both stored
    * artifacts (postings AND closure memo) on top of the mining
    * algebra. */
  private val q232OracleSql: String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |    FROM documents WHERE doc_id < 60)),
       |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |      FROM sh a JOIN sh b USING (s)
       |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |p AS (SELECT doc_i, doc_j FROM c
       |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
       |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
       |      UNION ALL SELECT doc_j, doc_i FROM p),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |anch(qid) AS (VALUES (0), (20), (40), (80), (120)),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |  FROM documents),
       |atf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |        WHERE doc_id IN (SELECT qid FROM anch) GROUP BY 1, 2),
       |qt AS (SELECT doc_id AS qid, w FROM (
       |         SELECT doc_id, w,
       |                row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, w) AS trk
       |         FROM atf) WHERE trk <= 3),
       |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |       WHERE w IN (SELECT w FROM qt) GROUP BY 1, 2),
       |dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
       |dl AS (SELECT doc_id,
       |              CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
       |       FROM documents),
       |cc AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
       |s AS (SELECT qt.qid, tf.doc_id,
       |             CAST(floor((((nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
       |                   (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(sumdl AS DOUBLE) / nn))))
       |                  * 1000000000.0) AS BIGINT) AS score_t_ppb
       |      FROM tf JOIN qt USING (w) JOIN dfw USING (w) JOIN dl USING (doc_id) CROSS JOIN cc),
       |pd AS (SELECT qid, doc_id, CAST(SUM(score_t_ppb) AS BIGINT) AS score_ppb
       |       FROM s GROUP BY qid, doc_id),
       |px AS (SELECT pd.qid, pd.doc_id, pd.score_ppb,
       |              dc.cluster_id AS dcl, ac.cluster_id AS qcl
       |       FROM pd JOIN cl dc ON pd.doc_id = dc.doc_id
       |       JOIN cl ac ON pd.qid = ac.doc_id),
       |ex AS (SELECT qid, CAST(SUM(CASE WHEN dcl = qcl THEN 1 ELSE 0 END) AS BIGINT) AS n_excluded
       |       FROM px GROUP BY qid),
       |r AS (SELECT qid, doc_id, score_ppb,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score_ppb DESC, doc_id) AS BIGINT) AS rk
       |      FROM px WHERE dcl <> qcl)
       |SELECT CAST(r.qid AS BIGINT) AS qid, r.rk, r.doc_id, r.score_ppb, ex.n_excluded
       |FROM r JOIN ex USING (qid)
       |WHERE r.rk <= 10
       |ORDER BY qid, rk""".stripMargin

  /** q234 oracle: the bit-exact XXH64 doc split + q103's per-stream
    * packing algebra over the (split, lang) key. */
  private val q234OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |sp AS (SELECT doc_id,
       |         CASE WHEN ((${tos("h8")} % 10) + 10) % 10 < 8 THEN 'train'
       |              WHEN ((${tos("h8")} % 10) + 10) % 10 = 8 THEN 'val'
       |              ELSE 'test' END AS split
       |       FROM s10),
       |t AS (
       |  SELECT sp.split, d.lang, d.doc_id,
       |         CAST(len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
       |  FROM documents d JOIN sp USING (doc_id)),
       |c AS (
       |  SELECT split, lang, doc_id, n_tokens,
       |         SUM(n_tokens) OVER (PARTITION BY split, lang ORDER BY doc_id) AS cum
       |  FROM t WHERE n_tokens > 0)
       |SELECT split, lang, doc_id, n_tokens,
       |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
       |       CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
       |       CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset,
       |       CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
       |FROM c ORDER BY split, lang, doc_id""".stripMargin
  }

  /** q141 oracle: the full XXH64 chain → signed key, shard = mod 8,
    * in-shard rank by (key, doc_id). */
  private val q141OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |k AS (SELECT doc_id, ${tos("h8")} AS shuffle_key FROM s10),
       |sh AS (SELECT doc_id, shuffle_key,
       |              CAST(((shuffle_key % 8) + 8) % 8 AS BIGINT) AS shard
       |       FROM k)
       |SELECT doc_id, shuffle_key, shard,
       |       CAST(row_number() OVER (PARTITION BY shard
       |                               ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
       |FROM sh ORDER BY shard, pos""".stripMargin
  }

  /** Shared CTE chain for the hybrid-retrieval oracles (q152/q173):
    * the q145 BM25 chain at kLex=20 composed with the q46-proven
    * cosine replay (list_inner_product == Spark's sequential
    * zip_with/aggregate fold) against each query's rank-1 anchor;
    * ends in `cos(qid, doc_id, anchor_id, bm25_ppb, lex_rk, cos)`. */
  /** The BM25 ranking prefix alone (through `lex(qid, doc_id,
    * score_ppb, lrk)`) — shared by the hybrid chain and the
    * retrieval-metrics oracle (q180). */
  private val bm25LexCtes: String =
    s"""q(qid, w) AS (
       |  VALUES (0, 'hash'), (0, 'join'), (1, 'table'), (1, 'scan'),
       |         (2, 'stream'), (2, 'filter')),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       |       WHERE w IN (SELECT w FROM q) GROUP BY doc_id, w),
       |dfw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
       |dl AS (SELECT doc_id,
       |              CAST(len(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS BIGINT) AS dl
       |       FROM documents),
       |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
       |sc AS (SELECT q.qid, tf.doc_id,
       |              CAST(floor((((nn - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
       |                    (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (CAST(sumdl AS DOUBLE) / nn))))
       |                   * 1000000000.0) AS BIGINT) AS score_t_ppb
       |       FROM tf JOIN q USING (w) JOIN dfw USING (w) JOIN dl USING (doc_id) CROSS JOIN c),
       |pd AS (SELECT qid, doc_id, CAST(SUM(score_t_ppb) AS BIGINT) AS score_ppb
       |       FROM sc GROUP BY qid, doc_id),
       |lex AS (SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_ppb,
       |               CAST(row_number() OVER (PARTITION BY qid ORDER BY score_ppb DESC, doc_id) AS BIGINT) AS lrk
       |        FROM pd)""".stripMargin

  private val hybridCosCtes: String =
    s"""$bm25LexCtes,
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
       |      FROM embeddings),
       |anc AS (SELECT lex.qid, lex.doc_id AS anchor_id, v.e AS ae, v.norm AS anorm
       |        FROM lex JOIN v ON lex.doc_id = v.vec_id WHERE lrk = 1),
       |cand AS (SELECT lex.qid, lex.doc_id, lex.score_ppb AS bm25_ppb, lex.lrk AS lex_rk, v.e, v.norm
       |         FROM lex JOIN v ON lex.doc_id = v.vec_id
       |         WHERE lrk > 1 AND lrk <= 20),
       |cos AS (SELECT cand.qid, cand.doc_id, anc.anchor_id, cand.bm25_ppb, cand.lex_rk,
       |               list_inner_product(anc.ae, cand.e) / (anc.anorm * cand.norm) AS cos
       |        FROM cand JOIN anc ON cand.qid = anc.qid)""".stripMargin

  /** q152 oracle: rerank rows 2..20 by (cos DESC, doc_id), keep 10. */
  private val q152OracleSql: String =
    s"""WITH $hybridCosCtes,
       |rr AS (SELECT qid, doc_id, anchor_id, bm25_ppb, cos,
       |              CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS BIGINT) AS rk
       |       FROM cos)
       |SELECT qid, rk, doc_id, anchor_id, bm25_ppb, cos
       |FROM rr WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** q173 oracle: reciprocal-rank fusion of the lexical rank and the
    * in-candidate cosine rank — two IEEE divisions summed in fixed
    * order, no transcendentals. */
  private val q173OracleSql: String =
    s"""WITH $hybridCosCtes,
       |cr AS (SELECT qid, doc_id, lex_rk, cos,
       |              CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, doc_id) AS BIGINT) AS cos_rk
       |       FROM cos),
       |f AS (SELECT qid, doc_id, lex_rk, cos_rk,
       |             1.0 / (60.0 + lex_rk) + 1.0 / (60.0 + cos_rk) AS rrf
       |      FROM cr),
       |r AS (SELECT qid, doc_id, lex_rk, cos_rk, rrf,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk
       |      FROM f)
       |SELECT qid, rk, doc_id, lex_rk, cos_rk, rrf
       |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** q180 oracle: boolean-AND relevance (a doc is relevant iff it
    * contains every query term) joined against the BM25 top-10 —
    * recall@10 and the first-relevant reciprocal rank, exact counts,
    * one display division each. */
  private val q180OracleSql: String =
    s"""WITH $bm25LexCtes,
       |nq AS (SELECT qid, CAST(COUNT(DISTINCT w) AS BIGINT) AS n_q FROM q GROUP BY qid),
       |rel AS (SELECT q.qid, tf.doc_id
       |        FROM tf JOIN q USING (w) JOIN nq USING (qid)
       |        GROUP BY q.qid, tf.doc_id, n_q
       |        HAVING CAST(COUNT(*) AS BIGINT) = n_q),
       |rk AS (SELECT qid, doc_id, lrk FROM lex WHERE lrk <= 10),
       |nrel AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY qid),
       |hits AS (SELECT rk.qid, CAST(COUNT(*) AS BIGINT) AS hits_at_k,
       |                CAST(MIN(lrk) AS BIGINT) AS frk
       |         FROM rk JOIN rel ON rel.qid = rk.qid AND rel.doc_id = rk.doc_id
       |         GROUP BY rk.qid)
       |SELECT CAST(nrel.qid AS BIGINT) AS qid, n_rel,
       |       COALESCE(hits_at_k, 0) AS hits_at_k,
       |       CAST(COALESCE(hits_at_k, 0) AS DOUBLE) / n_rel AS recall_at_k,
       |       COALESCE(1.0 / frk, 0.0) AS reciprocal_rank
       |FROM nrel LEFT JOIN hits ON hits.qid = nrel.qid
       |ORDER BY qid""".stripMargin

  /** q151 oracle: replay the payload-window pHash
    * ([[graft.engine.MultimodalOps.phashStub]]) per doc in DuckDB —
    * UTF-8 bytes via the q49 hex fold, window-vs-total comparison as
    * exact integer cross-multiplication (no doubles anywhere) — then
    * brute-force all pairs at hamming <= 7. Equivalent to the banded
    * Spark plan because pigeonhole recall is exact for
    * maxHamming <= bands-1 and no fixture bucket hits the cap. */
  private val q151OracleSql: String = {
    val pows = (0 until 64).map(d => BigInt(1) << d).mkString("[", ", ", "]")
    s"""WITH b AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |byt AS (SELECT media_id, n, $hexBytesSql AS bytes FROM b),
       |t AS (SELECT media_id, n, bytes,
       |             CAST(list_sum(bytes) AS BIGINT) AS total FROM byt),
       |p AS (
       |  SELECT media_id,
       |    CAST(list_sum(list_transform(range(0, 64), d ->
       |      CASE WHEN (d+1)*n//64 > d*n//64
       |            AND CAST(list_sum(list_slice(bytes, CAST(d*n//64 + 1 AS INT),
       |                                         CAST((d+1)*n//64 AS INT))) AS BIGINT) * n
       |                > total * ((d+1)*n//64 - d*n//64)
       |           THEN ($pows)[CAST(d + 1 AS INT)] ELSE 0 END)) AS HUGEINT) AS uh
       |  FROM t),
       |s AS (SELECT media_id, $toSignedSql AS ph FROM p),
       |pr AS (
       |  SELECT a.media_id AS media_i, b.media_id AS media_j,
       |         CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       |  FROM s a JOIN s b ON a.media_id < b.media_id)
       |SELECT media_i, media_j, hamming FROM pr
       |WHERE hamming <= 7 ORDER BY media_i, media_j""".stripMargin
  }

  /** q150 oracle: same hash, smallest-k rank per REGISTERED DOMAIN of
    * the synthesized url (q149's derivation inlined). */
  private val q150OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |k AS (SELECT doc_id, ${tos("h8")} AS sample_key FROM s10),
       |u AS (SELECT d.doc_id, k.sample_key,
       |             'https://' || (['www','cdn','blog'])[CAST(d.doc_id % 3 AS INT) + 1]
       |               || '.' || d.source || '.example/' || d.lang || '/' || d.doc_id AS url
       |      FROM documents d JOIN k ON d.doc_id = k.doc_id),
       |h AS (SELECT doc_id, sample_key,
       |             regexp_extract(url, '^https?://([^/]+)', 1) AS host
       |      FROM u),
       |r AS (SELECT regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
       |             doc_id, host, sample_key,
       |             CAST(row_number() OVER (
       |               PARTITION BY regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
       |               ORDER BY sample_key, doc_id) AS BIGINT) AS rk
       |      FROM h)
       |SELECT domain, rk, doc_id, host, sample_key
       |FROM r WHERE rk <= 10 ORDER BY domain, rk""".stripMargin
  }

  /** q142 oracle: same hash, smallest-k rank per source stratum. */
  private val q142OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |k AS (SELECT doc_id, ${tos("h8")} AS sample_key FROM s10),
       |j AS (SELECT d.source, k.doc_id, k.sample_key
       |      FROM k JOIN documents d USING (doc_id)),
       |r AS (SELECT source, doc_id, sample_key,
       |             CAST(row_number() OVER (PARTITION BY source
       |                                     ORDER BY sample_key, doc_id) AS BIGINT) AS rk
       |      FROM j)
       |SELECT source, rk, doc_id, sample_key
       |FROM r WHERE rk <= 10 ORDER BY source, rk""".stripMargin
  }

  /** q201 oracle: the q61 recursive-CTE closure (edges = the capped
    * jaccard pairs at threshold 0.15) → multi-doc clusters → first-two
    * members per cluster → anchors with positives, then the q184 XXH64
    * chain over k = anchor·1000003 + j for the negatives, anti-checked
    * against the closure's label table. */
  private val q201OracleSql: String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    val negChain = chainFrom(
      """SELECT anc.doc_id, anc.cluster_id, anc.positive, jj.j,
        |              CAST(anc.doc_id * 1000003 + jj.j AS HUGEINT) AS k
        |       FROM anc CROSS JOIN (SELECT unnest(range(0, 2)) AS j) jj""".stripMargin,
      "doc_id, cluster_id, positive, j")
    s"""WITH RECURSIVE sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |    FROM documents WHERE doc_id < 60)),
       |n AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |c AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |      FROM sh a JOIN sh b USING (s)
       |      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |p AS (SELECT doc_i, doc_j FROM c
       |      JOIN n ni ON doc_i = ni.doc_id JOIN n nj ON doc_j = nj.doc_id
       |      WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |e AS (SELECT doc_i AS src, doc_j AS dst FROM p
       |      UNION ALL SELECT doc_j, doc_i FROM p),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, COUNT(*) AS nm FROM cl GROUP BY 1),
       |multi AS (SELECT cl.doc_id, cl.cluster_id
       |          FROM cl JOIN sz USING (cluster_id) WHERE nm >= 2),
       |rk AS (SELECT cluster_id, doc_id,
       |              row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) AS rk
       |       FROM multi),
       |f AS (SELECT cluster_id,
       |             MIN(CASE WHEN rk = 1 THEN doc_id END) AS m1,
       |             MIN(CASE WHEN rk = 2 THEN doc_id END) AS m2
       |      FROM rk WHERE rk <= 2 GROUP BY 1),
       |anc AS (SELECT multi.doc_id, multi.cluster_id,
       |               CASE WHEN multi.doc_id = f.m1 THEN f.m2 ELSE f.m1 END AS positive
       |        FROM multi JOIN f USING (cluster_id)),
       |$negChain,
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |neg AS (SELECT doc_id, cluster_id, positive, j,
       |               ((${tos("h8")} % n) + n) % n AS neg_id
       |        FROM s10 CROSS JOIN nn),
       |chk AS (SELECT neg.*, c2.cluster_id AS neg_cluster
       |        FROM neg LEFT JOIN cl c2 ON c2.doc_id = neg.neg_id)
       |SELECT doc_id AS anchor_id, positive AS positive_id,
       |       CAST(j AS BIGINT) AS j, CAST(neg_id AS BIGINT) AS neg_id
       |FROM chk WHERE neg_cluster IS NULL OR neg_cluster <> cluster_id
       |ORDER BY anchor_id, j""".stripMargin
  }

  /** q197 oracle: distinct (source, word) → 32-bit md5-prefix word
    * key, lane keys wh·128+lane through the XXH64 chain, per-lane
    * signed MIN is the signature, pair agreement rate / lanes. */
  private val q197OracleSql: String = {
    import Xxh64DocIdSql.{chainFrom, tos}
    val dCte =
      """SELECT w.source, lane.lane, CAST(w.wh * 128 + lane.lane AS HUGEINT) AS k
        |       FROM (SELECT DISTINCT source,
        |                    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS wh
        |             FROM (SELECT source,
        |                          unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS tok
        |                   FROM documents)) w
        |       CROSS JOIN (SELECT unnest(range(0, 64)) AS lane) lane""".stripMargin
    s"""WITH ${chainFrom(dCte, "source, lane")},
       |sig AS (SELECT source, lane, MIN(${tos("h8")}) AS sig FROM s10 GROUP BY 1, 2),
       |p AS (SELECT a.source AS source_a, b.source AS source_b,
       |             CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END AS m
       |      FROM sig a JOIN sig b ON a.lane = b.lane AND a.source < b.source)
       |SELECT source_a, source_b, CAST(SUM(m) AS BIGINT) AS n_agree,
       |       (CAST(SUM(m) AS DOUBLE) / 64) AS est_jaccard
       |FROM p GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin
  }

  /** q220 oracle: the q40 keeper, q61 closure, q114 verdict and q62
    * contamination fragments composed into 5 stage rollups + a 5-row
    * attrition window. */
  /** The q91 pipeline's stage CTEs (pieces + survivor sets ek/nk/gk/dk)
    * shared verbatim by the q220 funnel and its license-gated q257
    * extension — one SQL text keeps the stage-for-stage reconciliation
    * claim from drifting. */
  private val q220FunnelCtes: String =
    s"""WITH RECURSIVE pieces AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_toks
       |  FROM documents),
       |ek AS (SELECT doc_id FROM (
       |         SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
       |         FROM documents)
       |       WHERE doc_id = keeper),
       |sh AS (SELECT DISTINCT doc_id, s FROM (
       |         SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |         FROM documents WHERE doc_id < 60)),
       |nsh AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |cp AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |       FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |pp AS (SELECT doc_i, doc_j FROM cp
       |       JOIN nsh ni ON doc_i = ni.doc_id JOIN nsh nj ON doc_j = nj.doc_id
       |       WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.15),
       |ee AS (SELECT doc_i AS src, doc_j AS dst FROM pp
       |       UNION ALL SELECT doc_j, doc_i FROM pp),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT ee.dst, r.lbl FROM reach r JOIN ee ON ee.src = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
       |nk AS (SELECT ek.doc_id FROM ek JOIN cl ON cl.doc_id = ek.doc_id
       |       WHERE cl.cluster_id = ek.doc_id),
       |t114 AS (SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS tt,
       |                string_split(text, '. ') AS sentences
       |         FROM documents),
       |sig AS (SELECT doc_id,
       |          CAST(len(tt) AS BIGINT) AS n_tokens,
       |          (CAST(len(list_distinct(tt)) AS DOUBLE) / len(tt)) AS distinct_ratio,
       |          (CAST(list_max(list_transform(list_distinct(tt), x -> len(list_filter(tt, y -> y = x)))) AS DOUBLE) / len(tt)) AS top_tok_share,
       |          (CAST(len(sentences) - len(list_distinct(sentences)) AS DOUBLE) / GREATEST(len(sentences), 1)) AS dup_sentence_frac
       |        FROM t114 WHERE len(tt) > 0),
       |vv AS (SELECT d.doc_id,
       |         CASE WHEN COALESCE(s.n_tokens, 0) < 5 THEN 'too_short'
       |              WHEN s.dup_sentence_frac > 0.30 THEN 'dup_sentences'
       |              WHEN s.top_tok_share > 0.20 THEN 'top_token'
       |              WHEN s.distinct_ratio < 0.30 THEN 'low_diversity'
       |              ELSE 'keep' END AS verdict
       |       FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id),
       |gk AS (SELECT nk.doc_id FROM nk JOIN vv ON vv.doc_id = nk.doc_id
       |       WHERE vv.verdict = 'keep'),
       |ngr AS (SELECT DISTINCT doc_id, array_to_string(list_slice(tt, gi, gi + 4), ' ') AS g
       |        FROM (SELECT doc_id, tt, unnest(range(1, len(tt) - 3)) AS gi
       |              FROM t114 WHERE len(tt) >= 5)),
       |hg AS (SELECT DISTINCT g FROM ngr WHERE doc_id < 50),
       |flg AS (SELECT doc_id FROM (
       |          SELECT doc_id, COUNT(*) AS n_shared FROM ngr JOIN hg USING (g)
       |          WHERE doc_id >= 50 GROUP BY doc_id)
       |        WHERE n_shared >= 5),
       |dk AS (SELECT doc_id FROM gk WHERE doc_id NOT IN (SELECT doc_id FROM flg))""".stripMargin

  /** Shared stage-pricing SQL fragment: stages 0–4 of the funnel. */
  private val q220StageRows: String =
    s"""  SELECT 0 AS stage, 'input' AS stage_name,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM documents JOIN pieces USING (doc_id)
       |  UNION ALL
       |  SELECT 1, 'exact_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
       |  FROM ek JOIN pieces USING (doc_id)
       |  UNION ALL
       |  SELECT 2, 'near_dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
       |  FROM nk JOIN pieces USING (doc_id)
       |  UNION ALL
       |  SELECT 3, 'quality_gate', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
       |  FROM gk JOIN pieces USING (doc_id)
       |  UNION ALL
       |  SELECT 4, 'decontam', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
       |  FROM dk JOIN pieces USING (doc_id)""".stripMargin

  private val q220FunnelSelect: String =
    s"""SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
       |       CAST(COALESCE(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0) AS BIGINT) AS n_dropped
       |FROM st ORDER BY stage""".stripMargin

  private val q220OracleSql: String =
    s"""$q220FunnelCtes,
       |st AS (
       |$q220StageRows)
       |$q220FunnelSelect""".stripMargin

  /** The source→(license, verdict) registry rule, shared by the q257
    * and q258 oracles (mirrors CorpusOps.sourceLicenseDim). */
  private val licenseDimCte: String =
    s"""ld AS (
       |  SELECT source,
       |         CASE CAST(coalesce(nullif(regexp_extract(source, '([0-9]+)$$', 1), ''), '0') AS BIGINT) % 4
       |           WHEN 0 THEN 'cc-by' WHEN 1 THEN 'public-domain'
       |           WHEN 2 THEN 'proprietary' ELSE 'unknown' END AS license
       |  FROM (SELECT DISTINCT source FROM documents)),
       |ldv AS (
       |  SELECT source, license,
       |         CASE license WHEN 'proprietary' THEN 'deny'
       |              WHEN 'unknown' THEN 'review' ELSE 'allow' END AS verdict
       |  FROM ld)""".stripMargin

  private val q257OracleSql: String =
    s"""$q220FunnelCtes,
       |$licenseDimCte,
       |lk AS (
       |  SELECT dk.doc_id FROM dk JOIN documents USING (doc_id)
       |  JOIN ldv USING (source) WHERE verdict = 'allow'),
       |st AS (
       |$q220StageRows
       |  UNION ALL
       |  SELECT 5, 'license_gate', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_toks) AS BIGINT)
       |  FROM lk JOIN pieces USING (doc_id))
       |$q220FunnelSelect""".stripMargin

  /** q247 oracle — the incremental ingest funnel replayed stage by
    * stage: batch-internal exact keeper + stored-fingerprint
    * anti-membership, the q114 gate verdict over the batch, and the
    * FULL q109 near-dup probe embedded as a subquery (its own WITH
    * chain replays the minhash/band arithmetic bit-exact, bucket caps
    * included — which is why the engine computes verdicts for the
    * full batch before intersecting). */
  private def q247OracleSql: String =
    s"""WITH $q247FunnelCtes,
       |st AS (
       |$q247StageRows)
       |$q247FunnelSelect""".stripMargin

  /** q262 oracle — the q247 chain verbatim plus the license stage:
    * near-dup survivors semi-joined to allow-verdict sources (the
    * q257/q258 registry CTE). Sharing the CTE text keeps the q247 ≡
    * q262-stages-0-3 claim from drifting. */
  private def q262OracleSql: String =
    s"""WITH $q247FunnelCtes,
       |$licenseDimCte,
       |lik AS (
       |  SELECT ndk.doc_id FROM ndk JOIN documents USING (doc_id)
       |  JOIN ldv USING (source) WHERE verdict = 'allow'),
       |st AS (
       |$q247StageRows
       |  UNION ALL
       |  SELECT 4, 'license_gate', CAST(COUNT(*) AS BIGINT),
       |         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT)
       |  FROM lik JOIN pieces USING (doc_id))
       |$q247FunnelSelect""".stripMargin

  private def q247FunnelCtes: String =
    s"""pieces AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_toks
       |  FROM documents WHERE doc_id >= 450),
       |bek AS (SELECT doc_id FROM (
       |          SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper,
       |                 md5(text) AS fp
       |          FROM documents WHERE doc_id >= 450)
       |        WHERE doc_id = keeper
       |          AND fp NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 450)),
       |t114 AS (SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS tt,
       |                string_split(text, '. ') AS sentences
       |         FROM documents WHERE doc_id >= 450),
       |sig AS (SELECT doc_id, CAST(len(tt) AS BIGINT) AS n_tokens,
       |          (CAST(len(list_distinct(tt)) AS DOUBLE) / len(tt)) AS distinct_ratio,
       |          (CAST(list_max(list_transform(list_distinct(tt), x -> len(list_filter(tt, y -> y = x)))) AS DOUBLE) / len(tt)) AS top_tok_share,
       |          (CAST(len(sentences) - len(list_distinct(sentences)) AS DOUBLE) / GREATEST(len(sentences), 1)) AS dup_sentence_frac
       |        FROM t114 WHERE len(tt) > 0),
       |vv AS (SELECT d.doc_id,
       |         CASE WHEN COALESCE(s.n_tokens, 0) < 5 THEN 'too_short'
       |              WHEN s.dup_sentence_frac > 0.30 THEN 'dup_sentences'
       |              WHEN s.top_tok_share > 0.20 THEN 'top_token'
       |              WHEN s.distinct_ratio < 0.30 THEN 'low_diversity'
       |              ELSE 'keep' END AS verdict
       |       FROM (SELECT doc_id FROM documents WHERE doc_id >= 450) d
       |       LEFT JOIN sig s ON d.doc_id = s.doc_id),
       |gk AS (SELECT bek.doc_id FROM bek JOIN vv ON vv.doc_id = bek.doc_id
       |       WHERE vv.verdict = 'keep'),
       |nd AS (SELECT doc_id FROM ($q109OracleSql) WHERE kept),
       |ndk AS (SELECT gk.doc_id FROM gk JOIN nd ON nd.doc_id = gk.doc_id)""".stripMargin

  private val q247StageRows: String =
    """  SELECT 0 AS stage, 'input' AS stage_name,
      |         CAST(COUNT(*) AS BIGINT) AS n_docs,
      |         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens
      |  FROM pieces
      |  UNION ALL
      |  SELECT 1, 'exact_vs_stored', CAST(COUNT(*) AS BIGINT),
      |         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT)
      |  FROM bek JOIN pieces USING (doc_id)
      |  UNION ALL
      |  SELECT 2, 'quality_gate', CAST(COUNT(*) AS BIGINT),
      |         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT)
      |  FROM gk JOIN pieces USING (doc_id)
      |  UNION ALL
      |  SELECT 3, 'near_dup_vs_stored', CAST(COUNT(*) AS BIGINT),
      |         CAST(COALESCE(SUM(n_toks), 0) AS BIGINT)
      |  FROM ndk JOIN pieces USING (doc_id)""".stripMargin

  private val q247FunnelSelect: String =
    """SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
      |       CAST(COALESCE(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0) AS BIGINT) AS n_dropped
      |FROM st ORDER BY stage""".stripMargin

  /** q218 oracle: the q154 url synthesis + canonicalization CTEs
    * joined to the q94 XXH64 split buckets; HAVING keeps only groups
    * spanning ≥2 splits. */
  private val q218OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH u AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 4 AS INT)
       |      WHEN 0 THEN 'HTTPS://WWW.SRC' || ((doc_id // 2) % 20) || '.EXAMPLE/page/' || (doc_id // 2)
       |      WHEN 1 THEN 'https://www.src' || ((doc_id // 2) % 20) || '.example/page/' || (doc_id // 2) || '?utm_source=feed'
       |      WHEN 2 THEN 'https://www.src' || ((doc_id // 2) % 20) || '.example/page/' || (doc_id // 2) || '#section-2'
       |      ELSE 'https://www.src' || ((doc_id // 2) % 20) || '.example/page/' || (doc_id // 2) || '/'
       |    END AS url
       |  FROM documents),
       |c1 AS (SELECT doc_id,
       |              regexp_replace(regexp_replace(regexp_replace(url,
       |                '#.*$$', '', 'g'),
       |                'utm_[A-Za-z]+=[^&#]*&', '', 'g'),
       |                '[?&]utm_[A-Za-z]+=[^&#]*', '', 'g') AS a
       |       FROM u),
       |c2 AS (SELECT doc_id,
       |              lower(regexp_extract(a, '^([A-Za-z]+://[^/]*)', 1))
       |                || substr(a, len(regexp_extract(a, '^([A-Za-z]+://[^/]*)', 1)) + 1) AS b
       |       FROM c1),
       |c3 AS (SELECT doc_id,
       |              CASE WHEN regexp_matches(b, '://[^/]+/.+/$$')
       |                   THEN substr(b, 1, len(b) - 1) ELSE b END AS canon_url
       |       FROM c2),
       |$ctes,
       |sp AS (SELECT doc_id,
       |              CASE WHEN bk < 8 THEN 'train' WHEN bk = 8 THEN 'val'
       |                   ELSE 'test' END AS split
       |       FROM (SELECT doc_id, ((${tos("h8")} % 10) + 10) % 10 AS bk FROM s10))
       |SELECT c3.canon_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
       |       MIN(split) AS split_lo, MAX(split) AS split_hi
       |FROM c3 JOIN sp USING (doc_id)
       |GROUP BY canon_url HAVING COUNT(DISTINCT split) >= 2
       |ORDER BY canon_url""".stripMargin
  }

  /** q195 oracle: XXH64 chain → u folded onto [0, 2⁶²), priority =
    * u // max(n_chars, 1), k smallest per source. (2⁶²−1) + 2⁶² is
    * exactly BIGINT max, so the sign-fold stays in 64-bit. */
  private val q195OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |k AS (SELECT doc_id,
       |             ((${tos("h8")} % 4611686018427387904) + 4611686018427387904)
       |               % 4611686018427387904 AS u
       |      FROM s10),
       |p AS (SELECT d.source, k.doc_id, GREATEST(d.n_chars, 1) AS weight,
       |             k.u // GREATEST(d.n_chars, 1) AS priority
       |      FROM k JOIN documents d USING (doc_id)),
       |r AS (SELECT source, doc_id, weight, priority,
       |             CAST(row_number() OVER (PARTITION BY source
       |                                     ORDER BY priority, doc_id) AS BIGINT) AS rk
       |      FROM p)
       |SELECT source, rk, doc_id, CAST(weight AS BIGINT) AS weight,
       |       CAST(priority AS BIGINT) AS priority
       |FROM r WHERE rk <= 8 ORDER BY source, rk""".stripMargin
  }

  private val q94OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |buck AS (SELECT doc_id, ((${tos("h8")} % 10) + 10) % 10 AS bucket FROM s10),
       |sp AS (SELECT doc_id,
       |         CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
       |              ELSE 'test' END AS split
       |       FROM buck)
       |SELECT split, COUNT(*) AS n_docs FROM sp GROUP BY split ORDER BY split""".stripMargin
  }

  /** q122 oracle: the same xxhash64 split as q94, then per-doc
    * distinct word 5-grams, the per-split gram dictionary, and the
    * ordered-pair leak/overlap counts with zero rows preserved. */
  private val q122OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |sp AS (SELECT doc_id,
       |         CASE WHEN ((${tos("h8")} % 10) + 10) % 10 < 8 THEN 'train'
       |              WHEN ((${tos("h8")} % 10) + 10) % 10 = 8 THEN 'val'
       |              ELSE 'test' END AS split
       |       FROM s10),
       |tok AS (SELECT d.doc_id, sp.split, regexp_extract_all(lower(d.text), '[A-Za-z0-9_]+') AS t
       |        FROM documents d JOIN sp USING (doc_id)),
       |g AS (SELECT DISTINCT doc_id, split, array_to_string(list_slice(t, gi, gi + 4), ' ') AS gram
       |      FROM (SELECT doc_id, split, t, unnest(range(1, len(t) - 3)) AS gi
       |            FROM tok WHERE len(t) >= 5)),
       |gs AS (SELECT DISTINCT split, gram FROM g),
       |tot AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs_a FROM sp GROUP BY split),
       |frame AS (SELECT a.split AS split_a, a.n_docs_a, b.split AS split_b
       |          FROM tot a CROSS JOIN tot b WHERE a.split <> b.split),
       |cont AS (SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_docs_contaminated
       |         FROM (SELECT DISTINCT g.split AS split_a, gs.split AS split_b, g.doc_id
       |               FROM g JOIN gs ON g.gram = gs.gram AND g.split <> gs.split)
       |         GROUP BY 1, 2),
       |shg AS (SELECT a.split AS split_a, b.split AS split_b,
       |               CAST(COUNT(*) AS BIGINT) AS n_shared_grams
       |        FROM gs a JOIN gs b ON a.gram = b.gram AND a.split <> b.split
       |        GROUP BY 1, 2)
       |SELECT f.split_a, f.split_b, f.n_docs_a,
       |       COALESCE(c.n_docs_contaminated, 0) AS n_docs_contaminated,
       |       COALESCE(s.n_shared_grams, 0) AS n_shared_grams,
       |       (CAST(COALESCE(c.n_docs_contaminated, 0) AS DOUBLE) / f.n_docs_a) AS contam_frac
       |FROM frame f LEFT JOIN cont c ON f.split_a = c.split_a AND f.split_b = c.split_b
       |             LEFT JOIN shg s ON f.split_a = s.split_a AND f.split_b = s.split_b
       |ORDER BY f.split_a, f.split_b""".stripMargin
  }

  /** q104 oracle: mixing replays the same xxhash64 chain — u =
    * pmod(h, 10^6)/10^6, n_copies = ⌊w⌋ + (u < frac(w)), one row per
    * (doc, epoch). The example weights are exact binary fractions, so
    * the frac(w) comparison carries no FP drift across engines. */
  private val q104OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |u AS (SELECT doc_id,
       |        CAST(((${tos("h8")} % 1000000) + 1000000) % 1000000 AS DOUBLE) / 1000000.0 AS u
       |      FROM s10),
       |m AS (SELECT dd.doc_id, dd.lang, dd.source,
       |        CASE dd.source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.5
       |                       WHEN 'src2' THEN 2.0 WHEN 'src3' THEN 2.25
       |                       ELSE 1.0 END AS w,
       |        u.u
       |      FROM documents dd JOIN u USING (doc_id)),
       |n AS (SELECT doc_id, lang, source,
       |        CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |      FROM m)
       |SELECT doc_id, lang, source, n_copies,
       |       CAST(unnest(range(0, n_copies)) AS BIGINT) AS epoch
       |FROM n WHERE n_copies > 0
       |ORDER BY doc_id, epoch""".stripMargin
  }

  /** q117 oracle: the q104 mix chain (xxhash64 fate replica) composed
    * with the q103 pack arithmetic, ordered by (doc_id, epoch) within
    * each lang stream — the total order that keeps up-sampled copies
    * from becoming window peers. */
  private val q117OracleSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""WITH $ctes,
       |u AS (SELECT doc_id,
       |        CAST(((${tos("h8")} % 1000000) + 1000000) % 1000000 AS DOUBLE) / 1000000.0 AS u
       |      FROM s10),
       |m AS (SELECT dd.doc_id, dd.lang,
       |        CASE dd.source WHEN 'src0' THEN 0.0 WHEN 'src1' THEN 0.5
       |                       WHEN 'src2' THEN 2.0 WHEN 'src3' THEN 2.25
       |                       ELSE 1.0 END AS w,
       |        u.u
       |      FROM documents dd JOIN u USING (doc_id)),
       |n AS (SELECT doc_id, lang,
       |        CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
       |      FROM m),
       |e AS (SELECT doc_id, lang,
       |        CAST(unnest(range(0, n_copies)) AS BIGINT) AS epoch
       |      FROM n WHERE n_copies > 0),
       |tk AS (SELECT doc_id,
       |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
       |       FROM documents),
       |j AS (SELECT e.lang, e.doc_id, e.epoch, tk.n_tokens
       |      FROM e JOIN tk USING (doc_id) WHERE tk.n_tokens > 0),
       |c AS (SELECT lang, doc_id, epoch, n_tokens,
       |        SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id, epoch) AS cum
       |      FROM j)
       |SELECT lang, doc_id, epoch, n_tokens,
       |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
       |       CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
       |       CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset,
       |       CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_seqs
       |FROM c ORDER BY lang, doc_id, epoch""".stripMargin
  }

  /** q42 oracle: the whole MinHash+LSH chain is deterministic, so it
    * is SQL-expressible end-to-end — XXH64(seed 42) over each distinct
    * 5-char shingle's UTF-8 bytes (the [[graft.functions.ShingleHashes]]
    * contract: a char substring IS a byte slice), splitmix64 lane
    * values mix64(h ^ seed_i) with seed_i = mix64(golden·(i+1))
    * ([[graft.functions.MinHashPack]]), SIGNED min per lane, then
    * Spark's array-xxhash64 band fold (per element: one XXH64.hashLong
    * step INCLUDING its final avalanche, previous hash as seed).
    *
    * Arithmetic runs in DuckDB UBIGINT (native xor / `>>`); the only
    * ops UBIGINT lacks are wrapping multiply (64×64 split at 32 bits
    * through HUGEINT — intermediates < 2^97) and `<<` (DuckDB
    * range-checks shifts, so `x << r` is the same HUGEINT multiply by
    * 2^r). DuckDB gives `|`/`>>` EQUAL precedence, left-associative
    * (PostgreSQL operator rules), so every rotl keeps explicit parens.
    * Each mix step is its own nested subquery — lateral column aliases
    * re-expand the referenced expression per use (the 3-reference
    * multiply made the chain exponential); nesting keeps it linear.
    * The chain runs once per DISTINCT shingle (~2k at sf0.01, not the
    * ~150k windows) and once per DISTINCT shingle-hash × 32 lanes,
    * then joins back to (doc, shingle) pairs for the per-doc lane min.
    * Validated bit-exact against the Spark dump at sf0.01 (578 pairs,
    * 0 mismatches).
    *
    * q73 reuses the same CTE chain: candidates at est_jaccard >= 0.25
    * (the [[graft.engine.DedupOps.verifiedJaccardPairsFromShared]]
    * prefilter — exact on the rounded column because m/32 is dyadic),
    * exact Jaccard from the (doc_id, h) distinct-shingle-hash sets the
    * chain already materializes (`shh`), kept at >= 0.5.
    *
    * q43 runs the SAME XXH64 byte chain per DISTINCT token
    * (`[a-z0-9_]+` of lower(text) — identical classes in Java regex
    * and RE2; the corpus is pure ASCII so lower() agrees too), then
    * the [[graft.functions.SimHashPack]] vote: per (doc, bit), sum
    * cnt·(bit set ? +1 : −1) over the doc's tokens, bit set iff the
    * sum is positive; 16-bit prefix bands bucket the self-join and
    * bit_count(xor) is the hamming filter. q70 is the union of the
    * two pair sets (est >= 0.5 / hamming <= 3) closed under the q61
    * recursive-CTE connected components. All four validated bit-exact
    * against the Spark dumps at sf0.01 (578 / 17 / 473 / 25 rows). */
  /** Shared UBIGINT-arithmetic SQL builders for the hash-chain oracles
    * (q42/q43/q70/q73 sketches, q17 HLL++): wrapping 64×64 multiply
    * split at 32 bits through HUGEINT, rotate-left as multiply+shift
    * (DuckDB range-checks `<<`), signed/unsigned reinterpretation, and
    * the one-column-per-nested-subquery chain builder (lateral column
    * aliases re-expand the referenced expression per use — the
    * 3-reference multiply made alias chains exponential). */
  private object UbigintSql {
    val M64 = "18446744073709551616"
    def U(c: String) = s"CAST($c AS UBIGINT)"
    val p1 = U("11400714785074694791")
    val p2 = U("14029467366897019727")
    val p3 = U("1609587929392839161")
    val p5 = U("2870177450012600261")
    val c1 = U("13787848793156543929") // 0xBF58476D1CE4E5B9
    val c2 = U("10723151780598845931") // 0x94D049BB133111EB
    val gold = "11400714819323198485"  // 0x9E3779B97F4A7C15
    def mul(a: String, b: String) =
      s"CAST((((CAST($a AS HUGEINT)//4294967296*CAST($b AS HUGEINT))%4294967296)*4294967296" +
        s" + CAST($a AS HUGEINT)%4294967296*CAST($b AS HUGEINT)) % $M64 AS UBIGINT)"
    def rotl(x: String, r: Int) =
      s"((${mul(s"($x)", U((1L << r).toString))}) | (($x) >> ${64 - r}))"
    def xr(a: String, b: String) = s"xor($a, $b)"
    def shr(x: String, n: Int) = s"(($x) >> $n)"
    def toS(x: String) =
      s"CAST(CAST($x AS HUGEINT) - (CASE WHEN ($x) >= ${U("9223372036854775808")}" +
        s" THEN CAST($M64 AS HUGEINT) ELSE 0 END) AS BIGINT)"
    def toU(x: String) =
      s"CAST(CAST($x AS HUGEINT) + (CASE WHEN ($x) < 0" +
        s" THEN CAST($M64 AS HUGEINT) ELSE 0 END) AS UBIGINT)"
    def plus(a: String, lit: String) =
      s"CAST((CAST($a AS HUGEINT) + $lit) % $M64 AS UBIGINT)"
    // one XXH64.hashLong avalanche (h ^= h>>33; h*=P2; ^= >>29; *=P3; ^= >>32)
    def fmix(h: String, pfx: String): Seq[(String, String)] = Seq(
      (s"${pfx}a", xr(h, shr(h, 33))),
      (s"${pfx}b", mul(s"${pfx}a", p2)),
      (s"${pfx}c", xr(s"${pfx}b", shr(s"${pfx}b", 29))),
      (s"${pfx}d", mul(s"${pfx}c", p3)),
      (s"${pfx}e", xr(s"${pfx}d", shr(s"${pfx}d", 32))))
    def nest(base: String, cols: Seq[(String, String)]): String =
      cols.foldLeft(base) { case (q, (n, e)) => s"SELECT *, $e AS $n FROM ($q)" }
  }

  private val (q42OracleSql, q43OracleSql, q70OracleSql, q73OracleSql, q109OracleSql,
               q159OracleSql)
      : (String, String, String, String, String, String) = {
    import UbigintSql._
    def b2w8(off: Int) =
      (0 until 8).map(k => s"bytes[${off + k + 1}]*${BigInt(256).pow(k)}").mkString(" + ")
    def b2w4(offExpr: String) =
      (0 until 4).map(k => s"bytes[CAST($offExpr AS INT)+${k + 1}]*${BigInt(256).pow(k)}").mkString(" + ")

    // XXH64(seed 42) of an n-byte buffer, n in [5, 20]: no 32-byte
    // stripes; up to two 8-byte words, one 4-byte word, <=3 tail bytes.
    val tailCols = (0 until 3).foldLeft((Seq.empty[(String, String)], "hi1")) {
      case ((acc, hPrev), t) =>
        (acc ++ Seq(
          (s"tb$t", s"CASE WHEN n > toff+$t THEN ${U(s"bytes[CAST(toff AS INT)+${t + 1}]")} END"),
          (s"hb$t", s"CASE WHEN n > toff+$t THEN ${xr(hPrev, mul(s"tb$t", p5))} ELSE $hPrev END"),
          (s"ht$t", s"CASE WHEN n > toff+$t THEN ${mul(rotl(s"hb$t", 11), p1)} ELSE hb$t END")),
          s"ht$t")
    }
    val shCols = Seq(
      ("w0", s"CASE WHEN n >= 8 THEN ${U(s"(${b2w8(0)})")} END"),
      ("w1", s"CASE WHEN n >= 16 THEN ${U(s"(${b2w8(8)})")} END"),
      ("h0", U("(2870177450012600303 + n)")), // seed 42 + PRIME64_5, + len n
      ("k10", s"CASE WHEN n >= 8 THEN ${mul(rotl(mul("w0", p2), 31), p1)} END"),
      ("hx0", s"CASE WHEN n >= 8 THEN ${xr("h0", "k10")} ELSE h0 END"),
      ("hw0", s"CASE WHEN n >= 8 THEN ${plus(mul(rotl("hx0", 27), p1), "9650029242287828579")} ELSE hx0 END"),
      ("k11", s"CASE WHEN n >= 16 THEN ${mul(rotl(mul("w1", p2), 31), p1)} END"),
      ("hx1", s"CASE WHEN n >= 16 THEN ${xr("hw0", "k11")} ELSE hw0 END"),
      ("hw1", s"CASE WHEN n >= 16 THEN ${plus(mul(rotl("hx1", 27), p1), "9650029242287828579")} ELSE hx1 END"),
      ("ioff", "(n//8)*8"),
      ("iv", s"CASE WHEN n%8 >= 4 THEN ${U(s"(${b2w4("ioff")})")} END"),
      ("hi0", s"CASE WHEN n%8 >= 4 THEN ${xr("hw1", mul("iv", p1))} ELSE hw1 END"),
      ("hi1", s"CASE WHEN n%8 >= 4 THEN ${plus(mul(rotl("hi0", 23), p2), "1609587929392839161")} ELSE hi0 END"),
      ("toff", "ioff + CASE WHEN n%8 >= 4 THEN 4 ELSE 0 END")) ++
      tailCols._1 ++ fmix(tailCols._2, "fm")

    // splitmix64 lane mix: lv_i = mix64(h ^ seed_i), compared SIGNED
    val mixCols = Seq(
      ("z0", xr("h", "seed")),
      ("z1", plus("z0", gold)),
      ("z2", mul(xr("z1", shr("z1", 30)), c1)),
      ("z3", mul(xr("z2", shr("z2", 27)), c2)),
      ("z4", xr("z3", shr("z3", 31))),
      ("lv", toS("z4")))

    // Spark xxhash64(slice(sig, b*4+1, 4)): fold 4 longs, each a full
    // hashLong step (seed+P5+8; word mix; avalanche), prev hash as seed
    val bandCols = (0 until 4).flatMap { e =>
      val prev = if (e == 0) U("42") else s"g${e - 1}e"
      Seq(
        (s"e$e", toU(s"sig[${e + 1}+b*4]")),
        (s"s$e", plus(prev, "2870177450012600269")), // + PRIME64_5 + len 8
        (s"k$e", mul(rotl(mul(s"e$e", p2), 31), p1)),
        (s"x$e", xr(s"s$e", s"k$e")),
        (s"p$e", plus(mul(rotl(s"x$e", 27), p1), "9650029242287828579"))) ++
        fmix(s"p$e", s"g$e")
    } :+ ("bh", toS("g3e"))

    val seedValues = (0 until 32)
      .map(i => graft.functions.SketchAggs.mix64(0x9E3779B97F4A7C15L * (i + 1)))
      .zipWithIndex
      .map { case (s, i) => s"($i, ${U(java.lang.Long.toUnsignedString(s))})" }
      .mkString(", ")

    val shhInner = nest("SELECT sh, n, bytes FROM byt", shCols)
    val lanesInner = nest(
      "SELECT h, lane, seed FROM (SELECT DISTINCT h FROM shh)," +
        s" (SELECT * FROM (VALUES $seedValues) AS s(lane, seed))", mixCols)
    val bbInner = nest(
      "SELECT doc_id, sig, CAST(b AS INT) AS b FROM sigs, unnest(range(0, 8)) AS t(b)", bandCols)

    val ctes = s"""win AS MATERIALIZED (
       |  SELECT doc_id, substr(text, CAST(i AS INT), 5) AS sh
       |  FROM documents, unnest(range(1, length(text) - 3)) AS t(i)
       |  WHERE length(text) >= 5
       |),
       |dsh AS (
       |  SELECT hex(encode(sh)) AS hx, octet_length(encode(sh)) AS n, sh
       |  FROM (SELECT DISTINCT sh FROM win)
       |),
       |byt AS (
       |  SELECT sh, n, $hexBytesSql AS bytes
       |  FROM dsh
       |),
       |shg AS MATERIALIZED (
       |  SELECT sh, fme AS h FROM ($shhInner)
       |),
       |shh AS MATERIALIZED (
       |  SELECT DISTINCT w.doc_id, g.h FROM win w JOIN shg g USING (sh)
       |),
       |lanevals AS MATERIALIZED (
       |  SELECT h, lane, lv FROM ($lanesInner)
       |),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, list(mn ORDER BY lane) AS sig
       |  FROM (SELECT s.doc_id, v.lane, min(v.lv) AS mn
       |        FROM shh s JOIN lanevals v USING (h) GROUP BY s.doc_id, v.lane)
       |  GROUP BY doc_id
       |),
       |bb AS MATERIALIZED (
       |  SELECT doc_id, b AS band, bh FROM ($bbInner)
       |),
       |capped AS (SELECT band, bh FROM bb GROUP BY band, bh HAVING COUNT(*) <= 10000),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_i, bside.doc_id AS doc_j
       |  FROM (SELECT bb.* FROM bb JOIN capped USING (band, bh)) a
       |  JOIN (SELECT bb.* FROM bb JOIN capped USING (band, bh)) bside
       |    ON a.band = bside.band AND a.bh = bside.bh AND a.doc_id < bside.doc_id
       |),
       |est AS (
       |  SELECT p.doc_i, p.doc_j,
       |    (CAST(length(list_filter(range(1, 33), i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) AS DOUBLE) / 32) AS est_jaccard
       |  FROM pairs p
       |  JOIN sigs sa ON p.doc_i = sa.doc_id
       |  JOIN sigs sb ON p.doc_j = sb.doc_id
       |)""".stripMargin

    val q42 = s"""WITH $ctes
       |SELECT doc_i, doc_j, est_jaccard FROM est ORDER BY doc_i, doc_j""".stripMargin

    val q73 = s"""WITH $ctes,
       |cand AS (SELECT doc_i, doc_j FROM est WHERE est_jaccard >= 0.25),
       |nsh AS (SELECT doc_id, COUNT(*) AS n_sh FROM shh GROUP BY doc_id),
       |it AS (SELECT c.doc_i, c.doc_j, COUNT(*) AS inter
       |       FROM cand c JOIN shh a ON a.doc_id = c.doc_i
       |                   JOIN shh b ON b.doc_id = c.doc_j AND b.h = a.h
       |       GROUP BY 1, 2)
       |SELECT it.doc_i, it.doc_j,
       |  (CAST(inter AS DOUBLE) / (ni.n_sh + nj.n_sh - inter)) AS jaccard
       |FROM it JOIN nsh ni ON it.doc_i = ni.doc_id
       |        JOIN nsh nj ON it.doc_j = nj.doc_id
       |WHERE (CAST(inter AS DOUBLE) / (ni.n_sh + nj.n_sh - inter)) >= 0.5
       |ORDER BY it.doc_i, it.doc_j""".stripMargin

    // SimHash CTE block, name-prefixed so q70 can splice it next to
    // the MinHash block without collisions. The XXH64 chain (shCols)
    // is reused verbatim — tokens are <= 8 bytes here, well inside the
    // chain's n <= 23 coverage (two 8-byte words + int + 3 tail bytes).
    val bitsValues = (0 until 64).map(i =>
      s"($i, ${U(java.lang.Long.toUnsignedString(1L << i))})").mkString(", ")
    def simhashCtes(p: String): String = {
      val tkhInner = nest(s"SELECT tok, n, bytes FROM ${p}byt2", shCols)
      s"""${p}tokw AS MATERIALIZED (
         |  SELECT doc_id, t AS tok
         |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS u(t)
         |),
         |${p}tokc AS MATERIALIZED (
         |  SELECT doc_id, tok, COUNT(*) AS cnt FROM ${p}tokw GROUP BY doc_id, tok
         |),
         |${p}dtok AS (
         |  SELECT hex(encode(tok)) AS hx, octet_length(encode(tok)) AS n, tok
         |  FROM (SELECT DISTINCT tok FROM ${p}tokc)
         |),
         |${p}byt2 AS (
         |  SELECT tok, n, $hexBytesSql AS bytes
         |  FROM ${p}dtok
         |),
         |${p}tkh AS MATERIALIZED (
         |  SELECT tok, fme AS h FROM ($tkhInner)
         |),
         |${p}bits(i, p2) AS (VALUES $bitsValues),
         |${p}hbits AS (
         |  SELECT h, i, p2, CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS v
         |  FROM (SELECT DISTINCT h FROM ${p}tkh), ${p}bits
         |),
         |${p}votes AS (
         |  SELECT c.doc_id, b.i, b.p2, SUM(c.cnt * b.v) AS vs
         |  FROM ${p}tokc c JOIN ${p}tkh t USING (tok) JOIN ${p}hbits b ON b.h = t.h
         |  GROUP BY c.doc_id, b.i, b.p2
         |),
         |${p}sig AS MATERIALIZED (
         |  SELECT doc_id,
         |    CAST(COALESCE(SUM(CASE WHEN vs > 0 THEN CAST(p2 AS HUGEINT) END), 0) AS HUGEINT) AS suh
         |  FROM ${p}votes GROUP BY doc_id
         |),
         |${p}sig2 AS (
         |  SELECT doc_id, CAST(suh AS UBIGINT) AS su,
         |    CAST(suh - (CASE WHEN suh >= CAST(9223372036854775808 AS HUGEINT) THEN CAST($M64 AS HUGEINT) ELSE 0 END) AS BIGINT) AS s
         |  FROM ${p}sig
         |),
         |${p}bb2 AS MATERIALIZED (
         |  SELECT doc_id, CAST(b AS INT) AS band, (su >> (CAST(b AS INT)*16)) & 65535 AS bh, s
         |  FROM ${p}sig2, unnest(range(0, 4)) AS t(b)
         |),
         |${p}capped2 AS (SELECT band, bh FROM ${p}bb2 GROUP BY band, bh HAVING COUNT(*) <= 10000),
         |${p}pairs2 AS (
         |  SELECT a.doc_id AS doc_i, bside.doc_id AS doc_j,
         |         any_value(a.s) AS s_a, any_value(bside.s) AS s_b
         |  FROM (SELECT b1.* FROM ${p}bb2 b1 JOIN ${p}capped2 USING (band, bh)) a
         |  JOIN (SELECT b2.* FROM ${p}bb2 b2 JOIN ${p}capped2 USING (band, bh)) bside
         |    ON a.band = bside.band AND a.bh = bside.bh AND a.doc_id < bside.doc_id
         |  GROUP BY 1, 2
         |),
         |${p}ham AS (
         |  SELECT doc_i, doc_j, CAST(bit_count(xor(s_a, s_b)) AS BIGINT) AS hamming
         |  FROM ${p}pairs2 WHERE bit_count(xor(s_a, s_b)) <= 3
         |)""".stripMargin
    }

    val q43 = s"""WITH ${simhashCtes("")}
       |SELECT doc_i, doc_j, hamming FROM ham ORDER BY doc_i, doc_j""".stripMargin

    val q70 = s"""WITH RECURSIVE $ctes,
       |${simhashCtes("s")},
       |med AS (
       |  SELECT doc_i, doc_j FROM est WHERE est_jaccard >= 0.5
       |  UNION
       |  SELECT doc_i, doc_j FROM sham WHERE hamming <= 3
       |),
       |e AS (SELECT doc_i AS src, doc_j AS dst FROM med UNION ALL SELECT doc_j, doc_i FROM med),
       |reach(node, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
       |SELECT cluster_id AS doc_id, COUNT(*) AS n_members
       |FROM cl GROUP BY cluster_id
       |ORDER BY doc_id""".stripMargin

    // q109: incremental near-dedup — same signature/band CTEs; the
    // candidate join is new-batch × history on (band, bh), each side
    // carrying its own degenerate-bucket cap (mirroring
    // incrementalNearDedupFromSigs' boundBuckets on both frames),
    // then the est-Jaccard verify and a per-new-doc keep/drop rollup.
    val q109 = s"""WITH $ctes,
       |nbb AS (SELECT * FROM bb WHERE doc_id >= 450),
       |obb AS (SELECT * FROM bb WHERE doc_id < 450),
       |ncap AS (SELECT band, bh FROM nbb GROUP BY band, bh HAVING COUNT(*) <= 10000),
       |ocap AS (SELECT band, bh FROM obb GROUP BY band, bh HAVING COUNT(*) <= 10000),
       |cnd AS (
       |  SELECT DISTINCT a.doc_id AS new_id, bside.doc_id AS old_id
       |  FROM (SELECT nbb.* FROM nbb JOIN ncap USING (band, bh)) a
       |  JOIN (SELECT obb.* FROM obb JOIN ocap USING (band, bh)) bside
       |    ON a.band = bside.band AND a.bh = bside.bh),
       |m AS (
       |  SELECT new_id, CAST(COUNT(DISTINCT old_id) AS BIGINT) AS n_dup_of
       |  FROM (SELECT c.new_id, c.old_id,
       |          (CAST(length(list_filter(range(1, 33), i -> sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)])) AS DOUBLE) / 32) AS est
       |        FROM cnd c JOIN sigs sa ON c.new_id = sa.doc_id
       |                   JOIN sigs sb ON c.old_id = sb.doc_id)
       |  WHERE est >= 0.5 GROUP BY new_id)
       |SELECT d.doc_id, COALESCE(m.n_dup_of, 0) AS n_dup_of,
       |       COALESCE(m.n_dup_of, 0) = 0 AS kept
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= 450) d
       |LEFT JOIN m ON d.doc_id = m.new_id
       |ORDER BY d.doc_id""".stripMargin

    // q159: banding calibration over the SAME replayed sigs — bands
    // bucket by lane CONTENT (identical candidate sets to the hashed
    // path), truth is the q61-pattern exact shingle Jaccard at 0.5.
    val q159 = s"""WITH $ctes,
       |cfg AS (SELECT * FROM (VALUES (4, 8), (8, 4), (16, 2)) AS c(bands, width)),
       |banded AS (
       |  SELECT s.doc_id, c.bands, t.b AS band,
       |         list_aggregate(list_transform(
       |           list_slice(s.sig, CAST(t.b*c.width+1 AS INT), CAST((t.b+1)*c.width AS INT)),
       |           x -> CAST(x AS VARCHAR)), 'string_agg', ',') AS key
       |  FROM sigs s, cfg c, unnest(range(0, 16)) AS t(b)
       |  WHERE t.b < c.bands AND s.doc_id < 500),
       |cand AS (SELECT DISTINCT a.bands, a.doc_id AS doc_i, b2.doc_id AS doc_j
       |         FROM banded a JOIN banded b2 ON a.bands = b2.bands
       |           AND a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id),
       |tsh AS (SELECT DISTINCT doc_id, s FROM (
       |  SELECT doc_id, substr(text, unnest(range(1, length(text) - 3)), 5) AS s
       |  FROM documents WHERE doc_id < 500)),
       |tn AS (SELECT doc_id, COUNT(*) AS n_sh FROM tsh GROUP BY doc_id),
       |tcm AS (SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS common
       |        FROM tsh a JOIN tsh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       |truth AS (SELECT doc_i, doc_j FROM tcm
       |          JOIN tn ni ON doc_i = ni.doc_id JOIN tn nj ON doc_j = nj.doc_id
       |          WHERE (CAST(common AS DOUBLE) / (ni.n_sh + nj.n_sh - common)) >= 0.5),
       |tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
       |nc AS (SELECT bands, CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand GROUP BY bands),
       |nh AS (SELECT c.bands, CAST(COUNT(*) AS BIGINT) AS n_hit
       |       FROM cand c JOIN truth USING (doc_i, doc_j) GROUP BY c.bands)
       |SELECT CAST(c.bands AS BIGINT) AS bands, CAST(c.width AS BIGINT) AS width,
       |       COALESCE(n_candidates, 0) AS n_candidates, tc.n_truth,
       |       COALESCE(n_hit, 0) AS n_hit,
       |       CASE WHEN tc.n_truth > 0
       |            THEN (CAST(COALESCE(n_hit, 0) AS DOUBLE) / tc.n_truth) END AS recall,
       |       CASE WHEN COALESCE(n_candidates, 0) > 0
       |            THEN (CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_candidates) END AS precision
       |FROM cfg c LEFT JOIN nc ON c.bands = nc.bands LEFT JOIN nh ON c.bands = nh.bands
       |CROSS JOIN tc ORDER BY bands""".stripMargin

    (q42, q43, q70, q73, q109, q159)
  }

  /** q63 oracle: the SemDeDup pipeline is deterministic end-to-end.
    * The "random" hyperplanes are sign bits of xxhash64(p, pos) —
    * reproduced here by evaluating the SAME XXH64 chain (
    * [[org.apache.spark.sql.catalyst.expressions.XXH64.hashInt]],
    * seed 42, two chained int inputs) at ORACLE-GENERATION time and
    * embedding the ±1 sign rows as list literals (the seedValues
    * pattern). Spark's per-plane projection is a fold over posexploded
    * elements in array order, which is exactly DuckDB's sequential
    * `list_inner_product`; the raw IEEE cosine is the q46-proven
    * pattern; the cluster closure is the q61 recursive CTE. */
  private val q63OracleSql: String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val signs = (0 until 8).map { p =>
      val h1 = XXH64.hashInt(p, 42L)
      (0 until 64).map { d =>
        val h = XXH64.hashInt(d, h1)
        if (((h % 2) + 2) % 2 == 1) "1.0" else "-1.0"
      }.mkString("[", ", ", "]")
    }
    val projTerms = signs.zipWithIndex.map { case (row, p) =>
      s"(CASE WHEN list_inner_product(e, $row) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH RECURSIVE v AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |),
       |vb AS MATERIALIZED (
       |  SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS norm,
       |         $projTerms AS bucket
       |  FROM v
       |),
       |pr AS (
       |  SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
       |         (list_inner_product(a.e, b.e) / (a.norm * b.norm)) AS score
       |  FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |),
       |ed AS (SELECT vec_i, vec_j FROM pr WHERE score >= 0.95),
       |e2 AS (SELECT vec_i AS src, vec_j AS dst FROM ed UNION ALL SELECT vec_j, vec_i FROM ed),
       |reach(node, lbl) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT e2.dst, r.lbl FROM reach r JOIN e2 ON e2.src = r.node),
       |cl AS (SELECT node AS vec_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
       |SELECT vec_id, cluster_id, (vec_id <> cluster_id) AS is_dup FROM cl ORDER BY vec_id""".stripMargin
  }

  /** q17 oracle: Spark's approx_count_distinct IS deterministic — the
    * HLL++ registers are max(rho) over XXH64(value, seed 42) with no
    * randomness, and register max is order-independent, so the whole
    * sketch is reproducible. rsd 0.05 ⇒ p = 9, m = 512, index = the
    * top 9 hash bits, rho = Long.numberOfLeadingZeros((h << 9) | 256)
    * + 1 (so rho <= 56 and the padded word is never 0 — nlz falls out
    * of DuckDB's variable-width `bin()` with NO floating log2). The
    * harmonic sum Σ 2^-rho runs in EXACT HUGEINT fixed-point at scale
    * 2^56, so it does not depend on Spark's register accumulation
    * order; linear counting, the 2.5m/5m switchovers and Math.round =
    * floor(x+0.5) follow the decompiled
    * [[org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper]]
    * query() exactly. The empirical bias correction (binary-search
    * insertion point, 6-wide window walked right while strictly
    * closer, averaged bias) is reproduced with the REAL p=9
    * RAW_ESTIMATE_DATA/BIAS_DATA tables, read reflectively from the
    * running Spark at oracle-generation time and embedded as list
    * literals. Validated bit-exact at sf0.01 and sf0.1 (all three
    * estimates on each). */
  private val q17OracleSql: String = {
    import UbigintSql._
    val helperCls = Class.forName(
      "org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper")
    def table(name: String): Array[Double] = helperCls.getMethod(name)
      .invoke(null).asInstanceOf[Array[Array[Double]]](5) // p - 4 = 5
    val rawList = table("RAW_ESTIMATE_DATA").map(_.toString).mkString("[", ", ", "]")
    val biasList = table("BIAS_DATA").map(_.toString).mkString("[", ", ", "]")
    val n = table("RAW_ESTIMATE_DATA").length // 201
    // alphaM2 in the constructor's exact evaluation order (p > 6 arm)
    val alphaM2 = (0.7213 / (1d + 1.079 / 512d) * 512d * 512d).toString

    // XXH64.hashLong(v, 42) — the q94 chain, emitted as nested
    // subqueries over the column's DISTINCT values (register max only
    // sees distinct hashes)
    val hashCols = Seq(
      ("uv", toU("v")),
      ("k1", mul(rotl(mul("uv", p2), 31), p1)),
      ("hx", xr(U("2870177450012600311"), "k1")), // seed 42 + PRIME64_5 + len 8
      ("hw", plus(mul(rotl("hx", 27), p1), "9650029242287828579"))) ++
      fmix("hw", "f")

    def colChain(col: String, p: String): String = {
      val inner = nest(
        s"SELECT DISTINCT $col AS v FROM lineitem WHERE $col IS NOT NULL", hashCols)
      s"""${p}hh AS (
         |  SELECT fe AS h FROM ($inner)
         |),
         |${p}reg AS (
         |  SELECT h >> 55 AS idx, MAX(65 - length(bin((${mul("h", U("512"))}) | ${U("256")}))) AS rho
         |  FROM ${p}hh GROUP BY h >> 55
         |),
         |${p}agg AS (
         |  SELECT SUM(CAST(1 AS HUGEINT) * (1::BIGINT << (56 - rho)))
         |         + (512 - COUNT(*)) * (CAST(1 AS HUGEINT) * (1::BIGINT << 56)) AS sfix,
         |         CAST(512 - COUNT(*) AS BIGINT) AS vz
         |  FROM ${p}reg
         |),
         |${p}e AS (
         |  SELECT $alphaM2 / (CAST(sfix AS DOUBLE) / 72057594037927936) AS ee, vz FROM ${p}agg
         |),
         |${p}ip AS (
         |  SELECT COUNT(*) AS ip FROM ${p}e, unnest($rawList) AS r(x) WHERE r.x < ${p}e.ee
         |),
         |${p}win AS (
         |  SELECT GREATEST(ip - 5, 0) AS lo0, LEAST(GREATEST(ip - 5, 0) + 6, $n) AS hi0 FROM ${p}ip
         |),
         |${p}sh AS (
         |  SELECT MIN(s) AS s FROM ${p}win, ${p}e, range(0, ${n + 1}) AS t(s)
         |  WHERE hi0 + s >= $n
         |     OR power(ee - ($rawList)[CAST(hi0 + s AS INT) + 1], 2) >= power(ee - ($rawList)[CAST(lo0 + s AS INT) + 1], 2)
         |),
         |${p}bias AS (
         |  SELECT SUM(($biasList)[CAST(w.lo0 + h.s + t.j AS INT) + 1]) / (MIN(w.hi0) - MIN(w.lo0)) AS bavg
         |  FROM ${p}win w, ${p}sh h, range(0, 6) AS t(j)
         |  WHERE w.lo0 + h.s + t.j < w.hi0 + h.s
         |),
         |${p}res AS (
         |  SELECT CAST(floor(
         |    CASE WHEN vz > 0 AND (512 * ln(512.0 / vz) <= 400.0 OR ee <= 1280.0)
         |         THEN 512 * ln(512.0 / vz)
         |         WHEN ee < 2560.0 THEN ee - (SELECT bavg FROM ${p}bias)
         |         ELSE ee END + 0.5) AS BIGINT) AS ad
         |  FROM ${p}e
         |)""".stripMargin
    }

    s"""WITH ${colChain("l_suppkey", "s")},
       |${colChain("l_partkey", "p")},
       |${colChain("l_orderkey", "o")}
       |SELECT s.ad AS ad_suppkey, p.ad AS ad_partkey, o.ad AS ad_orderkey
       |FROM sres s, pres p, ores o""".stripMargin
  }

  /** q85 oracle: Spark's Bloom filter (serialization V2) is fully
    * deterministic — `putString` hashes UTF-8 bytes with
    * Murmur3_x86_32: h1 = murmur(bytes, seed 0), h2 = murmur(bytes,
    * h1), then probe i (1-based) sets/tests bit
    * `(|h1·Int.MaxValue + i·h2|₊) mod bitSize` in 64-bit signed
    * arithmetic (negative → bitwise NOT; `df.stat.bloomFilter`
    * byte-identical to manual putString construction, checked on the
    * running Spark). So "might contain" needs NO bit array in SQL:
    * a corpus gram is flagged iff ALL k of its probe positions fall
    * inside the distinct-position set laid down by the held-out grams
    * — an anti-join on position. The murmur block fold runs as a
    * DuckDB `list_reduce` lambda in UBIGINT mod-2³² arithmetic (grams
    * are ASCII by construction — `[a-z0-9_]+` tokens joined by
    * single spaces — so chars = bytes and the signed-byte tail rule
    * never fires; each tail byte still gets Spark's full mix round).
    * Filter geometry replays `BloomFilter.create(n, 0.001)`:
    * numBits = ⌊−n·ln p / ln²2⌋, k = max(1, round(numBits/n·ln 2)),
    * bitSize rounded up to whole 64-bit words. The scatter loop runs
    * un-wrapped in HUGEINT — |h1ₛ·(2³¹−1)| < 2⁶² and |i·h2ₛ| ≤ k·2³¹,
    * so the Java long never overflows for k ≪ 2³⁰ and the signed-64
    * wrap is unreachable. Validated bit-exact at sf0.01 and sf0.1
    * (450 / 4950 rows, Bloom false positives reproduced exactly). */
  /** The Murmur3/Bloom-replay SQL combinators, factored to object
    * scope in r16 so the q283 rebuild cert can replay BOTH filter
    * generations from the same text the q85 oracle certifies. See the
    * q85OracleSql doc above for the bit-exactness argument. */
  private object BloomReplaySql {
    import UbigintSql.nest
    val M = "4294967296"
    def rotl32(x: String, r: Int) =
      s"((($x) * ${1L << r}) % $M + (($x) // ${1L << (32 - r)}))"
    // list_reduce step: x = running h1, y = next 4-byte word (tail
    // bytes ride the same round — Spark's hashUnsafeBytes tail rule)
    val k1 = s"((${rotl32(s"(y * 3432918353) % $M", 15)}) * 461845907) % $M"
    val mix = s"((${rotl32(s"xor(x, $k1)", 13)}) * 5 + 3864292196) % $M"
    def fmix32(f: String, pfx: String): Seq[(String, String)] = Seq(
      (s"${pfx}a", s"xor($f, nb)"),
      (s"${pfx}b", s"xor(${pfx}a, ${pfx}a // 65536)"),
      (s"${pfx}c", s"(${pfx}b * 2246822507) % $M"),
      (s"${pfx}d", s"xor(${pfx}c, ${pfx}c // 8192)"),
      (s"${pfx}e", s"(${pfx}d * 3266489909) % $M"),
      (s"${pfx}h", s"xor(${pfx}e, ${pfx}e // 65536)"))
    // little-endian 4-byte blocks + tail bytes of an ASCII gram `g`
    val blocks =
      "list_transform(range(0, CAST(nb // 4 AS INT)), i -> " +
        "CAST(ord(substr(g, CAST(4*i+1 AS INT), 1)) AS UBIGINT)" +
        " + 256*ord(substr(g, CAST(4*i+2 AS INT), 1))" +
        " + 65536*ord(substr(g, CAST(4*i+3 AS INT), 1))" +
        " + 16777216*ord(substr(g, CAST(4*i+4 AS INT), 1)))"
    val tail =
      "list_transform(range(CAST((nb // 4)*4 AS INT), CAST(nb AS INT)), i -> " +
        "CAST(ord(substr(g, CAST(i+1 AS INT), 1)) AS UBIGINT))"
    // h1 (seed 0) and h2 (seed h1) over a relation of distinct grams
    def hashed(base: String): String = nest(base, Seq(
      ("nb", "CAST(octet_length(encode(g)) AS UBIGINT)"),
      ("blk", s"$blocks || $tail"),
      ("f1", s"list_reduce(list_prepend(CAST(0 AS UBIGINT), blk), (x, y) -> $mix)")) ++
      fmix32("f1", "u") ++ Seq(
      ("f2", s"list_reduce(list_prepend(uh, blk), (x, y) -> $mix)")) ++
      fmix32("f2", "v") ++ Seq(
      ("h1s", s"CAST(uh AS HUGEINT) - CASE WHEN uh >= 2147483648 THEN $M ELSE 0 END"),
      ("h2s", s"CAST(vh AS HUGEINT) - CASE WHEN vh >= 2147483648 THEN $M ELSE 0 END")))
    // k probe positions per gram under the geometry table `par`
    // (i is 1-based: V2 adds h2 BEFORE use)
    def positions(rel: String, par: String = "par"): String =
      "SELECT g, CAST(CASE WHEN hraw < 0 THEN -hraw - 1 ELSE hraw END % bitsize AS BIGINT) AS pos " +
        s"FROM (SELECT r.g, r.h1s * 2147483647 + t.i * r.h2s AS hraw, p.bitsize " +
        s"      FROM ($rel) r, $par p, LATERAL (SELECT unnest(range(1, p.k + 1)) AS i) t)"
    /** Filter geometry (`BloomFilter.create(n, 0.001)`) from a
      * held-gram relation: numBits, k, word-rounded bitSize. */
    def parSql(heldRel: String): String =
      s"""SELECT n, m0,
         |       GREATEST(1, CAST(floor(CAST(m0 AS DOUBLE) / n * ln(2) + 0.5) AS BIGINT)) AS k,
         |       CAST(ceil(m0 / 64.0) AS HUGEINT) * 64 AS bitsize
         |FROM (SELECT n, CAST(floor((-n * ln(0.001)) / (ln(2) * ln(2))) AS BIGINT) AS m0
         |      FROM (SELECT CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS n
         |            FROM ($heldRel)))""".stripMargin
  }

  private val q85OracleSql: String = {
    import BloomReplaySql.{hashed, positions}
    val heldHashed = hashed("SELECT DISTINCT g FROM ng WHERE doc_id < 50")
    val corpHashed = hashed("SELECT DISTINCT g FROM ng WHERE doc_id >= 50")
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t
       |  FROM documents),
       |ng AS (
       |  SELECT DISTINCT doc_id, array_to_string(list_slice(t, gi, gi + 4), ' ') AS g
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS gi
       |        FROM tok WHERE len(t) >= 5)),
       |par AS (
       |  SELECT n, m0,
       |         GREATEST(1, CAST(floor(CAST(m0 AS DOUBLE) / n * ln(2) + 0.5) AS BIGINT)) AS k,
       |         CAST(ceil(m0 / 64.0) AS HUGEINT) * 64 AS bitsize
       |  FROM (SELECT n, CAST(floor((-n * ln(0.001)) / (ln(2) * ln(2))) AS BIGINT) AS m0
       |        FROM (SELECT CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS n
       |              FROM (SELECT DISTINCT g FROM ng WHERE doc_id < 50)))),
       |heldpos AS (SELECT DISTINCT pos FROM (${positions(heldHashed)})),
       |cpos AS (${positions(corpHashed)}),
       |miss AS (SELECT DISTINCT g FROM cpos ANTI JOIN heldpos USING (pos)),
       |might AS (SELECT DISTINCT g FROM ng WHERE doc_id >= 50 EXCEPT SELECT g FROM miss),
       |shr AS (SELECT doc_id, COUNT(*) AS n_shared FROM ng JOIN might USING (g)
       |        WHERE doc_id >= 50 GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(shr.n_shared, 0) AS n_shared,
       |       COALESCE(shr.n_shared, 0) >= 5 AS flagged
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
       |LEFT JOIN shr USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q283 oracle: BOTH Bloom generations replayed bit-exactly — the
    * old filter over the full held-out gram set and the rebuilt one
    * over held-out-minus-removal, each with its OWN geometry (n
    * changes, so numBits/k/bitsize change) — then the q85 serving
    * verdicts over the purged corpus and the removed-only-gram probes
    * aggregated into the applier's ledger rows. False positives
    * reproduce exactly on both generations, so `removed_grams.n_after`
    * (FP-only survivors) hash-matches whatever the engine's filter
    * answers. */
  private val q283OracleSql: String = {
    import BloomReplaySql.{hashed, positions, parSql}
    s"""WITH tok AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS t
       |  FROM documents),
       |ng AS (
       |  SELECT DISTINCT doc_id, array_to_string(list_slice(t, gi, gi + 4), ' ') AS g
       |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS gi
       |        FROM tok WHERE len(t) >= 5)),
       |rm AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 17 = 4),
       |hgo AS (SELECT DISTINCT g FROM ng WHERE doc_id < 50),
       |hgn AS (SELECT DISTINCT g FROM ng
       |        WHERE doc_id < 50 AND doc_id NOT IN (SELECT doc_id FROM rm)),
       |rgo AS (SELECT g FROM hgo EXCEPT SELECT g FROM hgn),
       |cgd AS (SELECT doc_id, g FROM ng
       |        WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM rm)),
       |cg AS (SELECT DISTINCT g FROM cgd),
       |opar AS (${parSql("SELECT g FROM hgo")}),
       |npar AS (${parSql("SELECT g FROM hgn")}),
       |oheldpos AS (SELECT DISTINCT pos FROM (${positions(hashed("SELECT g FROM hgo"), "opar")})),
       |nheldpos AS (SELECT DISTINCT pos FROM (${positions(hashed("SELECT g FROM hgn"), "npar")})),
       |cpos_o AS (${positions(hashed("SELECT g FROM cg"), "opar")}),
       |cpos_n AS (${positions(hashed("SELECT g FROM cg"), "npar")}),
       |miss_o AS (SELECT DISTINCT g FROM cpos_o ANTI JOIN oheldpos USING (pos)),
       |miss_n AS (SELECT DISTINCT g FROM cpos_n ANTI JOIN nheldpos USING (pos)),
       |might_o AS (SELECT g FROM cg EXCEPT SELECT g FROM miss_o),
       |might_n AS (SELECT g FROM cg EXCEPT SELECT g FROM miss_n),
       |shr_o AS (SELECT doc_id, COUNT(*) AS ns FROM cgd JOIN might_o USING (g) GROUP BY doc_id),
       |shr_n AS (SELECT doc_id, COUNT(*) AS ns FROM cgd JOIN might_n USING (g) GROUP BY doc_id),
       |rpos_o AS (${positions(hashed("SELECT g FROM rgo"), "opar")}),
       |rpos_n AS (${positions(hashed("SELECT g FROM rgo"), "npar")}),
       |rmiss_o AS (SELECT DISTINCT g FROM rpos_o ANTI JOIN oheldpos USING (pos)),
       |rmiss_n AS (SELECT DISTINCT g FROM rpos_n ANTI JOIN nheldpos USING (pos)),
       |agg AS (SELECT
       |  (SELECT COUNT(*) FROM hgo) AS n_old,
       |  (SELECT COUNT(*) FROM hgn) AS n_new,
       |  (SELECT COUNT(*) FROM rgo) AS n_ro,
       |  (SELECT COUNT(*) FROM rgo) - (SELECT COUNT(*) FROM rmiss_o) AS rp_old,
       |  (SELECT COUNT(*) FROM rgo) - (SELECT COUNT(*) FROM rmiss_n) AS rp_new,
       |  (SELECT COUNT(*) FROM shr_o WHERE ns >= 5) AS flag_o,
       |  (SELECT COUNT(*) FROM shr_n WHERE ns >= 5) AS flag_n,
       |  (SELECT COALESCE(SUM(ns), 0) FROM shr_o) AS sum_o,
       |  (SELECT COALESCE(SUM(ns), 0) FROM shr_n) AS sum_n),
       |rows_ AS (
       |  SELECT 'bloom_rebuild' AS artifact, 'all' AS "key",
       |         CAST(n_old AS BIGINT) AS n_before, CAST(n_new AS BIGINT) AS n_after,
       |         n_new = n_old - n_ro AS clean FROM agg
       |  UNION ALL
       |  SELECT 'removed_grams', 'all', CAST(rp_old AS BIGINT), CAST(rp_new AS BIGINT),
       |         rp_old = n_ro FROM agg
       |  UNION ALL
       |  SELECT 'serving', 'n_flagged', CAST(flag_o AS BIGINT), CAST(flag_n AS BIGINT),
       |         flag_n <= flag_o FROM agg
       |  UNION ALL
       |  SELECT 'serving', 'n_shared_sum', CAST(sum_o AS BIGINT), CAST(sum_n AS BIGINT),
       |         sum_n <= sum_o FROM agg)
       |SELECT artifact, "key", n_before, n_after,
       |       CAST(n_before - n_after AS BIGINT) AS n_removed, clean
       |FROM rows_ ORDER BY artifact, "key"""".stripMargin
  }

  /** q284 section chains, each parameterized over the event source so
    * the oracle runs every section TWICE — full events vs
    * events-minus-removed-users — and the diff becomes the ledger. */
  private def q284SessionsPerUserSql(src: String, gapPred: String): String =
    s"""SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_rows
       |FROM (
       |  SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                                   ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM (SELECT user_id, ts, event_id,
       |               CASE WHEN lag(ts) OVER w IS NULL OR $gapPred THEN 1 ELSE 0 END AS new_s
       |        FROM $src
       |        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
       |GROUP BY user_id""".stripMargin
  // the q280 pack law (>= 5 min splits) and the q161 session law
  // (> 30 min splits) — the two user-partitioned row stores
  private def q284ManifestRowsSql(src: String): String =
    q284SessionsPerUserSql(src, "ts - lag(ts) OVER w >= INTERVAL '5 minutes'")
  private def q284SessionRowsSql(src: String): String =
    q284SessionsPerUserSql(src,
      "epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000")
  private def q284FunnelCountsSql(src: String): String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS total, CAST(SUM(r1) AS BIGINT) AS n1,
       |       CAST(SUM(r2) AS BIGINT) AS n2, CAST(SUM(r3) AS BIGINT) AS n3
       |FROM (
       |  SELECT user_id, MAX(s1) AS r1, MAX(s2) AS r2, MAX(s3) AS r3
       |  FROM (
       |    SELECT *, MAX(CASE WHEN event_type = 'purchase' AND s2 = 1 THEN 1 ELSE 0 END) OVER w AS s3
       |    FROM (SELECT *, MAX(CASE WHEN event_type = 'click' AND s1 = 1 THEN 1 ELSE 0 END) OVER w AS s2
       |          FROM (SELECT user_id, ts, event_id, event_type,
       |                       MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w AS s1
       |                FROM $src
       |                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
       |          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
       |    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
       |  GROUP BY user_id)""".stripMargin
  private def q284RetentionSql(src: String): String =
    s"""SELECT f.cohort_week,
       |       CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT) AS week_offset,
       |       CAST(COUNT(*) AS BIGINT) AS n_active
       |FROM (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM $src) a
       |JOIN (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
       |      FROM $src GROUP BY user_id) f USING (user_id)
       |GROUP BY 1, 2""".stripMargin
  private def q284TransitionsSql(src: String): String =
    s"""SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
       |FROM (SELECT user_id, event_type,
       |             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
       |      FROM $src)
       |WHERE next_type IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** q286 oracle: every retention-sweep section recomputed from the
    * kept slice (ts ≥ cutoff) vs full events — the q284 builders
    * instantiated on a TIME predicate instead of a user list. The
    * store-freshness proof (before columns) and the
    * verbatim/decrement/re-derive ≡ rebuild proof (after columns)
    * both ride the same hash. */
  private def q286OracleSql: String = {
    val cut = "TIMESTAMP '2024-01-05 00:00:00'"
    s"""WITH ke AS (SELECT * FROM events WHERE ts >= $cut),
       |tu AS (SELECT DISTINCT user_id FROM events WHERE ts < $cut),
       |mf AS (${q284ManifestRowsSql("events")}),
       |mk AS (${q284ManifestRowsSql("ke")}),
       |sf2 AS (${q284SessionRowsSql("events")}),
       |sk2 AS (${q284SessionRowsSql("ke")}),
       |ff AS (${q284FunnelCountsSql("events")}),
       |fk AS (${q284FunnelCountsSql("ke")}),
       |rf AS (${q284RetentionSql("events")}),
       |rk AS (${q284RetentionSql("ke")}),
       |tf AS (${q284TransitionsSql("events")}),
       |tk AS (${q284TransitionsSql("ke")}),
       |rows_ AS (
       |  SELECT 'events' AS artifact, 'all' AS "key",
       |         CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_before,
       |         CAST((SELECT COUNT(*) FROM ke) AS BIGINT) AS n_after,
       |         TRUE AS clean
       |  UNION ALL
       |  SELECT 'users', 'all',
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT),
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM ke) AS BIGINT), TRUE
       |  UNION ALL
       |  SELECT 'users', 'touched',
       |         CAST((SELECT COUNT(*) FROM tu) AS BIGINT),
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM ke JOIN tu USING (user_id)) AS BIGINT),
       |         TRUE
       |  UNION ALL
       |  SELECT 'manifest', 'rows',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM mf),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM mk), TRUE
       |  UNION ALL
       |  SELECT 'manifest_touched', CAST(mf.user_id AS VARCHAR), mf.n_rows,
       |         CAST(COALESCE(mk.n_rows, 0) AS BIGINT), TRUE
       |  FROM mf JOIN tu USING (user_id) LEFT JOIN mk USING (user_id)
       |  UNION ALL
       |  SELECT 'sessions', 'rows',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM sf2),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM sk2), TRUE
       |  UNION ALL
       |  SELECT 'attribution', 'rows',
       |         CAST((SELECT COUNT(*) FROM events WHERE event_type = 'purchase') AS BIGINT),
       |         CAST((SELECT COUNT(*) FROM ke WHERE event_type = 'purchase') AS BIGINT),
       |         TRUE
       |  UNION ALL
       |  SELECT 'funnel', 'view', ff.n1, fk.n1,
       |         fk.n1 >= 0 AND fk.n1 <= ff.n1 FROM ff, fk
       |  UNION ALL
       |  SELECT 'funnel', 'click', ff.n2, fk.n2,
       |         fk.n2 >= 0 AND fk.n2 <= ff.n2 FROM ff, fk
       |  UNION ALL
       |  SELECT 'funnel', 'purchase', ff.n3, fk.n3,
       |         fk.n3 >= 0 AND fk.n3 <= ff.n3 FROM ff, fk
       |  UNION ALL
       |  SELECT 'retention',
       |         CAST(cohort_week AS VARCHAR) || ':' || CAST(week_offset AS VARCHAR),
       |         CAST(COALESCE(rf.n_active, 0) AS BIGINT),
       |         CAST(COALESCE(rk.n_active, 0) AS BIGINT),
       |         COALESCE(rk.n_active, 0) >= 0
       |  FROM rf FULL OUTER JOIN rk USING (cohort_week, week_offset)
       |  UNION ALL
       |  SELECT 'retention_size', CAST(cohort_week AS VARCHAR),
       |         CAST(COALESCE(rf0.n_active, 0) AS BIGINT),
       |         CAST(COALESCE(rk0.n_active, 0) AS BIGINT),
       |         COALESCE(rk0.n_active, 0) >= 0
       |  FROM (SELECT cohort_week, n_active FROM rf WHERE week_offset = 0) rf0
       |  FULL OUTER JOIN (SELECT cohort_week, n_active FROM rk WHERE week_offset = 0) rk0
       |    USING (cohort_week)
       |  UNION ALL
       |  SELECT 'transitions', tf.event_type || ':' || tf.next_type,
       |         tf.n, CAST(COALESCE(tk.n, 0) AS BIGINT), COALESCE(tk.n, 0) >= 0
       |  FROM tf LEFT JOIN tk USING (event_type, next_type)
       |  UNION ALL
       |  SELECT 'transitions_total', 'all',
       |         (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM tf),
       |         (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM tk), TRUE)
       |SELECT artifact, "key", n_before, n_after,
       |       CAST(n_before - n_after AS BIGINT) AS n_removed, clean
       |FROM rows_ ORDER BY artifact, "key"""".stripMargin
  }

  private def q284OracleSql: String =
    s"""WITH rmu AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 5),
       |ke AS (SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM rmu)),
       |mf AS (${q284ManifestRowsSql("events")}),
       |mk AS (${q284ManifestRowsSql("ke")}),
       |sf AS (${q284SessionRowsSql("events")}),
       |sk AS (${q284SessionRowsSql("ke")}),
       |af AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
       |       FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       |ak AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
       |       FROM ke WHERE event_type = 'purchase' GROUP BY user_id),
       |ff AS (${q284FunnelCountsSql("events")}),
       |fk AS (${q284FunnelCountsSql("ke")}),
       |rf AS (${q284RetentionSql("events")}),
       |rk AS (${q284RetentionSql("ke")}),
       |tf AS (${q284TransitionsSql("events")}),
       |tk AS (${q284TransitionsSql("ke")}),
       |rows_ AS (
       |  SELECT 'users' AS artifact, 'all' AS "key",
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_before,
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM ke) AS BIGINT) AS n_after,
       |         TRUE AS clean
       |  UNION ALL
       |  SELECT 'manifest', 'rows',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM mf),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM mk), TRUE
       |  UNION ALL
       |  SELECT 'manifest', CAST(user_id AS VARCHAR), n_rows, CAST(0 AS BIGINT), TRUE
       |  FROM mf JOIN rmu USING (user_id)
       |  UNION ALL
       |  SELECT 'sessions', 'rows',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM sf),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM sk), TRUE
       |  UNION ALL
       |  SELECT 'sessions', CAST(user_id AS VARCHAR), n_rows, CAST(0 AS BIGINT), TRUE
       |  FROM sf JOIN rmu USING (user_id)
       |  UNION ALL
       |  SELECT 'attribution', 'rows',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM af),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM ak), TRUE
       |  UNION ALL
       |  SELECT 'attribution', CAST(user_id AS VARCHAR), n_rows, CAST(0 AS BIGINT), TRUE
       |  FROM af JOIN rmu USING (user_id)
       |  UNION ALL
       |  SELECT 'funnel', 'view', ff.n1, fk.n1,
       |         fk.n1 >= 0 AND fk.n1 <= ff.n1 FROM ff, fk
       |  UNION ALL
       |  SELECT 'funnel', 'click', ff.n2, fk.n2,
       |         fk.n2 >= 0 AND fk.n2 <= ff.n2 FROM ff, fk
       |  UNION ALL
       |  SELECT 'funnel', 'purchase', ff.n3, fk.n3,
       |         fk.n3 >= 0 AND fk.n3 <= ff.n3 FROM ff, fk
       |  UNION ALL
       |  SELECT 'retention',
       |         CAST(rf.cohort_week AS VARCHAR) || ':' || CAST(rf.week_offset AS VARCHAR),
       |         rf.n_active, CAST(COALESCE(rk.n_active, 0) AS BIGINT),
       |         COALESCE(rk.n_active, 0) >= 0
       |  FROM rf LEFT JOIN rk USING (cohort_week, week_offset)
       |  UNION ALL
       |  SELECT 'retention_size', CAST(rf0.cohort_week AS VARCHAR),
       |         rf0.n_active, CAST(COALESCE(rk0.n_active, 0) AS BIGINT),
       |         COALESCE(rk0.n_active, 0) >= 0
       |  FROM (SELECT cohort_week, n_active FROM rf WHERE week_offset = 0) rf0
       |  LEFT JOIN (SELECT cohort_week, n_active FROM rk WHERE week_offset = 0) rk0
       |    USING (cohort_week)
       |  UNION ALL
       |  SELECT 'transitions', tf.event_type || ':' || tf.next_type,
       |         tf.n, CAST(COALESCE(tk.n, 0) AS BIGINT), COALESCE(tk.n, 0) >= 0
       |  FROM tf LEFT JOIN tk USING (event_type, next_type))
       |SELECT artifact, "key", n_before, n_after,
       |       CAST(n_before - n_after AS BIGINT) AS n_removed, clean
       |FROM rows_ ORDER BY artifact, "key"""".stripMargin

  /** q270/q273 oracles factored over the removal predicate (r17):
    * the q291 document-age sweep replays the SAME certified chains
    * with a time predicate in place of the id list. */
  private def q270OracleSqlOver(rmPred: String): String =
    s"""WITH rm AS (
             |  SELECT DISTINCT doc_id FROM documents WHERE $rmPred),
             |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
             |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rm),
             |docsec AS (
             |  SELECT a AS artifact, 'all' AS "key", nd.n AS n_before,
             |         nd.n - nr.n AS n_after, nr.n AS n_removed, TRUE AS clean
             |  FROM (VALUES ('fingerprints'), ('doc_lengths')) AS t(a)
             |  CROSS JOIN nd CROSS JOIN nr),
             |skst AS (
             |  SELECT doc_id
             |  FROM read_parquet('/tmp/graft_sketch_oracle/docids/*.parquet')),
             |sksec AS (
             |  SELECT 'sketches', 'all',
             |         CAST((SELECT COUNT(*) FROM skst) AS BIGINT),
             |         CAST((SELECT COUNT(*) FROM skst
             |               WHERE doc_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT),
             |         CAST((SELECT COUNT(*) FROM skst
             |               WHERE doc_id IN (SELECT doc_id FROM rm)) AS BIGINT),
             |         TRUE),
             |post AS (
             |  SELECT doc_id, w
             |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[A-Za-z0-9_]+')) AS w
             |        FROM documents) GROUP BY 1, 2),
             |postsec AS (
             |  SELECT 'postings', 'all', CAST(COUNT(*) AS BIGINT),
             |         CAST(SUM(CASE WHEN doc_id NOT IN (SELECT doc_id FROM rm) THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM rm) THEN 1 ELSE 0 END) AS BIGINT),
             |         TRUE
             |  FROM post),
             |assign AS (
             |  SELECT vec_id FROM read_parquet('/tmp/graft_ivf_oracle/assign/*.parquet')),
             |vecsec AS (
             |  SELECT a, 'all', CAST(COUNT(*) AS BIGINT),
             |         CAST(SUM(CASE WHEN vec_id NOT IN (SELECT doc_id FROM rm) THEN 1 ELSE 0 END) AS BIGINT),
             |         CAST(SUM(CASE WHEN vec_id IN (SELECT doc_id FROM rm) THEN 1 ELSE 0 END) AS BIGINT),
             |         TRUE
             |  FROM (VALUES ('ivf_assign'), ('pq_codes')) AS t(a) CROSS JOIN assign
             |  GROUP BY a),
             |srcs AS (
             |  SELECT 'old' AS which, lang, doc_id, text FROM documents
             |  UNION ALL
             |  SELECT 'new', lang, doc_id, text FROM documents
             |  WHERE doc_id NOT IN (SELECT doc_id FROM rm)),
             |mt AS (
             |  SELECT which, lang, doc_id,
             |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_tokens
             |  FROM srcs),
             |mc AS (
             |  SELECT which, lang, doc_id, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY which, lang ORDER BY doc_id) AS cum
             |  FROM mt WHERE n_tokens > 0),
             |sp AS (
             |  SELECT which, lang, doc_id, n_tokens,
             |         CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_seq,
             |         CAST((cum - 1) // 2048 AS BIGINT) AS end_seq,
             |         CAST((cum - n_tokens) % 2048 AS BIGINT) AS tok_offset
             |  FROM mc),
             |e AS (
             |  SELECT which, lang, n_tokens, tok_offset, start_seq,
             |         CAST(unnest(range(start_seq, end_seq + 1)) AS BIGINT) AS seq_id
             |  FROM sp),
             |m AS (
             |  SELECT which, lang, seq_id,
             |         CAST(LEAST(start_seq * 2048 + tok_offset + n_tokens, seq_id * 2048 + 2048)
             |              - GREATEST(start_seq * 2048 + tok_offset, seq_id * 2048) AS BIGINT) AS n_from_doc
             |  FROM e),
             |tok AS (SELECT which, lang, CAST(SUM(n_from_doc) AS BIGINT) AS n FROM m GROUP BY 1, 2),
             |seqs AS (SELECT which, lang, CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n FROM m GROUP BY 1, 2),
             |shds AS (SELECT which, lang, CAST(COUNT(DISTINCT seq_id // 16) AS BIGINT) AS n FROM m GROUP BY 1, 2),
             |langsec AS (
             |  SELECT 'seq_tokens' AS artifact, o.lang, o.n AS n_before,
             |         CAST(COALESCE(w.n, 0) AS BIGINT) AS n_after
             |  FROM tok o LEFT JOIN tok w ON o.lang = w.lang AND w.which = 'new'
             |  WHERE o.which = 'old'
             |  UNION ALL
             |  SELECT 'sequences', o.lang, o.n, CAST(COALESCE(w.n, 0) AS BIGINT)
             |  FROM seqs o LEFT JOIN seqs w ON o.lang = w.lang AND w.which = 'new'
             |  WHERE o.which = 'old'
             |  UNION ALL
             |  SELECT 'shards', o.lang, o.n, CAST(COALESCE(w.n, 0) AS BIGINT)
             |  FROM shds o LEFT JOIN shds w ON o.lang = w.lang AND w.which = 'new'
             |  WHERE o.which = 'old'),
             |certsec AS (
             |  SELECT 'manifest_cert' AS artifact, lang || ':n_docs' AS "key",
             |         CAST(COUNT(*) AS BIGINT) AS n_before,
             |         CAST(COUNT(*) AS BIGINT) AS n_after,
             |         CAST(0 AS BIGINT) AS n_removed, TRUE AS clean
             |  FROM mc WHERE which = 'old' GROUP BY lang
             |  UNION ALL
             |  SELECT 'manifest_cert', lang || ':n_tokens',
             |         CAST(SUM(n_tokens) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT),
             |         CAST(0 AS BIGINT), TRUE
             |  FROM mc WHERE which = 'old' GROUP BY lang),
             |allr AS (
             |  SELECT * FROM docsec UNION ALL SELECT * FROM sksec
             |  UNION ALL SELECT * FROM postsec
             |  UNION ALL SELECT * FROM vecsec
             |  UNION ALL SELECT * FROM certsec
             |  UNION ALL SELECT artifact, lang, n_before, n_after,
             |                   n_before - n_after, TRUE
             |            FROM langsec)
             |SELECT artifact, "key", n_before, n_after, n_removed, clean
             |FROM allr ORDER BY artifact, "key"""".stripMargin

  private def q273OracleSqlOver(rmPred: String): String =
    s"""WITH rm AS (SELECT DISTINCT doc_id FROM documents WHERE $rmPred),
              |keep AS (SELECT * FROM documents
              |         WHERE doc_id NOT IN (SELECT doc_id FROM rm)),
              |t AS (SELECT doc_id, regexp_extract_all(lower(text), '[A-Za-z0-9_]+') AS toks
              |      FROM documents),
              |o AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
              |      FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
              |            FROM t WHERE len(toks) >= 2)),
              |ok AS (SELECT * FROM o WHERE doc_id NOT IN (SELECT doc_id FROM rm)),
              |lmrows AS (
              |  SELECT 'lm_bigrams' AS artifact, 'all' AS "key",
              |         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT w1, w2 FROM o) x) AS BIGINT) AS n_before,
              |         CAST((SELECT COUNT(*) FROM (SELECT DISTINCT w1, w2 FROM ok) x) AS BIGINT) AS n_after,
              |         TRUE AS clean
              |  UNION ALL
              |  SELECT 'lm_contexts', 'all',
              |         CAST((SELECT COUNT(DISTINCT w1) FROM o) AS BIGINT),
              |         CAST((SELECT COUNT(DISTINCT w1) FROM ok) AS BIGINT), TRUE
              |  UNION ALL
              |  SELECT 'lm_vocab', 'all',
              |         CAST((SELECT COUNT(DISTINCT w) FROM
              |               (SELECT w1 AS w FROM o UNION SELECT w2 FROM o) x) AS BIGINT),
              |         CAST((SELECT COUNT(DISTINCT w) FROM
              |               (SELECT w1 AS w FROM ok UNION SELECT w2 FROM ok) x) AS BIGINT),
              |         TRUE),
              |qb AS (SELECT doc_id, n_tokens, quality FROM ($qualityPerDocSql)),
              |cb AS (
              |  SELECT d.lang, d.source,
              |         CAST(COUNT(*) AS BIGINT) AS n_docs,
              |         CAST(SUM(qb.n_tokens) AS BIGINT) AS n_tokens,
              |         CAST(SUM(CAST(floor(qb.quality * 1000000.0) AS BIGINT)) AS BIGINT) AS q_ppm_sum,
              |         CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups
              |  FROM (SELECT doc_id, lang, source,
              |               doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
              |        FROM documents) d
              |  JOIN qb USING (doc_id) GROUP BY 1, 2),
              |qa AS (SELECT doc_id, n_tokens, quality FROM (${qualityPerDocSqlOver("keep")})),
              |ca AS (
              |  SELECT d.lang, d.source,
              |         CAST(COUNT(*) AS BIGINT) AS n_docs,
              |         CAST(SUM(qa.n_tokens) AS BIGINT) AS n_tokens,
              |         CAST(SUM(CAST(floor(qa.quality * 1000000.0) AS BIGINT)) AS BIGINT) AS q_ppm_sum,
              |         CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dups
              |  FROM (SELECT doc_id, lang, source,
              |               doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
              |        FROM keep) d
              |  JOIN qa USING (doc_id) GROUP BY 1, 2),
              |mb AS (
              |  SELECT lang, source, 'n_docs' AS measure, n_docs AS vb FROM cb
              |  UNION ALL SELECT lang, source, 'n_tokens', n_tokens FROM cb
              |  UNION ALL SELECT lang, source, 'q_ppm_sum', q_ppm_sum FROM cb
              |  UNION ALL SELECT lang, source, 'n_exact_dups', n_exact_dups FROM cb),
              |ma AS (
              |  SELECT lang, source, 'n_docs' AS measure, n_docs AS va FROM ca
              |  UNION ALL SELECT lang, source, 'n_tokens', n_tokens FROM ca
              |  UNION ALL SELECT lang, source, 'q_ppm_sum', q_ppm_sum FROM ca
              |  UNION ALL SELECT lang, source, 'n_exact_dups', n_exact_dups FROM ca),
              |cardrows AS (
              |  SELECT 'card_state' AS artifact,
              |         mb.lang || ':' || mb.source || ':' || mb.measure AS "key",
              |         mb.vb AS n_before, CAST(COALESCE(ma.va, 0) AS BIGINT) AS n_after,
              |         COALESCE(ma.va, 0) >= 0 AS clean
              |  FROM mb LEFT JOIN ma USING (lang, source, measure)),
              |sgst AS (
              |  SELECT vec_id
              |  FROM read_parquet('/tmp/graft_binsig_oracle/vecids/*.parquet')),
              |sigrow AS (
              |  SELECT 'binary_sigs' AS artifact, 'all' AS "key",
              |         CAST((SELECT COUNT(*) FROM sgst) AS BIGINT) AS n_before,
              |         CAST((SELECT COUNT(*) FROM sgst
              |               WHERE vec_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT) AS n_after,
              |         TRUE AS clean),
              |sgwst AS (
              |  SELECT vec_id
              |  FROM read_parquet('/tmp/graft_binsigw_oracle/vecids/*.parquet')),
              |sigwrow AS (
              |  SELECT 'binary_sigs_wide' AS artifact, 'all' AS "key",
              |         CAST((SELECT COUNT(*) FROM sgwst) AS BIGINT) AS n_before,
              |         CAST((SELECT COUNT(*) FROM sgwst
              |               WHERE vec_id NOT IN (SELECT doc_id FROM rm)) AS BIGINT) AS n_after,
              |         TRUE AS clean),
              |ngb AS (
              |  SELECT DISTINCT array_to_string(list_slice(toks, gi, gi + 4), ' ') AS g
              |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS gi
              |        FROM t WHERE len(toks) >= 5)
              |  WHERE doc_id < 50),
              |nga AS (
              |  SELECT DISTINCT array_to_string(list_slice(toks, gi, gi + 4), ' ') AS g
              |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS gi
              |        FROM t WHERE len(toks) >= 5)
              |  WHERE doc_id < 50 AND doc_id NOT IN (SELECT doc_id FROM rm)),
              |bloomrow AS (
              |  SELECT 'bloom_rebuild' AS artifact, 'all' AS "key",
              |         CAST((SELECT COUNT(*) FROM ngb) AS BIGINT) AS n_before,
              |         CAST((SELECT COUNT(*) FROM nga) AS BIGINT) AS n_after,
              |         FALSE AS clean),
              |allr AS (
              |  SELECT * FROM lmrows UNION ALL SELECT * FROM cardrows
              |  UNION ALL SELECT * FROM sigrow UNION ALL SELECT * FROM sigwrow
              |  UNION ALL SELECT * FROM bloomrow)
              |SELECT artifact, "key", n_before, n_after,
              |       CAST(n_before - n_after AS BIGINT) AS n_removed, clean
              |FROM allr ORDER BY artifact, "key"""".stripMargin

  /** q290 oracle: every quarantine-round-trip section's before and
    * purged masses recomputed from events and events-minus-users (the
    * q284 builders), with restored pinned to before and clean TRUE —
    * the engine's commitment-based identity probe must agree. */
  private def q290OracleSql: String =
    s"""WITH rmu AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 5),
       |ke AS (SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM rmu)),
       |mf AS (${q284ManifestRowsSql("events")}),
       |mk AS (${q284ManifestRowsSql("ke")}),
       |sf AS (${q284SessionRowsSql("events")}),
       |sk AS (${q284SessionRowsSql("ke")}),
       |af AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
       |       FROM events WHERE event_type = 'purchase' GROUP BY user_id),
       |ak AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
       |       FROM ke WHERE event_type = 'purchase' GROUP BY user_id),
       |ff AS (${q284FunnelCountsSql("events")}),
       |fk AS (${q284FunnelCountsSql("ke")}),
       |rf AS (${q284RetentionSql("events")}),
       |rk AS (${q284RetentionSql("ke")}),
       |tf AS (${q284TransitionsSql("events")}),
       |tk AS (${q284TransitionsSql("ke")}),
       |rows_ AS (
       |  SELECT 'users' AS artifact, 'all' AS "key",
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_before,
       |         CAST((SELECT COUNT(DISTINCT user_id) FROM ke) AS BIGINT) AS n_purged
       |  UNION ALL
       |  SELECT 'manifest', 'all',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM mf),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM mk)
       |  UNION ALL
       |  SELECT 'sessions', 'all',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM sf),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM sk)
       |  UNION ALL
       |  SELECT 'attribution', 'all',
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM af),
       |         (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM ak)
       |  UNION ALL
       |  SELECT 'funnel', 'all',
       |         (SELECT CAST(n1 + n2 + n3 AS BIGINT) FROM ff),
       |         (SELECT CAST(n1 + n2 + n3 AS BIGINT) FROM fk)
       |  UNION ALL
       |  SELECT 'retention', 'all',
       |         (SELECT CAST(COALESCE(SUM(n_active), 0) AS BIGINT) FROM rf),
       |         (SELECT CAST(COALESCE(SUM(n_active), 0) AS BIGINT) FROM rk)
       |  UNION ALL
       |  SELECT 'transitions', 'all',
       |         (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM tf),
       |         (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM tk))
       |SELECT artifact, "key", n_before, n_purged,
       |       n_before AS n_restored, TRUE AS clean
       |FROM rows_ ORDER BY artifact, "key"""".stripMargin

  /** q86 oracle: Spark's CountMinSketch (stream-lib scheme) is
    * deterministic given the seed — row constants are
    * `new Random(seed).nextInt(Int.MaxValue)` (evaluated HERE with the
    * real java.util.Random), the per-row hash is
    * `h = a·item; h += h >> 32; h &= 2^31−1; h %= width`, and merging
    * per-partition sketches is a cellwise sum, so the final table is
    * partition-order-independent: table[i][b] = Σ counts of keys
    * hashing to (i,b). eps 0.001 → width 2000; confidence 0.99 →
    * depth 7. The wrapping multiply runs in HUGEINT; `>> 32` on the
    * signed value is the floor division (s − pmod(s,2^32)) / 2^32.
    * Validated bit-exact against the Spark sketch at sf0.01. */
  private val q86OracleSql: String = {
    val rnd = new java.util.Random(42)
    val haValues = (0 until 7)
      .map(i => s"($i, ${rnd.nextInt(Int.MaxValue)})").mkString(", ")
    val M64 = "18446744073709551616"
    s"""WITH ha(i, a) AS (VALUES $haValues),
       |ex AS MATERIALIZED (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey),
       |hb AS MATERIALIZED (
       |  SELECT o_custkey, n, i,
       |    CAST(((s + fl) % 2147483648 + 2147483648) % 2147483648 % 2000 AS BIGINT) AS b
       |  FROM (
       |    SELECT o_custkey, n, i, s,
       |      (s - ((s % 4294967296 + 4294967296) % 4294967296)) // 4294967296 AS fl
       |    FROM (
       |      SELECT o_custkey, n, i,
       |        m - (CASE WHEN m >= CAST(9223372036854775808 AS HUGEINT) THEN CAST($M64 AS HUGEINT) ELSE 0 END) AS s
       |      FROM (
       |        SELECT e0.o_custkey, e0.n, h0.i,
       |          ((CAST(h0.a AS HUGEINT) * e0.o_custkey) % $M64 + $M64) % $M64 AS m
       |        FROM ex e0, ha h0)))
       |),
       |tbl AS (SELECT i, b, SUM(n) AS cnt FROM hb GROUP BY i, b),
       |topk AS (SELECT o_custkey, n AS n_exact FROM ex ORDER BY n DESC, o_custkey LIMIT 10),
       |estm AS (
       |  SELECT t.o_custkey, t.n_exact, MIN(tb.cnt) AS n_estimated
       |  FROM topk t JOIN hb q ON q.o_custkey = t.o_custkey
       |       JOIN tbl tb ON tb.i = q.i AND tb.b = q.b
       |  GROUP BY t.o_custkey, t.n_exact
       |)
       |SELECT o_custkey, CAST(n_exact AS BIGINT) AS n_exact, CAST(n_estimated AS BIGINT) AS n_estimated
       |FROM estm ORDER BY n_exact DESC, o_custkey""".stripMargin
  }

  /** q47 oracle: same deterministic-hyperplane reproduction as q63
    * (6 planes here), plus the multi-probe expansion — each query
    * probes its own bucket and every bucket one bit-flip away
    * (xor with 0,1,2,4,8,16,32), then exact cosine top-10. Probe
    * values are distinct so no candidate is scored twice. */
  /** q208 oracle: the q47 driver-side sign derivation (Spark's own
    * XXH64.hashInt chain) emitted as 16 ±1 literal rows; projections
    * and squared distances via exact-integer inner products (values
    * < 2⁴¹, exact in DOUBLE), the polarization identity
    * ‖a−b‖² = ‖a‖² − 2⟨a,b⟩ + ‖b‖² in place of a zip. */
  private val q208OracleSql: String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val signRows = (0 until 16).map { j =>
      val h1 = XXH64.hashInt(j, 42L)
      (0 until 64).map { d =>
        val h = XXH64.hashInt(d, h1)
        if (((h % 2) + 2) % 2 == 1) "1" else "-1"
      }.mkString("[", ", ", "]")
    }
    val yList = signRows
      .map(row => s"CAST(list_inner_product(q, $row) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |                        x -> CAST(round(x * 1024) AS BIGINT)) AS q
       |  FROM embeddings WHERE vec_id < 30),
       |p AS MATERIALIZED (SELECT vec_id, q, $yList AS y FROM v),
       |pr AS (SELECT a.vec_id AS a, b.vec_id AS b,
       |              CAST(list_inner_product(a.q, a.q) - 2 * list_inner_product(a.q, b.q)
       |                   + list_inner_product(b.q, b.q) AS BIGINT) AS d2_orig,
       |              CAST(list_inner_product(a.y, a.y) - 2 * list_inner_product(a.y, b.y)
       |                   + list_inner_product(b.y, b.y) AS BIGINT) AS d2_proj
       |       FROM p a JOIN p b ON a.vec_id < b.vec_id)
       |SELECT a, b, d2_orig, d2_proj,
       |       ((CAST(d2_proj AS DOUBLE) / 16) / d2_orig) AS ratio
       |FROM pr WHERE d2_orig > 0
       |ORDER BY a, b""".stripMargin
  }

  private val q47OracleSql: String = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val signs = (0 until 6).map { p =>
      val h1 = XXH64.hashInt(p, 42L)
      (0 until 64).map { d =>
        val h = XXH64.hashInt(d, h1)
        if (((h % 2) + 2) % 2 == 1) "1.0" else "-1.0"
      }.mkString("[", ", ", "]")
    }
    val projTerms = signs.zipWithIndex.map { case (row, p) =>
      s"(CASE WHEN list_inner_product(e, $row) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val flips = (Seq(0L) ++ (0 until 6).map(p => 1L << p)).map(f => s"($f)").mkString(", ")
    s"""WITH v AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |),
       |vb AS MATERIALIZED (
       |  SELECT vec_id, e, sqrt(list_inner_product(e, e)) AS norm,
       |         $projTerms AS bucket
       |  FROM v
       |),
       |q AS (
       |  SELECT vec_id AS qid, e AS qe, norm AS qnorm, xor(bucket, f) AS qbucket
       |  FROM vb, (SELECT * FROM (VALUES $flips) AS fl(f))
       |  WHERE vec_id < 5
       |),
       |s AS (
       |  SELECT q.qid, vb.vec_id,
       |         (list_inner_product(q.qe, vb.e) / (q.qnorm * vb.norm)) AS score
       |  FROM vb JOIN q ON vb.bucket = q.qbucket AND vb.vec_id <> q.qid
       |),
       |r AS (SELECT qid, vec_id, score,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
       |      FROM s)
       |SELECT qid, vec_id, score, rn FROM r WHERE rn <= 10
       |ORDER BY qid, rn""".stripMargin
  }

  /** q95 oracle: the q49 FNV-1a decode-stub fold (already
    * oracle-proven) produces the 4 features, cast to FLOAT exactly as
    * [[graft.engine.MultimodalOps.mediaAnnTopK]]'s embedding contract
    * does, then the q46 brute-force cosine top-k tail (k = 5). A real
    * codec swap-in would return this query to rows-only. */
  private val q95OracleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
       |  FROM documents
       |),
       |byt AS (SELECT media_id, $hexBytesSql AS bytes FROM b),
       |h AS (
       |  SELECT media_id,
       |    list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), bytes),
       |      (acc, x) -> ((acc - (acc % 256) + xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)))
       |                   * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS uh
       |  FROM byt
       |),
       |emb AS (
       |  SELECT media_id AS vec_id,
       |    [CAST(CAST((uh // 1) % 65536 AS DOUBLE) / 65535.0 AS FLOAT),
       |     CAST(CAST((uh // 65536) % 65536 AS DOUBLE) / 65535.0 AS FLOAT),
       |     CAST(CAST((uh // 4294967296) % 65536 AS DOUBLE) / 65535.0 AS FLOAT),
       |     CAST(CAST((uh // 281474976710656) % 65536 AS DOUBLE) / 65535.0 AS FLOAT)] AS embedding
       |  FROM h
       |),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM emb),
       |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5),
       |s AS (SELECT qid, vec_id,
       |             (list_inner_product(qe, e) /
       |                   (sqrt(list_inner_product(qe, qe)) * sqrt(list_inner_product(e, e)))) AS score
       |      FROM v CROSS JOIN q WHERE vec_id <> qid),
       |r AS (SELECT qid, vec_id, score,
       |             CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
       |      FROM s)
       |SELECT qid, vec_id, score, rn FROM r WHERE rn <= 5
       |ORDER BY qid, rn""".stripMargin

  /** q50 oracle: the correlation matrix IS SQL-expressible once the
    * StringIndexer is reproduced — frequencyDesc assigns 0,1,2,… by
    * count DESC with ties broken alphabetically ASC (Spark
    * StringIndexer.getSortFunc), i.e. exactly
    * `row_number() OVER (ORDER BY count(*) DESC, value ASC) - 1`.
    * The 36 (feature_i, feature_j) pairs are generated as UNION ALL
    * branches; corr() is sample Pearson on both sides, rounded to 6dp
    * (pattern proven by q21). */
  private val q50OracleSql: String = {
    val cols = Seq("o_month", "o_year", "o_totalprice",
      "o_orderpriority_idx", "o_orderstatus_idx", "c_mktsegment_idx")
    val branches = (for { i <- cols; j <- cols } yield
      s"SELECT '$i' AS feature_i, '$j' AS feature_j, ROUND(corr($i, $j), 6) AS corr FROM fi"
      ).mkString("\nUNION ALL ")
    s"""WITH f AS (
       |  SELECT o_totalprice, month(o_orderdate) AS o_month, year(o_orderdate) AS o_year,
       |         o_orderpriority, o_orderstatus, c_mktsegment
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE o_totalprice IS NOT NULL AND o_orderdate IS NOT NULL
       |    AND o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
       |    AND c_mktsegment IS NOT NULL AND o_totalprice > 0
       |),
       |pm AS (SELECT o_orderpriority AS v, row_number() OVER (ORDER BY count(*) DESC, o_orderpriority ASC) - 1 AS idx FROM f GROUP BY 1),
       |sm AS (SELECT o_orderstatus AS v, row_number() OVER (ORDER BY count(*) DESC, o_orderstatus ASC) - 1 AS idx FROM f GROUP BY 1),
       |mm AS (SELECT c_mktsegment AS v, row_number() OVER (ORDER BY count(*) DESC, c_mktsegment ASC) - 1 AS idx FROM f GROUP BY 1),
       |fi AS (
       |  SELECT f.o_month, f.o_year, f.o_totalprice,
       |         CAST(pm.idx AS DOUBLE) AS o_orderpriority_idx,
       |         CAST(sm.idx AS DOUBLE) AS o_orderstatus_idx,
       |         CAST(mm.idx AS DOUBLE) AS c_mktsegment_idx
       |  FROM f JOIN pm ON f.o_orderpriority = pm.v
       |         JOIN sm ON f.o_orderstatus = sm.v
       |         JOIN mm ON f.c_mktsegment = mm.v
       |)
       |$branches
       |ORDER BY feature_i, feature_j""".stripMargin
  }

  // ---------------------------------------------------------------- //
  // north-star: host-graph analytics (GraphOps)
  // ---------------------------------------------------------------- //
  /** Shared CTEs for the graph oracles: the synthetic host per doc
    * (replaying [[graft.engine.WebOps.syntheticUrls]]' formula) and
    * the host-link edge table (partner doc = pmod(xxh64(doc_id), n),
    * via the bit-exact [[Xxh64DocIdSql]] chain). */
  private val hostEdgesCteSql: String = {
    import Xxh64DocIdSql.{ctes, tos}
    s"""$ctes,
       |hosts AS (
       |  SELECT doc_id,
       |         list_extract(['www', 'cdn', 'blog'], CAST(doc_id % 3 AS INT) + 1) ||
       |         '.' || source || '.example' AS host
       |  FROM documents),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |dstd AS (SELECT s10.doc_id, ((${tos("h8")} % n) + n) % n AS dst_doc
       |         FROM s10 CROSS JOIN nn),
       |edges AS (SELECT a.host AS src, b.host AS dst, CAST(COUNT(*) AS BIGINT) AS w
       |          FROM hosts a JOIN dstd ON dstd.doc_id = a.doc_id
       |          JOIN hosts b ON b.doc_id = dstd.dst_doc
       |          GROUP BY a.host, b.host)""".stripMargin
  }

  /** q169 oracle: 3 unrolled fixed-point PageRank iterations — floor
    * division everywhere, so each iteration is bit-identical to the
    * Spark BIGINT chain. */
  private val q169OracleSql: String = {
    val S = "1000000000000"
    val iters = (1 to 3).map { k =>
      s"""c$k AS (SELECT e.dst AS host,
         |              CAST(SUM((r.rank * e.w) // o.ow) AS BIGINT) AS inflow
         |       FROM edges e JOIN r${k - 1} r ON r.host = e.src
         |       JOIN outw o ON o.src = e.src GROUP BY e.dst),
         |r$k AS (SELECT nodes.host,
         |               (15 * ($S // m)) // 100
         |                 + (85 * COALESCE(c$k.inflow, 0)) // 100 AS rank
         |        FROM nodes CROSS JOIN m
         |        LEFT JOIN c$k ON c$k.host = nodes.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH $hostEdgesCteSql,
       |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT host FROM hosts),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM nodes),
       |r0 AS (SELECT host, $S // m AS rank FROM nodes CROSS JOIN m),
       |$iters
       |SELECT r3.host, CAST(COALESCE(o.ow, 0) AS BIGINT) AS out_weight,
       |       CAST(r3.rank AS BIGINT) AS rank_fp,
       |       (CAST(r3.rank AS DOUBLE) / $S.0) AS rank
       |FROM r3 LEFT JOIN outw o ON o.src = r3.host
       |ORDER BY host""".stripMargin
  }

  /** q170 oracle: degree-ordered oriented wedge join + closure probe
    * (either residual orientation), triangles attributed to all three
    * corners. */
  private val q170OracleSql: String =
    s"""WITH $hostEdgesCteSql,
       |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |        FROM edges WHERE src <> dst),
       |deg AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS deg FROM
       |        (SELECT u AS h FROM und UNION ALL SELECT v AS h FROM und)
       |        GROUP BY h),
       |ori AS (SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
       |                    THEN u ELSE v END AS a,
       |               CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND u < v)
       |                    THEN v ELSE u END AS b
       |        FROM und JOIN deg d1 ON d1.h = und.u JOIN deg d2 ON d2.h = und.v),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM ori e1 JOIN ori e2 ON e2.a = e1.a AND e1.b < e2.b
       |        JOIN ori e3 ON (e3.a = e1.b AND e3.b = e2.b)
       |                    OR (e3.a = e2.b AND e3.b = e1.b)),
       |cnt AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM
       |        (SELECT x AS host FROM tri UNION ALL SELECT y FROM tri
       |         UNION ALL SELECT z FROM tri) GROUP BY host)
       |SELECT deg.h AS host, deg.deg AS degree,
       |       COALESCE(cnt.n_triangles, 0) AS n_triangles
       |FROM deg LEFT JOIN cnt ON cnt.host = deg.h
       |ORDER BY host""".stripMargin

  /** q187 oracle: 3 unrolled BFS relaxation rounds over the
    * undirected host graph with the same explicit null-handling CASE
    * as the Spark loop. */
  private val q187OracleSql: String = {
    val iters = (1 to 3).map { k =>
      s"""c$k AS (SELECT b.b AS host, MIN(d.dist + 1) AS cand
         |       FROM bidir b JOIN d${k - 1} d ON d.host = b.a
         |       WHERE d.dist IS NOT NULL GROUP BY b.b),
         |d$k AS (SELECT d.host,
         |               CASE WHEN d.dist IS NULL THEN c.cand
         |                    WHEN c.cand IS NULL THEN d.dist
         |                    WHEN c.cand < d.dist THEN c.cand ELSE d.dist END AS dist
         |        FROM d${k - 1} d LEFT JOIN c$k c ON c.host = d.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH $hostEdgesCteSql,
       |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |        FROM edges WHERE src <> dst),
       |bidir AS (SELECT u AS a, v AS b FROM und
       |          UNION ALL SELECT v AS a, u AS b FROM und),
       |nodes AS (SELECT DISTINCT a AS host FROM bidir),
       |seed AS (SELECT src AS host FROM
       |         (SELECT src, SUM(w) AS tw FROM edges GROUP BY src)
       |         ORDER BY tw DESC, src LIMIT 1),
       |d0 AS (SELECT nodes.host,
       |              CASE WHEN seed.host IS NOT NULL THEN 0 END AS dist
       |       FROM nodes LEFT JOIN seed ON seed.host = nodes.host),
       |$iters
       |SELECT host, CAST(COALESCE(dist, -1) AS BIGINT) AS dist
       |FROM d3 ORDER BY host""".stripMargin
  }

  /** q205 oracle: 2 unrolled HITS rounds — inflow/outflow sums in
    * HUGEINT, L1 normalization (x·S) // Σx after each half-step,
    * matching the Spark loop's DECIMAL(38,0) DIV exactly. */
  private val q205OracleSql: String = {
    val S = "1000000000000"
    val rounds = (1 to 2).map { k =>
      s"""ar$k AS (SELECT e.dst AS host, SUM(h${k - 1}.h * e.w) AS araw
         |        FROM edges e JOIN h${k - 1} ON h${k - 1}.host = e.src GROUP BY e.dst),
         |asum$k AS (SELECT SUM(araw) AS s FROM ar$k),
         |a$k AS (SELECT nodes.host, (COALESCE(ar$k.araw, 0) * $S) // s AS a
         |        FROM nodes CROSS JOIN asum$k
         |        LEFT JOIN ar$k ON ar$k.host = nodes.host),
         |hr$k AS (SELECT e.src AS host, SUM(a$k.a * e.w) AS hraw
         |        FROM edges e JOIN a$k ON a$k.host = e.dst GROUP BY e.src),
         |hsum$k AS (SELECT SUM(hraw) AS s FROM hr$k),
         |h$k AS (SELECT nodes.host, (COALESCE(hr$k.hraw, 0) * $S) // s AS h
         |        FROM nodes CROSS JOIN hsum$k
         |        LEFT JOIN hr$k ON hr$k.host = nodes.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH $hostEdgesCteSql,
       |nodes AS (SELECT DISTINCT host FROM
       |          (SELECT src AS host FROM edges UNION SELECT dst FROM edges)),
       |h0 AS (SELECT host, CAST($S AS HUGEINT) AS h FROM nodes),
       |$rounds
       |SELECT h2.host, CAST(h2.h AS BIGINT) AS hub_fp, CAST(a2.a AS BIGINT) AS auth_fp,
       |       (CAST(h2.h AS DOUBLE) / $S.0) AS hub,
       |       (CAST(a2.a AS DOUBLE) / $S.0) AS authority
       |FROM h2 JOIN a2 USING (host)
       |ORDER BY host""".stripMargin
  }

  private def graphQueries: Seq[QuerySpec] = Seq(
    // deterministic fixed-point PageRank (damping 0.85, 3 synchronous
    // iterations): scaled-BIGINT rank mass with floor division, so
    // the iteration replays bit-exact in any engine — the domain
    // authority prior the web-curation family weights quality by.
    QuerySpec(
      "q169_host_pagerank",
      (s, dir) => GraphOps.pagerank(GraphOps.hostLinks(Tables.documents(s, dir))),
      Some(q169OracleSql)),

    // deterministic integer HITS (2 rounds): hub/authority scores
    // with exact L1 normalization per half-step — the link-farm /
    // mirror-hub signal PageRank alone can't separate.
    QuerySpec(
      "q205_host_hits",
      (s, dir) => GraphOps.hits(GraphOps.hostLinks(Tables.documents(s, dir))),
      Some(q205OracleSql)),

    // per-host triangle participation with the degree-ordered
    // orientation (every wedge enumerated once at its lowest-degree
    // vertex — the O(m^1.5) bound that survives hub skew); the
    // mirror-cluster density signal.
    QuerySpec(
      "q170_triangle_count",
      (s, dir) => GraphOps.triangleCounts(GraphOps.hostLinks(Tables.documents(s, dir))),
      Some(q170OracleSql)),

    // BFS hop distances from the heaviest host, 3 synchronous
    // relaxation rounds (frontier×edges join + min rollup per round —
    // the scalable BFS shape, no per-vertex driver loop); −1 =
    // unreached within the unroll.
    QuerySpec(
      "q187_bfs_hops",
      (s, dir) => GraphOps.bfsHops(GraphOps.hostLinks(Tables.documents(s, dir))),
      Some(q187OracleSql))
  )

  private def mlQueries: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q50_ml_correlation",
      (s, dir) => {
        val (feats, enc) = MLShared.features(s, dir)
        MLPipelines.correlationMatrix(feats, enc)
      },
      Some(q50OracleSql)),

    QuerySpec(
      "q51_ml_regression",
      (s, dir) => {
        import s.implicits._
        val (feats, _) = MLShared.features(s, dir)
        val (_, rmse) = MLShared.regression(s, dir)
        val n = feats.count()
        Seq(("linear_regression", n, rmse)).toDF("model", "n_rows", "rmse")
      },
      None),

    QuerySpec(
      "q52_ml_classification",
      (s, dir) => {
        import s.implicits._
        val (_, median, auc) = MLShared.classification(s, dir)
        Seq(("logistic_regression", median, auc)).toDF("model", "median_threshold", "auc")
      },
      None),

    QuerySpec(
      "q53_ml_kmeans",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit}
        val (feats, _) = MLShared.features(s, dir)
        val model = MLShared.clustering(s, dir)
        model.transform(feats)
          .groupBy(col("prediction"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("prediction"))
      },
      None),

    // PCA explained-variance report over the embedding corpus — the
    // dimensionality probe before ANN/whitening; eigensolver output
    // rounded to 9 ⇒ rows-only + MLSpec (descending ratios, sum ≤ 1).
    QuerySpec(
      "q185_pca_variance",
      (s, dir) => MLPipelines.pcaVarianceReport(Tables.embeddings(s, dir)),
      None),

    // hyperparameter sweep report: the fixed (regParam × elasticNet)
    // grid on the seeded split with per-candidate validation RMSE and
    // the winner flagged — seeded fits ⇒ rows-only; MLSpec asserts
    // winner minimality + determinism. Memoized like the other fits.
    QuerySpec(
      "q177_ml_param_sweep",
      (s, dir) => MLShared.sweep(s, dir),
      None)
  )

  // ---------------------------------------------------------------- //
  // round-2 additions: ingest pipeline (S3/S4), dashboard second-stage
  // rollups (§3.2), classification serving (§3.3), geocoding
  // enrichment (S6), materialized-view rebuild (S2)
  // ---------------------------------------------------------------- //
  /** Per-(tag, sfDir) scratch directory for write-path queries:
    * pid-tagged so two concurrent runs over the same sfDir never
    * write into each other's scratch space (VERDICT r3 robustness
    * note); Scratch-registered so repeated runs don't accumulate
    * pid-unique copies in the tmp dir. */
  private[queries] def tmpDir(tag: String, dir: String): String = Scratch.dir(
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${Integer.toHexString(dir.hashCode)}_${ProcessHandle.current().pid()}")

  private def ingestAndServing: Seq[QuerySpec] = {
    import org.apache.spark.sql.functions._
    def tmp(tag: String, dir: String) = tmpDir(tag, dir)
    Seq(
      QuerySpec(
        "q54_ingest_batch",
        (s, dir) => IngestOps.ingestBatch(s, Tables.orders(s, dir), tmp("ingest", dir)),
        Some("""SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
               |FROM orders WHERE o_orderkey <= 6000
               |ORDER BY o_orderkey""".stripMargin)),

      // cross-format sink/source interop: the slice lands as ORC and
      // must hash-match the parquet-sourced oracle after re-read.
      QuerySpec(
        "q112_orc_roundtrip",
        (s, dir) => WriteOps.orcRoundTrip(Tables.orders(s, dir), tmp("orc", dir)),
        Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
               |FROM orders WHERE o_orderkey <= 6000
               |ORDER BY o_orderkey""".stripMargin)),

      // the text-format interchange path: CSV write with header, read
      // back under an EXPLICIT schema (inference is a full extra pass
      // and a drift hazard at scale) — same slice as q112 so one
      // oracle text certifies every format's fidelity
      QuerySpec(
        "q308_csv_roundtrip",
        (s, dir) => WriteOps.csvRoundTrip(Tables.orders(s, dir), tmp("csvrt", dir)),
        Some("""SELECT o_orderkey, o_orderpriority, o_totalprice
               |FROM orders WHERE o_orderkey <= 6000
               |ORDER BY o_orderkey""".stripMargin)),

      // q54's slice with garbage injected into a landing page: the
      // PERMISSIVE + corrupt-record-column read quarantines malformed
      // lines and salvages every good row, so the clean output
      // hash-matches the SAME oracle as the garbage-free paths
      // (quarantined-line count asserted in IngestWriteSpec).
      QuerySpec(
        "q101_ingest_quarantine",
        (s, dir) => IngestOps.ingestQuarantine(
          s, Tables.orders(s, dir), tmp("ingest_q", dir)),
        Some("""SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
               |FROM orders WHERE o_orderkey <= 6000
               |ORDER BY o_orderkey""".stripMargin)),

      // functional-dependency profiler: does A determine B, checked
      // by data — one stack melt, one (fd, det) shuffle, one rollup;
      // almost-holding FDs mark dirty rows, exact ones join keys.
      QuerySpec(
        "q206_fd_profile",
        (s, dir) => IngestOps.functionalDependencyReport(Tables.orders(s, dir)),
        Some("""WITH m AS (
               |  SELECT 'o_orderkey->o_custkey' AS fd,
               |         CAST(o_orderkey AS VARCHAR) AS det,
               |         CAST(o_custkey AS VARCHAR) AS dep FROM orders
               |  UNION ALL
               |  SELECT 'o_custkey->o_orderpriority',
               |         CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
               |  UNION ALL
               |  SELECT 'o_orderstatus->o_orderpriority',
               |         o_orderstatus, o_orderpriority FROM orders),
               |k AS (SELECT fd, det, CAST(COUNT(DISTINCT dep) AS BIGINT) AS n_dep
               |      FROM m GROUP BY 1, 2)
               |SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
               |       CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
               |         AS n_violating_keys,
               |       CAST(MAX(n_dep) AS BIGINT) AS max_dep_per_key,
               |       SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS holds
               |FROM k GROUP BY fd ORDER BY fd""".stripMargin)),

      // categorical column profile: nulls, cardinality, deterministic
      // mode per audited column — describe() for string/key columns.
      QuerySpec(
        "q207_column_profile",
        (s, dir) => IngestOps.columnProfile(Tables.orders(s, dir)),
        Some("""WITH m AS (
               |  SELECT 'o_orderpriority' AS column_name, o_orderpriority AS v FROM orders
               |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
               |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
               |c AS (SELECT column_name, v, CAST(COUNT(*) AS BIGINT) AS cnt
               |      FROM m GROUP BY 1, 2),
               |s AS (SELECT column_name,
               |             CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_nulls,
               |             CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct,
               |             CAST(SUM(cnt) AS BIGINT) AS n_rows
               |      FROM c GROUP BY 1),
               |r AS (SELECT column_name, v AS top_value, cnt AS top_count,
               |             row_number() OVER (PARTITION BY column_name
               |                                ORDER BY cnt DESC, v ASC) AS rk
               |      FROM c WHERE v IS NOT NULL)
               |SELECT s.column_name, s.n_rows, s.n_nulls, s.n_distinct,
               |       r.top_value, r.top_count
               |FROM s JOIN r ON r.column_name = s.column_name AND r.rk = 1
               |ORDER BY s.column_name""".stripMargin)),

      // declarative data-quality expectations: PK uniqueness, FK
      // orphans (left-outer null count), null contract, value
      // ranges — the post-load audit gate; every rule one aggregate
      // or one anti-join-shaped count.
      QuerySpec(
        "q164_expectations",
        (s, dir) => IngestOps.expectationsReport(
          Tables.orders(s, dir), Tables.customer(s, dir), Tables.lineitem(s, dir)),
        Some("""WITH rules AS (
               |  SELECT 'orders_pk_unique' AS rule,
               |         CAST(COUNT(*) AS BIGINT) AS n_checked,
               |         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
               |  FROM orders
               |  UNION ALL
               |  SELECT 'lineitem_fk_orders', CAST(COUNT(*) AS BIGINT),
               |         CAST(COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS BIGINT)
               |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
               |  UNION ALL
               |  SELECT 'customer_nationkey_not_null', CAST(COUNT(*) AS BIGINT),
               |         CAST(COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END) AS BIGINT)
               |  FROM customer
               |  UNION ALL
               |  SELECT 'lineitem_quantity_in_1_50', CAST(COUNT(*) AS BIGINT),
               |         CAST(COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT)
               |  FROM lineitem
               |  UNION ALL
               |  SELECT 'orders_totalprice_positive', CAST(COUNT(*) AS BIGINT),
               |         CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
               |  FROM orders)
               |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
               |FROM rules ORDER BY rule""".stripMargin)),

      QuerySpec(
        "q55_dash_pie_rollup",
        (s, dir) => RelationalOps.dashSubAgencyRollup(Tables.orders(s, dir)),
        Some(s"""WITH monthly AS (
                |  SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS o_month,
                |         ${decSumSql("o_totalprice")} AS total_price
                |  FROM orders GROUP BY o_orderpriority, o_month),
                |top30 AS (
                |  SELECT * FROM monthly
                |  ORDER BY total_price DESC, o_orderpriority, o_month LIMIT 30)
                |SELECT o_orderpriority, ${decSumSql("total_price")} AS total_price,
                |       COUNT(*) AS n_months
                |FROM top30 GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)),

      QuerySpec(
        "q56_dash_line_rollup",
        (s, dir) => RelationalOps.dashMonthRollup(Tables.orders(s, dir)),
        Some(s"""WITH monthly AS (
                |  SELECT o_orderpriority, CAST(month(o_orderdate) AS BIGINT) AS o_month,
                |         ${decSumSql("o_totalprice")} AS total_price
                |  FROM orders GROUP BY o_orderpriority, o_month),
                |top30 AS (
                |  SELECT * FROM monthly
                |  ORDER BY total_price DESC, o_orderpriority, o_month LIMIT 30)
                |SELECT o_month, ${decSumSql("total_price")} AS total_price,
                |       COUNT(*) AS n_agencies
                |FROM top30 GROUP BY o_month
                |ORDER BY o_month""".stripMargin)),

      QuerySpec(
        "q57_classify_infer",
        (s, dir) => {
          val (model, _, _) = MLShared.classification(s, dir)
          inferSlice(s, dir, model)
        },
        None),

      // S9 made catalog-visible: save the fitted classification model,
      // load it back, and serve the q57 inference slice from the LOADED
      // model — the reference's train-offline / load-at-startup path.
      QuerySpec(
        "q65_model_persist_infer",
        (s, dir) => {
          val (model, _, _) = MLShared.classification(s, dir)
          val path = tmp("model", dir)
          MLPipelines.saveModel(model, path)
          inferSlice(s, dir, MLPipelines.loadModel(path))
        },
        None),

      QuerySpec(
        "q58_geo_enrich_rollup",
        (s, dir) => GeoOps.geoEnrichedRollup(
          Tables.lineitem(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir)),
        Some(s"""WITH geo AS (
                |  SELECT n_name,
                |         CAST(((length(n_name) * 7 + ascii(substr(n_name, 1, 1)) * 3) % 120) - 60 + 0.5 AS DOUBLE) AS latitude,
                |         CAST(((length(n_name) * 13 + ascii(substr(n_name, 1, 1)) * 5) % 360) - 180 + 0.25 AS DOUBLE) AS longitude
                |  FROM nation)
                |SELECT n_name, latitude, longitude,
                |       ${decSumSql("l_extendedprice")} AS total_amount,
                |       COUNT(*) AS n_items
                |FROM lineitem
                |JOIN supplier ON l_suppkey = s_suppkey
                |JOIN nation ON s_nationkey = n_nationkey
                |JOIN geo USING (n_name)
                |GROUP BY n_name, latitude, longitude
                |ORDER BY n_name""".stripMargin)),

      // q54's slice landed through Structured Streaming instead of the
      // driver batch loop: pages staged to a landing zone, consumed
      // with Trigger.AvailableNow into the same partitioned layout —
      // same oracle, so the two ingest paths are proven equivalent.
      QuerySpec(
        "q76_ingest_stream",
        (s, dir) => IngestOps.ingestStream(s, Tables.orders(s, dir), tmp("ingest_stream", dir)),
        Some("""SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
               |FROM orders WHERE o_orderkey <= 6000
               |ORDER BY o_orderkey""".stripMargin)),

      // Incremental keyed MV maintenance: full rebuild, then ONE key's
      // slice refreshed through dynamic partition overwrite — only that
      // key's directory is rewritten (untouched partitions asserted
      // byte-identical in IngestWriteSpec); the re-read view must still
      // equal the full aggregate.
      // q76 ∘ q77 as ONE streaming pipeline: stateful keyed aggregate
      // in update mode, changed keys upserted per micro-batch via
      // dynamic partition overwrite (maxFilesPerTrigger=1 → the zone
      // replays page by page with state carried across batches)
      QuerySpec(
        "q80_streaming_mv_maintain",
        (s, dir) => {
          import org.apache.spark.sql.functions.col
          val base = tmp("mv_stream", dir)
          IngestOps.stageFixture(s, Tables.orders(s, dir), s"$base/landing")
          IngestOps.runMvMaintain(s, s"$base/landing", s"$base/mv", s"$base/ckpt")
            .select(col("o_orderpriority"), col("total_price"), col("n_orders"))
            .orderBy(col("o_orderpriority"))
        },
        Some(s"""SELECT o_orderpriority, ${decSumSql("o_totalprice")} AS total_price,
                |       COUNT(*) AS n_orders
                |FROM orders WHERE o_orderkey <= 6000
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)),

      QuerySpec(
        "q77_mv_incremental_refresh",
        (s, dir) => {
          import org.apache.spark.sql.functions.{col, min}
          val agg = RelationalOps.geoRollup(
            Tables.lineitem(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))
          val path = tmp("mv_inc", dir)
          val rebuilt = WriteOps.rebuild(agg, path, Seq("n_name"))
          // refresh one key present at every scale factor: the rollup's
          // minimum nation (sf0.001 has suppliers in only 10 nations).
          // Probed from the just-rebuilt view (25 tiny files) instead
          // of re-running the join+rollup a second time (r18): the
          // view IS agg, so min(n_name) is identical by construction
          val hotKey = rebuilt.agg(min(col("n_name"))).head().getString(0)
          WriteOps.refreshPartitions(
            agg.filter(col("n_name") === hotKey), path, Seq("n_name"))
          s.read.parquet(path)
            .select(col("s_name"), col("n_name"), col("total_amount"), col("n_items"))
            .orderBy(col("s_name"))
        },
        Some(s"""SELECT s_name, n_name, ${decSumSql("l_extendedprice")} AS total_amount,
                |       COUNT(*) AS n_items
                |FROM lineitem
                |JOIN supplier ON l_suppkey = s_suppkey
                |JOIN nation   ON s_nationkey = n_nationkey
                |GROUP BY s_name, n_name
                |ORDER BY s_name""".stripMargin)),

      QuerySpec(
        "q59_mv_rebuild",
        (s, dir) => {
          val agg = RelationalOps.geoRollup(
            Tables.lineitem(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))
          WriteOps.rebuild(agg, tmp("mv", dir), Seq("n_name"))
            .select(col("s_name"), col("n_name"), col("total_amount"), col("n_items"))
            .orderBy(col("s_name"))
        },
        Some(s"""SELECT s_name, n_name, ${decSumSql("l_extendedprice")} AS total_amount,
                |       COUNT(*) AS n_items
                |FROM lineitem
                |JOIN supplier ON l_suppkey = s_suppkey
                |JOIN nation   ON s_nationkey = n_nationkey
                |GROUP BY s_name, n_name
                |ORDER BY s_name""".stripMargin)),

      // lossless MV rollup chain: monthly report computed FROM the
      // stored daily partials (count + exact DECIMAL sum compose);
      // the oracle aggregates raw events directly — hash equality
      // proves the day→month chain loses nothing.
      QuerySpec(
        "q210_rollup_chain",
        (s, dir) => WriteOps.rollupChain(Tables.events(s, dir)),
        Some("""SELECT event_type,
               |       CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month,
               |       CAST(COUNT(*) AS BIGINT) AS n_events,
               |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
               |FROM events GROUP BY 1, 2
               |ORDER BY event_type, month""".stripMargin))
    )
  }
}
