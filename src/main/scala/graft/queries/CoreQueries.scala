package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Core relational operator surface (SURVEY.md §2): scan/filter/project,
  * every join type the reference recognizes, positional UNION,
  * (distinct) aggregation, the §2.8 expression inventory, star
  * expansion, subquery aliases — plus the standard SQL constructs the
  * reference lacks but an analytics engine needs (windows, HAVING,
  * ORDER BY/LIMIT, INTERSECT/EXCEPT, CTE, ROLLUP, scalar subqueries).
  *
  * Every query is declarative DataFrame/SQL — Catalyst handles pushdown,
  * pruning and join selection; small dimension sides are broadcast
  * explicitly. Every query ends in ORDER BY on a unique key for oracle
  * determinism.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3 + §2.2 + §2.3: scan with pushed filter, pruned projection.
    "q01_scan_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < ts("1996-01-01") && col("l_quantity") > 47)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // §2.5: grouped aggregation, TPC-H Q1 shape, exact-decimal sums.
    "q02_agg_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (decOne - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          avgExact(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.4 inner join ×2 + §2.5, TPC-H Q3 shape; customer side broadcast.
    "q03_join_inner_topn" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < ts("1997-06-01"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1997-06-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(dec(col("l_extendedprice")) * (decOne - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // §2.4 LEFT OUTER: orders with/without high-quantity line items.
    "q04_join_left" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 49)
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_big"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), coalesce(col("n_big"), lit(0L)).as("n_big_items"))
        .orderBy("o_orderkey")
    }),

    // §2.4 RIGHT OUTER: sparse supplier side against full nation list.
    "q05_join_right" -> ((s, dir) => {
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"), "right")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("s_suppkey"), lit(-1L)).as("suppkey"))
        .orderBy("n_nationkey", "suppkey")
    }),

    // §2.4 FULL OUTER over two pre-aggregated sides.
    "q06_join_full" -> ((s, dir) => {
      val c = t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
      val sp = t(s, dir, "supplier").groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("c_nationkey") === col("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    }),

    // §2.4 LEFT SEMI (EXISTS): customers with a 1996 order.
    "q07_join_semi" -> ((s, dir) => {
      val o96 = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      t(s, dir, "customer")
        .join(o96, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // LEFT ANTI (NOT EXISTS): customers without a 1996 order.
    "q08_join_anti" -> ((s, dir) => {
      val o96 = t(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      t(s, dir, "customer")
        .join(o96, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.6 positional UNION ALL across heterogeneous sources.
    "q09_union_all" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey").as("id"), lit("customer").as("kind"))
        .unionAll(t(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), lit("supplier").as("kind")))
        .orderBy("id", "kind")
    }),

    // §2.6 UNION DISTINCT (set semantics, shuffle dedup).
    "q10_union_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
        .union(t(s, dir, "supplier").select(col("s_suppkey").as("k")))
        .distinct()
        .orderBy("k")
    }),

    // §2.5/E5: DISTINCT aggregates.
    "q11_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // E6/E7/E8: CASE WHEN, IN, IS NULL.
    "q12_case_in_null" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("size_class"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("is_urgent"),
        col("o_orderstatus").isNull.as("status_null"))
        .orderBy("o_orderkey")
    }),

    // E9: CONCAT / NVL(coalesce) / date_sub.
    "q13_concat_nvl_datesub" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        concat(col("o_orderstatus"), lit("/"), col("o_orderpriority")).as("tag"),
        date_sub(col("o_orderdate").cast("date"), 30).as("d_minus_30"),
        coalesce(col("o_orderpriority"), lit("NONE")).as("prio"))
        .orderBy("o_orderkey")
    }),

    // §2.2 star expansion.
    "q14_star_expansion" -> ((s, dir) =>
      t(s, dir, "nation").select(col("*")).orderBy("n_nationkey")),

    // §2.7 subquery alias chase (SQL path, also a lineage fixture).
    "q15_subquery_alias" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT x.k, x.n_name, x.r_name
        FROM (SELECT n_nationkey AS k, n_name, r_name
              FROM nation JOIN region ON n_regionkey = r_regionkey) x
        WHERE x.r_name <> 'ASIA'
        ORDER BY x.k""")
    }),

    // Window functions: rank + exact running sum per customer.
    "q16_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
        .orderBy("o_custkey", "rn")
    }),

    // GROUP BY + HAVING.
    "q17_having" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
        .filter(col("n_cust") >= 5)
        .orderBy("c_nationkey")
    }),

    // ORDER BY ... LIMIT top-k (TakeOrderedAndProject, no full sort).
    "q18_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    // INTERSECT: customers ordering in both 1995 and 1996.
    "q19_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c95 = o.filter(col("o_orderdate") >= ts("1995-01-01") &&
        col("o_orderdate") < ts("1996-01-01")).select(col("o_custkey").as("k"))
      val c96 = o.filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01")).select(col("o_custkey").as("k"))
      c95.intersect(c96).orderBy("k")
    }),

    // EXCEPT: 1995 customers who did not order in 1996.
    "q20_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c95 = o.filter(col("o_orderdate") >= ts("1995-01-01") &&
        col("o_orderdate") < ts("1996-01-01")).select(col("o_custkey").as("k"))
      val c96 = o.filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01")).select(col("o_custkey").as("k"))
      c95.except(c96).orderBy("k")
    }),

    // CTE (WITH) through the SQL parser — also a lineage fixture.
    "q21_cte" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH per_nation AS (
          SELECT c_nationkey AS k, count(*) AS n_cust
          FROM customer GROUP BY c_nationkey)
        SELECT n.n_name, p.n_cust
        FROM per_nation p JOIN nation n ON p.k = n.n_nationkey
        ORDER BY n.n_name""")
    }),

    // ROLLUP hierarchy totals (names coalesced for null-free ordering).
    "q22_rollup" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               count(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region, nation""")
    }),

    // Scalar subquery in a predicate (exact arithmetic only).
    "q23_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice * 2 > (SELECT max(o_totalprice) FROM orders)
        ORDER BY o_orderkey""")
    }),

    // E2 LIKE + E3 arithmetic (incl %) + E4 bitwise + unary minus.
    "q25_like_arith_bitwise" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderpriority").like("1%").as("is_urgent_like"),
        (col("o_orderkey") % 7).as("mod7"),
        col("o_orderkey").bitwiseAND(255).as("low_byte"),
        col("o_orderkey").bitwiseOR(4096).as("with_flag"),
        col("o_orderkey").bitwiseXOR(21).as("xored"),
        (-col("o_orderkey")).as("negated"),
        (col("o_orderkey") * 3 + 1).as("affine"))
        .orderBy("o_orderkey")
    }),

    // E11 subscript access into an array column (1-based element_at).
    "q26_array_subscript" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        element_at(col("embedding"), 1).as("e_first"),
        element_at(col("embedding"), 64).as("e_last"),
        size(col("embedding")).cast("long").as("dim"))
        .orderBy("vec_id")
    }),

    // §2.4 CROSS JOIN executable path (joinTag already maps Cross —
    // LineageParser; reference LineParser.java:273-289 join-type table).
    // Both sides are dimension tables: Spark broadcasts the smaller and
    // plans BroadcastNestedLoopJoin — no shuffle at any scale.
    "q27_cross_join" -> ((s, dir) => {
      t(s, dir, "nation").crossJoin(t(s, dir, "region"))
        .select(col("n_name"), col("r_name"),
          (col("n_nationkey") * 5 + col("r_regionkey")).as("pair_id"))
        .orderBy("pair_id")
    }),

    // S4/S5 executable sink path: CTAS into the session warehouse, then
    // read the table back — completes SURVEY §7.2's INSERT-shaped slice
    // on the executable side (the parse side is lineage corpus 14/21).
    // The sink result must round-trip losslessly: the oracle checks the
    // read-back rows against the underlying SELECT.
    "q28_ctas_roundtrip" -> ((s, dir) => {
      val src = t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,3)")).cast("double")
            .as("sum_price"))
      s.sql("DROP TABLE IF EXISTS graft_ctas_roundtrip")
      // DROP alone is not idempotent across sessions: an in-memory
      // catalog forgets the table while its warehouse directory
      // persists, and saveAsTable refuses an existing location —
      // remove the physical path too.
      val loc = new org.apache.hadoop.fs.Path(
        s.sessionState.conf.warehousePath, "graft_ctas_roundtrip")
      loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
      src.write.mode("overwrite").saveAsTable("graft_ctas_roundtrip")
      s.table("graft_ctas_roundtrip").orderBy("o_orderpriority")
    }),

    // NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    // match the dimension's NULL row instead of dropping — completes
    // the join-operator family (q03-q08, q27). The '3-MEDIUM' priority
    // is nulled on BOTH sides, so a plain inner join would lose those
    // 3,003 orders; the UNKNOWN output row proves they survive. The
    // null-safe predicate still hash-partitions both sides (NULL is an
    // ordinary key value to `<=>`), so the plan is a normal equi-join,
    // not a nested loop.
    "q29_join_null_safe" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(expr("nullif(o_orderpriority, '3-MEDIUM')").as("pr"),
          col("o_totalprice"))
      val dim = t(s, dir, "orders")
        .select(expr("nullif(o_orderpriority, '3-MEDIUM')").as("dpr"))
        .distinct()
        .select(col("dpr"), coalesce(col("dpr"), lit("UNKNOWN")).as("grp"))
      o.join(dim, col("pr") <=> col("dpr"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,3)")).cast("double")
            .as("sum_price"))
        .orderBy("grp")
    }),

    // Full grouping-sets lattice (completes ROLLUP/q22): every
    // (region, nation) aggregation combination in one pass over the
    // join — Expand feeds one shuffle, not 4 scans.
    "q78_cube" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               count(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE(r_name, n_name)
        ORDER BY region, nation""")
    }),

    // Explicit GROUPING SETS with grouping() markers: the general form
    // behind ROLLUP/CUBE — hand-picked lattice levels, and the marker
    // distinguishes "aggregated over" from a genuine NULL.
    "q81_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               CAST(grouping(r_name) AS BIGINT) AS g_region,
               CAST(grouping(n_name) AS BIGINT) AS g_nation,
               count(*) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        ORDER BY region, nation""")
    }),

    // Multiset set-ops (the ALL variants of q19/q20): duplicates carry
    // multiplicity through the operator. Identical surviving rows are
    // interchangeable, so ORDER BY the value is hash-stable.
    "q79_except_all" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val o = t(s, dir, "orders").select(col("o_orderkey").as("k"))
      li.exceptAll(o).orderBy("k")
    }),

    "q80_intersect_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").select(col("l_suppkey").as("k"))
      val b = t(s, dir, "lineitem").filter(col("l_quantity") > 25)
        .select(col("l_suppkey").as("k"))
      a.intersectAll(b).orderBy("k")
    }),

    // Date-partitioned layout + partition pruning: write events
    // partitioned by event_date, read back with a partition predicate.
    // At 100 TB this is THE first-order I/O lever — the filter must
    // prune at the DIRECTORY level (PlanSpec pins PartitionFilters), so
    // a day query reads 1/30th of the files, not a filtered full scan.
    "q70_partition_pruning" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q70_bydate"
      t(s, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(path)
      s.read.parquet(path)
        .filter(col("event_date") === lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
        .orderBy("event_type")
    }),

    // Bucketed co-located join: both sides written bucketed on the join
    // key; the sort-merge join then runs with NO exchange on either
    // side (PlanSpec pins the absence). The pre-shuffled layout a
    // recurring 100 TB fact-fact join amortizes its shuffle into.
    "q71_bucketed_join" -> ((s, dir) => {
      def rewrite(name: String, df: DataFrame, key: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $name")
        val loc = new org.apache.hadoop.fs.Path(
          s.sessionState.conf.warehousePath, name)
        loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key)
          .saveAsTable(name)
      }
      // The two bucketed rewrites are independent table writes —
      // overlap them (guide §2.6) instead of paying both write jobs'
      // latency sequentially.
      locally {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        try {
          val jobs = Seq(
            () => rewrite("graft_li_bucketed",
              t(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
              "l_orderkey"),
            () => rewrite("graft_ord_bucketed",
              t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
              "o_orderkey")
          ).map(f => pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = f()
          }))
          jobs.foreach(_.get())
        } catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        } finally pool.shutdown()
      }
      // hint MERGE: the fixture tables are small enough that AQE would
      // broadcast and ignore the bucketing — the point here is the
      // co-located sort-merge path a 100 TB fact-fact join takes, where
      // neither side broadcasts.
      s.table("graft_li_bucketed").hint("merge")
        .join(s.table("graft_ord_bucketed").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(18,3)")).cast("double")
            .as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // q101: six-table star join (the TPC-H Q5 shape) — region filter
    // reaches the dimension scan, the small dims broadcast, and the
    // fact-side revenue folds in exact decimals. The flagship
    // "Catalyst picks the join order/strategies" query at warehouse
    // scale.
    "q101_star_join_revenue" -> ((s, dir) => {
      val dec18 = (c: Column) => c.cast("decimal(18,3)")
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(dec18(col("l_extendedprice")) *
            (lit(1) - dec18(col("l_discount")))).cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    // Z-order layout (Layout.morton): Morton-interleave two bounded
    // dims of lineitem and group by the 128×128 tile the top z-bits
    // define. The per-tile min/max bounds ARE the pruning property: a
    // z-sorted write gives every parquet file tight stats on BOTH
    // columns (each ≤128-wide here, vs one tight + one full-range for
    // a plain sort), so either dimension's predicates skip files.
    // Pure codegen'd bit math, zero shuffle before the tile agg.
    "q85_zorder_layout" -> ((s, dir) => {
      val pts = t(s, dir, "lineitem").select(
        (col("l_partkey") % 1024).cast("long").as("x"),
        (col("l_orderkey") % 1024).cast("long").as("y"))
      pts.withColumn("zval", graft.operators.Layout.morton(col("x"), col("y"), 10))
        .groupBy(shiftright(col("zval"), 14).as("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("tile")
    }),

    // CSV source/sink: write headered CSV, read back with the explicit
    // schema (never inferred). Free-text stays out of CSV — that's the
    // JSON round-trip's job (q57).
    "q55_csv_roundtrip" -> ((s, dir) => {
      val meta = t(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q55_csv"
      graft.sources.Warehouse.writeCsv(meta, path)
      graft.sources.Warehouse.readCsv(s, path, meta.schema).orderBy("doc_id")
    }),

    // q106: cross-format federation check — the same table written to
    // CSV and ORC, read back, and certified equal to the parquet base
    // via Reconcile digests (XOR row hashes over integer-rendered
    // strings). One digest row per bucket, with the equality verdicts;
    // at 100 TB this is how a format migration proves itself without a
    // row-by-row diff.
    "q106_format_federation" -> ((s, dir) => {
      import graft.sources.Warehouse
      val meta = t(s, dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
      val tmp = System.getProperty("java.io.tmpdir")
      Warehouse.writeCsv(meta, s"$tmp/graft_q106_csv")
      Warehouse.writeOrc(meta, s"$tmp/graft_q106_orc")
      val csv = Warehouse.readCsv(s, s"$tmp/graft_q106_csv", meta.schema)
      val orc = Warehouse.readOrc(s, s"$tmp/graft_q106_orc")
      def dig(df: DataFrame, n: String) = graft.operators.Reconcile.digest(df,
        col("doc_id") % 16,
        concat_ws("|", col("doc_id"), col("lang"), col("source"),
          col("n_chars")))
        .select(col("bucket"), col("n_rows").as(s"n_$n"),
          col("digest").as(s"digest_$n"))
      dig(meta, "pq").join(dig(csv, "csv"), Seq("bucket"))
        .join(dig(orc, "orc"), Seq("bucket"))
        .withColumn("all_equal",
          col("digest_pq") === col("digest_csv") &&
            col("digest_pq") === col("digest_orc") &&
            col("n_pq") === col("n_csv") && col("n_pq") === col("n_orc"))
        .orderBy("bucket")
    }),

    // ORC source/sink: full-fidelity columnar round-trip including the
    // free-text column (ORC handles arbitrary strings natively, unlike
    // CSV). The oracle reads the original parquet — a lossless format
    // conversion is invisible to the hash compare.
    "q93_orc_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q93_orc"
      graft.sources.Warehouse.writeOrc(docs, path)
      graft.sources.Warehouse.readOrc(s, path).orderBy("doc_id")
    }),

    // JSON-lines source/sink: lossless string round-trip including the
    // free-text column (quotes/newlines escape), explicit schema.
    "q57_json_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_q57_json"
      graft.sources.Warehouse.writeJsonLines(docs, path)
      graft.sources.Warehouse.readJsonLines(s, path, docs.schema)
        .orderBy("doc_id")
    }),

    // JDBC source/sink round-trip against embedded Derby — the
    // executable data path next to JdbcMetadataProvider's lookup path
    // (together they mirror and extend the reference's JDBC connector,
    // its only real one). Aggregate out, RDBMS table in, read back;
    // the oracle is the underlying SELECT, so any type mangling in the
    // JDBC writer/reader (strings→CLOB, longs→BIGINT) diverges the
    // hash.
    "q135_jdbc_roundtrip" -> ((s, dir) => {
      val agg = t(s, dir, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
      val url = "jdbc:derby:memory:graftq135;create=true"
      graft.sources.Warehouse.writeJdbc(agg, url, "graft_q135")
      graft.sources.Warehouse.readJdbc(s, url, "graft_q135")
        .orderBy("source", "lang")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 47
         ORDER BY l_orderkey, l_linenumber""",

    "q02_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) *
                         (CAST(1 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS sum_disc_price,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q03_join_inner_topn" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3)) *
                         (CAST(1 AS DECIMAL(18,3)) - CAST(l_discount AS DECIMAL(18,3)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-06-01'
           AND l_shipdate > TIMESTAMP '1997-06-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey
         LIMIT 10""",

    "q04_join_left" ->
      """SELECT o_orderkey, COALESCE(n_big, 0) AS n_big_items
         FROM orders LEFT JOIN
           (SELECT l_orderkey, count(*) AS n_big
            FROM lineitem WHERE l_quantity >= 49 GROUP BY l_orderkey) b
           ON o_orderkey = b.l_orderkey
         ORDER BY o_orderkey""",

    "q05_join_right" ->
      """SELECT n_nationkey, n_name, COALESCE(s_suppkey, -1) AS suppkey
         FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
         ORDER BY n_nationkey, suppkey""",

    "q06_join_full" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
                COALESCE(c.n_cust, 0) AS n_cust,
                COALESCE(s.n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
         FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
           ON c.c_nationkey = s.s_nationkey
         ORDER BY nationkey""",

    "q07_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '1996-01-01'
                         AND o_orderdate < TIMESTAMP '1997-01-01')
         ORDER BY c_custkey""",

    "q08_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '1996-01-01'
                             AND o_orderdate < TIMESTAMP '1997-01-01')
         ORDER BY c_custkey""",

    "q09_union_all" ->
      """SELECT * FROM (
           SELECT c_custkey AS id, 'customer' AS kind FROM customer
           UNION ALL
           SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier)
         ORDER BY id, kind""",

    "q10_union_distinct" ->
      """SELECT * FROM (
           SELECT l_suppkey AS k FROM lineitem
           UNION
           SELECT s_suppkey AS k FROM supplier)
         ORDER BY k""",

    "q11_count_distinct" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps,
                count(*) AS n_rows
         FROM lineitem
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    "q12_case_in_null" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 300000 THEN 'big'
                     WHEN o_totalprice > 150000 THEN 'mid'
                     ELSE 'small' END AS size_class,
                o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_urgent,
                o_orderstatus IS NULL AS status_null
         FROM orders
         ORDER BY o_orderkey""",

    "q13_concat_nvl_datesub" ->
      """SELECT o_orderkey,
                o_orderstatus || '/' || o_orderpriority AS tag,
                CAST(o_orderdate AS DATE) - 30 AS d_minus_30,
                COALESCE(o_orderpriority, 'NONE') AS prio
         FROM orders
         ORDER BY o_orderkey""",

    "q14_star_expansion" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "q15_subquery_alias" ->
      """SELECT x.k, x.n_name, x.r_name
         FROM (SELECT n_nationkey AS k, n_name, r_name
               FROM nation JOIN region ON n_regionkey = r_regionkey) x
         WHERE x.r_name <> 'ASIA'
         ORDER BY x.k""",

    "q16_window_running" ->
      """SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,3)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders
         ORDER BY o_custkey, rn""",

    "q17_having" ->
      """SELECT c_nationkey, count(*) AS n_cust
         FROM customer
         GROUP BY c_nationkey
         HAVING count(*) >= 5
         ORDER BY c_nationkey""",

    "q18_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 25""",

    "q19_intersect" ->
      """SELECT * FROM (
           SELECT o_custkey AS k FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
           INTERSECT
           SELECT o_custkey AS k FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
         ORDER BY k""",

    "q20_except" ->
      """SELECT * FROM (
           SELECT o_custkey AS k FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
           EXCEPT
           SELECT o_custkey AS k FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
         ORDER BY k""",

    "q21_cte" ->
      """WITH per_nation AS (
           SELECT c_nationkey AS k, count(*) AS n_cust
           FROM customer GROUP BY c_nationkey)
         SELECT n.n_name, p.n_cust
         FROM per_nation p JOIN nation n ON p.k = n.n_nationkey
         ORDER BY n.n_name""",

    "q22_rollup" ->
      """SELECT COALESCE(r_name, 'ALL') AS region,
                COALESCE(n_name, 'ALL') AS nation,
                count(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY region, nation""",

    "q23_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
         FROM orders
         WHERE o_totalprice * 2 > (SELECT max(o_totalprice) FROM orders)
         ORDER BY o_orderkey""",

    "q25_like_arith_bitwise" ->
      """SELECT o_orderkey,
                o_orderpriority LIKE '1%' AS is_urgent_like,
                o_orderkey % 7 AS mod7,
                o_orderkey & 255 AS low_byte,
                o_orderkey | 4096 AS with_flag,
                xor(o_orderkey, 21) AS xored,
                -o_orderkey AS negated,
                o_orderkey * 3 + 1 AS affine
         FROM orders
         ORDER BY o_orderkey""",

    "q26_array_subscript" ->
      """SELECT vec_id,
                embedding[1] AS e_first,
                embedding[64] AS e_last,
                len(embedding)::BIGINT AS dim
         FROM embeddings
         ORDER BY vec_id""",

    "q27_cross_join" ->
      """SELECT n_name, r_name,
                n_nationkey * 5 + r_regionkey AS pair_id
         FROM nation CROSS JOIN region
         ORDER BY pair_id""",

    // The oracle for the CTAS round-trip is the underlying SELECT: if
    // the write or read-back corrupted anything, the hashes diverge.
    "q28_ctas_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    // IS NOT DISTINCT FROM — the nulled priority matches the dim's
    // NULL row, surfacing as UNKNOWN.
    "q29_join_null_safe" ->
      """WITH o AS (SELECT nullif(o_orderpriority, '3-MEDIUM') AS pr,
                           o_totalprice
                    FROM orders),
         dim AS (SELECT dpr, coalesce(dpr, 'UNKNOWN') AS grp FROM
                   (SELECT DISTINCT nullif(o_orderpriority, '3-MEDIUM')
                      AS dpr FROM orders))
         SELECT grp, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE)
                  AS sum_price
         FROM o JOIN dim ON o.pr IS NOT DISTINCT FROM dim.dpr
         GROUP BY grp
         ORDER BY grp""",

    // Round-trip oracles are the underlying SELECT on the parquet
    // source: any loss in the CSV/JSON write+read diverges the hash.
    "q55_csv_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars
         FROM documents ORDER BY doc_id""",

    "q135_jdbc_roundtrip" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         GROUP BY source, lang
         ORDER BY source, lang""",

    "q78_cube" ->
      """SELECT COALESCE(r_name, 'ALL') AS region,
                COALESCE(n_name, 'ALL') AS nation,
                count(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY CUBE(r_name, n_name)
         ORDER BY region, nation""",

    "q81_grouping_sets" ->
      """SELECT COALESCE(r_name, 'ALL') AS region,
                COALESCE(n_name, 'ALL') AS nation,
                CAST(grouping(r_name) AS BIGINT) AS g_region,
                CAST(grouping(n_name) AS BIGINT) AS g_nation,
                count(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
         ORDER BY region, nation""",

    "q79_except_all" ->
      """SELECT l_orderkey AS k FROM lineitem
         EXCEPT ALL
         SELECT o_orderkey AS k FROM orders
         ORDER BY k""",

    "q80_intersect_all" ->
      """SELECT l_suppkey AS k FROM lineitem
         INTERSECT ALL
         SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 25
         ORDER BY k""",

    // The layout round-trips losslessly, so the oracle is the plain
    // filtered aggregation over the source table.
    "q70_partition_pruning" ->
      """SELECT event_type, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
         FROM events
         WHERE CAST(ts AS DATE) = DATE '2024-01-15'
         GROUP BY event_type
         ORDER BY event_type""",

    "q71_bucketed_join" ->
      """SELECT o_orderpriority,
                count(*) AS n_lines,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sum_qty
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "q57_json_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""",

    "q93_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents ORDER BY doc_id""",

    // Round-trips are lossless, so all three digests equal the one the
    // oracle computes from the parquet base.
    "q106_format_federation" ->
      """WITH d AS (
           SELECT doc_id % 16 AS bucket,
                  CAST(count(*) AS BIGINT) AS n,
                  bit_xor(('0x'||substr(md5(
                    concat_ws('|', doc_id, lang, source, n_chars)),1,15))::BIGINT)
                    AS digest
           FROM documents GROUP BY bucket)
         SELECT bucket, n AS n_pq, digest AS digest_pq,
                n AS n_csv, digest AS digest_csv,
                n AS n_orc, digest AS digest_orc,
                true AS all_equal
         FROM d
         ORDER BY bucket""",

    // Exact decimal products inside the sum; the double appears once,
    // after the aggregate.
    "q101_star_join_revenue" ->
      """SELECT n_name,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3))
                         * (1 - CAST(l_discount AS DECIMAL(18,3))))
                     AS DOUBLE) AS revenue
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
         GROUP BY n_name
         ORDER BY revenue DESC, n_name""",

    // The interleave is generated from the same bit formula the Spark
    // side uses (Layout.mortonSql) — shift/and arithmetic is exact in
    // any engine.
    "q85_zorder_layout" ->
      s"""WITH pts AS (
           SELECT l_partkey % 1024 AS x, l_orderkey % 1024 AS y
           FROM lineitem),
         z AS (SELECT x, y,
                 ${graft.operators.Layout.mortonSql("x", "y", 10)} AS zval
               FROM pts)
         SELECT zval >> 14 AS tile, count(*) AS n,
                min(x) AS min_x, max(x) AS max_x,
                min(y) AS min_y, max(y) AS max_y
         FROM z GROUP BY tile ORDER BY tile"""
  )
}
