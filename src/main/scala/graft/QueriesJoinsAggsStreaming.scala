package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Changelog
import graft.schema.{Flattener, Stringifier}
import graft.shard.{ModuloSharding, ShardingStrategyFactory}
import graft.sink.DocQueries
import graft.SparkEntry.{dec, tempDir, sharedExactPairs, sharedPrunedCosinePairs}
import graft.SparkEntry.eventsChangelog
import graft.OracleDefs.bpeApplyMerges

/** Gate registry 4/4: TPC-H join shapes, window/aggregation surface, time series, and the streaming (ws_*) batch twins.
  * (Verbatim slice of the former SparkEntry.queries literal — the
  * registry split is pure file layout, zero behavior change.)
  */
private[graft] object QueriesJoinsAggsStreaming {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- general query engine (Catalyst built-ins; bench headliners) ----

    // Three-way join + agg + top-k (TPC-H Q3 shape). Customer side is
    // broadcast; orders⋈lineitem shuffles on the join key once.
    "j3_top_orders" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Five-way join through two dimension chains (TPC-H Q5 shape):
    // revenue by nation where customer and supplier share the nation.
    "j5_nation_revenue" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy("n_name")
    }),

    // Bilateral trade volume (TPC-H Q7 shape): revenue between two
    // nations by ship year. The nation filter is pushed into BOTH
    // dimension legs before the fact joins (each side prunes to the
    // two-nation subset and broadcasts); with both sides restricted to
    // the pair, the Q7 OR-of-pairs condition reduces to
    // supp_nation <> cust_nation. Decimal-exact revenue (the j5
    // recipe), integer year.
    "j13_nation_volume" -> ((s, d) => {
      val nations = Seq("NATION_1", "NATION_2")
      val n = Tables.nation(s, d).filter(col("n_name").isin(nations: _*))
      val sup = Tables.supplier(s, d)
        .join(broadcast(n.select(col("n_nationkey").as("_nk1"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("_nk1"))
        .select("s_suppkey", "supp_nation")
      val cust = Tables.customer(s, d)
        .join(broadcast(n.select(col("n_nationkey").as("_nk2"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("_nk2"))
        .select("c_custkey", "cust_nation")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Market share (TPC-H Q8 shape): one supplier nation's share of
    // PROMO-part revenue sold into one region, by order year — the
    // conditional-aggregate-over-multi-join shape. Part/region/nation
    // dims broadcast into the fact scan; the share division is ONE
    // double op per year over exact decimal sums, rounded 6dp.
    "j14_market_share" -> ((s, d) => {
      val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("_nk2"))),
          col("c_nationkey") === col("_nk2"))
        .select("c_custkey")
      val sup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("_nk1"),
            col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("_nk1"))
        .select("s_suppkey", "supp_nation")
      val vol = dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(12,2)") - dec(col("l_discount")))
      Tables.lineitem(s, d)
        .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(round(
            sum(when(col("supp_nation") === "NATION_5", vol)
              .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
            sum(vol).cast("double"), 6).as("mkt_share"),
          count(lit(1)).as("n_rows"))
        .orderBy("o_year")
    }),

    // Correlated-min subquery (TPC-H Q2 shape, adapted: no partsupp
    // table, so "supply cost" is each supplier's minimum unit price for
    // the part — an exact decimal MIN over lineitem): suppliers in one
    // region offering a qualifying part at that part's region-wide
    // minimum cost. Written as the decorrelation Catalyst would
    // produce: the per-(part, supplier) cost agg feeds BOTH the
    // per-part min agg and the equality join back (ReuseExchange on the
    // partkey-keyed shuffle); region/nation/part dims ride broadcasts.
    // Decimal MIN is order-insensitive and engine-exact — the
    // `cost = min` equality never touches float arithmetic.
    "j15_min_cost_supplier" -> ((s, d) => {
      val cost = Tables.lineitem(s, d)
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(dec(col("l_extendedprice"))).as("cost"))
      val eur = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
      val eligible = cost
        .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
      val mn = eligible.groupBy(col("l_partkey").as("_pk"))
        .agg(min(col("cost")).as("_mc"))
      val pts = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
        .select("p_partkey")
      eligible
        .join(mn, col("l_partkey") === col("_pk") &&
          col("cost") === col("_mc"))
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("n_name"), col("cost").cast("double").as("cost"))
        .orderBy("p_partkey", "s_suppkey")
    }),

    // Large-volume orders (TPC-H Q18 shape): orders whose TOTAL
    // lineitem quantity clears a threshold — the group-HAVING-IN
    // subquery, decorrelated to its natural plan: the orderkey-keyed
    // quantity agg IS the subquery, and since it already carries the
    // sum the outer re-aggregation folds away into one join. The
    // filtered agg output is small but unbounded (threshold-dependent),
    // so it stays a keyed shuffle join — AQE converts it to broadcast
    // at runtime when it fits; the customer dim broadcasts statically.
    // Quantity sums are exact decimal.
    "j16_large_orders" -> ((s, d) => {
      val big = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d).select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("total_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    }),

    // Disjunctive multi-table predicate (TPC-H Q19 shape): revenue from
    // three OR'd brand/size/quantity conjunctions. Each disjunct mixes
    // part and lineitem columns, so the OR as written cannot push below
    // the join — the shape's point is the DERIVED part-side union
    // prefilter (the disjunction of each conjunct's part-only half),
    // applied before the broadcast so the build side carries ~3 brands
    // instead of the whole part table; the full mixed predicate then
    // runs above the join. Revenue is the exact decimal sum.
    "j17_disjunctive_revenue" -> ((s, d) => {
      def pOnly(brand: String, maxSize: Int): Column =
        col("p_brand") === brand && col("p_size").between(1, maxSize)
      val pts = Tables.part(s, d)
        .filter(pOnly("Brand#12", 5) || pOnly("Brand#23", 10) ||
          pOnly("Brand#4", 15))
        .select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d)
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
        .filter(
          (pOnly("Brand#12", 5) && col("l_quantity").between(1, 11)) ||
          (pOnly("Brand#23", 10) && col("l_quantity").between(10, 20)) ||
          (pOnly("Brand#4", 15) && col("l_quantity").between(20, 30)))
        .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // Priority-wait report (TPC-H Q4 shape, adapted: no commitdate
    // column, so "late" is shipped >90 days after the order date):
    // orders in one quarter with at least one late line, counted by
    // priority. The EXISTS decorrelates to a LeftSemi on orderkey — an
    // order with five late lines counts once; the date window prunes
    // the orders scan, the join shrinks to the filtered sides.
    "j4_priority_wait" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1996-04-01")
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Top supplier by revenue (TPC-H Q15 shape): the 3-month revenue
    // aggregate feeds BOTH the global max (one broadcast row) and the
    // equality filter back — the view + scalar-subquery form,
    // decorrelated so the corpus aggregates once (AQE reuses the
    // suppkey exchange at runtime, the j15 pin's shape). Decimal
    // revenue: the max-equality compares exact decimals, never floats.
    "j18_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-04-01")
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .as("_rev"))
      val mx = rev.agg(max(col("_rev")).as("_mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("_rev") === col("_mx"))
        .join(broadcast(Tables.supplier(s, d)
          .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Returned-item reporting (TPC-H Q10 shape): revenue lost to
    // returns per customer over one quarter, top 20 — orders prune on
    // the date window, lineitem on the return flag (both pushed), the
    // customer/nation dims broadcast, and the cut is
    // TakeOrderedAndProject on the rounded revenue (ties by custkey).
    "j20_returned_customers" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1995-10-01" &&
          col("o_orderdate") < "1996-01-01")
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val cust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("c_acctbal"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Shipping-priority matrix (TPC-H Q12 shape, adapted: no shipmode
    // column, so lines group by linestatus): per group, how many lines
    // of high-priority orders (1-URGENT/2-HIGH) vs the rest shipped in
    // 1996 — the conditional-aggregation shape: the CASE collapses into
    // map-side partial sums, one keyed shuffle of two counters per
    // group, and the big-big orders⋈lineitem join keys on orderkey.
    "j21_shipstatus_priority" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .select("l_orderkey", "l_linestatus")
      li.join(Tables.orders(s, d)
          .select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // Supplier-count by part attributes (TPC-H Q16 shape, adapted: no
    // partsupp table, suppliers come from lineitem; the "complaints"
    // exclusion is a LeftAnti against negative-balance suppliers):
    // distinct suppliers per (brand, type, size) for parts outside one
    // brand/type family. The NOT-IN anti-join runs BEFORE the distinct
    // aggregate so excluded suppliers never shuffle; the part dim
    // prunes on its negated predicates (pushed) and broadcasts.
    "j23_parts_suppliers" -> ((s, d) => {
      val pts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").startsWith("MEDIUM"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excl = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Product profit by nation and year (TPC-H Q9 shape, adapted: no
    // partsupp, so supply cost is half the part's retail price):
    // profit = revenue − cost per (supplier nation, order year) over
    // one part family. Everything decimal until the final cast —
    // decimal multiplication is exact (scales add), so both engines
    // sum identical values. The part/supplier/nation dims broadcast;
    // the one big-big join (lineitem ⋈ orders) keys on orderkey.
    "j19_profit" -> ((s, d) => {
      val half = lit(0.5).cast("decimal(2,1)")
      val pts = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
        .select("p_partkey", "p_retailprice")
      val sup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "n_name")
      Tables.lineitem(s, d)
        .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))) -
            dec(col("p_retailprice")) * dec(col("l_quantity")) * half)
          .cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Promotion revenue share by ship month (TPC-H Q14 shape): one
    // scan, a conditional decimal aggregate for the PROMO numerator,
    // and ONE double division per month — the map-side-combinable
    // conditional-share pattern (j14's yearly form, monthly here).
    "j22_promo_share" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).as("_m"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            dec(col("l_extendedprice")) *
              (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(12,2)"))).as("_promo"),
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
            .as("_all"))
        .select(unix_micros(col("_m")).as("month_us"),
          round(lit(100.0) * col("_promo").cast("double") /
            col("_all").cast("double"), 6).as("promo_share"),
          col("_promo").cast("double").as("promo_revenue"))
        .orderBy("month_us")),

    // Value concentration (TPC-H Q11 shape, adapted: no partsupp, so
    // "stock value" is lineitem revenue per part): parts carrying more
    // than 1.5x the AVERAGE part's revenue — the
    // HAVING-vs-scaled-global-scalar shape: the per-part aggregate
    // feeds both the global (sum, count) row (broadcast; AQE reuses
    // the exchange) and the threshold filter. The average-relative
    // threshold keeps the selectivity stable across scale factors
    // (Q11 scales its fraction by 1/SF for the same reason). Decimal
    // sums; ONE double comparison against the scaled scalar.
    "j24_value_parts" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice")) *
          (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
          .as("_v"))
      val tot = rev.agg(sum(col("_v")).as("_t"),
        count(lit(1)).as("_np"))
      rev.crossJoin(broadcast(tot))
        .filter(col("_v").cast("double") >
          lit(1.5) * col("_t").cast("double") / col("_np"))
        .select(col("l_partkey").as("p_partkey"),
          col("_v").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    }),

    // Single-pass filtered aggregation (TPC-H Q6 shape).
    "j6_forecast" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))),

    // Correlated-average filter (TPC-H Q17 shape): revenue from
    // small-quantity lineitems of one brand, where "small" is
    // per-part 20%-of-average — written as the decorrelated join
    // Catalyst would produce (per-part avg agg, broadcast brand dim).
    // Decimal quantity sums + ONE double division per part keep the
    // threshold engine-exact; the revenue sum is exact decimal.
    "j7_small_qty_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val pt = Tables.part(s, d).filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val perPart = li.groupBy("l_partkey")
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("_avg"))
      li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .join(perPart, "l_partkey")
        .filter(col("l_quantity") < lit(0.2) * col("_avg"))
        .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 2)
          .as("avg_yearly"),
          count(lit(1)).as("n_rows"))
    }),

    // Order-count distribution incl. zero (TPC-H Q13 shape): customers
    // left-joined to their non-urgent orders, counted per customer,
    // then customers counted per order-count — the two-level hash-agg
    // cascade; integer counts, no float anywhere.
    "j9_order_count_dist" -> ((s, d) => {
      val perCust = Tables.customer(s, d).select("c_custkey")
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Anti-join + global scalar threshold (TPC-H Q22 shape): customers
    // with above-average balance and NO big urgent order, grouped by
    // nation — a left-anti join against the filtered orders plus one
    // broadcast scalar (the positive-balance average, decimal sum /
    // one double division).
    "j10_idle_customers" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("_avg"))
      val bigUrgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 50000)
        .select("o_custkey")
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("_avg"))
        .join(bigUrgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          sum(dec(col("c_acctbal"))).cast("double").as("total_bal"))
        .orderBy("c_nationkey")
    }),

    // Exists + not-exists on the SAME correlated table (TPC-H Q21
    // shape, adapted to the provided columns: "late" is shipped >60
    // days after ordering — no l_receiptdate in this corpus): suppliers
    // from one nation who shipped late on a multi-supplier F-order
    // where NO OTHER supplier was late. Written as the decorrelation
    // Catalyst would produce: the supplier/nation dimension filter is
    // pushed BELOW the self-joins (prunes l1 ~25× before any shuffle),
    // then one left-semi (the exists) and one left-anti (the
    // not-exists) against the same orderkey-keyed frame — big-big, so
    // both are SortMergeJoins sharing one exchange; the dimension rides
    // a broadcast.
    "j11_waiting_suppliers" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > date_add(col("o_orderdate"), 60)).as("late"))
      val sup = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_9").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      val l1 = l.filter(col("late"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      val others = l.select(col("l_orderkey").as("o2"),
        col("l_suppkey").as("s2"))
      val lateOthers = l.filter(col("late"))
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      l1.join(others, col("l_orderkey") === col("o2") &&
            col("l_suppkey") =!= col("s2"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3") &&
            col("l_suppkey") =!= col("s3"), "left_anti")
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // Nested correlated-aggregate IN chain (TPC-H Q20 shape, adapted:
    // no partsupp table, so "availability above half the shipped
    // quantity" becomes "supplier ships more than 1/8 of a prefix-named
    // part's total quantity"): part-name IN-subquery → per-(supplier,
    // part) quantity aggregate → correlated per-part total threshold →
    // supplier IN-semi-join. All quantity arithmetic stays decimal
    // (8·qty > total — no float division anywhere), so the threshold is
    // engine-exact. Scale shape: the prefix dimension broadcasts into
    // the lineitem scan; the two aggregations share one (suppkey,
    // partkey) exchange (ReuseExchange); the per-part total and the
    // qualifying-supplier set are aggregate-sized broadcasts.
    "j12_dominant_suppliers" -> ((s, d) => {
      val pfx = Tables.part(s, d).filter(col("p_name").startsWith("s"))
        .select("p_partkey")
      val li = Tables.lineitem(s, d)
        .join(broadcast(pfx), col("l_partkey") === col("p_partkey"))
      val sp = li.groupBy("l_suppkey", "l_partkey")
        .agg(sum(dec(col("l_quantity"))).as("qty"))
      val tot = sp.groupBy("l_partkey")
        .agg(sum(col("qty")).as("total"))
        .select(col("l_partkey").as("t_partkey"), col("total"))
      val qual = sp.join(broadcast(tot),
          col("l_partkey") === col("t_partkey"))
        .filter(lit(8) * col("qty") > col("total"))
        .groupBy("l_suppkey").agg(count(lit(1)).as("n_parts"))
      qual.join(broadcast(Tables.supplier(s, d)
            .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_parts")
        .orderBy("s_suppkey")
    }),

    // Window functions: running revenue + dense rank per customer.
    "w1_running_total" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("running_total",
          sum(dec(col("o_totalprice"))).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast("double"))
        .withColumn("order_rank", row_number().over(w))
        .select("o_custkey", "o_orderkey", "order_rank", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Top-k per group via ranked window.
    "w2_topk_per_group" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),

    // Ranking window functions (percent_rank / cume_dist / ntile):
    // per-event-type distribution position of every event's value —
    // the percentile-tagging projection. Unique (value, id) order keys
    // make every rank integer-exact and engine-reproducible; the window
    // partitions by key, so no single-partition funnel.
    "w3_rank_funcs" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("value"), col("event_id"))
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        round(percent_rank().over(w), 9).as("pr"),
        round(cume_dist().over(w), 9).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("event_id")
    }),

    // Fixed-grid gap fill + LOCF: hourly per-type revenue made
    // CONTINUOUS — holes get the last seen value, `filled` marks
    // fabricated rows, leading gaps stay null (no backward fill). Grid
    // is bucket-space (keys × hours) off one broadcast min/max row;
    // LOCF windows run over buckets, never events.
    "x_gap_fill" -> ((s, d) =>
      operators.TimeSeries.gapFillLocf(Tables.events(s, d), "ts",
          "event_type", sum(dec(col("value"))).cast("double"), "1 hour")
        .select(col("key").as("event_type"),
          unix_micros(col("bucket")).as("hour_us"),
          col("value").as("sum_value"), col("filled"))
        .orderBy("event_type", "hour_us")),

    // Set operations: big buyers EXCEPT big-error users, INTERSECT with
    // high-value clickers. The value thresholds make each leg a PARTIAL
    // user set (every user has every event type in the synthetic data,
    // so unthresholded legs would be all-or-nothing): at sf0.01 the
    // EXCEPT drops ~10 of 32 and the INTERSECT keeps 11 — both
    // operators visibly prune, so the gate pins values, not just schema.
    "set_ops" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def users(t: String, minValue: Double) =
        ev.filter(col("event_type") === t && col("value") > minValue)
          .select("user_id").distinct()
      users("purchase", 200.0).except(users("error", 250.0))
        .intersect(users("click", 150.0))
        .orderBy("user_id")
    }),

    // PIVOT: linestatus values become columns of decimal-exact quantity
    // sums (explicit value list — no driver-side distinct scan); absent
    // (flag, status) combos stay NULL on both engines.
    "agg_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .orderBy("l_returnflag")),

    // UNPIVOT: measure columns melt back to (measure, value) rows — the
    // Spark 3.4 Dataset.unpivot API over per-flag decimal sums.
    "agg_unpivot" -> ((s, d) => {
      val m = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"))
      m.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price")), "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),

    // Rollup (grouping sets) with ALL sentinel for super-aggregate rows.
    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")),

    // Explicit GROUPING SETS: an arbitrary lattice subset —
    // ((flag,status),(status)) — that neither rollup nor cube can
    // express alone; one pass, the Spark 4 Dataset groupingSets API.
    "agg_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")),

    // CUBE: every grouping-set combination in one pass (rollup's
    // lattice completion — adds the (∅, status) slice rollup omits).
    "agg_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("sum_qty"))
        .orderBy("flag", "status")),

    // Distinct aggregation per group.
    "agg_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // Statistical aggregates: exact interpolated percentiles, stddev,
    // correlation (Welford-style double accumulation both engines).
    "agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
          percentile(col("l_extendedprice"), lit(0.9)).as("p90_price"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
        .orderBy("l_returnflag")),

    // Extended stats via EXACT decimal power sums (ES extended_stats +
    // the higher moments): variance, skewness, excess kurtosis all
    // derive from Σx..Σx⁴ — integer n_chars makes every sum exact, so
    // the double arithmetic after the one map-side-combinable hash agg
    // is bit-reproducible (built-in skewness/kurtosis differ between
    // engines on bias correction; explicit moments dodge the
    // convention entirely). The 100 TB shape: 5 mergeable partials.
    "agg_moments" -> ((s, d) => {
      val x = col("n_chars").cast("decimal(38,0)")
      val n = col("n").cast("double")
      val mean = col("_s1").cast("double") / n
      val m2 = col("_s2").cast("double") / n - mean * mean
      val m3 = col("_s3").cast("double") / n -
        mean * (col("_s2").cast("double") / n) * 3 +
        mean * mean * mean * 2
      val m4 = col("_s4").cast("double") / n -
        mean * (col("_s3").cast("double") / n) * 4 +
        mean * mean * (col("_s2").cast("double") / n) * 6 -
        mean * mean * mean * mean * 3
      Tables.documents(s, d)
        .agg(count(lit(1)).as("n"), sum(x).as("_s1"),
          sum(x * x).as("_s2"), sum(x * x * x).as("_s3"),
          sum(x * x * x * x).as("_s4"))
        .select(col("n"), round(mean, 6).as("mean"),
          round(m2, 6).as("variance"),
          round(m3 / pow(m2, 1.5), 6).as("skewness"),
          round(m4 / (m2 * m2) - 3, 6).as("kurtosis"))
    }),

    // Percentile-ranks aggregation (ES percentile_ranks — the inverse
    // of percentiles): the percentage of values at or below each mark,
    // per group. Exact integer counts in double (0/1 sums are exact),
    // one hash agg.
    "agg_percentile_ranks" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(sum(when(col("l_quantity") <= 10.0, 1).otherwise(0)) *
            lit(100.0) / count(lit(1)), 6).as("pr_10"),
          round(sum(when(col("l_quantity") <= 25.0, 1).otherwise(0)) *
            lit(100.0) / count(lit(1)), 6).as("pr_25"))
        .orderBy("l_returnflag")),

    // Boxplot aggregation (ES boxplot): five-number summary per group —
    // min, q1/median/q3 by EXACT percentile (type-7 linear interpolation,
    // the convention Spark `percentile` and DuckDB `quantile_cont`
    // share), max. The exact percentile sorts within the group; the
    // sketch twin for unbounded groups is agg_quantile_sketch.
    "agg_boxplot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          min(col("l_quantity")).as("q_min"),
          round(percentile(col("l_quantity"), lit(0.25)), 6).as("q1"),
          round(percentile(col("l_quantity"), lit(0.5)), 6).as("q2"),
          round(percentile(col("l_quantity"), lit(0.75)), 6).as("q3"),
          max(col("l_quantity")).as("q_max"))
        .orderBy("l_returnflag")),

    // T-test aggregation (ES t_test, Welch's unequal-variance form):
    // is mean quantity different between return flags A and N — moments
    // from exact cent-unit sums (the matrix-stats discipline), then the
    // same IEEE sequence for t and the Welch–Satterthwaite df in both
    // engines. ONE conditional-sum pass.
    "agg_ttest" -> ((s, d) => {
      def iu(c: Column) = (dec(c) * 100).cast("decimal(18,0)")
      val q = iu(col("l_quantity"))
      // null-else conditional sum: sum skips nulls, stays exact decimal
      def grp(f: String, c: Column) =
        sum(when(col("l_returnflag") === f, c))
      val agged = Tables.lineitem(s, d).agg(
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("n1"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("n2"),
        grp("A", q).cast("double").as("_s1"),
        grp("N", q).cast("double").as("_s2"),
        grp("A", q * q).cast("double").as("_ss1"),
        grp("N", q * q).cast("double").as("_ss2"))
      val (n1, n2) = (col("n1").cast("double"), col("n2").cast("double"))
      val v1 = (n1 * col("_ss1") - col("_s1") * col("_s1")) /
        (n1 * (n1 - 1)) / 10000.0
      val v2 = (n2 * col("_ss2") - col("_s2") * col("_s2")) /
        (n2 * (n2 - 1)) / 10000.0
      val m1 = col("_s1") / n1 / 100.0
      val m2 = col("_s2") / n2 / 100.0
      val se2 = v1 / n1 + v2 / n2
      agged.select(col("n1"), col("n2"),
        round(m1 - m2, 6).as("mean_diff"),
        round((m1 - m2) / sqrt(se2), 6).as("t"),
        round(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1) +
          (v2 / n2) * (v2 / n2) / (n2 - 1)), 6).as("df"))
    }),

    // Median-absolute-deviation aggregation (ES
    // median_absolute_deviation, exact form): MAD = median(|x −
    // median(x)|) per group — two exact-percentile passes, the second
    // over deviations from the broadcast per-group median.
    "agg_mad" -> ((s, d) => {
      val med = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.5)).as("_med"))
      Tables.lineitem(s, d).join(broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(round(percentile(abs(col("l_quantity") - col("_med")),
          lit(0.5)), 6).as("mad"))
        .orderBy("l_returnflag")
    }),

    // Weighted-average aggregation (ES weighted_avg): quantity-weighted
    // mean price per flag — exact integer cent-unit product sums, one
    // final double ratio.
    "agg_weighted_avg" -> ((s, d) => {
      def iu(c: Column) = (dec(c) * 100).cast("decimal(18,0)")
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(
          sum(iu(col("l_extendedprice")) * iu(col("l_quantity")))
            .cast("double").as("_swx"),
          sum(iu(col("l_quantity"))).cast("double").as("_sw"))
        .select(col("l_returnflag"),
          round(col("_swx") / col("_sw") / 100.0, 6).as("weighted_price"))
        .orderBy("l_returnflag")
    }),

    // MatrixStats aggregation (ES matrix_stats): pairwise variance /
    // correlation over (quantity, price, discount) per group. Native
    // corr/var merge partials in DOUBLE — order-dependent low bits a
    // hash gate can't tolerate — so the moments are assembled from
    // EXACT integer power sums: each 2-dp input becomes integer cents
    // (scale-0 decimal), Σx/Σx²/Σxy stay exact decimals, and the casts
    // to double are single correctly-rounded conversions (scale-0 only
    // — a scale-4 decimal→double is a two-step conversion whose last
    // ulp is engine-dependent). Every op after the casts is the same
    // IEEE sequence in both engines. One map-side-combinable hash agg;
    // the n(n−1) and cent-unit factors cancel inside corr.
    "agg_matrix_stats" -> ((s, d) => {
      // integer cent units: exact per-row, exact products, exact sums
      def iu(c: Column) = (dec(c) * 100).cast("decimal(18,0)")
      val (q, p, dd) = (iu(col("l_quantity")), iu(col("l_extendedprice")),
        iu(col("l_discount")))
      val nd = col("n").cast("double")
      // A_xy = n·Σxy − Σx·Σy in cent² units
      def amom(sxy: Column, sx: Column, sy: Column) = nd * sxy - sx * sy
      val aq = amom(col("_sqq"), col("_sq"), col("_sq"))
      val ap = amom(col("_spp"), col("_sp"), col("_sp"))
      val ad = amom(col("_sdd"), col("_sd"), col("_sd"))
      val aqp = amom(col("_sqp"), col("_sq"), col("_sp"))
      val aqd = amom(col("_sqd"), col("_sq"), col("_sd"))
      val apd = amom(col("_spd"), col("_sp"), col("_sd"))
      val denom = (col("n") * (col("n") - 1)).cast("double")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(q).cast("double").as("_sq"),
          sum(p).cast("double").as("_sp"),
          sum(dd).cast("double").as("_sd"),
          sum(q * q).cast("double").as("_sqq"),
          sum(p * p).cast("double").as("_spp"),
          sum(dd * dd).cast("double").as("_sdd"),
          sum(q * p).cast("double").as("_sqp"),
          sum(q * dd).cast("double").as("_sqd"),
          sum(p * dd).cast("double").as("_spd"))
        .select(col("l_returnflag"), col("n"),
          round(aq / denom / 10000.0, 6).as("var_q"),
          round(ap / denom / 10000.0, 2).as("var_p"),
          round(ad / denom / 10000.0, 9).as("var_d"),
          round(aqp / sqrt(aq * ap), 6).as("corr_qp"),
          round(aqd / sqrt(aq * ad), 6).as("corr_qd"),
          round(apd / sqrt(ap * ad), 6).as("corr_pd"))
        .orderBy("l_returnflag")
    }),

    // Streaming geofence counts (batch twin, the ws_* gating
    // convention): events get deterministic coordinates, three fences
    // with PER-FENCE radii — stream-static broadcast cell equi-join +
    // haversine verify + daily windowed counts. StreamingOpsSpec runs
    // the operator as a real stream with a watermark bounding state.
    "ws_geofence" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("lat",
          (col("event_id") * 37 % 17000).cast("double") / 100.0 - 85.0)
        .withColumn("lon",
          (col("event_id") * 91 % 36000).cast("double") / 100.0 - 180.0)
      streaming.StreamingOps.geofenceCounts(e, "ts", "lat", "lon",
          Seq((1L, 40.0, -74.0, 1500.0), (2L, 5.0, 179.0, 2000.0),
            (3L, -84.0, 10.0, 2500.0)),
          "1 day", "1 day")
        .select(unix_micros(col("window_start")).as("day_us"),
          col("fence_id"), col("n_events"))
        .orderBy("day_us", "fence_id")
    }),

    // ES pipeline aggregations over a weekly date histogram:
    // `derivative` (bucket-over-bucket delta), `moving_avg` (3-bucket
    // trailing window), `bucket_selector` (drop thin buckets AFTER the
    // pipeline metrics are computed, the ES evaluation order). The
    // windows run over the BUCKET space — weeks, not events — so the
    // single-partition window is bounded by the histogram length.
    "q_pipeline_aggs" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_us")
      Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(unix_micros(col("bucket")).as("bucket_us"),
          col("n_events"), col("sum_value"))
        .withColumn("derivative",
          col("sum_value") - lag("sum_value", 1).over(w))
        .withColumn("moving_avg",
          round(avg("sum_value").over(w.rowsBetween(-2, 0)), 6))
        .filter(col("n_events") >= 50)
        .orderBy("bucket_us")
    }),

    // Second pipeline-agg family: serial_diff (lag-2 delta), moving
    // min/max, moving_percentile (exact trailing-3 median), and EMA —
    // the EMA folds the bucket history with a higher-order aggregate
    // (collect_list over the bucket window + left fold), which is how a
    // recursive per-bucket definition stays a pure Catalyst expression:
    // the fold runs over BUCKET space (weeks), never events.
    "q_pipeline_aggs2" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_us")
      val trail3 = w.rowsBetween(-2, 0)
      val all = w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
      Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(unix_micros(col("bucket")).as("bucket_us"),
          col("n_events"), col("sum_value"))
        .withColumn("serial_diff",
          col("sum_value") - lag("sum_value", 2).over(w))
        .withColumn("moving_min", min("sum_value").over(trail3))
        .withColumn("moving_max", max("sum_value").over(trail3))
        .withColumn("moving_median",
          round(percentile(col("sum_value"), lit(0.5)).over(trail3), 6))
        .withColumn("_h", collect_list("sum_value").over(all))
        .withColumn("ema", round(
          aggregate(slice(col("_h"), lit(2),
              greatest(size(col("_h")) - 1, lit(0))),
            element_at(col("_h"), 1),
            (acc, x) => lit(0.5) * x + lit(0.5) * acc), 6))
        .drop("_h")
        .orderBy("bucket_us")
    }),

    // Holt double-exponential smoothing (level + trend, α=.5 β=.3) over
    // the weekly bucket space, with a one-step forecast — the
    // moving_fn/holt ES shape. The recursion folds the bucket history
    // per row (struct accumulator over collect_list — no recursion in
    // the plan, O(buckets²) work in BUCKET space, never events); the
    // oracle is the same arithmetic as a recursive CTE.
    "q_holt" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_us")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      def step(acc: Column, x: Column) = {
        val l = acc.getField("l"); val tr = acc.getField("t")
        val l2 = lit(0.5) * x + lit(0.5) * (l + tr)
        struct(l2.as("l"),
          (lit(0.3) * (l2 - l) + lit(0.7) * tr).as("t"))
      }
      Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(unix_micros(col("bucket")).as("bucket_us"),
          col("sum_value"))
        .withColumn("_h", collect_list("sum_value").over(w))
        .withColumn("_st", aggregate(
          slice(col("_h"), lit(2), greatest(size(col("_h")) - 1, lit(0))),
          struct(element_at(col("_h"), 1).as("l"), lit(0.0).as("t")),
          step))
        .select(col("bucket_us"), col("sum_value"),
          round(col("_st.l"), 6).as("level"),
          round(col("_st.t"), 6).as("trend"),
          round(col("_st.l") + col("_st.t"), 6).as("forecast_next"))
        .orderBy("bucket_us")
    }),

    // Additive Holt–Winters (triple smoothing, α=.5 β=.25 γ=.25, m=7)
    // over DAILY buckets — level + trend + a weekly seasonal cycle, the
    // seasonal extension of q_holt. One O(buckets·m) fold per series in
    // bucket space; the oracle replays the identical recursion as a
    // recursive CTE carrying the rotating seasonal list.
    "x_holt_winters" -> ((s, d) => {
      val b = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("bucket"))
        .agg(sum(dec(col("value"))).cast("double").as("y"))
        .select(unix_micros(col("bucket")).as("bucket_us"), col("y"))
      operators.TimeSeries.holtWinters(b, "bucket_us", "y",
        period = 7, alpha = 0.5, beta = 0.25, gamma = 0.25)
    }),

    // Two-sided CUSUM changepoint detection over the weekly bucket
    // space: s⁺/s⁻ accumulate deviations from the series mean (computed
    // from exact decimal sums) and flag when either crosses 2σ (σ from
    // the exact n·Σy²−(Σy)² moments). The recursion is the q_holt
    // struct-accumulator fold — bucket-space work, a recursive CTE in
    // the oracle.
    "q_cusum" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_us")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val b = Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(sum(dec(col("value"))).cast("double").as("y"))
        .select(unix_micros(col("bucket")).as("bucket_us"), col("y"))
      val stats = b.agg(count(lit(1)).cast("double").as("_n"),
        sum(col("y").cast("decimal(24,6)")).cast("double").as("_s"),
        sum((col("y").cast("decimal(24,6)") *
          col("y").cast("decimal(24,6)")).cast("decimal(38,12)"))
          .cast("double").as("_ss"))
      def step(acc: Column, x: Column) = {
        val mu = acc.getField("mu")
        struct(mu.as("mu"),
          greatest(lit(0.0), acc.getField("sp") + (x - mu)).as("sp"),
          greatest(lit(0.0), acc.getField("sn") + (mu - x)).as("sn"))
      }
      b.crossJoin(broadcast(stats))
        .withColumn("_mu", col("_s") / col("_n"))
        .withColumn("_sigma", sqrt(
          (col("_n") * col("_ss") - col("_s") * col("_s")) /
            (col("_n") * (col("_n") - 1))))
        .withColumn("_h", collect_list("y").over(w))
        .withColumn("_st", aggregate(col("_h"),
          struct(col("_mu").as("mu"), lit(0.0).as("sp"), lit(0.0).as("sn")),
          step))
        .select(col("bucket_us"), col("y"),
          round(col("_st.sp"), 6).as("cusum_pos"),
          round(col("_st.sn"), 6).as("cusum_neg"),
          (col("_st.sp") > col("_sigma") * 2 ||
            col("_st.sn") > col("_sigma") * 2).as("changepoint"))
        .orderBy("bucket_us")
    }),

    // ES cumulative_cardinality: exact running distinct users per day.
    // The scale trick: a running DISTINCT is NOT a running sum of daily
    // distincts — it is the running sum of FIRST-SEEN counts, one
    // groupBy over users, never a per-prefix re-count. The cumulative
    // window runs over day buckets only.
    "q_cumulative_cardinality" -> ((s, d) => {
      val e = Tables.events(s, d)
      val daily = e.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val newbies = e.groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_new"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      daily.join(newbies, Seq("day"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .withColumn("cum_users", sum("n_new").over(w))
        .select(unix_micros(col("day")).as("day_us"), col("n_users"),
          col("n_new"), col("cum_users"))
        .orderBy("day_us")
    }),

    // Event-time tumbling window (Structured Streaming's windowed-agg
    // shape, batch-checked): hourly event counts + revenue.
    "ws_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total_value"))
        .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("hour_us", "event_type")),

    // Event-time WATERMARK semantics (out-of-order + late data): events
    // arrive in day-of-month micro-batches, except the ~1/37 stragglers
    // (event_id % 37 == 0) that arrive two batches late. The analytic
    // replay (StreamingOps.watermarkReplay) reproduces Spark's global
    // watermark mechanics exactly — ms-truncated max event time over
    // PRIOR batches minus the delay, late iff window end ≤ watermark —
    // and its fidelity to a real MemoryStream append-mode run, boundary
    // included, is pinned in StreamingOpsSpec. The gate value-asserts
    // exactly WHICH rows are dropped per window vs the oracle's
    // replay of the same arrival schedule: stragglers from closed
    // windows drop, stragglers still inside the watermark horizon
    // (the tail of the last days) survive.
    "ws_late" -> ((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("_arr", dayofmonth(col("ts")).cast("long") +
          when(pmod(col("event_id"), lit(37)) === 0, 2L).otherwise(0L))
      streaming.StreamingOps.watermarkReplay(
          e, "ts", "_arr", "1 hour", 30 * 60 * 1000L)
        .groupBy(col("_w.start").as("_ws"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("late"), 1).otherwise(0)).as("n_late"))
        .select(unix_micros(col("_ws")).as("hour_us"),
          col("n_total"), col("n_late"))
        .orderBy("hour_us")
    }),

    // Windowed approximate quantiles (mergeable percentile sketch —
    // state bounded by accuracy, not rows): per-hour p50/p90 of the
    // value stream. The sketch's contract is RANK error, and it returns
    // an ELEMENT of the window (the exact `percentile` interpolates),
    // so the gate re-ranks the sketch's answer inside its window — the
    // count of values at or below it must sit within the sketch's own
    // rank-error bound of the target rank: percentile_approx guarantees
    // rank error ≤ n/accuracy (n/10000 here), so the tolerance is
    // greatest(1, n/10000) — the ±1 floor absorbs the floor/ceil
    // convention at small n (a tied all-equal window passes by the rank
    // count saturating at n), and the n/10000 term keeps the gate valid
    // when a window grows past ~10-20k rows at larger scale factors.
    // Batch twin of the streaming operator, the ws_* gating convention.
    "ws_quantile" -> ((s, d) => {
      val e = Tables.events(s, d)
      val approx = streaming.StreamingOps.windowedQuantiles(
        e, "ts", "value", "1 hour", "1 hour", Seq(0.5, 0.9))
      e.select(window(col("ts"), "1 hour").getField("start")
            .as("window_start"), col("value"))
        .join(approx, "window_start")
        .groupBy("window_start")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("value") <= element_at(col("qs"), 1), 1)
            .otherwise(0)).as("_r50"),
          sum(when(col("value") < element_at(col("qs"), 1), 1)
            .otherwise(0)).as("_r50lo"),
          sum(when(col("value") <= element_at(col("qs"), 2), 1)
            .otherwise(0)).as("_r90"),
          sum(when(col("value") < element_at(col("qs"), 2), 1)
            .otherwise(0)).as("_r90lo"))
        .select(unix_micros(col("window_start")).as("hour_us"),
          col("n_events"),
          // the target rank must fall inside [strictly-below, at-or-
          // below] ± tol, where tol = greatest(1, n/accuracy) is the
          // sketch's actual rank-error bound
          {
            val tol = greatest(lit(1.0), col("n_events") / lit(10000.0))
            (col("_r50lo") - tol <= col("n_events") * 0.5 &&
              col("n_events") * 0.5 <= col("_r50") + tol).as("p50_ok")
          },
          {
            val tol = greatest(lit(1.0), col("n_events") / lit(10000.0))
            (col("_r90lo") - tol <= col("n_events") * 0.9 &&
              col("n_events") * 0.9 <= col("_r90") + tol).as("p90_ok")
          })
        .orderBy("hour_us")
    }),

    // Windowed heavy hitters (Misra–Gries per window — O(k) state where
    // exact per-key counts hold the window's whole key set): k=16 ≥ the
    // event-type domain, so the summary is provably exact ≡ GROUP BY
    // (the x_heavy_hitters argument, per window). Batch twin of the
    // streaming operator, the ws_* gating convention.
    "ws_heavy_hitters" -> ((s, d) =>
      streaming.StreamingOps.windowedHeavyHitters(
        Tables.events(s, d), "ts", "event_type", "1 hour", "1 hour", k = 16)
        .select(unix_micros(col("window_start")).as("hour_us"),
          col("event_type"), col("n"))
        .orderBy("hour_us", "event_type")),

    // Streaming exact dedup (dropDuplicatesWithinWatermark): dedup state
    // expires at the watermark horizon, so it stays bounded on an
    // unbounded stream. Batch twin gates the surviving KEY SET (which
    // row of a duplicate group survives is arrival-order-dependent by
    // contract); the true cross-micro-batch drop + state expiry is
    // pinned in StreamingOpsSpec ("first arrival per key").
    "ws_dedup" -> ((s, d) =>
      streaming.StreamingOps.dedupeStream(Tables.events(s, d), "ts",
          "10 minutes", Seq("user_id", "event_type"))
        .select("user_id", "event_type")
        .orderBy("user_id", "event_type")),

    // Windowed approx-distinct users (HLL++ — fixed-size state per
    // window where exact distinct is unbounded): same operator body as
    // the stream, batch-gated within ±5% of the exact count per window.
    "ws_distinct" -> ((s, d) => {
      val e = Tables.events(s, d)
      // rsd 0.01: Spark's HLL++ has no sparse mode, so small windows
      // carry absolute error a coarse sketch can't bound — ~12k
      // registers/window keeps gate cardinalities near-exact without
      // the 4x-bigger state rsd 0.005 shuffles
      val approx = streaming.StreamingOps.windowedDistinct(
        e, "ts", "user_id", "1 hour", "1 hour", rsd = 0.01)
      val exact = e.groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .select(col("w.start").as("window_start"), col("n_exact"))
      approx.join(exact, "window_start")
        .select(unix_micros(col("window_start")).as("hour_us"),
          col("n_exact"),
          // ±max(1, 5%): tiny windows make a 5% band narrower than one
          // user — a ±1 estimate on n=15 is a good sketch, not a miss
          (abs(col("n_approx") - col("n_exact")) <=
            greatest(lit(1.0), col("n_exact") * 0.05)).as("approx_ok"))
        .orderBy("hour_us")
    }),

    // Streaming blocklist screening: the curation projection applied
    // PER MICRO-BATCH (documents split 3 ways) and unioned — the gate
    // asserts the batch-boundary invariance the streaming path relies
    // on (a pure projection commutes with any batching), against the
    // whole-corpus oracle. The live MemoryStream + foreachBatch
    // composition is spec-pinned (StreamingOpsSpec); patterns overlap
    // ("scan" inside "window scan") to exercise the Aho–Corasick
    // output links across batch boundaries.
    "ws_blocklist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pats = Seq("scan", "window scan", "merge window")
      (0 until 3).map(i => operators.TextAnalysis.blocklistScreen(
          docs.filter(pmod(col("doc_id"), lit(3)) === i),
          "doc_id", "text", pats))
        .reduce(_.unionByName(_))
        .orderBy("doc_id")
    }),

    // Streaming count-min: each micro-batch sketches independently and
    // the window state is the CELL-WISE SUM of batch grids — count-min's
    // mergeability is exactly batch-boundary invariance, so the 3-way
    // split union must reproduce the whole-corpus grid cell for cell
    // (the estimate side then reads identically; same oracle family as
    // x_sketch_countmin). Per-batch state is a fixed 64-cell frame
    // however many items stream through.
    "ws_countmin" -> ((s, d) => {
      val probeTerms = Seq("join", "hash", "scan", "filter", "zzz_absent")
      val toks = Tables.documents(s, d).select(col("doc_id"),
        explode(functions.TextFunctions.tokens(lower(col("text"))))
          .as("term"))
      val cells = (0 until 3).map(i => operators.CountMin.sketch(
          toks.filter(pmod(col("doc_id"), lit(3)) === i), "term", 4, 16))
        .reduce(_.unionByName(_))
        .groupBy("r", "bucket").agg(sum(col("n")).as("n"))
      operators.CountMin.estimate(cells, probeTerms, 4, 16)
        .orderBy("term")
    }),

    // Hard-negative mining: per query, top-5 most-similar vectors with
    // a DIFFERENT label — the contrastive-training negative set; knnJoin
    // shape + label exclusion, bounded aggregate, no corpus window.
    "x_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("q_label"))
      operators.Similarity.hardNegatives(e, q, "vec_id", "embedding",
          "label", "query_id", "qv", "q_label", k = 5)
        .orderBy("query_id", "rk")
    }),

    // Hopping (sliding) windows: 1-hour windows advancing every 30
    // minutes — each event lands in exactly two windows. Same streaming
    // operator body as tumbling (window() with a slide), batch-gated.
    "ws_hopping" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("start_us"), col("event_type"),
          col("n"))
        .orderBy("start_us", "event_type")),

    // Per-user event-type transition counts (first-order Markov): next
    // event via a lead window keyed by user (high-cardinality partition —
    // no skew funnel), deterministic (ts, event_id) ordering.
    "x_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // Session windows — the batch twin of StreamingOps.sessionCounts,
    // running the SAME operator body (`withWatermark` is analyzer-removed
    // on a batch Dataset): per-user activity sessions separated by ≥12h
    // of silence, end = last event + gap. Oracle: gaps-and-islands SQL.
    "ws_session" -> ((s, d) =>
      streaming.StreamingOps.sessionCounts(Tables.events(s, d), "ts",
          "user_id", gap = "12 hours", watermark = "1 hour")
        .select(col("user_id"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"), col("n_events"))
        .orderBy("user_id", "start_us")),

    // Stream-stream interval join — the batch twin of
    // StreamingOps.intervalJoin, SAME operator body (watermarks no-op in
    // batch): each purchase enriched with the same user's clicks in the
    // preceding hour. In streaming both sides' state is watermark-bounded;
    // in batch Catalyst executes the key-equality + time-range condition
    // as an equi-join with a range filter.
    "x_interval_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("c_ts"))
      streaming.StreamingOps.intervalJoin(purchases, clicks, "user_id",
          "p_ts", "c_ts", lookback = "1 hour", watermark = "1 hour")
        .select(col("purchase_id"), col("click_id"), col("user_id"))
        .orderBy("purchase_id", "click_id")
    }),

    // Flagship aggregation (engine-completeness; bench headliner).
    "q1_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampNTZType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
  )
}
