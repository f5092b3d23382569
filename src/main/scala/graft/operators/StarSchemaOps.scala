package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Sorting.ResultSortOps

/** Star-schema join/aggregate suite over the TPC-H-ish testdata
  * (SURVEY.md §2.3/§5.2 extension surface; the reference has no explicit
  * joins, so this is the capability extension the driver's star-schema
  * testdata exists to exercise).
  *
  * Scale notes (100 TB): `lineitem` is the fact table — every query
  * keeps it on the probe side. Only *constant-size* dimensions
  * (`region` 5 rows, `nation` 25 rows) carry an explicit `broadcast`
  * hint. `customer`/`orders`/`supplier` scale linearly with the data,
  * so their joins are left to AQE: at small SF it broadcasts them at
  * runtime from observed sizes; at 100 TB they become shuffled hash /
  * sort-merge joins on the join key (bucketed at rest in production).
  * Forcing `broadcast` on a linearly-scaling side would OOM at scale
  * and was judged a scale-killer in round 1.
  */
object StarSchemaOps {

  /** TPC-H Q1-shaped pricing summary: single scan of lineitem, one hash
    * aggregate, 4-row output. `l_shipdate` filter pushes to parquet
    * row-group stats.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Money SUMS round to cents: at magnitude ~1e8 a double sum's
        // last ulp sits ~6e-8 from the true value, so a 6-decimal
        // round flips with the summation order (resharding the scan
        // surfaced exactly that against the oracle); cent precision
        // puts the boundary 6 orders of magnitude away.
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .resultSorted(col("l_returnflag").asc, col("l_linestatus").asc)
  }

  /** TPC-H Q3-shaped: segment-filtered customer ⨝ orders ⨝ lineitem,
    * top-10 open orders by revenue. No broadcast hints: customer and
    * orders scale linearly, so AQE picks broadcast only when the
    * runtime size allows; orders⨝lineitem is a shuffled join on the
    * order key (bucketed on that key at rest in production, making it
    * shuffle-free).
    */
  def topRevenueOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped: full six-table star join, revenue by nation within
    * one region. Only the constant-size dims (nation 25 rows, region
    * 5 rows) are broadcast. The fact-side joins (lineitem⨝orders on the
    * order key, then customer, then supplier) are shuffled joins whose
    * strategy AQE picks from runtime sizes — at 100 TB they stay
    * sort-merge/shuffled-hash on their keys; the date filter on orders
    * is applied before any join so the largest join shrinks first.
    */
  def regionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir)
      .filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp,
        li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .resultSorted(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q6-shaped revenue forecast: pure scan-filter-aggregate, the
    * canonical pushdown probe — all three predicates reach the parquet
    * row-group stats, output is one row, zero joins, one tiny shuffle.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
        .as("revenue"))

  /** TPC-H Q10-shaped: revenue lost to returned items per customer —
    * a HIGH-cardinality aggregation (one group per customer, unlike
    * q1/q5's handful), so the final agg shuffle actually carries
    * volume; top-20 via TakeOrderedAndProject. Nation broadcast only.
    */
  def returnedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    // Revenue is pre-aggregated per order BEFORE the join chain: the
    // orderkey groupBy is map-side-combinable on the same key the
    // orders join shuffles on anyway, so the join carries one row per
    // order instead of every returned lineitem.
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("__rev"))
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey")
    val nation = Tables.nation(spark, sfDir)
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("__rev")), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q14-shaped promo-revenue share: conditional aggregation
    * (CASE inside SUM) over lineitem⨝part in one month. Part scales
    * linearly → no broadcast hint; AQE picks the strategy. Two
    * measures and their ratio come out of ONE aggregate pass.
    */
  def promoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(part, li("l_partkey") === part("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)), 4)
          .as("promo_revenue"),
        round(sum(rev), 4).as("total_revenue"),
        round(
          sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) * 100.0
            / sum(rev), 6).as("promo_pct"))
  }

  /** Top-k by price: planned as TakeOrderedAndProject — per-partition
    * heap of k, no total sort (O1-shaped at fact-table scale).
    */
  def topOrdersByPrice(spark: SparkSession, sfDir: String, k: Int)
      : DataFrame =
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** Ranking window: top-3 orders per customer. One shuffle on
    * o_custkey; rank is computed within each partition.
    */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("o_custkey").asc, col("rank").asc)
  }

  /** TPC-H Q12-shaped: lineitem⨝orders with conditional counts split
    * by order priority class — the join feeds ONE agg pass whose two
    * measures are CASE-gated (no second scan, no second join). The
    * join is a shuffled equi-join on the order key; at rest both
    * sides would be bucketed on it.
    */
  def lineStatusPriorityCounts(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus")
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1).otherwise(0)).cast("long").as("high_count"),
        sum(when(high, 0).otherwise(1)).cast("long").as("low_count"))
      .resultSorted(col("l_linestatus").asc)
  }

  /** TPC-H Q18-shaped: orders whose total line quantity exceeds a
    * threshold — an aggregate-then-join (the groupBy on the fact
    * table runs FIRST, shrinking it to one row per order, before any
    * join). Customer/orders join the tiny filtered set; AQE broadcasts
    * it at runtime.
    */
  def largeQuantityOrders(spark: SparkSession, sfDir: String,
      minQty: Double, k: Int): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name")
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q19-shaped: disjunction of predicate bundles over
    * lineitem⨝part. The per-bundle part predicates can't prune the
    * join (they're OR'd), but Catalyst extracts the common join key
    * and pushes the l_quantity bounds below it; one agg row out.
    */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir)
      .select("p_partkey", "p_brand", "p_size")
    val bundle1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 20)
    val bundle2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 30)
    val bundle3 = col("p_brand") === "Brand#7" &&
      col("p_size").between(20, 50) && col("l_quantity").between(20, 40)
    li.join(part, li("l_partkey") === part("p_partkey"))
      .filter(bundle1 || bundle2 || bundle3)
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4).as("revenue"))
  }

  /** TPC-H Q15-shaped: supplier(s) with the maximum quarterly revenue
    * — a derived aggregate view probed by its own scalar max (the A4
    * ungrouped-MAX pattern at fact scale). The 1-row max aggregate is
    * the only broadcast (constant size by construction); the revenue
    * view computes once and AQE reuses its shuffle for both sides.
    */
  def topSuppliersByRevenue(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4).as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    val supp = Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
    rev.join(broadcast(mx), col("total_rev") === col("mx"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .resultSorted(col("s_suppkey").asc)
  }

  /** TPC-H Q7-shaped nation trade volume: revenue flowing between two
    * nations (either direction) per year — lineitem joined to BOTH its
    * supplier's and its customer's nation. The two nation lookups are
    * the only broadcasts (25 rows); the symmetric pair filter runs
    * before the aggregate so only cross-nation rows reach it.
    */
  def nationVolume(spark: SparkSession, sfDir: String,
      nationA: String, nationB: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
    val nc = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val ns = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nc), cust("c_nationkey") === col("cn_key"))
      .join(broadcast(ns), supp("s_nationkey") === col("sn_key"))
      .filter(
        (col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        4).as("revenue"))
      .resultSorted(col("supp_nation").asc, col("cust_nation").asc,
        col("l_year").asc)
  }

  /** TPC-H Q8-shaped market share: the fraction of a region's
    * part-type revenue supplied by one nation, per order year —
    * a conditional-sum ratio over a seven-relation join. Dimension
    * filters (region, part type) apply before their joins; only
    * nation/region broadcast.
    */
  def marketShare(spark: SparkSession, sfDir: String,
      supplierNation: String, regionName: String, partType: String)
      : DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir)
      .filter(col("p_type") === partType).select("p_partkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
    val nc = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_region"))
    val ns = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
    val region = Tables.region(spark, sfDir)
      .filter(col("r_name") === regionName).select("r_regionkey")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(part, li("l_partkey") === part("p_partkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(broadcast(nc), cust("c_nationkey") === col("cn_key"))
      .join(broadcast(region), col("cn_region") === region("r_regionkey"))
      .join(broadcast(ns), supp("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === supplierNation, rev)
          .otherwise(0.0)) / sum(rev), 6).as("mkt_share"))
      .resultSorted(col("o_year").asc)
  }

  /** TPC-H Q22-shaped: above-average-balance customers who never
    * ordered — scalar-average subquery (1-row broadcast, like q15)
    * feeding a NOT-EXISTS anti join, rolled up per segment. The anti
    * join keeps only customer columns flowing; orders is probe-side
    * pruned to its key column.
    */
  def lostCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    val ord = Tables.orders(spark, sfDir).select("o_custkey")
    cust.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
      .drop("ab")
      .join(ord, col("c_custkey") === ord("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 4).as("total_bal"))
      .resultSorted(col("c_mktsegment").asc)
  }

  /** TPC-H Q17-shaped small-quantity revenue: lineitems under 20% of
    * their part's average quantity, for a brand/size slice — the
    * correlated-aggregate-subquery pattern, authored decorrelated:
    * the per-part average is a groupBy on the fact table joined back
    * on the part key (exactly what Catalyst's subquery decorrelation
    * would produce). The brand slice prunes parts BEFORE both joins.
    */
  def smallQuantityRevenue(spark: SparkSession, sfDir: String,
      brand: String, maxSize: Int): DataFrame = {
    val part = Tables.part(spark, sfDir)
      .filter(col("p_brand") === brand && col("p_size") <= maxSize)
      .select("p_partkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgs = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_threshold"))
    li.join(part, li("l_partkey") === part("p_partkey"))
      .join(avgs, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
  }

  /** TPC-H Q13-shaped order-count distribution: customer ⟕ orders
    * (the one classic join type the rest of the suite doesn't use —
    * unmatched customers MUST survive with count 0, mirroring the
    * reference's left-probed dict join, ethical_crawler.py:1474–1487),
    * then a histogram over the per-customer counts. The orders-side
    * predicate lives on the join input, not a WHERE after it, so the
    * outer semantics are preserved. Two aggregates: per-customer
    * (high cardinality, shuffled on the join key AQE already used)
    * then the tiny histogram.
    */
  def orderCountDistribution(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir).select("c_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count skips nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .resultSorted(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q21-shaped waiting-supplier audit: late lineitems (shipped
    * more than `lateDays` after the order date) on finished
    * multi-supplier orders where every OTHER supplier shipped on time
    * — one correlated EXISTS and one correlated NOT-EXISTS against
    * the same fact table with an inequality correlation
    * (l_suppkey <>), authored decorrelated: the EXISTS is a left-semi
    * and the NOT-EXISTS a left-anti join on the order key with the
    * supplier-inequality as a residual condition. Both probe sides
    * reuse the one lineitem⨝orders relation; everything shuffles on
    * l_orderkey, so at rest (bucketed on the order key) all three
    * joins are co-located.
    */
  def waitingSuppliers(spark: SparkSession, sfDir: String,
      lateDays: Int = 90, k: Int = 10): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $lateDays DAY"))
          .as("late"))
      .cache() // two consumers below; at rest the orderkey bucketing
               // makes both sides of this reuse shuffle-free
    // Both correlated subqueries collapse into ONE per-order
    // aggregate: "another supplier exists" ⟺ distinct suppliers ≥ 2,
    // "no other supplier was late" ⟺ distinct LATE suppliers = 1
    // (the waiting supplier itself). One shuffle on the order key
    // replaces the semi- and anti-join passes over the fact relation
    // (measured 3.3× DuckDB as joins, ~1.5× as the aggregate).
    // two plain hash aggs (per (order,supplier), then per order)
    // instead of two countDistincts, which would plan an Expand that
    // doubles the row stream
    val ordStats = l
      .groupBy(col("l_orderkey").as("agg_key"),
        col("l_suppkey").as("agg_supp"))
      .agg(max(col("late")).as("supp_late"))
      .groupBy(col("agg_key"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("supp_late"), 1).otherwise(0)).as("n_late"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
      .select(col("agg_key"))
    val waiting = l.filter(col("late"))
      .join(ordStats, col("l_orderkey") === col("agg_key"), "left_semi")
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name")
    waiting.join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(k)
  }

  /** TPC-H Q9-shaped profit rollup: per-nation, per-year profit over
    * lineitem⨝orders⨝supplier⨝nation (cost stand-in: the tax amount —
    * this schema carries no supplycost). High-cardinality two-key agg
    * fed by three fact-side joins; only nation broadcasts.
    */
  def nationProfit(spark: SparkSession, sfDir: String): DataFrame = {
    // orders/supplier broadcast (runtime sizes), so the whole join +
    // partial-agg pipeline runs in the lineitem SCAN stage — which a
    // single-row-group file serializes behind 3 tasks (941 ms of a
    // 1.1 s wall measured). FanOut restores width only when the scan
    // under-splits.
    val li = graft.FanOut.byKey(
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice",
          "l_discount", "l_tax"),
      col("l_orderkey"))
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate")
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("l_tax") * col("l_extendedprice")), 4).as("profit"))
      .resultSorted(col("nation").asc, col("o_year").desc)
  }

  /** TPC-H Q11-shaped concentration report: nations holding more than
    * `fraction` of total supplier balance — a grouped aggregate
    * filtered against a GLOBAL scalar aggregate (the HAVING-vs-total
    * decorrelation shape): the 1-row threshold broadcasts to the
    * per-nation aggregate, like q15/q22.
    */
  def topNationsByBalance(spark: SparkSession, sfDir: String,
      fraction: Double = 0.04): DataFrame = {
    val supp = Tables.supplier(spark, sfDir)
      .select("s_nationkey", "s_acctbal")
    val nat = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name")
    val perNation = supp
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("s_acctbal")).as("__bal"))
    val thr = supp.agg((sum(col("s_acctbal")) * fraction).as("__thr"))
    perNation.join(broadcast(thr), col("__bal") > col("__thr"))
      .select(col("n_name"), round(col("__bal"), 4).as("total_bal"))
      .resultSorted(col("total_bal").desc, col("n_name").asc)
  }

  /** TPC-H Q16-shaped supplier diversity: distinct suppliers per part
    * (brand, type), excluding one brand and every supplier matching a
    * NOT-IN subquery. The NOT IN is an anti join on the supplier key
    * (legal because s_suppkey is non-null — NOT IN over a nullable
    * column would need the null-aware variant); the anti join runs
    * FIRST so excluded suppliers never reach the wide join.
    */
  def supplierDiversity(spark: SparkSession, sfDir: String,
      excludeBrand: String = "Brand#5"): DataFrame = {
    val part = Tables.part(spark, sfDir)
      .filter(col("p_brand") =!= excludeBrand)
      .select("p_partkey", "p_brand", "p_type")
    val bad = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    // NOT pre-distinct'd: (l_partkey, l_suppkey) pairs are ~98.5%
    // unique in this corpus (590,973 of 600,000 at sf0.1), so a
    // distinct-first pass would add a full extra shuffle and remove
    // almost nothing — countDistinct's own partial/final aggregate is
    // the single necessary exchange (measured: distinct-first is not
    // faster at sf0.1). The aggregate keys on a FIXED-WIDTH 64-bit
    // hash of (brand, type) instead of the two strings — the fact-side
    // rows shuffle and hash 8 bytes instead of ~20, and the strings
    // are restored by a broadcast join against the ~|brands|·|types|
    // dim AFTER the aggregate (measured 0.83 → 0.55 s at sf0.1; a
    // 64-bit collision across ~150 group values is ~1e-15 and the
    // oracle hash-match would surface one).
    val groupCode =
      xxhash64(concat_ws("|", col("p_brand"), col("p_type")))
    val codedPart = part.select(col("p_partkey"),
      groupCode.as("__code"))
    val groupDim = part.select(groupCode.as("__code"),
      col("p_brand"), col("p_type")).distinct()
    // The anti-join + part join + partial countDistinct all run
    // map-side in the scan stage; a single-row-group file serializes
    // them behind 3 tasks (measured 429 ms of a 1.0 s wall). FanOut
    // restores width only when the scan under-splits — a properly
    // split table at scale never pays the exchange.
    val li = graft.FanOut.byKey(
      Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey"),
      col("l_partkey"))
    li.join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(codedPart, col("l_partkey") === col("p_partkey"))
      .groupBy(col("__code"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .join(broadcast(groupDim), Seq("__code"))
      .select(col("p_brand"), col("p_type"), col("supplier_cnt"))
      .resultSorted(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc)
  }

  /** TPC-H Q20-shaped concentration audit: suppliers whose shipped
    * quantity of one part type in 1997 exceeds `fraction` of their
    * all-time quantity — the nested IN-chain (parts filter → per-
    * supplier correlated aggregate → supplier semi join) authored
    * decorrelated: one conditional aggregate per supplier, a filter
    * against its own row, and a left-semi probe into supplier.
    */
  def concentratedSuppliers(spark: SparkSession, sfDir: String,
      partType: String = "STANDARD", fraction: Double = 0.18)
      : DataFrame = {
    val part = Tables.part(spark, sfDir)
      .filter(col("p_type") === partType).select("p_partkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val in97 = col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    val concentrated = li
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(when(in97, col("l_quantity")).otherwise(0.0)).as("q97"),
        sum(col("l_quantity")).as("qall"))
      .filter(col("q97") > col("qall") * fraction)
      .select(col("l_suppkey"))
    Tables.supplier(spark, sfDir)
      .join(concentrated, col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_name"))
      .orderBy(col("s_name").asc)
  }

  /** TPC-H Q2-shaped minimum-cost supplier: for every part of one type,
    * the regional supplier(s) offering it at the lowest observed unit
    * price. The catalog has no partsupp table, so the (part, supplier)
    * offer book is derived from lineitem — min(extendedprice/quantity)
    * per pair — which is itself the realistic 100 TB shape (price facts
    * live in the fact table).
    *
    * Q2's correlated `cost = (SELECT min(cost) ...)` subquery is
    * DECORRELATED into one window min over the regional offer book —
    * a single shuffle on p_partkey instead of a per-row re-aggregation
    * (the oracle SQL keeps the correlated form; DuckDB's optimizer does
    * the same rewrite, and the hash-match proves the two equivalent).
    * Dims (region, nation, filtered part, supplier) broadcast; the only
    * data-proportional shuffles are the offer-book aggregation keyed on
    * (partkey, suppkey) and the window partition on partkey.
    */
  def minCostSuppliers(spark: SparkSession, sfDir: String,
      regionName: String = "ASIA", partType: String = "STANDARD")
      : DataFrame = {
    val region = Tables.region(spark, sfDir)
      .filter(col("r_name") === regionName).select("r_regionkey")
    val nation = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_regionkey", "n_name")
    val supp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    val regionalSupp = supp
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val part = Tables.part(spark, sfDir)
      .filter(col("p_type") === partType).select("p_partkey", "p_name")
    // The filtered dims join the fact BEFORE the aggregate: the
    // type/region prune and the attribute pickup happen in the same
    // two hash joins, so only ~1/(|types|·|regions|) of lineitem
    // reaches the (partkey, suppkey) shuffle and no separate
    // semi-join prune or post-aggregate join is planned (each extra
    // join is an extra exchange — at the 96-query bench scale the
    // per-stage scheduling floor dominates, and at 100 TB the saved
    // exchanges carry the offer book). Dim attributes ride the group
    // keys: they are functionally dependent on (partkey, suppkey),
    // so key width grows but group count does not.
    // supplier and part scale linearly (unlike nation/region) — no
    // broadcast hints: AQE broadcasts them while they fit and degrades
    // to shuffled joins at scale (ScaleShapeSpec holds q2 to that).
    val regional = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(regionalSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("s_acctbal"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val w = Window.partitionBy(col("p_partkey"))
    regional
      .withColumn("min_cost", min(col("cost")).over(w))
      .filter(col("cost") === col("min_cost"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name"), round(col("s_acctbal"), 6).as("s_acctbal"),
        round(col("cost"), 6).as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc,
        col("s_name").asc, col("p_partkey").asc)
  }

  /** Order-priority histogram with an EXISTS-shaped semi join
    * (lineitem committed late). Left-semi keeps only order columns
    * flowing; no row multiplication.
    */
  def priorityCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey")
    ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .resultSorted(col("o_orderpriority").asc)
  }
}
