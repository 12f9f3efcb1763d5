package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TPC-H-shape optimizer-breadth pack (Q2/4/7/8/9/10/11/13/14/15/16/
  * 18/19/20/22 adapted to the testdata star schema — no partsupp /
  * comment / shipmode columns, so those shapes are re-expressed on
  * the columns that exist; each adaptation is noted on the query).
  *
  * Why these exist: Q1/3/5/6/17/21 (in [[Relational]]) already cover
  * the core scan→join→agg pipeline; the shapes here each force a
  * DISTINCT Catalyst path — null-aware anti join (NOT IN), correlated
  * EXISTS with a non-equi conjunct, disjunctive multi-column
  * pushdown, double aggregation, argmax-by-scalar-subquery, and
  * conditional-aggregate ratios — so the optimizer surface a
  * reference user relies on is pinned end-to-end by the DuckDB gate.
  *
  * Determinism: every query ends in a total ORDER BY with a unique
  * tiebreak and rounds derived doubles (repo-wide oracle contract).
  *
  * Scale notes (100 TB): nation/region are fixed-cardinality →
  * always `broadcast()`. customer/supplier/part grow with SF → left
  * to AQE, which broadcast-converts them while they fit and falls
  * back to shuffle join beyond that; filters on them stay pushed
  * either way. Every aggregation here is partial→final (map-side
  * combine), and no query materializes an unbounded intermediate on
  * the driver.
  */
object TpchShapes {

  private def rev: org.apache.spark.sql.Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q2 shape (min-cost supplier). partsupp does not exist, so the
    * per-(part, supplier) offer price is derived from lineitem:
    * min(l_extendedprice / l_quantity). The "supplier achieving the
    * per-part minimum" is the hand-decorrelated form of Q2's
    * correlated scalar subquery: an extra aggregation on p_partkey
    * joined back on equality — the oracle keeps the correlated
    * subquery so DuckDB's own decorrelation cross-checks ours.
    * Scale: both joins on l_partkey carry only the SMALL/size-filtered
    * slice; the min-cost join key is the same p_partkey the candidate
    * set is already hashed on, so AQE reuses the partitioning.
    *
    * The part filter is pushed BELOW the cost aggregation (round-16:
    * the verdict's fattest non-adjudicated decade ratio, 8.5×/decade —
    * the old shape shuffled the ENTIRE fact on (l_partkey, l_suppkey)
    * to price parts the SMALL/size filter was about to discard; the
    * semi join runs map-side while the candidate key set fits a
    * broadcast, and past that AQE's shuffle fallback still beats
    * aggregating 50× the rows). Pure pushdown: per-(part, supplier)
    * minima of surviving parts are untouched, so every result row is
    * identical — the shared DuckDB oracle pins it.
    */
  def minCostSupplier(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, lineitem: DataFrame): DataFrame = {
    val candParts = part
      .filter(col("p_type") === "SMALL" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_brand"))
    val cost = lineitem
      .join(candParts.select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val euro = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val cand = candParts
      .join(cost, col("p_partkey") === col("l_partkey"))
      .join(euro, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"), col("cost"))
    val minCost = cand.groupBy(col("p_partkey").as("mk")).agg(min("cost").as("min_cost"))
    cand
      .join(minCost, col("p_partkey") === col("mk") && col("cost") === col("min_cost"))
      // round via an intermediate decimal(20,10): the raw quotient is
      // bit-identical across engines (IEEE division), but round(x, 4)
      // straight off the double diverges when a cost lands on a
      // .xxxx5 boundary (Spark rounds the EXACT binary expansion
      // half-up; DuckDB goes through a 10^4 multiply whose own
      // rounding can cross the half). Quantizing to 10 decimals
      // first — far above double noise, far below the boundary —
      // gives both engines the same decimal to round. Same class of
      // fix as Q9's decimal sums (sum-on-a-rounding-boundary).
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        round(col("cost").cast("decimal(20,10)"), 4).cast("double").as("cost"))
      .orderBy("p_partkey", "s_name")
  }

  /** Q4 shape (order priority check). No commit/receipt dates, so
    * "late" = some lineitem shipped after the order date. The EXISTS
    * becomes a LEFT SEMI join whose condition carries a NON-EQUI
    * conjunct (l_shipdate > o_orderdate) next to the key equality —
    * the semi-join path the plain `IN` queries never exercise.
    */
  def orderPriorityCheck(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Q7 shape (volume shipping between a nation pair). The
    * disjunctive pair condition cannot be pushed through either join
    * side by Catalyst, so both nation dims are PRE-filtered to the
    * two participating nations before broadcasting — the residual OR
    * then only discriminates direction on already-tiny inputs.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                     supplier: DataFrame, nation: DataFrame): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = nation.filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(rev), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8 shape (market share): one nation's fraction of ECONOMY-part
    * volume sold into AMERICA, per order year — a conditional
    * aggregate ratio over a 6-way join. Both sides of the ratio come
    * from ONE pass (sum(CASE)/sum), not two scans.
    */
  def marketShare(lineitem: DataFrame, part: DataFrame, orders: DataFrame,
                  customer: DataFrame, supplier: DataFrame, nation: DataFrame,
                  region: DataFrame): DataFrame = {
    val custNation = nation
      .join(broadcast(region.filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = nation
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("nation"))
    lineitem
      .join(part.filter(col("p_type") === "ECONOMY"), col("l_partkey") === col("p_partkey"))
      .join(orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("nation") === "NATION_5", rev).otherwise(lit(0.0))) / sum(rev),
        6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q9 shape (product profit). No ps_supplycost, so cost is proxied
    * as 10% of p_retailprice × quantity; profit = revenue − cost,
    * grouped by supplier nation × order year. The p_name LIKE filter
    * prunes part before the join fans out.
    */
  def productProfit(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                    orders: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(part.filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      // Exact decimal accumulation: a double sum over ~20k amounts is
      // order-dependent in its last ulps, and this query's totals land
      // on a cent boundary (….845) — decimal addition is associative,
      // so Spark's partition order and DuckDB's sequential order agree
      // exactly. The per-row double→decimal(28,8) rounding is itself
      // deterministic and identical in both engines.
      .agg(round(sum((rev - col("p_retailprice") * col("l_quantity") * lit(0.1))
        .cast("decimal(28,8)")).cast("double"), 2).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q10 shape (returned-item revenue): top 20 customers by revenue
    * lost to returns in a quarter. Final ordering is a
    * TakeOrderedAndProject (bounded heap), not a global sort.
    */
  def returnedItemRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                          nation: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(rev), 2).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q11 shape (balance concentration — partsupp-free reformulation):
    * nations holding > 5% of global supplier balance. The global-sum
    * threshold is a 1-row aggregate joined in by broadcast (the
    * decorrelated form of Q11's HAVING scalar subquery, which the
    * oracle keeps).
    */
  def balanceConcentration(supplier: DataFrame, nation: DataFrame): DataFrame = {
    val threshold = supplier.agg((sum("s_acctbal") * lit(0.05)).as("thr"))
    supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("s_acctbal").as("bal"))
      .join(broadcast(threshold))
      .filter(col("bal") > col("thr"))
      .select(col("n_name"), round(col("bal"), 2).as("nation_balance"))
      .orderBy(col("nation_balance").desc, col("n_name"))
  }

  /** Q13 shape (customer order-count distribution): DOUBLE
    * aggregation — count orders per customer (left outer keeps
    * zero-order customers), then the distribution of those counts.
    * The join condition carries the priority filter so it never
    * becomes a post-join filter that would drop the NULL rows.
    */
  def custOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders,
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** Q14 shape (promo revenue share): one-row conditional-aggregate
    * ratio for a month. */
  def promoRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
          sum(rev), 6).as("promo_revenue"),
        count(lit(1)).as("n_lines"))

  /** Q15 shape (top supplier): supplier(s) whose quarterly revenue
    * equals the maximum — argmax via a broadcast 1-row max joined
    * back (the view + scalar-subquery form in the oracle). Revenue is
    * compared UNROUNDED within one engine's own computed set, so the
    * argmax is internally consistent on both sides.
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val revBySupp = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(rev).as("total_revenue"))
    val maxRev = revBySupp.agg(max("total_revenue").as("max_rev"))
    supplier
      .join(revBySupp, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_rev"))
      .select(col("s_suppkey"), col("s_name"), round(col("total_revenue"), 2).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q16 shape (supplier count by part attrs) through the SQL
    * FRONTEND: the NOT IN subquery plans as a NULL-AWARE anti join
    * (BroadcastNestedLoopJoin-free because s_suppkey is non-null) —
    * a physical path no other query in the pack hits; plus
    * count(DISTINCT) over a join. Oracle runs the same statement.
    */
  def supplierCountSql(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    lineitem.createOrReplaceTempView("lineitem")
    part.createOrReplaceTempView("part")
    supplier.createOrReplaceTempView("supplier")
    spark.sql(
      """SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)
  }

  /** Q18 shape (large-volume orders): orders whose total quantity
    * exceeds 300 — IN-(GROUP BY HAVING) decorrelates to an
    * aggregate-then-join; the aggregate output (46 keys at sf0.01,
    * ~SF-proportional) is small enough that AQE broadcast-joins it
    * against orders.
    */
  def largeVolumeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 300)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19 shape (disjunctive predicate): OR of three
    * (brand, size-range, quantity-range) conjunctions across the
    * part⋈lineitem join. Catalyst extracts the common
    * `p_size >= 1`-style bounds where it can and evaluates the
    * residual disjunction post-join; the oracle pins the result.
    */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(round(coalesce(sum(rev), lit(0.0)), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Q20 shape (qualified suppliers): suppliers in two regions with
    * at least one (supplier, red part) pair totalling > 90 units —
    * a nested IN that plans as aggregate → semi-join chain. The
    * HAVING aggregate is keyed on (l_suppkey, l_partkey), then
    * projected to the distinct supplier set before the semi join, so
    * the probe side is at most |suppliers|.
    */
  def qualifiedSuppliers(supplier: DataFrame, nation: DataFrame, lineitem: DataFrame,
                         part: DataFrame): DataFrame = {
    val qualified = lineitem
      .join(part.filter(col("p_name").startsWith("red")).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 90)
      .select("l_suppkey")
    supplier
      .join(broadcast(nation.filter(col("n_regionkey") < 2)),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** Q22 shape (dormant high-balance customers). No phone column, so
    * cntrycode := c_custkey % 7 (documented proxy); "dormant" = no
    * order since 2000-01-01 (plain NOT EXISTS is empty here — every
    * customer has orders). Exercises scalar-subquery threshold +
    * anti join with a filtered build side + aggregation.
    */
  def dormantCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val avgBal = customer
      .filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("avg_bal"))
    customer
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(pmod(col("c_custkey"), lit(7L)).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** Q12 shape (shipping-mode priority split). l_shipmode /
    * commitdate / receiptdate don't exist in the testdata, so Q12's
    * essence — a fact→orders join feeding conditional aggregation
    * that splits an order-priority indicator per category — is
    * expressed per l_returnflag over one shipdate year: URGENT/HIGH
    * line count vs the rest. Physically identical to Q12: pushed
    * date-range scan filter, one equi join (orders broadcastable
    * while it fits, AQE decides), one partial→final agg with two
    * CASE sums, tiny result. Completes the Q1–Q22 shape sweep.
    */
  def priorityByFlag(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate").between(
        lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .join(orders, col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
}
