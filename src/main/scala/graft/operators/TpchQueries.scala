package graft.operators

import graft.Graft
import graft.Graft.Q
import org.apache.spark.sql.functions._

/** Round-4 engine breadth: the remaining TPC-H join/aggregate shapes
  * (Q7, Q8, Q9, Q12, Q16) re-expressed over the driver's star schema —
  * with Q1/Q2/Q3/Q4/Q5/Q6/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q21/Q22 already
  * in Core/Extended/CorrelatedQueries this completes coverage of all 22
  * TPC-H plan shapes. The synthetic schema has no partsupp table and no
  * shipmode/commitdate columns, so: Q9's supply cost is re-expressed
  * from p_retailprice, Q12's shipmode classes become order-priority
  * classes, and Q16's supplier blocklist keys on s_acctbal < 0.
  *
  * Scale posture (100 TB): each query is one keyed shuffle per logical
  * aggregation; nation/region dims (25/5 rows at every sf) are
  * explicitly broadcast, part/supplier/customer dims are left to AQE's
  * size-based broadcast election (they are dims — orders of magnitude
  * below the lineitem fact at any sf). Filters sit directly on the
  * scans so parquet pushdown prunes row groups before the joins.
  *
  * Numeric policy (CoreQueries scaladoc): revenue terms are EXACT
  * decimal products of exact ≤2-decimal inputs (never a decimal cast of
  * the double product — the engines' double→decimal boundary rounding
  * diverges, caught at the sf1 gate), summed exactly, cast to double at
  * the edge.
  * Years are int32 on both engines (DuckDB year() is int64, so oracles
  * CAST(... AS INTEGER)).
  */
object TpchQueries {

  private val ts = (s: String) => lit(s).cast("timestamp")

  /** Q7 volume shipping: bilateral trade volume between two nations by
    * ship year. The nation-name filters are applied on the 25-row dims
    * BEFORE the broadcast joins, so the fact scan fans out only into
    * the two qualifying nations; the one big shuffle is
    * lineitem⋈orders on l_orderkey. */
  val q7VolumeShipping: Q = (s, dir) => {
    val pair = Seq("NATION_1", "NATION_2")
    val n1 = Graft.table(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Graft.table(s, dir, "nation").filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Graft.table(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1995-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .join(Graft.table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Graft.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Graft.table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeShippingSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
      |  CAST(SUM((CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS revenue
      |FROM lineitem l, orders o, customer c, supplier s, nation n1, nation n2
      |WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
      |  AND l.l_suppkey = s.s_suppkey
      |  AND s.s_nationkey = n1.n_nationkey AND c.c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_1', 'NATION_2')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2')
      |  AND n1.n_name <> n2.n_name
      |  AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Q8 national market share: NATION_6's share of AMERICA-region PROMO
    * revenue per order year — the sum(CASE)/sum() ratio over a 6-table
    * join. Both sums stay decimal-exact; the share divides two doubles
    * (each a deterministic decimal→double cast), so the quotient is one
    * IEEE op, bit-identical cross-engine. */
  val q8MarketShare: Q = (s, dir) => {
    val amNations = Graft.table(s, dir, "nation")
      .join(broadcast(Graft.table(s, dir, "region")
        .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNation = Graft.table(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val vol = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
    Graft.table(s, dir, "lineitem")
      .join(Graft.table(s, dir, "part").filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(Graft.table(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1995-01-01 00:00:00") &&
          col("o_orderdate") < ts("1997-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Graft.table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(amNations), col("c_nationkey") === col("cn_key"))
      .join(Graft.table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_6", vol)
          .otherwise(lit(0).cast("decimal(28,8)"))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_6'
      |    THEN (CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))
      |    ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
      |  / CAST(SUM((CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l.l_discount AS DECIMAL(4,2))))) AS DOUBLE)
      |    AS mkt_share
      |FROM part p, lineitem l, orders o, customer c, supplier s,
      |     nation n1, nation n2, region r
      |WHERE p.p_partkey = l.l_partkey AND l.l_orderkey = o.o_orderkey
      |  AND o.o_custkey = c.c_custkey AND c.c_nationkey = n1.n_nationkey
      |  AND n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
      |  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n2.n_nationkey
      |  AND p.p_type = 'PROMO'
      |  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  /** Q9 product-type profit: per supplier nation × order year, profit on
    * red-named parts. No partsupp in the schema, so the supply-cost term
    * is re-expressed as 5% of p_retailprice per unit:
    * amount = extprice·(1−disc) − p_retailprice·l_quantity·0.05, all in
    * EXACT decimal arithmetic (every factor is an exact ≤2-decimal
    * value; the tight precisions keep the difference inside 38 digits),
    * summed exactly — order- and engine-independent. */
  val q9ProductProfit: Q = (s, dir) => {
    val amount = col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")) -
      col("p_retailprice").cast("decimal(10,2)") *
        col("l_quantity").cast("decimal(4,2)") * lit(0.05).cast("decimal(4,2)")
    val nations = Graft.table(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name"))
    Graft.table(s, dir, "lineitem")
      .join(Graft.table(s, dir, "part").filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(Graft.table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nations), col("s_nationkey") === col("sn_key"))
      .join(Graft.table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProductProfitSql: String =
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
      |             * (1.00 - CAST(l.l_discount AS DECIMAL(4,2)))
      |           - CAST(p.p_retailprice AS DECIMAL(10,2))
      |             * CAST(l.l_quantity AS DECIMAL(4,2))
      |             * CAST(0.05 AS DECIMAL(4,2))) AS DOUBLE)
      |    AS sum_profit
      |FROM lineitem l, part p, supplier s, nation n, orders o
      |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
      |  AND s.s_nationkey = n.n_nationkey AND l.l_orderkey = o.o_orderkey
      |  AND p.p_name LIKE '%red%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Q12 priority classes (shipmode surrogate): per returnflag, how many
    * 1996-shipped lines belong to urgent/high-priority orders vs the
    * rest — the two-way conditional count over the orders⋈lineitem
    * join. count(CASE) keeps both engines in int64. */
  val q12PriorityClass: Q = (s, dir) => {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Graft.table(s, dir, "orders")
      .join(Graft.table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        count(when(high, lit(1))).as("high_line_count"),
        count(when(!high, lit(1))).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12PriorityClassSql: String =
    """SELECT l.l_returnflag,
      |  COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS high_line_count,
      |  COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |             THEN 1 END) AS low_line_count
      |FROM orders o, lineitem l
      |WHERE o.o_orderkey = l.l_orderkey
      |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Q16 supplier relationship count: distinct suppliers per
    * (brand, type, size) bucket for mid-size non-PROMO parts outside
    * Brand#1, excluding blocklisted suppliers (s_acctbal < 0 — the
    * schema's stand-in for the comment-flagged complaints list). The
    * blocklist exclusion is a left-anti join against a tiny frame;
    * COUNT(DISTINCT) shuffles once on the 3-part group key. */
  val q16SupplierCnt: Q = (s, dir) => {
    val blocked = Graft.table(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Graft.table(s, dir, "lineitem")
      .join(Graft.table(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size") <= 15),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l, part p
      |WHERE l.l_partkey = p.p_partkey
      |  AND p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO' AND p.p_size <= 15
      |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  def queries: Map[String, Q] = Map(
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q12_priority_class" -> q12PriorityClass,
    "q16_supplier_cnt" -> q16SupplierCnt,
  )

  def oracle: Map[String, String] = Map(
    "q7_volume_shipping" -> q7VolumeShippingSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_product_profit" -> q9ProductProfitSql,
    "q12_priority_class" -> q12PriorityClassSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
  )
}
