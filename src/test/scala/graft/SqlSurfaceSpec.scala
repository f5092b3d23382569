package graft

import graft.operators.StarSchemaOps

/** The SQL surface: every table registered as a view, ANSI SQL via
  * `spark.sql` returning exactly what the DataFrame operators return
  * (Catalyst plans both). A reference user who writes SQL instead of
  * the verb API loses nothing.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sfSmoke)
    assert(spark.sql("SELECT count(*) FROM lineitem").head.getLong(0) > 0)
    // events view carries the nanos→timestamp fix
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
      .dataType.typeName == "timestamp")
  }

  test("SQL q1 pricing summary ≡ DataFrame operator") {
    Tables.registerAll(spark, sfSmoke)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  avg(l_discount) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(rows(sql) == rows(StarSchemaOps.pricingSummary(spark, sfSmoke)))
  }

  test("SQL q5 six-table star join ≡ DataFrame operator") {
    Tables.registerAll(spark, sfSmoke)
    val sql = spark.sql(
      """SELECT n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
    assert(rows(sql) == rows(StarSchemaOps.regionRevenue(spark, sfSmoke)))
  }

  test("SQL window ranking ≡ DataFrame operator (w1)") {
    Tables.registerAll(spark, sfSmoke)
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders
        |) WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin)
    assert(rows(sql) ==
      rows(StarSchemaOps.topOrdersPerCustomer(spark, sfSmoke)))
  }
}
