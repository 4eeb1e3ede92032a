package graft.warehouse

/** DuckDB twin of [[Warehouse]]: a shared WITH-prelude defining the star
  * schema over the raw parquet tables, mirroring every derived expression
  * 1:1 (same decimal casts, same double expression shapes — see [[graft.Det]]).
  * Each oracle query is `prelude + body`; DuckDB only materializes the CTEs
  * a query actually references.
  */
object OracleSql {
  val prelude: String = """WITH dim_part AS (
  SELECT product_key, p_partkey, p_name, p_brand, p_type, p_size, price, cost,
         CAST(price - cost AS DOUBLE) / CAST(price AS DOUBLE) * 100.0 AS profit_margin_pct,
         CASE WHEN price < 1200 THEN 'Budget' WHEN price < 1800 THEN 'Mid-range' ELSE 'Premium' END AS price_category,
         TRUE AS is_current
  FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) AS BIGINT) AS product_key,
           p_partkey, p_name, p_brand, p_type, p_size,
           CAST(p_retailprice AS DECIMAL(18,2)) AS price,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * 0.60, 2) AS DECIMAL(18,2)) AS cost
    FROM part)),
dim_customer AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_key,
         c_custkey, c_name, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
         n_name AS nation, r_name AS region,
         DATE '1995-01-01' AS effective_date, DATE '9999-12-31' AS end_date, TRUE AS is_current
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey),
dim_date AS (
  SELECT CAST(year(full_date)*10000 + month(full_date)*100 + day(full_date) AS BIGINT) AS date_key,
         full_date,
         CAST(year(full_date) AS BIGINT) AS year,
         CAST(quarter(full_date) AS BIGINT) AS quarter,
         CAST(month(full_date) AS BIGINT) AS month,
         monthname(full_date) AS month_name,
         CAST(day(full_date) AS BIGINT) AS day,
         dayname(full_date) AS day_name,
         CAST(week(full_date) AS BIGINT) AS week,
         dayname(full_date) IN ('Saturday','Sunday') AS is_weekend
  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS full_date FROM orders)),
dim_payment AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY payment_method) AS BIGINT) AS payment_method_key,
         payment_method, 'Digital' AS payment_type
  FROM (SELECT DISTINCT o_orderpriority AS payment_method FROM orders)),
fact AS (
  SELECT l.l_orderkey*32 + ROW_NUMBER() OVER (PARTITION BY l.l_orderkey
           ORDER BY l.l_linenumber, l.l_partkey, l.l_suppkey, l.l_quantity,
                    l.l_extendedprice, l.l_discount, l.l_shipdate) AS sales_key,
         l.l_orderkey, l.l_linenumber,
         c.customer_key, o.o_custkey,
         p.product_key, l.l_partkey,
         pm.payment_method_key, o.o_orderpriority AS payment_method,
         CAST(year(CAST(o.o_orderdate AS DATE))*10000 + month(CAST(o.o_orderdate AS DATE))*100 + day(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS date_key,
         CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(l.l_quantity AS BIGINT) AS quantity,
         l.l_extendedprice / l.l_quantity AS unit_price,
         l.l_discount AS discount_rate,
         CAST(l.l_extendedprice AS DECIMAL(18,6)) AS gross_amount,
         CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,6)) AS line_total,
         CAST(l.l_extendedprice * l.l_discount AS DECIMAL(18,6)) AS discount_amount,
         CAST(l.l_extendedprice * (1.0 - l.l_discount) - l.l_quantity * CAST(p.cost AS DOUBLE) AS DECIMAL(18,6)) AS profit
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN dim_part p ON l.l_partkey = p.p_partkey
  JOIN dim_customer c ON o.o_custkey = c.c_custkey
  JOIN dim_payment pm ON o.o_orderpriority = pm.payment_method)
"""

  def q(body: String): String = prelude + body
}
