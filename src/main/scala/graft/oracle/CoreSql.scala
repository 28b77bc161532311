package graft.oracle

/** DuckDB oracle SQL for the core (reference-parity) queries.
  *
  * Every query here recomputes the full pipeline from the raw parquet
  * tables so the driver's DuckDB run is independent of our engine. The
  * SQL mirrors the Spark plans expression-for-expression, with the same
  * determinism discipline (decimal(18,4) sums for money, total
  * orderings, integer ratios) so results hash-match bit-for-bit.
  *
  * Dialect notes vs Spark:
  *  - DuckDB has no `initcap` → word-wise list_transform over a space
  *    split (capitalize EVERY word, like Spark initcap / pandas
  *    .str.title() — a first-letter-only substr would silently diverge
  *    on multi-word names such as TPC-H 'UNITED KINGDOM').
  *  - pandas/Spark `weekday` (Mon=0) → `isodow - 1`.
  *  - DuckDB `year`/`hour`/`len`/`row_number` return BIGINT → cast to
  *    INTEGER where Spark produces ints; `sum(BIGINT)` returns HUGEINT
  *    → cast to BIGINT.
  *  - All aliases are double-quoted to preserve CamelCase exactly.
  */
object CoreSql {

  /** Reference-shaped transactions + clean filters (mirrors
    * graft.etl.Transactions). */
  val txnCte: String = """
WITH txn AS (
  SELECT
    CASE WHEN o.o_orderstatus = 'F' THEN 'C' || CAST(o.o_orderkey AS VARCHAR)
         ELSE CAST(o.o_orderkey AS VARCHAR) END AS "InvoiceNo",
    CAST(l.l_partkey AS VARCHAR) AS "StockCode",
    upper(trim(p.p_name)) AS "Description",
    CAST(l.l_quantity AS BIGINT) AS "Quantity",
    o.o_orderdate AS "InvoiceDate",
    l.l_extendedprice / l.l_quantity AS "UnitPrice",
    CAST(o.o_custkey AS INTEGER) AS "CustomerID",
    array_to_string(list_transform(string_split(lower(trim(n.n_name)), ' '),
                                   w -> upper(w[1]) || w[2:]), ' ') AS "Country",
    l.l_extendedprice * (1 - l.l_discount) AS "TotalAmount",
    (o.o_orderstatus = 'F') AS "IsCancelled",
    CAST(year(o.o_orderdate) AS INTEGER) AS "Year",
    CAST(month(o.o_orderdate) AS INTEGER) AS "Month",
    CAST(isodow(o.o_orderdate) - 1 AS INTEGER) AS "DayOfWeek",
    CAST(hour(o.o_orderdate) AS INTEGER) AS "Hour",
    CAST(o.o_orderdate AS DATE) AS "Date",
    l.l_linenumber AS "LineNumber"
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE o.o_custkey IS NOT NULL AND p.p_name IS NOT NULL
    AND (o.o_orderstatus = 'F'
         OR (l.l_quantity > 0 AND l.l_extendedprice / l.l_quantity > 0))
),
sales AS (SELECT * FROM txn WHERE NOT "IsCancelled")
"""

  val transactions: String = txnCte + """
SELECT "InvoiceNo", "StockCode", "Description", "Quantity",
       CAST("InvoiceDate" AS DATE) AS "InvoiceDate", "UnitPrice",
       "CustomerID", "Country", "IsCancelled", "TotalAmount",
       "Year", "Month", "DayOfWeek", "Hour", "Date", "LineNumber"
FROM txn ORDER BY "InvoiceNo", "LineNumber", "StockCode", "Quantity",
         "TotalAmount", "UnitPrice"
"""

  val custCte: String = txnCte + """,
cust AS (
  SELECT "CustomerID",
         count(DISTINCT "InvoiceNo") AS "TotalOrders",
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS "RevDec",
         CAST(sum("Quantity") AS BIGINT) AS "TotalItems",
         min("InvoiceDate") AS "FirstTs",
         max("InvoiceDate") AS "LastTs",
         min_by("Country", "InvoiceDate") AS "Country"
  FROM sales GROUP BY "CustomerID"
),
cust2 AS (
  SELECT *,
    CAST("RevDec" AS DOUBLE) AS "TotalRevenue",
    CAST("RevDec" AS DOUBLE) / "TotalOrders" AS "AvgOrderValue",
    CAST(floor((epoch("LastTs") - epoch("FirstTs")) / 86400) AS BIGINT) AS "LifespanDays",
    ntile(4) OVER (ORDER BY "RevDec", "CustomerID") AS "SegTile"
  FROM cust
)
"""

  val customerSummary: String = custCte + """
SELECT "CustomerID", "TotalOrders", "TotalRevenue", "TotalItems",
       CAST("FirstTs" AS DATE) AS "FirstPurchase",
       CAST("LastTs" AS DATE) AS "LastPurchase",
       "Country", "AvgOrderValue", "LifespanDays",
       CASE "SegTile" WHEN 1 THEN 'Bronze' WHEN 2 THEN 'Silver'
                      WHEN 3 THEN 'Gold' ELSE 'Platinum' END AS "Segment"
FROM cust2 ORDER BY "CustomerID"
"""

  /** Approx-segmentation gate mirror: the oracle recomputes the EXACT
    * columns (segment names, customer count) and states the sketch
    * error-bound booleans as literal TRUE — if the Spark-side
    * percentile_approx boundaries drift out of their rank-error bound
    * (or a segment count leaves its ±(2εn + maxTie) band) the boolean
    * flips and the row hash-mismatches (see
    * Summaries.customerSegmentsApproxGate). */
  val customerSegmentsApprox: String = custCte + """,
n AS (SELECT count(*) AS nc FROM cust),
segs AS (SELECT unnest(['Bronze', 'Gold', 'Platinum', 'Silver']) AS "Segment")
SELECT "Segment", CAST(nc AS BIGINT) AS "TotalCustomers",
       TRUE AS "SegCountOk", TRUE AS "BoundaryRankOk",
       TRUE AS "BoundariesMonotone"
FROM segs, n ORDER BY "Segment"
"""

  /** Exact-boundary segmentation mirror: DuckDB `quantile_disc` ≡
    * ANSI `percentile_disc` (both the value at rank ⌈q·n⌉ on the
    * sorted multiset — verified positionally identical, ties
    * included); the CASE chain transcribes the Spark labeling. */
  val customerSegmentsBounds: String = custCte + """,
b AS (
  SELECT quantile_disc(CAST("RevDec" AS DOUBLE), [0.25, 0.5, 0.75]) AS bs FROM cust
)
SELECT "CustomerID", CAST("RevDec" AS DOUBLE) AS "TotalRevenue",
       CASE WHEN CAST("RevDec" AS DOUBLE) <= bs[1] THEN 'Bronze'
            WHEN CAST("RevDec" AS DOUBLE) <= bs[2] THEN 'Silver'
            WHEN CAST("RevDec" AS DOUBLE) <= bs[3] THEN 'Gold'
            ELSE 'Platinum' END AS "Segment"
FROM cust, b ORDER BY "CustomerID"
"""

  val prodCte: String = txnCte + """,
prod AS (
  SELECT "StockCode", "Description",
         CAST(sum("Quantity") AS BIGINT) AS "TotalQuantity",
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS "RevDec",
         count(DISTINCT "InvoiceNo") AS "TotalOrders",
         count(DISTINCT "CustomerID") AS "TotalCustomers"
  FROM sales GROUP BY "StockCode", "Description"
)
"""

  val productSummary: String = prodCte + """
SELECT "StockCode", "Description", "TotalQuantity",
       CAST("RevDec" AS DOUBLE) AS "TotalRevenue",
       "TotalOrders", "TotalCustomers",
       CAST("RevDec" AS DOUBLE) / "TotalQuantity" AS "AvgPrice"
FROM prod ORDER BY "RevDec" DESC, "StockCode"
"""

  val dailyCte: String = txnCte + """,
daily AS (
  SELECT "Date",
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS "RevDec",
         count(DISTINCT "InvoiceNo") AS "Orders",
         count(DISTINCT "CustomerID") AS "Customers",
         CAST(sum("Quantity") AS BIGINT) AS "Items"
  FROM sales GROUP BY "Date"
)
"""

  val dailySales: String = dailyCte + """
SELECT "Date", CAST("RevDec" AS DOUBLE) AS "Revenue",
       "Orders", "Customers", "Items",
       CASE WHEN count(*) OVER w7 = 7
            THEN CAST(sum("RevDec") OVER w7 AS DOUBLE) / 7.0 END AS "MA7",
       CASE WHEN count(*) OVER w30 = 30
            THEN CAST(sum("RevDec") OVER w30 AS DOUBLE) / 30.0 END AS "MA30"
FROM daily
WINDOW w7 AS (ORDER BY "Date" ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       w30 AS (ORDER BY "Date" ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
ORDER BY "Date"
"""

  /** EWMA mirror: identical exact binary weights 2⁻ᵏ (interpolated
    * from Summaries.EwmaLags), identical left-assoc addition order,
    * identical present-weight normalization — every step an
    * exactly-rounded IEEE op, so the whole column hash-matches. */
  val timeseriesEwma: String = {
    val lags = graft.etl.Summaries.EwmaLags
    def wk(k: Int): Double = 1.0 / (1L << k)
    val decay = (1 until lags)
      .map(k => s"""+ coalesce(lag(rev, $k) OVER w, CAST(0.0 AS DOUBLE)) * CAST(${wk(k)} AS DOUBLE)""")
      .mkString("\n         ")
    val weight = (1 until lags)
      .map(k => s"""+ CASE WHEN row_number() OVER w > $k THEN CAST(${wk(k)} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END""")
      .mkString("\n         ")
    dailyCte + s""",
d2 AS (SELECT "Date", CAST("RevDec" AS DOUBLE) AS rev FROM daily)
SELECT "Date", rev AS "Revenue",
       (rev
         $decay)
       / (CAST(1.0 AS DOUBLE)
         $weight) AS "Ewma"
FROM d2
WINDOW w AS (ORDER BY "Date")
ORDER BY "Date"
"""
  }

  val countrySummary: String = txnCte + """,
ctry AS (
  SELECT "Country",
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS "RevDec",
         count(DISTINCT "InvoiceNo") AS "TotalOrders",
         count(DISTINCT "CustomerID") AS "TotalCustomers",
         CAST(sum("Quantity") AS BIGINT) AS "TotalItems"
  FROM sales GROUP BY "Country"
)
SELECT "Country", CAST("RevDec" AS DOUBLE) AS "TotalRevenue",
       "TotalOrders", "TotalCustomers", "TotalItems",
       CAST("RevDec" AS DOUBLE) / "TotalOrders" AS "AvgOrderValue",
       CAST("RevDec" AS DOUBLE) * 100.0 / CAST(sum("RevDec") OVER () AS DOUBLE) AS "RevenueShare"
FROM ctry ORDER BY "RevDec" DESC, "Country"
"""

  val topCustomers: String = custCte + """
SELECT "CustomerID", "Country", "TotalOrders", "TotalRevenue"
FROM cust2 ORDER BY "RevDec" DESC, "CustomerID" LIMIT 10
"""

  val topProducts: String = prodCte + """
SELECT "StockCode", "Description", "TotalQuantity",
       CAST("RevDec" AS DOUBLE) AS "TotalRevenue"
FROM prod ORDER BY "RevDec" DESC, "StockCode" LIMIT 10
"""

  val dailyTrendRecent: String = dailyCte + """
SELECT "Date", CAST("RevDec" AS DOUBLE) AS "Revenue",
       "Orders", "Customers", "Items"
FROM daily
WHERE date_diff('day', "Date", (SELECT max("Date") FROM daily)) < 30
ORDER BY "Date"
"""

  val runningTotal: String = dailyCte + """
SELECT "Date", CAST("RevDec" AS DOUBLE) AS "Revenue",
       CAST(sum("RevDec") OVER (ORDER BY "Date"
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS "CumRevenue"
FROM daily ORDER BY "Date"
"""

  val lagGrowth: String = dailyCte + """,
lagd AS (
  SELECT "Date", CAST("RevDec" AS DOUBLE) AS "Revenue",
         CAST(lag("RevDec", 1) OVER (ORDER BY "Date") AS DOUBLE) AS "PrevRevenue"
  FROM daily
)
SELECT "Date", "Revenue", "PrevRevenue",
       "Revenue" - "PrevRevenue" AS "Growth"
FROM lagd ORDER BY "Date"
"""

  val topnPerCountry: String = txnCte + """,
cp AS (
  SELECT "Country", "StockCode",
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS "RevDec"
  FROM sales GROUP BY "Country", "StockCode"
),
ranked AS (
  SELECT "Country", "StockCode", "RevDec",
         CAST(row_number() OVER (PARTITION BY "Country"
              ORDER BY "RevDec" DESC, "StockCode") AS INTEGER) AS "Rank"
  FROM cp
)
SELECT "Country", "StockCode", CAST("RevDec" AS DOUBLE) AS "TotalRevenue", "Rank"
FROM ranked WHERE "Rank" <= 3 ORDER BY "Country", "Rank"
"""

  val regionRollup: String = """
SELECT r.r_name AS "Region",
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS "TotalRevenue",
       count(DISTINCT o.o_orderkey) AS "TotalOrders",
       count(DISTINCT c.c_custkey) AS "TotalCustomers"
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus <> 'F'
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name ORDER BY "Region"
"""

  val mktsegmentRollup: String = """
SELECT c.c_mktsegment AS "Segment",
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS "TotalRevenue",
       count(DISTINCT o.o_orderkey) AS "TotalOrders",
       count(DISTINCT c.c_custkey) AS "TotalCustomers",
       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS "TotalItems"
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus <> 'F'
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY "Segment"
"""

  val cancelledCustomers: String = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
ORDER BY c.c_custkey
"""

  /** RFM mirror: identical recency anchor (corpus max date), identical
    * ntile total orders (value direction, then CustomerID), identical
    * (R, F) segment CASE. */
  val customerRfm: String = txnCte + """,
per AS (
  SELECT "CustomerID",
         max("Date") AS last_date,
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS mdec,
         count(DISTINCT "InvoiceNo") AS freq
  FROM sales GROUP BY "CustomerID"
),
anch AS (SELECT max("Date") AS anchor FROM sales),
sc AS (
  SELECT "CustomerID",
         CAST(date_diff('day', last_date, anchor) AS INTEGER) AS rdays,
         freq, mdec,
         CAST(ntile(5) OVER (ORDER BY date_diff('day', last_date, anchor) DESC, "CustomerID") AS INTEGER) AS rs,
         CAST(ntile(5) OVER (ORDER BY freq ASC, "CustomerID") AS INTEGER) AS fs,
         CAST(ntile(5) OVER (ORDER BY mdec ASC, "CustomerID") AS INTEGER) AS ms
  FROM per CROSS JOIN anch
)
SELECT "CustomerID", rdays AS "RecencyDays", freq AS "Frequency",
       CAST(mdec AS DOUBLE) AS "Monetary",
       rs AS "RScore", fs AS "FScore", ms AS "MScore",
       CASE WHEN rs >= 4 AND fs >= 4 THEN 'champion'
            WHEN rs >= 4 THEN 'recent'
            WHEN fs >= 4 THEN 'at_risk'
            ELSE 'regular' END AS "Segment"
FROM sc ORDER BY "CustomerID"
"""

  /** Cohort-retention mirror: identical month truncation, month-diff
    * grid, and size-at-month-0 partition window. */
  val cohortRetention: String = txnCte + """,
coh AS (
  SELECT "CustomerID", date_trunc('month', min("Date")) AS cm
  FROM sales GROUP BY "CustomerID"
),
act AS (
  SELECT DISTINCT "CustomerID", date_trunc('month', "Date") AS am FROM sales
),
grid AS (
  SELECT cm, CAST(date_diff('month', cm, am) AS INTEGER) AS msince,
         count(*) AS n_active
  FROM act JOIN coh USING ("CustomerID")
  GROUP BY cm, msince
)
SELECT cm AS "CohortMonth", msince AS "MonthsSince", n_active AS "NActive",
       max(CASE WHEN msince = 0 THEN n_active END) OVER (PARTITION BY cm) AS "CohortSize",
       CAST(n_active AS DOUBLE) /
         max(CASE WHEN msince = 0 THEN n_active END) OVER (PARTITION BY cm) AS "RetentionRate"
FROM grid ORDER BY "CohortMonth", "MonthsSince"
"""

  /** SCD2 mirror: the SAME two planted change batches (batch 1:
    * custkey ≡ 3 mod 7 → SEG<k mod 5> at ChangeDate; batch 2:
    * custkey ≡ 2 mod 6 → SEG<k mod 4>B at ChangeDate2) applied as a
    * closed-form two-step derivation. Every batch-2 segment carries a
    * 'B' suffix no original mktsegment or batch-1 value has, so every
    * batch-2 change row is a REAL change: v1 rows close at whichever
    * batch first touches the key; batch-1 rows (Version 2) close iff
    * batch 2 touches the key; batch-2 rows open Version 3 where
    * batch 1 already versioned the key, else Version 2. Dates
    * interpolated from Scd so the two sides cannot drift. */
  val dimScd2Customers: String = {
    import graft.etl.Scd.{ChangeDate, ChangeDate2, DimBirth}
    s"""
WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
ch1 AS (SELECT k, 'SEG' || CAST(k % 5 AS VARCHAR) AS n1
        FROM dim WHERE k % 7 = 3),
ch2 AS (SELECT k, 'SEG' || CAST(k % 4 AS VARCHAR) || 'B' AS n2
        FROM dim WHERE k % 6 = 2)
SELECT d.k AS "CustKey", d.seg AS "Segment", CAST(1 AS INTEGER) AS "Version",
       DATE '$DimBirth' AS "ValidFrom",
       CASE WHEN c1.k IS NOT NULL THEN DATE '$ChangeDate'
            WHEN c2.k IS NOT NULL THEN DATE '$ChangeDate2' END AS "ValidTo",
       (c1.k IS NULL AND c2.k IS NULL) AS "IsCurrent"
FROM dim d LEFT JOIN ch1 c1 ON d.k = c1.k LEFT JOIN ch2 c2 ON d.k = c2.k
UNION ALL
SELECT c1.k, c1.n1, CAST(2 AS INTEGER), DATE '$ChangeDate',
       CASE WHEN c2.k IS NOT NULL THEN DATE '$ChangeDate2' END,
       (c2.k IS NULL)
FROM ch1 c1 LEFT JOIN ch2 c2 ON c1.k = c2.k
UNION ALL
SELECT c2.k, c2.n2,
       CAST(CASE WHEN c1.k IS NOT NULL THEN 3 ELSE 2 END AS INTEGER),
       DATE '$ChangeDate2', CAST(NULL AS DATE), true
FROM ch2 c2 LEFT JOIN ch1 c1 ON c2.k = c1.k
ORDER BY "CustKey", "Version"
"""
  }

  val unsoldParts: String = """
SELECT p.p_partkey, p.p_name, p.p_brand
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
ORDER BY p.p_partkey
"""

  /** Theil–Sen mirror: identical trailing window, identical exact
    * decimal daily frame, pair slopes as one double division each,
    * quantile_cont ≡ Spark percentile (hash-verified parity). */
  val theilSenTrend: String = {
    import graft.etl.Summaries.{TheilSenWindowDays, TheilSenEpoch}
    txnCte + s""",
cd AS (
  SELECT "Country", "Date",
         sum(CAST("TotalAmount" AS DECIMAL(18,4))) AS rev
  FROM sales GROUP BY "Country", "Date"
),
mx AS (SELECT max("Date") AS md FROM cd),
winf AS (
  SELECT "Country",
         CAST(date_diff('day', DATE '$TheilSenEpoch', "Date") AS INTEGER) AS d,
         rev
  FROM cd CROSS JOIN mx
  WHERE CAST(date_diff('day', "Date", md) AS INTEGER) < $TheilSenWindowDays
),
pr AS (
  SELECT a."Country", count(*) AS np,
         quantile_cont(CAST(b.rev - a.rev AS DOUBLE) / (b.d - a.d), 0.5) AS slope
  FROM winf a JOIN winf b ON a."Country" = b."Country" AND a.d < b.d
  GROUP BY a."Country"
),
itc AS (
  SELECT w."Country", count(*) AS nd,
         quantile_cont(CAST(w.rev AS DOUBLE) - p.slope * w.d, 0.5) AS ic
  FROM winf w JOIN pr p ON p."Country" = w."Country"
  GROUP BY w."Country"
)
SELECT p."Country", CAST(i.nd AS BIGINT) AS "NDays",
       CAST(p.np AS BIGINT) AS "NPairs",
       p.slope AS "Slope", i.ic AS "Intercept"
FROM pr p JOIN itc i ON i."Country" = p."Country"
ORDER BY p."Country"
"""
  }

  /** CUSUM change-point mirror: identical scale-4 integer units (the
    * ·10⁴ cast is exact on both sides because decSum's DECIMAL(18,4)
    * makes it integer-valued — no fractional cast, where Spark
    * truncates and DuckDB rounds), identical cross-multiplied
    * Dev = |N·S_t − t·Total| in BIGINT, identical earliest-day
    * tie-break (min(t) among max-Dev rows — the engine's
    * max(struct(Dev, −t))), and the same three single divisions of
    * exact integers at the end. */
  val cusumChangepoint: String = txnCte + s""",
cd AS (
  SELECT "Country", "Date",
         CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) * 10000 AS BIGINT) AS q
  FROM sales GROUP BY "Country", "Date"
),
x AS (
  SELECT "Country", "Date", q,
         row_number() OVER w AS t,
         sum(q) OVER (PARTITION BY "Country" ORDER BY "Date"
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         count(*) OVER (PARTITION BY "Country") AS n,
         sum(q) OVER (PARTITION BY "Country") AS total
  FROM cd WINDOW w AS (PARTITION BY "Country" ORDER BY "Date")
),
p AS (
  SELECT "Country", "Date", t, s, n, total,
         abs(n * s - t * total) AS dev
  FROM x WHERE t < n
),
mx AS (SELECT "Country", max(dev) AS md FROM p GROUP BY "Country"),
bt AS (SELECT p."Country", min(p.t) AS bt
       FROM p JOIN mx ON p."Country" = mx."Country" AND p.dev = mx.md
       GROUP BY p."Country")
SELECT p."Country", CAST(p.n AS BIGINT) AS "NDays", p."Date" AS "ChangeDate",
       CAST(p.dev AS DOUBLE) / (p.n * 10000.0) AS "PeakDev",
       CAST(p.s AS DOUBLE) / (p.t * 10000.0) AS "MeanBefore",
       CAST(p.total - p.s AS DOUBLE) / ((p.n - p.t) * 10000.0) AS "MeanAfter"
FROM p JOIN bt ON p."Country" = bt."Country" AND p.t = bt.bt
ORDER BY p."Country"
"""

  /** Seasonal-decomposition mirror: identical scale-4 integer units,
    * identical centered 7-observation ROWS window with the c7 = 7
    * min_periods guard, identical ×7-scaled integer detrend
    * (7q − Σ7), per-weekday seasonal as ONE division of exact
    * integers, residual as the same two-double IEEE subtraction.
    * Weekday = isodow − 1 (the ⚠W Mon=0 mapping). */
  val seasonalDecompose: String = txnCte + s""",
cd AS (
  SELECT "Date",
         CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) * 10000 AS BIGINT) AS q
  FROM sales GROUP BY "Date"
),
t AS (
  SELECT "Date", q,
         count(*) OVER w7 AS c7,
         sum(q) OVER w7 AS s7,
         CAST(isodow("Date") - 1 AS INTEGER) AS wd
  FROM cd WINDOW w7 AS (ORDER BY "Date" ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
x AS (
  SELECT "Date", q, wd,
         CASE WHEN c7 = 7 THEN s7 END AS ts,
         CASE WHEN c7 = 7 THEN 7 * q - s7 END AS det
  FROM t
),
se AS (
  SELECT wd, CAST(sum(det) AS DOUBLE) / (count(det) * 70000.0) AS seas
  FROM x WHERE det IS NOT NULL GROUP BY wd
)
SELECT x."Date", x.wd AS "Weekday",
       CAST(x.q AS DOUBLE) / 10000.0 AS "Revenue",
       CAST(x.ts AS DOUBLE) / 70000.0 AS "Trend",
       se.seas AS "Seasonal",
       CASE WHEN x.det IS NOT NULL
            THEN CAST(x.det AS DOUBLE) / 70000.0 - se.seas END AS "Residual"
FROM x LEFT JOIN se ON x.wd = se.wd
ORDER BY x."Date"
"""

  /** IQR-outlier mirror: quantile_cont ≡ percentile (proven parity),
    * identical IEEE fence arithmetic, identical comparisons. */
  val cleanOutliersIqr: String = txnCte + s""",
f AS (
  SELECT "Country", count(*) AS nr,
         quantile_cont("TotalAmount", 0.25) AS q1,
         quantile_cont("TotalAmount", 0.75) AS q3
  FROM sales GROUP BY "Country"
),
fe AS (
  SELECT *, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM f
)
SELECT fe."Country", CAST(fe.nr AS BIGINT) AS "NRows",
       fe.q1 AS "Q1", fe.q3 AS "Q3", fe.lo AS "IqrLo", fe.hi AS "IqrHi",
       CAST(sum(CASE WHEN s."TotalAmount" < fe.lo THEN 1 ELSE 0 END) AS BIGINT) AS "NBelow",
       CAST(sum(CASE WHEN s."TotalAmount" > fe.hi THEN 1 ELSE 0 END) AS BIGINT) AS "NAbove",
       CAST(sum(CASE WHEN s."TotalAmount" < fe.lo OR s."TotalAmount" > fe.hi
                     THEN 1 ELSE 0 END) AS DOUBLE) / fe.nr AS "OutlierRate"
FROM sales s JOIN fe ON s."Country" = fe."Country"
GROUP BY fe."Country", fe.nr, fe.q1, fe.q3, fe.lo, fe.hi
ORDER BY fe."Country"
"""

  /** ACF mirror: identical scale-4 units, the same mean-eliminated
    * y = n·q − S in HUGEINT (≡ the engine's DECIMAL(38,0) — both
    * exact at these magnitudes), identical lag pairing over the date
    * order, per-lag Acf as the same two casts + one division. */
  val timeseriesAutocorr: String = {
    val maxLag = graft.etl.Summaries.AcfMaxLag
    val lagCols = (1 to maxLag)
      .map(k => s"""lag(y, $k) OVER (ORDER BY "Date") AS y$k""").mkString(", ")
    val sumCols = (1 to maxLag)
      .map(k => s"sum(y * y$k) AS num$k, count(y$k) AS cnt$k").mkString(", ")
    val rows = (1 to maxLag).map { k =>
      s"""SELECT CAST($k AS INTEGER) AS "Lag", CAST(cnt$k AS BIGINT) AS "NPairs",
       CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE) AS "Acf" FROM sm"""
    }.mkString("\nUNION ALL\n")
    txnCte + s""",
cd AS (
  SELECT "Date",
         CAST(sum(CAST("TotalAmount" AS DECIMAL(18,4))) * 10000 AS BIGINT) AS q
  FROM sales GROUP BY "Date"
),
st AS (SELECT count(*) AS n, sum(q) AS s FROM cd),
yv AS (SELECT "Date", CAST(st.n AS HUGEINT) * q - CAST(st.s AS HUGEINT) AS y
       FROM cd CROSS JOIN st),
l AS (SELECT "Date", y, $lagCols FROM yv),
sm AS (SELECT sum(y * y) AS den, $sumCols FROM l)
$rows
ORDER BY "Lag"
"""
  }
}
