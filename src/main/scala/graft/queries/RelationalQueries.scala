package graft.queries

import graft.Ckpt._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Generic relational operator layer.
  *
  * Each query demonstrates one operator family from SURVEY.md §2 (predicates
  * P1-P8, joins J1-J8, aggregates A1-A10, scalar functions F*, window analogs)
  * re-expressed as an idiomatic Spark DataFrame plan over the driver-generated
  * testdata tables, with an ANSI-SQL oracle for the DuckDB correctness gate.
  *
  * Scale notes (100 TB discipline applied throughout):
  *  - every aggregate is a partial-aggregable built-in (map-side combine free);
  *  - `region`/`nation` joins are explicitly `broadcast()`; other dimension
  *    joins are left to AQE size-based selection;
  *  - money sums go through DECIMAL(18,8): exact, order-independent addition
  *    (a plain double sum is non-deterministic across partition orders and
  *    would flake the oracle hash at high SF), cast back to double at the end;
  *  - every query ends in a deterministic ORDER BY so output is reproducible.
  */
object RelationalQueries {

  /** Exact decimal sum of a (possibly computed) double column, as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,8)")).cast("double")
  private val DSUM = "CAST(SUM(CAST(%s AS DECIMAL(18,8))) AS DOUBLE)"

  // ---------------------------------------------------------------- headline

  /** TPC-H Q1 shape: P5 date filter + A5 grouped aggregation (covSonar
    * `essence` scan + group-by analog). Pure map-side-combinable aggregates;
    * the only shuffle is the tiny post-aggregation exchange on (flag,status).
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${DSUM.format("l_quantity")} AS sum_qty,
       |  ${DSUM.format("l_extendedprice")} AS sum_base_price,
       |  ${DSUM.format("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${DSUM.format("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${DSUM.format("l_quantity")} / COUNT(*) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: selective dimension filter + 3-way join + top-k.
    * customer(filtered) is small → AQE broadcasts it; the orders⨝lineitem
    * join shuffles on orderkey (both sides partition-prunable on the date
    * predicates before the shuffle). Deterministic tie-break on orderkey.
    */
  def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15"))
    val li   = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, o_orderdate,
       |  ${DSUM.format("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < '1998-03-15' AND l_shipdate > '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: snowflake join with explicitly broadcast tiny dims
    * (region, nation). The co-located customer/supplier nation equality is a
    * post-join filter, exactly as Q5 specifies.
    */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    // Region restriction applied to the 25-row nation dim FIRST, then
    // broadcast onto customer: Catalyst cannot derive "c_nationkey ∈ ASIA"
    // on its own (the restriction only reaches customers transitively via
    // c_nationkey = s_nationkey = n_nationkey plus a join to region), so
    // without this manual reorder the plan joins the FULL customer × orders
    // × lineitem stream and discards ~4/5 of it at the supplier join. At
    // 100 TB that ordering difference is 5× the shuffled bytes of the two
    // fact joins; pruning at the dimension costs one broadcast of ≤5 rows.
    val asianNations = broadcast(
      t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    t(s, dir, "customer")
      .join(asianNations, col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1999-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name, ${DSUM.format("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON o_orderkey = l_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA' AND o_orderdate >= '1996-01-01' AND o_orderdate < '1999-01-01'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ------------------------------------------------------------- predicates

  /** P1: IN-list include (covSonar `--lineage L1 L2` style). */
  def p1Isin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val p1Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_mktsegment IN ('BUILDING','MACHINERY') ORDER BY c_custkey""".stripMargin

  /** P1 negated: `^`-prefixed exclusion list (NOT IN). Safe from
    * three-valued-logic surprises because the column is never NULL —
    * mirroring covSonar's ''-default columns (SURVEY §7.4.5).
    */
  def p1NotIn(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(!col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  val p1NotSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_mktsegment NOT IN ('BUILDING','MACHINERY','AUTOMOBILE') ORDER BY c_custkey""".stripMargin

  /** P2 + P3: equality plus numeric (ct-style) range, conjunctive. */
  def p2p3EqRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_acctbal") >= 100.0 && col("c_acctbal") <= 5000.0)
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_7")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  val p2p3Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal >= 100.0 AND c_acctbal <= 5000.0 AND n_name = 'NATION_7' ORDER BY c_custkey""".stripMargin

  /** P4: zip-prefix semantics — OR-joined include prefixes, AND-joined
    * negated exclude prefix (covSonar `--zip 0177 ^0178`).
    */
  def p4Prefix(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter((col("p_name").startsWith("large") || col("p_name").startsWith("small"))
        && !col("p_name").startsWith("large w"))
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")

  val p4Sql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE (p_name LIKE 'large%' OR p_name LIKE 'small%') AND p_name NOT LIKE 'large w%'
      |ORDER BY p_partkey""".stripMargin

  /** P5: date ranges — multiple OR-joined BETWEEN ranges (covSonar `--date
    * a:b c:d`), grouped count per status.
    */
  def p5DateRanges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderdate").between(lit("1996-01-01"), lit("1996-06-30"))
        || col("o_orderdate").between(lit("1998-01-01"), lit("1998-06-30")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  val p5Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
      |WHERE o_orderdate BETWEEN '1996-01-01' AND '1996-06-30'
      |   OR o_orderdate BETWEEN '1998-01-01' AND '1998-06-30'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** P6: profile membership over array<string> — covSonar's flagship
    * predicate. AND within an include group, OR across groups, AND-NOT for
    * excludes: (spark ∧ join) ∨ stream, minus slow. `array_contains` over a
    * split column keeps the whole predicate inside whole-stage codegen.
    */
  def p6TokenMembership(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents")
      .withColumn("toks", toks)
      .filter(((array_contains(col("toks"), "spark") && array_contains(col("toks"), "join"))
        || array_contains(col("toks"), "stream"))
        && !array_contains(col("toks"), "slow"))
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  val p6Sql: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE ((list_contains(string_split(text,' '),'spark') AND list_contains(string_split(text,' '),'join'))
      |    OR list_contains(string_split(text,' '),'stream'))
      |  AND NOT list_contains(string_split(text,' '),'slow')
      |ORDER BY doc_id""".stripMargin

  /** P7: frameshift-flag analog — emptiness/size test on a derived array. */
  def p7ArraySize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 60)
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang")

  val p7Sql: String =
    """SELECT lang, COUNT(*) AS cnt FROM documents
      |WHERE len(string_split(text,' ')) >= 60 GROUP BY lang ORDER BY lang""".stripMargin

  /** P8: count-mode projection (`match --count`): predicate + COUNT(*). */
  def p8CountMode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "HOUSEHOLD" && col("o_orderstatus") === "O")
      .agg(count(lit(1)).as("cnt"))

  val p8Sql: String =
    """SELECT COUNT(*) AS cnt FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'HOUSEHOLD' AND o_orderstatus = 'O'""".stripMargin

  // ------------------------------------------------------------------ joins

  /** J1: essence-view analog — left join fact ⟕ dim keeping unmatched rows. */
  def j1LeftJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_orderstatus"), col("c_name"), col("c_mktsegment"))
      .orderBy("o_orderkey")

  val j1Sql: String =
    """SELECT o_orderkey, o_orderstatus, c_name, c_mktsegment
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin

  /** J2: dna_view analog — two-hop left-join chain fact ⟕ bridge ⟕ dim. */
  def j2ChainJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"), "left")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left")
      .select(col("l_orderkey"), col("l_partkey"), col("o_orderstatus"), col("c_mktsegment"))
      .orderBy("l_orderkey", "l_partkey")

  val j2Sql: String =
    """SELECT l_orderkey, l_partkey, o_orderstatus, c_mktsegment
      |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      |  LEFT JOIN customer ON o_custkey = c_custkey
      |WHERE l_linenumber = 1 ORDER BY l_orderkey, l_partkey""".stripMargin

  /** J6/A9: restore-gather analog — per-group ordered collect_list folded to
    * a deterministic string (covSonar applies variants in position order).
    */
  def j6GatherSorted(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",",
        expr("transform(sort_array(collect_list(l_linenumber)), x -> cast(x as string))")).as("lines"),
        count(lit(1)).as("n"))
      .orderBy("l_orderkey")

  val j6Sql: String =
    """SELECT l_orderkey, string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** J7/R4: lineage-wildcard analog — DISTINCT + LIKE feeding a semi-join
    * (the reference collects the list to the driver; a left-semi join keeps
    * the same semantics without a driver round-trip — better at scale).
    */
  def j7WildcardSemi(s: SparkSession, dir: String): DataFrame = {
    val wanted = t(s, dir, "part").select("p_type").distinct()
      .filter(col("p_type").like("%ECO%"))
    t(s, dir, "part")
      .join(broadcast(wanted), Seq("p_type"), "left_semi")
      .select("p_partkey", "p_name", "p_type")
      .orderBy("p_partkey")
  }

  val j7Sql: String =
    """SELECT p_partkey, p_name, p_type FROM part
      |WHERE p_type IN (SELECT DISTINCT p_type FROM part WHERE p_type LIKE '%ECO%')
      |ORDER BY p_partkey""".stripMargin

  /** J8: bloom-filter-pruned semi-join — the explicit form of Spark's runtime
    * row-level filtering, which at 100 TB is the difference between shuffling
    * the full fact table and shuffling only the ~20% that can possibly match.
    * The build side (urgent-order keys) is aggregated once into a compact
    * bloom bitset via Catalyst's `BloomFilterAggregate` (a few hundred KB for
    * millions of keys), embedded as a binary literal, and probed by
    * `BloomFilterMightContain` — a codegen'd predicate that runs inside the
    * scan's WholeStageCodegen span, BEFORE the join shuffle. False positives
    * (~3%) are then removed by the exact semi-join, so the result is exact
    * and the DuckDB oracle is the plain `IN (subquery)` form. On a cluster
    * the two jobs pipeline naturally; the bloom build reads only the
    * (pushed-down, column-pruned) key column of the dimension.
    */
  def j8BloomSemi(s: SparkSession, dir: String): DataFrame = {
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // Size the sketch to the real key count (one tiny count job over the
    // pruned key column); floor keeps fpp sane on near-empty builds.
    val nKeys = math.max(urgent.count(), 1024L)
    val bloom = urgent
      .agg(call_function("graft_bloom_agg", col("o_orderkey"), lit(nKeys)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    t(s, dir, "lineitem")
      .filter(call_function("graft_bloom_contains", lit(bloom), col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  val j8Sql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_items, ${DSUM.format("l_extendedprice")} AS revenue
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** J9: as-of join — for each purchase, the most recent error by the same
    * user at or before it. Spark has no ASOF JOIN operator; the naive form
    * (inequality join + per-left-row max) explodes to |purchases|×|errors|
    * per user before pruning. The scalable pattern used here is union-tag +
    * one window: tag both streams, sort each user's merged timeline once,
    * and carry the last-seen right-side row forward with `last(ignoreNulls)`
    * — ONE shuffle on user_id, O(timeline) work, no pair blow-up, and it
    * degrades gracefully under skew (a hot user costs its timeline length,
    * not a quadratic pair count). Ordering is on (micros, event_id) on BOTH
    * engines so sub-microsecond raw-nano differences cannot reorder ties.
    */
  def j9AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "error", col("event_id")).as("err_id"),
        when(col("event_type") === "error", unix_micros(col("ts"))).as("err_us"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_error_id", last(col("err_id"), ignoreNulls = true).over(w))
      .withColumn("last_error_us", last(col("err_us"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("last_error_id"),
        (col("us") - col("last_error_us")).as("micros_since_error"))
      .orderBy("user_id", "event_id")
  }

  val j9Sql: String =
    """WITH u AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us,
      |    CASE WHEN event_type = 'error' THEN event_id END AS err_id,
      |    CASE WHEN event_type = 'error' THEN epoch_ns(ts)//1000 END AS err_us
      |  FROM events WHERE event_type IN ('purchase', 'error'))
      |SELECT user_id, event_id, last_error_id, us - last_error_us AS micros_since_error
      |FROM (
      |  SELECT user_id, event_id, event_type, us,
      |    LAST_VALUE(err_id IGNORE NULLS) OVER w AS last_error_id,
      |    LAST_VALUE(err_us IGNORE NULLS) OVER w AS last_error_us
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |WHERE event_type = 'purchase'
      |ORDER BY user_id, event_id""".stripMargin

  /** J10: range (band) join — every (purchase, error) pair of the same user
    * within ±1 hour. A raw inequality join is a per-user cross product that
    * Catalyst can only execute as nested-loop; the scalable form is bucket
    * discretization: both sides land in 1-hour buckets, the purchase side
    * explodes to its 3 admissible buckets (a ±band match always lies in the
    * home bucket or a neighbor), the join is a plain EQUI-join on
    * (user, bucket) — hash-partitionable, AQE-skew-splittable — and the
    * exact band predicate prunes the residue. Each error has one home
    * bucket, so no pair is produced twice and no dedup pass is needed.
    * Band/bucket width is the selectivity knob; ×100 data at the same width
    * only widens the join fan-in linearly with event density per user-hour.
    */
  def j10RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val band = 3600L * 1000000L // ±1 h, in micros; also the bucket width
    val ev = t(s, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"),
        unix_micros(col("ts")).as("err_us"))
      .withColumn("bucket", expr(s"err_us div ${band}L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pur_us"))
      .withColumn("b0", expr(s"pur_us div ${band}L"))
      .withColumn("bucket", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
    purchases.join(errors, Seq("user_id", "bucket"))
      .filter(abs(col("err_us") - col("pur_us")) <= band)
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        (col("err_us") - col("pur_us")).as("micros_offset"))
      .orderBy("user_id", "purchase_id", "error_id")
  }

  val j10Sql: String =
    """SELECT e1.user_id AS user_id, e1.event_id AS purchase_id, e2.event_id AS error_id,
      |  epoch_ns(e2.ts)//1000 - epoch_ns(e1.ts)//1000 AS micros_offset
      |FROM events e1 JOIN events e2 ON e1.user_id = e2.user_id
      |WHERE e1.event_type = 'purchase' AND e2.event_type = 'error'
      |  AND abs(epoch_ns(e2.ts)//1000 - epoch_ns(e1.ts)//1000) <= 3600000000
      |ORDER BY user_id, purchase_id, error_id""".stripMargin

  /** J11: interval-lookup join — classify each fact row by membership in a
    * small table of non-uniform [lo, hi) bands (rate cards, SLA tiers,
    * geo/IP ranges). The dim is constant-size, so the right physical shape
    * is a broadcast nested-loop join: the fact side streams through codegen
    * probing ≤ |bands| comparisons per row and NEVER shuffles — at 100 TB
    * the corpus-side scan dominates and the BNLJ adds a constant factor,
    * not an exchange. (A *growing* interval dim is a different operator:
    * discretize to buckets and equi-join, the j10 shape; the two compose —
    * bucket first, residual-check inside the bucket.) Aggregation after the
    * classify is ordinary partial-aggregable groupBy on ≤ |bands| keys.
    * Band bounds are exact literals compared identically by both engines.
    */
  def j11IntervalLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("b0_[0,1)", 0.0, 1.0), ("b1_[1,5)", 1.0, 5.0), ("b2_[5,10)", 5.0, 10.0),
      ("b3_[10,25)", 10.0, 25.0), ("b4_[25,50)", 25.0, 50.0),
      ("b5_[50,100)", 50.0, 100.0), ("b6_[100,250)", 100.0, 250.0),
      ("b7_[250,1000)", 250.0, 1000.0)).toDF("band", "lo", "hi")
    t(s, dir, "events")
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("band")
  }

  val j11Sql: String =
    s"""SELECT band, COUNT(*) AS n_events, ${DSUM.format("value")} AS sum_value
       |FROM events JOIN (VALUES
       |  ('b0_[0,1)', 0.0, 1.0), ('b1_[1,5)', 1.0, 5.0), ('b2_[5,10)', 5.0, 10.0),
       |  ('b3_[10,25)', 10.0, 25.0), ('b4_[25,50)', 25.0, 50.0),
       |  ('b5_[50,100)', 50.0, 100.0), ('b6_[100,250)', 100.0, 250.0),
       |  ('b7_[250,1000)', 250.0, 1000.0)) AS bands(band, lo, hi)
       |ON value >= lo AND value < hi
       |GROUP BY band ORDER BY band""".stripMargin

  // ------------------------------------------------------------- aggregates

  /** A4: COUNT(DISTINCT …) with an emptiness guard, as in covSonar info. */
  def a4CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))

  val a4Sql: String =
    """SELECT COUNT(DISTINCT c_mktsegment) AS n_segments, COUNT(DISTINCT c_nationkey) AS n_nations,
      |  COUNT(*) AS n_customers FROM customer""".stripMargin

  /** A5: grouped count over two metadata fields with deterministic order
    * (covSonar info's `GROUP BY source, collection ORDER BY source,
    * collection`, lib/sonardb.py:1567-1569). Pure partial-aggregable count;
    * the only shuffle is the tiny post-aggregation exchange.
    */
  def a5GroupOrder(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("source", "lang")

  val a5Sql: String =
    """SELECT source, lang, COUNT(*) AS cnt FROM documents
      |GROUP BY source, lang ORDER BY source, lang""".stripMargin

  /** A6: min/max over timestamps (imported/date bounds in covSonar info). */
  def a6MinMax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .agg(min(col("o_orderdate")).as("first_date"), max(col("o_orderdate")).as("last_date"),
        min(col("o_totalprice")).cast("double").as("min_price"),
        max(col("o_totalprice")).cast("double").as("max_price"))

  val a6Sql: String =
    """SELECT MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date,
      |  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price, CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
      |FROM orders""".stripMargin

  /** A7: metadata-coverage — one pass of conditional counts over many
    * columns (covSonar loops per field; one aggregate pass is the Spark way).
    */
  def a7Coverage(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        count(when(col("value") > 50.0, 1)).as("n_high_value"),
        countDistinct(col("user_id")).as("n_users"))

  val a7Sql: String =
    """SELECT COUNT(*) AS n_events,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
      |  COUNT(CASE WHEN value > 50.0 THEN 1 END) AS n_high_value,
      |  COUNT(DISTINCT user_id) AS n_users FROM events""".stripMargin

  /** A11: hierarchical rollup — (flag, status), (flag), and grand-total
    * levels in ONE pass. Spark expands the rollup into grouping sets whose
    * partial aggregates are map-side combinable exactly like a flat groupBy
    * (the expand operator multiplies rows by #levels BEFORE the shuffle,
    * but post-combine state is only #groups × #levels — tiny). Rolled-up
    * key columns are NULL by SQL convention; they are coalesced to a
    * sentinel so cross-engine NULL ordering/hashing never enters the
    * comparison, with `grouping_id` kept to disambiguate levels.
    */
  def a11Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("ret"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy("gid", "ret", "status")

  val a11Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS ret, COALESCE(l_linestatus, 'ALL') AS status,
       |  GROUPING(l_returnflag, l_linestatus) AS gid, COUNT(*) AS n,
       |  ${DSUM.format("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY gid, ret, status""".stripMargin

  /** A12: full cube over two dimensions — rollup's superset (adds the
    * per-priority-only slice a11's hierarchy lacks). Same single
    * Expand + one aggregation-pass shape: 4 grouping sets cost one 4×
    * map-side expansion feeding ONE partial-aggregated exchange, never one
    * job per slice. NULL group keys are coalesced to a sentinel so neither
    * engine's NULL-ordering default can flip the presentation sort.
    */
  def a12Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("sum_price"))
      .orderBy("gid", "status", "priority")

  val a12Sql: String =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
       |  GROUPING(o_orderstatus, o_orderpriority) AS gid, COUNT(*) AS n,
       |  ${DSUM.format("o_totalprice")} AS sum_price
       |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY gid, status, priority""".stripMargin

  /** A13: explicit GROUPING SETS — the general form a11/a12 are sugar for,
    * here with two *disjoint* single-column slices ((flag), (status)) that
    * neither ROLLUP (hierarchical) nor CUBE (power set, incl. finer levels)
    * would produce alone. Same execution shape as a11/a12: ONE Expand
    * multiplies each input row by the 2 sets it belongs to BEFORE the
    * exchange, partial aggregation combines map-side, so the shuffle carries
    * #groups × #sets rows — per-slice jobs would instead scan the fact table
    * once per slice. Sentinel-coalesced NULL keys + grouping_id keep the
    * cross-engine compare free of NULL-ordering differences.
    */
  def a13GroupingSets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("ret"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy("gid", "ret", "status")

  val a13Sql: String =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS ret, COALESCE(l_linestatus, 'ALL') AS status,
       |  GROUPING(l_returnflag, l_linestatus) AS gid, COUNT(*) AS n,
       |  ${DSUM.format("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY gid, ret, status""".stripMargin

  /** A9: exact interpolated quartiles per group. Oracle-safe despite being a
    * float computation: `l_quantity` is integer-valued and quartile fractions
    * are exact binary (k/4), so `lower + (upper-lower)*frac` is computed
    * without rounding in BOTH engines — every intermediate is exactly
    * representable, making the result bit-identical regardless of each
    * engine's interpolation formula. (Arbitrary percentiles of arbitrary
    * doubles would NOT hash-match; that case is a9s's sketch, rows-only.)
    * Exact percentile sorts each group — fine for bounded-cardinality value
    * domains like this one (Spark aggregates a value→count map, so state is
    * O(distinct values), map-side combinable, not O(rows)).
    */
  def a9Quartiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("q25"),
        percentile(col("l_quantity"), lit(0.50)).as("q50"),
        percentile(col("l_quantity"), lit(0.75)).as("q75"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  val a9Sql: String =
    """SELECT l_returnflag, quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.50) AS q50, quantile_cont(l_quantity, 0.75) AS q75,
      |  COUNT(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** A10: exact per-group heavy hitters — top-3 users by event count per
    * event type, fully deterministic (count desc, user_id asc tie-break).
    * Two-phase at scale: the count groupBy is partial-aggregable on
    * (type, user); the top-k cut then runs through [[graft.functions.TopKCountId]],
    * a bounded typed Aggregator whose map-side combine carries ≤ k pairs per
    * group into the second shuffle — unlike the equivalent
    * `row_number().over(...)` window, which must move EVERY (type, user)
    * count across the exchange and sort whole partitions to discard all but
    * three rows (the spec pins equivalence of the two forms). This is the
    * exact operator a count-min/SpaceSaving sketch would approximate once
    * the (type, user) domain itself no longer fits a shuffle.
    */
  def a10TopkHeavy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("user_id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.functions.TopKCountId(3).toColumn.name("topk"))
      .flatMap { case (et, flat) =>
        flat.grouped(2).zipWithIndex.map { case (pair, i) =>
          (et, pair(1), pair(0), i + 1)
        }
      }
      .toDF("event_type", "user_id", "n_events", "rank")
      .orderBy("event_type", "rank")
  }

  val a10Sql: String =
    """SELECT event_type, user_id, n_events, rank FROM (
      |  SELECT event_type, user_id, COUNT(*) AS n_events,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id) AS rank
      |  FROM events GROUP BY event_type, user_id)
      |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin

  // ---------------------------------------------------- windows / streaming

  /** W1: VCF genotype-numbering analog — row_number per partition by first
    * appearance (SURVEY §2.6). Keep first 3 orders per customer.
    */
  def w1RowNumber(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "rn")
      .orderBy("o_custkey", "rn")
  }

  val w1Sql: String =
    """SELECT o_custkey, o_orderkey, rn FROM (
      |  SELECT o_custkey, o_orderkey,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** W2: running per-user event total — deterministic frame order so the
    * sequential double addition is bit-identical across engines.
    */
  def w2RunningSum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // decimal accumulation: windowed double SUMs are accumulated sequentially
    // by Spark but segment-tree-combined by DuckDB, so raw doubles can differ
    // in the last ULP; DECIMAL(18,8) is addition-order-independent (same
    // trick as dsum for the grouped aggregates)
    t(s, dir, "events")
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,8)")).over(w).cast("double"))
      .select("user_id", "event_id", "running_value")
      .orderBy("user_id", "event_id")
  }

  val w2Sql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,8))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Streaming analog: tumbling 1-hour event-time window aggregation. The
    * identical plan runs under Structured Streaming with a watermark (see
    * graft.streaming); here it is exercised in batch for the oracle.
    */
  def sTumblingWindow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy("bucket", "event_type")

  val sTumblingSql: String =
    s"""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket, event_type, COUNT(*) AS cnt,
       |  ${DSUM.format("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** W7: windowed heavy hitters — top-3 event types per 1-hour bucket
    * ("trending now", the time-bucketed twin of a10's global top-k). Phase 1
    * is a partial-aggregable (bucket, type) count — the only full-data
    * shuffle; phase 2 ranks WITHIN each bucket, so the window partitions by
    * bucket over data already reduced to #buckets × #types rows, never a
    * single-task global sort. At 100 TB the rank input stays tiny because
    * the type domain is bounded; an unbounded domain is exactly when the
    * bounded TopK aggregator (a10) or a SpaceSaving sketch replaces the
    * window — same contract, pinned by the a10 spec.
    */
  def w7HourlyTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = t(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byBucket = Window.partitionBy("bucket").orderBy(col("n").desc, col("event_type"))
    counts
      .withColumn("rank", row_number().over(byBucket))
      .filter(col("rank") <= 3)
      .select("bucket", "rank", "event_type", "n")
      .orderBy("bucket", "rank")
  }

  val w7Sql: String =
    """WITH c AS (
      |  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:00') AS bucket,
      |    event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT bucket, rank, event_type, n FROM (
      |  SELECT bucket, event_type, n,
      |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY n DESC, event_type) AS rank
      |  FROM c)
      |WHERE rank <= 3 ORDER BY bucket, rank""".stripMargin

  // ------------------------------------------------------- scalar functions

  /** F1/F5: harmonize analog — trim/upper/translate normalization chain. */
  def f1Harmonize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        upper(translate(trim(col("c_name")), "#", "_")).as("norm_name"))
      .orderBy("c_custkey")

  val f1Sql: String =
    """SELECT c_custkey, UPPER(TRANSLATE(TRIM(c_name), '#', '_')) AS norm_name
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F2: content-hash (seguid analog) — md5 digest of the document text. */
  def f2ContentHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"))
      .orderBy("doc_id")

  val f2Sql: String =
    "SELECT doc_id, md5(text) AS text_md5 FROM documents ORDER BY doc_id"

  /** F10: variant-type classifier analog — CASE WHEN ladder + grouped count. */
  def f10Classifier(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("qty_class",
        when(col("l_quantity") <= 10, "SMALL")
          .when(col("l_quantity") <= 30, "MEDIUM")
          .otherwise("LARGE"))
      .groupBy("qty_class")
      .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("qty_class")

  val f10Sql: String =
    s"""SELECT CASE WHEN l_quantity <= 10 THEN 'SMALL' WHEN l_quantity <= 30 THEN 'MEDIUM'
       |  ELSE 'LARGE' END AS qty_class, COUNT(*) AS cnt, ${DSUM.format("l_extendedprice")} AS sum_price
       |FROM lineitem GROUP BY 1 ORDER BY qty_class""".stripMargin

  /** F11: ID-dedup analog — split, distinct, sort, re-join to string. */
  def f11DistinctJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_join(array_sort(array_distinct(split(col("text"), " "))), ";").as("vocab"))
      .orderBy("doc_id")

  val f11Sql: String =
    """SELECT doc_id, array_to_string(list_sort(list_distinct(string_split(text,' '))), ';') AS vocab
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Semi-structured extraction from the events `props` JSON-ish payload via
    * regexp (portable across both engines without a JSON extension).
    */
  def fJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        // try_cast: a non-matching props row yields regexp_extract = '' and
        // ANSI CAST(''AS int) throws; try_cast gives NULL, as does the oracle.
        expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) AS int)").as("k"))
      .orderBy("event_id")

  val fJsonSql: String =
    """SELECT event_id, TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin

  // ------------------------------------------- mutation analogs (K6 / K7)

  /** K6: remove-with-GC analog — anti-join delete of a derived key set
    * (orders of the bottom-balance customers), then orphan count.
    *
    * The final total order deliberately avoids a global `orderBy`: a global
    * sort plans a RangePartitioning exchange whose bounds come from a
    * driver-side sampling job over the child, and directly above a
    * broadcast-join stage that sampling pass re-pays the join (measured:
    * 1.12 s → 0.54 s at sf0.1 swapping the ending, bringing k6 in line with
    * its structural siblings k7/k8). The result is bounded by the order
    * status domain (3 rows), so one round-robin exchange of O(statuses)
    * rows into a single sorted partition gives the identical total order
    * with no sampling job — strictly better at any scale for a
    * constant-cardinality result.
    */
  def k6AntiJoinDelete(s: SparkSession, dir: String): DataFrame = {
    val doomed = t(s, dir, "customer").filter(col("c_acctbal") < 0.0).select(col("c_custkey"))
    t(s, dir, "orders")
      .join(doomed, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("remaining"))
      .repartition(1)
      .sortWithinPartitions("o_orderstatus")
  }

  val k6Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS remaining FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey AND c_acctbal < 0.0)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** K7: metadata-update analog — left join against an updates relation and
    * COALESCE(new, old) per column (covSonar UPDATE genome SET …).
    */
  def k7CoalesceUpdate(s: SparkSession, dir: String): DataFrame = {
    val updates = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey").as("u_orderkey"), lit("0-ESCALATED").as("u_priority"))
    t(s, dir, "orders")
      .join(updates, col("o_orderkey") === col("u_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("u_priority"), col("o_orderpriority")).as("o_orderpriority"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
  }

  val k7Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS cnt FROM (
      |  SELECT COALESCE(u.u_priority, o.o_orderpriority) AS o_orderpriority
      |  FROM orders o LEFT JOIN (
      |    SELECT o_orderkey AS u_orderkey, '0-ESCALATED' AS u_priority
      |    FROM orders WHERE o_totalprice > 300000.0) u
      |  ON o.o_orderkey = u.u_orderkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** K8: snapshot diff / CDC changelog — classify every key as
    * Insert/Update/Delete between two table versions (here derived
    * deterministically from `orders` by keyed filters and a status mutation,
    * so both engines see identical snapshots). The diff is ONE full-outer
    * sort-merge join on the key with presence flags carried as literals —
    * the standard snapshot-compare that feeds incremental downstream
    * refreshes. At scale both snapshots are the big side, so the join
    * shuffles each once on the key; with both snapshots bucketed by key on
    * disk (`sources.CorpusSink`-style layout) the exchange disappears
    * entirely. Unchanged keys (the overwhelming majority in a real diff)
    * are dropped by the post-join filter, so only the changelog survives
    * the join — nothing downstream sees full-table volume. String equality
    * on the compared column keeps the oracle exact.
    */
  /** The two deterministic table versions k8 diffs and k10 merges — one
    * derivation so the pair of operators can never disagree on the input.
    */
  private[graft] def snapshotPair(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = t(s, dir, "orders").select("o_orderkey", "o_orderstatus")
    val vOld = base.filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k_old"), col("o_orderstatus").as("old_status"))
    val vNew = base.filter(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey").as("k_new"),
        when(col("o_orderkey") % 3 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("new_status"))
    (vOld, vNew)
  }

  def k8SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val (vOld, vNew) = snapshotPair(s, dir)
    vOld.join(vNew, col("k_old") === col("k_new"), "full_outer")
      .withColumn("op",
        when(col("k_old").isNull, lit("I"))
          .when(col("k_new").isNull, lit("D"))
          .when(col("old_status") =!= col("new_status"), lit("U")))
      .filter(col("op").isNotNull)
      .select(coalesce(col("k_old"), col("k_new")).as("o_orderkey"),
        col("op"), col("old_status"), col("new_status"))
      .orderBy("o_orderkey")
  }

  val k8Sql: String =
    """WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders),
      |old AS (SELECT o_orderkey AS k_old, o_orderstatus AS old_status
      |        FROM o WHERE o_orderkey % 7 != 0),
      |new AS (SELECT o_orderkey AS k_new,
      |          CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS new_status
      |        FROM o WHERE o_orderkey % 5 != 0),
      |d AS (SELECT k_old, k_new, old_status, new_status,
      |        CASE WHEN k_old IS NULL THEN 'I' WHEN k_new IS NULL THEN 'D'
      |             WHEN old_status != new_status THEN 'U' END AS op
      |      FROM old FULL OUTER JOIN new ON k_old = k_new)
      |SELECT COALESCE(k_old, k_new) AS o_orderkey, op, old_status, new_status
      |FROM d WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin

  /** K9: SCD-type-2 history assembly — turn a per-key event log into
    * validity intervals (the warehouse-dimension twin of k8's changelog:
    * k8 diffs two snapshots, k9 builds the full history). Per user, each
    * run of consecutive equal states collapses to one row valid
    * [first_seen, next_change); the open row carries NULL valid_to. Two
    * window passes over ONE hash partitioning on the key (change-detect
    * via lag, interval-close via lead on the filtered change rows — AQE
    * reuses the exchange), so a 100 TB log pays a single shuffle and no
    * self-join; state per key during the window is one row. Integer
    * epoch-micros timestamps keep the oracle exact.
    */
  def k9Scd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val changes = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type").as("state"))
      .withColumn("prev_state", lag("state", 1).over(byUser))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
    changes
      .withColumn("valid_to_us", lead("us", 1).over(byUser))
      .select(col("user_id"), col("state"), col("us").as("valid_from_us"),
        col("valid_to_us"), col("event_id").as("change_event_id"))
      // change_event_id makes the presentation sort a TOTAL order — two
      // state changes for one user in the same microsecond would otherwise
      // tie and the engines could emit them in different orders
      .orderBy("user_id", "valid_from_us", "change_event_id")
  }

  val k9Sql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type AS state FROM events),
      |c AS (SELECT user_id, event_id, us, state,
      |        lag(state) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_state
      |      FROM e),
      |ch AS (SELECT user_id, event_id, us, state FROM c
      |       WHERE prev_state IS NULL OR prev_state != state)
      |SELECT user_id, state, us AS valid_from_us,
      |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
      |  event_id AS change_event_id
      |FROM ch ORDER BY user_id, valid_from_us, change_event_id""".stripMargin

  /** K10: changelog apply (MERGE INTO) — the closing arc of the CDC family:
    * k8 produces the I/U/D changelog between two snapshots; k10 applies that
    * changelog back onto the old snapshot and must land exactly on the new
    * one. The merge is upsert = anti-join the old snapshot against the
    * changelog keys then union the I ∪ U rows ([[applyChangelog]], shared
    * with the streaming twin) — in a real refresh the
    * changelog is orders of magnitude smaller than the snapshot, so the
    * anti-join resolves as a broadcast of changelog keys and the snapshot
    * side never shuffles; with key-bucketed layouts even the diff side is
    * exchange-free. Output holds per-status counts of the applied snapshot
    * NEXT TO the same counts recomputed from the target snapshot, so the
    * oracle compare itself certifies apply ≡ target cross-engine (the spec
    * additionally pins row-level equality).
    */
  /** THE single definition of the MERGE rule — applies a changelog
    * (k, op ∈ I/U/D, new_status) onto a (k, status) snapshot: drop every
    * changed key, then add the I ∪ U rows. Anti-joining on ALL log keys
    * (not just U ∪ D) is deliberate: for a well-formed log it is the same
    * result (an I key is absent from the snapshot by definition), and it
    * makes re-applying the same log a NO-OP — the idempotent MERGE a
    * replayed streaming micro-batch needs
    * ([[graft.streaming.StreamingOps.changelogApplyStream]] is the
    * per-trigger consumer). The log side is the small side: both joins
    * broadcast it and the snapshot never shuffles.
    */
  private[graft] def applyChangelog(snapshot: DataFrame, log: DataFrame): DataFrame = {
    val changedKeys = log.select(col("k").as("ck"))
    val upserts = log.filter(col("op").isin("I", "U"))
      .select(col("k"), col("new_status").as("status"))
    snapshot
      .join(changedKeys, col("k") === col("ck"), "left_anti")
      .select(col("k"), col("status"))
      .unionByName(upserts)
  }

  def k10ChangelogApply(s: SparkSession, dir: String): DataFrame = {
    val (vOld, vNew) = snapshotPair(s, dir)
    val log = k8SnapshotDiff(s, dir)
      .select(col("o_orderkey").as("k"), col("op"), col("new_status"))
    val applied = applyChangelog(
      vOld.select(col("k_old").as("k"), col("old_status").as("status")), log)
    val appliedCounts = applied.groupBy("status").agg(count(lit(1)).as("n_applied"))
    val targetCounts = vNew.groupBy(col("new_status").as("status"))
      .agg(count(lit(1)).as("n_target"))
    appliedCounts.join(targetCounts, Seq("status"), "full_outer")
      .select(col("status"),
        coalesce(col("n_applied"), lit(0L)).as("n_applied"),
        coalesce(col("n_target"), lit(0L)).as("n_target"))
      .orderBy("status")
  }

  val k10Sql: String =
    """WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders),
      |old AS (SELECT o_orderkey AS k_old, o_orderstatus AS old_status
      |        FROM o WHERE o_orderkey % 7 != 0),
      |new AS (SELECT o_orderkey AS k_new,
      |          CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS new_status
      |        FROM o WHERE o_orderkey % 5 != 0),
      |log AS (SELECT COALESCE(k_old, k_new) AS k, old_status, new_status,
      |          CASE WHEN k_old IS NULL THEN 'I' WHEN k_new IS NULL THEN 'D'
      |               WHEN old_status != new_status THEN 'U' END AS op
      |        FROM old FULL OUTER JOIN new ON k_old = k_new),
      |applied AS (
      |  SELECT k_old AS k, old_status AS status FROM old
      |  WHERE k_old NOT IN (SELECT k FROM log WHERE op IS NOT NULL)
      |  UNION ALL
      |  SELECT k, new_status AS status FROM log WHERE op IN ('I','U')),
      |ac AS (SELECT status, COUNT(*) AS n_applied FROM applied GROUP BY status),
      |tc AS (SELECT new_status AS status, COUNT(*) AS n_target FROM new GROUP BY new_status)
      |SELECT COALESCE(ac.status, tc.status) AS status,
      |  COALESCE(n_applied, 0) AS n_applied, COALESCE(n_target, 0) AS n_target
      |FROM ac FULL OUTER JOIN tc ON ac.status = tc.status
      |ORDER BY status""".stripMargin

  /** Log for [[k10bBucketedMerge]]: k10's CDC feed restricted to keys
    * ≡ 0 (mod 292) — a SPARSE batch whose keys land in exactly
    * lcm(292,64)/292 = 16 of the 64 hash buckets, so the file-prune
    * claim (write ∝ touched buckets, never the target) is measurable,
    * not vacuous. 292 = 4·73 is deliberately coprime to the snapshot
    * rules' moduli (not a multiple of 5 or 7, unlike 300, whose every
    * key was absent from vNew and made the log ALL-DELETES): a mod-292
    * log carries mixed I/U/D ops, so the bucketed rewrite exercises the
    * upsert path and n_x is non-trivial. SQL-replayable by construction.
    */
  private[queries] val K10bLogModulus = 292
  private def k10bSparseLog(s: SparkSession, dir: String): DataFrame =
    k8SnapshotDiff(s, dir)
      .filter(col("o_orderkey") % K10bLogModulus === 0)
      .select(col("o_orderkey").as("k"), col("op"), col("new_status"))

  private val K10bBuckets = 64

  /** The bucketed changelog MERGE as a BATCH registered entry — the
    * fact-sized lakehouse shape [[graft.streaming.StreamingOps
    * .changelogApplyStreamBucketed]] proves per micro-batch, here
    * oracle-checked every round: the target lives bucketed by
    * `k % 64` (a SQL-replayable bucket function, unlike Murmur3), SEEDED
    * ONCE per input vintage under `target/k10b-state/<listing-digest>`
    * (k16's persisted-at-ingest discipline: the digest is the orders
    * table's file listing, so regenerated testdata rebuilds the seed
    * instead of serving a stale one), and each run rewrites ONLY the
    * buckets the sparse log touches — one `partitionBy` write of
    * touched-bucket rows, untouched bucket files never opened or
    * rewritten (spec-pinned byte-identical). Per-run write volume is
    * 16/64 buckets of the target regardless of target size — the MERGE
    * INTO economics a 10⁹-row table needs.
    *
    * Output: per-bucket post-merge row count and 'X'-status count (the
    * content the merge changes) plus whether this run rewrote the
    * bucket — DuckDB replays the global merge and bucket arithmetic.
    */
  def k10bBucketedMerge(s: SparkSession, dir: String): DataFrame = {
    val nB = K10bBuckets
    val (vOld, _) = snapshotPair(s, dir)
    val old = vOld.select(col("k_old").as("k"), col("old_status").as("status"))
    val log = k10bSparseLog(s, dir)
    // input-vintage digest over the orders file listing — the ONE shared
    // signature rule (Tables.listingSignature), so invalidation hardening
    // lands here and in rowCount's cache together
    val conf = s.sparkContext.hadoopConfiguration
    val listing = graft.Tables.listingSignature(s, s"$dir/orders.parquet")
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val sig = md5hex(listing)
    // state scoped PER DATASET (hash of the input dir), vintage-keyed
    // within it: two sessions — or one harness alternating sfDirs, e.g.
    // sf0.01 verify interleaved with sf0.1 bench — must not GC each
    // other's seed, which would both break a still-lazy earlier result
    // and force a full re-seed per call, silently defeating the
    // write-∝-touched-buckets economics this query exists to demonstrate
    val dsRoot = new org.apache.hadoop.fs.Path(
      s"target/k10b-state/${md5hex(new java.io.File(dir).getAbsolutePath)}")
    val stateDir = s"$dsRoot/$sig"
    val seedPath = s"$stateDir/seed"
    val rootFs = dsRoot.getFileSystem(conf)
    // GC only SIBLING vintages of this same dataset, then seed once per vintage
    if (rootFs.exists(dsRoot))
      rootFs.listStatus(dsRoot).foreach { st =>
        if (st.getPath.getName != sig) rootFs.delete(st.getPath, true)
      }
    // repartition ON the partition column before every partitionBy write
    // (guide §6, REBALANCE-before-write): without it each upstream task
    // fans out across all touched bucket dirs — tasks × buckets small
    // files (measured 196 in the state dir at sf0.1, with the parquet
    // writer churn charged as multi-second task GC), and the read-back
    // pays per-file open cost every run. Clustered, each bucket lands in
    // one file; rows within a bucket are identical either way.
    if (!rootFs.exists(new org.apache.hadoop.fs.Path(s"$seedPath/_SUCCESS")))
      old.withColumn("bkt", pmod(col("k"), lit(nB.toLong)))
        .repartition(col("bkt"))
        .write.mode("overwrite").partitionBy("bkt").parquet(seedPath)
    // explicit schema on every read-back: a zero-row partitionBy write
    // emits only _SUCCESS, and schema inference over no files throws —
    // an empty target or an all-delete merge is valid, not a crash
    val layout = org.apache.spark.sql.types.StructType
      .fromDDL("k BIGINT, status STRING, bkt INT")
    val seedAll = s.read.schema(layout).parquet(seedPath)
    // THE PRUNE: the batch's bucket list (≤ nB values, one tiny job)
    val touched: Seq[Long] = log
      .select(pmod(col("k"), lit(nB.toLong)).as("bkt")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    // one partitioned write of ONLY touched-bucket rows; per-bucket merge
    // equals the global merge filtered to the bucket because a key hashes
    // to exactly one bucket (the StreamingOps invariant)
    val mergedBack =
      if (touched.isEmpty) {
        // an empty batch touches nothing: zero writes, the report is the
        // seed as-is (an all-partitions-empty parquet write would also be
        // unreadable back — no schema to infer)
        seedAll.filter(lit(false)).select("k", "status", "bkt")
      } else {
        val touchedRows = seedAll.filter(col("bkt").isin(touched: _*))
          .select(col("k"), col("status"))
        applyChangelog(touchedRows, log)
          .withColumn("bkt", pmod(col("k"), lit(nB.toLong)))
          .repartition(col("bkt")) // see the seed write: one file per bucket
          .write.mode("overwrite").partitionBy("bkt").parquet(s"$stateDir/merged")
        // the report reads back the REAL layout: merged buckets + pruned seed
        s.read.schema(layout).parquet(s"$stateDir/merged")
          .select("k", "status", "bkt")
      }
    val untouched = seedAll.filter(!col("bkt").isin(touched: _*))
      .select("k", "status", "bkt")
    val report = untouched.unionByName(mergedBack)
      .groupBy(col("bkt").cast("long").as("bkt"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("status") === "X", 1)).as("n_x"))
      .withColumn("rewritten", col("bkt").isin(touched: _*).cast("int"))
      .select("bkt", "rewritten", "n_rows", "n_x")
      .orderBy("bkt")
    // EAGERLY materialize the ≤64-row report before returning: the lazy
    // plan reads state files a later call (new vintage, another dataset's
    // GC) may delete — the returned frame must not depend on them
    s.createDataFrame(
      java.util.Arrays.asList(report.collect(): _*), report.schema)
      .orderBy("bkt")
  }

  val k10bSql: String =
    s"""WITH o AS (SELECT o_orderkey, o_orderstatus FROM orders),
      |old AS (SELECT o_orderkey AS k_old, o_orderstatus AS old_status
      |        FROM o WHERE o_orderkey % 7 != 0),
      |new AS (SELECT o_orderkey AS k_new,
      |          CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS new_status
      |        FROM o WHERE o_orderkey % 5 != 0),
      |log0 AS (SELECT COALESCE(k_old, k_new) AS k, new_status,
      |          CASE WHEN k_old IS NULL THEN 'I' WHEN k_new IS NULL THEN 'D'
      |               WHEN old_status != new_status THEN 'U' END AS op
      |        FROM old FULL OUTER JOIN new ON k_old = k_new),
      |slog AS (SELECT k, op, new_status FROM log0
      |         WHERE op IS NOT NULL AND k % $K10bLogModulus = 0),
      |applied AS (
      |  SELECT k_old AS k, old_status AS status FROM old
      |  WHERE k_old NOT IN (SELECT k FROM slog)
      |  UNION ALL
      |  SELECT k, new_status AS status FROM slog WHERE op IN ('I','U')),
      |tb AS (SELECT DISTINCT k % ${K10bBuckets} AS bkt FROM slog),
      |b AS (SELECT k % ${K10bBuckets} AS bkt, COUNT(*) AS n_rows,
      |        COUNT(*) FILTER (WHERE status = 'X') AS n_x
      |      FROM applied GROUP BY 1)
      |SELECT b.bkt, CASE WHEN tb.bkt IS NOT NULL THEN 1 ELSE 0 END AS rewritten,
      |       n_rows, n_x
      |FROM b LEFT JOIN tb USING (bkt) ORDER BY bkt""".stripMargin

  // -------------------------------------- K11: compaction planner (OPTIMIZE)

  /** Target merge-group size (bytes of document text per rewritten file). */
  private val K11Target = 4096L

  /** Compaction planner — the OPTIMIZE/bin-pack step every long-lived lake
    * table needs once small files accumulate (`sources.CorpusSink` prevents
    * the problem at write time; this is the retrofit for inherited
    * layouts). The file INVENTORY here is simulated as one "file" per
    * (lang, source) — metadata-sized, the planner's real input shape — and
    * within each table partition (lang) files pack into merge groups by
    * size-descending next-fit: cumulative bytes bucketed at [[K11Target]],
    * all in integer arithmetic (`(cum + target - 1) div target`), so both
    * engines assign identical groups. Output maps every file to its merge
    * group with the group's total — the rewrite worklist.
    *
    * Scale shape: the planner never touches data, only the inventory
    * (files-count rows; at 100 TB maybe 10⁷ rows); one window per table
    * partition orders it, a second sums per group — two metadata-sized
    * exchanges driving a rewrite that moves the actual bytes. Planner
    * output is deterministic, so a re-run after a partial rewrite produces
    * the same remaining groups (idempotent remediation).
    */
  def k11CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    val files = t(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(sum("n_chars").as("bytes"), count(lit(1)).as("n_docs"))
    val order = Window.partitionBy("lang")
      .orderBy(col("bytes").desc, col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val planned = files
      .withColumn("cum", sum("bytes").over(order))
      .withColumn("merge_group", expr(s"(cum + ${K11Target - 1}L) div ${K11Target}L"))
    planned
      .withColumn("group_bytes",
        sum("bytes").over(Window.partitionBy("lang", "merge_group")))
      .select(col("lang"), col("source"), col("n_docs"), col("bytes"),
        col("merge_group"), col("group_bytes"))
      .orderBy(col("lang"), col("merge_group"), col("bytes").desc, col("source"))
  }

  val k11Sql: String =
    s"""WITH f AS (SELECT lang, source, SUM(n_chars)::BIGINT AS bytes,
       |         COUNT(*)::BIGINT AS n_docs
       |       FROM documents GROUP BY lang, source),
       |c AS (SELECT lang, source, n_docs, bytes,
       |        CAST((SUM(bytes) OVER (PARTITION BY lang ORDER BY bytes DESC, source
       |           ROWS UNBOUNDED PRECEDING) + ${K11Target - 1}) // $K11Target AS BIGINT) AS merge_group
       |      FROM f)
       |SELECT lang, source, n_docs, bytes, merge_group,
       |  SUM(bytes) OVER (PARTITION BY lang, merge_group)::BIGINT AS group_bytes
       |FROM c ORDER BY lang, merge_group, bytes DESC, source""".stripMargin

  // ------------------------------- K12: z-order clustering key (layout opt)

  /** Bits per dimension of the k12 z-value (31 ⇒ a 62-bit interleaved key,
    * the widest two-dimension interleave a signed long holds). Every bit of
    * a positive 32-bit key participates, which is what makes the per-bucket
    * extent bound hold at ANY scale factor: truncating to fewer bits would
    * alias keys ≥ 2^bits into the same z-value (sf1 part keys reach 200k >
    * 2^16) and silently break the tile property the layout exists for.
    */
  private val K12Bits = 31

  /** Z-order (Morton) clustering key — the layout optimization behind
    * Delta/Iceberg `ZORDER BY`: interleaving the bits of two join/filter
    * dimensions gives a SINGLE sort key under which ranges of EITHER
    * dimension map to a bounded number of key ranges, so one clustered
    * layout serves point/range predicates on both columns (sorting by
    * (a, b) lexicographically serves only `a`). Computed as a pure integer
    * fold — `Σ ((a>>i)&1)<<2i | ((b>>i)&1)<<(2i+1)` — identical on both
    * engines, no UDF; the file assignment buckets the z-value so each
    * output file covers one z-range. k11 plans WHICH files to rewrite;
    * k12 is the key the rewrite clusters by.
    *
    * Scale shape: the z-value is a narrow codegen'd projection (the
    * interleave unrolls to 62 shift-mask terms inside whole-stage
    * codegen); the layout write is `repartitionByRange(zbucket)` +
    * `sortWithinPartitions(zval)` — one range exchange, the same discipline
    * `CorpusSink` applies, with row-group min/max stats then pruning both
    * dimensions. The query here emits the per-bucket extent proof: each
    * z-bucket's min/max of BOTH dimensions, showing the bounded-extent
    * property range pruning relies on.
    */
  def k12ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val inter = (0 until K12Bits).map { i =>
      s"(((l_partkey >> $i) & 1L) << ${2 * i}) + (((l_suppkey >> $i) & 1L) << ${2 * i + 1})"
    }.mkString(" + ")
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zval", expr(inter))
      .withColumn("zbucket", expr("zval div 262144L")) // 2^18 z-span: each bucket is a 512x512 aligned tile
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("part_min"), max("l_partkey").as("part_max"),
        min("l_suppkey").as("supp_min"), max("l_suppkey").as("supp_max"),
        min("zval").as("z_min"), max("zval").as("z_max"))
      .orderBy("zbucket")
  }

  val k12Sql: String = {
    val inter = (0 until K12Bits).map { i =>
      s"(((l_partkey >> $i) & 1) << ${2 * i}) + (((l_suppkey >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH z AS (SELECT l_partkey, l_suppkey, ($inter)::BIGINT AS zval FROM lineitem)
       |SELECT zval // 262144 AS zbucket, COUNT(*)::BIGINT AS n_rows,
       |  MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
       |  MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max,
       |  MIN(zval) AS z_min, MAX(zval) AS z_max
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
  }

  // -------------------------- K13: snapshot-retention vacuum planner (GC)

  /** Snapshots kept for time travel past the current version. */
  private val K13Retain = 3L

  /** Vacuum planner — the retention GC step that completes the lakehouse
    * lifecycle (CorpusSink writes → k11 compacts → k12 clusters → k8/k10
    * diff and merge → k13 reclaims): given each file's add-version and
    * (for rewritten/deleted files) remove-version — the two facts a Delta/
    * Iceberg log compaction hands the planner — classify every file as
    * `live` (still referenced by the current snapshot), `retained` (dead,
    * but a snapshot within the [[K13Retain]]-version time-travel horizon
    * still references it), or `deletable` (no retained snapshot can reach
    * it). The transaction log here is simulated deterministically from the
    * k11 file inventory (md5-derived add version, modulo-rule lifetime) so
    * both engines classify identical files; a production run reads the real
    * log. Emits the per-file worklist — `deletable` rows ARE the vacuum's
    * delete list — with bytes for the reclaim report.
    *
    * Scale shape: the planner never touches data, only the inventory
    * (k11's discipline): one metadata-sized aggregation builds the file
    * table, the current-version watermark collects as ONE literal row (the
    * x21/j8 constant-summary pattern), and classification is a narrow
    * projection. Determinism makes re-runs idempotent — a crashed vacuum
    * resumes by re-planning and deleting whatever of the same list remains.
    */
  def k13VacuumPlan(s: SparkSession, dir: String): DataFrame =
    k13VacuumPlan(s, dir, K13Retain)

  /** `retain` is the time-travel dial: more retained versions ⇒ the
    * deletable set can only SHRINK (the cutoff moves back), spec-pinned —
    * the monotonicity that makes raising retention always safe.
    */
  /** THE single derivation of the synthetic file inventory the lakehouse
    * metadata family operates on — file ≈ (lang, source) with bytes and
    * add/remove versions, what a Delta/Iceberg log compaction hands a
    * planner. localCheckpointed: ONE data scan ever, everything downstream
    * (k13's vacuum classification, k14's as-of read) is metadata-sized.
    */
  private[graft] def fileInventory(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(sum("n_chars").as("bytes"), count(lit(1)).as("n_docs"))
      .withColumn("add_v",
        expr("cast(conv(substring(md5(source),1,15),16,10) as bigint) % 8"))
      .withColumn("remove_v",
        expr("CASE WHEN n_docs % 3 != 0 THEN add_v + 1L + bytes % 4 END"))
      .lossTolerantCheckpoint()

  /** The inventory's current-version watermark — max version any file was
    * touched at. ONE definition shared by k13 (retention cutoff) and k14
    * (as-of default), so the two can never disagree on "now"; fails
    * loudly on an empty inventory.
    */
  private def inventoryVmax(inv: DataFrame, who: String): Long = {
    val row = inv.agg(max(coalesce(col("remove_v"), col("add_v")))).first()
    require(!row.isNullAt(0),
      s"$who needs a non-empty file inventory (documents table is empty)")
    row.getLong(0)
  }

  def k13VacuumPlan(s: SparkSession, dir: String, retain: Long): DataFrame = {
    require(retain >= 0, s"retain must be non-negative, got $retain")
    // the inventory is read twice (watermark action + returned plan) —
    // [[fileInventory]] materializes it once so "the planner never touches
    // data" stays true
    val files = fileInventory(s, dir)
    val vmax = inventoryVmax(files, "vacuum planner")
    files
      .withColumn("status", expr(
        "CASE WHEN remove_v IS NULL THEN 'live' " +
          s"WHEN remove_v > ${vmax - retain}L THEN 'retained' " +
          "ELSE 'deletable' END"))
      .select(col("lang"), col("source"), col("bytes"), col("add_v"),
        col("remove_v"), col("status"))
      .orderBy("status", "lang", "source")
  }

  /** K14: snapshot read AS OF a version — the query-side completion of the
    * lakehouse lifecycle (k8/k10 move versions forward, k13 garbage-
    * collects, k14 READS history): given the [[fileInventory]], the files
    * a `VERSION AS OF v` scan would open are exactly those with
    * `add_v ≤ v` and no remove at or before v — the Delta/Iceberg
    * time-travel rule. Pure metadata: a narrow filter over the
    * checkpointed inventory, data files never touched; at 100 TB this is
    * a log read, not a table read. The registered entry reads at the
    * mid-history version vmax/2 (derived from the inventory itself, one
    * metadata-cheap action — the oracle replicates it as a scalar
    * subquery); `v` is the time-travel dial, spec-pinned against a brute
    * force at EVERY version and to degenerate to k13's live class at
    * v = vmax.
    */
  def k14TimeTravel(s: SparkSession, dir: String): DataFrame = {
    val inv = fileInventory(s, dir)
    readAsOf(inv, inventoryVmax(inv, "time travel") / 2)
  }

  def k14TimeTravel(s: SparkSession, dir: String, v: Long): DataFrame = {
    require(v >= 0, s"version must be non-negative, got $v")
    readAsOf(fileInventory(s, dir), v)
  }

  private def readAsOf(inv: DataFrame, v: Long): DataFrame =
    inv.filter(col("add_v") <= v &&
        (col("remove_v").isNull || col("remove_v") > v))
      .select(col("lang"), col("source"), col("bytes"),
        col("add_v"), col("remove_v"))
      .orderBy("lang", "source")

  val k14Sql: String = {
    val md5num = (1 to 15).map { k =>
      val mult = 1L << (4 * (15 - k))
      s"(strpos('0123456789abcdef', substr(md5(source),$k,1))-1) * $mult"
    }.mkString(" + ")
    s"""WITH f AS (SELECT lang, source, SUM(n_chars)::BIGINT AS bytes,
       |         COUNT(*)::BIGINT AS n_docs
       |       FROM documents GROUP BY lang, source),
       |v AS (SELECT lang, source, bytes, n_docs, ($md5num) % 8 AS add_v
       |      FROM f),
       |l AS (SELECT lang, source, bytes, add_v,
       |        CASE WHEN n_docs % 3 != 0 THEN add_v + 1 + bytes % 4 END AS remove_v
       |      FROM v),
       |m AS (SELECT MAX(COALESCE(remove_v, add_v)) // 2 AS rv FROM l)
       |SELECT lang, source, bytes, add_v, remove_v
       |FROM l CROSS JOIN m
       |WHERE add_v <= rv AND (remove_v IS NULL OR remove_v > rv)
       |ORDER BY lang, source""".stripMargin
  }

  val k13Sql: String = {
    val md5num = (1 to 15).map { k =>
      val mult = 1L << (4 * (15 - k))
      s"(strpos('0123456789abcdef', substr(md5(source),$k,1))-1) * $mult"
    }.mkString(" + ")
    s"""WITH f AS (SELECT lang, source, SUM(n_chars)::BIGINT AS bytes,
       |         COUNT(*)::BIGINT AS n_docs
       |       FROM documents GROUP BY lang, source),
       |v AS (SELECT lang, source, bytes, n_docs, ($md5num) % 8 AS add_v
       |      FROM f),
       |l AS (SELECT lang, source, bytes, add_v,
       |        CASE WHEN n_docs % 3 != 0 THEN add_v + 1 + bytes % 4 END AS remove_v
       |      FROM v),
       |m AS (SELECT MAX(COALESCE(remove_v, add_v)) AS vmax FROM l)
       |SELECT lang, source, bytes, add_v, remove_v,
       |  CASE WHEN remove_v IS NULL THEN 'live'
       |       WHEN remove_v > vmax - $K13Retain THEN 'retained'
       |       ELSE 'deletable' END AS status
       |FROM l CROSS JOIN m ORDER BY status, lang, source""".stripMargin
  }

  // ------------------------- K15: zone-map data-skipping planner (stats prune)

  /** Docs per synthetic ingest-batch file for k15 (a file ≈ one commit). */
  private[graft] val K15Batch = 64L

  def k15ZoneMapPlan(s: SparkSession, dir: String): DataFrame =
    k15ZoneMapPlan(s, dir, K15Batch)

  /** Zone-map DATA-SKIPPING planner — the min/max-stats pruning every
    * lakehouse scan runs before touching data (Parquet footer stats,
    * Delta/Iceberg file stats, the Small Materialized Aggregates of
    * Moerkotte VLDB'98): files are ingest batches of [[K15Batch]] docs
    * (doc_id is ingest-ordered, the realistic commit layout), each carries
    * min/max of the predicate column `n_chars`, and the planner marks it
    * `skip` iff its zone cannot intersect the middle-third band
    * [lo, hi] derived from the global extent. The skip ratio this reports
    * is the clustering-health metric k12's z-order layout exists to raise
    * — on an UNCLUSTERED column it is honestly low, which is precisely
    * what the report tells an operator.
    *
    * Scale shape: stats collection is ONE partial-aggregable pass
    * (n_files rows out — metadata-sized, ~10⁶ rows at 100 TB); the global
    * extent folds out of the same pass's output, not a second data scan
    * (the planner reads STATS, never data); the decision is a narrow
    * projection over stats rows. The lossless guarantee — scanning only
    * `read` files returns exactly the full filter's rows — is the
    * [[zoneMapPrunedScan]] library rule, spec-pinned and fuzzed under a
    * clustered layout where pruning actually bites.
    */
  def k15ZoneMapPlan(s: SparkSession, dir: String, batch: Long): DataFrame = {
    require(batch >= 1, s"batch must be positive, got $batch")
    val stats = t(s, dir, "documents")
      .groupBy(expr(s"doc_id div ${batch}L").as("file_id"))
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_nc"), max("n_chars").as("max_nc"))
      .lossTolerantCheckpoint() // stats read twice (extent + plan): ONE data scan ever
    val ext = stats.agg(min("min_nc").as("lo"), max("max_nc").as("hi")).first()
    require(!ext.isNullAt(0), "zone-map planner needs a non-empty table")
    val (gmin, gmax) = (ext.getLong(0), ext.getLong(1))
    val lo = gmin + (gmax - gmin) / 3
    val hi = gmin + 2 * ((gmax - gmin) / 3)
    stats
      .withColumn("decision",
        when(col("max_nc") < lo || col("min_nc") > hi, "skip").otherwise("read"))
      .select(col("file_id"), col("n_docs"), col("min_nc"), col("max_nc"),
        col("decision"))
      .orderBy("file_id")
  }

  /** The pruned scan k15's plan implies: read only files whose zone
    * intersects [lo, hi], then apply the exact predicate. Lossless by the
    * zone-map contract (a skipped file cannot contain a matching row);
    * the spec pins equality with the naive full filter and fuzzes it under
    * a sorted layout where most files really are skipped.
    */
  def zoneMapPrunedScan(docs: DataFrame, lo: Long, hi: Long, batch: Long): DataFrame = {
    require(batch >= 1, s"batch must be positive, got $batch")
    val withFile = docs.withColumn("file_id", expr(s"doc_id div ${batch}L"))
    val live = withFile.groupBy("file_id")
      .agg(min("n_chars").as("min_nc"), max("n_chars").as("max_nc"))
      .filter(col("max_nc") >= lo && col("min_nc") <= hi)
      .select("file_id")
    withFile.join(broadcast(live), "file_id")
      .filter(col("n_chars") >= lo && col("n_chars") <= hi)
      .drop("file_id")
  }

  val k15Sql: String =
    s"""WITH st AS (SELECT doc_id // $K15Batch AS file_id, COUNT(*)::BIGINT AS n_docs,
       |         MIN(n_chars)::BIGINT AS min_nc, MAX(n_chars)::BIGINT AS max_nc
       |       FROM documents GROUP BY 1),
       |ex AS (SELECT MIN(min_nc) AS gmin, MAX(max_nc) AS gmax FROM st),
       |b AS (SELECT gmin + (gmax - gmin) // 3 AS lo,
       |        gmin + 2 * ((gmax - gmin) // 3) AS hi FROM ex)
       |SELECT file_id, n_docs, min_nc, max_nc,
       |  CASE WHEN max_nc < lo OR min_nc > hi THEN 'skip' ELSE 'read' END AS decision
       |FROM st CROSS JOIN b ORDER BY file_id""".stripMargin

  // -------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "p1_isin" -> (p1Isin _),
    "p1_notin" -> (p1NotIn _),
    "p2p3_eq_range" -> (p2p3EqRange _),
    "p4_prefix" -> (p4Prefix _),
    "p5_date_ranges" -> (p5DateRanges _),
    "p6_token_membership" -> (p6TokenMembership _),
    "p7_array_size" -> (p7ArraySize _),
    "p8_count_mode" -> (p8CountMode _),
    "j1_left_join" -> (j1LeftJoin _),
    "j2_chain_join" -> (j2ChainJoin _),
    "j6_gather_sorted" -> (j6GatherSorted _),
    "j7_wildcard_semi" -> (j7WildcardSemi _),
    "j8_bloom_semi" -> (j8BloomSemi _),
    "j9_asof_join" -> (j9AsofJoin _),
    "j10_range_join" -> (j10RangeJoin _),
    "j11_interval_lookup" -> (j11IntervalLookup _),
    "a4_count_distinct" -> (a4CountDistinct _),
    "a5_group_order" -> (a5GroupOrder _),
    "a6_min_max" -> (a6MinMax _),
    "a7_coverage" -> (a7Coverage _),
    "a9_quartiles" -> (a9Quartiles _),
    "a10_topk_heavy" -> (a10TopkHeavy _),
    "a11_rollup" -> (a11Rollup _),
    "a12_cube" -> (a12Cube _),
    "a13_grouping_sets" -> (a13GroupingSets _),
    "w1_row_number" -> (w1RowNumber _),
    "w2_running_sum" -> (w2RunningSum _),
    "w7_hourly_topk" -> (w7HourlyTopk _),
    "s_tumbling_window" -> (sTumblingWindow _),
    "f1_harmonize" -> (f1Harmonize _),
    "f2_content_hash" -> (f2ContentHash _),
    "f10_classifier" -> (f10Classifier _),
    "f11_distinct_join" -> (f11DistinctJoin _),
    "f_json_extract" -> (fJsonExtract _),
    "k6_antijoin_delete" -> (k6AntiJoinDelete _),
    "k7_coalesce_update" -> (k7CoalesceUpdate _),
    "k8_snapshot_diff" -> (k8SnapshotDiff _),
    "k9_scd2" -> (k9Scd2 _),
    "k10_changelog_apply" -> (k10ChangelogApply _),
    "k10b_bucketed_merge" -> (k10bBucketedMerge _),
    "k11_compaction_plan" -> (k11CompactionPlan _),
    "k12_zorder_layout" -> (k12ZorderLayout _),
    "k13_vacuum_plan" -> (k13VacuumPlan _),
    "k14_time_travel" -> ((ss: SparkSession, d: String) => k14TimeTravel(ss, d)),
    "k15_zonemap_plan" -> ((ss: SparkSession, d: String) => k15ZoneMapPlan(ss, d)),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_top_orders" -> q3Sql,
    "q5_region_revenue" -> q5Sql,
    "p1_isin" -> p1Sql,
    "p1_notin" -> p1NotSql,
    "p2p3_eq_range" -> p2p3Sql,
    "p4_prefix" -> p4Sql,
    "p5_date_ranges" -> p5Sql,
    "p6_token_membership" -> p6Sql,
    "p7_array_size" -> p7Sql,
    "p8_count_mode" -> p8Sql,
    "j1_left_join" -> j1Sql,
    "j2_chain_join" -> j2Sql,
    "j6_gather_sorted" -> j6Sql,
    "j7_wildcard_semi" -> j7Sql,
    "j8_bloom_semi" -> j8Sql,
    "j9_asof_join" -> j9Sql,
    "j10_range_join" -> j10Sql,
    "j11_interval_lookup" -> j11Sql,
    "a4_count_distinct" -> a4Sql,
    "a5_group_order" -> a5Sql,
    "a6_min_max" -> a6Sql,
    "a7_coverage" -> a7Sql,
    "a9_quartiles" -> a9Sql,
    "a10_topk_heavy" -> a10Sql,
    "a11_rollup" -> a11Sql,
    "a12_cube" -> a12Sql,
    "a13_grouping_sets" -> a13Sql,
    "w1_row_number" -> w1Sql,
    "w2_running_sum" -> w2Sql,
    "w7_hourly_topk" -> w7Sql,
    "s_tumbling_window" -> sTumblingSql,
    "f1_harmonize" -> f1Sql,
    "f2_content_hash" -> f2Sql,
    "f10_classifier" -> f10Sql,
    "f11_distinct_join" -> f11Sql,
    "f_json_extract" -> fJsonSql,
    "k6_antijoin_delete" -> k6Sql,
    "k7_coalesce_update" -> k7Sql,
    "k8_snapshot_diff" -> k8Sql,
    "k9_scd2" -> k9Sql,
    "k10_changelog_apply" -> k10Sql,
    "k10b_bucketed_merge" -> k10bSql,
    "k11_compaction_plan" -> k11Sql,
    "k12_zorder_layout" -> k12Sql,
    "k13_vacuum_plan" -> k13Sql,
    "k14_time_travel" -> k14Sql,
    "k15_zonemap_plan" -> k15Sql,
  )
}
