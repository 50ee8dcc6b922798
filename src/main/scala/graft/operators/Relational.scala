package graft.operators

import graft.Engine.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator suite over the driver testdata (TPC-H-ish).
  *
  * The reference engine has no relational layer — every aggregation/join in
  * SURVEY.md §2.3 is hand-coded inside a map/reduce executable
  * (`mj_exe/juice_wordcount.go:11-29` hash-agg, `mj_exe/contact_juice3.go:41-60`
  * nested-loop join). Here each of those semantics is a declarative
  * DataFrame plan so Catalyst supplies pushdown, pruning, partial
  * aggregation, broadcast-vs-shuffle join choice and whole-stage codegen.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (`nation`, `region`, query-side literals) are
  *    explicitly `broadcast()`ed — never shuffle a fact table to meet a
  *    kilobyte-sized dimension;
  *  - aggregates are expressed on `groupBy` so map-side partial agg kicks
  *    in before the shuffle;
  *  - windows partition by high-cardinality keys (custkey/suppkey/user_id),
  *    never by a constant (the reference's B3 constant-key trick is a
  *    deliberate single-reducer bottleneck we refuse to reproduce);
  *  - every rounded output is rounded AFTER aggregation, so the plan works
  *    on exact doubles and only the presentation is truncated.
  */
object Relational {

  /** TPC-H Q1-style pricing summary (reference workload A2 generalized:
    * hash aggregation with multiple measures). Map-side partial agg → 32
    * shuffle partitions → final agg; no join.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Customer rollup across two broadcast dimension joins
    * (region ⨝ nation ⨝ customer). nation/region are tiny: broadcast both;
    * the only shuffle is the final groupBy on (r_name, n_name).
    */
  def q2MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Top-10 orders by revenue (TPC-H Q3 shape): fact-fact shuffle join
    * lineitem ⨝ orders, then broadcast customer filter. Order by exact
    * revenue with deterministic tiebreak, round only in the output.
    */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    t.orders
      .filter(col("o_orderstatus") === "O")
      .join(rev, col("o_orderkey") === col("l_orderkey"))
      .orderBy(col("rev").desc, col("o_orderkey"))
      .select(col("o_orderkey"), round(col("rev"), 2).as("revenue"), col("o_orderpriority"))
      .limit(10)
  }

  /** Local-supplier volume (TPC-H Q5 shape): the multi-way join — three
    * fact-fact shuffle joins (customer⨝orders⨝lineitem⨝supplier, the
    * supplier join carrying the same-nation conjunct) finished by two
    * broadcast dimension joins. The canonical mixed join topology: big
    * sides shuffle on their keys, kilobyte dims broadcast, one final
    * groupBy shuffle.
    */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(t.supplier,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Order-priority count with an EXISTS semi-join (TPC-H Q4 shape).
    * left_semi keeps the orders row at most once regardless of lineitem
    * multiplicity — the scalable EXISTS, no distinct needed.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val shipped = t.lineitem.filter(col("l_quantity") >= 25).select(col("l_orderkey"))
    t.orders
      .join(shipped, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Forecast-revenue filter+agg (TPC-H Q6 shape). The whole predicate set
    * is pushed into the parquet scan (PushedFilters), and only 3 of 11
    * lineitem columns are read (ReadSchema) — verify with .explain.
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Per-customer top-3 orders by totalprice: ranking window partitioned by
    * the high-cardinality custkey (scales linearly with customers; state per
    * partition is 3 rows).
    */
  def q7TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q7's semantics through the bounded [[Ranking.topKPerKey]] aggregate —
    * the deliberate window-vs-aggregate A/B pair: q7 keeps the classic
    * `row_number` window plan (full exchange + sort of the orders table on
    * o_custkey), this gate ranks the same rows via map-side bounded heaps
    * (≤ 3 retained rows per customer per task, no sort). Same oracle SQL
    * semantics, independently gated, so the bench carries both spellings'
    * costs every round. At 100 TB the aggregate is the only viable shape:
    * shuffle volume is k rows per key per task instead of the full
    * relation.
    */
  def topkAggOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // (o_totalprice DESC, o_orderkey ASC) ≡ keep-largest struct(price, -key)
    Ranking.topKPerKey(
        t.orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"),
        struct(col("o_totalprice"), (-col("o_orderkey")).as("nok")), 3)
      .select(col("o_custkey"), col("rk").as("rn"),
        (-col("item.nok")).as("o_orderkey"),
        round(col("item.o_totalprice"), 2).as("totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running quantity per supplier over ship-date order. The window ORDER
    * BY must make the running sum WELL-DEFINED: (shipdate, orderkey,
    * linenumber) is NOT unique in the data, and tied rows with different
    * quantities would make the cumulative value depend on engine-internal
    * tie order (observed: DuckDB's parallel window breaks such ties
    * nondeterministically run-to-run). Appending l_quantity to the
    * ordering fixes it — any rows still tied have equal quantity, so
    * their order cannot change any cumulative sum.
    */
  def q8RunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.lineitem
      .withColumn("running_qty", sum(col("l_quantity")).over(w))
      // emit the full window ordering key: (orderkey, linenumber) alone is
      // NOT unique in the data, and duplicate-keyed output rows make any
      // row-wise compare ambiguous
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
        round(col("running_qty"), 2).as("running_qty"))
      .orderBy(col("l_suppkey"), col("ship_day"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Set operation: customers who placed an 'O' order, minus those who
    * placed an 'F' order (EXCEPT, with its implicit distinct). Both sides
    * are key-only projections so the set op shuffles narrow rows.
    */
  def q9SetOps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val o = t.orders
    val open  = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val fin   = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.except(fin).orderBy(col("o_custkey"))
  }

  /** Anti-join: customers with no orders at all. left_anti is the scalable
    * NOT EXISTS (no null-aware subtlety since keys are non-null).
    */
  def q10CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP over region → nation customer counts (grouping-set machinery the
    * reference entirely lacks). Spark plans this as a single Expand +
    * aggregate — one shuffle for all grouping sets.
    */
  def q11RollupCustomers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** Per-nation argmax: the customer holding the maximum account balance
    * (reference workload B4 is a global argmax over win counts; this is the
    * grouped generalization). row_number over (acctbal desc, custkey) keeps
    * ties deterministic, unlike bare max_by.
    */
  def q12ArgmaxCustomer(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("n_name"))
  }

  /** Scalar-function battery over part (string/math built-ins — the
    * reference's only scalar surface is strings.Split/TrimSpace/Atoi inside
    * executables, SURVEY §2.4). Everything here is codegen'd, no UDFs.
    */
  def q13ScalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        abs(col("p_size") - 25).as("size_dev"),
        round(col("p_retailprice") * 1.1, 2).as("uplift_price"),
        when(col("p_size") >= 25, "large").otherwise("small").as("size_class"))
      .orderBy(col("p_partkey"))
  }

  /** Hourly event rollup (tumbling-window buckets — the batch twin of the
    * streaming window in graft.streaming). events.ts arrives as Long
    * nanoseconds (see Engine nanosAsLong note); the hour bucket is exact
    * integer arithmetic emitted as epoch-microseconds, so the oracle
    * compare is integer-exact.
    */
  def q14EventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(expr("(ts DIV 3600000000000) * 3600000000").as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour_us"), col("event_type"))
  }

  /** Distinct aggregation: per market segment, exact distinct nations and
    * order-count. countDistinct plans as two-phase partial/final distinct
    * aggregation — no driver-side set.
    */
  def q15DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_nationkey")).as("n_nations"),
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** JSON column processing: parse the events `props` payload with an
    * explicit schema (`from_json` — schema'd parse stays inside codegen;
    * never schema-infer per row at scale) and aggregate the extracted
    * field. The reference has no semi-structured support at all
    * (SURVEY §2.4: no json functions).
    */
  def q17JsonProps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Approximate sketch aggregates — the constant-memory path for
    * cardinality/quantiles at 100 TB where exact distinct would shuffle
    * every key: HyperLogLog++ (`approx_count_distinct`, mergeable partial
    * sketches) and t-digest quantiles (`percentile_approx`).
    *
    * Sketch values themselves can't be cross-engine-hashed (different
    * implementations legitimately differ), so the gate carries each
    * sketch's ERROR-BOUND VERDICT instead: the query computes the
    * sketch AND its exact companion in the same plan and emits a
    * boolean per bound — HLL within 10% + 10 absolute of the exact
    * distinct (rsd 0.02 ⇒ 3σ ≈ 6%); each t-digest quantile placed at a
    * rank within ±10 points of its target (accuracy 1000 ⇒ rank error
    * ≤ n/1000) — the lower bound checked on the ≤-count and the upper
    * on the strict <-count, so a heavily tied quantile value widens
    * the band instead of flunking a correct digest. The DuckDB oracle recomputes
    * the exact columns and asserts every verdict TRUE — a sketch that
    * drifts outside its contract turns the hash gate red. Exact
    * quantiles use NEAREST-RANK (pure integer rank arithmetic + a raw
    * data value, no interpolation arithmetic to disagree on).
    * ScalaTest additionally bounds the sketch-vs-exact error tighter.
    */
  def q18Sketches(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(col("event_type"), col("user_id"), col("value"))
    val byType = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("n_users"),
      approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
      count(lit(1)).as("n"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
      percentile_approx(col("value"), lit(0.99), lit(1000)).as("p99_approx"))
    // exact nearest-rank quantiles: the value at integer rank
    // ceil(p·n) in the per-type sort — rank picked with integer div so
    // both engines compute the identical rank. NOT computed by ranking
    // rows: a row_number window partitioned by event_type puts a whole
    // type (≈ corpus/5) in one task. Instead the per-(type, value)
    // COUNTS table — value is fixture-quantized, so this is the
    // bounded-distinct-domain decomposition distributedNtile uses —
    // gets a keyed running sum, and rank r's value is the distinct row
    // whose cumulative range (cum − vn, cum] contains r. The corpus is
    // touched only by the map-side-combining count aggregate.
    val vc = ev.select(col("event_type"), col("value"))
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("vn"))
    val cum = graft.operators.BoundedGlobal.withKeyedPrefixSum(vc,
      keyCols = Seq("event_type"),
      orderCols = Seq(col("event_type"), col("value")),
      valueCol = "vn", outCol = "cum", includeCurrent = true,
      maxRows = 4000000L, "q18Sketches distinct (event_type, value)")
    val ptiles = cum
      .join(broadcast(byType.select(col("event_type"), col("n"))), Seq("event_type"))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r99", expr("(99 * n + 99) div 100"))
      .groupBy(col("event_type"))
      .agg(
        max(when(col("cum") - col("vn") < col("r50") && col("cum") >= col("r50"),
          col("value"))).as("p50_value"),
        max(when(col("cum") - col("vn") < col("r99") && col("cum") >= col("r99"),
          col("value"))).as("p99_value"))
    // t-digest rank audit: where each approx quantile actually lands in
    // the per-type value order — both the ≤-count and the strict <-count,
    // so ties on the quantile value widen the acceptance band instead of
    // failing it (a legitimately heavy median value can push the ≤-count
    // past 60% while the digest is inside its rank-error contract)
    val ranks = ev
      .join(broadcast(byType.select(col("event_type"), col("p50_approx"), col("p99_approx"))),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") <= col("p50_approx"), 1L).otherwise(0L)).as("c50_le"),
        sum(when(col("value") < col("p50_approx"), 1L).otherwise(0L)).as("c50_lt"),
        sum(when(col("value") <= col("p99_approx"), 1L).otherwise(0L)).as("c99"))
    byType.join(ptiles, Seq("event_type")).join(ranks, Seq("event_type"))
      .select(col("event_type"), col("n_users"),
        (abs(col("approx_users") - col("n_users")) <=
          greatest(lit(10L), expr("(n_users * 10) div 100"))).as("approx_users_ok"),
        col("p50_value"), col("p99_value"),
        (col("c50_le") * 100 >= col("n") * 40 && col("c50_lt") * 100 <= col("n") * 60)
          .as("p50_approx_ok"),
        (col("c99") * 100 >= col("n") * 95).as("p99_approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Pivot: event counts per user-bucket, one column per event type —
    * `groupBy().pivot()` with an EXPLICIT value list (an unlisted pivot
    * makes Spark run a distinct-values job first; at 100 TB always name
    * the columns). Restated as CASE aggregation in the oracle.
    */
  def q19Pivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(pmod(col("user_id"), lit(10)).as("user_bucket"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      // pivot+count leaves NULL in absent cells; a count must read 0
      .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
      .orderBy(col("user_bucket"))
  }

  /** As-of join: for each purchase event, the most recent click at or
    * before the purchase by the same user. Implemented the scalable way — a single
    * union + window pass (sort by (user, ts) once), NOT a triangle
    * join+max — so it costs one shuffle of events, independent of the
    * click/purchase ratio. The reference has no such operator; this is the
    * canonical "operator Spark lacks as a keyword but composes cleanly"
    * example (SURVEY §7.4).
    */
  def q16AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("ts DIV 1000").as("ts_us"))
    val tagged = ev
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("click_ts", when(col("event_type") === "click", col("ts_us")))
    // clicks sort before purchases at identical ts → strict "earlier" via
    // ordering (tag 0 = click). ts collisions are sub-microsecond-improbable
    // but the tiebreak keeps the plan deterministic anyway.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), when(col("event_type") === "click", 0).otherwise(1))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("last_click_us", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("last_click_us"))
      .orderBy(col("event_id"))
  }

  /** FULL OUTER join of two per-customer aggregates (open vs finished
    * order counts) — the reconciliation shape: customers present on
    * either side survive, presence tracked explicitly and counts
    * coalesced. Both sides aggregate BEFORE the join, so the outer join
    * matches one row per key per side (no fan-out) and both inputs are
    * already shuffled on the join key — the join reuses that
    * partitioning instead of adding an exchange.
    */
  def q32FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    def perCust(status: String, as: String) =
      o.filter(col("o_orderstatus") === status)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as(as))
    perCust("O", "n_open").join(perCust("F", "n_fin"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        col("n_open").isNotNull.as("has_open"),
        col("n_fin").isNotNull.as("has_fin"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_fin"), lit(0L)).as("n_fin"))
      .orderBy(col("o_custkey"))
  }

  /** Multiset (bag) set operations — EXCEPT ALL / INTERSECT ALL
    * semantics, which keep multiplicity (a value occurring 3× on the
    * left and 1× on the right survives EXCEPT ALL 2×, INTERSECT ALL 1×)
    * where q9's EXCEPT collapses to distinct. Computed from per-key
    * side-counts in ONE scan + ONE shuffle: multiplicity arithmetic
    * (max(na-nb,0) / min(na,nb)) over a single groupBy, multiplicities
    * re-expanded with an in-row `sequence` explode; the two output
    * branches share the aggregate's exchange (AQE reuse). Spark's
    * built-in `exceptAll`/`intersectAll` plan the same arithmetic but
    * duplicate the scan per operator — RelationalSpec pins this
    * formulation equal to the built-ins.
    */
  def q33MultisetOps(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).lineitem
      .select(col("l_orderkey"),
        (col("l_quantity") > 25).cast("long").as("a"),
        (col("l_discount") > 0.05).cast("long").as("b"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    def expand(tag: String, m: Column) = counts
      .withColumn("__m", m).filter(col("__m") > 0)
      .select(lit(tag).as("tag"), col("l_orderkey"),
        explode(sequence(lit(1L), col("__m"))).as("__i"))
      .select(col("tag"), col("l_orderkey"))
    expand("except_all", greatest(col("na") - col("nb"), lit(0L)))
      .unionAll(expand("intersect_all", least(col("na"), col("nb"))))
      .orderBy(col("tag"), col("l_orderkey"))
  }

  /** Correlated LATERAL table subquery — per nation, its top-2 customers
    * by account balance, expressed with Spark 4's `lateralJoin` +
    * `Column.outer()` correlation (the SQL `, LATERAL (...)` form).
    * Catalyst decorrelates the per-row subquery into a window-ranked
    * join — the same plan a hand-written row_number query gets — so the
    * declarative form costs nothing at scale; the ordering
    * (c_acctbal DESC, c_custkey) is a total order so top-2 is
    * deterministic.
    */
  def q34LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val top2 = t.customer
      .where(col("c_nationkey") === col("n_nationkey").outer())
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(2)
      .select(col("c_custkey"), col("c_acctbal"))
    t.nation.select(col("n_nationkey"), col("n_name"))
      .lateralJoin(top2)
      .select(col("n_nationkey"), col("n_name"), col("c_custkey"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("n_nationkey"), col("acctbal").desc, col("c_custkey"))
  }
}
