package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY §2.2 P1–P8, §2.3 J*, §2.4 A1–A4, §2.8):
  * projections, filters, scalar functions, joins, aggregations, set ops,
  * sorts/limits/top-k. Everything is built-in Catalyst expressions so
  * predicate pushdown / column pruning / partial aggregation / broadcast
  * selection all come for free (SURVEY §4.3).
  */
object Relational {

  /** A1+P5+A3 — the reference's duplicate gate
    * (/root/reference/src/preprocessing_pipeline.py:280): keys occurring
    * more than once. Hash-aggregate with map-side partials; the only
    * shuffle is on the group key.
    */
  def dupGate(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** A1–A3 + stats over doubles — pricing summary (shape of TPC-H Q1).
    * Double sums/avgs are rounded in-query: aggregation order is partition-
    * dependent, so the stable comparable value is the rounded one.
    */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp_ntz(lit("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** J-family — multiway join with broadcast dims (shape of TPC-H Q5):
    * region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem, revenue per nation.
    * region/nation/customer are broadcast (small dims); the only shuffle
    * joins are orders⋈lineitem on orderkey — at 100 TB those two are the
    * big tables and co-partition on the join key.
    */
  def joinRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") =!= "EUROPE")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "P")
    val li = Tables.lineitem(spark, dir)
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Left-semi join (EXISTS; SURVEY §2.3 J1's engine form). */
  def semiJoinCustomersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val fOrders = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    cust.join(fOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS). */
  def antiJoinCustomersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
  }

  /** q87 — BLOOM-PREFILTERED SEMI-JOIN: the explicit form of the runtime
    * filter that makes big semi-joins cheap at 100 TB. The build side's
    * keys go into a driver-built Bloom sketch (bits bounded by
    * expectedItems/fpp — ~120 KB here — regardless of build-side rows);
    * the probe side filters through the sketch BEFORE the shuffle, so only
    * probable matches and the sketch's ≤1% false positives pay exchange
    * cost; the exact semi-join then removes the false positives. Result ≡
    * the plain semi-join (the oracle), the shuffle shrinks from |probe| to
    * |matches|·(1+fpp).
    *
    * Spark's AQE injects this pattern automatically for eligible
    * shuffle joins; the verb exists for the places it can't reach —
    * pruning ABOVE an expensive upstream op, or a probe side that feeds
    * several consumers. The probe is a Scala UDF by necessity (the public
    * sketch's mightContain has no Column form); it costs two hash
    * evaluations per row and gates rows before every downstream operator.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String,
                    expectedItems: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val bloom = urgent.stat.bloomFilter("o_custkey", expectedItems, fpp)
    val mightContain = udf((k: Long) => bloom.mightContain(k))
    Tables.customer(spark, dir)
      .filter(mightContain(col("c_custkey")))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
  }

  /** S2 — shard-union ingest (reference: glob + pd.concat,
    * /root/reference/src/federated_learning_pipeline.py:57-59 → UNION ALL
    * semantics, SURVEY §2.8). Two disjoint scans unioned by name then
    * re-aggregated.
    */
  def unionShards(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "O")
    val b = o.filter(col("o_orderstatus") =!= "O")
    a.unionByName(b)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** INTERSECT — engine form of the reference's Python set.intersection
    * disjointness check (/root/reference/utils/preprocessing_testing_utils.py:69).
    */
  def intersectCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
  }

  /** EXCEPT (set difference). */
  def exceptCustkeys(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
  }

  /** A4 — distinct values (reference:
    * /root/reference/src/preprocessing_pipeline.py:174,226). */
  def distinctFlagStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()

  /** A6 — approx + exact distinct side by side. approx_count_distinct is
    * HLL++ whose raw estimate is engine-specific, so the comparable output
    * is the relative-error bound (deterministic for a fixed input set): the
    * oracle expects `approx_within_tol = true`, and the ScalaTest spec
    * additionally range-checks the raw estimate. At 100 TB the approx
    * column is the one you'd actually run — one pass, fixed-size sketch per
    * group, vs countDistinct's expand+two-phase shuffle.
    */
  def distinctStats(spark: SparkSession, dir: String): DataFrame = {
    // Two exact distincts on DIFFERENT columns in one groupBy would plan
    // an Expand (row count × n_distinct_aggs before the shuffle); two
    // pre-deduplicated partial aggregations joined on the 3-row group key
    // shuffle strictly less and keep every stage map-side combined.
    val li = Tables.lineitem(spark, dir)
    def exactDistinct(c: String, as: String) =
      li.select(col("l_returnflag"), col(c)).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        count(lit(1)).as("cnt"))
      .join(exactDistinct("l_orderkey", "exact_orders"), "l_returnflag")
      .join(exactDistinct("l_partkey", "exact_parts"), "l_returnflag")
      .withColumn("approx_within_tol",
        abs(col("approx_orders") - col("exact_orders")).cast("double")
          <= col("exact_orders") * 0.1)
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        col("cnt"), col("approx_within_tol"))
  }

  /** A33 [EXT] — K-ANONYMITY AUDIT: re-identification risk of a release
    * under a quasi-identifier set, swept across candidate k. A row is
    * k-anonymous iff its QI combination is shared by ≥ k rows; the audit
    * reports, per candidate k: equivalence-class count, the smallest
    * class, classes below k, rows in those classes (the re-identifiable
    * mass) and their fraction — the table a governance review reads to
    * pick the k a release can honestly claim (Sweeney 2002). The
    * reference's privacy posture is architectural (federated training so
    * patient rows never move; identifying columns dropped,
    * `/root/reference/src/preprocessing_pipeline.py:151`) — this is that
    * concern promoted to a measurable release gate, sibling to the PII
    * scorecard (q162) which audits free text where this audits structure.
    *
    * QI here: (c_nationkey, c_mktsegment, floor(c_acctbal/1000)) — two
    * categorical columns plus a bucketed numeric, the classic
    * demographic-shaped triple. floor of an IEEE double division is
    * engine-identical, so every emitted number is DuckDB-recomputable.
    *
    * Scale: ONE map-side-combined count over the QI key (the only
    * corpus-width pass); the class-size relation is \|QI classes\|-sized,
    * and the k sweep is a broadcast cross of that small relation with a
    * literal k column — no second scan, no shuffle by k.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String,
                      ks: Seq[Int] = Seq(2, 5, 10, 20)): DataFrame =
    kAnonymitySweepFor(kAnonymityClassCounts(Tables.customer(spark, dir)), ks)

  /** The quasi-identifier key shared by the k-anonymity audits (q165/q170)
    * and the l-diversity audit (q178) — declared once so the two
    * governance gates cannot drift on what a "QI class" is. */
  private def qiClassCols: Seq[Column] =
    Seq(col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).as("bal_bucket"))

  /** The QI equivalence-class counts — the gate's ONLY corpus-width pass,
    * and (being a sum-mergeable relation) the exact state the streaming
    * twin (q170) accumulates per tick. */
  def kAnonymityClassCounts(customers: DataFrame): DataFrame =
    customers.groupBy(qiClassCols: _*)
      .agg(count(lit(1)).as("cnt"))

  /** The k sweep over an already-aggregated class-count relation — shared
    * verbatim by the batch audit and the streaming gate (one
    * implementation, two front doors: the q133 discipline). */
  def kAnonymitySweepFor(classes: DataFrame,
                         ks: Seq[Int] = Seq(2, 5, 10, 20)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 2), s"need ks >= 2; got $ks")
    val spark = classes.sparkSession
    val kDf = spark.createDataFrame(ks.map(Tuple1(_))).toDF("k")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    classes.crossJoin(broadcast(kDf))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("cnt")).as("min_class_size"),
        sum(when(col("cnt") < col("k"), 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("cnt") < col("k"), col("cnt")).otherwise(0L)).as("n_risk_rows"),
        sum(col("cnt")).as("n_rows"))
      .withColumn("risk_frac",
        round((col("n_risk_rows").cast(dec) / col("n_rows").cast(dec)).cast(dec), 6)
          .cast("double"))
      .select(col("k"), col("n_rows"), col("n_classes"), col("min_class_size"),
        col("n_small_classes"), col("n_risk_rows"), col("risk_frac"))
  }

  /** A41 [EXT] — L-DIVERSITY AUDIT: the standard companion the k-anonymity
    * audit's consumers ask for next (Machanavajjhala et al. 2007 — same
    * architectural-privacy posture as A33): k-anonymity bounds how FEW
    * rows share a QI class, but a class whose rows all carry the same
    * sensitive value is still fully disclosed. Per l in the sweep, over
    * the SAME QI classes as q165 ([[qiClassCols]] — declared once, cannot
    * drift): class count, minimum distinct-sensitive-value count
    * (distinct l-diversity), classes/rows violating distinct-l, the
    * minimum 6dp class entropy, and classes violating ENTROPY
    * l-diversity (H(class) < ln l — the paper's stronger instantiation;
    * entropy violations always ⊇ distinct violations since
    * H ≤ ln(n_distinct)). Sensitive value = the last digit of c_custkey —
    * a synthetic stand-in whose distribution is independent of every QI
    * column, which is what makes the entropy machinery worth auditing.
    *
    * Scale: ONE corpus scan into a map-side-combined count on the
    * (QI, sensitive) key; class rollup and the l sweep run on the
    * \|classes × values\|- and \|classes\|-sized relations. Entropy uses
    * H = ln n − Σ c·ln c ⁄ n per class, 6dp-DECIMAL-rounded before the
    * ln(l) compare on BOTH engines (the q92 discipline — rounding pins
    * the order-dependent parallel sum).
    */
  def lDiversityAudit(spark: SparkSession, dir: String,
                      ls: Seq[Int] = Seq(2, 3, 5)): DataFrame = {
    require(ls.nonEmpty && ls.forall(_ >= 2), s"need ls >= 2; got $ls")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val svCounts = Tables.customer(spark, dir)
      .groupBy(qiClassCols :+
        substring(col("c_custkey").cast("string"), -1, 1).as("sv"): _*)
      .agg(count(lit(1)).as("cnt"))
    val classes = svCounts
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_sv"),
        round((log(sum(col("cnt")).cast("double"))
          - sum(col("cnt").cast("double") * log(col("cnt").cast("double")))
            / sum(col("cnt")).cast("double")).cast(dec), 6)
          .cast("double").as("h"))
    val lDf = spark.createDataFrame(ls.map(Tuple1(_))).toDF("l")
    classes.crossJoin(broadcast(lDf))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_rows")).as("n_rows"),
        min(col("n_sv")).as("min_distinct_sv"),
        sum(when(col("n_sv") < col("l"), 1L).otherwise(0L))
          .as("n_distinct_violations"),
        sum(when(col("n_sv") < col("l"), col("n_rows")).otherwise(0L))
          .as("n_risk_rows"),
        min(col("h")).as("min_entropy"),
        sum(when(col("h") <
            round(log(col("l").cast("double")).cast(dec), 6).cast("double"),
          1L).otherwise(0L)).as("n_entropy_violations"))
      .select(col("l"), col("n_rows"), col("n_classes"),
        col("min_distinct_sv"), col("n_distinct_violations"),
        col("n_risk_rows"), col("min_entropy"), col("n_entropy_violations"))
  }

  /** A42 [EXT] — T-CLOSENESS AUDIT: the third notch of the release-gate
    * trio (k-anonymity q165 → l-diversity q178 → t-closeness; Li, Li &
    * Venkatasubramanian 2007): l-diversity counts sensitive VALUES per QI
    * class but ignores their DISTRIBUTION — a class that is 98% one
    * diagnosis and 1%+1% two others is 3-diverse yet nearly disclosed.
    * t-closeness demands each class's sensitive distribution sit within
    * distance t of the corpus-wide distribution; for a categorical
    * sensitive attribute the paper's instantiation of that distance is
    * total variation, TVD = ½ Σ_v \|p_class(v) − p_global(v)\| — values
    * ABSENT from a class still contribute their global mass, folded in as
    * ½(Σ_present \|p−q\| + (1 − Σ_present q)). Per t in the sweep, over
    * the SAME QI classes and sensitive value as q178: class count, max
    * 6dp TVD, violating classes (tvd > t) and their row mass.
    *
    * Scale: the same single (QI, sensitive) map-side-combined scan as
    * q178; the global marginal is a \|values\|-row broadcast; the class
    * rollup and t sweep run on class-sized relations. TVD ratios ride
    * DECIMAL(38,18) before the 6dp round (the q92 discipline).
    */
  def tClosenessAudit(spark: SparkSession, dir: String,
                      ts: Seq[Double] = Seq(0.2, 0.3, 0.5)): DataFrame = {
    require(ts.nonEmpty && ts.forall(t => t > 0 && t < 1), s"need 0<t<1; got $ts")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val svCounts = graft.sources.Sources.spillScratch(
      Tables.customer(spark, dir)
        .groupBy(qiClassCols :+
          substring(col("c_custkey").cast("string"), -1, 1).as("sv"): _*)
        .agg(count(lit(1)).as("cnt")),
      "tclose_svc")
    val global = svCounts.groupBy(col("sv")).agg(sum(col("cnt")).as("g"))
    val total = global.agg(sum(col("g")).as("n_total"))
    // ratio arithmetic in DOUBLE over exact integer inputs (one IEEE
    // division each — bit-identical across engines), 6dp-DECIMAL-rounded
    // only at the end (the q92 discipline; decimal DIVISION rules differ
    // between Spark and DuckDB, so ratios never ride DECIMAL here)
    val qiW = org.apache.spark.sql.expressions.Window.partitionBy(
      col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
    val classes = svCounts
      .join(broadcast(global), "sv").crossJoin(broadcast(total))
      .withColumn("q", col("g").cast("double") / col("n_total").cast("double"))
      // class totals as a window over the (class, value) relation — the
      // widest partition is |values| rows, corpus-size-independent
      .withColumn("n_class", sum(col("cnt")).over(qiW))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(max(col("n_class")).as("n_rows"),
        sum(abs(col("cnt").cast("double") / col("n_class").cast("double")
          - col("q"))).as("present_diff"),
        (lit(1.0) - sum(col("q"))).as("absent_mass"))
      .withColumn("tvd",
        round(((col("present_diff") + col("absent_mass")) / 2.0).cast(dec), 6)
          .cast("double"))
      .select(col("n_rows"), col("tvd"))
    val tDf = spark.createDataFrame(ts.map(Tuple1(_))).toDF("t")
    classes.crossJoin(broadcast(tDf))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n_rows")).as("n_rows"),
        max(col("tvd")).as("max_tvd"),
        sum(when(col("tvd") > col("t"), 1L).otherwise(0L)).as("n_violations"),
        sum(when(col("tvd") > col("t"), col("n_rows")).otherwise(0L))
          .as("n_risk_rows"))
      .select(col("t"), col("n_rows"), col("n_classes"), col("max_tvd"),
        col("n_violations"), col("n_risk_rows"))
  }

  /** A40 [EXT] — BASKET CO-OCCURRENCE LIFT: association-rule mining's
    * first table (support / confidence / lift per item pair, Agrawal &
    * Srikant's Apriori at the 2-itemset grain) over order baskets —
    * the "what co-occurs with what" question a curation pipeline also
    * asks of tag sets and source mixes. Per part pair co-ordered at
    * least `minSupport` times: the co-order count, each part's order
    * count, confidence P(b|a) and lift P(a,b)/(P(a)P(b)) — lift > 1 is
    * genuine affinity, < 1 is substitution.
    *
    * Scale shape: baskets dedup to per-(order, part) first, so line-item
    * multiplicity can't inflate support; the pair join is keyed on
    * l_orderkey — per-order work is basket², which real baskets keep
    * small, and the `maxBasket` guard EXCLUDES degenerate mega-baskets
    * (a B2B blanket order is basket-size² hot) before the join, the
    * same filter-before-shuffle move as the q169 cluster cap. Counts
    * are map-side-combined; the marginals join is \|parts\|-sized and
    * the totals ride a 1-row broadcast.
    */
  def basketLift(spark: SparkSession, dir: String, minSupport: Long = 2L,
                 maxBasket: Int = 100): DataFrame = {
    require(minSupport >= 1 && maxBasket >= 2,
      s"need minSupport >= 1, maxBasket >= 2; got $minSupport, $maxBasket")
    val op = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val sized = op.groupBy(col("okey")).agg(count(lit(1)).as("basket"))
      .filter(col("basket") <= maxBasket)
    // the mega-basket-filtered relation feeds FOUR consumers (marginal agg,
    // both sides of the pair self-join, nOrders) — spilled ONCE (the q88
    // leaf discipline), so the lineitem distinct shuffles exactly once per
    // query instead of relying on ReuseExchange surviving AQE across jobs
    val kept = graft.sources.Sources.spillScratch(
      op.join(sized.select(col("okey")), "okey"), "basket_kept")
    val nOrders =
      kept.agg(countDistinct(col("okey"))).head().getLong(0)
    val marg = kept.groupBy(col("part")).agg(count(lit(1)).as("n_orders"))
    val co = kept.as("x").join(kept.as("y"), Seq("okey"))
      .filter(col("x.part") < col("y.part"))
      .groupBy(col("x.part").as("part_a"), col("y.part").as("part_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minSupport)
    // confidence and lift are ratios of EXACT integers whose true values
    // land exactly ON the 6dp half boundary for dyadic denominators
    // (n_a·n_b = 1024 → lift 287.5703125 on the fixture) — and the two
    // engines disagree there (Spark DECIMAL rounds half-up, DuckDB
    // half-even). So the 6dp half-up rounding is done in INTEGER
    // arithmetic — ⌊(x·2·10⁶ + d) / (2d)⌋, exact and engine-identical —
    // and only the final micro→double division (same two doubles both
    // sides) leaves integer land. The lift numerator n_co·N·2e6 wraps Long
    // silently under non-ANSI Spark once n_co·N reaches ~4.6e12, so it is
    // computed in DECIMAL(38,0) — exact at any corpus scale; DuckDB's
    // integer ops promote to HUGEINT, so the two engines stay identical.
    co.join(marg.select(col("part").as("part_a"), col("n_orders").as("n_a")), "part_a")
      .join(marg.select(col("part").as("part_b"), col("n_orders").as("n_b")), "part_b")
      .withColumn("conf_micro",
        expr("(CAST(n_co AS DECIMAL(38,0)) * 2000000 + n_a) DIV (CAST(n_a AS DECIMAL(38,0)) * 2)"))
      .withColumn("lift_micro",
        expr(s"(CAST(n_co AS DECIMAL(38,0)) * $nOrders * 2000000 + CAST(n_a AS DECIMAL(38,0)) * n_b) DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * 2)"))
      .select(col("part_a"), col("part_b"), col("n_co"), col("n_a"), col("n_b"),
        (col("conf_micro").cast("double") / 1000000.0).as("confidence_ab"),
        (col("lift_micro").cast("double") / 1000000.0).as("lift"))
  }

  /** A44 [EXT] — JOIN-STRATEGY ADVISOR: q173's sibling one step up the
    * plan — per candidate join of the engine's own big-join pairs, the
    * numbers that decide broadcast vs shuffle BEFORE the job runs: per
    * side row/distinct-key counts, the probe side's heaviest key and
    * q173 skew ratio, the matched-key and matched-probe-row counts (a
    * low match rate argues for a pre-join semi-filter — the q87 bloom
    * pattern), the build side (the smaller), and the strategy call at a
    * row-count threshold (the knob standing in for
    * autoBroadcastJoinThreshold's byte form — bytes are config-and-codec
    * relative, rows are oracle-exact). Everything exact: a sampled
    * advisor misses exactly the key that matters (q173's reasoning).
    *
    * Scale: per join, one map-side-combined count per side on its key
    * (the same aggregate the real join's shuffle would do, minus
    * payload) and one keys-only join for the match stats — the advisor
    * costs one narrow pass of each join it prices, run once per
    * pipeline change, not per query.
    */
  def joinStrategyAdvisor(spark: SparkSession, dir: String,
                          broadcastRows: Long = 10000L): DataFrame = {
    require(broadcastRows >= 1, s"need broadcastRows >= 1; got $broadcastRows")
    def advise(label: String, left: DataFrame, lk: String,
               right: DataFrame, rk: String): DataFrame =
      adviseJoin(label, left, lk, right, rk, broadcastRows)
    advise("lineitem*orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey")
      .unionByName(advise("orders*customer", Tables.orders(spark, dir),
        "o_custkey", Tables.customer(spark, dir), "c_custkey"))
      .unionByName(advise("lineitem*part", Tables.lineitem(spark, dir),
        "l_partkey", Tables.part(spark, dir), "p_partkey"))
      .unionByName(advise("customer*nation", Tables.customer(spark, dir),
        "c_nationkey", Tables.nation(spark, dir), "n_nationkey"))
  }

  /** The single-join advisor core (exposed for the planted spec). */
  private[graft] def adviseJoin(label: String, left: DataFrame, lk: String,
                                right: DataFrame, rk: String,
                                broadcastRows: Long = 10000L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    def side(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).cast("long").as("k"))
        .agg(count(lit(1)).as("cnt"))
    locally {
      // ONE full-outer join of the two key-grain count relations computes
      // every advisor statistic in a single aggregate — the pre-r22 form
      // spilled both sides and ran three separate aggregates (per-side
      // totals + the matched-keys join) stitched back with crossJoins:
      // 5 jobs and 2 scratch round-trips per advised pair, for numbers
      // one pass over the same rows already determines
      val l = side(left, lk).withColumnRenamed("cnt", "lcnt")
      val r = side(right, rk).withColumnRenamed("cnt", "rcnt")
      l.join(r, Seq("k"), "full_outer")
        .agg(
          coalesce(sum(col("lcnt")), lit(0L)).as("n_left"),
          count(col("lcnt")).as("n_left_keys"),
          max(col("lcnt")).as("l_max"),
          coalesce(sum(col("rcnt")), lit(0L)).as("n_right"),
          count(col("rcnt")).as("n_right_keys"),
          max(col("rcnt")).as("r_max"),
          count(when(col("lcnt").isNotNull && col("rcnt").isNotNull, 1))
            .as("n_matched_keys"),
          coalesce(sum(when(col("rcnt").isNotNull, col("lcnt"))), lit(0L))
            .as("n_matched_left"))
        .withColumn("build_side",
          when(col("n_right") <= col("n_left"), "right").otherwise("left"))
        .withColumn("strategy",
          when(least(col("n_left"), col("n_right")) <= broadcastRows,
            "broadcast").otherwise("shuffle"))
        // skew is priced on the PROBE side (the one that shuffles whole)
        .withColumn("probe_max",
          when(col("build_side") === "right", col("l_max")).otherwise(col("r_max")))
        .withColumn("probe_rows",
          when(col("build_side") === "right", col("n_left")).otherwise(col("n_right")))
        .withColumn("probe_keys",
          when(col("build_side") === "right", col("n_left_keys"))
            .otherwise(col("n_right_keys")))
        .select(lit(label).as("join_label"),
          col("n_left"), col("n_right"),
          col("n_left_keys"), col("n_right_keys"),
          col("n_matched_keys"), col("n_matched_left"),
          col("build_side"), col("strategy"),
          round((col("probe_max").cast("double") * col("probe_keys")
            / col("probe_rows")).cast(dec), 6).cast("double").as("skew_ratio"))
    }
  }

  /** A45 [EXT] — TABLE STATISTICS COLLECTION (ANALYZE): the cost-based-
    * optimizer's food — per (table, column): row count, null count, exact
    * NDV, min/max (cast to string AFTER the typed min/max, so integer
    * order is numeric, never lexicographic), and the mean value width —
    * the statistics q186's advisor and every CBO join reorder consume.
    * NDV is EXACT on purpose: the audited-approximation discipline (q10)
    * needs a ground truth to audit against, and a stats table feeding
    * broadcast decisions mis-sized by an HLL error band defeats its
    * point. Columns audited: the engine's own join/rollup keys.
    *
    * Scale: ONE scan per table computes every column's aggregates
    * (multiple exact distincts share the scan through Spark's expand —
    * one pass, k× shuffle rows for k columns); the per-column rows
    * unstack from the single wide aggregate row. At 100 TB this is the
    * overnight ANALYZE job, run per snapshot, not per query.
    */
  /** The audited (table, columns) set: the engine's own join and rollup
    * keys. */
  val DefaultStatsSpecs: Seq[(String, Seq[String])] = Seq(
    // o_orderkey / c_custkey joined r17: the join-ORDER consumer (q226)
    // prices intermediate cardinalities from PK-side ndv too;
    // c_nationkey / n_nationkey feed the q230 chain enumerator's last edge
    "orders" -> Seq("o_custkey", "o_orderstatus", "o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "documents" -> Seq("lang", "source"),
    "customer" -> Seq("c_mktsegment", "c_custkey", "c_nationkey"),
    "nation" -> Seq("n_nationkey"),
    "events" -> Seq("event_type"),
    // p_partkey / s_suppkey joined r18: the join-GRAPH enumerator (q245)
    // prices the star's part/supplier edges from the store;
    // s_nationkey feeds the CYCLIC (Q5-shaped) enumerator's N–S edge
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"))

  def tableStats(spark: SparkSession, dir: String,
                 specs: Seq[(String, Seq[String])] = DefaultStatsSpecs): DataFrame = {
    require(specs.nonEmpty && specs.forall(_._2.nonEmpty), "need columns per table")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    specs.map { case (t, cols) =>
      val wide = Tables.table(spark, dir, t).agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap { c =>
          Seq(sum(col(c).isNull.cast("long")).as(s"nn_$c"),
            countDistinct(col(c)).as(s"ndv_$c"),
            min(col(c)).cast("string").as(s"min_$c"),
            max(col(c)).cast("string").as(s"max_$c"),
            round(avg(length(col(c).cast("string"))).cast(dec), 6)
              .cast("double").as(s"len_$c"))
        }: _*)
      // one row per column EXPLODED from the single aggregate row — the
      // former per-column `wide.select(...)` union re-planned (and
      // re-executed: no exchange reuse fires across Union branches) the
      // full table aggregate once per audited column
      wide.select(explode(array(cols.map { c =>
        struct(lit(t).as("table_name"), lit(c).as("column_name"),
          col("n_rows"), col(s"nn_$c").as("n_nulls"), col(s"ndv_$c").as("ndv"),
          col(s"min_$c").as("min_val"), col(s"max_$c").as("max_val"),
          col(s"len_$c").as("avg_width"))
      }: _*)).as("s")).select(col("s.*"))
    }.reduce(_.unionByName(_))
  }

  /** A46 [EXT] — EQUI-DEPTH COLUMN HISTOGRAMS: ANALYZE's second course —
    * per audited numeric column, the quartile boundary VALUES plus
    * min/max, i.e. the 4-bucket equi-height histogram Spark's own
    * `ANALYZE ... FOR COLUMNS` persists for CBO selectivity. Boundaries
    * are RANK-selected (the value at rank ⌈p·n⌉ — q57's exact-selection
    * discipline), never interpolated: interpolation's (1−f)a+fb differs
    * in the last ulp across engines, rank selection is bit-identical.
    *
    * Scale: one map-side-combined (value → count) aggregate per column;
    * the cumulative window runs over the DISTINCT-VALUE relation, which
    * is value-domain-bounded for these columns (2-decimal money,
    * integral quantities) — the q57 bounded-window argument, global
    * instead of per-language. Never a corpus-width sort.
    */
  def columnHistograms(spark: SparkSession, dir: String,
                       ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1), s"need 0<p<1; got $ps")
    import org.apache.spark.sql.expressions.Window
    val specs: Seq[(String, String, DataFrame)] = Seq(
      ("orders", "o_totalprice", Tables.orders(spark, dir)),
      ("lineitem", "l_quantity", Tables.lineitem(spark, dir)),
      ("customer", "c_acctbal", Tables.customer(spark, dir)))
    specs.map { case (t, c, df) =>
      val hist = graft.sources.Sources.spillScratch(
        df.select(col(c).cast("double").as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("cnt")),
        "hist")
      val cum = hist
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
        .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
      val ends = hist.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        .select(lit(0.0).as("p"), col("mn").as("value"))
        .unionByName(hist.agg(max(col("v")).as("value"))
          .select(lit(1.0).as("p"), col("value")))
      val quantiles = ps.map { p =>
        cum.filter(col("cum") >= ceil(col("n") * p))
          .agg(min(col("v")).as("value"))
          .select(lit(p).as("p"), col("value"))
      }.reduce(_.unionByName(_))
      ends.unionByName(quantiles)
        .select(lit(t).as("table_name"), lit(c).as("column_name"),
          col("p"), col("value"))
    }.reduce(_.unionByName(_))
  }

  /** A37 [EXT] — SHUFFLE-SKEW AUDIT: per candidate shuffle key, the
    * statistics that decide between a plain shuffle, AQE skew-join, and
    * explicit salting BEFORE the job runs — the planning query behind
    * every "why is one task still running" incident at 100 TB. Per key:
    * row count, distinct keys, the heaviest key's count and share, the
    * max/mean ratio (the number of salt buckets the hot key needs), and
    * the decision flag at `saltRatio`. Keys audited: the engine's own
    * big-join and hot-aggregation keys (lineitem⋈orders on l_orderkey,
    * orders⋈customer on o_custkey, the q30-family event user grain, the
    * per-source document rollup grain).
    *
    * Scale: ONE map-side-combined count per key column (the same
    * aggregate the real shuffle would do, minus the payload), then
    * key-cardinality-sized stats. Everything exact — a skew decision
    * made from a sample misses exactly the key that matters.
    */
  def shuffleSkewAudit(spark: SparkSession, dir: String,
                       saltRatio: Double = 10.0): DataFrame = {
    def ks(df: DataFrame, keyCol: String, label: String) =
      shuffleSkewStatsFor(df, keyCol, label, saltRatio)
    ks(Tables.lineitem(spark, dir), "l_orderkey", "lineitem.l_orderkey")
      .unionByName(ks(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
      .unionByName(ks(Tables.events(spark, dir), "user_id", "events.user_id"))
      .unionByName(ks(Tables.documents(spark, dir), "source", "documents.source"))
  }

  private[graft] def shuffleSkewStatsFor(df: DataFrame, keyCol: String,
                                         label: String,
                                         saltRatio: Double = 10.0): DataFrame = {
    require(saltRatio > 1.0, s"need saltRatio > 1; got $saltRatio")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_key_rows"))
      .select(lit(label).as("shuffle_key"), col("n_rows"), col("n_keys"),
        col("max_key_rows"),
        round((col("max_key_rows").cast("double") / col("n_rows")).cast(dec), 6)
          .cast("double").as("top_share"),
        round((col("max_key_rows").cast("double") * col("n_keys")
          / col("n_rows")).cast(dec), 6).cast("double").as("skew_ratio"))
      .withColumn("salt_recommended", col("skew_ratio") >= saltRatio)
  }

  /** A34 [EXT] — QUANTILE-SKETCH AUDIT: the q10/q145/q154 approx-vs-exact
    * invariant discipline applied to `percentile_approx` — the sketch
    * every corpus-stats job at 100 TB actually runs (one pass, fixed-size
    * Greenwald–Khanna state per group, vs exact percentile's per-group
    * sort buffer). Per source over the document length distribution:
    * exact p50/p95 (DuckDB-recomputable: `quantile_cont` shares Spark
    * `percentile`'s (n−1)·q interpolation), plus per-quantile flags
    * checking the GK RANK guarantee — the rank of the sketch's answer
    * must sit within ε·N (+1 for tie/ceiling slack) of the target rank,
    * ε = 1/accuracy. PINNED true: that bound is the sketch's published
    * contract under ANY merge order, so it is partition-shuffle-proof —
    * a violation means a broken sketch, never an unlucky run (the same
    * "any order" reasoning that makes q133's bottom-k streaming sample
    * deterministic). The VALUE-space error is deliberately not banded:
    * GK guarantees nothing about it on skewed data.
    *
    * Scale: the narrow (source, len) projection spills once (two
    * consumers: the aggregate pass and the rank-of-answer pass — the
    * q88/q123 leaf discipline); both passes are map-side-combined aggs
    * on the \|sources\| key; the rank join broadcasts the
    * \|sources\|-row answer table.
    */
  def quantileSketchAudit(spark: SparkSession, dir: String,
                          accuracy: Int = 1000): DataFrame = {
    val d = graft.sources.Sources.spillScratch(
      Tables.documents(spark, dir)
        .select(col("source"), length(col("text")).cast("long").as("len")),
      "qsketch_len")
    // rounding rides through DECIMAL(38,18) like risk_frac/top_share in
    // this file: plain double round() is half-up in Spark but half-even in
    // DuckDB at exact 6dp halves (unreachable for ≤2-decimal interpolated
    // length quantiles today, but the discipline is uniform on purpose)
    val decR = org.apache.spark.sql.types.DecimalType(38, 18)
    val agg = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      round(expr("percentile(len, 0.5)").cast(decR), 6).cast("double").as("p50_exact"),
      round(expr("percentile(len, 0.95)").cast(decR), 6).cast("double").as("p95_exact"),
      expr(s"approx_percentile(len, 0.5, $accuracy)").as("p50_approx"),
      expr(s"approx_percentile(len, 0.95, $accuracy)").as("p95_approx"))
    // lengths repeat heavily, so the sketch's answer occupies a rank RANGE
    // [count(len < v) + 1, count(len <= v)]; the guarantee holds iff that
    // range intersects [q·N − ε·N, q·N + ε·N]
    val ranks = d.join(broadcast(agg.select(col("source"),
        col("p50_approx"), col("p95_approx"))), "source")
      .groupBy(col("source")).agg(
        sum(when(col("len") < col("p50_approx"), 1L).otherwise(0L)).as("lo50"),
        sum(when(col("len") <= col("p50_approx"), 1L).otherwise(0L)).as("hi50"),
        sum(when(col("len") < col("p95_approx"), 1L).otherwise(0L)).as("lo95"),
        sum(when(col("len") <= col("p95_approx"), 1L).otherwise(0L)).as("hi95"))
    def okFlag(lo: Column, hi: Column, q: Double, n: Column): Column = {
      val target = n.cast("double") * q
      val tol = n.cast("double") / accuracy + 1.0
      (lo + 1.0 <= target + tol) && (hi >= target - tol)
    }
    agg.join(ranks, "source")
      .select(col("source"), col("n_docs"), col("p50_exact"), col("p95_exact"),
        okFlag(col("lo50"), col("hi50"), 0.5, col("n_docs")).as("p50_ok"),
        okFlag(col("lo95"), col("hi95"), 0.95, col("n_docs")).as("p95_ok"))
  }

  /** §2.8 top-k per group — row_number window with a total order
    * (totalprice desc, orderkey tiebreak → deterministic under ties).
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
  }

  /** §2.8 analytic window functions — lag/lead/rank/dense_rank over the
    * event log: per-user inter-event gaps (lag/lead over the event-time
    * order, event_id tiebreak → deterministic under equal timestamps) and
    * per-user value ranking (rank/dense_rank over value alone, so ties
    * share a rank — adding a tiebreak would collapse rank to row_number).
    *
    * Scale shape: ONE hash partition on user_id feeds both window specs —
    * the second Window re-sorts within partitions (value desc vs ts) but
    * never re-shuffles, since partitioning is identical; at 100 TB the
    * cost is two in-partition sorts over one exchange. Ranks are cast to
    * long so the engine-independent contract (DuckDB emits BIGINT) is the
    * declared schema, not an accident of Spark's int ranks.
    */
  def analyticEventWindows(spark: SparkSession, dir: String): DataFrame = {
    val byTime  = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byValue = Window.partitionBy(col("user_id")).orderBy(col("value").desc)
    Tables.events(spark, dir).select(
      col("user_id"), col("event_id"),
      (unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(byTime)))
        .as("gap_ms"),
      (unix_millis(lead(col("ts"), 1).over(byTime)) - unix_millis(col("ts")))
        .as("next_gap_ms"),
      rank().over(byValue).cast("long").as("value_rank"),
      dense_rank().over(byValue).cast("long").as("value_dense_rank"))
  }

  /** §2.8 frame-based window aggregates — ROWS BETWEEN frames over the
    * event log: per-user 3-event moving average and running sum/count,
    * the sessionless trend/cumulation shapes of event analytics. Both
    * frames share one partitioning AND one ordering (ts, event_id total
    * order), so Catalyst folds them into a single Window operator: one
    * exchange, one sort, both aggregates in one pass (PlanSpec-pinned).
    * Sums are rounded at 2dp (running sums reach ~5e4; IEEE association
    * differences sit at ~1e-11, far inside the rounding), the 3-row
    * moving average at 4dp — the q30 parity discipline applied to frames.
    */
  def frameEventWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val last3 = w.rowsBetween(-2, Window.currentRow)
    val toHere = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir).select(
      col("user_id"), col("event_id"),
      round(avg(col("value")).over(last3), 4).as("moving_avg3"),
      round(sum(col("value")).over(toHere), 2).as("running_sum"),
      count(lit(1)).over(toHere).as("running_n"))
  }

  /** §2.4 hierarchical aggregation — ROLLUP over (returnflag, linestatus)
    * with grouping() flags disambiguating genuine NULL keys from subtotal
    * rows. Spark plans rollup (and cube — same machinery) as ONE Expand +
    * one hash aggregate: each input row fans out to its grouping sets
    * before the single shuffle, so the subtotal levels cost one pass over
    * the fact table, not one scan per level.
    */
  def rollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"))

  /** §2.4 CUBE over (orderstatus, orderpriority) — all four grouping
    * levels (both, each alone, grand total) from the same single Expand +
    * hash aggregate as [[rollupPricing]]'s rollup; the fact table is
    * scanned once however many subtotal levels the cube adds. Money sums
    * run on DECIMAL per the q13 discipline (binary double sums of 2dp
    * values round differently per engine; decimal sums are exact in
    * both), then surface as double.
    */
  def cubeOrderStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))

  /** §2.4 GROUPING SETS — the general form rollup/cube are sugar for:
    * exactly the declared set list ((status), (priority)) — each
    * dimension's marginal WITHOUT the combined or grand-total levels a
    * cube would force. Same one-Expand machinery: input rows fan out to
    * 2 copies instead of the cube's 4, so a set list is CHEAPER than the
    * cube it prunes, not just smaller output.
    */
  def groupingSetsOrderStats(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_priority"))

  /** §2.4 pivot — long-to-wide conditional aggregation: per-user event
    * counts, one column per event type. The pivot values are DECLARED
    * (the fixture's closed event-type vocabulary), which skips the
    * extra distinct-values job Spark otherwise runs before planning —
    * at 100 TB an unbounded pivot is a driver-side cardinality hazard,
    * a declared one is a single groupBy. Missing combinations are 0, not
    * null (na.fill), matching the conditional-count SQL semantics.
    */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  /** Global sort + limit with total order. */
  def topOrdersGlobal(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** P1/P5/P8 + scalar math — per-row projection with casts; pushdown-
    * friendly (filter + pruned columns reach the parquet scan).
    *
    * Money arithmetic runs on DECIMAL: the source doubles carry ≤2 decimal
    * digits, so casting each operand to DECIMAL(12,2) recovers the exact
    * decimal value in every engine, the products are exact, and round(_, 2)
    * is engine-independent — double-rounding half-cent values is not
    * (Spark rounds the shortest decimal rendering, DuckDB the binary value).
    */
  def projectScalar(spark: SparkSession, dir: String): DataFrame = {
    def money(c: Column): Column = c.cast("decimal(12,2)")
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 30.0 && col("l_returnflag") === "R")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        round(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount")))
          * (lit(1) + money(col("l_tax"))), 2)
          .cast("double").as("charged"),
        (col("l_discount") > 0.05).as("high_discount"))
  }

  /** Bucketed co-located join (SURVEY §4.3 partitioning row; the 100 TB
    * fact-⋈-fact answer): both sides are written bucketed AND sorted by
    * the join key, so the sort-merge join reads co-located buckets with
    * ZERO exchange — the only shuffle left in the query is the final
    * aggregation's. At scale this is the difference between re-shuffling
    * two multi-TB tables per query and paying the layout cost once at
    * ingest; the spec asserts the executed plan contains exactly one
    * Exchange. Bucket count is 8 here (fixture-sized); at 100 TB you size
    * buckets to ~128-256 MB each.
    */
  /** Memo of which source dir each session's bucketed layout was built
    * from: layout is INGEST cost, paid once per session+dir, not per query
    * — re-running the query (or benching it) measures the shuffle-free
    * join, which is the point of the layout. Table names carry the session
    * UUID so concurrent sessions never race on one warehouse directory.
    */
  private val bucketedLayoutFor = scala.collection.mutable.Map.empty[String, String]

  /** Builds (once per session+dir) the bucketed+sorted orders/lineitem
    * layout and returns the two table names. */
  def ensureBucketedLayout(spark: SparkSession, dir: String, nBuckets: Int = 8): (String, String) =
    synchronized {
      val sfx = graft.sources.Sources.sessionTag(spark)
      // nBuckets is part of the table NAME, not just the memo key: two
      // bucket counts in one session must never overwrite each other's
      // tables while their memo entries both claim to be built
      val oName = s"graft_orders_b${nBuckets}_$sfx"
      val lName = s"graft_lineitem_b${nBuckets}_$sfx"
      val key = s"$sfx|$nBuckets"
      if (!bucketedLayoutFor.get(key).contains(dir)) {
        graft.sources.Sources.resetWarehouseTable(spark, oName)
        graft.sources.Sources.resetWarehouseTable(spark, lName)
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(oName)
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(lName)
        bucketedLayoutFor(key) = dir
      }
      (oName, lName)
    }

  def bucketedJoinRevenue(spark: SparkSession, dir: String, nBuckets: Int = 8): DataFrame = {
    val (oName, lName) = ensureBucketedLayout(spark, dir, nBuckets)
    spark.table(lName)
      .join(spark.table(oName).filter(col("o_orderstatus") =!= "P"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
  }

  /** Salted skew join (SURVEY §4.3 / the "hot key" answer when AQE's
    * runtime skew-split can't apply, e.g. for non-sort-merge joins or
    * pre-AQE planning): the events fixture concentrates millions of rows
    * on ~15 user_ids, so a plain shuffle join puts whole keys on single
    * tasks. The fact side gets a deterministic salt (event_id mod nSalt),
    * the dim side is exploded ×nSalt, and the join key becomes
    * (user_id, salt) — spreading each hot key over nSalt tasks. Salting is
    * a pure plan transform: the oracle checks the result equals the
    * unsalted join's.
    */
  def saltedSkewJoin(spark: SparkSession, dir: String, nSalt: Int = 8): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("salt", pmod(col("event_id"), lit(nSalt.toLong)))
    val dim = Tables.events(spark, dir).select(col("user_id")).distinct()
      .withColumn("tier", (col("user_id") % 3).cast("long"))
    val saltedDim = dim.withColumn("salt", explode(sequence(lit(0L), lit(nSalt - 1L))))
    ev.join(saltedDim, Seq("user_id", "salt"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
  }

  /** Interval (range) join, bucketed-equi-join form (SURVEY §2.3 J3's
    * "range join" word; the attribution join every event pipeline runs):
    * for each `click`, count the same user's `view` events in the
    * preceding `windowMs`. A naive inequality join plans as a nested-loop
    * over the user's full history — quadratic per user and un-pushable.
    * The scale form quantizes time into windowMs buckets and turns the
    * range predicate into an EQUI-join on (user_id, bucket): each view
    * lands in its own bucket, each click probes its bucket and the
    * previous one (two rows — any interval of length windowMs spans at
    * most 2 buckets), and the exact range filter then prunes within the
    * ≤2-bucket candidates. The quadratic blowup is bounded per
    * (user, bucket) instead of per user, shuffles hash-partition on the
    * composite key, and the same pattern handles any as-of/interval join
    * at 100 TB. Bucket arithmetic is integer `div` — `/` promotes to
    * double, whose rounding can misplace boundary timestamps.
    */
  def intervalJoinCounts(spark: SparkSession, dir: String,
                         windowMs: Long = 1800000L): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    def bucket(c: Column): Column = call_function("div", c, lit(windowMs))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms").as("click_ms"))
      .withColumn("bucket",
        explode(array(bucket(col("click_ms")), bucket(col("click_ms")) - 1)))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ms").as("view_ms"),
        bucket(col("ms")).as("bucket"))
    clicks.join(views, Seq("user_id", "bucket"))
      .filter(col("view_ms") >= col("click_ms") - windowMs
        && col("view_ms") < col("click_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** [EXT] AS-OF join (SURVEY §2.3 J5; the "latest state at time t" join
    * every event/attribution pipeline runs): for each left row, attach the
    * payload of the LATEST right row with the same key strictly before it
    * in (time, tie) order; left rows with no prior right row keep a null
    * payload. `tie` must be unique across both inputs (the fixture's
    * event_id is) so the order — and therefore the match — is total and
    * deterministic even under equal timestamps.
    *
    * Scale shape: the naive plan is an inequality join — a per-key
    * nested loop, quadratic in the key's history and un-pushable. This
    * form instead UNION-tags the two inputs, hash-partitions ONCE on the
    * key, sorts each partition by (time, tie), and takes
    * `last(payload, ignoreNulls)` over the rows-preceding frame: one
    * Exchange + one sort + one Window regardless of how many right rows
    * precede each left row. Spark evaluates `last` over the growing
    * frame incrementally (DeclarativeAggregate), so a partition costs
    * O(rows), not O(rows²). Skew is bounded by the hottest key's history
    * — the same exposure as any per-key window, salt-able if a key is
    * genuinely pathological.
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, time: String, tie: String,
               leftPayload: Seq[String], rightPayload: Seq[String]): DataFrame = {
    val coord = Seq(key, time, tie)
    // payload columns that are coordinates already ride in the prefix
    val lStruct = struct((coord ++ leftPayload.filterNot(coord.contains)).map(col): _*)
    val rStruct = struct((coord ++ rightPayload.filterNot(coord.contains)).map(col): _*)
    val l = left.select(col(key), col(time), col(tie), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r"))
    val r = right.select(col(key), col(time), col(tie), lit(0).as("__side"),
      lit(null).cast(left.select(lStruct).schema.head.dataType).as("__l"), rStruct.as("__r"))
    // frame ends at -1: the match must be STRICTLY before the left row,
    // and right rows tie-ranked below a left row at equal time are still
    // admitted because `tie` uniqueness makes (time, tie) a total order
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tie))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l"), col("__m"))
  }

  /** q74 — purchase→view attribution via [[asOfJoin]]: each purchase event
    * matched to the same user's latest strictly-preceding view, with the
    * elapsed gap in ms (null when the user never viewed before buying).
    * Values pass through unrounded — they are stored doubles, not
    * recomputed floats, so both engines emit the identical bits.
    */
  def asOfPurchaseViews(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val joined = asOfJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "view"),
      key = "user_id", time = "ts", tie = "event_id",
      leftPayload = Seq("value"), rightPayload = Seq("event_id", "value"))
    joined.select(
      col("__l.event_id").as("purchase_id"),
      col("__l.user_id").as("user_id"),
      col("__l.value").as("purchase_value"),
      col("__m.event_id").as("view_id"),
      col("__m.value").as("view_value"),
      (unix_millis(col("__l.ts")) - unix_millis(col("__m.ts"))).as("gap_ms"))
  }

  /** P2/P3/P6/P7 — string surface on documents: concat path-prefix
    * (reference /root/reference/src/preprocessing_pipeline.py:265-268),
    * literal replace (/root/reference/src/federated_learning_pipeline.py:31),
    * split+size (/root/reference/src/preprocessing_pipeline.py:145),
    * name-flattening regexp_replace (SURVEY §7.4 item 2).
    */
  def projectStrings(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        concat(lit("corpus/"), col("source"), lit("/"), col("doc_id").cast("string"), lit(".txt"))
          .as("path"),
        regexp_replace(
          concat(lit("corpus/"), col("source"), lit("/"), col("doc_id").cast("string"), lit(".txt")),
          "/", "_").as("flat_name"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_computed"),
        upper(col("lang")).as("lang_uc"))

  /** A48 [EXT] — RFM CUSTOMER SEGMENTATION: the classic recency /
    * frequency / monetary quartile scoring over orders (nearest
    * reference analog: the per-customer aggregation grain of
    * /root/reference/src/data_analysis.py revenue rollups). Per
    * customer: recency = days from the corpus' own max order date
    * (data-derived anchor, the q175 discipline) to their last order;
    * frequency = order count; monetary = lifetime spend in CENTS
    * (BIGINT — a double sum would put quartile boundaries at the mercy
    * of fp association order). Scores 1–4 by comparison against the
    * exact interpolated quartiles of each measure — THRESHOLDS, not
    * ntile: a 9-value broadcast instead of a single-partition global
    * sort, so scoring is one map-side comparison per row. The cut
    * source is a knob (the q57/q166 precedent): `exactQuartiles=true`
    * (default, the oracle row) pays the exact `percentile` — a
    * single-group sort aggregate whose state is ALL values, fine at
    * audit scale; `exactQuartiles=false` is the declared 100 TB route —
    * `approx_percentile` (GK sketch, bounded state, mergeable
    * partials) feeding the IDENTICAL broadcast-cut comparison.
    * Interpolated quartiles of integers are dyadic-exact in both
    * engines, so the exact cut comparison is deterministic; the spec
    * pins exact ≡ approx on a fixture whose quartile ranks are
    * integral (cuts land ON order statistics, where both routes
    * agree). Output per (r,f,m) segment cell (≤64 rows): customer
    * count, mean recency/frequency (6dp through DECIMAL), total spend
    * in cents.
    */
  def rfmSegments(spark: SparkSession, dir: String,
      exactQuartiles: Boolean = true): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    // anchor: ONE metadata-cheap max, broadcast as a literal. Collected
    // as a STRING, not DateType: the java.sql.Date row decode runs
    // through a reflective static_invoke(DateTimeUtils.toJavaDate) that
    // flaked EXPRESSION_DECODING_FAILED once in a long 200-query sweep
    // JVM; the string path has no reflective decode surface.
    val anchor = java.sql.Date.valueOf(
      o.agg(max(col("d")).cast("string")).head().getString(0))
    // customer grain spills ONCE (the q88 leaf discipline) for its two
    // consumers: the quartile agg and the scoring scan
    val cust = graft.sources.Sources.spillScratch(
      o.groupBy(col("o_custkey"))
        .agg(datediff(lit(anchor), max(col("d"))).cast("long").as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(col("cents")).as("monetary_cents")),
      "rfm_cust")
    // both routes surface the cuts as doubles so the scoring scan is
    // byte-identical regardless of cut source
    def cut(c: Column, p: Double): Column =
      if (exactQuartiles) percentile(c, lit(p))
      else percentile_approx(c, lit(p), lit(100000)).cast("double")
    val qs = cust.agg(
      cut(col("recency_days"), 0.25).as("r1"),
      cut(col("recency_days"), 0.5).as("r2"),
      cut(col("recency_days"), 0.75).as("r3"),
      cut(col("frequency"), 0.25).as("f1"),
      cut(col("frequency"), 0.5).as("f2"),
      cut(col("frequency"), 0.75).as("f3"),
      cut(col("monetary_cents"), 0.25).as("m1"),
      cut(col("monetary_cents"), 0.5).as("m2"),
      cut(col("monetary_cents"), 0.75).as("m3")).head()
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    // recency: smaller = better; frequency/monetary: larger = better
    val rScore = (lit(1L) + flag(col("recency_days") < qs.getDouble(0)) +
      flag(col("recency_days") < qs.getDouble(1)) +
      flag(col("recency_days") < qs.getDouble(2))).as("r_score")
    val fScore = (lit(1L) + flag(col("frequency") > qs.getDouble(3)) +
      flag(col("frequency") > qs.getDouble(4)) +
      flag(col("frequency") > qs.getDouble(5))).as("f_score")
    val mScore = (lit(1L) + flag(col("monetary_cents") > qs.getDouble(6)) +
      flag(col("monetary_cents") > qs.getDouble(7)) +
      flag(col("monetary_cents") > qs.getDouble(8))).as("m_score")
    cust.groupBy(rScore, fScore, mScore)
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("recency_days")).cast(dec), 6).cast("double")
          .as("avg_recency_days"),
        round(avg(col("frequency")).cast(dec), 6).cast("double")
          .as("avg_frequency"),
        sum(col("monetary_cents")).as("monetary_cents"))
  }

  // --- Optimizer-statistics consumers (q207/q208) ------------------------
  //
  // A45 collects table stats (q189) and A46 builds the equi-depth
  // histograms (q190); these two rows are the CONSUMER side of that
  // loop — the estimates a cost-based planner derives from those stats,
  // audited against ground truth so the statistics pipeline's real
  // deliverable (estimates you can trust enough to pick a plan) is a
  // measured number, not an assumption. Everything is exact integer
  // arithmetic (scaled-ppm fixed point via `div`, never `/`), so both
  // the estimator AND the ground truth are DuckDB-re-derivable.

  /** Integer division (truncation — both engines agree on non-negative
    * operands, unlike `/` which floats). */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** A52 [EXT] — SELECTIVITY-ESTIMATION AUDIT (q207): build a B-bucket
    * equi-depth histogram per audited column (bucket = row-mass rank of
    * the distinct value: `(cum−1)·B div n` over the value-grain
    * cumulative counts — the q190 ANALYZE cost shape, value-domain
    * window, run per snapshot not per query), then estimate a sweep of
    * range predicates by uniform-within-bucket interpolation
    * (`cnt_b · div(overlap·10^6, span)` — div-first keeps every
    * intermediate under 2^63 at any SF, identically in both engines)
    * and compare with the EXACT row count of each predicate. Output per
    * (column, predicate): the range, actual rows, the estimate in
    * millionths of a row, and the relative error in ppm — the number
    * that says whether the histogram is good enough to pick plans with.
    *
    * Scale: the histogram build is one map-side-combined value-count +
    * a distinct-value-grain window (the declared ANALYZE cost, A46);
    * the estimator itself is |buckets|·|predicates|-sized — the whole
    * point of statistics is that estimation never touches the data. The
    * actual side (one scan evaluating all predicates) is the audit's
    * honest price, paid only when auditing.
    */
  /** B-bucket equi-depth histogram of `rel`'s single column `v`: bucket
    * = row-mass rank of the distinct value (the A46 ANALYZE cost shape —
    * a distinct-value-grain window, per snapshot not per query). */
  private[graft] def equiDepthBuckets(rel: DataFrame, nBuckets: Int,
                                      tag: String): DataFrame =
    bucketsFromCounts(graft.sources.Sources.spillScratch(
      rel.groupBy(col("v")).agg(count(lit(1)).as("cnt")), s"selhist_$tag"),
      nBuckets)

  /** The equi-depth fold over an already-counted (v, cnt) relation —
    * shared by the plain histogram and q215's rest-of-tail histogram. */
  private[graft] def bucketsFromCounts(vals: DataFrame,
                                       nBuckets: Int): DataFrame =
    vals
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("v"))))
      .withColumn("bucket",
        idiv((col("cum") - col("cnt")) * lit(nBuckets.toLong), col("n")))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("b_lo"), max(col("v")).as("b_hi"),
        sum(col("cnt")).as("b_cnt"))

  /** The 100 TB route for `equiDepthBuckets` (the q197 knob discipline —
    * a documented mitigation must be CODE): bucket boundaries from ONE
    * `approx_percentile` pass (mergeable sketch, no global window), then
    * one map-side-combined groupBy for each bucket's [min, max, count].
    * Bucket populations are approximately equi-depth (the sketch's
    * accuracy), but the zone stats the ESTIMATOR consumes — each
    * bucket's true min/max/count — stay EXACT, so estimates degrade only
    * through boundary placement, never through wrong counts. */
  private[graft] def equiDepthBucketsApprox(rel: DataFrame,
                                            nBuckets: Int): DataFrame = {
    require(nBuckets >= 2,
      s"equi-depth needs >= 2 buckets (1 would build an empty percentile " +
        s"array); got $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val row = rel.agg(expr(
      s"approx_percentile(v, array(${ps.mkString(",")}), 10000)")).head()
    // empty input: approx_percentile returns NULL — degrade to a single
    // full-domain bucket (which over an empty relation is no buckets)
    val cuts = if (row.isNullAt(0)) Seq.empty[Long] else row.getSeq[Long](0)
    val bucketExpr = cuts.foldLeft(lit(0L)) { (acc, c) =>
      acc + when(col("v") > c, 1L).otherwise(0L)
    }
    rel.groupBy(bucketExpr.as("bucket"))
      .agg(min(col("v")).as("b_lo"), max(col("v")).as("b_hi"),
        count(lit(1)).as("b_cnt"))
  }

  /** Session-shared equi-depth histogram of lineitem.l_orderkey — the
    * key five CBO consumers price range predicates against (q232 filter-
    * aware order, q246 route audit, q247 capstone, q256/q259 planned
    * queries). Each rebuilt the identical |buckets|-row table per
    * invocation through a corpus groupBy + global-window fold + spill;
    * the fold is deterministic, so one build per session serves all (the
    * ANALYZE-leaf discipline — a histogram is snapshot state, not
    * per-query work). Consumers read a |buckets|-row parquet. */
  private[graft] def ensureLiKeyHist(spark: SparkSession, dir: String,
                                     nBuckets: Int = 16): DataFrame = {
    val root = graft.sources.Sources.ensureStore(spark, "likhist",
        s"$dir|$nBuckets") { p =>
      equiDepthBuckets(Tables.lineitem(spark, dir)
          .select(col("l_orderkey").cast("long").as("v")), nBuckets, "likhist")
        .write.mode("overwrite").parquet(p)
    }
    spark.read.schema("bucket BIGINT, b_lo BIGINT, b_hi BIGINT, b_cnt BIGINT")
      .parquet(root)
  }

  /** The SAMPLED twin (1/mod key partition, counts scaled ×mod before the
    * fold — q246/q247's cheap-build arm), same session-leaf discipline. */
  private[graft] def ensureLiKeyHistSampled(spark: SparkSession, dir: String,
                                            mod: Long,
                                            nBuckets: Int = 16): DataFrame = {
    val root = graft.sources.Sources.ensureStore(spark, "likhistsamp",
        s"$dir|$mod|$nBuckets") { p =>
      bucketsFromCounts(graft.sources.Sources.spillScratch(
          Tables.lineitem(spark, dir)
            .select(col("l_orderkey").cast("long").as("v"))
            .filter(pmod(col("v"), lit(mod)) === 0L)
            .groupBy(col("v")).agg((count(lit(1)) * lit(mod)).as("cnt")),
          "likhistsamp"), nBuckets)
        .write.mode("overwrite").parquet(p)
    }
    spark.read.schema("bucket BIGINT, b_lo BIGINT, b_hi BIGINT, b_cnt BIGINT")
      .parquet(root)
  }

  /** [[ensureLiKeyHist]] generalized to a named derived expression over
    * lineitem — the q207/q212 estimator audits' deterministic histogram
    * inputs (the expression is part of the session key). */
  private[graft] def ensureLiExprHist(spark: SparkSession, dir: String,
                                      name: String, expr0: => Column,
                                      nBuckets: Int = 16): DataFrame = {
    val root = graft.sources.Sources.ensureStore(spark, "lixhist",
        s"$dir|$name|$nBuckets") { p =>
      equiDepthBuckets(Tables.lineitem(spark, dir).select(expr0.as("v")),
          nBuckets, name)
        .write.mode("overwrite").parquet(p)
    }
    spark.read.schema("bucket BIGINT, b_lo BIGINT, b_hi BIGINT, b_cnt BIGINT")
      .parquet(root)
  }

  /** Domain bounds (lo, hi) read off the exact histogram leaf: equi-depth
    * buckets cover every value, so min(b_lo)/max(b_hi) ARE the column's
    * min/max — no extra corpus scan per consumer. */
  private[graft] def liKeyBounds(hist: DataFrame): (Long, Long) = {
    val r = hist.agg(min(col("b_lo")), max(col("b_hi"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Run independent per-predicate audit legs on concurrent driver
    * threads (the q181 sweep discipline, guide §2.6): each leg executes
    * its own joins and aggregates, so one leg's stage tails back-fill
    * the other's idle cores. Legs must not mutate session conf. */
  private def parFlatMap[A, B](xs: Seq[A])(f: A => Seq[B]): Seq[B] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, xs.length))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try xs.map(x => Future(f(x))).map(Await.result(_, Duration.Inf)).flatten
    finally { pool.shutdown(); () }
  }

  /** Uniform-within-bucket range estimate of each predicate in `preds`
    * (pred_id, p_lo, p_hi) against a histogram, in millionths of a row —
    * div-first fixed point, every intermediate under 2^63 at any SF.
    * Predicates overlapping NO bucket estimate 0 (the stale-stats blind
    * spot q212 measures). */
  private[graft] def estimateRanges(preds: DataFrame,
                                    buckets: DataFrame,
                                    estCol: String): DataFrame =
    preds.join(buckets,
        col("b_hi") >= col("p_lo") && col("b_lo") <= col("p_hi"), "left")
      .select(col("pred_id"), col("p_lo"), col("p_hi"),
        when(col("b_cnt").isNotNull,
          col("b_cnt") * idiv(
            (least(col("p_hi"), col("b_hi"))
              - greatest(col("p_lo"), col("b_lo")) + 1L) * lit(1000000L),
            col("b_hi") - col("b_lo") + 1L)).otherwise(lit(0L))
          .as("part_e6"))
      .groupBy(col("pred_id"), col("p_lo"), col("p_hi"))
      .agg(sum(col("part_e6")).as(estCol))

  /** err_ppm of a millionths-scaled estimate against exact rows. */
  private def errPpm(est: Column, actual: Column): Column =
    when(actual > 0L, idiv(abs(est - actual * lit(1000000L)), actual))
      .otherwise(est)

  def selectivityEstimationAudit(spark: SparkSession, dir: String,
                                 nBuckets: Int = 16, nPreds: Int = 6,
                                 exactHistogram: Boolean = true): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // floor() made explicit on BOTH engine and oracle sides: Spark's
    // cast('long') truncates toward zero while DuckDB's CAST rounds
    // half-to-even — identical on the integral fixture, divergent the
    // day a fixture carries fractional quantities
    val specs: Seq[(String, Column)] = Seq(
      ("l_quantity", floor(col("l_quantity")).cast("long")),
      ("l_partkey", floor(col("l_partkey")).cast("long")))
    specs.map { case (name, expr0) =>
      // exact histograms are session leaves (deterministic in the named
      // expression); bounds read off the bucket table — r22
      val buckets =
        if (exactHistogram)
          ensureLiExprHist(spark, dir, name, expr0, nBuckets)
        else equiDepthBucketsApprox(li.select(expr0.as("v")), nBuckets)
      val (lo, hi) =
        if (exactHistogram) liKeyBounds(buckets)
        else {
          val bounds = li.agg(min(expr0), max(expr0)).head()
          (bounds.getLong(0), bounds.getLong(1))
        }
      val d = hi - lo + 1L
      // predicate sweep: quarter-domain windows at eighth-domain strides
      val preds = spark.range(nPreds).select(
        col("id").as("pred_id"),
        (lit(lo) + idiv(col("id") * lit(d), lit(8L))).as("p_lo"),
        (lit(lo) + idiv(col("id") * lit(d), lit(8L)) + idiv(lit(d), lit(4L)))
          .as("p_hi"))
      val est = estimateRanges(preds, buckets, "est_rows_e6")
      val actual = preds.join(
          li.select(expr0.as("v")),
          col("v").between(col("p_lo"), col("p_hi")), "left")
        .groupBy(col("pred_id"))
        .agg(count(col("v")).as("actual_rows"))
      est.join(actual, Seq("pred_id"))
        .select(lit(name).as("column_name"), col("pred_id"), col("p_lo"),
          col("p_hi"), col("actual_rows"), col("est_rows_e6"),
          errPpm(col("est_rows_e6"), col("actual_rows")).as("err_ppm"))
    }.reduce(_.unionByName(_))
  }

  /** A52b [EXT] — SKEWED-COLUMN SELECTIVITY AUDIT (q215): A52's honest
    * negative, measured. The equi-depth histogram's uniform-within-bucket
    * assumption fails on a hot key: the value-grain bucket assignment
    * lands the WHOLE hot mass in one bucket whose span also covers rare
    * neighbors, so interpolation smears ~90% of the table across half
    * the domain — windows missing the hot key overestimate by the
    * smeared share, narrow windows over it underestimate. Fixture: a
    * planted 90%-hot column (9 of 10 lineitem rows take the domain
    * midpoint, the rest keep l_partkey — deterministic, so DuckDB
    * replays it). Mitigation IS code (the q197 knob discipline): the
    * standard heavy-hitter split — values with cnt·B ≥ n become EXACT
    * singleton buckets (at most B of them by construction), the
    * equi-depth histogram is built over the remaining tail, and an
    * estimate is singleton-exact + tail-interpolated. Output per
    * predicate: actual rows, both estimates (millionths), both errors
    * (ppm) — the spec pins plain's worst error ≥ 10× hybrid's worst.
    *
    * Scale: the hot-key split adds ONE filter over the value-count
    * relation A52 already builds (the q173 skew audit's aggregate); the
    * singleton set is ≤ B rows, so the estimator side stays
    * metadata-sized. This is exactly the hybrid histogram a 100 TB CBO
    * ships — equi-depth alone misplans every query that touches a
    * Zipfian key. */
  def selectivitySkewAudit(spark: SparkSession, dir: String,
                           nBuckets: Int = 16, nPreds: Int = 6): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val b = li.agg(min(col("l_partkey").cast("long")),
      max(col("l_partkey").cast("long"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val d = hi - lo + 1L
    val vhot = lo + d / 2L
    val rel = li.select(
      when(pmod(col("l_orderkey"), lit(10L)) =!= 0L, lit(vhot))
        .otherwise(col("l_partkey").cast("long")).as("v"))
    val counts = graft.sources.Sources.spillScratch(
      rel.groupBy(col("v")).agg(count(lit(1)).as("cnt")), "skewhist")
    val n = counts.agg(sum(col("cnt"))).head().getLong(0)
    // plain A52 histogram vs the heavy-hitter split
    val plain = bucketsFromCounts(counts, nBuckets)
    val heavy = counts.filter(col("cnt") * nBuckets >= n)
    val rest = counts.join(heavy.select(col("v")), Seq("v"), "left_anti")
    val restBuckets = bucketsFromCounts(rest, nBuckets)
    val nHeavy = heavy.count()
    val preds = spark.range(nPreds).select(
      col("id").as("pred_id"),
      (lit(lo) + idiv(col("id") * lit(d), lit(8L))).as("p_lo"),
      (lit(lo) + idiv(col("id") * lit(d), lit(8L)) + idiv(lit(d), lit(4L)))
        .as("p_hi"))
    val estPlain = estimateRanges(preds, plain, "est_plain_e6")
    val estRest = estimateRanges(preds, restBuckets, "est_rest_e6")
    val estHeavy = preds
      .join(heavy, col("v").between(col("p_lo"), col("p_hi")), "left")
      .groupBy(col("pred_id"), col("p_lo"), col("p_hi"))
      .agg(coalesce(sum(col("cnt") * lit(1000000L)), lit(0L)).as("est_hh_e6"))
    val actual = preds
      .join(rel, col("v").between(col("p_lo"), col("p_hi")), "left")
      .groupBy(col("pred_id")).agg(count(col("v")).as("actual_rows"))
    estPlain.join(estRest, Seq("pred_id", "p_lo", "p_hi"))
      .join(estHeavy, Seq("pred_id", "p_lo", "p_hi"))
      .join(actual, Seq("pred_id"))
      .select(lit("planted_hot").as("column_name"), col("pred_id"),
        col("p_lo"), col("p_hi"), col("actual_rows"), col("est_plain_e6"),
        (col("est_rest_e6") + col("est_hh_e6")).as("est_hybrid_e6"),
        errPpm(col("est_plain_e6"), col("actual_rows")).as("err_plain_ppm"),
        errPpm(col("est_rest_e6") + col("est_hh_e6"), col("actual_rows"))
          .as("err_hybrid_ppm"),
        lit(nHeavy).as("n_heavy"))
  }

  /** J14 [EXT] — DYNAMIC-PARTITION-PRUNING JOIN (q217): the runtime
    * pruning verb every date-partitioned 100 TB warehouse lives on, and
    * the one partition-pruning shape W5/W17 don't cover — there the
    * pruning predicate is KNOWN at plan time (a literal range, a stats
    * store the driver read); here it is the OUTPUT OF A JOIN SIDE: the
    * fact table is hive-partitioned by ship month, the month dimension
    * is filtered on attributes (year, quarter) the fact never stored,
    * and the fact scan must not enumerate months anyone — the planner
    * learns the surviving partitions from the dim side's broadcast at
    * RUNTIME (Spark inserts a DynamicPruningExpression subquery on the
    * partition column, reusing the join's own broadcast — the spec pins
    * `dynamicpruning` in the scan's PartitionFilters and result
    * equality with the unpartitioned join). Output: total months in the
    * layout, months surviving the dim filter (the pruning decision,
    * oracle-re-derived), and the joined aggregate (exact).
    *
    * Scale: this is THE mechanism that makes "quarter over a decade of
    * daily partitions" read 90 of 3650 directories without the query
    * author naming them; the dim is attribute-filtered and broadcast
    * (months are calendar-bounded), the fact read is |surviving
    * partitions|-bounded, and the layout is the W5 ingest shape paid
    * once. The month-dim derivation here is one column-pruned scan of
    * the fixture (a real warehouse keeps a calendar dim). */
  def dppPrunedJoin(spark: SparkSession, dir: String,
                    year: Int = 1998, quarter: Int = 2): DataFrame = {
    val root = graft.sources.Sources.ensureStore(spark, "dppfact", dir) { r =>
      Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .repartition(col("ship_month"))
        .write.partitionBy("ship_month").parquet(r)
    }
    val fact = spark.read.parquet(root)
    val monthDim = Tables.lineitem(spark, dir)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .distinct()
      .withColumn("year", substring(col("ship_month"), 1, 4).cast("int"))
      .withColumn("quarter",
        floor((substring(col("ship_month"), 6, 2).cast("int") - 1) / 3)
          .cast("int") + 1)
    val nMonthsTotal = monthDim.count()
    val dim = monthDim
      .filter(col("year") === year && col("quarter") === quarter)
      .select(col("ship_month"))
    val nMonthsDim = dim.count()
    fact.join(broadcast(dim), Seq("ship_month"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .select(lit(nMonthsTotal).as("n_months_total"),
        lit(nMonthsDim).as("n_months_dim"),
        col("n_rows"), col("sum_qty"), col("revenue"))
  }

  /** J15 [EXT] — RUNTIME BLOOM-FILTER JOIN PRUNING (q218): q217's DPP
    * prunes PARTITIONS the dim side names at runtime; this is the same
    * idea for a NON-partition join column — Spark's InjectRuntimeFilter
    * plants a BloomFilterAggregate over the selective dim side and a
    * `might_contain` predicate above the fact scan, so fact rows that
    * cannot join are dropped BEFORE the shuffle moves them (and inside
    * parquet row-group filtering where stats allow). It is the planner-
    * owned sibling of the hand-built W15/W19 file-level Bloom index:
    * same math, injected by the optimizer instead of maintained as a
    * store. Output: the planned-filter flag (PINNED true — the spec
    * separately proves it computed by planning the same join with the
    * rule disabled) and the joined aggregate, exact.
    *
    * The fixture sets two confs for THIS query's planning and restores
    * them: the application-side scan threshold (default 10 GB — sized
    * for real warehouses; at 100 TB the default fires without help) and
    * autoBroadcast off (the runtime filter exists to protect a SHUFFLE
    * join — a fixture-sized dim would broadcast and moot it; at scale
    * the dim that needs this is past broadcast size by definition). The
    * query therefore materializes its one-row aggregate eagerly inside
    * the conf scope — driver-trivial. */
  def runtimeBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val dim = Tables.part(spark, dir)
        .filter(col("p_brand") === "Brand#13" && col("p_size") <= 25)
        .select(col("p_partkey"))
      val joined = Tables.lineitem(spark, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(dim, col("l_partkey") === col("p_partkey"))
      val planned = joined.queryExecution.executedPlan.toString()
        .contains("might_contain")
      val r = joined.agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("revenue")).head()
      import spark.implicits._
      Seq((planned, r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toDF("runtime_filter_planned", "n_rows", "sum_qty", "revenue")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** J16 [EXT] — AQE SKEW-JOIN SPLIT (q219): the third runtime re-plan
    * verb (q217 prunes partitions, q218 prunes rows, this one splits
    * tasks): a 90%-hot join key makes one shuffle partition carry half
    * the fact table, and the A37 audit's manual answer (q47's salting)
    * rewrites the query — AQE's OptimizeSkewedJoin instead SPLITS the
    * oversized partition at runtime into advisory-sized slices,
    * duplicating the matching dim partition, with the query text
    * untouched. Output: the per-group joined aggregate (exact) plus the
    * skew-handled flag read from the FINAL adaptive plan (`skew=true`
    * on the sort-merge join; pinned TRUE, proven computed by the spec's
    * disabled-rule twin). The planted hot key is q215's fixture shape
    * (9 of 10 lineitem rows take key 1), so the oracle replays it.
    *
    * Fixture confs scoped and restored: skew thresholds sized to the
    * fixture (the 256 MB default is tuned for real clusters — at 100 TB
    * a hot key trips it unaided), broadcast off (skew split is a
    * SHUFFLE-join verb; a dim small enough to broadcast moots it). The
    * aggregate materializes eagerly inside the scope — AQE only marks
    * skew splits in the FINAL plan, so the flag requires execution.
    *
    * ONE pass since r16: the r13 claim that a stage above the SMJ
    * suppresses the split does not hold on this shape — the groupBy key
    * (`grp`) differs from the join key, so the aggregate needs its own
    * Exchange regardless and the split introduces no extra shuffle;
    * `SkewFoldProbe` measured `skew=true` in the aggregate query's own
    * final adaptive plan at sf0.001/0.01/0.1 (force still required at
    * sf0.001, whose shuffle blocks sit under the thresholds otherwise).
    * The marker is therefore read from the answer pass itself and the
    * instrumented pure-join pre-pass is gone — the one registry query
    * that executed its join twice now executes it once. */
  def aqeSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds sized to the fixture's compressed shuffle blocks (the
      // 256 MB default is tuned for real clusters — at 100 TB a hot key
      // trips it unaided); coalescing off so slice sizing is the skew
      // rule's alone
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      // repartition(16) stands in for the thousands of map tasks a real
      // corpus scan has: AQE splits a skewed partition at MAP-OUTPUT
      // granularity, and the fixture's one-file scan gives one map —
      // indivisible no matter how skewed
      val fact = Tables.lineitem(spark, dir).select(
        when(pmod(col("l_orderkey"), lit(10L)) =!= 0L, lit(1L))
          .otherwise(col("l_partkey")).as("k"),
        col("l_quantity"))
        .repartition(16)
      val dim = Tables.part(spark, dir)
        .select(col("p_partkey").as("k"))
        .withColumn("grp", pmod(col("k"), lit(7L)))
      // ONE execution: the answer pass's own final adaptive plan carries
      // the marker (see the scaladoc — the split survives the grouping
      // stage because grp is not the join key, SkewFoldProbe-measured)
      val agg = fact.join(dim, Seq("k"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
      val rows = agg.collect()
      val skewHandled = agg.queryExecution.executedPlan.toString()
        .contains("skew=true")
      import spark.implicits._
      rows.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          skewHandled))
        .toDF("grp", "n_rows", "sum_qty", "skew_split_planned")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** A56 [EXT] — NDV-SKETCH AUDIT (q216): the third leg of the CBO
    * statistics loop. q207/q215 price range predicates from histograms
    * and q208 prices joins from ndv — but its ndv inputs were exact
    * count(DISTINCT), which at 100 TB means a value-grain shuffle per
    * audited column per snapshot. The route a real ANALYZE ships is the
    * HLL++ sketch (`approx_count_distinct`: one pass, constant state per
    * column, mergeable across partitions — map-side-combined, no value
    * shuffle at all), and this row measures what that substitution
    * costs before q208's formula consumes it: per (table, column, rsd),
    * the exact row count and ndv (oracle-re-derived) plus the bound
    * flag |approx − exact| ≤ 3·rsd·exact PINNED true — Spark's HLL++ is
    * deterministic per input, so a green flag is stable, not lucky, and
    * 3σ of the sketch's published relative standard deviation means a
    * violation is a broken sketch, never an unlucky run (the q154/q166
    * estimator-audit discipline; the raw approx value itself is
    * engine-hash-specific and deliberately not in the hashed output —
    * measured errors live in the spec). Columns span the regimes that
    * stress HLL differently: near-unique (l_orderkey), mid-cardinality
    * (l_partkey), tiny domains where linear counting takes over
    * (l_suppkey, user_id, the string-typed documents.source).
    *
    * Scale: the sketch side is exactly what a 100 TB ANALYZE runs; the
    * exact side is the audit's declared one-time price. The PRECISION
    * tier (rsd 0.01 - p~14, a multi-thousand-word buffer) measured ~4x
    * the default tier's per-column cost on the row-heavy table (pure
    * scan-linear register-update cost, sf0.1) - the measured reason the
    * big-table tier stays at Spark's 0.05 default and 0.01 is audited
    * on the small tables only. */
  def ndvSketchAudit(spark: SparkSession, dir: String): DataFrame = {
    val tables: Seq[(String, DataFrame, Seq[String], Seq[Double])] = Seq(
      ("lineitem", Tables.lineitem(spark, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey"), Seq(0.05)),
      ("events", Tables.events(spark, dir), Seq("user_id"),
        Seq(0.05, 0.01)),
      ("documents", Tables.documents(spark, dir), Seq("source"),
        Seq(0.05, 0.01)))
    // exact NDV + row counts for the columns the session ANALYZE store
    // already audits (lineitem keys, documents.source) read off the leaf —
    // the same countDistinct machinery, computed once per session instead
    // of once per audit; events.user_id is not in the store's specs and
    // keeps its own exact pass
    val fromStore = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"), col("ndv"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val rows = tables.flatMap { case (t, df, cs, rsds) =>
      // TWO passes per table, never one: a DISTINCT aggregate is planned
      // via Expand grouping by the distinct VALUES, and any non-distinct
      // aggregate sharing that Aggregate is then evaluated per
      // (gid, value) GROUP — mixing the 16 KB-buffer HLL sketches in
      // with countDistinct allocated a sketch per distinct value
      // (measured 26.7 s at sf0.1; split, the pair costs ~1 s). The
      // sketch pass is the 100 TB ANALYZE shape: one scan, one group,
      // constant state.
      val (n, exactOf): (Long, String => Long) =
        if (cs.forall(c => fromStore.contains((t, c)))) {
          (fromStore((t, cs.head))._1, c => fromStore((t, c))._2)
        } else {
          val exAggs = count(lit(1)).as("n") +:
            cs.map(c => countDistinct(col(c)).as(s"ex_$c"))
          val ex = df.agg(exAggs.head, exAggs.tail: _*).head()
          (ex.getLong(0), c => ex.getLong(ex.fieldIndex(s"ex_$c")))
        }
      val apAggs = cs.flatMap(c => rsds.zipWithIndex.map { case (rsd, i) =>
        approx_count_distinct(col(c), rsd).as(s"ap_${c}_$i") })
      val ap = df.agg(apAggs.head, apAggs.tail: _*).head()
      cs.flatMap { c =>
        val exact = exactOf(c)
        rsds.zipWithIndex.map { case (rsd, i) =>
          val approx = ap.getLong(ap.fieldIndex(s"ap_${c}_$i"))
          val ok = math.abs(approx - exact) <= 3.0 * rsd * exact
          (t, c, math.round(rsd * 1000000L), n, exact, ok)
        }
      }
    }
    import spark.implicits._
    rows.toDF("table_name", "column_name", "rsd_ppm", "n_rows",
      "ndv_exact", "within_bound")
  }

  /** A54 [EXT] — STALE-STATISTICS AUDIT (q212): the number that decides
    * WHEN to re-ANALYZE — the D30 staleness discipline applied to A52's
    * histograms. The realistic staleness is time-correlated: new orders
    * take new keys, so appends land ABOVE the old histogram's range and
    * a stale estimate for any predicate over the new range collapses
    * toward 0 while in-range predicates stay accurate (nothing below the
    * cutoff changed). Fixture: the stats snapshot saw only l_orderkey ≤
    * omin + 4·D div 5 (the settled 80%); the live table is all of it.
    * Per predicate of an 8-window sweep over the LIVE domain: exact
    * rows, the stale and fresh estimates (same A52 machinery, in
    * millionths), and both errors in ppm. Spec pins the shape: stale ≡
    * fresh ≡ truth below the cutoff, stale near-0 with err ~10⁶ ppm on
    * the tail windows fresh still tracks. Scale: both histograms are
    * the A46 per-snapshot cost; the audit itself is
    * |buckets|·|preds|-sized, and at 100 TB it is the cheap canary you
    * run INSTEAD of re-ANALYZE until it fires.
    */
  def staleStatsAudit(spark: SparkSession, dir: String,
                      nBuckets: Int = 16, nPreds: Int = 8,
                      exactHistogram: Boolean = true): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long").as("v"))
    // the fresh histogram IS the shared l_orderkey leaf; the stale one
    // (the 4/5-domain prefix) is deterministic too and leafs the same
    // way; bounds read off the fresh bucket table — r22
    val (staleHist, freshHist, lo, hi) =
      if (exactHistogram) {
        val fresh = ensureLiKeyHist(spark, dir, nBuckets)
        val (l, h) = liKeyBounds(fresh)
        val cut = l + idivL(4L * (h - l + 1L), 5L)
        val staleRoot = graft.sources.Sources.ensureStore(spark,
            "likhiststale", s"$dir|$nBuckets") { p =>
          equiDepthBuckets(li.filter(col("v") <= cut), nBuckets, "stale")
            .write.mode("overwrite").parquet(p)
        }
        val stale = spark.read
          .schema("bucket BIGINT, b_lo BIGINT, b_hi BIGINT, b_cnt BIGINT")
          .parquet(staleRoot)
        (stale, fresh, l, h)
      } else {
        val bounds = li.agg(min(col("v")), max(col("v"))).head()
        val (l, h) = (bounds.getLong(0), bounds.getLong(1))
        val cut = l + idivL(4L * (h - l + 1L), 5L)
        (equiDepthBucketsApprox(li.filter(col("v") <= cut), nBuckets),
          equiDepthBucketsApprox(li, nBuckets), l, h)
      }
    val d = hi - lo + 1L
    val cutoff = lo + idivL(4L * d, 5L)
    val preds = spark.range(nPreds).select(
      col("id").as("pred_id"),
      (lit(lo) + idiv(col("id") * lit(d), lit(8L))).as("p_lo"),
      least(lit(hi),
        lit(lo) + idiv(col("id") * lit(d), lit(8L)) + idiv(lit(d), lit(4L)))
        .as("p_hi"))
    val stale = estimateRanges(preds, staleHist, "est_stale_e6")
    val fresh = estimateRanges(preds, freshHist, "est_fresh_e6")
    val actual = preds.join(li, col("v").between(col("p_lo"), col("p_hi")),
        "left")
      .groupBy(col("pred_id")).agg(count(col("v")).as("actual_rows"))
    stale.join(fresh, Seq("pred_id", "p_lo", "p_hi"))
      .join(actual, Seq("pred_id"))
      .select(col("pred_id"), col("p_lo"), col("p_hi"), col("actual_rows"),
        col("est_stale_e6"), col("est_fresh_e6"),
        errPpm(col("est_stale_e6"), col("actual_rows")).as("err_stale_ppm"),
        errPpm(col("est_fresh_e6"), col("actual_rows")).as("err_fresh_ppm"))
  }

  /** Scala-side integer division mirror of `idiv` for literals. */
  private def idivL(a: Long, b: Long): Long = a / b

  /** A53 [EXT] — JOIN-CARDINALITY ESTIMATION AUDIT (q208): the textbook
    * equi-join estimator |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) — the
    * formula every cost-based join reorder runs on A45's stats — audited
    * against the EXACT join cardinality for the engine's own join keys.
    * The exact side never materializes the join: both sides reduce to
    * key-grain counts and the cardinality is Σ_k cntA(k)·cntB(k) — a
    * key-grain join of two pre-aggregated relations (the same
    * map-side-combine shape as A37's skew audit). err_ppm is the
    * planner's real risk number: how far the reorder's cost model is
    * from truth on THIS data.
    */
  def joinCardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val specs: Seq[(String, DataFrame, String, DataFrame, String)] = Seq(
      ("lineitem*orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey"),
      ("orders*customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"),
      ("lineitem*part", Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      // non-unique keys BOTH sides: the uniformity assumption's failure
      // case — Σ cnt(u)² > n²/ndv whenever per-key counts vary, so the
      // formula UNDERESTIMATES here (the audit's reason to exist; the
      // three PK-FK joins above it is exact on)
      ("events*events", Tables.events(spark, dir), "user_id",
        Tables.events(spark, dir), "user_id"))
    specs.map { case (jn, a, ka, b, kb) =>
      val ca = a.groupBy(col(ka).cast("long").as("k"))
        .agg(count(lit(1)).as("cnt_a"))
      val cb = b.groupBy(col(kb).cast("long").as("k"))
        .agg(count(lit(1)).as("cnt_b"))
      // ONE full-outer key-grain join feeds ONE aggregate computing the
      // stats AND the exact cardinality: each side's groupBy has a
      // single consumer, so nothing is computed twice (a two-consumer
      // first cut measured 4.8× at sf1 and this shape 2.8× at half the
      // absolute cost of either alternative) — sum/count skip nulls, so
      // left-only keys count toward n/ndv_left and contribute nothing
      // to the product
      val stats = ca.join(cb, Seq("k"), "full_outer").agg(
        sum(col("cnt_a")).as("n_left"),
        count(col("cnt_a")).as("ndv_left"),
        sum(col("cnt_b")).as("n_right"),
        count(col("cnt_b")).as("ndv_right"),
        coalesce(sum(col("cnt_a") * col("cnt_b")), lit(0L))
          .as("actual_rows"))
      stats
        .select(lit(jn).as("join_name"), col("n_left"), col("n_right"),
          col("ndv_left"), col("ndv_right"),
          idiv(col("n_left") * col("n_right"),
            greatest(col("ndv_left"), col("ndv_right"))).as("est_rows"),
          col("actual_rows"))
        .withColumn("err_ppm",
          when(col("actual_rows") > 0L,
            idiv(abs(col("est_rows") - col("actual_rows")) * lit(1000000L),
              col("actual_rows")))
            .otherwise(col("est_rows") * lit(1000000L)))
    }.reduce(_.unionByName(_))
  }

  /** J17 [EXT] — CBO PLAN-FLIPPING CONSUMER (q221): the query that
    * CLOSES the statistics loop. A45/A46/A55/A56 collect stats, A44
    * prices broadcast-vs-shuffle from them ([[adviseJoin]]), A52/A53
    * audit the estimates — this row is the first consumer that ACTS on
    * the advice: per audited join it takes the advisor's strategy call,
    * executes the join BOTH ways — advice-followed and advice-inverted
    * (the q218/q219 disabled-twin discipline: the flip proves the
    * decision is computed, not hard-coded) — and emits, per arm, the
    * OBSERVED executed join operator read from the final adaptive plan.
    * The oracle re-derives the decision inputs (side row counts, the
    * row-count broadcast threshold), the advice, and the EXPECTED plan
    * shape per arm, so a hash match proves the physical plan the engine
    * actually ran is the one its own statistics chose; it also
    * re-derives the joined aggregate once, so the two arms hashing green
    * pins result-identity across plan shapes (the SURVEY §4.3 thesis:
    * strategy changes cost, never answers).
    *
    * Joins audited: one broadcast-advised at every fixture scale
    * (customer⋈nation — a 25-row dim) and one that crosses the
    * threshold with scale (lineitem⋈orders — shuffle-advised from
    * sf0.01 up), so both strategy branches execute at the driver's
    * verify SF. Broadcast thresholds are scoped to −1 (static AND
    * adaptive) and restored in `finally`, so join hints alone pick the
    * physical operator and AQE cannot un-flip the inverted arm; all
    * four arms materialize EAGERLY inside the conf scope (the
    * registry's lazy-DF contract).
    *
    * Scale: the advisor pass is A44's narrow keys-only aggregate; each
    * arm is one real join. At 100 TB the inverted arm is the audit you
    * run once per advisor change on a sampled partition, not per query
    * — the followed arm IS the production plan.
    *
    * STANDING COMMITMENT (r16 verdict #7), DISCHARGED in r17: this row
    * executes FOUR full-size join arms by design and is priced as an
    * audit, not a query. The family grew to six both-arms consumers
    * this round, so the promised sampled-partition form now EXISTS as
    * its own registered row — [[cboSampledArmAudit]] (q235) runs the
    * inverted arm on a deterministic 1/8 key partition (the flip proof
    * needs the plan shape, not the full cardinality; the answer proof
    * stays on the full-size followed arm). This row stays full-size on
    * purpose: it is the one place the INVERTED arm's answer-identity is
    * proven at full cardinality; new CBO consumers should follow q235's
    * shape. q226 deliberately did NOT add an inverted
    * broadcast-vs-shuffle arm — its audit arm is the alternative ORDER,
    * which the choice contract requires. */
  def cboPlanFlipAudit(spark: SparkSession, dir: String,
                       broadcastRows: Long = 10000L): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val joins = Seq(
        ("customer*nation", Tables.customer(spark, dir), "c_nationkey",
          Tables.nation(spark, dir), "n_nationkey", "c_custkey"),
        ("lineitem*orders", Tables.lineitem(spark, dir), "l_orderkey",
          Tables.orders(spark, dir), "o_orderkey", "l_quantity"))
      val out = joins.flatMap { case (label, left, lk, right, rk, sumCol) =>
        val a = adviseJoin(label, left, lk, right, rk, broadcastRows)
          .select(col("strategy"), col("n_left"), col("n_right"),
            col("build_side")).head()
        val (advice, nLeft, nRight, build) =
          (a.getString(0), a.getLong(1), a.getLong(2), a.getString(3))
        def run(strategy: String): (String, Long, Long) = {
          val on = col(lk) === col(rk)
          val j = strategy match {
            case "broadcast" =>
              // build side = the advisor's (the smaller) — broadcasting
              // the BIGGER side would test a plan nobody advises
              if (build == "right") left.join(broadcast(right), on)
              else broadcast(left).join(right, on)
            case _ => left.hint("merge").join(right.hint("merge"), on)
          }
          val agg = j.agg(count(lit(1)).as("n"),
            sum(col(sumCol).cast("long")).as("s"))
          // collect(), not head(): head() routes through a separate limit
          // plan and the AdaptiveSparkPlan would print isFinalPlan=false
          // (shape is hint-pinned either way; the marker read is honest
          // only on the FINAL plan — the r17 q231 lesson)
          val r = agg.collect()(0)
          val plan = agg.queryExecution.executedPlan.toString()
          val shape =
            if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
            else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
            else "other"
          (shape, r.getLong(0), r.getLong(1))
        }
        val inverted = if (advice == "broadcast") "shuffle" else "broadcast"
        Seq(("followed", advice), ("inverted", inverted)).map {
          case (arm, strat) =>
            val (shape, nRows, sumVal) = run(strat)
            (label, arm, advice, shape, arm == "followed",
              nLeft, nRight, broadcastRows, nRows, sumVal)
        }
      }
      import spark.implicits._
      out.toDF("join_label", "arm", "advice", "executed_join", "followed",
        "n_left", "n_right", "broadcast_limit", "n_rows", "sum_val")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** A57 [EXT] — INCREMENTAL NDV MAINTENANCE (q225): the per-commit leg
    * of the ANALYZE story. q216 audits the HLL route's accuracy; q224
    * consumes the persisted snapshot; this row shows WHY warehouses ship
    * sketches at all — they are MERGEABLE, so per-commit maintenance
    * never rescans settled data: each ingest tick appends ONE row
    * carrying its own row count and a Datasketches HLL sketch per
    * audited column (`hll_sketch_agg` — O(tick) cost, the W16
    * zoneMapCommit shape for statistics), and the table-level NDV at any
    * moment is `hll_union_agg` over the stored tick sketches — a
    * metadata-sized fold, no data read. Output per column: tick count,
    * exact row count (summed from the store; oracle-re-derived), exact
    * NDV (the declared audit price; oracle-re-derived), the 3σ bound
    * flag on the folded estimate (rsd = 1.04/√2^12 ≈ 1.63 % at the
    * default lgK 12 — the q216 discipline), and `refold_deterministic`
    * pinned TRUE: folding the stored sketch bytes again yields the
    * identical estimate — the property a stats STORE needs (the bytes
    * fully determine the statistic; no hidden in-memory state).
    *
    * Honest negative, measured at sf0.01: the union estimate is NOT
    * bit-identical to a single whole-scan sketch's — Datasketches'
    * direct sketches use the sequence-dependent HIP estimator, which a
    * union necessarily DROPS (merged registers carry no insertion
    * history), falling back to the composite estimator. A first cut
    * pinned union == whole-scan and one column failed exactly there;
    * the accuracy contract of the incremental route is therefore the
    * 3σ BOUND, never estimator equality. At 100 TB the trade stands:
    * per-commit sketch rows + one metadata-sized fold replace the
    * overnight rescan, at the composite estimator's (bounded,
    * audited) accuracy.
    *
    * Private per-run store (the lifecycle writes tick state; the
    * crash-replay discipline), one parquet row per (tick) — the store
    * is |ticks|-sized whatever the corpus is. */
  def incrementalNdvMaintenance(spark: SparkSession, dir: String,
                                nTicks: Int = 4): DataFrame = {
    require(nTicks >= 1, s"need nTicks >= 1; got $nTicks")
    val cols = Seq("l_partkey", "l_suppkey")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey") +: cols.map(col): _*)
    // ingest ticks: each commit lands ONE sketch row — never a rescan.
    // The tick store is deterministic in (dir, nTicks) and read-only
    // under the folds below, so it builds once per session (r22)
    val root = graft.sources.Sources.ensureStore(spark, "ndvinc",
        s"$dir|$nTicks") { r =>
      for (t <- 0 until nTicks)
        ndvCommit(li.filter(
          pmod(col("l_orderkey"), lit(nTicks.toLong)) === t.toLong),
          t.toLong, r, cols)
    }
    // the consumer: fold the |ticks|-row store — no data read
    val store = spark.read.parquet(root)
    def fold(): org.apache.spark.sql.Row = store.agg(
      sum(col("n_rows")).as("n_rows"),
      cols.flatMap(c => Seq(
        hll_sketch_estimate(hll_union_agg(col(s"sk_$c"))).as(s"est_$c"),
        count(lit(1)).as(s"ticks_$c"))): _*).head()
    val folded = fold()
    val refolded = fold() // the store's bytes fully determine the stat
    // the exact leg: the declared audit price, oracle-re-derived — read
    // off the session ANALYZE leaf when it audits these columns (the
    // same countDistinct machinery, computed once per session — the
    // q216 discipline); fresh pass only for columns outside the store
    val fromStore = ensureTableStats(spark, dir)
      .filter(col("table_name") === "lineitem")
      .select(col("column_name"), col("ndv")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact: String => Long =
      if (cols.forall(fromStore.contains)) fromStore
      else {
        val exactAggs = cols.map(c => countDistinct(col(c)).as(c))
        val row = li.agg(exactAggs.head, exactAggs.tail: _*).head()
        c => row.getLong(cols.indexOf(c))
      }
    val rsd = 1.04 / math.sqrt(1 << 12) // Datasketches default lgK = 12
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      // hll_sketch_estimate returns LONG (Spark rounds the estimate)
      val est = folded.getLong(1 + 2 * i)
      val ticks = folded.getLong(2 + 2 * i)
      val ex = exact(c)
      (c, ticks, folded.getLong(0), ex,
        math.abs(est - ex).toDouble <= 3.0 * rsd * ex,
        est == refolded.getLong(1 + 2 * i))
    }.toDF("column_name", "n_ticks", "n_rows", "ndv_exact",
      "within_3sigma", "refold_deterministic")
  }

  /** One NDV-maintenance commit: the tick's row count + one mergeable
    * HLL sketch per audited column, landed as a per-tick DYNAMIC
    * partition overwrite (the bloomCommit XO discipline) — a replayed
    * tick rewrites its own partition to identical content, so crash
    * recovery converges instead of double-counting `n_rows` (the sketch
    * union is idempotent by itself; the row count is not). */
  private[graft] def ndvCommit(batch: DataFrame, tick: Long, root: String,
                               cols: Seq[String]): Unit =
    batch.agg(count(lit(1)).as("n_rows"),
      cols.map(c => hll_sketch_agg(col(c)).as(s"sk_$c")): _*)
      .withColumn("tick", lit(tick))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("tick").parquet(root)

  /** A57 kept live — the streamingBloomMaintenance story for NDV
    * statistics: each micro-batch is one [[ndvCommit]] keyed by Spark's
    * own batchId, so checkpoint recovery replays a crashed tick to
    * identical store state and the union fold never sees a duplicate.
    * The MemoryStream spec pins stream ≡ the batch tick loop and the
    * replay no-op. */
  def streamingNdvMaintenance(rows: DataFrame, root: String,
                              cols: Seq[String])
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        ndvCommit(batch, batchId, root, cols)
    }

  /** Session-shared ANALYZE leaf: [[tableStats]]'s output persisted once
    * per (session, dir) and read back by every consumer — the literal
    * "ANALYZE once, consume many" shape a warehouse runs (the overnight
    * job writes the stats table; planners READ it). q189 emits it; q224
    * prices joins FROM it. Content is a pure function of the dir (exact
    * counts/ndv/min/max over fixed specs). */
  def ensureTableStats(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.Sources.ensureStore(spark, "anlz", dir) { p =>
      tableStats(spark, dir).write.mode("overwrite").parquet(p)
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("n_rows", LongType), StructField("n_nulls", LongType),
      StructField("ndv", LongType), StructField("min_val", StringType),
      StructField("max_val", StringType), StructField("avg_width", DoubleType)))
    spark.read.schema(schema).parquet(root)
  }

  /** J17b [EXT] — CBO ADVICE FROM THE PERSISTED ANALYZE STORE (q224):
    * q221 proves the engine EXECUTES its advisor's call and that the
    * flip is real; this row moves the decision input to where a
    * production CBO actually reads it — the PERSISTED [[tableStats]]
    * snapshot ([[ensureTableStats]]), not live recounts. Per audited
    * join whose BOTH sides the ANALYZE specs cover: side row counts read
    * from the stats store, the advice at the row threshold, the join
    * executed per that advice (hints under scoped-off broadcast
    * thresholds — q221's discipline), the OBSERVED executed operator
    * from the final adaptive plan, and the joined aggregate. The oracle
    * re-derives the counts from the raw tables (the store was ANALYZEd
    * from the same snapshot, so they agree — q212 owns the STALE-store
    * case), the advice, the expected shape, and the aggregate: a hash
    * match proves the plan the engine ran is the one its persisted
    * statistics chose. orders⋈customer crosses the threshold with scale
    * (broadcast-advised at sf0.001/0.01, shuffle-advised at sf0.1), so
    * the stats-driven decision is exercised on both branches across the
    * driver's own gates.
    *
    * Scale: the decision costs a metadata-sized store read — no
    * recount; the followed arm IS the production plan (no inverted arm
    * here — q221 owns the flip proof). */
  def cboFromAnalyzeAudit(spark: SparkSession, dir: String,
                          broadcastRows: Long = 10000L): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val stats = ensureTableStats(spark, dir)
      def rowsOf(t: String): Long = stats
        .filter(col("table_name") === t)
        .agg(max(col("n_rows"))).head().getLong(0)
      val joins = Seq(
        ("orders*customer", Tables.orders(spark, dir), "o_custkey",
          "orders", Tables.customer(spark, dir), "c_custkey", "customer",
          "o_custkey"),
        ("lineitem*orders", Tables.lineitem(spark, dir), "l_orderkey",
          "lineitem", Tables.orders(spark, dir), "o_orderkey", "orders",
          "l_quantity"))
      val out = joins.map { case (label, left, lk, lt, right, rk, rt, sumCol) =>
        val (nLeft, nRight) = (rowsOf(lt), rowsOf(rt))
        val advice = if (math.min(nLeft, nRight) <= broadcastRows)
          "broadcast" else "shuffle"
        val on = col(lk) === col(rk)
        val j = advice match {
          case "broadcast" =>
            if (nRight <= nLeft) left.join(broadcast(right), on)
            else broadcast(left).join(right, on)
          case _ => left.hint("merge").join(right.hint("merge"), on)
        }
        val agg = j.agg(count(lit(1)).as("n"),
          sum(col(sumCol).cast("long")).as("s"))
        val r = agg.collect()(0) // EAGER inside the conf scope; collect()
        // (not head()) finalizes the adaptive plan the marker is read from
        val plan = agg.queryExecution.executedPlan.toString()
        val shape =
          if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
          else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
          else "other"
        (label, "analyze_store", nLeft, nRight, broadcastRows, advice,
          shape, r.getLong(0), r.getLong(1))
      }
      import spark.implicits._
      out.toDF("join_label", "stats_source", "n_left", "n_right",
        "broadcast_limit", "advice", "executed_join", "n_rows", "sum_val")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** The textbook equi-join cardinality estimator — q208's formula
    * |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B) — as the pure decision core
    * the join-ORDER consumer (q226) runs on persisted statistics. BigInt
    * product on purpose: two 100 TB-scale row counts overflow a Long
    * multiply, and a cost model that wraps negative picks the worst plan
    * with full confidence. Exposed for the planted-stats flip spec. */
  private[graft] def estimateJoinRows(nA: Long, ndvA: Long,
                                      nB: Long, ndvB: Long): Long = {
    require(nA >= 0 && nB >= 0 && ndvA > 0 && ndvB > 0,
      s"need non-negative counts and positive ndv; got ($nA,$ndvA,$nB,$ndvB)")
    (BigInt(nA) * BigInt(nB) / BigInt(math.max(ndvA, ndvB))).toLong
  }

  /** The join-order choice over the two associations of
    * lineitem ⋈ orders ⋈ customer: pick the association whose
    * INTERMEDIATE relation is estimated smaller (left-deep
    * (li⋈ord)⋈cust vs right-deep li⋈(ord⋈cust)) — the decision a
    * Selinger-style enumerator makes at every level, reduced to its
    * smallest observable instance. Ties break to the right-deep order
    * (the dim-side join is the cheaper shuffle when equal). Exposed for
    * the planted-stats flip spec. */
  private[graft] def chooseJoinOrder(estLiOrd: Long, estOrdCust: Long): String =
    if (estOrdCust <= estLiOrd) "orders_customer_first"
    else "lineitem_orders_first"

  /** J18 [EXT] — CBO JOIN-ORDER CONSUMER (q226): the statistics decision
    * that actually moves 100 TB plans (SURVEY §4.3). q221/q224 flip
    * broadcast-vs-shuffle from side row counts; this row picks a JOIN
    * ORDER from estimated INTERMEDIATE cardinalities — the other half of
    * CBO. For the 3-table join lineitem⋈orders⋈customer it:
    *
    *  1. reads row counts AND per-key ndv from the persisted ANALYZE
    *     store ([[ensureTableStats]] — no live recount; the q224
    *     discipline),
    *  2. estimates both associations' intermediates with q208's formula
    *     ([[estimateJoinRows]]): est(li⋈ord) from
    *     (n_li, ndv_l_orderkey, n_ord, ndv_o_orderkey) and est(ord⋈cust)
    *     from (n_ord, ndv_o_custkey, n_cust, ndv_c_custkey),
    *  3. picks the order with the smaller estimated intermediate
    *     ([[chooseJoinOrder]]),
    *  4. executes BOTH orders under scoped-off broadcast thresholds (the
    *     q221 both-arms discipline: the un-chosen order is the audit arm
    *     that proves the choice changes cost, never answers), each
    *     binary join hinted by the row-threshold rule with the
    *     INTERMEDIATE side priced at its ESTIMATE — the estimate is
    *     consumed twice: once to order, once to size the outer join,
    *  5. emits per order: estimated vs ACTUAL intermediate rows (exact,
    *     via the q208 key-grain Σ cntA·cntB — never a wide join), the
    *     OBSERVED inner/outer join operators read from the final
    *     adaptive plan (top-down: first join node is the outer), and the
    *     identical 3-table aggregate.
    *
    * The oracle re-derives everything from the raw tables: counts, ndv,
    * both estimates, both actuals, the choice, the expected operator
    * per join at the threshold, and the aggregate — a hash match proves
    * the engine ordered the join the way its own persisted statistics
    * price it, and that both orders return the same answer.
    *
    * Scale: the decision is a metadata-sized store read; the audit arm
    * (both orders + exact intermediates) is the q221 once-per-advisor-
    * change price — at 100 TB run it on a sampled partition, the chosen
    * order IS the production plan. */
  def cboJoinOrderAudit(spark: SparkSession, dir: String,
                        broadcastRows: Long = 10000L): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val stats = ensureTableStats(spark, dir)
        .select(col("table_name"), col("column_name"), col("n_rows"),
          col("ndv")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      def statOf(t: String, c: String): (Long, Long) = stats.getOrElse((t, c),
        throw new IllegalStateException(s"ANALYZE store has no ($t, $c) row"))
      val (nLi, ndvLo) = statOf("lineitem", "l_orderkey")
      val (nOrd, ndvOo) = statOf("orders", "o_orderkey")
      val (_, ndvOc) = statOf("orders", "o_custkey")
      val (nCust, ndvCc) = statOf("customer", "c_custkey")
      val estLiOrd = estimateJoinRows(nLi, ndvLo, nOrd, ndvOo)
      val estOrdCust = estimateJoinRows(nOrd, ndvOc, nCust, ndvCc)
      val chosen = chooseJoinOrder(estLiOrd, estOrdCust)

      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
      val cust = Tables.customer(spark, dir)
      // exact intermediates: key-grain counts joined and folded — the
      // q208 shape, never the wide join itself
      def actualJoinRows(a: DataFrame, ka: String, b: DataFrame,
                         kb: String): Long =
        a.groupBy(col(ka).cast("long").as("k")).agg(count(lit(1)).as("ca"))
          .join(b.groupBy(col(kb).cast("long").as("k"))
            .agg(count(lit(1)).as("cb")), "k")
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)))
          .head().getLong(0)
      val actLiOrd = actualJoinRows(li, "l_orderkey", ord, "o_orderkey")
      val actOrdCust = actualJoinRows(ord, "o_custkey", cust, "c_custkey")

      // one binary join, hinted by the row rule (min side <= threshold
      // broadcasts the smaller side; else merge both) — `rowsL`/`rowsR`
      // are the STATS-side sizes: base-table counts for leaves, the
      // ESTIMATE for an intermediate input
      def joined(l: DataFrame, rowsL: Long, r: DataFrame, rowsR: Long,
                 on: Column): DataFrame =
        if (math.min(rowsL, rowsR) <= broadcastRows) {
          if (rowsR <= rowsL) l.join(broadcast(r), on)
          else broadcast(l).join(r, on)
        } else l.hint("merge").join(r.hint("merge"), on)
      def run(order: String): (String, String, Long, Long, Long) = {
        val full = order match {
          case "lineitem_orders_first" =>
            val inner = joined(li, nLi, ord, nOrd,
              col("l_orderkey") === col("o_orderkey"))
            joined(inner, estLiOrd, cust, nCust,
              col("o_custkey") === col("c_custkey"))
          case _ =>
            val inner = joined(ord, nOrd, cust, nCust,
              col("o_custkey") === col("c_custkey"))
            joined(li, nLi, inner, estOrdCust,
              col("l_orderkey") === col("o_orderkey"))
        }
        val agg = full.agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sq"),
          sum(col("c_custkey").cast("long")).as("sc"))
        val row = agg.collect()(0) // EAGER; collect() finalizes the
        // adaptive plan the operator shapes are read from (q231 lesson)
        val plan = agg.queryExecution.executedPlan.toString()
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
          .findAllIn(plan).toSeq
        require(joins.length >= 2, s"expected 2 join nodes, plan:\n$plan")
        // toString prints top-down: first join node is the OUTER join
        (joins(1), joins(0), row.getLong(0), row.getLong(1), row.getLong(2))
      }
      import spark.implicits._
      // both arms execute inside ONE static conf scope and share no
      // state — concurrent driver threads (guide §2.6, the q253 form)
      parFlatMap(Seq(("lineitem_orders_first", estLiOrd, actLiOrd),
          ("orders_customer_first", estOrdCust, actOrdCust))) {
        case (order, est, act) =>
          val (inner, outer, n, sq, sc) = run(order)
          Seq((order, order == chosen, est, act, inner, outer, n, sq, sc))
      }.toDF("order_label", "chosen", "est_intermediate",
        "actual_intermediate", "inner_join", "outer_join",
        "n_rows", "sum_qty", "sum_cust")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** A63 [EXT] — CBO ESTIMATES FROM THE INCREMENTAL NDV STORE (q227):
    * q225 maintains per-commit HLL sketches so NDV never needs a rescan;
    * this row is the consumer that was missing — q226's join-ORDER
    * estimates recomputed with ndv taken from the SKETCH FOLD instead of
    * the exact ANALYZE column. Per join-key pair the engine: builds the
    * incremental store (nTicks [[ndvCommit]]s per table — the q225
    * lifecycle), folds it (metadata-sized, no data read), prices both
    * intermediates of lineitem⋈orders⋈customer from (ANALYZE row counts,
    * sketch ndv), and chooses an order. The 3σ contract is pinned
    * THROUGH the consumer: per order the output carries the exact-stat
    * estimate (oracle-re-derived), `ndv_within_3sigma` (each sketch ndv
    * inside 3·1.04/√2¹² of exact), `est_within_bounds` (the sketch-fed
    * estimate inside the propagated band est_exact/(1±ε) — max() is
    * monotone, so per-column bounds carry through the formula), and
    * `margin_robust` (the two estimates differ by more than the combined
    * band — the condition under which a sketch-fed choice is SAFE).
    * `chosen_sketch` is emitted as a value, not a flag: the oracle
    * re-derives the choice from exact stats, so a hash match proves the
    * sketch route picked the same order — exactly what margin_robust
    * licenses (a production enumerator near the margin should fall back
    * to exact re-ANALYZE; that is this row's operational contract).
    *
    * Scale: sketch maintenance is O(tick) per commit (q225); the fold
    * and the decision are metadata-sized. The exact-ndv leg here reads
    * the persisted ANALYZE store (q224's discipline) — the audit costs
    * nothing the warehouse doesn't already pay. */
  def cboNdvSketchEstimates(spark: SparkSession, dir: String,
                            nTicks: Int = 2): DataFrame = {
    require(nTicks >= 1, s"need nTicks >= 1; got $nTicks")
    // incremental sketch stores: per table, nTicks commits keyed by the
    // table's own PK grain (the q225 ingest shape)
    val specs = Seq(
      ("lineitem", "l_orderkey", Seq("l_orderkey")),
      ("orders", "o_orderkey", Seq("o_orderkey", "o_custkey")),
      ("customer", "c_custkey", Seq("c_custkey")))
    val sketchNdv: Map[(String, String), Long] = specs.flatMap {
      case (t, tickKey, cols) =>
        // deterministic tick store, read-only under the fold: once per
        // session (the q225 discipline)
        val root = graft.sources.Sources.ensureStore(spark, "ndvcbo",
            s"$dir|$t|$nTicks") { r =>
          val df = Tables.table(spark, dir, t)
          for (k <- 0 until nTicks)
            ndvCommit(df.filter(
              pmod(col(tickKey), lit(nTicks.toLong)) === k.toLong),
              k.toLong, r, cols)
        }
        val folded = spark.read.parquet(root).agg(
          cols.map(c =>
            hll_sketch_estimate(hll_union_agg(col(s"sk_$c"))).as(c)).head,
          cols.tail.map(c =>
            hll_sketch_estimate(hll_union_agg(col(s"sk_$c"))).as(c)): _*)
          .head()
        cols.zipWithIndex.map { case (c, i) => (t, c) -> folded.getLong(i) }
    }.toMap
    // exact row counts and ndv from the persisted ANALYZE store
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (nLi, ndvLoE) = stats(("lineitem", "l_orderkey"))
    val (nOrd, ndvOoE) = stats(("orders", "o_orderkey"))
    val (_, ndvOcE) = stats(("orders", "o_custkey"))
    val (nCust, ndvCcE) = stats(("customer", "c_custkey"))
    val eps = 3.0 * 1.04 / math.sqrt(1 << 12) // 3σ at Datasketches lgK=12
    def within3Sigma(sketch: Long, exact: Long): Boolean =
      math.abs(sketch - exact).toDouble <= eps * exact
    def withinBand(estSketch: Long, estExact: Long): Boolean =
      estSketch.toDouble <= estExact / (1.0 - eps) + 1.0 &&
        estSketch.toDouble >= estExact / (1.0 + eps) - 1.0
    // the combined band: two estimates are distinguishable iff their
    // ratio exceeds (1+ε)/(1−ε) — below that, a sketch-fed choice is a
    // coin flip and the contract demands exact re-ANALYZE
    def marginRobust(a: Long, b: Long): Boolean =
      math.max(a, b).toDouble * (1.0 - eps) >
        math.min(a, b).toDouble * (1.0 + eps)
    val arms = Seq(
      ("lineitem_orders_first",
        nLi, nOrd, ("lineitem", "l_orderkey"), ("orders", "o_orderkey"),
        ndvLoE, ndvOoE),
      ("orders_customer_first",
        nOrd, nCust, ("orders", "o_custkey"), ("customer", "c_custkey"),
        ndvOcE, ndvCcE))
    val ests = arms.map { case (_, nA, nB, kA, kB, ndvAE, ndvBE) =>
      (estimateJoinRows(nA, ndvAE, nB, ndvBE),
        estimateJoinRows(nA, sketchNdv(kA), nB, sketchNdv(kB)))
    }
    val Seq((estAE, estAS), (estBE, estBS)) = ests
    val chosenSketch = chooseJoinOrder(estAS, estBS)
    val chosenExact = chooseJoinOrder(estAE, estBE)
    val robust = marginRobust(estAE, estBE)
    import spark.implicits._
    arms.zip(ests).map {
      case ((label, nA, nB, kA, kB, ndvAE, ndvBE), (estE, estS)) =>
        (label, nA, nB, ndvAE, ndvBE, estE,
          within3Sigma(sketchNdv(kA), ndvAE) &&
            within3Sigma(sketchNdv(kB), ndvBE),
          withinBand(estS, estE), robust,
          chosenSketch, chosenExact, chosenSketch == chosenExact)
    }.toDF("order_label", "n_left", "n_right", "ndv_left_exact",
      "ndv_right_exact", "est_rows_exact", "ndv_within_3sigma",
      "est_within_bounds", "margin_robust", "chosen_sketch",
      "chosen_exact", "choice_agrees")
  }

  /** J21 [EXT] — AQE PARTITION-COALESCE AUDIT (q231): the fourth runtime
    * re-plan verb, completing the family — J14 prunes partitions at a
    * join, J15 prunes rows, J16 splits skewed partitions, and THIS one
    * merges the too-small shuffle partitions every static
    * `spark.sql.shuffle.partitions` setting produces somewhere at 100 TB
    * (the config is always wrong for some stage; AQE re-plans the read
    * side from measured map-output sizes). The q218/q219 disabled-twin
    * discipline: the same small group-by runs with
    * `coalescePartitions.enabled` on and off, each arm materialized
    * EAGERLY inside its conf scope, and the observed marker is read from
    * the arm's own final adaptive plan — `AQEShuffleRead coalesced` on
    * the enabled arm, absent on the disabled twin (the flip proves the
    * runtime re-plan happened, not a config echo). The oracle re-derives
    * the expected marker per arm and the aggregate (identical across
    * arms — re-planning changes cost, never answers, §4.3's thesis).
    *
    * Scale: coalescing is plan-time metadata over map-output statistics;
    * the audit costs two runs of one small aggregate. At 100 TB this is
    * the verb that turns a 10k-partition shuffle of a filtered relation
    * into the dozens of real tasks the data actually needs. */
  def aqeCoalesceAudit(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.conf
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = conf.getOption(key)
    val arms = Seq(("enabled", "true"), ("disabled", "false")).map {
      case (arm, setting) =>
        conf.set(key, setting)
        try {
          val agg = Tables.orders(spark, dir)
            .groupBy(col("o_orderstatus"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("o_custkey").cast("long")).as("s"))
            .agg(count(lit(1)).as("n_groups"),
              sum(col("cnt")).as("n_rows"),
              sum(col("s")).as("sum_cust"))
          // collect(), not head(): head() routes through executeTake on a
          // separate limit plan and the AdaptiveSparkPlan here never
          // finalizes (isFinalPlan=false — no coalesced marker to read)
          val r = agg.collect()(0)
          val plan = agg.queryExecution.executedPlan.toString()
          (arm, plan.contains("coalesced"),
            r.getLong(0), r.getLong(1), r.getLong(2))
        } finally saved match {
          case Some(v) => conf.set(key, v)
          case None => conf.unset(key)
        }
    }
    import spark.implicits._
    arms.toDF("arm", "coalesced", "n_groups", "n_rows", "sum_cust")
  }

  /** J22 [EXT] — FILTER-AWARE JOIN ORDERING (q232): the classic CBO
    * behavior the q226/q230 consumers can't show — a SELECTIVE FILTER
    * FLIPS THE JOIN ORDER. q226 orders the unfiltered 3-table join from
    * base-table stats, so its choice is fixed per snapshot; real plans
    * carry predicates, and the whole point of the A46/A52 histograms is
    * that the ESTIMATED filtered cardinality re-prices every join above
    * the filter. Per predicate of a two-point sweep over l_orderkey —
    * one narrow window (~2 % of the domain), one wide (~80 %) — the
    * engine: estimates the filtered lineitem cardinality from the
    * equi-depth histogram (the q207 estimator, millionths fixed-point),
    * re-prices est(li′⋈orders) with the filtered rows (post-filter ndv
    * by the standard min(ndv, rows) rule — the divisor stays the PK
    * side's ndv, read from the ANALYZE store), compares against the
    * unfiltered est(orders⋈customer), picks the order, and executes
    * the CHOSEN order of the filtered 3-table join at full size (the
    * production plan — its aggregate is the emitted answer) plus BOTH
    * orders on the 1/8 l_orderkey partition (the q235 sampled-arm
    * form, adopted r17: the chain's first key restricted on both fact
    * sides, the dim side whole, so both associations stay exact on
    * the subset and cross-order identity is still a real executed
    * invariant — q226/q230 own the family's full-size identity
    * proof). On this fixture the narrow predicate chooses
    * lineitem-first and the wide one customer-first — the flip
    * happens INSIDE one query, from the histogram alone, and the
    * oracle re-derives the histogram, both estimates, both exact
    * intermediates (key-grain, filter applied), the choice, and the
    * per-predicate aggregates.
    *
    * Scale: the decision reads a |buckets|-sized histogram and a
    * metadata-sized stats store; one full join per predicate is the
    * query you were running anyway, and the identity audit costs
    * 2/8ths of one join. This is the row that justifies maintaining
    * histograms AT ALL: without them every filtered fact table prices
    * at its unfiltered size and the enumerator never moves. */
  def cboFilteredJoinOrderAudit(spark: SparkSession, dir: String,
                                nBuckets: Int = 16): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (nOrd, ndvOo) = stats(("orders", "o_orderkey"))
    val (_, ndvOc) = stats(("orders", "o_custkey"))
    val (nCust, ndvCc) = stats(("customer", "c_custkey"))
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val hist = ensureLiKeyHist(spark, dir, nBuckets)
    val (lo, hi) = liKeyBounds(hist)
    val d = hi - lo + 1L
    val predDefs = Seq(
      ("narrow", lo, lo + d / 50L - 1L),
      ("wide", lo, lo + 4L * d / 5L - 1L))
    // the unfiltered dim-side estimate — q226's est_b, fixed per snapshot
    val estOrdCust = estimateJoinRows(nOrd, ndvOc, nCust, ndvCc)
    val actOrdCust = ord.groupBy(col("o_custkey").cast("long").as("k"))
      .agg(count(lit(1)).as("ca"))
      .join(cust.groupBy(col("c_custkey").cast("long").as("k"))
        .agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))).head().getLong(0)
    import spark.implicits._
    val out = parFlatMap(predDefs) { case (label, pLo, pHi) =>
      val pred = spark.range(1).select(lit(0L).as("pred_id"),
        lit(pLo).as("p_lo"), lit(pHi).as("p_hi"))
      val estE6 = estimateRanges(pred, hist, "est_e6")
        .head().getAs[Long]("est_e6")
      val estFiltered = estE6 / 1000000L
      // post-filter ndv = min(ndv, rows): the divisor resolves to the PK
      // side's ndv, so the formula stays estimateJoinRows verbatim
      val estLiOrd = estimateJoinRows(estFiltered,
        math.max(1L, math.min(estFiltered, ndvOo)), nOrd, ndvOo)
      val chosen = chooseJoinOrder(estLiOrd, estOrdCust)
      val liF = li.filter(col("l_orderkey").cast("long")
        .between(pLo, pHi))
      val actLiOrd = liF.groupBy(col("l_orderkey").cast("long").as("k"))
        .agg(count(lit(1)).as("ca"))
        .join(ord.groupBy(col("o_orderkey").cast("long").as("k"))
          .agg(count(lit(1)).as("cb")), "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))).head().getLong(0)
      def agg(full: DataFrame): (Long, Long, Long) = {
        val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
          sum(col("c_custkey").cast("long"))).head()
        (r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))
      }
      val onLi = col("l_orderkey") === col("o_orderkey")
      val onCust = col("o_custkey") === col("c_custkey")
      // the CHOSEN order runs full-size (the production plan; its
      // aggregate is the emitted answer); cross-order identity is
      // proven on the 1/8 l_orderkey partition (the q235 sampled-arm
      // form: the chain's first key restricted on both fact sides, the
      // dim side whole, so both associations stay exact on the subset
      // — q226/q230 own the full-size identity proof for this family)
      val aggA =
        if (chosen == "lineitem_orders_first")
          agg(liF.join(ord, onLi).join(cust, onCust))
        else agg(liF.join(ord.join(cust, onCust), onLi))
      val liF8 = liF.filter(pmod(col("l_orderkey"), lit(8L)) === 0L)
      val ord8 = ord.filter(pmod(col("o_orderkey"), lit(8L)) === 0L)
      val sA = agg(liF8.join(ord8, onLi).join(cust, onCust))
      val sB = agg(liF8.join(ord8.join(cust, onCust), onLi))
      // emitted, not required: a broken cross-order identity must land
      // as a RED oracle row (the q240 failure surface), never an
      // exception with no row
      val identical = sA == sB
      Seq(
        (label, pLo, pHi, estE6, "lineitem_orders_first",
          chosen == "lineitem_orders_first", estLiOrd, actLiOrd,
          aggA._1, aggA._2, aggA._3, identical),
        (label, pLo, pHi, estE6, "orders_customer_first",
          chosen == "orders_customer_first", estOrdCust, actOrdCust,
          aggA._1, aggA._2, aggA._3, identical))
    }
    out.toDF("pred_label", "p_lo", "p_hi", "est_filtered_e6",
      "order_label", "chosen", "est_intermediate", "actual_intermediate",
      "n_rows", "sum_qty", "sum_cust", "orders_identical")
  }

  /** The sampled-route safety margin (the q227 `margin_robust` contract
    * re-derived for sampling error): the choice between est_li (carrying
    * a ±3/√c relative band from the c-row sample behind it) and est_oc
    * (exact store stats, no band) is SAFE when the margin exceeds the
    * band — |est_li − est_oc| > 3·est_li/√c, squared to stay in integer
    * math: (est_li − est_oc)²·c > 9·est_li². BigInt products on purpose
    * (two warehouse-scale estimates square past a Long). Exposed for the
    * planted near-margin spec. */
  private[graft] def sampledMarginRobust(estLi: Long, estOc: Long,
                                         c: Long): Boolean = {
    require(c > 0, s"need positive sample support; got $c")
    val m = BigInt(estLi) - BigInt(estOc)
    m * m * BigInt(c) > BigInt(9) * BigInt(estLi) * BigInt(estLi)
  }

  /** A64 [EXT] — SAMPLED HISTOGRAM ROUTE (q246): A61 gave ANALYZE a
    * sampled NDV route; the equi-depth histograms driving q207/q232 were
    * still full-scan builds — the one statistic left whose construction
    * touches every row. This row builds the histogram from the
    * deterministic 1/8 l_orderkey key partition (counts scaled ×8; the
    * q235/q242 sampling discipline — a key partition is arithmetic,
    * never engine RNG), measures it against the exact histogram on
    * q232's two-point predicate sweep (est + err_ppm per route,
    * oracle-re-derived), and CONSUMES it the way q232 consumes the
    * exact one: the filtered join-order decision priced from the
    * sampled estimate, with the sample-induced error band propagated
    * into the decision the way q227 propagates the NDV 3σ band —
    * [[sampledMarginRobust]] says whether the margin between
    * est(li′⋈ord) and est(ord⋈cust) clears the ±3/√c band of the c
    * sampled rows behind the estimate; when it does not, the route
    * FALLS BACK to the exact histogram (`route` = exact_fallback, the
    * operational contract a production ANALYZE ships). The executed
    * answer is the routed choice's order at full size; predicate bounds
    * come from the persisted ANALYZE store's min/max (no live scan
    * feeds any decision input).
    *
    * Scale: the sampled build reads 1/mod of the fact table ONCE per
    * snapshot (boundary placement degrades with the sample, count mass
    * stays unbiased under ×mod scaling); the decision stays
    * |buckets|-sized; mod grows freely with the table because the
    * band check keeps the route honest — exactly the q242 Chao story
    * told for histograms. */
  def sampledHistogramRouteAudit(spark: SparkSession, dir: String,
                                 nBuckets: Int = 16,
                                 mod: Long = 8L): DataFrame = {
    require(mod >= 2L, s"need a real sample; got mod=$mod")
    val store = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv"), col("min_val"), col("max_val")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    val (nOrd, _, _, _) = store(("orders", "o_custkey"))
    val (_, ndvOo, _, _) = store(("orders", "o_orderkey"))
    val (_, ndvOc, _, _) = store(("orders", "o_custkey"))
    val (nCust, ndvCc, _, _) = store(("customer", "c_custkey"))
    val (_, _, minS, maxS) = store(("lineitem", "l_orderkey"))
    val (lo, hi) = (minS.toLong, maxS.toLong)
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val liKey = li.select(col("l_orderkey").cast("long").as("v"))
    val histExact = ensureLiKeyHist(spark, dir, nBuckets)
    // sampled build: the 1/mod key partition, counts scaled ×mod before
    // the equi-depth fold (scaling commutes with the bucket rank —
    // ⌊(m·c·B)/(m·n)⌋ = ⌊c·B/n⌋)
    val histSampled = ensureLiKeyHistSampled(spark, dir, mod, nBuckets)
    val d = hi - lo + 1L
    val predDefs = Seq(
      ("narrow", lo, lo + d / 50L - 1L),
      ("wide", lo, lo + 4L * d / 5L - 1L))
    val estOrdCust = estimateJoinRows(nOrd, ndvOc, nCust, ndvCc)
    import spark.implicits._
    val out = parFlatMap(predDefs) { case (label, pLo, pHi) =>
      val pred = spark.range(1).select(lit(0L).as("pred_id"),
        lit(pLo).as("p_lo"), lit(pHi).as("p_hi"))
      def estOf(hist: DataFrame): Long =
        estimateRanges(pred, hist, "est_e6").head().getAs[Long]("est_e6")
      val (estE, estS) = (estOf(histExact), estOf(histSampled))
      val actual = liKey.filter(col("v").between(pLo, pHi)).count()
      def err(est: Long): Long =
        if (actual > 0L) math.abs(est - actual * 1000000L) / actual
        else est
      def liOrdEst(estE6: Long): Long = {
        val f = estE6 / 1000000L
        estimateJoinRows(f, math.max(1L, math.min(f, ndvOo)), nOrd, ndvOo)
      }
      val (estLiE, estLiS) = (liOrdEst(estE), liOrdEst(estS))
      val chosenE = chooseJoinOrder(estLiE, estOrdCust)
      val chosenS = chooseJoinOrder(estLiS, estOrdCust)
      // c = the UNSCALED sampled support behind the estimate
      val cS = math.max(1L, estS / (mod * 1000000L))
      val robust = sampledMarginRobust(estLiS, estOrdCust, cS)
      val route = if (robust) "sampled" else "exact_fallback"
      val chosenUsed = if (robust) chosenS else chosenE
      val agrees = chosenS == chosenE
      val liF = li.filter(col("l_orderkey").cast("long").between(pLo, pHi))
      val onLi = col("l_orderkey") === col("o_orderkey")
      val onCust = col("o_custkey") === col("c_custkey")
      val full =
        if (chosenUsed == "lineitem_orders_first")
          liF.join(ord, onLi).join(cust, onCust)
        else liF.join(ord.join(cust, onCust), onLi)
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("c_custkey").cast("long"))).head()
      val (n, sq, sc) = (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
      Seq(
        (label, pLo, pHi, "exact", estE, err(estE), estLiE, chosenE,
          robust, route, agrees, n, sq, sc),
        (label, pLo, pHi, "sampled", estS, err(estS), estLiS, chosenS,
          robust, route, agrees, n, sq, sc))
    }
    out.toDF("pred_label", "p_lo", "p_hi", "route", "est_filtered_e6",
      "err_ppm", "est_intermediate", "chosen_order", "margin_robust",
      "route_used", "choice_agrees", "n_rows", "sum_qty", "sum_cust")
  }

  /** One dynamic-programming cell of the Selinger chain enumeration:
    * estimated cardinality of the interval's join, the C_out cost of its
    * best tree (Σ of estimated intermediate sizes over the tree —
    * Selinger et al., "Access Path Selection in a Relational DBMS",
    * SIGMOD 1979; the cost model every textbook enumerator starts from),
    * the winning split point (−1 for leaves), and the parenthesized best
    * plan. */
  private[graft] case class DpCell(est: Long, cost: Long, split: Int,
                                   plan: String)

  /** Selinger DP over a JOIN CHAIN: tables t0 ⋈ t1 ⋈ … ⋈ t(n−1) where
    * edges exist only between neighbors, so the connected subsets are
    * exactly the intervals [i, j] and the DP is O(n³) over O(n²) cells —
    * the smallest real instance of the enumeration a production CBO runs
    * over arbitrary join graphs. est([i,j]) = Π rows / Π edge divisors
    * (the q208 formula chained under independence), computed in BigInt
    * and divided ONCE (staged integer division truncates differently —
    * the oracle divides full products, so must we). Ties break to the
    * FIRST minimal split (smallest split index) — the deterministic
    * order the oracle's CASE chain reproduces. Exposed for the
    * planted-stats flip spec. */
  private[graft] def selingerChainDp(rows: Seq[(String, Long)],
                                     edgeDivisors: Seq[Long])
      : Map[(Int, Int), DpCell] = {
    val n = rows.length
    require(n >= 2 && edgeDivisors.length == n - 1,
      s"need a chain: ${rows.length} tables, ${edgeDivisors.length} edges")
    require(edgeDivisors.forall(_ > 0), s"need positive divisors")
    val memo = scala.collection.mutable.Map.empty[(Int, Int), DpCell]
    def est(i: Int, j: Int): Long =
      ((i to j).map(k => BigInt(rows(k)._2)).product /
        (i until j).map(k => BigInt(edgeDivisors(k))).product).toLong
    for (i <- 0 until n)
      memo((i, i)) = DpCell(rows(i)._2, 0L, -1, rows(i)._1)
    for (len <- 2 to n; i <- 0 to n - len) {
      val j = i + len - 1
      val e = est(i, j)
      val (cost, split, plan) = (i until j).map { s =>
        val (l, r) = (memo((i, s)), memo((s + 1, j)))
        (l.cost + r.cost, s, s"(${l.plan}*${r.plan})")
      }.minBy(_._1) // minBy keeps the FIRST minimum — the tie-break
      memo((i, j)) = DpCell(e, cost + e, split, plan)
    }
    memo.toMap
  }

  /** J20 [EXT] — SELINGER JOIN ENUMERATION FROM PERSISTED STATS (q230):
    * q226 chooses between the two associations of a 3-table join; this
    * row runs the real thing — the dynamic program a cost-based
    * optimizer runs over every join it plans — on the 4-table chain
    * lineitem⋈orders⋈customer⋈nation, with every input read from the
    * persisted ANALYZE store (row counts + the six join-key ndv — the
    * q224/q226 discipline, no live recount). Output: the ENTIRE DP
    * table, one row per connected subset (interval) — estimated join
    * cardinality, best C_out cost, the winning parenthesized tree — plus
    * the executed proof columns: the engine BUILDS the chosen tree (a
    * recursive join construction from the DP's split points), executes
    * it AND the canonical left-deep tree, and every row carries the
    * 4-table aggregate both trees returned (identical or the row set
    * can't hash-match). The oracle re-derives the whole table: estimates
    * as single-division integer products, costs/plans through the same
    * first-minimal-split CASE chain, the aggregate from the raw join —
    * a hash match proves the engine enumerated, costed, chose, and ran
    * the plan its own persisted statistics price as cheapest.
    *
    * On this fixture the DP picks the fully right-deep tree
    * (fact-last: (lineitem*(orders*(customer*nation)))) — C_out 76.5k
    * at sf0.01 vs 135k for the canonical left-deep — which is exactly
    * the textbook result for a fact-dim chain; the spec plants a tiny
    * fact side to flip it. Scale: the DP is O(n³) on metadata; the
    * execution arms are the audit price (two joins of the same 4
    * tables; hint-free — q226 owns the operator-shape proof, this row
    * owns the TREE). */
  def cboJoinEnumerationAudit(spark: SparkSession, dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val chain = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")))
    val divisors = Seq(
      math.max(ndvOf("lineitem", "l_orderkey"), ndvOf("orders", "o_orderkey")),
      math.max(ndvOf("orders", "o_custkey"), ndvOf("customer", "c_custkey")),
      math.max(ndvOf("customer", "c_nationkey"), ndvOf("nation", "n_nationkey")))
    val dp = selingerChainDp(chain, divisors)
    // build and run the chosen tree + the canonical left-deep reference
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir))
    val edgeCond = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"))
    def build(i: Int, j: Int): DataFrame =
      if (i == j) dfs(i)
      else {
        val s = dp((i, j)).split
        build(i, s).join(build(s + 1, j), edgeCond(s))
      }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("n_nationkey").cast("long"))).head()
      // null-guarded: an empty chain join sums to NULL, not 0
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val chosen = agg(build(0, chain.length - 1))
    val leftDeep = agg((1 until dfs.length).foldLeft(dfs.head) {
      (acc, k) => acc.join(dfs(k), edgeCond(k - 1))
    })
    require(chosen == leftDeep,
      s"join tree changed the answer: $chosen vs $leftDeep")
    import spark.implicits._
    dp.toSeq.sortBy { case ((i, j), _) => (i, j) }.map {
      case ((i, j), cell) =>
        (chain.slice(i, j + 1).map(_._1).mkString(","), (j - i + 1).toLong,
          cell.est, cell.cost, cell.plan,
          chosen._1, chosen._2, chosen._3)
    }.toDF("subset", "n_tables", "est_rows", "best_cost", "best_plan",
      "n_rows", "sum_qty", "sum_nat")
  }

  /** One cell of the join-GRAPH enumeration: estimated cardinality, best
    * C_out cost, the winning cut edge (−1 for leaves), the two component
    * bitmasks, and the parenthesized best plan. */
  private[graft] case class GraphDpCell(est: Long, cost: Long, cutEdge: Int,
                                        leftMask: Int, rightMask: Int,
                                        plan: String)

  /** Selinger DP over an ACYCLIC JOIN GRAPH (the csg-cmp generalization
    * of [[selingerChainDp]], restricted to trees — the warehouse
    * star/snowflake shape): tables are graph nodes, equi-join edges
    * carry the q208 divisor, and the DP runs over every CONNECTED
    * subset (enumerated by ascending bitmask, so sub-results always
    * exist). For a tree, the csg-cmp pairs of a connected subset are
    * exactly its induced-edge cuts: removing edge e splits the subset
    * into the two connected components around e's endpoints — so
    * candidate splits are enumerated by ascending CUT-EDGE index and
    * ties break to the FIRST minimal edge, the deterministic order the
    * oracle's CASE chain replays (a cyclic graph would need the full
    * Moerkotte–Neumann csg-cmp enumeration; the acyclicity is
    * `require`d, never assumed). est(S) = Π rows / Π induced-edge
    * divisors, BigInt product divided ONCE (staged integer division
    * truncates differently from the oracle's full-product division);
    * cost = Selinger C_out. Plan strings put the component containing
    * the smallest table index on the left. Exposed for the
    * planted-stats flip spec. */
  private[graft] def selingerGraphDp(tables: Seq[(String, Long)],
                                     edges: Seq[(Int, Int, Long)])
      : Map[Int, GraphDpCell] = {
    val n = tables.length
    require(n >= 2 && n <= 20, s"need 2..20 tables; got $n")
    require(edges.nonEmpty && edges.forall { case (a, b, d) =>
      a >= 0 && a < n && b >= 0 && b < n && a != b && d > 0
    }, s"edges must connect distinct in-range tables with positive divisors")
    // acyclicity: union-find over the edge list
    val uf = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (uf(x) == x) x else { uf(x) = find(uf(x)); uf(x) }
    edges.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      require(ra != rb, s"join graph must be acyclic (tree/forest); " +
        s"edge ($a,$b) closes a cycle")
      uf(ra) = rb
    }
    def inMask(i: Int, mask: Int): Boolean = (mask & (1 << i)) != 0
    def induced(mask: Int): Seq[Int] = edges.indices.filter { e =>
      inMask(edges(e)._1, mask) && inMask(edges(e)._2, mask)
    }
    // component of `from` inside `mask` with edge `cut` removed
    def component(from: Int, mask: Int, cut: Int): Int = {
      var comp = 1 << from
      var frontier = List(from)
      while (frontier.nonEmpty) {
        val v = frontier.head; frontier = frontier.tail
        edges.indices.foreach { e =>
          if (e != cut) {
            val (a, b, _) = edges(e)
            val next = if (a == v) b else if (b == v) a else -1
            if (next >= 0 && inMask(next, mask) && !inMask(next, comp)) {
              comp |= 1 << next
              frontier = next :: frontier
            }
          }
        }
      }
      comp
    }
    def est(mask: Int): Long = {
      val num = tables.indices.filter(inMask(_, mask))
        .map(i => BigInt(tables(i)._2)).product
      val den = induced(mask).map(e => BigInt(edges(e)._3)).product
      (num / den).toLong
    }
    val memo = scala.collection.mutable.Map.empty[Int, GraphDpCell]
    tables.indices.foreach { i =>
      memo(1 << i) = GraphDpCell(tables(i)._2, 0L, -1, 0, 0, tables(i)._1)
    }
    // ascending mask order: every proper submask is numerically smaller,
    // so component cells always exist when a composite is reached
    (3 to (1 << n) - 1).foreach { mask =>
      if (java.lang.Integer.bitCount(mask) >= 2) {
        val cuts = induced(mask)
        // connected ⇔ the induced tree has |S|−1 edges
        if (cuts.length == java.lang.Integer.bitCount(mask) - 1) {
          val candidates = cuts.map { e =>
            val compA = component(edges(e)._1, mask, e)
            val compB = mask & ~compA
            val (l, r) =
              if (java.lang.Integer.numberOfTrailingZeros(compA) <
                  java.lang.Integer.numberOfTrailingZeros(compB))
                (compA, compB)
              else (compB, compA)
            (memo(l).cost + memo(r).cost, e, l, r,
              s"(${memo(l).plan}*${memo(r).plan})")
          }
          val (cost, e, l, r, plan) = candidates.minBy(_._1) // first min
          val eMask = est(mask)
          memo(mask) = GraphDpCell(eMask, cost + eMask, e, l, r, plan)
        }
      }
    }
    memo.toMap
  }

  /** J27 [EXT] — SELINGER ENUMERATION OVER A JOIN GRAPH (q245): q230's
    * chain DP is an interval DP — correct for a chain, but the actual
    * 100 TB warehouse query is a STAR (fact joined to several dims),
    * whose connected subsets are not intervals. This row runs the
    * csg-cmp generalization ([[selingerGraphDp]]) on the 5-table star
    * lineitem ⋈ orders ⋈ customer + part + supplier (edges
    * l_orderkey/o_custkey/l_partkey/l_suppkey — orders chains on to
    * customer, making it a snowflake arm), every row count and all
    * eight join-key ndv read from the persisted ANALYZE store (the
    * q224/q226/q230 discipline — `DefaultStatsSpecs` gained
    * p_partkey/s_suppkey for exactly this). Output: the ENTIRE DP table
    * — one row per CONNECTED subset (17 of the 31 non-empty subsets;
    * disconnected ones have no join without a cartesian product and are
    * correctly absent) with estimated cardinality, best C_out cost, and
    * the winning parenthesized tree — plus the executed proof: the
    * engine BUILDS the chosen tree from the DP's cut edges, runs it AND
    * the canonical left-deep tree, and emits both aggregates with
    * `trees_identical` as a COLUMN (the q240 failure surface). On this
    * fixture the winner is genuinely BUSHY —
    * (((lineitem*supplier)*part)*(orders*customer)) — the shape no
    * left-deep-only or chain-only enumerator can produce, found because
    * the (orders*customer) arm prices below lineitem scale; the spec
    * plants stats that flip the winner deep. The oracle re-derives the
    * whole table: estimates as single-division integer products over
    * induced edges, costs/plans through the same first-minimal-cut-edge
    * CASE chain, the aggregate from the raw 5-way join. Scale: the DP
    * is O(2ⁿ·n) on metadata (n = tables in ONE query, single digits);
    * the two execution arms are the once-per-advisor-change audit
    * price — hint-free, q226 owns operator shapes, this row owns the
    * TREE. */
  def cboGraphEnumerationAudit(spark: SparkSession, dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val tables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("part", rowsOf("part", "p_partkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (0, 3, math.max(ndvOf("lineitem", "l_partkey"),
        ndvOf("part", "p_partkey"))),
      (0, 4, math.max(ndvOf("lineitem", "l_suppkey"),
        ndvOf("supplier", "s_suppkey"))))
    val dp = selingerGraphDp(tables, edges)
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.part(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("l_partkey") === col("p_partkey"),
      col("l_suppkey") === col("s_suppkey"))
    def build(mask: Int): DataFrame = {
      val cell = dp(mask)
      if (cell.cutEdge < 0) dfs(java.lang.Integer.numberOfTrailingZeros(mask))
      else build(cell.leftMask).join(build(cell.rightMask),
        conds(cell.cutEdge))
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      // null-guarded like the cyclic/feedback-graph siblings: an empty
      // 5-way join (degenerate dataset) sums to NULL, not 0
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val fullMask = (1 << tables.length) - 1
    val chosen = agg(build(fullMask))
    val leftDeep = agg(
      dfs.head.join(dfs(1), conds(0)).join(dfs(2), conds(1))
        .join(dfs(3), conds(2)).join(dfs(4), conds(3)))
    val identical = chosen == leftDeep
    import spark.implicits._
    dp.toSeq
      .sortBy { case (mask, _) =>
        (java.lang.Integer.bitCount(mask), mask)
      }
      .map { case (mask, cell) =>
        val names = tables.indices.filter(i => (mask & (1 << i)) != 0)
          .map(tables(_)._1).mkString(",")
        (names, java.lang.Integer.bitCount(mask).toLong, cell.est,
          cell.cost, cell.plan, chosen._1, chosen._2, chosen._3, identical)
      }
      .toDF("subset", "n_tables", "est_rows", "best_cost", "best_plan",
        "n_rows", "sum_qty", "sum_supp", "trees_identical")
  }

  /** One cell of the GENERAL csg-cmp enumeration: estimated
    * cardinality, best C_out cost, the winning components, EVERY cross
    * edge between them (a cyclic graph's split can cross several — the
    * executed join must apply them all), and the plan string. */
  private[graft] case class CcpCell(est: Long, cost: Long, leftMask: Int,
                                    rightMask: Int, crossEdges: Seq[Int],
                                    plan: String)

  /** The full Moerkotte–Neumann-style csg-cmp DP — [[selingerGraphDp]]
    * without the acyclicity restriction: candidate splits of a
    * connected subset S are ALL partitions (S1, S2) with S1 containing
    * S's lowest table index (each split once), both sides connected,
    * and ≥ 1 cross edge; enumerated by ASCENDING S1 bitmask with
    * first-minimal ties — the deterministic order the oracle's CASE
    * chain replays. est(S) = Π rows / Π ALL induced-edge divisors
    * (cycle-closing predicates multiply in — the textbook independence
    * model a production CBO applies), BigInt divided once. Plan strings
    * put S1 (which holds the globally smallest index) left. The tree
    * specialization ([[selingerGraphDp]], O(edges) splits per subset
    * via edge cuts) remains the fast path for acyclic graphs; this is
    * the generic route a cyclic query needs. Split enumeration walks
    * proper submasks (`s1 = (s1 − 1) & mask`), so the total work is the
    * textbook O(3ⁿ) — ~43e6 iterations at the admitted n = 16 bound,
    * driver-affordable metadata work. */
  private[graft] def dpCcp(tables: Seq[(String, Long)],
                           edges: Seq[(Int, Int, Long)])
      : Map[Int, CcpCell] = {
    val n = tables.length
    require(n >= 2 && n <= 16, s"need 2..16 tables; got $n")
    require(edges.nonEmpty && edges.forall { case (a, b, d) =>
      a >= 0 && a < n && b >= 0 && b < n && a != b && d > 0
    }, s"edges must connect distinct in-range tables with positive divisors")
    def inMask(i: Int, mask: Int): Boolean = (mask & (1 << i)) != 0
    def induced(mask: Int): Seq[Int] = edges.indices.filter { e =>
      inMask(edges(e)._1, mask) && inMask(edges(e)._2, mask)
    }
    def connected(mask: Int): Boolean = {
      if (mask == 0) return false
      val seed = java.lang.Integer.numberOfTrailingZeros(mask)
      var comp = 1 << seed
      var frontier = List(seed)
      while (frontier.nonEmpty) {
        val v = frontier.head; frontier = frontier.tail
        edges.foreach { case (a, b, _) =>
          val next = if (a == v) b else if (b == v) a else -1
          if (next >= 0 && inMask(next, mask) && !inMask(next, comp)) {
            comp |= 1 << next
            frontier = next :: frontier
          }
        }
      }
      comp == mask
    }
    def est(mask: Int): Long = {
      val num = tables.indices.filter(inMask(_, mask))
        .map(i => BigInt(tables(i)._2)).product
      val den = induced(mask).map(e => BigInt(edges(e)._3)).product
      (num / den).toLong
    }
    val memo = scala.collection.mutable.Map.empty[Int, CcpCell]
    tables.indices.foreach { i =>
      memo(1 << i) = CcpCell(tables(i)._2, 0L, 0, 0, Nil, tables(i)._1)
    }
    (3 to (1 << n) - 1).foreach { mask =>
      if (java.lang.Integer.bitCount(mask) >= 2 && connected(mask)) {
        val low = 1 << java.lang.Integer.numberOfTrailingZeros(mask)
        // proper submasks of `mask` via s1 = (s1 − 1) & mask — Σ over
        // connected masks is the true O(3ⁿ) the scaladoc claims (the
        // r18 form iterated EVERY integer below the mask and filtered:
        // O(4ⁿ), ~4e9 driver iterations at the admitted n = 16). The
        // trick walks DESCENDING; the buffer is reversed so candidates
        // enumerate by ASCENDING S1 bitmask with first-minimal ties —
        // the exact order the oracle's CASE chain replays (pinned
        // cell-for-cell against the old enumeration by spec).
        val subs = scala.collection.mutable.ArrayBuffer.empty[Int]
        var sub = (mask - 1) & mask
        while (sub != 0) { subs += sub; sub = (sub - 1) & mask }
        val candidates = subs.reverseIterator.flatMap { s1 =>
          val s2 = mask & ~s1
          // s1 is a proper non-empty submask by construction, so s2 ≠ 0;
          // memo membership ⇔ the side is connected (singles + composites)
          if ((s1 & low) != 0 && memo.contains(s1) && memo.contains(s2)) {
            val cross = edges.indices.filter { e =>
              val (a, b, _) = edges(e)
              (inMask(a, s1) && inMask(b, s2)) ||
                (inMask(a, s2) && inMask(b, s1))
            }
            if (cross.nonEmpty)
              Some((memo(s1).cost + memo(s2).cost, s1, s2, cross,
                s"(${memo(s1).plan}*${memo(s2).plan})"))
            else None
          } else None
        }.toVector
        require(candidates.nonEmpty, s"connected subset $mask has no split")
        val (cost, s1, s2, cross, plan) = candidates.minBy(_._1) // first min
        val eMask = est(mask)
        memo(mask) = CcpCell(eMask, cost + eMask, s1, s2, cross, plan)
      }
    }
    memo.toMap
  }

  /** J30 [EXT] — CSG-CMP ENUMERATION ON A CYCLIC JOIN GRAPH (q249):
    * J27's tree DP declared cyclic graphs out of scope; this row runs
    * the general enumeration ([[dpCcp]]) on the classic cyclic instance
    * — TPC-H Q5's 5-cycle lineitem–orders–customer–nation–supplier–
    * lineitem (the local-supplier constraint c_nationkey = s_nationkey
    * expressed through the shared nation edge closes the cycle). Every
    * row count and all the join-key ndv come from the persisted ANALYZE
    * store (`DefaultStatsSpecs` gained s_nationkey). The cyclic
    * specifics this row exists to pin:
    *
    *  - connected subsets are the cycle's ARCS (21 of 31), enumerated
    *    without any interval/edge-cut shortcut;
    *  - the FULL set's estimate divides by ALL FIVE edge divisors —
    *    the cycle-closing predicate multiplies in, pricing the join
    *    BELOW the fact count (est 240 vs 6 000 lineitem rows at
    *    sf0.001 — what makes Q5-shaped queries cheap);
    *  - a split of a cyclic subset can cross TWO edges, and the
    *    executed join applies BOTH predicates (`CcpCell.crossEdges`) —
    *    the correctness trap a naive single-condition builder falls
    *    into;
    *  - candidate splits enumerate by ascending S1 bitmask (no cut
    *    edge exists to order by), first-minimal ties, oracle-replayed.
    *
    * Output: the full 21-row DP table plus the executed proof — the
    * chosen tree built from the cells' components with ALL cross-edge
    * conditions, run against the canonical left-deep join (which
    * applies both N–S and S–L predicates at the supplier join),
    * `trees_identical` emitted. Oracle re-derives the entire table via
    * a generated per-cell CASE chain. Scale: O(3ⁿ) on metadata with n
    * = tables in ONE query; execution arms are the audit price. */
  def cboCyclicEnumerationAudit(spark: SparkSession, dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val tables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (2, 3, math.max(ndvOf("customer", "c_nationkey"),
        ndvOf("nation", "n_nationkey"))),
      (3, 4, math.max(ndvOf("nation", "n_nationkey"),
        ndvOf("supplier", "s_nationkey"))),
      (4, 0, math.max(ndvOf("supplier", "s_suppkey"),
        ndvOf("lineitem", "l_suppkey"))))
    val dp = dpCcp(tables, edges)
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"),
      col("n_nationkey") === col("s_nationkey"),
      col("s_suppkey") === col("l_suppkey"))
    def build(mask: Int): DataFrame = {
      val cell = dp(mask)
      if (cell.crossEdges.isEmpty)
        dfs(java.lang.Integer.numberOfTrailingZeros(mask))
      else build(cell.leftMask).join(build(cell.rightMask),
        cell.crossEdges.map(conds).reduce(_ && _))
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val fullMask = (1 << tables.length) - 1
    val chosen = agg(build(fullMask))
    // canonical left-deep: join tables in index order, each step
    // applying EVERY edge that becomes internal (the supplier join
    // carries both the N–S and S–L predicates)
    val leftDeep = agg((1 until tables.length).foldLeft(dfs.head) {
      (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = edges.indices.filter { e =>
          val (a, b, _) = edges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        acc.join(dfs(k), cs.map(conds).reduce(_ && _))
    })
    val identical = chosen == leftDeep
    import spark.implicits._
    dp.toSeq
      .sortBy { case (mask, _) =>
        (java.lang.Integer.bitCount(mask), mask)
      }
      .map { case (mask, cell) =>
        val names = tables.indices.filter(i => (mask & (1 << i)) != 0)
          .map(tables(_)._1).mkString(",")
        (names, java.lang.Integer.bitCount(mask).toLong, cell.est,
          cell.cost, cell.plan, chosen._1, chosen._2, chosen._3, identical)
      }
      .toDF("subset", "n_tables", "est_rows", "best_cost", "best_plan",
        "n_rows", "sum_qty", "sum_supp", "trees_identical")
  }

  /** One cell of the OPERATOR-AWARE enumeration: estimated cardinality,
    * best total cost (C_out + β·exchanged), the winning cut edge, the
    * two component bitmasks, the PHYSICAL operator the winning join
    * runs ("broadcast"/"shuffle"; "leaf" for singles), the rows that
    * join exchanges under its operator, and the plan string. */
  private[graft] case class PhysDpCell(est: Long, cost: Long, cutEdge: Int,
                                       leftMask: Int, rightMask: Int,
                                       op: String, exchanged: Long,
                                       plan: String)

  /** The default physical-operator parameters for
    * [[selingerPhysicalDp]]: a join whose smaller side is estimated at
    * ≤ `PhysBroadcastLimitRows` broadcasts (the q221/q224 row-threshold
    * rule as the enumerator's operator model), and exchanged rows are
    * charged at β = `PhysBetaE2`/100 of a produced row (β = 1: moving
    * a row across the cluster priced like materializing one — the
    * deliberately simple first form; the honest coupling is the
    * STRUCTURE, not the coefficient). */
  private[graft] val PhysBroadcastLimitRows = 10000L
  private[graft] val PhysBetaE2 = 100L

  /** Selinger DP over an acyclic join graph WITH the physical-operator
    * dimension priced inside the cells — the System-R access-path
    * coupling [[selingerGraphDp]] lacks (Selinger et al. 1979 priced
    * access paths per DP cell; C_out alone cannot see that a tree
    * keeping one side under the broadcast threshold avoids an
    * exchange). Identical enumeration order to the tree DP (connected
    * subsets ascending, splits by ascending cut-edge index,
    * first-minimal ties — the oracle's CASE-chain order), but each
    * candidate split is costed
    *
    *   cost(L) + cost(R) + est(S) + β·exchanged(L, R)
    *
    * where the operator follows the threshold rule: min(est_L, est_R)
    * ≤ `bcastLimit` → broadcast, exchanged = the smaller side (the
    * build side ships; the big side stays in place); otherwise →
    * shuffle, exchanged = est_L + est_R (both sides repartition on the
    * join key). β is integer millionths-free: `betaE2`/100, applied as
    * a single BigInt product-and-divide so the oracle's HUGEINT `//`
    * reproduces every truncation. With betaE2 = 0 this reduces CELL FOR
    * CELL to [[selingerGraphDp]] (same candidates, same order, same
    * tie-breaks — pinned by spec), which is exactly the point: the
    * operator term is the only new force, so a plan difference between
    * the two pricings is ATTRIBUTABLE. Exposed for the planted-flip
    * spec. */
  private[graft] def selingerPhysicalDp(tables: Seq[(String, Long)],
                                        edges: Seq[(Int, Int, Long)],
                                        bcastLimit: Long = PhysBroadcastLimitRows,
                                        betaE2: Long = PhysBetaE2)
      : Map[Int, PhysDpCell] = {
    val n = tables.length
    require(n >= 2 && n <= 20, s"need 2..20 tables; got $n")
    require(bcastLimit >= 0L && betaE2 >= 0L,
      s"need non-negative limit/beta; got ($bcastLimit, $betaE2)")
    require(edges.nonEmpty && edges.forall { case (a, b, d) =>
      a >= 0 && a < n && b >= 0 && b < n && a != b && d > 0
    }, s"edges must connect distinct in-range tables with positive divisors")
    val uf = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (uf(x) == x) x else { uf(x) = find(uf(x)); uf(x) }
    edges.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      require(ra != rb, s"join graph must be acyclic (tree/forest); " +
        s"edge ($a,$b) closes a cycle")
      uf(ra) = rb
    }
    def inMask(i: Int, mask: Int): Boolean = (mask & (1 << i)) != 0
    def induced(mask: Int): Seq[Int] = edges.indices.filter { e =>
      inMask(edges(e)._1, mask) && inMask(edges(e)._2, mask)
    }
    def component(from: Int, mask: Int, cut: Int): Int = {
      var comp = 1 << from
      var frontier = List(from)
      while (frontier.nonEmpty) {
        val v = frontier.head; frontier = frontier.tail
        edges.indices.foreach { e =>
          if (e != cut) {
            val (a, b, _) = edges(e)
            val next = if (a == v) b else if (b == v) a else -1
            if (next >= 0 && inMask(next, mask) && !inMask(next, comp)) {
              comp |= 1 << next
              frontier = next :: frontier
            }
          }
        }
      }
      comp
    }
    def est(mask: Int): Long = {
      val num = tables.indices.filter(inMask(_, mask))
        .map(i => BigInt(tables(i)._2)).product
      val den = induced(mask).map(e => BigInt(edges(e)._3)).product
      (num / den).toLong
    }
    val memo = scala.collection.mutable.Map.empty[Int, PhysDpCell]
    tables.indices.foreach { i =>
      memo(1 << i) = PhysDpCell(tables(i)._2, 0L, -1, 0, 0, "leaf", 0L,
        tables(i)._1)
    }
    (3 to (1 << n) - 1).foreach { mask =>
      if (java.lang.Integer.bitCount(mask) >= 2) {
        val cuts = induced(mask)
        if (cuts.length == java.lang.Integer.bitCount(mask) - 1) {
          val candidates = cuts.map { e =>
            val compA = component(edges(e)._1, mask, e)
            val compB = mask & ~compA
            val (l, r) =
              if (java.lang.Integer.numberOfTrailingZeros(compA) <
                  java.lang.Integer.numberOfTrailingZeros(compB))
                (compA, compB)
              else (compB, compA)
            val (estL, estR) = (memo(l).est, memo(r).est)
            val small = math.min(estL, estR)
            val (op, exchanged) =
              if (small <= bcastLimit) ("broadcast", small)
              else ("shuffle", estL + estR)
            val exCost =
              (BigInt(exchanged) * BigInt(betaE2) / BigInt(100L)).toLong
            (memo(l).cost + memo(r).cost + exCost, e, l, r, op, exchanged,
              s"(${memo(l).plan}*${memo(r).plan})")
          }
          val (cost, e, l, r, op, exchanged, plan) =
            candidates.minBy(_._1) // first min — the oracle's tie order
          val eMask = est(mask)
          memo(mask) = PhysDpCell(eMask, cost + eMask, e, l, r, op,
            exchanged, plan)
        }
      }
    }
    memo.toMap
  }

  /** J31 [EXT] — PHYSICAL OPERATORS PRICED INSIDE THE ENUMERATOR
    * (q251): every prior enumeration row (q230/q245/q248/q249)
    * minimizes C_out and decides broadcast-vs-shuffle OUTSIDE the DP
    * (q221/q224's threshold consumers) — but System R's actual
    * contribution was pricing access paths PER CELL, so a plan that
    * keeps a broadcastable side small can beat a lower-C_out order that
    * forces two exchanges. This row runs [[selingerPhysicalDp]] on the
    * q245 star (same tables, same edges, all inputs from the persisted
    * ANALYZE store) TWICE over identical inputs — betaE2 = 0 (pure
    * C_out: reduces cell-for-cell to q245's DP) vs the default β = 1 —
    * and emits, per connected subset: the estimate, the C_out cost and
    * plan, the operator-aware cost and plan, the cell's chosen PHYSICAL
    * OPERATOR, and the rows its winning join exchanges under that
    * operator. `plans_differ` (full set: did the operator term change
    * the chosen tree?) is derived, never hard-coded — on the natural
    * TPC-H-shaped fixture it honestly reads false (e_oc = n_orders
    * exactly on an FK join, so every tree pays the same exchanges; the
    * spec plants a filtered-orders star where the operator-aware winner
    * genuinely differs). Executed proof: the operator-aware tree runs
    * at FULL size with each join HINTED to the operator its DP cell
    * chose (broadcast() on the smaller-estimate side — the annotation
    * is real, not decorative), its aggregate is the answer; BOTH
    * winners additionally execute on the deterministic 1/8 key
    * partition (the q248 sampled-arm discipline), identity emitted as
    * `trees_identical`. The oracle re-derives both complete DP tables
    * via a GENERATED per-cell CASE chain (the cyclicDpSql discipline —
    * the generator replays the engine's enumeration symbolically,
    * including every exchange CASE and tie-break) plus the raw star
    * aggregate.
    *
    * Scale: the DP stays O(edges) splits per connected subset on
    * metadata; the operator dimension adds O(1) per candidate. The
    * execution arms are the once-per-advisor-change audit price. At
    * 100 TB this is the difference between an optimizer that picks the
    * cheapest JOIN ORDER and one that picks the cheapest PLAN. */
  def cboPhysicalEnumerationAudit(spark: SparkSession, dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val tables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("part", rowsOf("part", "p_partkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (0, 3, math.max(ndvOf("lineitem", "l_partkey"),
        ndvOf("part", "p_partkey"))),
      (0, 4, math.max(ndvOf("lineitem", "l_suppkey"),
        ndvOf("supplier", "s_suppkey"))))
    val dpCout = selingerPhysicalDp(tables, edges, betaE2 = 0L)
    val dpPhys = selingerPhysicalDp(tables, edges)
    val fullMask = (1 << tables.length) - 1
    val plansDiffer = dpCout(fullMask).plan != dpPhys(fullMask).plan
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.part(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("l_partkey") === col("p_partkey"),
      col("l_suppkey") === col("s_suppkey"))
    // the operator annotation is REAL: each join of the executed tree
    // is hinted to what its DP cell chose — broadcast() wraps the
    // smaller-ESTIMATE side (the side the cell priced as shipping)
    def build(dp: Map[Int, PhysDpCell], ds: Seq[DataFrame],
              mask: Int): DataFrame = {
      val cell = dp(mask)
      if (cell.cutEdge < 0) ds(java.lang.Integer.numberOfTrailingZeros(mask))
      else {
        var l = build(dp, ds, cell.leftMask)
        var r = build(dp, ds, cell.rightMask)
        if (cell.op == "broadcast") {
          if (dp(cell.leftMask).est <= dp(cell.rightMask).est)
            l = broadcast(l)
          else r = broadcast(r)
        }
        l.join(r, conds(cell.cutEdge))
      }
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val answer = agg(build(dpPhys, dfs, fullMask))
    // both winners on the 1/8 key partition (keys ≡ 1 mod 8 on
    // l_orderkey AND o_orderkey — closed under the fact edge; dims ride
    // whole, the q248 discipline)
    val li8 = dfs.head.filter(
      pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
    val ord8 = dfs(1).filter(
      pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
    val dfs8 = li8 +: ord8 +: dfs.drop(2)
    val identical =
      agg(build(dpPhys, dfs8, fullMask)) == agg(build(dpCout, dfs8, fullMask))
    import spark.implicits._
    dpPhys.toSeq
      .sortBy { case (mask, _) =>
        (java.lang.Integer.bitCount(mask), mask)
      }
      .map { case (mask, cell) =>
        val names = tables.indices.filter(i => (mask & (1 << i)) != 0)
          .map(tables(_)._1).mkString(",")
        val c0 = dpCout(mask)
        (names, java.lang.Integer.bitCount(mask).toLong, cell.est,
          c0.cost, c0.plan, cell.cost, cell.plan, cell.op, cell.exchanged,
          plansDiffer, answer._1, answer._2, answer._3, identical)
      }
      .toDF("subset", "n_tables", "est_rows", "cout_cost", "cout_plan",
        "phys_cost", "phys_plan", "phys_op", "phys_exchanged",
        "plans_differ", "n_rows", "sum_qty", "sum_supp",
        "trees_identical")
  }

  /** The pure exchange model shared by the q253 predictions, the q254
    * exchange-aware DP, and their specs — exactly Spark's
    * EnsureRequirements as measured by q253: a sort-merge join
    * requires both sides hash-partitioned on EXACTLY its join-key
    * class set; a leaf scan is unpartitioned; each side whose current
    * partitioning differs inserts one Exchange. Input/output
    * partitionings are sorted distinct key-class seqs (Nil =
    * unpartitioned). Returns the join's (output partitioning,
    * cumulative exchange count). */
  private[graft] def joinExch(l: (Seq[Int], Long), r: (Seq[Int], Long),
                              k: Seq[Int]): (Seq[Int], Long) =
    (k, l._2 + r._2 + (if (l._1 == k) 0L else 1L) +
      (if (r._1 == k) 0L else 1L))

  /** J31b [EXT] — EXCHANGE-AWARENESS PROBE (q253): the cheap
    * forerunner of the full interesting-orders work (Selinger 1979's
    * other half). C_out is blind to EXCHANGES: a tree that preserves
    * the join-key partitioning of a prior shuffle avoids a
    * re-Exchange that cardinality cannot see — the cyclic Q5 winner's
    * dim chain joins nation⋈supplier and then customer ON THE SAME
    * nationkey, so the second join reuses the first's partitioning
    * (one new exchange, not two), while the canonical left-deep order
    * switches keys at every step and pays full price. This row
    * MEASURES that: for the star (q245) and cyclic (q249) enumerations
    * it executes the DP-chosen tree and the canonical left-deep tree
    * on the 1/8 key partition (plan SHAPE is size-free; the q235
    * sampled-arm discipline) with broadcast scoped off (exchange
    * structure, not operator choice — q251 owns operators), reads each
    * arm's FINAL adaptive plan (collect() first — the q231 lesson),
    * and emits the counted `Exchange hashpartitioning` /
    * `BroadcastExchange` nodes NEXT TO the arm's C_out — the
    * measurement column that quantifies what C_out misses and sizes
    * the interesting-orders payoff. Each arm also carries
    * `n_shuffle_predicted` from the pure model ([[joinExch]] — the
    * model the q254 exchange-aware DP prices with): the spec pins
    * predicted == measured on all four arms, which is the evidence
    * that the DP's exchange term prices what Spark's
    * EnsureRequirements actually does.
    *
    * Since r20 each arm ALSO carries the SORT columns — Selinger's
    * interesting ORDERS measured the same way the partitionings were
    * (the r19 verdict's task 3): `n_sort_nodes` counts standalone
    * Sort nodes in the arm's final plan, and `n_sort_predicted` is
    * the model's claim that on an equi-join SMJ tree the sort
    * dimension COINCIDES with the partitioning dimension — an SMJ's
    * output is both hash-partitioned and sorted on its join keys, and
    * EnsureRequirements' reuse condition (child output attributes ==
    * required keys) is attribute-identical for the two properties, so
    * predicted sorts ≡ predicted shuffles. MEASURED at sf0.001/0.01:
    * sorts == shuffles on all four SMJ arms (the cyclic chosen arm's
    * nationkey chain saves the SORT exactly where it saves the
    * shuffle, 7 vs 8), and the broadcast arm runs ZERO sorts (BHJ has
    * no ordering requirement). The finding this sizes: a separate
    * sort-order state in the unified DP would duplicate J32's
    * partitioning states cell-for-cell on this operator family —
    * interesting orders come free with interesting partitionings
    * until a sort-requiring non-SMJ operator (window, merge-sink)
    * enters the enumerator.
    *
    * Plan facts are engine-side by nature, so this row is declared
    * ORACLE-EXEMPT (rows-only check; the q19/q22 precedent), pinned
    * instead by the spec: the cyclic chosen arm saves ≥1 shuffle
    * exchange AND ≥1 sort vs left-deep, predictions match
    * measurements on both columns, and both arms' aggregates agree.
    * Since r20 the MODEL half (C_out, plans, predicted counts) is
    * additionally oracle-checked through its own row
    * ([[cboModelPredictionsAudit]], q258) — the exemption here covers
    * only the genuinely engine-side measured node counts.
    *
    * Scale: both arms cost 1/8 of one join, run once per advisor
    * change; the counts come from plan strings, not extra work. */
  def cboExchangeProbeAudit(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val stats = ensureTableStats(spark, dir)
        .select(col("table_name"), col("column_name"), col("n_rows"),
          col("ndv")).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3)))
        .toMap
      def rowsOf(t: String, c: String): Long = stats((t, c))._1
      def ndvOf(t: String, c: String): Long = stats((t, c))._2
      def d(a: (String, String), b: (String, String)): Long =
        math.max(ndvOf(a._1, a._2), ndvOf(b._1, b._2))
      val li8 = Tables.lineitem(spark, dir)
        .filter(pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
      val ord8 = Tables.orders(spark, dir)
        .filter(pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
      def run(arm: DataFrame): (Long, Long, Long, Long, Long) = {
        val agg = arm.agg(count(lit(1)).as("n"),
          coalesce(sum(col("l_quantity").cast("long")), lit(0L)).as("s"))
        val r = agg.collect()(0)
        // an AdaptiveSparkPlan's toString prints the FINAL plan first
        // and then an "== Initial Plan ==" section — counting the whole
        // string double-counts every node; slice to the final section
        val plan = agg.queryExecution.executedPlan.toString()
          .split("== Initial Plan ==")(0)
        val nShuffle =
          "Exchange hashpartitioning".r.findAllIn(plan).length.toLong
        val nBcast = "BroadcastExchange".r.findAllIn(plan).length.toLong
        // standalone Sort nodes print as "+- Sort [keys...]" / "*(k)
        // Sort [...]" — the leading space keeps SortMergeJoin and
        // SortAggregate out of the count
        val nSort = " Sort \\[".r.findAllIn(plan).length.toLong
        (nShuffle, nBcast, nSort, r.getLong(0), r.getLong(1))
      }
      // --- star (the q245 graph) ---
      val starTables = Seq(
        ("lineitem", rowsOf("lineitem", "l_orderkey")),
        ("orders", rowsOf("orders", "o_orderkey")),
        ("customer", rowsOf("customer", "c_custkey")),
        ("part", rowsOf("part", "p_partkey")),
        ("supplier", rowsOf("supplier", "s_suppkey")))
      val starEdges = Seq(
        (0, 1, d(("lineitem", "l_orderkey"), ("orders", "o_orderkey"))),
        (1, 2, d(("orders", "o_custkey"), ("customer", "c_custkey"))),
        (0, 3, d(("lineitem", "l_partkey"), ("part", "p_partkey"))),
        (0, 4, d(("lineitem", "l_suppkey"), ("supplier", "s_suppkey"))))
      val starDp = selingerGraphDp(starTables, starEdges)
      val starDfs = Seq(li8, ord8, Tables.customer(spark, dir),
        Tables.part(spark, dir), Tables.supplier(spark, dir))
      val starConds = Seq(
        col("l_orderkey") === col("o_orderkey"),
        col("o_custkey") === col("c_custkey"),
        col("l_partkey") === col("p_partkey"),
        col("l_suppkey") === col("s_suppkey"))
      def buildStar(mask: Int): DataFrame = {
        val cell = starDp(mask)
        if (cell.cutEdge < 0)
          starDfs(java.lang.Integer.numberOfTrailingZeros(mask))
        else buildStar(cell.leftMask)
          .join(buildStar(cell.rightMask), starConds(cell.cutEdge))
      }
      val starFull = 31
      val starLeftDeep = starDfs.head.join(starDfs(1), starConds(0))
        .join(starDfs(2), starConds(1)).join(starDfs(3), starConds(2))
        .join(starDfs(4), starConds(3))
      def prefixCost(dp: Int => Long): Long =
        (1 to 4).map(k => dp((1 << (k + 1)) - 1)).sum
      val starLdCost = prefixCost(m => starDp(m).est)
      // --- cycle (the q249 graph) ---
      val cycTables = Seq(
        ("lineitem", rowsOf("lineitem", "l_orderkey")),
        ("orders", rowsOf("orders", "o_orderkey")),
        ("customer", rowsOf("customer", "c_custkey")),
        ("nation", rowsOf("nation", "n_nationkey")),
        ("supplier", rowsOf("supplier", "s_suppkey")))
      val cycEdges = Seq(
        (0, 1, d(("lineitem", "l_orderkey"), ("orders", "o_orderkey"))),
        (1, 2, d(("orders", "o_custkey"), ("customer", "c_custkey"))),
        (2, 3, d(("customer", "c_nationkey"), ("nation", "n_nationkey"))),
        (3, 4, d(("nation", "n_nationkey"), ("supplier", "s_nationkey"))),
        (4, 0, d(("supplier", "s_suppkey"), ("lineitem", "l_suppkey"))))
      val cycDp = dpCcp(cycTables, cycEdges)
      val cycDfs = Seq(li8, ord8, Tables.customer(spark, dir),
        Tables.nation(spark, dir), Tables.supplier(spark, dir))
      val cycConds = Seq(
        col("l_orderkey") === col("o_orderkey"),
        col("o_custkey") === col("c_custkey"),
        col("c_nationkey") === col("n_nationkey"),
        col("n_nationkey") === col("s_nationkey"),
        col("s_suppkey") === col("l_suppkey"))
      def buildCyc(mask: Int): DataFrame = {
        val cell = cycDp(mask)
        if (cell.crossEdges.isEmpty)
          cycDfs(java.lang.Integer.numberOfTrailingZeros(mask))
        else buildCyc(cell.leftMask).join(buildCyc(cell.rightMask),
          cell.crossEdges.map(cycConds).reduce(_ && _))
      }
      val cycLeftDeep = (1 until 5).foldLeft(cycDfs.head) { (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = cycEdges.indices.filter { e =>
          val (a, b, _) = cycEdges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        acc.join(cycDfs(k), cs.map(cycConds).reduce(_ && _))
      }
      val cycLdCost = prefixCost(m => cycDp(m).est)
      // PREDICTED exchange counts from the pure model ([[joinExch]]):
      // star edges all join distinct key classes (class = edge index);
      // the cycle's customer–nation and nation–supplier edges share the
      // nationkey class — the reuse the model must price
      val cycClasses = Seq(0, 1, 2, 2, 3)
      def predStar(mask: Int): (Seq[Int], Long) = {
        val cell = starDp(mask)
        if (cell.cutEdge < 0) (Seq.empty[Int], 0L)
        else joinExch(predStar(cell.leftMask), predStar(cell.rightMask),
          Seq(cell.cutEdge))
      }
      def predCyc(mask: Int): (Seq[Int], Long) = {
        val cell = cycDp(mask)
        if (cell.crossEdges.isEmpty) (Seq.empty[Int], 0L)
        else joinExch(predCyc(cell.leftMask), predCyc(cell.rightMask),
          cell.crossEdges.map(cycClasses).distinct.sorted)
      }
      def predLeftDeep(edges: Seq[(Int, Int, Long)],
                       classes: Seq[Int]): Long =
        (1 until 5).foldLeft((Seq.empty[Int], 0L)) { case (acc, k) =>
          val priorMask = (1 << k) - 1
          val cs = edges.indices.filter { e =>
            val (a, b, _) = edges(e)
            (a == k && (priorMask & (1 << b)) != 0) ||
              (b == k && (priorMask & (1 << a)) != 0)
          }
          joinExch(acc, (Seq.empty[Int], 0L),
            cs.map(classes).distinct.sorted)
        }._2
      val arms = Seq(
        ("star", "chosen", starDp(starFull).cost, starDp(starFull).plan,
          predStar(starFull)._2, buildStar(starFull)),
        ("star", "left_deep", starLdCost,
          "((((lineitem*orders)*customer)*part)*supplier)",
          predLeftDeep(starEdges, Seq(0, 1, 2, 3)), starLeftDeep),
        ("cycle", "chosen", cycDp(starFull).cost, cycDp(starFull).plan,
          predCyc(starFull)._2, buildCyc(starFull)),
        ("cycle", "left_deep", cycLdCost,
          "((((lineitem*orders)*customer)*nation)*supplier)",
          predLeftDeep(cycEdges, cycClasses), cycLeftDeep))
      import spark.implicits._
      // the four SMJ arms are independent actions under ONE static conf
      // scope (broadcast stays disabled until all four complete — the
      // Await below sequences the restore), so they run concurrently
      // (guide §2.6, the q232 leg discipline)
      val smjRows = parFlatMap(arms) { case (graph, arm, cost, plan, pred, df) =>
        val (nSh, nBc, nSo, nRows, sumQty) = run(df)
        // SORT prediction = the SAME recursion as the exchange
        // prediction: an SMJ's output is both hash-partitioned AND
        // sorted on its join keys, and the reuse condition (the child's
        // output attributes equal the required keys) is attribute-
        // identical for the two properties — so on an equi-join SMJ
        // tree, interesting orders coincide with interesting
        // partitionings, and J32's (subset × partitioning) states
        // already carry the sort dimension for free. The probe EMITS
        // both counts so that claim is measured, not assumed.
        Seq((graph, arm, cost, plan, pred, pred, nSh, nBc, nSo, nRows,
          sumQty))
      }
      // fifth arm: the same star chosen tree under the session's
      // DEFAULT broadcast thresholds — the measurement that sizes the
      // unified operator+partitioning DP (broadcast joins eliminate
      // the dim-side shuffles the SMJ arms pay, and preserve the
      // stream side's partitioning). The SMJ-only model doesn't cover
      // it: n_shuffle_predicted = −1, declared unmodeled.
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      val bc =
        try run(buildStar(starFull))
        finally scoped.foreach { case (k, v) => conf.set(k, v) }
      val bcastRow = ("star", "chosen_bcast", starDp(starFull).cost,
        starDp(starFull).plan, -1L, -1L, bc._1, bc._2, bc._3, bc._4,
        bc._5)
      (smjRows :+ bcastRow)
        .toDF("graph", "arm", "cout_cost", "plan", "n_shuffle_predicted",
          "n_sort_predicted", "n_shuffle_exchanges",
          "n_broadcast_exchanges", "n_sort_nodes", "n_rows", "sum_qty")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** J31c [EXT] — THE MODEL HALF OF THE EXCHANGE PROBE, ORACLE-BACKED
    * (q258): q253 carries two kinds of columns — plan FACTS (Exchange /
    * Sort node counts parsed from executed plans, engine-side by
    * nature, spec-gated forever) and MODEL predictions (`joinExch`
    * over the DP-chosen and left-deep trees), which are pure integer
    * arithmetic over ANALYZE statistics and therefore CAN face the
    * DuckDB oracle. This row moves them there: per (graph, arm) the
    * C_out cost, the plan, and the predicted shuffle/sort counts —
    * the same recursion for both, because on equi-join SMJ trees the
    * sort dimension coincides with the partitioning dimension (the
    * q253 r20 measurement) — re-derived by an oracle that replays BOTH
    * enumerations symbolically (the star's cut-edge DP and the cycle's
    * csg-cmp DP) with the partitioning-state and exchange-count
    * columns threaded through the same first-minimal CASE chains as
    * the costs and plans. The left-deep arms' plans and counts are
    * fixture constants (a fixed tree's joinExch count is graph
    * arithmetic, independent of cardinalities); their C_out re-derives
    * from prefix-subset estimates. With this row, q253's oracle
    * exemption covers ONLY genuinely engine-side facts.
    *
    * Scale: pure metadata — two DPs over 5-table graphs and a handful
    * of integer recursions; no data is read beyond the ANALYZE
    * store. */
  def cboModelPredictionsAudit(spark: SparkSession,
                               dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def d(a: (String, String), b: (String, String)): Long =
      math.max(stats(a)._2, stats(b)._2)
    val full = 31
    // --- star (the q245/q253 graph; per-edge classes = edge index) ---
    val starTables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("part", rowsOf("part", "p_partkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val starEdges = Seq(
      (0, 1, d(("lineitem", "l_orderkey"), ("orders", "o_orderkey"))),
      (1, 2, d(("orders", "o_custkey"), ("customer", "c_custkey"))),
      (0, 3, d(("lineitem", "l_partkey"), ("part", "p_partkey"))),
      (0, 4, d(("lineitem", "l_suppkey"), ("supplier", "s_suppkey"))))
    val starDp = selingerGraphDp(starTables, starEdges)
    def predStar(mask: Int): (Seq[Int], Long) = {
      val cell = starDp(mask)
      if (cell.cutEdge < 0) (Seq.empty[Int], 0L)
      else joinExch(predStar(cell.leftMask), predStar(cell.rightMask),
        Seq(cell.cutEdge))
    }
    // --- cycle (the q249 graph) ---
    val cycTables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val cycEdges = Seq(
      (0, 1, d(("lineitem", "l_orderkey"), ("orders", "o_orderkey"))),
      (1, 2, d(("orders", "o_custkey"), ("customer", "c_custkey"))),
      (2, 3, d(("customer", "c_nationkey"), ("nation", "n_nationkey"))),
      (3, 4, d(("nation", "n_nationkey"), ("supplier", "s_nationkey"))),
      (4, 0, d(("supplier", "s_suppkey"), ("lineitem", "l_suppkey"))))
    val cycDp = dpCcp(cycTables, cycEdges)
    def predCyc(mask: Int): (Seq[Int], Long) = {
      val cell = cycDp(mask)
      if (cell.crossEdges.isEmpty) (Seq.empty[Int], 0L)
      else joinExch(predCyc(cell.leftMask), predCyc(cell.rightMask),
        cell.crossEdges.map(CycleKeyClasses).distinct.sorted)
    }
    def predLeftDeep(edges: Seq[(Int, Int, Long)],
                     classes: Seq[Int]): Long =
      (1 until 5).foldLeft((Seq.empty[Int], 0L)) { case (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = edges.indices.filter { e =>
          val (a, b, _) = edges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        joinExch(acc, (Seq.empty[Int], 0L), cs.map(classes).distinct.sorted)
      }._2
    def prefixCost(est: Int => Long): Long =
      (1 to 4).map(k => est((1 << (k + 1)) - 1)).sum
    val rows = Seq(
      ("star", "chosen", starDp(full).cost, starDp(full).plan,
        predStar(full)._2),
      ("star", "left_deep", prefixCost(m => starDp(m).est),
        "((((lineitem*orders)*customer)*part)*supplier)",
        predLeftDeep(starEdges, Seq(0, 1, 2, 3))),
      ("cycle", "chosen", cycDp(full).cost, cycDp(full).plan,
        predCyc(full)._2),
      ("cycle", "left_deep", prefixCost(m => cycDp(m).est),
        "((((lineitem*orders)*customer)*nation)*supplier)",
        predLeftDeep(cycEdges, CycleKeyClasses)))
    import spark.implicits._
    rows.map { case (g, a, c, p, x) => (g, a, c, p, x, x) }
      .toDF("graph", "arm", "cout_cost", "plan", "n_shuffle_predicted",
        "n_sort_predicted")
  }

  /** J36 [EXT] — THE PLANNED QUERY, BYTE-GATED (q259): the round's two
    * newest dimensions COMPOSED — q256's estimate→enumerate→execute
    * path with q257's width-aware broadcast eligibility, because the
    * two interact exactly where it hurts: the feedback-corrected fact
    * cardinality decides WHETHER the fact can ship, and the byte gate
    * decides whether "small enough in rows" is small enough in MEMORY.
    * Per predicate (narrow/wide) the fact estimate is the q256
    * corrected one (histogram × the freshness-gated LEO correction —
    * the raw-guess arm is q256's row; this row's second axis is
    * WIDTH), and the unified DP runs twice:
    *
    *  - `bytes_store`: the ANALYZE store's real widths, limit =
    *    10 000 fact rows' worth of bytes (the q257 translation of the
    *    row threshold) — the production arm, its winner EXECUTED
    *    full-size with operator-true hints;
    *  - `bytes_wide`: customer planted at [[ByteGatePlantedWidthE6]]
    *    at constant rows — the q237 hazard injected into the planned
    *    path; the winner flips its ship side (or order) where the
    *    store-width arm still ships the customer-carrying chain.
    *
    * `winners_differ` compares the full physical verdict per
    * predicate. Executed proof: the store-width winner on the actually
    * filtered fact (both predicates), plus the 1/8-key identity arm vs
    * left-deep. Oracle GENERATED symbolically: the q256 correction
    * CTEs × the q257 width CTEs feeding four byte-gated
    * dpCcpUnified chains (2 predicates × store/planted widths), every
    * estimate, gate, state, winner, flip, and aggregate re-derived.
    *
    * Scale: the composition adds ONE multiply per DP candidate to
    * q256's metadata cost. At 100 TB this is the full planner: learned
    * cardinalities deciding how much moves, learned widths deciding
    * whether it fits. */
  def plannedStarQueryBytes(spark: SparkSession, dir: String): DataFrame = {
    val statRows = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv"), col("avg_width")).collect()
    val stats = statRows
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val widthOf: Map[String, Long] = statRows
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.map(r => math.round(r.getDouble(4) * 1000000.0)).sum
      }
    val names = Seq("lineitem", "orders", "customer", "nation", "supplier")
    val storeW = names.map(widthOf)
    val wideW = storeW.updated(2, ByteGatePlantedWidthE6)
    val limE6 = PhysBroadcastLimitRows * storeW.head
    val li = Tables.lineitem(spark, dir)
    val hist = ensureLiKeyHist(spark, dir)
    val (lo, hi) = liKeyBounds(hist)
    val d = hi - lo + 1L
    val predDefs = Seq(
      ("narrow", lo, lo + d / 50L - 1L),
      ("wide", lo, lo + 4L * d / 5L - 1L))
    val root = ensureFeedbackStats(spark, dir)
    val fr = feedbackFreshness(spark, root, "l_orderkey_mod2_eq")
    val corrUsed =
      if (fr.stale || fr.nTicks == 0L) 1000000L else fr.pooledE6
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (2, 3, math.max(ndvOf("customer", "c_nationkey"),
        ndvOf("nation", "n_nationkey"))),
      (3, 4, math.max(ndvOf("nation", "n_nationkey"),
        ndvOf("supplier", "s_nationkey"))),
      (4, 0, math.max(ndvOf("supplier", "s_suppkey"),
        ndvOf("lineitem", "l_suppkey"))))
    val restRows = Seq(
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val dfsRest = Seq(Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"),
      col("n_nationkey") === col("s_nationkey"),
      col("s_suppkey") === col("l_suppkey"))
    val fullMask = 31
    val out = parFlatMap(predDefs) { case (label, pLo, pHi) =>
      val pred = spark.range(1).select(lit(0L).as("pred_id"),
        lit(pLo).as("p_lo"), lit(pHi).as("p_hi"))
      val estE6 = estimateRanges(pred, hist, "est_e6")
        .head().getAs[Long]("est_e6")
      val estDefE6 = estE6 / DefaultExprSelectivityDenom
      val estFb =
        math.max(1L, feedbackCorrected(estDefE6, corrUsed) / 1000000L)
      val tables = ("lineitem", estFb) +: restRows
      val dpS = dpCcpUnified(tables, edges, CycleKeyClasses,
        widthsE6 = storeW, bcastLimitBytesE6 = limE6)
      val dpW = dpCcpUnified(tables, edges, CycleKeyClasses,
        widthsE6 = wideW, bcastLimitBytesE6 = limE6)
      def winnerOf(dp: Map[(Int, Seq[Int]), UniDpCell]): UniDpCell =
        dp.collect { case ((m, _), c) if m == fullMask => c }
          .minBy(c => (c.cost, c.part.mkString(",")))
      val wS = winnerOf(dpS)
      val wW = winnerOf(dpW)
      val differ =
        (wS.plan, wS.part, wS.op, wS.nShuffleExch, wS.nBcastExch) !=
          (wW.plan, wW.part, wW.op, wW.nShuffleExch, wW.nBcastExch)
      val liF = li.filter(col("l_orderkey").cast("long")
        .between(pLo, pHi) &&
        pmod(col("l_orderkey").cast("long"), lit(2L)) === 1L)
      def build(ds: Seq[DataFrame], mask: Int,
                part: Seq[Int]): DataFrame = {
        val cell = dpS((mask, part))
        if (cell.op == "leaf")
          ds(java.lang.Integer.numberOfTrailingZeros(mask))
        else {
          var l = build(ds, cell.leftMask, cell.leftPart)
          var r = build(ds, cell.rightMask, cell.rightPart)
          cell.op match {
            case "broadcast_right" => r = broadcast(r)
            case "broadcast_left" => l = broadcast(l)
            case _ => l = l.hint("merge"); r = r.hint("merge")
          }
          l.join(r, cell.crossEdges.map(conds).reduce(_ && _))
        }
      }
      def agg(full: DataFrame): (Long, Long, Long) = {
        val r = full.agg(count(lit(1)),
          sum(col("l_quantity").cast("long")),
          sum(col("s_suppkey").cast("long"))).head()
        (r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))
      }
      val answer = agg(build(liF +: dfsRest, fullMask, wS.part))
      val li8 = liF.filter(
        pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
      val ord8 = dfsRest.head.filter(
        pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
      val dfs8 = li8 +: ord8 +: dfsRest.drop(1)
      val leftDeep8 = (1 until 5).foldLeft(dfs8.head) { (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = edges.indices.filter { e =>
          val (a, b, _) = edges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        acc.join(dfs8(k), cs.map(conds).reduce(_ && _))
      }
      val identical =
        agg(build(dfs8, fullMask, wS.part)) == agg(leftDeep8)
      // the STORE-width arm's full state table (the production arm),
      // with both arms' winners on every row
      dpS.toSeq
        .sortBy { case ((m, p), _) =>
          (java.lang.Integer.bitCount(m), m, p.mkString(","))
        }
        .map { case ((m, p), cell) =>
          val subset = names.indices.filter(i => (m & (1 << i)) != 0)
            .map(names).mkString(",")
          val w = names.indices.filter(i => (m & (1 << i)) != 0)
            .map(storeW).max
          org.apache.spark.sql.Row(
            label, pLo, pHi, estE6, estDefE6, corrUsed, estFb, limE6,
            subset, partLabel(p, CycleClassNames),
            java.lang.Integer.bitCount(m).toLong, cell.est, w,
            cell.cost, cell.op, cell.nShuffleExch, cell.nBcastExch,
            cell.plan,
            partLabel(wS.part, CycleClassNames), wS.cost, wS.op,
            wS.nShuffleExch, wS.nBcastExch, wS.plan,
            partLabel(wW.part, CycleClassNames), wW.cost, wW.op,
            wW.nShuffleExch, wW.nBcastExch, wW.plan,
            differ, answer._1, answer._2, answer._3, identical)
        }
    }
    import org.apache.spark.sql.types._
    def f(nm: String, t: DataType) = StructField(nm, t)
    val schema = StructType(Seq(
      f("pred_label", StringType), f("p_lo", LongType),
      f("p_hi", LongType), f("hist_est_e6", LongType),
      f("est_default_e6", LongType), f("corr_used_e6", LongType),
      f("est_fact_fb", LongType), f("lim_bytes_e6", LongType),
      f("subset", StringType), f("part", StringType),
      f("n_tables", LongType), f("est_rows", LongType),
      f("width_e6", LongType), f("cost", LongType), f("op", StringType),
      f("n_shuffle_exch", LongType), f("n_bcast_exch", LongType),
      f("plan", StringType), f("store_winner_part", StringType),
      f("store_winner_cost", LongType), f("store_winner_op", StringType),
      f("store_winner_n_shuffle", LongType),
      f("store_winner_n_bcast", LongType),
      f("store_winner_plan", StringType),
      f("wide_winner_part", StringType), f("wide_winner_cost", LongType),
      f("wide_winner_op", StringType),
      f("wide_winner_n_shuffle", LongType),
      f("wide_winner_n_bcast", LongType),
      f("wide_winner_plan", StringType),
      f("winners_differ", BooleanType), f("n_rows", LongType),
      f("sum_qty", LongType), f("sum_supp", LongType),
      f("trees_identical", BooleanType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      schema)
  }

  /** One state of the EXCHANGE-AWARE enumeration, keyed by (subset,
    * output partitioning): estimated cardinality, best total cost
    * (C_out + γ·exchanged rows), the winning split's components and
    * the partitioning STATE each side was consumed in, every cross
    * edge, the state's own output partitioning (sorted distinct
    * key classes), the number of Exchange nodes the priced tree
    * inserts, and the plan string. */
  private[graft] case class ExchDpCell(est: Long, cost: Long,
                                       leftMask: Int, rightMask: Int,
                                       leftPart: Seq[Int],
                                       rightPart: Seq[Int],
                                       crossEdges: Seq[Int],
                                       part: Seq[Int], nExchanges: Long,
                                       plan: String)

  /** The csg-cmp enumeration with INTERESTING PARTITIONINGS — the
    * other half of Selinger 1979 ([[dpCcp]] prices cardinality,
    * [[selingerPhysicalDp]] prices operators; this DP prices the
    * EXCHANGES q253 measures). Cells are keyed by (subset, output
    * partitioning): a join's output is hash-partitioned on its
    * key-class set, and a later join on the SAME classes consumes it
    * without a new Exchange — the tree q249 chooses on the Q5 cycle
    * does exactly this (supplier and customer both join on nationkey,
    * 7 exchanges vs left-deep's 8, measured). Per candidate split of
    * a connected subset (ascending-S1 proper submasks, the dpCcp
    * order), with requirement K = the cross edges' distinct sorted
    * key classes, each side is consumed EITHER in its (side, K) state
    * (reuse: no exchange) OR in its cheapest state re-exchanged
    * (+γ·est(side) cost, +1 Exchange) — any other state pays the same
    * exchange as the cheapest, so two options suffice; ties prefer
    * reuse, cheapest-state ties break on the partitioning label (the
    * oracle's deterministic order). cost = Σ sides + est(S); the
    * candidate lands in the (S, K) cell, first-minimal across
    * candidates. Leaves are unpartitioned single states. γ =
    * `gammaE2`/100 with the same single-BigInt-division discipline as
    * β; γ = 0 makes every state's cost collapse to C_out. The full
    * set's winner is the min-cost state across partitionings (ties on
    * the label).
    *
    * Exposed for the planted-flip spec; consumed by q254. */
  private[graft] def dpCcpExchange(tables: Seq[(String, Long)],
                                   edges: Seq[(Int, Int, Long)],
                                   keyClasses: Seq[Int],
                                   gammaE2: Long = 100L)
      : Map[(Int, Seq[Int]), ExchDpCell] = {
    val n = tables.length
    require(n >= 2 && n <= 12, s"need 2..12 tables; got $n")
    require(keyClasses.length == edges.length && gammaE2 >= 0L,
      s"need one key class per edge and non-negative gamma")
    require(edges.nonEmpty && edges.forall { case (a, b, d) =>
      a >= 0 && a < n && b >= 0 && b < n && a != b && d > 0
    }, s"edges must connect distinct in-range tables with positive divisors")
    def inMask(i: Int, mask: Int): Boolean = (mask & (1 << i)) != 0
    def induced(mask: Int): Seq[Int] = edges.indices.filter { e =>
      inMask(edges(e)._1, mask) && inMask(edges(e)._2, mask)
    }
    def connected(mask: Int): Boolean = {
      if (mask == 0) return false
      val seed = java.lang.Integer.numberOfTrailingZeros(mask)
      var comp = 1 << seed
      var frontier = List(seed)
      while (frontier.nonEmpty) {
        val v = frontier.head; frontier = frontier.tail
        edges.foreach { case (a, b, _) =>
          val next = if (a == v) b else if (b == v) a else -1
          if (next >= 0 && inMask(next, mask) && !inMask(next, comp)) {
            comp |= 1 << next
            frontier = next :: frontier
          }
        }
      }
      comp == mask
    }
    def est(mask: Int): Long = {
      val num = tables.indices.filter(inMask(_, mask))
        .map(i => BigInt(tables(i)._2)).product
      val den = induced(mask).map(e => BigInt(edges(e)._3)).product
      (num / den).toLong
    }
    def gammaCost(rows: Long): Long =
      (BigInt(rows) * BigInt(gammaE2) / BigInt(100L)).toLong
    val byMask = scala.collection.mutable
      .Map.empty[Int, scala.collection.mutable.LinkedHashMap[Seq[Int], ExchDpCell]]
    tables.indices.foreach { i =>
      val st = scala.collection.mutable.LinkedHashMap[Seq[Int], ExchDpCell](
        (Seq.empty[Int]: Seq[Int]) -> ExchDpCell(tables(i)._2, 0L, 0, 0,
          Nil, Nil, Nil, Nil, 0L, tables(i)._1))
      byMask(1 << i) = st
    }
    // one side of a candidate: (cost incl. any exchange, the state's
    // partitioning consumed, cumulative exchange count, plan)
    def pick(s: Int, k: Seq[Int]): (Long, Seq[Int], Long, String) = {
      val states = byMask(s)
      val (minP, minC) = states.minBy { case (p, c) =>
        (c.cost, p.mkString(","))
      }
      val fresh = (minC.cost + gammaCost(minC.est), minP,
        minC.nExchanges + 1L, minC.plan)
      states.get(k) match {
        case Some(r) if r.cost <= fresh._1 =>
          (r.cost, k, r.nExchanges, r.plan)
        case _ => fresh
      }
    }
    (3 to (1 << n) - 1).foreach { mask =>
      if (java.lang.Integer.bitCount(mask) >= 2 && connected(mask)) {
        val low = 1 << java.lang.Integer.numberOfTrailingZeros(mask)
        val eMask = est(mask)
        val subs = scala.collection.mutable.ArrayBuffer.empty[Int]
        var sub = (mask - 1) & mask
        while (sub != 0) { subs += sub; sub = (sub - 1) & mask }
        val cell = scala.collection.mutable
          .LinkedHashMap.empty[Seq[Int], ExchDpCell]
        subs.reverseIterator.foreach { s1 =>
          val s2 = mask & ~s1
          if ((s1 & low) != 0 && byMask.contains(s1) &&
              byMask.contains(s2)) {
            val cross = edges.indices.filter { e =>
              val (a, b, _) = edges(e)
              (inMask(a, s1) && inMask(b, s2)) ||
                (inMask(a, s2) && inMask(b, s1))
            }
            if (cross.nonEmpty) {
              val k = cross.map(keyClasses).distinct.sorted
              val (lc, lp, ln, lplan) = pick(s1, k)
              val (rc, rp, rn, rplan) = pick(s2, k)
              val cost = lc + rc + eMask
              val existing = cell.get(k)
              if (existing.forall(cost < _.cost))
                cell(k) = ExchDpCell(eMask, cost, s1, s2, lp, rp, cross,
                  k, ln + rn, s"($lplan*$rplan)")
            }
          }
        }
        require(cell.nonEmpty, s"connected subset $mask has no split")
        byMask(mask) = cell
      }
    }
    byMask.toMap.flatMap { case (m, states) =>
      states.map { case (p, c) => (m, p) -> c }
    }
  }

  /** One state of the UNIFIED physical enumeration (operators AND
    * partitionings in one DP), keyed by (subset, output partitioning):
    * estimate, best total cost, the winning split's components and the
    * partitioning STATE each side was consumed in, the join operator
    * ("shuffle" | "broadcast_left" | "broadcast_right" — the named
    * side SHIPS; "leaf" for singles), every cross edge, the output
    * partitioning, the shuffle- and broadcast-Exchange counts of the
    * priced tree, and the plan string. */
  private[graft] case class UniDpCell(est: Long, cost: Long,
                                      leftMask: Int, rightMask: Int,
                                      leftPart: Seq[Int],
                                      rightPart: Seq[Int], op: String,
                                      crossEdges: Seq[Int],
                                      part: Seq[Int], nShuffleExch: Long,
                                      nBcastExch: Long, plan: String)

  /** The sentinel cost of a physically unavailable candidate (a
    * broadcast whose ship side exceeds the threshold): large enough to
    * never win, small enough that sums of a few never overflow — and a
    * plain literal the oracle replays. */
  private[graft] val UniSentinelCost = 1000000000000000L

  /** The UNIFIED physical Selinger enumeration — J31's operator
    * dimension and J32's partitioning dimension priced in ONE DP
    * ([[selingerPhysicalDp]] chooses operators but can't see
    * partitioning reuse; [[dpCcpExchange]] prices reuse but only under
    * SMJ; a real optimizer needs both, because a broadcast join both
    * skips the shuffle AND PRESERVES its stream side's partitioning).
    * States are (connected subset, output partitioning); per candidate
    * split (ascending S1, dpCcp order) THREE operator families are
    * enumerated, in this pinned order:
    *
    *  1. SHUFFLE: both sides re-partition on K = the cross edges'
    *     distinct classes (reuse-or-cheapest per side, the J32 rule);
    *     output partitioning K; δ·est(side) per fresh side, +1
    *     shuffle Exchange each.
    *  2. BROADCAST-RIGHT (ship S2, stream S1): one candidate per S1
    *     state P (label order) — S2 consumed in its cheapest state
    *     and shipped (δ·est(S2), +1 broadcast Exchange), output
    *     partitioning P (the stream side's, PRESERVED — the term no
    *     prior DP could express); available only when est(S2) ≤
    *     `bcastLimit`, else the candidate costs [[UniSentinelCost]].
    *  3. BROADCAST-LEFT: symmetric.
    *
    * First-minimal ties across candidates per output state; winner =
    * min cost across the full set's states, ties on the label. With
    * bcastLimit < 0 every broadcast candidate is sentinel-priced and
    * the winner reduces to [[dpCcpExchange]]'s (spec-pinned). Exposed
    * for the planted-flip spec; consumed by q255. */
  private[graft] def dpCcpUnified(tables: Seq[(String, Long)],
                                  edges: Seq[(Int, Int, Long)],
                                  keyClasses: Seq[Int],
                                  bcastLimit: Long = PhysBroadcastLimitRows,
                                  deltaE2: Long = 100L,
                                  widthsE6: Seq[Long] = Nil,
                                  bcastLimitBytesE6: Long = -1L)
      : Map[(Int, Seq[Int]), UniDpCell] = {
    val n = tables.length
    require(n >= 2 && n <= 10, s"need 2..10 tables; got $n")
    require(keyClasses.length == edges.length && deltaE2 >= 0L,
      s"need one key class per edge and non-negative delta")
    // BYTE-form gate (J35/q257): when per-table row widths are given
    // (bytes in millionths — the ANALYZE store's Σ avg_width), a ship
    // side is eligible iff est_rows × width(bytes) ≤ the byte limit —
    // rows are what the estimator knows, bytes are what OOM the build
    // side. A SUBSET's width is the MAX of its members' — the
    // dominant-column model: one wide dimension still poisons every
    // superset that carries its columns (the q237 hazard, priced),
    // and uniform widths w with limitBytes = rowLimit × w reduce
    // EXACTLY to the row form cell for cell (Σ would be marginally
    // more precise on composite ships but gates a k-way uniform join
    // k× tighter than the row form it generalizes — the audit emits
    // the Σ next to the max for the record).
    require(widthsE6.isEmpty ||
      (widthsE6.length == n && widthsE6.forall(_ > 0L)),
      s"need one positive width per table; got $widthsE6")
    require(edges.nonEmpty && edges.forall { case (a, b, d) =>
      a >= 0 && a < n && b >= 0 && b < n && a != b && d > 0
    }, s"edges must connect distinct in-range tables with positive divisors")
    def inMask(i: Int, mask: Int): Boolean = (mask & (1 << i)) != 0
    def induced(mask: Int): Seq[Int] = edges.indices.filter { e =>
      inMask(edges(e)._1, mask) && inMask(edges(e)._2, mask)
    }
    def connected(mask: Int): Boolean = {
      if (mask == 0) return false
      val seed = java.lang.Integer.numberOfTrailingZeros(mask)
      var comp = 1 << seed
      var frontier = List(seed)
      while (frontier.nonEmpty) {
        val v = frontier.head; frontier = frontier.tail
        edges.foreach { case (a, b, _) =>
          val next = if (a == v) b else if (b == v) a else -1
          if (next >= 0 && inMask(next, mask) && !inMask(next, comp)) {
            comp |= 1 << next
            frontier = next :: frontier
          }
        }
      }
      comp == mask
    }
    def est(mask: Int): Long = {
      val num = tables.indices.filter(inMask(_, mask))
        .map(i => BigInt(tables(i)._2)).product
      val den = induced(mask).map(e => BigInt(edges(e)._3)).product
      (num / den).toLong
    }
    def move(rows: Long): Long =
      (BigInt(rows) * BigInt(deltaE2) / BigInt(100L)).toLong
    def widthE6(mask: Int): Long =
      widthsE6.indices.filter(inMask(_, mask)).map(widthsE6).max
    def eligible(mask: Int, est: Long): Boolean =
      if (widthsE6.nonEmpty)
        BigInt(est) * BigInt(widthE6(mask)) <= BigInt(bcastLimitBytesE6)
      else est <= bcastLimit
    val byMask = scala.collection.mutable.Map.empty[Int,
      scala.collection.mutable.LinkedHashMap[Seq[Int], UniDpCell]]
    tables.indices.foreach { i =>
      byMask(1 << i) = scala.collection.mutable.LinkedHashMap(
        (Seq.empty[Int]: Seq[Int]) -> UniDpCell(tables(i)._2, 0L, 0, 0,
          Nil, Nil, "leaf", Nil, Nil, 0L, 0L, tables(i)._1))
    }
    def statesSorted(s: Int): Seq[(Seq[Int], UniDpCell)] =
      byMask(s).toSeq.sortBy(_._1.mkString(","))
    def minState(s: Int): (Seq[Int], UniDpCell) =
      byMask(s).minBy { case (p, c) => (c.cost, p.mkString(",")) }
    // one shuffled side: (cost incl. exchange, consumed part, sh, bc, plan)
    def pick(s: Int, k: Seq[Int]): (Long, Seq[Int], Long, Long, String) = {
      val (minP, minC) = minState(s)
      val fresh = (minC.cost + move(minC.est), minP,
        minC.nShuffleExch + 1L, minC.nBcastExch, minC.plan)
      byMask(s).get(k) match {
        case Some(r) if r.cost <= fresh._1 =>
          (r.cost, k, r.nShuffleExch, r.nBcastExch, r.plan)
        case _ => fresh
      }
    }
    (3 to (1 << n) - 1).foreach { mask =>
      if (java.lang.Integer.bitCount(mask) >= 2 && connected(mask)) {
        val low = 1 << java.lang.Integer.numberOfTrailingZeros(mask)
        val eMask = est(mask)
        val cell = scala.collection.mutable
          .LinkedHashMap.empty[Seq[Int], UniDpCell]
        def upd(c: UniDpCell): Unit =
          if (cell.get(c.part).forall(c.cost < _.cost)) cell(c.part) = c
        val subs = scala.collection.mutable.ArrayBuffer.empty[Int]
        var sub = (mask - 1) & mask
        while (sub != 0) { subs += sub; sub = (sub - 1) & mask }
        subs.reverseIterator.foreach { s1 =>
          val s2 = mask & ~s1
          if ((s1 & low) != 0 && byMask.contains(s1) &&
              byMask.contains(s2)) {
            val cross = edges.indices.filter { e =>
              val (a, b, _) = edges(e)
              (inMask(a, s1) && inMask(b, s2)) ||
                (inMask(a, s2) && inMask(b, s1))
            }
            if (cross.nonEmpty) {
              val k = cross.map(keyClasses).distinct.sorted
              val (lc, lp, lsh, lbc, lplan) = pick(s1, k)
              val (rc, rp, rsh, rbc, rplan) = pick(s2, k)
              upd(UniDpCell(eMask, lc + rc + eMask, s1, s2, lp, rp,
                "shuffle", cross, k, lsh + rsh, lbc + rbc,
                s"($lplan*$rplan)"))
              val (e1, e2) = (byMask(s1).head._2.est, byMask(s2).head._2.est)
              val (m1p, m1c) = minState(s1)
              val (m2p, m2c) = minState(s2)
              // ship S2, stream S1 in each of its states
              statesSorted(s1).foreach { case (p1, c1) =>
                val cost =
                  if (eligible(s2, e2)) c1.cost + m2c.cost + eMask + move(e2)
                  else UniSentinelCost
                upd(UniDpCell(eMask, cost, s1, s2, p1, m2p,
                  "broadcast_right", cross, p1,
                  c1.nShuffleExch + m2c.nShuffleExch,
                  c1.nBcastExch + m2c.nBcastExch + 1L,
                  s"(${c1.plan}*${m2c.plan})"))
              }
              // ship S1, stream S2 in each of its states
              statesSorted(s2).foreach { case (p2, c2) =>
                val cost =
                  if (eligible(s1, e1)) m1c.cost + c2.cost + eMask + move(e1)
                  else UniSentinelCost
                upd(UniDpCell(eMask, cost, s1, s2, m1p, p2,
                  "broadcast_left", cross, p2,
                  m1c.nShuffleExch + c2.nShuffleExch,
                  m1c.nBcastExch + c2.nBcastExch + 1L,
                  s"(${m1c.plan}*${c2.plan})"))
              }
            }
          }
        }
        require(cell.nonEmpty, s"connected subset $mask has no split")
        byMask(mask) = cell
      }
    }
    byMask.toMap.flatMap { case (m, states) =>
      states.map { case (p, c) => (m, p) -> c }
    }
  }

  /** The Q5 cycle's key-class names, indexed by the class ids
    * [[cboExchangeEnumerationAudit]] and the q253 probe share:
    * edges (l–o, o–c, c–n, n–s, s–l) have classes (0, 1, 2, 2, 3) —
    * the two nation edges share the nationkey class. */
  private[graft] val CycleKeyClasses = Seq(0, 1, 2, 2, 3)
  private[graft] val CycleClassNames =
    Seq("orderkey", "custkey", "nationkey", "suppkey")

  private[graft] def partLabel(part: Seq[Int], names: Seq[String]): String =
    if (part.isEmpty) "none" else part.map(names).mkString("+")

  /** J32 [EXT] — INTERESTING PARTITIONINGS IN THE ENUMERATOR (q254):
    * the full Selinger coupling, closing the arc q253 opened. q253
    * MEASURED that C_out cannot see exchanges (the Q5 winner's dim
    * chain reuses the nationkey partitioning: 7 Exchange nodes vs
    * left-deep's 8); this row makes the enumerator PRICE them —
    * [[dpCcpExchange]] keys DP states by (connected subset, output
    * partitioning), charges γ·|rows| per re-exchange under exactly the
    * model q253's spec proved equal to Spark's EnsureRequirements
    * ([[joinExch]]), and lets a later join consume an
    * already-partitioned side for free. The audit runs the DP TWICE on
    * the ANALYZE-store Q5 cycle — γ = 1 and γ = 0 (pure C_out pricing;
    * its winner cost is spec-pinned equal to q249's dpCcp) — and
    * emits the ENTIRE γ=1 state table: one row per (connected subset,
    * output partitioning) with estimate, total cost, the number of
    * Exchange nodes the priced tree inserts, and the plan, plus the
    * winner of each pricing and `winners_differ` (honestly false on
    * the natural fixture — the C_out winner already owns the
    * nationkey reuse; the spec plants stats where the γ term flips
    * the tree to KEEP the (customer*nation)*supplier reuse a C_out
    * enumerator discards). Executed proof: the γ=1 winner runs FULL
    * size (every cross-edge predicate applied, the q249 discipline),
    * both it and the canonical left-deep run on the 1/8 key
    * partition, identity emitted. The oracle is GENERATED by
    * replaying the state DP symbolically — both γ instantiations,
    * reuse-vs-fresh side CASEs, per-mask min-state helpers with
    * label-ordered ties, first-minimal split chains — zero
    * transcription risk.
    *
    * Scale: states per subset are bounded by the distinct cross-class
    * sets of its splits (≤ edges), so the DP stays metadata-sized;
    * the audit arms cost one full + two sampled joins. At 100 TB this
    * is the difference between pricing what a plan PRODUCES and
    * pricing what the cluster MOVES. */
  def cboExchangeEnumerationAudit(spark: SparkSession,
                                  dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val tables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (2, 3, math.max(ndvOf("customer", "c_nationkey"),
        ndvOf("nation", "n_nationkey"))),
      (3, 4, math.max(ndvOf("nation", "n_nationkey"),
        ndvOf("supplier", "s_nationkey"))),
      (4, 0, math.max(ndvOf("supplier", "s_suppkey"),
        ndvOf("lineitem", "l_suppkey"))))
    val dpEx = dpCcpExchange(tables, edges, CycleKeyClasses)
    val dpC0 = dpCcpExchange(tables, edges, CycleKeyClasses, gammaE2 = 0L)
    val fullMask = (1 << tables.length) - 1
    def winnerOf(dp: Map[(Int, Seq[Int]), ExchDpCell]): ExchDpCell =
      dp.collect { case ((m, _), c) if m == fullMask => c }
        .minBy(c => (c.cost, c.part.mkString(",")))
    val win = winnerOf(dpEx)
    val winC0 = winnerOf(dpC0)
    val differ = win.plan != winC0.plan
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"),
      col("n_nationkey") === col("s_nationkey"),
      col("s_suppkey") === col("l_suppkey"))
    def build(ds: Seq[DataFrame], mask: Int, part: Seq[Int]): DataFrame = {
      val cell = dpEx((mask, part))
      if (cell.crossEdges.isEmpty)
        ds(java.lang.Integer.numberOfTrailingZeros(mask))
      else build(ds, cell.leftMask, cell.leftPart)
        .join(build(ds, cell.rightMask, cell.rightPart),
          cell.crossEdges.map(conds).reduce(_ && _))
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val answer = agg(build(dfs, fullMask, win.part))
    val li8 = dfs.head.filter(
      pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
    val ord8 = dfs(1).filter(
      pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
    val dfs8 = li8 +: ord8 +: dfs.drop(2)
    val leftDeep8 = (1 until tables.length).foldLeft(dfs8.head) {
      (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = edges.indices.filter { e =>
          val (a, b, _) = edges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        acc.join(dfs8(k), cs.map(conds).reduce(_ && _))
    }
    val identical = agg(build(dfs8, fullMask, win.part)) == agg(leftDeep8)
    import spark.implicits._
    dpEx.toSeq
      .sortBy { case ((m, p), _) =>
        (java.lang.Integer.bitCount(m), m, p.mkString(","))
      }
      .map { case ((m, p), cell) =>
        val names = tables.indices.filter(i => (m & (1 << i)) != 0)
          .map(tables(_)._1).mkString(",")
        (names, partLabel(p, CycleClassNames),
          java.lang.Integer.bitCount(m).toLong, cell.est, cell.cost,
          cell.nExchanges, cell.plan,
          partLabel(win.part, CycleClassNames), win.cost,
          win.nExchanges, win.plan, winC0.cost, winC0.plan, differ,
          answer._1, answer._2, answer._3, identical)
      }
      .toDF("subset", "part", "n_tables", "est_rows", "cost",
        "n_exchanges", "plan", "winner_part", "winner_cost",
        "winner_n_exch", "winner_plan", "cout_winner_cost",
        "cout_winner_plan", "winners_differ", "n_rows", "sum_qty",
        "sum_supp", "trees_identical")
  }

  /** J33 [EXT] — THE UNIFIED PHYSICAL ENUMERATOR (q255): operators
    * and partitionings priced in ONE DP — the round's J31 (broadcast
    * vs shuffle per cell) and J32 (interesting partitionings) arcs
    * joined, because the two interact: a broadcast join both SKIPS
    * the shuffle and PRESERVES its stream side's partitioning for a
    * later same-class join — a term neither prior DP could express
    * ([[dpCcpUnified]]). The audit runs the DP on the ANALYZE-store
    * Q5 cycle TWICE — the unified form (broadcast threshold 10 000
    * rows, δ = 1 per moved row) and the broadcast-disabled form
    * (bcastLimit −1, which reduces to J32's exchange DP, its winner
    * spec-pinned equal) — and emits the ENTIRE unified state table:
    * one row per (connected subset, output partitioning) with
    * estimate, total cost, the cell's OPERATOR, its shuffle- and
    * broadcast-Exchange counts, and plan (a physically unavailable
    * state — broadcast-only with the ship side over the threshold —
    * carries the declared sentinel cost, honestly emitted), plus both
    * winners and `winners_differ` (on the natural fixture the same Q5
    * tree wins but runs ALL-BROADCAST — cost 1 590 vs 9 255 at
    * sf0.001, 4 broadcast Exchanges vs 7 shuffles — and the spec
    * plants stats where broadcast-awareness changes the JOIN ORDER
    * itself). Executed proof: the unified winner runs FULL size with
    * every join hinted to its cell's operator (broadcast() on the
    * shipped side, merge on shuffles — the annotations are real);
    * winner + canonical left-deep run on the 1/8 key partition,
    * identity emitted. Oracle GENERATED symbolically — both
    * instantiations, three operator families per split, eligibility
    * CASEs with the sentinel, stream-state enumeration, label-ordered
    * min-state helpers.
    *
    * Scale: states per subset stay bounded by cross-class sets plus
    * inherited child partitionings (≤ a dozen on this graph); the DP
    * is metadata; the arms are the audit price. This is the row where
    * the engine's cost model finally prices what a 1000-executor
    * cluster actually pays: rows MOVED, under the operator that moves
    * them. */
  def cboUnifiedEnumerationAudit(spark: SparkSession,
                                 dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val tables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (2, 3, math.max(ndvOf("customer", "c_nationkey"),
        ndvOf("nation", "n_nationkey"))),
      (3, 4, math.max(ndvOf("nation", "n_nationkey"),
        ndvOf("supplier", "s_nationkey"))),
      (4, 0, math.max(ndvOf("supplier", "s_suppkey"),
        ndvOf("lineitem", "l_suppkey"))))
    val dpU = dpCcpUnified(tables, edges, CycleKeyClasses)
    val dpX = dpCcpUnified(tables, edges, CycleKeyClasses,
      bcastLimit = -1L)
    val fullMask = (1 << tables.length) - 1
    def winnerOf(dp: Map[(Int, Seq[Int]), UniDpCell]): UniDpCell =
      dp.collect { case ((m, _), c) if m == fullMask => c }
        .minBy(c => (c.cost, c.part.mkString(",")))
    val win = winnerOf(dpU)
    val winX = winnerOf(dpX)
    val differ = win.plan != winX.plan
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"),
      col("n_nationkey") === col("s_nationkey"),
      col("s_suppkey") === col("l_suppkey"))
    def build(ds: Seq[DataFrame], mask: Int, part: Seq[Int]): DataFrame = {
      val cell = dpU((mask, part))
      if (cell.op == "leaf")
        ds(java.lang.Integer.numberOfTrailingZeros(mask))
      else {
        var l = build(ds, cell.leftMask, cell.leftPart)
        var r = build(ds, cell.rightMask, cell.rightPart)
        cell.op match {
          case "broadcast_right" => r = broadcast(r)
          case "broadcast_left" => l = broadcast(l)
          case _ => l = l.hint("merge"); r = r.hint("merge")
        }
        l.join(r, cell.crossEdges.map(conds).reduce(_ && _))
      }
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val answer = agg(build(dfs, fullMask, win.part))
    val li8 = dfs.head.filter(
      pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
    val ord8 = dfs(1).filter(
      pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
    val dfs8 = li8 +: ord8 +: dfs.drop(2)
    val leftDeep8 = (1 until tables.length).foldLeft(dfs8.head) {
      (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = edges.indices.filter { e =>
          val (a, b, _) = edges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        acc.join(dfs8(k), cs.map(conds).reduce(_ && _))
    }
    val identical = agg(build(dfs8, fullMask, win.part)) == agg(leftDeep8)
    import spark.implicits._
    dpU.toSeq
      .sortBy { case ((m, p), _) =>
        (java.lang.Integer.bitCount(m), m, p.mkString(","))
      }
      .map { case ((m, p), cell) =>
        val names = tables.indices.filter(i => (m & (1 << i)) != 0)
          .map(tables(_)._1).mkString(",")
        (names, partLabel(p, CycleClassNames),
          java.lang.Integer.bitCount(m).toLong, cell.est, cell.cost,
          cell.op, cell.nShuffleExch, cell.nBcastExch, cell.plan,
          partLabel(win.part, CycleClassNames), win.cost, win.op,
          win.nShuffleExch, win.nBcastExch, win.plan, winX.cost,
          winX.plan, differ, answer._1, answer._2, answer._3, identical)
      }
      .toDF("subset", "part", "n_tables", "est_rows", "cost", "op",
        "n_shuffle_exch", "n_bcast_exch", "plan", "winner_part",
        "winner_cost", "winner_op", "winner_n_shuffle",
        "winner_n_bcast", "winner_plan", "exch_winner_cost",
        "exch_winner_plan", "winners_differ", "n_rows", "sum_qty",
        "sum_supp", "trees_identical")
  }

  /** The planted wide-dimension width for the q257 byte-gate fixture:
    * 2 500 bytes/row — the q237 "625-row relation that arrives 2 500
    * wide" hazard, now priced. A declared constant (e6 fixed point)
    * the oracle replays verbatim. */
  private[graft] val ByteGatePlantedWidthE6 = 2500000000L

  /** J35 [EXT] — BYTE-FORM BROADCAST GATE (q257): every broadcast
    * decision so far gated on ROWS (`PhysBroadcastLimitRows`) because
    * rows are oracle-exact — but bytes are what OOM a 1000-executor
    * build side, and the ANALYZE store has carried `avg_width` since
    * A45 without any consumer pricing it. This row closes that:
    * [[dpCcpUnified]] gains a byte-form eligibility (est_rows ×
    * width ≤ limit, widths in millionths so the whole gate stays
    * integer), where a SUBSET's gate width is the MAX of its members'
    * (the dominant-column model — a join output carries both sides'
    * columns, so one wide dimension poisons every superset containing
    * it, and uniform widths reduce exactly to the row form; the Σ
    * width is emitted next to the max for the record). The audit runs
    * the unified DP on the store's Q5 cycle FOUR ways, the full state
    * table each:
    *
    *  - `rows`: the row gate at 10 000 (q255's exact DP — baseline);
    *  - `bytes_uniform`: byte gate, every width 1 byte, limit 10 000
    *    bytes — the declared REDUCTION case, spec-pinned cell-for-cell
    *    equal to `rows` (a subset's width is the MAX of its members —
    *    the dominant-column model — so uniform widths w give est×w ≤
    *    lim×w ⇔ est ≤ lim on every candidate; the Σ width is emitted
    *    next to the max for the record);
    *  - `bytes_store`: the store's real widths (per table: Σ over its
    *    audited columns of round(avg_width·10⁶)), limit = 10 000 fact
    *    rows' worth of bytes (10 000 × width(lineitem)) — the honest
    *    translation of the row threshold; `differs_vs_rows` emitted,
    *    not asserted (on near-uniform-width fixtures the winners
    *    agree);
    *  - `bytes_wide`: the same except customer PLANTED at
    *    [[ByteGatePlantedWidthE6]] (2 500 B/row) at CONSTANT rows —
    *    the wide dim and every superset carrying it go
    *    broadcast-ineligible, and the winner flips operator family
    *    where `rows` still ships customer. The flip is
    *    oracle-re-derived: the planted width is a declared constant
    *    and everything else comes from replayable aggregates.
    *
    * Executed proof: the `bytes_wide` winner runs FULL size with
    * operator-true hints; winner + canonical left-deep run on the 1/8
    * key partition, identity emitted. Oracle GENERATED by replaying
    * all four instantiations symbolically (the q255/q256 discipline),
    * widths re-derived from raw data through the exact q189 avg-width
    * expression.
    *
    * Scale: widths are metadata the ANALYZE job already computed; the
    * DP stays metadata; the gate is one multiply per candidate. At
    * 100 TB this is the difference between "10 000 rows fit" and
    * "10 000 rows × 2 500 B = 25 MB per executor × every superset
    * that inherits them" — the broadcast OOM, priced at plan time. */
  def cboByteBroadcastAudit(spark: SparkSession, dir: String): DataFrame = {
    val statRows = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv"), col("avg_width")).collect()
    val stats = statRows
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    // table width = Σ per audited column of round(avg_width × 1e6):
    // per-column rounding BEFORE the integer sum, so oracle parity
    // never rides a double sum
    val widthOf: Map[String, Long] = statRows
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        t -> rs.map(r => math.round(r.getDouble(4) * 1000000.0)).sum
      }
    val names = Seq("lineitem", "orders", "customer", "nation", "supplier")
    val tables = Seq(
      ("lineitem", rowsOf("lineitem", "l_orderkey")),
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (2, 3, math.max(ndvOf("customer", "c_nationkey"),
        ndvOf("nation", "n_nationkey"))),
      (3, 4, math.max(ndvOf("nation", "n_nationkey"),
        ndvOf("supplier", "s_nationkey"))),
      (4, 0, math.max(ndvOf("supplier", "s_suppkey"),
        ndvOf("lineitem", "l_suppkey"))))
    val storeW = names.map(widthOf)
    val wideW = storeW.updated(2, ByteGatePlantedWidthE6)
    val limE6 = PhysBroadcastLimitRows * storeW.head
    val arms: Seq[(String, Seq[Long], Long)] = Seq(
      ("rows", Nil, -1L),
      ("bytes_uniform", Seq.fill(5)(1000000L),
        PhysBroadcastLimitRows * 1000000L),
      ("bytes_store", storeW, limE6),
      ("bytes_wide", wideW, limE6))
    val dps = arms.map { case (label, ws, lim) =>
      label -> dpCcpUnified(tables, edges, CycleKeyClasses,
        widthsE6 = ws, bcastLimitBytesE6 = lim)
    }.toMap
    val fullMask = 31
    def winnerOf(dp: Map[(Int, Seq[Int]), UniDpCell]): UniDpCell =
      dp.collect { case ((m, _), c) if m == fullMask => c }
        .minBy(c => (c.cost, c.part.mkString(",")))
    val wins = arms.map { case (l, _, _) => l -> winnerOf(dps(l)) }.toMap
    def key(c: UniDpCell) =
      (c.plan, c.part, c.op, c.nShuffleExch, c.nBcastExch)
    val reductionEqual = key(wins("bytes_uniform")) == key(wins("rows"))
    val dfs = Seq(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"),
      col("n_nationkey") === col("s_nationkey"),
      col("s_suppkey") === col("l_suppkey"))
    val dpW = dps("bytes_wide")
    def build(ds: Seq[DataFrame], mask: Int, part: Seq[Int]): DataFrame = {
      val cell = dpW((mask, part))
      if (cell.op == "leaf")
        ds(java.lang.Integer.numberOfTrailingZeros(mask))
      else {
        var l = build(ds, cell.leftMask, cell.leftPart)
        var r = build(ds, cell.rightMask, cell.rightPart)
        cell.op match {
          case "broadcast_right" => r = broadcast(r)
          case "broadcast_left" => l = broadcast(l)
          case _ => l = l.hint("merge"); r = r.hint("merge")
        }
        l.join(r, cell.crossEdges.map(conds).reduce(_ && _))
      }
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val answer = agg(build(dfs, fullMask, wins("bytes_wide").part))
    val li8 = dfs.head.filter(
      pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
    val ord8 = dfs(1).filter(
      pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
    val dfs8 = li8 +: ord8 +: dfs.drop(2)
    val leftDeep8 = (1 until 5).foldLeft(dfs8.head) { (acc, k) =>
      val priorMask = (1 << k) - 1
      val cs = edges.indices.filter { e =>
        val (a, b, _) = edges(e)
        (a == k && (priorMask & (1 << b)) != 0) ||
          (b == k && (priorMask & (1 << a)) != 0)
      }
      acc.join(dfs8(k), cs.map(conds).reduce(_ && _))
    }
    val identical =
      agg(build(dfs8, fullMask, wins("bytes_wide").part)) == agg(leftDeep8)
    val rowsWin = wins("rows")
    val out = arms.flatMap { case (label, ws, _) =>
      val win = wins(label)
      def widthE6(m: Int): Long =
        if (ws.isEmpty) 0L
        else ws.indices.filter(i => (m & (1 << i)) != 0).map(ws).max
      def widthSumE6(m: Int): Long =
        if (ws.isEmpty) 0L
        else ws.indices.filter(i => (m & (1 << i)) != 0).map(ws).sum
      dps(label).toSeq
        .sortBy { case ((m, p), _) =>
          (java.lang.Integer.bitCount(m), m, p.mkString(","))
        }
        .map { case ((m, p), cell) =>
          val subset = names.indices.filter(i => (m & (1 << i)) != 0)
            .map(names).mkString(",")
          val w = widthE6(m)
          val bytes = BigInt(cell.est) * BigInt(w)
          // fail fast on overflow: the oracle's HUGEINT→BIGINT cast
          // errors at the same point, so wrapping negative here would
          // be a silent engine/oracle asymmetry
          require(bytes.isValidLong, s"bytes_e6 overflows Long: $bytes")
          org.apache.spark.sql.Row(
            label, subset, partLabel(p, CycleClassNames),
            java.lang.Integer.bitCount(m).toLong, cell.est, w,
            widthSumE6(m),
            bytes.toLong, cell.cost, cell.op,
            cell.nShuffleExch, cell.nBcastExch, cell.plan,
            partLabel(win.part, CycleClassNames), win.cost, win.op,
            win.nShuffleExch, win.nBcastExch, win.plan,
            rowsWin.cost, rowsWin.plan, rowsWin.op, reductionEqual,
            key(win) != key(rowsWin), answer._1, answer._2, answer._3,
            identical)
        }
    }
    import org.apache.spark.sql.types._
    def f(nm: String, t: DataType) = StructField(nm, t)
    val schema = StructType(Seq(
      f("arm", StringType), f("subset", StringType),
      f("part", StringType), f("n_tables", LongType),
      f("est_rows", LongType), f("width_e6", LongType),
      f("width_sum_e6", LongType),
      f("bytes_e6", LongType), f("cost", LongType), f("op", StringType),
      f("n_shuffle_exch", LongType), f("n_bcast_exch", LongType),
      f("plan", StringType), f("winner_part", StringType),
      f("winner_cost", LongType), f("winner_op", StringType),
      f("winner_n_shuffle", LongType), f("winner_n_bcast", LongType),
      f("winner_plan", StringType), f("rows_winner_cost", LongType),
      f("rows_winner_plan", StringType), f("rows_winner_op", StringType),
      f("reduction_equal", BooleanType),
      f("differs_vs_rows", BooleanType), f("n_rows", LongType),
      f("sum_qty", LongType), f("sum_supp", LongType),
      f("trees_identical", BooleanType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      schema)
  }

  /** J23 [EXT] — SAMPLED-ARM CBO AUDIT (q235): the scale form of the
    * both-arms discipline, discharging q221's standing commitment now
    * that the consumer family has grown to six both-arms rows. The
    * FOLLOWED arm is unchanged — the production plan at full size, its
    * aggregate the answer proof. The INVERTED arm — which exists only
    * to prove the flip is computed, a proof that needs the executed
    * plan's SHAPE, never the full cardinality — runs on a deterministic
    * 1/`sampleMod` partition of the JOIN KEY: both sides filtered to
    * `key % sampleMod == 0`, so the sampled join is EXACTLY the true
    * join restricted to that key subset (a key partition is closed
    * under the join — no edge crosses it), the observed operator is the
    * same plan shape the full inverted join would run, and every
    * sampled number stays oracle-re-derivable (a seeded `.sample` would
    * be engine RNG; a key partition is arithmetic). `scaled_rows` =
    * sampled rows × sampleMod is the audit's cardinality cross-check
    * against the followed arm's exact count — near-exact on FK joins
    * (every key carries its fact rows with it), a planted skew check at
    * spec level. Decision inputs read from the persisted ANALYZE store
    * (the q224 discipline — no live recount); thresholds scoped off and
    * restored in `finally`; arms materialized eagerly via collect()
    * (the q231 final-adaptive-plan lesson).
    *
    * Scale: this is the form a 100 TB advisor audit actually runs — the
    * followed arm is the query you were executing anyway; the inverted
    * arm costs 1/sampleMod of one join, and sampleMod is free to grow
    * with the table because the proof is shape + a scaled estimate, not
    * the answer. */
  def cboSampledArmAudit(spark: SparkSession, dir: String,
                         broadcastRows: Long = 10000L,
                         sampleMod: Long = 8L): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val stats = ensureTableStats(spark, dir)
      def rowsOf(t: String): Long = stats
        .filter(col("table_name") === t)
        .agg(max(col("n_rows"))).head().getLong(0)
      val joins = Seq(
        ("customer*nation", Tables.customer(spark, dir), "c_nationkey",
          "customer", Tables.nation(spark, dir), "n_nationkey", "nation",
          "c_custkey"),
        ("lineitem*orders", Tables.lineitem(spark, dir), "l_orderkey",
          "lineitem", Tables.orders(spark, dir), "o_orderkey", "orders",
          "l_quantity"))
      val out = joins.flatMap {
        case (label, left, lk, lt, right, rk, rt, sumCol) =>
          val (nLeft, nRight) = (rowsOf(lt), rowsOf(rt))
          val advice = if (math.min(nLeft, nRight) <= broadcastRows)
            "broadcast" else "shuffle"
          def run(strategy: String, mod: Long): (String, Long, Long) = {
            val (l, r) =
              if (mod == 1L) (left, right)
              else (left.filter(pmod(col(lk), lit(mod)) === 0L),
                right.filter(pmod(col(rk), lit(mod)) === 0L))
            val on = col(lk) === col(rk)
            val j = strategy match {
              case "broadcast" =>
                // build side = the stats store's smaller side — the only
                // broadcast anybody advises (q221's discipline)
                if (nRight <= nLeft) l.join(broadcast(r), on)
                else broadcast(l).join(r, on)
              case _ => l.hint("merge").join(r.hint("merge"), on)
            }
            val agg = j.agg(count(lit(1)).as("n"),
              coalesce(sum(col(sumCol).cast("long")), lit(0L)).as("s"))
            val row = agg.collect()(0)
            val plan = agg.queryExecution.executedPlan.toString()
            val shape =
              if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
              else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
              else "other"
            (shape, row.getLong(0), row.getLong(1))
          }
          val inverted =
            if (advice == "broadcast") "shuffle" else "broadcast"
          Seq(("followed", advice, 1L),
            ("inverted", inverted, sampleMod)).map {
            case (arm, strat, mod) =>
              val (shape, nRows, sumVal) = run(strat, mod)
              (label, arm, advice, shape, arm == "followed", mod,
                nLeft, nRight, nRows, nRows * mod, sumVal)
          }
      }
      import spark.implicits._
      out.toDF("join_label", "arm", "advice", "executed_join", "followed",
        "sample_mod", "n_left", "n_right", "n_rows", "scaled_rows",
        "sum_val")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
  /** Session-shared column-GROUP statistics leaf: the 2-D equi-width
    * bucket histogram over (event_id, event time) — the stat a warehouse
    * ANALYZEs for column pairs its single-column stats mis-model. Stored
    * as (b_id, b_ts, n_rows) — at 8×8 buckets, ≤64 rows of metadata for
    * any corpus size — and a MONOID: marginal histograms are folds over
    * one axis (the store subsumes the single-column stats), coarser
    * grids are folds over bucket groups (the W18 compaction property).
    * Bucket = (v − min) · 8 div (max − min + 1): pure integer
    * arithmetic, so every cell is oracle-re-derivable; time buckets are
    * over `unix_micros` (integer, the q30-family parity discipline). */
  private[graft] def ensureColumnGroupStats(spark: SparkSession,
                                            dir: String): String =
    graft.sources.Sources.ensureStore(spark, "cgrp", dir) { root =>
      bucketedEvents(spark, dir)
        .groupBy(col("b_id"), col("b_ts"))
        .agg(count(lit(1)).as("n_rows"))
        .write.mode("overwrite").parquet(root)
    }

  /** Events with both group columns bucketed 0..7 — the assignment both
    * the store build and the audit's exact leg share (one definition, so
    * the audit can never "verify" a different formula than it stored). */
  private def bucketedEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val b = cgrpBounds(spark, dir)
    ev.select(bucketCols(b) :+ col("user_id"): _*)
  }

  /** The group-stat grid's bounds — frozen at ANALYZE time (one
    * bounds aggregate), then shared by the build-once store, the
    * audit's exact leg, and every incremental commit: per-tick
    * maintenance must bucket NEW rows against the bounds the grid was
    * built with, never re-derive its own (a drifting domain is q212's
    * staleness story — the answer is re-ANALYZE, not per-tick grids). */
  /** Lazy cell: the bounds aggregate runs under the CELL's monitor, not
    * the map's bin lock (the ensureStore StoreCell discipline — an
    * unrelated key hashing to the same bin must never block behind this
    * scan). */
  private final class BoundsCell(build: () => (Long, Long, Long, Long)) {
    lazy val value: (Long, Long, Long, Long) = build()
  }
  private val cgrpBoundsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, BoundsCell]()

  private[graft] def cgrpBounds(spark: SparkSession,
                                dir: String): (Long, Long, Long, Long) =
    // memoized per (session, dir): the freeze is a cached value, not
    // just a static-table assumption — consumers after the first pay
    // zero scans (the r17 review finding)
    cgrpBoundsMemo.computeIfAbsent(
      s"${graft.sources.Sources.sessionTag(spark)}|$dir",
      _ => new BoundsCell(() => {
        val b = Tables.events(spark, dir)
          .agg(min(col("event_id")), max(col("event_id")),
            min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
          .head()
        (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      })).value

  private def bucketCols(b: (Long, Long, Long, Long)): Seq[Column] = {
    val (idMin, idMax, tsMin, tsMax) = b
    Seq(
      idiv((col("event_id") - lit(idMin)) * lit(8L),
        lit(idMax - idMin + 1L)).as("b_id"),
      idiv((unix_micros(col("ts")) - lit(tsMin)) * lit(8L),
        lit(tsMax - tsMin + 1L)).as("b_ts"))
  }

  /** A58 [EXT] — COLUMN-GROUP (CORRELATED-COLUMN) STATISTICS (q236):
    * the independence-assumption fix. Every selectivity estimate so far
    * (q207/q215/q232) prices ONE predicate; a conjunction is priced
    * sel(a)·sel(b) — the independence assumption that collapses on
    * correlated columns, and the events fixture carries the classic
    * real-world case BY CONSTRUCTION: event ids are assigned in arrival
    * order, so corr(event_id, unix_micros(ts)) ≈ 0.99998 (the id-vs-
    * created_at pair every production table has). Per bucket-aligned
    * rectangle of a 4-rect sweep (correlated corner, correlated half,
    * anti-diagonal, full): the marginal counts READ FROM THE STORE
    * (n_a, n_b — a 2-D histogram subsumes its marginals by folding one
    * axis), the independence estimate n_a·n_b div N, the GROUP estimate
    * (the rectangle's cell fold), the exact count from one bucket-
    * arithmetic scan (the audit price), the independence error in ppm,
    * and `group_exact` — pinned TRUE: an aligned rectangle is answered
    * EXACTLY by the group stat, while independence is ~4× low on the
    * correlated corner and phantoms ~625 rows onto the empty anti-
    * diagonal. Store-level detection signal on every row:
    * n_pair_buckets vs n_id_buckets·n_ts_buckets (9 vs 64 here — near-
    * diagonal occupancy is HOW a planner decides a pair deserves a
    * group stat, DB2 CARD(colgroup) / Oracle extended-stats style).
    * Fully oracle-checked: buckets, marginals, both estimators, and the
    * exact counts all re-derive in integer SQL.
    *
    * Scale: the store is ≤64 rows of metadata kept by the A45 ANALYZE
    * cadence; estimates fold the store driver-side exactly as a CBO
    * reads its catalog — the one scan here is the audit's exactness
    * proof, never the estimator's cost. */
  /** The planner's catalog read, shared by every grid consumer
    * (q236/q237/q243): the ≤64-row store as a driver-side map. */
  private def gridCells(spark: SparkSession,
                        dir: String): Map[(Long, Long), Long] =
    spark.read.parquet(ensureColumnGroupStats(spark, dir))
      .select(col("b_id"), col("b_ts"), col("n_rows"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap

  /** Rectangle folds over the grid — marginals and the group estimate
    * (one definition; a fix to the fold can never miss a consumer). */
  private def gridMarginalA(cells: Map[(Long, Long), Long], lo: Long,
                            hi: Long): Long =
    cells.collect { case ((bi, _), c) if bi >= lo && bi <= hi => c }.sum
  private def gridMarginalB(cells: Map[(Long, Long), Long], lo: Long,
                            hi: Long): Long =
    cells.collect { case ((_, bt), c) if bt >= lo && bt <= hi => c }.sum
  private def gridRect(cells: Map[(Long, Long), Long], il: Long, ih: Long,
                       tl: Long, th: Long): Long =
    cells.collect {
      case ((bi, bt), c)
        if bi >= il && bi <= ih && bt >= tl && bt <= th => c }.sum

  def columnGroupStatsAudit(spark: SparkSession, dir: String): DataFrame = {
    val cells = gridCells(spark, dir)
    val n = cells.values.sum
    val nPair = cells.size.toLong
    val nIdB = cells.keys.map(_._1).toSet.size.toLong
    val nTsB = cells.keys.map(_._2).toSet.size.toLong
    val rects = Seq(
      ("corr_corner", 0L, 1L, 0L, 1L), ("corr_half", 0L, 3L, 0L, 3L),
      ("anti_diag", 0L, 1L, 6L, 7L), ("full", 0L, 7L, 0L, 7L))
    // the exactness leg: ONE scan, all rects as conditional counts
    val be = bucketedEvents(spark, dir)
    val rectCols = rects.map { case (name, il, ih, tl, th) =>
      sum(when(col("b_id").between(il, ih) &&
        col("b_ts").between(tl, th), 1L).otherwise(0L)).as(name)
    }
    val exactRow = be.agg(rectCols.head, rectCols.tail: _*).head()
    val actual = rects.zipWithIndex.map { case ((name, _, _, _, _), i) =>
      name -> exactRow.getLong(i)
    }.toMap
    val out = rects.map { case (name, il, ih, tl, th) =>
      val nA = gridMarginalA(cells, il, ih)
      val nB = gridMarginalB(cells, tl, th)
      val estGroup = gridRect(cells, il, ih, tl, th)
      val estIndep = nA * nB / n
      val act = actual(name)
      val errIndep =
        if (act > 0L) math.abs(estIndep - act) * 1000000L / act
        else estIndep * 1000000L
      (name, il, ih, tl, th, n, nA, nB, act, estIndep, estGroup,
        estGroup == act, errIndep, nPair, nIdB, nTsB)
    }
    import spark.implicits._
    out.toDF("rect", "b_id_lo", "b_id_hi", "b_ts_lo", "b_ts_hi", "n_rows",
      "n_a", "n_b", "actual_rows", "est_indep", "est_group", "group_exact",
      "err_indep_ppm", "n_pair_buckets", "n_id_buckets", "n_ts_buckets")
  }
  /** A58b/J24 [EXT] — THE GROUP STAT MADE A CONSUMER (q237): q236 shows
    * the independence estimate collapsing on the correlated pair; this
    * row shows the collapse COSTING A PLAN. The conjunctive corner
    * predicate's cardinality is estimated BOTH ways from the persisted
    * group-stat store — independence (marginal folds, n_a·n_b div N)
    * and the group fold — against a broadcast threshold of N div 8
    * rows, which the two estimates straddle at every driver testdata
    * scale (sf0.001–0.1: independence says "broadcast the filtered
    * side", the group stat says "too big, shuffle"). MEASURED honest
    * bound: on the ScaleUp-REPLICATED sf1 fixture the straddle
    * disappears — replication reuses each row's ts under offset ids,
    * so within any id range the pair is independent BY CONSTRUCTION
    * and the two estimators correctly CONVERGE (est_indep = actual =
    * 74 697 at the corner) — the group stat's advantage vanishes
    * exactly when the correlation does, which is the estimator working,
    * not failing; both derived flags then read true. The engine executes the GROUP-advised
    * plan at full size (the production arm: filtered events ⋈ customer
    * on user_id, shape read from the final adaptive plan) and the
    * independence-advised plan in q235's sampled form (a 1/8 user_id
    * key partition — the wrong plan's shape proven without paying its
    * full cost). Both advice-correctness flags are DERIVED (actual
    * filtered cardinality vs the threshold), not hard-coded: a green
    * row proves the group stat advised the side of the threshold the
    * data was actually on and independence advised the other — the
    * measured difference between carrying the 64-row group stat and
    * not. Fully oracle-checked: buckets, marginals, both estimates,
    * threshold, advices, correctness flags, both arms' shapes, and
    * both arms' exact counts/sums re-derive in integer SQL.
    *
    * Scale: both estimates fold a ≤64-row store driver-side; the full
    * arm is the query you were running anyway; the audit arm costs
    * 1/8 of one join. At 100 TB the flag this row pins is the
    * difference between broadcasting a "625-row" relation that
    * arrives 2500 rows per partition wide — the OOM-shaped mistake —
    * and planning the shuffle the data needed. */
  def cboGroupStatJoinAudit(spark: SparkSession, dir: String,
                            thresholdDiv: Long = 8L): DataFrame = {
    val conf = spark.conf
    val scoped = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
    scoped.foreach { case (k, v) => conf.set(k, v) }
    try {
      val cells = gridCells(spark, dir)
      val n = cells.values.sum
      val (il, ih, tl, th) = (0L, 1L, 0L, 1L)
      val nA = gridMarginalA(cells, il, ih)
      val nB = gridMarginalB(cells, tl, th)
      val estGroup = gridRect(cells, il, ih, tl, th)
      val estIndep = nA * nB / n
      val threshold = n / thresholdDiv
      def advice(est: Long): String =
        if (est <= threshold) "broadcast" else "shuffle"
      val (aIndep, aGroup) = (advice(estIndep), advice(estGroup))
      val filtered = bucketedEvents(spark, dir)
        .filter(col("b_id").between(il, ih) && col("b_ts").between(tl, th))
      val actualRows = filtered.count()
      val cust = Tables.customer(spark, dir)
      def run(strategy: String, mod: Long): (String, Long, Long) = {
        val (l, r) =
          if (mod == 1L) (filtered, cust)
          else (filtered.filter(pmod(col("user_id"), lit(mod)) === 0L),
            cust.filter(pmod(col("c_custkey"), lit(mod)) === 0L))
        val on = col("user_id") === col("c_custkey")
        val j = strategy match {
          // build side = the filtered (estimated-small) side — the
          // broadcast the wrong estimate would actually plan
          case "broadcast" => broadcast(l).join(r, on)
          case _           => l.hint("merge").join(r.hint("merge"), on)
        }
        val agg = j.agg(count(lit(1)).as("n"),
          coalesce(sum(col("user_id").cast("long")), lit(0L)).as("s"))
        val row = agg.collect()(0)
        val plan = agg.queryExecution.executedPlan.toString()
        val shape =
          if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
          else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
          else "other"
        (shape, row.getLong(0), row.getLong(1))
      }
      val (shapeFull, nJoin, sumUid) = run(aGroup, 1L)
      val (shapeSamp, nSamp, sumSamp) = run(aIndep, 8L)
      val actualAdvice = advice(actualRows)
      import spark.implicits._
      Seq((
        "corr_corner", n, nA, nB, estIndep, estGroup, threshold,
        aIndep, aGroup, actualRows,
        aGroup == actualAdvice, aIndep == actualAdvice,
        shapeFull, nJoin, sumUid,
        shapeSamp, nSamp, nSamp * 8L, sumSamp))
        .toDF("rect", "n_rows", "n_a", "n_b", "est_indep", "est_group",
          "threshold", "advice_indep", "advice_group", "actual_rows",
          "group_advice_correct", "indep_advice_correct",
          "executed_join", "n_join_rows", "sum_uid",
          "executed_join_sampled", "sampled_rows", "scaled_rows",
          "sampled_sum")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
  /** One group-stat commit: THIS tick's rows bucketed under the frozen
    * ANALYZE bounds, folded to per-cell counts, appended under the
    * tick's own ingest_batch partition via dynamic overwrite —
    * deterministic in (batch, batchId), so crash/replay converges (the
    * zoneMapCommit XO contract applied to the group stat). */
  private[graft] def cgrpCommit(batchRows: DataFrame, batchId: Long,
                                root: String,
                                bounds: (Long, Long, Long, Long)): Unit = {
    val partial = batchRows.select(bucketCols(bounds): _*)
      .groupBy(col("b_id"), col("b_ts"))
      .agg(count(lit(1)).as("n_rows"))
      .persist()
    try {
      // an empty tick is a valid no-op commit: a zero-row dynamic
      // overwrite writes a part-less directory that breaks later schema
      // inference (the matViewCommit guard, applied grid-side)
      if (partial.limit(1).count() > 0L)
        partial.withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(s"$root/cgrp")
    } finally { partial.unpersist(); () }
  }

  /** One ingest tick of the q238 loop: tick t carries the events rows
    * with event_id ≡ t (mod nTicks) — the oracle-derivable tick
    * assignment every incremental store in this repo uses. */
  private[graft] def cgrpTickAt(spark: SparkSession, dir: String,
                                root: String, tick: Int, nTicks: Int,
                                bounds: (Long, Long, Long, Long)): Unit =
    cgrpCommit(
      Tables.events(spark, dir)
        .filter(pmod(col("event_id"), lit(nTicks.toLong)) === tick.toLong),
      tick.toLong, root, bounds)

  private[graft] def ensureIncrementalGroupStats(spark: SparkSession,
                                                 dir: String,
                                                 nTicks: Int): String =
    graft.sources.Sources.ensureStore(spark, "cgrpinc",
        s"$dir|$nTicks") { root =>
      val b = cgrpBounds(spark, dir)
      (0 until nTicks).foreach(t => cgrpTickAt(spark, dir, root, t,
        nTicks, b))
    }

  /** A58b [EXT] — INCREMENTAL GROUP-STAT MAINTENANCE (q238): the
    * lifecycle leg that makes A58 a maintained statistic instead of a
    * one-shot ANALYZE — the same per-commit discipline the zone-map
    * (W16), Bloom (W19), NDV (A57), and MV (W22) stores already have,
    * applied to the 2-D histogram. The grid's cell counts are a MONOID,
    * so each ingest tick appends exactly its own per-cell partials
    * under its ingest_batch partition (O(tick) cost, map-side combined
    * to ≤64 rows) and the table-level group stat at any moment is one
    * metadata-sized fold — never a rescan. Bounds are FROZEN at
    * ANALYZE time and shared with every commit ([[cgrpBounds]]): new
    * rows bucket against the grid they maintain. The registered
    * relation is the STORE read back — one row per (tick, cell) — which
    * the oracle re-derives in one GROUP BY over raw events (tick =
    * event_id % 4), hash-checking every stored partial. Specs pin fold
    * ≡ the build-once q236 store, out-of-band replay a no-op, and the
    * streaming twin ([[streamingGroupStatMaintenance]], one commit per
    * micro-batch keyed by Spark's own batchId) ≡ the tick loop.
    *
    * Scale: per commit the store grows by ≤|cells| rows; q236/q237's
    * estimates read the fold — at 100 TB the correlated-pair stat that
    * flips q237's plan stays current for the price of a 64-row append
    * per ingest commit. */
  def incrementalGroupStatMaintenance(spark: SparkSession, dir: String,
                                      nTicks: Int = 4): DataFrame = {
    val root = ensureIncrementalGroupStats(spark, dir, nTicks)
    spark.read.parquet(s"$root/cgrp")
      .select(col("ingest_batch").cast("long").as("ingest_batch"),
        col("b_id"), col("b_ts"), col("n_rows"))
  }

  /** The streaming twin (the W16/W19/A57/W22 discipline): each
    * micro-batch of raw event rows is ONE group-stat commit keyed by
    * Spark's own batchId under the frozen ANALYZE bounds —
    * replay-idempotent, so checkpoint recovery converges. */
  def streamingGroupStatMaintenance(rows: DataFrame, root: String,
                                    bounds: (Long, Long, Long, Long))
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        cgrpCommit(batch, batchId, root, bounds)
    }
  /** J25 [EXT] — FK JOIN ELIMINATION (q240): the first consumer that
    * REMOVES an operator instead of re-shaping one. A query that inner-
    * joins lineitem to orders but aggregates ONLY lineitem columns pays
    * the join for nothing — IF two conditions hold, both readable from
    * statistics a warehouse already keeps: (1) the join key is UNIQUE
    * on the orders side (PK: ndv == row count, read from the persisted
    * ANALYZE store — no scan), and (2) every l_orderkey has a match
    * (FK integrity: orphan count == 0 — the one integrity scan, the
    * stat a constraint-checking warehouse maintains at ingest). Under
    * PK ∧ FK the join is row-multiplicity-neutral, so the engine
    * answers from lineitem ALONE; the audit also runs the joined form
    * and emits both answers, the match flag, each plan's parquet-scan
    * count read from its executed plan (1 vs 2 — the eliminated plan
    * provably never touched orders), and the decision inputs. The
    * `eliminated` flag is DERIVED from the two conditions, never
    * hard-coded, and the spec plants a violated FK (orders filtered to
    * half) to pin the refusal path: conditions read false, the engine
    * keeps the join, and the joined answer (which now differs from the
    * lineitem-only one) is the one returned.
    *
    * Scale: the decision reads two numbers from a metadata-sized store
    * plus a maintained integrity counter; the payoff is an entire
    * shuffle join REMOVED from a 100 TB plan — the cheapest operator
    * is the one that never runs. */
  def fkJoinEliminationAudit(spark: SparkSession, dir: String,
                             fkViolation: Boolean = false): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord0 = Tables.orders(spark, dir)
    // the planted-violation arm drops half the PK side (spec only)
    val ord = if (fkViolation)
      ord0.filter(pmod(col("o_orderkey"), lit(2L)) === 0L) else ord0
    // condition 1: PK uniqueness from the persisted ANALYZE store
    // (exact ndv; the planted arm recounts — its store has no spec)
    val (ordRows, ordNdv) =
      if (fkViolation) {
        val r = ord.agg(count(lit(1)),
          countDistinct(col("o_orderkey"))).head()
        (r.getLong(0), r.getLong(1))
      } else {
        val s = ensureTableStats(spark, dir)
          .filter(col("table_name") === "orders" &&
            col("column_name") === "o_orderkey")
          .select(col("n_rows"), col("ndv")).head()
        (s.getLong(0), s.getLong(1))
      }
    // condition 2: FK integrity — read from the MAINTAINED counter
    // (q241's per-tick store; fold = Σ n_orphans, metadata-sized): the
    // clean decision never anti-joins the fact table. The planted
    // violation mutates the PK side, which the store's validity
    // contract excludes, so that arm pays the live check.
    val orphans =
      if (fkViolation)
        li.join(ord, col("l_orderkey") === col("o_orderkey"),
          "left_anti").count()
      else {
        val root = ensureFkIntegrityStats(spark, dir, 4)
        spark.read.parquet(s"$root/fkint")
          .agg(coalesce(sum(col("n_orphans")), lit(0L))).head().getLong(0)
      }
    val eliminated = ordNdv == ordRows && orphans == 0L
    def agg(df: DataFrame): (Long, Long, Int) = {
      val a = df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("s"))
      val rows = a.collect()
      // relation count from the optimized plan (the AQE executed-plan
      // STRING prints Final + Initial sections and double-counts)
      val scans = a.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources
          .LogicalRelation => r
      }.length
      (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum, scans)
    }
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val (joinN, joinS, joinScans) = agg(joined)
    // the refusal arm IS the joined arm — never execute it twice
    val (chosenN, chosenS, chosenScans) =
      if (eliminated) agg(li) else (joinN, joinS, joinScans)
    import spark.implicits._
    Seq((ordRows, ordNdv, orphans, eliminated,
      chosenN, chosenS, chosenScans.toLong,
      joinN, joinS, joinScans.toLong,
      chosenN == joinN && chosenS == joinS))
      .toDF("pk_rows", "pk_ndv", "orphans", "eliminated",
        "n_rows", "sum_qty", "n_scans",
        "n_rows_joined", "sum_qty_joined", "n_scans_joined",
        "answers_match")
  }
  /** One FK-integrity commit: THIS tick's fact rows left-joined to the
    * PK snapshot, folded to one (n_rows, n_orphans) row under the
    * tick's ingest_batch partition — O(tick) cost, deterministic in
    * (batch, pk, batchId), replay-idempotent (the zoneMapCommit XO
    * contract applied to a constraint). */
  private[graft] def fkCommit(batchRows: DataFrame, pk: DataFrame,
                              batchId: Long, root: String): Unit =
    batchRows.select(col("l_orderkey"))
      .join(pk.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_outer")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_orphans"))
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(s"$root/fkint")

  private[graft] def fkTickAt(spark: SparkSession, dir: String,
                              root: String, tick: Int, nTicks: Int,
                              pk: DataFrame): Unit =
    fkCommit(Tables.lineitem(spark, dir)
        .filter(pmod(col("l_orderkey"), lit(nTicks.toLong)) === tick.toLong),
      pk, tick.toLong, root)

  private[graft] def ensureFkIntegrityStats(spark: SparkSession,
                                            dir: String,
                                            nTicks: Int): String =
    graft.sources.Sources.ensureStore(spark, "fkint",
        s"$dir|$nTicks") { root =>
      val pk = Tables.orders(spark, dir)
      (0 until nTicks).foreach(t => fkTickAt(spark, dir, root, t, nTicks,
        pk))
    }

  /** A60 [EXT] — MAINTAINED FK-INTEGRITY STATISTIC (q241): the counter
    * q240's elimination decision reads, given the same lifecycle as
    * every other persisted stat (W16/W19/A57/W22/A59). Each fact-side
    * ingest tick checks ITS OWN rows against the PK snapshot — one
    * left-join + fold, O(tick), the constraint check a warehouse runs
    * AT INGEST, when the rows are already in hand — and appends one
    * (n_rows, n_orphans) row under its ingest_batch partition; table
    * integrity at any moment is the metadata-sized fold Σ n_orphans,
    * never a full-table anti-join. VALIDITY CONTRACT: the fold equals
    * the live anti-join while the PK side is append-frozen between
    * ANALYZE points — a PK-side delete invalidates (orphans can only
    * APPEAR); that staleness is q212's story, answered by re-ANALYZE,
    * and the spec's planted-violation leg measures exactly the
    * deleted-PK shape on a private root. Registered relation = the
    * store read back, hash-checked per tick by the oracle (tick =
    * l_orderkey % 4; orphans 0 on the clean fixture — a zero the
    * oracle DERIVES, not assumes). Streaming twin
    * ([[streamingFkIntegrityMaintenance]]) commits per micro-batch
    * keyed by Spark's own batchId.
    *
    * Scale: the q240 decision that removes a 100 TB shuffle join reads
    * Σ of a 4-row store instead of anti-joining 100 TB of fact rows —
    * the constraint costs one fold per tick, paid when the tick lands. */
  def incrementalFkIntegrityMaintenance(spark: SparkSession, dir: String,
                                        nTicks: Int = 4): DataFrame = {
    val root = ensureFkIntegrityStats(spark, dir, nTicks)
    spark.read.parquet(s"$root/fkint")
      .select(col("ingest_batch").cast("long").as("ingest_batch"),
        col("n_rows"), col("n_orphans"))
  }

  /** The streaming twin: each micro-batch of fact rows is ONE integrity
    * commit against the frozen PK snapshot, keyed by Spark's batchId —
    * replay-idempotent per the family discipline. */
  def streamingFkIntegrityMaintenance(rows: DataFrame, pk: DataFrame,
                                      root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        fkCommit(batch, pk, batchId, root)
    }
  /** A61 [EXT] — SAMPLED ANALYZE: NDV FROM A SAMPLE, DONE RIGHT (q242).
    * The statistics layer now has all three production ANALYZE routes:
    * exact (A45 — one full scan), sketch (A56/A57 — one scan, mergeable,
    * bounded error), and THIS — the route a 100 TB warehouse takes when
    * even one full scan is too dear: scan a block sample and estimate.
    * Row counts scale trivially; NDV does NOT — the naive scale-up
    * d_sample/q is the textbook mistake (a dense column whose every
    * value recurs in the sample still gets multiplied by 1/q), and the
    * estimator literature (Chao 1984; Haas et al. 1995's GEE) exists
    * precisely because of it. Per audited column this row emits the
    * sample's sufficient statistics (n_sample, d_sample, f1 singletons,
    * f2 doubletons), the naive scale-up estimate, the Chao lower-bound
    * estimate d_sample + f1²/(2·f2) — integer division, oracle-exact —
    * the exact NDV read from the PERSISTED ANALYZE store (the audit's
    * truth leg costs a store read, not a scan), and both errors in ppm.
    * The sample is the deterministic 1/8 l_orderkey partition (the q235
    * discipline: arithmetic, not engine RNG — a seeded `.sample` could
    * never be hash-checked), uniform w.r.t. the audited columns because
    * the sampling key is independent of them (declared). On this
    * fixture the dense FK columns make the lesson concrete: naive
    * overestimates ~7×, Chao lands within a few percent (spec pins
    * chao_err < naive_err per column and the exact legs).
    *
    * Scale: the sample scan is 1/mod of the table; everything after is
    * a |sample-distinct|-sized groupBy; the exact leg is metadata. The
    * deliverable is the estimator choice itself — the number that
    * decides whether a 100 TB ANALYZE can afford to sample. */
  def sampledAnalyzeAudit(spark: SparkSession, dir: String,
                          sampleMod: Long = 8L): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sample = li.filter(pmod(col("l_orderkey"), lit(sampleMod)) === 0L)
    val stats = ensureTableStats(spark, dir)
    val out = Seq("l_partkey", "l_suppkey").map { c =>
      val g = sample.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      val m = g.agg(count(lit(1)).as("d_sample"),
        coalesce(sum(when(col("cnt") === 1L, 1L).otherwise(0L)), lit(0L))
          .as("f1"),
        coalesce(sum(when(col("cnt") === 2L, 1L).otherwise(0L)), lit(0L))
          .as("f2"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_sample")).head()
      val (dS, f1, f2, nS) =
        (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))
      val ex = stats.filter(col("table_name") === "lineitem" &&
          col("column_name") === c)
        .select(col("n_rows"), col("ndv")).head()
      val (nRows, dExact) = (ex.getLong(0), ex.getLong(1))
      val estNaive = dS * sampleMod
      // bias-corrected Chao1: the f2 = 0 branch is the standard
      // d + f1(f1-1)/2 fallback (a saturated sample estimates itself)
      val estChao = if (f2 > 0L) dS + (f1 * f1) / (2L * f2)
        else dS + (f1 * (f1 - 1L)) / 2L
      def errPpm(est: Long): Long =
        if (dExact > 0L) math.abs(est - dExact) * 1000000L / dExact
        else est * 1000000L
      (c, nRows, nS, dS, f1, f2, estNaive, estChao, dExact,
        errPpm(estNaive), errPpm(estChao))
    }
    import spark.implicits._
    out.toDF("column_name", "n_rows", "n_sample", "d_sample", "f1", "f2",
      "est_naive", "est_chao", "ndv_exact", "naive_err_ppm",
      "chao_err_ppm")
  }
  /** A62 [EXT] — CARDINALITY FEEDBACK: THE LEARNING-OPTIMIZER LOOP
    * (q243). Every estimator row so far prices from stats gathered
    * BEFORE execution; this row closes the remaining arc — the runtime
    * telling the statistics layer what actually happened (LEO, IBM DB2,
    * VLDB 2001: observed cardinalities become corrections that repair
    * future estimates for the same predicate class). On the correlated
    * (id, ts) pair: (1) the no-group-stat planner prices the corner
    * rectangle A by independence (marginals from the persisted grid) —
    * ~4× low; (2) the query EXECUTES and the observed cardinality is
    * fed back as a correction factor q = actual·10⁶ div est, persisted
    * to a feedback store under the predicate CLASS (both rectangles sit
    * on the grid's correlation diagonal — LEO's generalization unit);
    * (3) a DIFFERENT query — rectangle B, same class — reads the store
    * and re-prices: est·q div 10⁶. MEASURED: raw independence is
    * 731 914 ppm off on B at sf0.001 (750 000 at sf0.01); the
    * transferred correction lands at 12 765 ppm (1 612 at sf0.01) —
    * a ~50× error cut from one observed query, with no new ANALYZE.
    * The TRANSFER is the content: the correction is learned on A and
    * scored on B, so nothing is circular, and `improved` is derived
    * from the two errors, never hard-coded. (Same fixture bound as
    * q237: on the ScaleUp-replicated sf1 the pair is independent by
    * construction, the learned correction converges to ~10⁶, and
    * corrected ≈ raw — `improved` may honestly read false when there
    * is nothing to improve; the claims above are measured at the
    * driver testdata scales.) Private per-run store
    * (the query writes its own feedback — the crash-replay-spec
    * discipline); everything integer math, fully oracle-re-derived
    * (estimates, correction, both errors, the flag).
    *
    * Scale: the feedback write is ONE metadata row per (query,
    * predicate class) — the runtime already counted the rows it
    * produced; consulting it is a store read. At 100 TB this is how an
    * optimizer gets correlation fixes for predicates nobody thought to
    * ANALYZE — the observed workload IS the sample. */
  def cboFeedbackLoopAudit(spark: SparkSession, dir: String): DataFrame = {
    val cells = gridCells(spark, dir)
    val n = cells.values.sum
    def estIndep(il: Long, ih: Long, tl: Long, th: Long): Long =
      gridMarginalA(cells, il, ih) * gridMarginalB(cells, tl, th) / n
    val estA = estIndep(0L, 1L, 0L, 1L)
    val estB = estIndep(2L, 3L, 2L, 3L)
    // the observed leg: one pass, both rectangles
    val be = bucketedEvents(spark, dir)
    val acts = be.agg(
      coalesce(sum(when(col("b_id").between(0L, 1L) &&
        col("b_ts").between(0L, 1L), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("b_id").between(2L, 3L) &&
        col("b_ts").between(2L, 3L), 1L).otherwise(0L)), lit(0L))).head()
    val (actualA, actualB) = (acts.getLong(0), acts.getLong(1))
    // feed back: persist the correction under the predicate class,
    // then CONSULT THE STORE (not the local value) — the loop's
    // persistence is part of what a green row proves
    val root = graft.sources.Sources.scratchDirUnique(spark, "leofb")
    import spark.implicits._
    // divisor guarded: a corner whose marginal product truncates to 0
    // must yield a (huge) correction, not a crash — oracle guards the
    // same way (greatest(est_a, 1)); products in BigInt so a degenerate
    // estimate with warehouse-scale actuals truncates the way the
    // oracle's 128-bit integer math does instead of wrapping a Long
    Seq(("id_ts_diag", estA, actualA,
      (BigInt(actualA) * BigInt(1000000L) / BigInt(math.max(1L, estA)))
        .toLong))
      .toDF("pred_class", "est", "actual", "correction_e6")
      .write.mode("overwrite").parquet(s"$root/fb")
    val corrE6 = spark.read.parquet(s"$root/fb")
      .filter(col("pred_class") === "id_ts_diag")
      .select(col("correction_e6")).head().getLong(0)
    val estBCorrected =
      (BigInt(estB) * BigInt(corrE6) / BigInt(1000000L)).toLong
    def errPpm(est: Long, actual: Long): Long =
      if (actual > 0L) math.abs(est - actual) * 1000000L / actual
      else est * 1000000L
    val (rawErr, corrErr) =
      (errPpm(estB, actualB), errPpm(estBCorrected, actualB))
    Seq(("id_ts_diag", n, estA, actualA, corrE6, estB, estBCorrected,
      actualB, rawErr, corrErr, corrErr < rawErr))
      .toDF("pred_class", "n_rows", "est_a", "actual_a", "correction_e6",
        "est_b_raw", "est_b_corrected", "actual_b", "raw_err_ppm",
        "corrected_err_ppm", "improved")
  }

  /** The diagonal training rectangles for the maintained feedback store
    * (q250): aligned 2×2 squares on the grid's correlation diagonal —
    * the q243 predicate class — with rectangle B = [2,3]² HELD OUT for
    * the transfer test. */
  private[graft] val FbTickRects = Seq((0L, 1L), (4L, 5L), (6L, 7L))

  /** Total ticks in the maintained feedback store: the diagonal
    * rectangles plus one tick for the `l_orderkey_mod2_eq` class's
    * training observation (the J26/J29 enumerators' LEO input — ONE
    * store, every consumer). */
  private[graft] val FbTickCount = FbTickRects.length + 1

  /** One feedback-store commit: THIS tick's observation rows
    * (pred_class, est, actual) landed under the tick's ingest_batch
    * partition via dynamic overwrite — deterministic in (batch,
    * batchId), replay-idempotent (the zoneMapCommit XO contract on the
    * LEO store). Empty ticks are valid no-op commits (the
    * matViewCommit guard). */
  private[graft] def fbObsCommit(batchRows: DataFrame, batchId: Long,
                                 root: String): Unit = {
    val partial = batchRows
      .select(col("pred_class"), col("est"), col("actual")).persist()
    try {
      if (partial.limit(1).count() > 0L)
        partial.withColumn("ingest_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_batch").parquet(s"$root/fbobs")
    } finally { partial.unpersist(); () }
  }

  /** One ingest tick of the q250 loop: ticks 0..2 observe the diagonal
    * training rectangles — the independence ESTIMATE from the persisted
    * grid (metadata) and the EXECUTED cardinality (the count the
    * runtime produced anyway); tick 3 observes the
    * `l_orderkey_mod2_eq` class's training member (the J26/J29 derived
    * predicate: default-guess estimate, executed count). */
  private[graft] def fbObsTickAt(spark: SparkSession, dir: String,
                                 root: String, tick: Int): Unit = {
    import spark.implicits._
    val obs =
      if (tick < FbTickRects.length) {
        val cells = gridCells(spark, dir)
        val n = cells.values.sum
        val (lo, hi) = FbTickRects(tick)
        val est = gridMarginalA(cells, lo, hi) *
          gridMarginalB(cells, lo, hi) / n
        val actual = bucketedEvents(spark, dir)
          .filter(col("b_id").between(lo, hi) &&
            col("b_ts").between(lo, hi)).count()
        ("id_ts_diag", est, actual)
      } else {
        val nLi = ensureTableStats(spark, dir)
          .filter(col("table_name") === "lineitem" &&
            col("column_name") === "l_orderkey")
          .select(col("n_rows")).head().getLong(0)
        val est = math.max(1L, nLi / DefaultExprSelectivityDenom)
        val actual = Tables.lineitem(spark, dir)
          .filter(pmod(col("l_orderkey").cast("long"), lit(2L)) === 0L)
          .count()
        ("l_orderkey_mod2_eq", est, actual)
      }
    fbObsCommit(Seq(obs).toDF("pred_class", "est", "actual"),
      tick.toLong, root)
  }

  private[graft] def ensureFeedbackStats(spark: SparkSession,
                                         dir: String): String =
    graft.sources.Sources.ensureStore(spark, "leofbinc", dir) { root =>
      (0 until FbTickCount).foreach(t => fbObsTickAt(spark, dir, root, t))
    }

  /** The staleness band for feedback corrections (ppm): a class whose
    * LATEST tick's observed ratio deviates from the pooled PRIOR ratio
    * by more than this is declared stale and its correction refused.
    * 50 % on purpose: wide enough that the maintained store's natural
    * tick-to-tick wobble never trips it (measured ≤ 8.9 % at sf0.001,
    * ≤ 0.2 % at sf0.01/0.1 — 5.6× headroom at the worst point), narrow
    * enough that a real regime change (the q252 planted shift reads
    * 100 %) is unmissable. */
  private[graft] val FbDriftBandPpm = 500000L

  /** The freshness verdict for one predicate class of a feedback store:
    * tick count, the all-ticks pooled ratio, the prior (all ticks but
    * the newest) and latest (newest tick only) ratios, their relative
    * drift in ppm, and the stale flag. */
  private[graft] case class FbFreshness(nTicks: Long, pooledE6: Long,
                                        priorE6: Long, latestE6: Long,
                                        driftPpm: Long, stale: Boolean)

  /** A66's decision core: fold a class's observation rows per tick,
    * compare the NEWEST tick's ratio against the pooled ratio of every
    * earlier tick, and declare the class stale when the relative drift
    * exceeds [[FbDriftBandPpm]] — the q212 staleness discipline applied
    * to cardinality feedback (a correction learned before a data-
    * distribution change is wrong WITH CONFIDENCE: it confidently
    * re-prices a relationship that no longer exists). Classes with one
    * tick have no prior to drift from and are fresh by definition.
    * Everything integer (BigInt ratios, single division), so the whole
    * verdict re-derives in oracle SQL. Metadata-sized: one collect of
    * per-tick (Σ est, Σ actual) rows. */
  private[graft] def feedbackFreshness(spark: SparkSession, root: String,
                                       predClass: String): FbFreshness = {
    val ticks = spark.read.parquet(s"$root/fbobs")
      .filter(col("pred_class") === predClass)
      .groupBy(col("ingest_batch").cast("long").as("tick"))
      .agg(coalesce(sum(col("est")), lit(0L)).as("e"),
        coalesce(sum(col("actual")), lit(0L)).as("a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def ratioE6(rows: Seq[(Long, Long, Long)]): Long =
      (BigInt(rows.map(_._3).sum) * BigInt(1000000L) /
        BigInt(math.max(1L, rows.map(_._2).sum))).toLong
    val pooled = ratioE6(ticks.toSeq)
    if (ticks.length < 2)
      FbFreshness(ticks.length.toLong, pooled, pooled, pooled, 0L,
        stale = false)
    else {
      val maxTick = ticks.last._1
      val prior = ratioE6(ticks.filter(_._1 < maxTick).toSeq)
      val latest = ratioE6(ticks.filter(_._1 == maxTick).toSeq)
      val drift = (BigInt(math.abs(latest - prior)) * BigInt(1000000L) /
        BigInt(math.max(1L, prior))).toLong
      FbFreshness(ticks.length.toLong, pooled, prior, latest, drift,
        stale = drift > FbDriftBandPpm)
    }
  }

  /** The maintained store's pooled correction for one predicate class —
    * the read every LEO consumer (J26/J28/J29) performs: fold the
    * class's observation rows to (Σ est, Σ actual), correction =
    * pooled ratio in millionths — GATED by the A66 staleness check
    * since r19: a class whose newest tick drifted out of the
    * [[FbDriftBandPpm]] band returns the IDENTITY correction (10⁶ —
    * the consumer keeps its default guess), because a stale correction
    * is worse than none. On the maintained store the gate never fires
    * (drift measured ≤ 8.9 % vs the 50 % band — the q252 spec pins
    * both that and the planted-drift refusal). */
  private[graft] def feedbackCorrectionFor(spark: SparkSession,
                                           dir: String,
                                           predClass: String): Long = {
    val root = ensureFeedbackStats(spark, dir)
    val fr = feedbackFreshness(spark, root, predClass)
    // an ABSENT class is a refusal too: its pooled ratio folds to
    // 0/1 = 0, and a ×0 "correction" would collapse any estimate to
    // ~0 rows — a new wrong estimate, not a fallback (the q256 guard,
    // moved into the shared consumer so every LEO reader gets it)
    if (fr.stale || fr.nTicks == 0L) 1000000L else fr.pooledE6
  }

  /** A65 [EXT] — INCREMENTAL FEEDBACK-STORE MAINTENANCE (q250): the
    * lifecycle leg that makes the LEO store (A62/J26/J29) a MAINTAINED
    * statistic instead of a per-query scratch write — the
    * W16/W19/A57/W22/A59/A60 discipline applied to cardinality
    * feedback. Each executed query's observation (pred_class, est,
    * actual) appends as one metadata row under its tick's ingest_batch
    * partition; the per-class FOLD keeps (Σ est, Σ actual) — a MONOID,
    * so observations pool across ticks — and the derived correction is
    * the pooled ratio q = Σactual·10⁶ div max(1, Σest), the robust
    * form of q243's single-query ratio (one outlier query cannot own
    * the class's correction). Three diagonal training rectangles
    * commit as ticks; rectangle B = [2,3]² is HELD OUT, and the fold's
    * correction transfers: raw independence ~73 % off on B, the pooled
    * correction within a few % (the q243 claim, now from a maintained
    * store). The audit replays tick 1 out-of-band before reading (XO
    * convergence — a double-append would duplicate a stored row and
    * hash-mismatch), and every stored row plus the fold, correction,
    * application, both errors, and the derived flag re-derive in
    * integer SQL. The streaming twin lands each micro-batch of
    * observations as one commit keyed by Spark's own batchId.
    *
    * Scale: a commit is ONE metadata row per (tick, class) — the
    * runtime already counted what it produced; the fold is
    * |classes|-sized; at 100 TB this is the always-on loop that turns
    * the observed workload into statistics nobody scheduled. */
  def incrementalFeedbackMaintenance(spark: SparkSession,
                                     dir: String): DataFrame = {
    val root = ensureFeedbackStats(spark, dir)
    // out-of-band replay of the MIDDLE tick: the XO convergence leg
    fbObsTickAt(spark, dir, root, 1)
    val store = spark.read.parquet(s"$root/fbobs")
    // the transfer columns audit the DIAG class (the mod2 class's
    // correction is consumed — and oracle-checked — by q244/q248)
    val fold = store.filter(col("pred_class") === "id_ts_diag")
      .agg(coalesce(sum(col("est")), lit(0L)),
        coalesce(sum(col("actual")), lit(0L))).head()
    val (estSum, actualSum) = (fold.getLong(0), fold.getLong(1))
    val corrE6 = (BigInt(actualSum) * BigInt(1000000L) /
      BigInt(math.max(1L, estSum))).toLong
    // the held-out transfer: rectangle B re-priced through the fold
    val cells = gridCells(spark, dir)
    val n = cells.values.sum
    val estBRaw =
      gridMarginalA(cells, 2L, 3L) * gridMarginalB(cells, 2L, 3L) / n
    val estBCorr = feedbackCorrected(estBRaw, corrE6)
    val actualB = bucketedEvents(spark, dir)
      .filter(col("b_id").between(2L, 3L) && col("b_ts").between(2L, 3L))
      .count()
    def errPpm(est: Long): Long =
      if (actualB > 0L) math.abs(est - actualB) * 1000000L / actualB
      else est * 1000000L
    val (rawErr, corrErr) = (errPpm(estBRaw), errPpm(estBCorr))
    store.select(col("ingest_batch").cast("long").as("ingest_batch"),
        col("pred_class"), col("est"), col("actual"))
      .withColumn("est_sum", lit(estSum))
      .withColumn("actual_sum", lit(actualSum))
      .withColumn("correction_e6", lit(corrE6))
      .withColumn("est_b_raw", lit(estBRaw))
      .withColumn("est_b_corrected", lit(estBCorr))
      .withColumn("actual_b", lit(actualB))
      .withColumn("raw_err_ppm", lit(rawErr))
      .withColumn("corrected_err_ppm", lit(corrErr))
      .withColumn("improved", lit(corrErr < rawErr))
  }

  /** The streaming twin (the family discipline): each micro-batch of
    * observation rows is ONE feedback commit keyed by Spark's own
    * batchId — checkpoint recovery converges via the per-tick dynamic
    * overwrite. */
  def streamingFeedbackMaintenance(rows: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        fbObsCommit(batch, batchId, root)
    }

  /** A66 [EXT] — FEEDBACK-STORE STALENESS (q252): the r18 verdict's
    * open leg — A65's corrections pooled FOREVER, and a correction
    * learned before a data-distribution change is wrong with
    * confidence. This row gives the LEO store the q212 staleness
    * discipline ([[feedbackFreshness]]): the newest tick's observed
    * ratio is compared against the pooled prior, drift beyond
    * [[FbDriftBandPpm]] marks the class STALE, and the consumer path
    * ([[feedbackCorrectionFor]] — q244/q247/q248's read, gated since
    * r19) REFUSES the correction, falling back to the raw default
    * estimate. Two legs, both emitted:
    *
    *  - `fresh`: the MAINTAINED shared store (A65's leaf) — three
    *    diagonal training ticks whose ratios agree (drift ≤ 8.9 %
    *    measured, 50 % band), so the gate passes and the pooled
    *    correction applies to held-out rectangle B exactly as q250
    *    proved;
    *  - `drifted`: a private store with the same three training ticks
    *    plus a PLANTED REGIME CHANGE — tick 3 observes the same
    *    predicate class after the time distribution rotated half the
    *    domain (b_ts′ = (b_ts + 4) mod 8, so the shifted diagonal
    *    rectangle is the original OFF-diagonal rectangle — pure bucket
    *    arithmetic the oracle replays verbatim). The estimate still
    *    comes from the PRE-shift grid (statistics lag data — the
    *    point), the executed cardinality collapses (the correlation
    *    diagonal is empty off-diagonal), the latest/prior drift reads
    *    ~100 %, the class goes stale, and the consumer keeps the raw
    *    estimate for rectangle B under the NEW regime — where raw
    *    independence beats the stale ×4 correction by construction.
    *
    * Every row carries the tick's stored observation plus the whole
    * verdict (pooled/prior/latest ratios, drift, the stale flag, the
    * correction actually used) and the rectangle-B transfer under the
    * leg's regime, with `decision_right` DERIVED from the three
    * measured errors (used ≤ raw ∧ used ≤ corrected) — never
    * hard-coded. (Same honest fixture bound as q237/q243: on the
    * ScaleUp-replicated sf1 the pair is independent by construction,
    * corrections converge to ~10⁶, nothing drifts and nothing is left
    * to improve — the flags are data-derived and the claims above are
    * measured at the driver testdata scales.) All integer math,
    * fully oracle-re-derived, stale-refusal path included.
    *
    * Scale: the freshness verdict folds per-tick metadata rows —
    * |ticks| driver work per class; the planted leg's extra cost is
    * one grid read and two rectangle counts. At 100 TB this is what
    * keeps an always-learning optimizer from confidently applying
    * last month's workload to this month's data. */
  def feedbackStalenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val freshRoot = ensureFeedbackStats(spark, dir)
    val cells = gridCells(spark, dir)
    val n = cells.values.sum
    val be = bucketedEvents(spark, dir)
    import spark.implicits._
    // the drifted store — three normal ticks plus the planted shift tick
    // (est from the pre-shift grid, actual executed on the rotated
    // regime: diag rect [0,1]² under b_ts′ = (b_ts+4) mod 8 ⇔ original
    // b_id∈[0,1] × b_ts∈[4,5]) — is a pure function of the fixture and
    // READ-ONLY once committed, so it builds once per session (r22); the
    // legs below only read it
    val driftRoot = graft.sources.Sources.ensureStore(spark, "leofbdrift",
        dir) { root =>
      (0 until FbTickRects.length).foreach(t =>
        fbObsTickAt(spark, dir, root, t))
      val estShift =
        gridMarginalA(cells, 0L, 1L) * gridMarginalB(cells, 0L, 1L) / n
      val actualShift = be.filter(col("b_id").between(0L, 1L) &&
        col("b_ts").between(4L, 5L)).count()
      fbObsCommit(
        Seq(("id_ts_diag", estShift, actualShift))
          .toDF("pred_class", "est", "actual"),
        FbTickRects.length.toLong, root)
    }
    val estBRaw =
      gridMarginalA(cells, 2L, 3L) * gridMarginalB(cells, 2L, 3L) / n
    def leg(label: String, root: String, shifted: Boolean) = {
      val fr = feedbackFreshness(spark, root, "id_ts_diag")
      val corrUsed = if (fr.stale) 1000000L else fr.pooledE6
      val estBCorr = feedbackCorrected(estBRaw, fr.pooledE6)
      val estBUsed = feedbackCorrected(estBRaw, corrUsed)
      // rectangle B executed under the leg's regime: the shifted leg's
      // diag rect [2,3]² is the original b_id∈[2,3] × b_ts∈[6,7]
      val (tLo, tHi) = if (shifted) (6L, 7L) else (2L, 3L)
      val actualB = be.filter(col("b_id").between(2L, 3L) &&
        col("b_ts").between(tLo, tHi)).count()
      def errPpm(est: Long): Long =
        if (actualB > 0L) math.abs(est - actualB) * 1000000L / actualB
        else est * 1000000L
      val (rawErr, corrErr, usedErr) =
        (errPpm(estBRaw), errPpm(estBCorr), errPpm(estBUsed))
      val ticks = spark.read.parquet(s"$root/fbobs")
        .filter(col("pred_class") === "id_ts_diag")
        .select(col("ingest_batch").cast("long"), col("est"),
          col("actual"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      ticks.map { case (t, e0, a0) =>
        (label, t, e0, a0, fr.nTicks, fr.pooledE6, fr.priorE6,
          fr.latestE6, fr.driftPpm, fr.stale, corrUsed, estBRaw,
          estBCorr, estBUsed, actualB, rawErr, corrErr, usedErr,
          usedErr <= rawErr && usedErr <= corrErr)
      }
    }
    (leg("fresh", freshRoot, shifted = false) ++
      leg("drifted", driftRoot, shifted = true))
      .toDF("store_label", "ingest_batch", "est", "actual", "n_ticks",
        "pooled_e6", "prior_e6", "latest_e6", "drift_ppm", "stale",
        "correction_used_e6", "est_b_raw", "est_b_corrected",
        "est_b_used", "actual_b", "raw_err_ppm", "corrected_err_ppm",
        "used_err_ppm", "decision_right")
  }

  /** The optimizer fallback selectivity for a predicate NO statistic can
    * price — equality on a derived expression (`l_orderkey % 2 = c`)
    * has no histogram, no ndv, no group stat, so a System-R-style
    * enumerator charges a fixed guess. 1/1000 on purpose: badly wrong
    * on a half-selective predicate, which is exactly the gap the
    * feedback loop (q243/q244) exists to repair. */
  private[graft] val DefaultExprSelectivityDenom = 1000L

  /** J34 [EXT] — THE PLANNED QUERY (q256): one optimizer entry point,
    * estimate → enumerate → execute — the path every real optimizer
    * runs as a SINGLE verb, composing the statistics stack the prior
    * rows built piecewise. q232's histogram priced a filter but fed a
    * two-table heuristic; q244's LEO correction flipped an order but
    * re-priced the old C_out DP; q255's unified enumerator priced
    * operators and partitionings but consumed raw ANALYZE rows only;
    * the capstone (q247) traced five decisions without the unified DP.
    * This verb runs the whole chain on the filtered Q5 cycle — the
    * fact side carries BOTH predicate kinds the estimator stack knows:
    *
    *  1. ESTIMATE — a range predicate on `l_orderkey` (per label:
    *     narrow = first 2 % of the domain, wide = first 80 %) is
    *     priced by the A52 equi-depth histogram (q232's estimator,
    *     millionths fixed-point); the derived predicate
    *     `l_orderkey % 2 = 1` no statistic can price falls back to
    *     the declared 1/[[DefaultExprSelectivityDenom]] guess, and the
    *     A65 store's pooled correction for its class
    *     (`l_orderkey_mod2_eq`, trained on the c = 0 member — LEO's
    *     generalization unit, q244's discipline) repairs it — GATED by
    *     the A66 freshness verdict ([[feedbackFreshness]]): a stale or
    *     absent class keeps the raw guess (correction_used = 10⁶), so
    *     the fallback path flows through the SAME verb (spec-pinned on
    *     a planted drifted store).
    *  2. ENUMERATE — the corrected fact cardinality replaces
    *     lineitem's row count in [[dpCcpUnified]]'s table stats and
    *     the FULL operator+partitioning DP runs TWICE — raw guess vs
    *     corrected — on the store's Q5 cycle (edge divisors stay the
    *     store ndvs: the post-filter ndv min(ndv, est) never exceeds
    *     the PK side's ndv on these FK edges, the q232 resolution
    *     argument). `winners_differ` compares the full physical
    *     verdict (plan, partitioning, operator, both Exchange counts)
    *     — on the natural sf0.01 fixture the WIDE predicate's
    *     correction pushes the fact estimate past the broadcast
    *     threshold (48 → ~24 000 rows) and the operator family flips,
    *     the OOM near-miss a raw-guess optimizer would have shipped.
    *  3. EXECUTE — the corrected winner runs FULL SIZE on the actually
    *     filtered fact (both predicates applied), every join hinted to
    *     its cell's operator (the q255 discipline); the executed fact
    *     cardinality is emitted as `actual_fact` — the observation the
    *     q250 lifecycle would append as this query's own feedback (not
    *     committed here: the shared store's content is consumed by
    *     q244/q247/q248's oracles, and an audit that mutated it would
    *     make sibling results order-dependent — the lifecycle verb
    *     owns commits). Winner + canonical left-deep also run on the
    *     deterministic 1/8 key partition (keys ≡ 1 mod 8, inside the
    *     mod-2 predicate — the q235/q244 discipline), identity
    *     EMITTED.
    *
    * The output is the whole decision trace: per (predicate, state)
    * row the histogram estimate, the default guess, the pooled and
    * gated corrections with the freshness verdict, both fact
    * estimates, the ENTIRE corrected-arm state table (the q255 form),
    * both arms' winners, the flip flag, and the executed proof. The
    * oracle is GENERATED by replaying all four DP instantiations
    * (2 predicates × raw/corrected) symbolically with the estimator
    * and correction CTEs feeding the fact cardinality — zero
    * transcription risk, the q249/q251/q254/q255 discipline.
    *
    * Scale: estimation is |buckets| + |class| metadata; the DPs are
    * metadata; the execution is the query the user was running anyway
    * plus 1/8 of one join for the identity arm. At 100 TB this is the
    * planner invocation every query pays — which is exactly why
    * everything above the executed winner must stay off the data
    * path. */
  def plannedStarQuery(spark: SparkSession, dir: String,
                       fbRootOverride: Option[String] = None): DataFrame = {
    // bucket count is ORACLE-PINNED: plannedDpSql hardcodes the same
    // 16-bucket build, so this is a named constant, not a knob
    val nBuckets = 16
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3)))
      .toMap
    def rowsOf(t: String, c: String): Long = stats((t, c))._1
    def ndvOf(t: String, c: String): Long = stats((t, c))._2
    val li = Tables.lineitem(spark, dir)
    val hist = ensureLiKeyHist(spark, dir, nBuckets)
    val (lo, hi) = liKeyBounds(hist)
    val d = hi - lo + 1L
    val predDefs = Seq(
      ("narrow", lo, lo + d / 50L - 1L),
      ("wide", lo, lo + 4L * d / 5L - 1L))
    val root = fbRootOverride.getOrElse(ensureFeedbackStats(spark, dir))
    val fr = feedbackFreshness(spark, root, "l_orderkey_mod2_eq")
    // gate: stale OR absent class keeps the raw default guess — an
    // absent class's pooled ratio folds to 0/1 = 0, and a ×0
    // "correction" is not a refusal, it's a new wrong estimate
    val corrUsed =
      if (fr.stale || fr.nTicks == 0L) 1000000L else fr.pooledE6
    val edges = Seq(
      (0, 1, math.max(ndvOf("lineitem", "l_orderkey"),
        ndvOf("orders", "o_orderkey"))),
      (1, 2, math.max(ndvOf("orders", "o_custkey"),
        ndvOf("customer", "c_custkey"))),
      (2, 3, math.max(ndvOf("customer", "c_nationkey"),
        ndvOf("nation", "n_nationkey"))),
      (3, 4, math.max(ndvOf("nation", "n_nationkey"),
        ndvOf("supplier", "s_nationkey"))),
      (4, 0, math.max(ndvOf("supplier", "s_suppkey"),
        ndvOf("lineitem", "l_suppkey"))))
    val restRows = Seq(
      ("orders", rowsOf("orders", "o_orderkey")),
      ("customer", rowsOf("customer", "c_custkey")),
      ("nation", rowsOf("nation", "n_nationkey")),
      ("supplier", rowsOf("supplier", "s_suppkey")))
    val dfsRest = Seq(Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir),
      Tables.supplier(spark, dir))
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("c_nationkey") === col("n_nationkey"),
      col("n_nationkey") === col("s_nationkey"),
      col("s_suppkey") === col("l_suppkey"))
    val fullMask = 31
    import spark.implicits._
    val out = parFlatMap(predDefs) { case (label, pLo, pHi) =>
      val pred = spark.range(1).select(lit(0L).as("pred_id"),
        lit(pLo).as("p_lo"), lit(pHi).as("p_hi"))
      val estE6 = estimateRanges(pred, hist, "est_e6")
        .head().getAs[Long]("est_e6")
      val estDefE6 = estE6 / DefaultExprSelectivityDenom
      val estRaw = math.max(1L, estDefE6 / 1000000L)
      val estFb =
        math.max(1L, feedbackCorrected(estDefE6, corrUsed) / 1000000L)
      def tablesWith(f: Long) = ("lineitem", f) +: restRows
      val dpR = dpCcpUnified(tablesWith(estRaw), edges, CycleKeyClasses)
      val dpF = dpCcpUnified(tablesWith(estFb), edges, CycleKeyClasses)
      def winnerOf(dp: Map[(Int, Seq[Int]), UniDpCell]): UniDpCell =
        dp.collect { case ((m, _), c) if m == fullMask => c }
          .minBy(c => (c.cost, c.part.mkString(",")))
      val wR = winnerOf(dpR)
      val wF = winnerOf(dpF)
      val differ =
        (wR.plan, wR.part, wR.op, wR.nShuffleExch, wR.nBcastExch) !=
          (wF.plan, wF.part, wF.op, wF.nShuffleExch, wF.nBcastExch)
      val liF = li.filter(col("l_orderkey").cast("long")
        .between(pLo, pHi) &&
        pmod(col("l_orderkey").cast("long"), lit(2L)) === 1L)
      def build(ds: Seq[DataFrame], mask: Int,
                part: Seq[Int]): DataFrame = {
        val cell = dpF((mask, part))
        if (cell.op == "leaf")
          ds(java.lang.Integer.numberOfTrailingZeros(mask))
        else {
          var l = build(ds, cell.leftMask, cell.leftPart)
          var r = build(ds, cell.rightMask, cell.rightPart)
          cell.op match {
            case "broadcast_right" => r = broadcast(r)
            case "broadcast_left" => l = broadcast(l)
            case _ => l = l.hint("merge"); r = r.hint("merge")
          }
          l.join(r, cell.crossEdges.map(conds).reduce(_ && _))
        }
      }
      def agg(full: DataFrame): (Long, Long, Long) = {
        val r = full.agg(count(lit(1)),
          sum(col("l_quantity").cast("long")),
          sum(col("s_suppkey").cast("long"))).head()
        (r.getLong(0),
          if (r.isNullAt(1)) 0L else r.getLong(1),
          if (r.isNullAt(2)) 0L else r.getLong(2))
      }
      val dfsX = liF +: dfsRest
      val answer = agg(build(dfsX, fullMask, wF.part))
      val actualFact = liF.count()
      val li8 = liF.filter(
        pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
      val ord8 = dfsRest.head.filter(
        pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
      val dfs8 = li8 +: ord8 +: dfsRest.drop(1)
      val leftDeep8 = (1 until 5).foldLeft(dfs8.head) { (acc, k) =>
        val priorMask = (1 << k) - 1
        val cs = edges.indices.filter { e =>
          val (a, b, _) = edges(e)
          (a == k && (priorMask & (1 << b)) != 0) ||
            (b == k && (priorMask & (1 << a)) != 0)
        }
        acc.join(dfs8(k), cs.map(conds).reduce(_ && _))
      }
      val identical = agg(build(dfs8, fullMask, wF.part)) == agg(leftDeep8)
      val names = tablesWith(0L).map(_._1)
      dpF.toSeq
        .sortBy { case ((m, p), _) =>
          (java.lang.Integer.bitCount(m), m, p.mkString(","))
        }
        .map { case ((m, p), cell) =>
          val subset = names.indices.filter(i => (m & (1 << i)) != 0)
            .map(names).mkString(",")
          org.apache.spark.sql.Row(
            label, pLo, pHi, estE6, estDefE6, fr.pooledE6, corrUsed,
            fr.nTicks, fr.driftPpm, fr.stale, estRaw, estFb,
            subset, partLabel(p, CycleClassNames),
            java.lang.Integer.bitCount(m).toLong, cell.est, cell.cost,
            cell.op, cell.nShuffleExch, cell.nBcastExch, cell.plan,
            partLabel(wR.part, CycleClassNames), wR.cost, wR.op,
            wR.nShuffleExch, wR.nBcastExch, wR.plan,
            partLabel(wF.part, CycleClassNames), wF.cost, wF.op,
            wF.nShuffleExch, wF.nBcastExch, wF.plan,
            differ, actualFact, answer._1, answer._2, answer._3,
            identical)
        }
    }
    import org.apache.spark.sql.types._
    def f(n: String, t: DataType) = StructField(n, t)
    val schema = StructType(Seq(
      f("pred_label", StringType), f("p_lo", LongType),
      f("p_hi", LongType), f("hist_est_e6", LongType),
      f("est_default_e6", LongType), f("correction_e6", LongType),
      f("corr_used_e6", LongType), f("n_ticks", LongType),
      f("drift_ppm", LongType), f("stale", BooleanType),
      f("est_fact_raw", LongType), f("est_fact_fb", LongType),
      f("subset", StringType), f("part", StringType),
      f("n_tables", LongType), f("est_rows", LongType),
      f("cost", LongType), f("op", StringType),
      f("n_shuffle_exch", LongType), f("n_bcast_exch", LongType),
      f("plan", StringType), f("raw_winner_part", StringType),
      f("raw_winner_cost", LongType), f("raw_winner_op", StringType),
      f("raw_winner_n_shuffle", LongType),
      f("raw_winner_n_bcast", LongType),
      f("raw_winner_plan", StringType),
      f("fb_winner_part", StringType), f("fb_winner_cost", LongType),
      f("fb_winner_op", StringType), f("fb_winner_n_shuffle", LongType),
      f("fb_winner_n_bcast", LongType), f("fb_winner_plan", StringType),
      f("winners_differ", BooleanType), f("actual_fact", LongType),
      f("n_rows", LongType), f("sum_qty", LongType),
      f("sum_supp", LongType), f("trees_identical", BooleanType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(out).asJava),
      schema)
  }

  /** Apply a persisted LEO correction (millionths) to an estimate —
    * BigInt product so warehouse-scale estimates truncate like the
    * oracle's 128-bit math instead of wrapping. */
  private[graft] def feedbackCorrected(est: Long, corrE6: Long): Long = {
    require(est >= 0L && corrE6 >= 0L, s"need non-negative; got ($est, $corrE6)")
    (BigInt(est) * BigInt(corrE6) / BigInt(1000000L)).toLong
  }

  /** J26 [EXT] — FEEDBACK-AWARE JOIN ORDERING: THE LEO LOOP CLOSED ON
    * THE ENUMERATOR (q244). q243 learns a correction nobody consults;
    * q226/q230/q232 price from raw statistics only. This row wires them
    * together — the persisted cardinality-feedback store participates in
    * the join-ORDER decision, and the correction alone flips the chosen
    * order:
    *
    *  1. the predicate class is equality on a DERIVED expression
    *     (`l_orderkey % 2 = c`) — no histogram or ndv can price it, so
    *     the enumerator falls back to the declared default guess
    *     n/[[DefaultExprSelectivityDenom]] (~0.1 %; the actual
    *     selectivity is ~50 %, the mis-estimate LEO exists for);
    *  2. the TRAINING observation (c = 0: default-guess estimate,
    *     executed cardinality) lives in the MAINTAINED feedback store
    *     (A65's session-shared leaf — committed by the q250 lifecycle,
    *     CONSULTED here; r18's consolidation replaced this query's
    *     private scratch write): est/actual read from the class's row,
    *     correction = the store's pooled ratio
    *     ([[feedbackCorrectionFor]]);
    *  3. a DIFFERENT query (c = 1, same class — LEO's generalization
    *     unit) prices the filtered 3-table join BOTH ways: raw (default
    *     guess → est(li′⋈ord) tiny → lineitem-first) and
    *     feedback-corrected (≈ half of lineitem → est(li′⋈ord) >
    *     est(ord⋈cust) → customer-first). The flip is caused by the
    *     feedback row ALONE: every other input is identical between the
    *     two pricings, and both choices are emitted;
    *  4. the feedback-chosen order executes at FULL size (the
    *     production plan; its aggregate is the emitted answer); both
    *     orders additionally execute on the deterministic 1/8 key
    *     partition (keys ≡ 1 mod 8 — closed under the join AND inside
    *     the mod-2 predicate; the q235 sampled-arm discipline), with
    *     cross-order identity EMITTED as `orders_identical` (never a
    *     driver require — the q240 failure surface).
    *
    * The oracle re-derives everything in integer SQL: the default
    * estimate, the training actual, the correction, both priced
    * intermediates per order, both choices, the flip flag, the exact
    * intermediates, and the filtered aggregate — a hash match proves the
    * enumerator consulted the store and that consulting it flipped the
    * plan the right way.
    *
    * Scale: the feedback row is ONE metadata row per (class) — the
    * runtime already counted what it produced; consulting it is a store
    * read. The training leg is a query the workload was running anyway;
    * the audit arms cost 1/8 of one join. At 100 TB this is how derived
    * predicates (mod-sharding, hash routes, UDF filters) get real
    * cardinalities without anyone ANALYZEing an expression column. */
  def cboFeedbackOrderAudit(spark: SparkSession, dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (nLi, _) = stats(("lineitem", "l_orderkey"))
    val (nOrd, ndvOo) = stats(("orders", "o_orderkey"))
    val (_, ndvOc) = stats(("orders", "o_custkey"))
    val (nCust, ndvCc) = stats(("customer", "c_custkey"))
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    // the training observation and its pooled correction come from the
    // MAINTAINED feedback store (A65's session-shared leaf — r18's
    // consolidation: ONE store, every LEO consumer reads it; the tick
    // was committed by the lifecycle, this query only consults)
    val fbRoot = ensureFeedbackStats(spark, dir)
    val obsRow = spark.read.parquet(s"$fbRoot/fbobs")
      .filter(col("pred_class") === "l_orderkey_mod2_eq")
      .select(col("est"), col("actual")).head()
    val (estDefault, actualTrain) = (obsRow.getLong(0), obsRow.getLong(1))
    val corrE6 = feedbackCorrectionFor(spark, dir, "l_orderkey_mod2_eq")
    import spark.implicits._
    // target query: c = 1, same class — priced both ways
    val estRaw = estDefault
    val estFb = feedbackCorrected(estRaw, corrE6)
    def liOrdEst(estFiltered: Long): Long = estimateJoinRows(estFiltered,
      math.max(1L, math.min(estFiltered, ndvOo)), nOrd, ndvOo)
    val estLiRaw = liOrdEst(estRaw)
    val estLiFb = liOrdEst(estFb)
    val estOc = estimateJoinRows(nOrd, ndvOc, nCust, ndvCc)
    val chosenRaw = chooseJoinOrder(estLiRaw, estOc)
    val chosenFb = chooseJoinOrder(estLiFb, estOc)
    val flipped = chosenRaw != chosenFb
    val liF = li.filter(pmod(col("l_orderkey").cast("long"), lit(2L)) === 1L)
    val actLiOrd = liF.groupBy(col("l_orderkey").cast("long").as("k"))
      .agg(count(lit(1)).as("ca"))
      .join(ord.groupBy(col("o_orderkey").cast("long").as("k"))
        .agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))).head().getLong(0)
    val actOc = ord.groupBy(col("o_custkey").cast("long").as("k"))
      .agg(count(lit(1)).as("ca"))
      .join(cust.groupBy(col("c_custkey").cast("long").as("k"))
        .agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))).head().getLong(0)
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("c_custkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val onLi = col("l_orderkey") === col("o_orderkey")
    val onCust = col("o_custkey") === col("c_custkey")
    val answer =
      if (chosenFb == "lineitem_orders_first")
        agg(liF.join(ord, onLi).join(cust, onCust))
      else agg(liF.join(ord.join(cust, onCust), onLi))
    // residue 1 mod 8 — k ≡ 1 (mod 8) implies k odd, so the sample sits
    // INSIDE the mod-2 predicate; a key-residue class is closed under
    // the equi-join (q235 discipline)
    val liF8 = liF.filter(pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
    val ord8 = ord.filter(pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
    val sA = agg(liF8.join(ord8, onLi).join(cust, onCust))
    val sB = agg(liF8.join(ord8.join(cust, onCust), onLi))
    val identical = sA == sB
    Seq(
      ("l_orderkey_mod2_eq", "lineitem_orders_first",
        chosenRaw == "lineitem_orders_first",
        chosenFb == "lineitem_orders_first", flipped,
        estDefault, actualTrain, corrE6, estLiRaw, estLiFb, actLiOrd,
        answer._1, answer._2, answer._3, identical),
      ("l_orderkey_mod2_eq", "orders_customer_first",
        chosenRaw == "orders_customer_first",
        chosenFb == "orders_customer_first", flipped,
        estDefault, actualTrain, corrE6, estOc, estOc, actOc,
        answer._1, answer._2, answer._3, identical))
      .toDF("pred_class", "order_label", "chosen_raw", "chosen_fb",
        "flipped", "est_default", "actual_train", "correction_e6",
        "est_intermediate_raw", "est_intermediate_fb",
        "actual_intermediate", "n_rows", "sum_qty", "sum_cust",
        "orders_identical")
  }

  /** J29 [EXT] — FEEDBACK-AWARE GRAPH ENUMERATION (q248): q244 closes
    * the LEO loop on the 3-table ORDER choice; this row closes it on
    * the real enumerator — the q245 csg DP re-prices every connected
    * subset from the corrected cardinality, and the correction alone
    * flips the chosen TREE:
    *
    *  1. the workload is the q245 star with the fact FILTERED by the
    *     q244 predicate class (`l_orderkey % 2 = 1`) — a derived
    *     expression no statistic prices, so the raw enumerator charges
    *     the default guess n/1000 for the filtered lineitem;
    *  2. the training member's observation and its pooled correction
    *     come from the MAINTAINED feedback store (A65's shared leaf —
    *     the q250 lifecycle committed it, this query consults);
    *  3. the DP runs TWICE over identical inputs except the fact's row
    *     estimate — raw (≈ n/1000: every fact-containing subset prices
    *     tiny, the (orders*customer) arm looks expensive by contrast
    *     and the winner goes DEEP) vs corrected (≈ n/2: fact-subsets
    *     dominate, the cheap dim arm pays for itself and the winner
    *     goes BUSHY). Edge divisors follow the q232 post-filter rule
    *     max(min(est, ndv_fact_key), ndv_dim_key) per pricing, from the
    *     ANALYZE store;
    *  4. the feedback-chosen tree executes FULL size on the filtered
    *     star (the production plan; its aggregate is the answer); BOTH
    *     trees execute on the 1/8 key partition (keys ≡ 1 mod 8 on
    *     l_orderkey AND o_orderkey — odd, inside the predicate, closed
    *     under every edge since all joins hang off the fact or the
    *     O–C arm), identity EMITTED as `trees_identical`.
    *
    * The oracle re-derives both complete DP chains (the q245 CASE
    * machinery instantiated twice), the training leg, the correction,
    * both chosen plans and costs, the flip flag, and the filtered
    * aggregate. Scale: one metadata feedback row re-prices an O(2ⁿ·n)
    * metadata DP; the training leg is workload; the audit arms cost
    * 1/8 of one star join. */
  def cboFeedbackGraphAudit(spark: SparkSession, dir: String): DataFrame = {
    val stats = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (nLi, ndvLo) = stats(("lineitem", "l_orderkey"))
    val (_, ndvLp) = stats(("lineitem", "l_partkey"))
    val (_, ndvLs) = stats(("lineitem", "l_suppkey"))
    val (nOrd, ndvOo) = stats(("orders", "o_orderkey"))
    val (_, ndvOc) = stats(("orders", "o_custkey"))
    val (nCust, ndvCc) = stats(("customer", "c_custkey"))
    val (nPart, ndvPp) = stats(("part", "p_partkey"))
    val (nSupp, ndvSs) = stats(("supplier", "s_suppkey"))
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    // the q244 class's training observation + pooled correction, read
    // from the MAINTAINED feedback store (A65 — one store, every LEO
    // consumer)
    val fbRoot = ensureFeedbackStats(spark, dir)
    val obsRow = spark.read.parquet(s"$fbRoot/fbobs")
      .filter(col("pred_class") === "l_orderkey_mod2_eq")
      .select(col("est"), col("actual")).head()
    val (estDefault, actualTrain) = (obsRow.getLong(0), obsRow.getLong(1))
    val corrE6 = feedbackCorrectionFor(spark, dir, "l_orderkey_mod2_eq")
    import spark.implicits._
    val estFb = feedbackCorrected(estDefault, corrE6)
    // the DP per pricing: only the fact's row estimate (and its edges'
    // post-filter divisors) differ
    def dpFor(estL: Long): Map[Int, GraphDpCell] = {
      def facDiv(ndvFact: Long, ndvDim: Long): Long =
        math.max(math.max(1L, math.min(estL, ndvFact)), ndvDim)
      selingerGraphDp(
        Seq(("lineitem", estL), ("orders", nOrd), ("customer", nCust),
          ("part", nPart), ("supplier", nSupp)),
        Seq((0, 1, facDiv(ndvLo, ndvOo)),
          (1, 2, math.max(ndvOc, ndvCc)),
          (0, 3, facDiv(ndvLp, ndvPp)),
          (0, 4, facDiv(ndvLs, ndvSs))))
    }
    val fullMask = 31
    val (dpRaw, dpFb) = (dpFor(estDefault), dpFor(estFb))
    val (cellRaw, cellFb) = (dpRaw(fullMask), dpFb(fullMask))
    val flipped = cellRaw.plan != cellFb.plan
    // execution: the fb-chosen tree full-size; both trees sampled
    val liF = li.filter(pmod(col("l_orderkey").cast("long"), lit(2L)) === 1L)
    val conds = Seq(
      col("l_orderkey") === col("o_orderkey"),
      col("o_custkey") === col("c_custkey"),
      col("l_partkey") === col("p_partkey"),
      col("l_suppkey") === col("s_suppkey"))
    def build(dp: Map[Int, GraphDpCell], dfs: Seq[DataFrame],
              mask: Int): DataFrame = {
      val cell = dp(mask)
      if (cell.cutEdge < 0) dfs(java.lang.Integer.numberOfTrailingZeros(mask))
      else build(dp, dfs, cell.leftMask)
        .join(build(dp, dfs, cell.rightMask), conds(cell.cutEdge))
    }
    def agg(full: DataFrame): (Long, Long, Long) = {
      val r = full.agg(count(lit(1)), sum(col("l_quantity").cast("long")),
        sum(col("s_suppkey").cast("long"))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    val dims = Seq(Tables.customer(spark, dir), Tables.part(spark, dir),
      Tables.supplier(spark, dir))
    val dfsFull = liF +: ord +: dims
    val answer = agg(build(dpFb, dfsFull, fullMask))
    val liF8 = liF.filter(pmod(col("l_orderkey").cast("long"), lit(8L)) === 1L)
    val ord8 = ord.filter(pmod(col("o_orderkey").cast("long"), lit(8L)) === 1L)
    val dfs8 = liF8 +: ord8 +: dims
    val identical =
      agg(build(dpFb, dfs8, fullMask)) == agg(build(dpRaw, dfs8, fullMask))
    Seq(("l_orderkey_mod2_eq", estDefault, actualTrain, corrE6, estFb,
      cellRaw.plan, cellRaw.cost, cellFb.plan, cellFb.cost, flipped,
      answer._1, answer._2, answer._3, identical))
      .toDF("pred_class", "est_default", "actual_train", "correction_e6",
        "est_fb", "plan_raw", "cost_raw", "plan_fb", "cost_fb", "flipped",
        "n_rows", "sum_qty", "sum_supp", "trees_identical")
  }

  /** J28 [EXT] — OPTIMIZER CAPSTONE (q247): the statistics stack run
    * END-TO-END on one small workload, the way q179 composes the
    * pipeline operators — every decision consumes a PERSISTED statistic
    * and lands in a uniform decision-trace row (step, part, decision,
    * input_a, input_b, output, flag) alongside the executed answer it
    * produced, all oracle-re-derived:
    *
    *  1. `hist_route` — the report's filter (a 20 % l_orderkey window,
    *     bounds from the ANALYZE store's min/max) is priced by the
    *     SAMPLED histogram with the A64 band check; `margin_robust`
    *     decides whether the sampled route is safe or the exact
    *     histogram is the fallback (inputs: both estimates; output: the
    *     routed intermediate estimate).
    *  2. `join_order` — the routed estimate orders the 3-table report
    *     (J22's decision); the report executes in the chosen order at
    *     full size and its aggregate rides on rows 1–2.
    *  3. `fk_elim` — the count sanity leg (same filter, lineitem⋈orders,
    *     lineitem-only aggregate) is answered from lineitem ALONE iff
    *     PK uniqueness (ANALYZE store) ∧ zero orphans (the A60
    *     maintained counter) hold; output = the executed plan's
    *     relation count (1 vs 2, from the optimized logical plan — the
    *     q240 discipline).
    *  4. `group_stat` — the events corner conjunction priced BOTH ways
    *     from the persisted A58 grid (independence vs group fold)
    *     against the q237 threshold (n/8); the flag derives advice
    *     correctness from the executed actual.
    *  5. `feedback` — the MAINTAINED feedback store's pooled per-class
    *     correction (A65's session-shared leaf; the capstone READS it,
    *     never writes scratch) re-prices the held-out rectangle B; the
    *     flag derives `improved` from the two errors.
    *
    * Scale: every decision input is metadata-sized (store rows, a
    * |buckets| histogram, a ≤64-cell grid, a 4-row integrity fold, one
    * feedback row); the executed legs are the queries the workload was
    * running anyway. This row exists to prove the statistics ACT as a
    * stack, not as five separate green rows. */
  def optimizerCapstoneAudit(spark: SparkSession, dir: String): DataFrame = {
    val store = ensureTableStats(spark, dir)
      .select(col("table_name"), col("column_name"), col("n_rows"),
        col("ndv"), col("min_val"), col("max_val")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    val (nOrd, ndvOo, _, _) = store(("orders", "o_orderkey"))
    val (_, ndvOc, _, _) = store(("orders", "o_custkey"))
    val (nCust, ndvCc, _, _) = store(("customer", "c_custkey"))
    val (_, _, minS, maxS) = store(("lineitem", "l_orderkey"))
    val (lo, hi) = (minS.toLong, maxS.toLong)
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)

    // --- 1. histogram route (A64) on the report predicate ---
    val (pLo, pHi) = (lo, lo + (hi - lo + 1L) / 5L - 1L)
    val histExact = ensureLiKeyHist(spark, dir)
    val histSampled = ensureLiKeyHistSampled(spark, dir, 8L)
    val pred = spark.range(1).select(lit(0L).as("pred_id"),
      lit(pLo).as("p_lo"), lit(pHi).as("p_hi"))
    def estOf(h: DataFrame): Long =
      estimateRanges(pred, h, "est_e6").head().getAs[Long]("est_e6")
    val (estE, estS) = (estOf(histExact), estOf(histSampled))
    def liOrdEst(estE6: Long): Long = {
      val f = estE6 / 1000000L
      estimateJoinRows(f, math.max(1L, math.min(f, ndvOo)), nOrd, ndvOo)
    }
    val estLiS = liOrdEst(estS)
    val estOc = estimateJoinRows(nOrd, ndvOc, nCust, ndvCc)
    val cS = math.max(1L, estS / 8000000L)
    val robust = sampledMarginRobust(estLiS, estOc, cS)
    val route = if (robust) "sampled" else "exact_fallback"
    val estUsedE6 = if (robust) estS else estE
    val estLiUsed = liOrdEst(estUsedE6)

    // --- 2. join order (J22) + the executed report ---
    val chosen = chooseJoinOrder(estLiUsed, estOc)
    val liF = li.filter(col("l_orderkey").cast("long").between(pLo, pHi))
    val onLi = col("l_orderkey") === col("o_orderkey")
    val onCust = col("o_custkey") === col("c_custkey")
    val repDf =
      if (chosen == "lineitem_orders_first")
        liF.join(ord, onLi).join(cust, onCust)
      else liF.join(ord.join(cust, onCust), onLi)
    val repRow = repDf.agg(count(lit(1)),
      sum(col("l_quantity").cast("long")),
      sum(col("c_custkey").cast("long"))).head()
    val (repN, repSq, repSc) = (repRow.getLong(0),
      if (repRow.isNullAt(1)) 0L else repRow.getLong(1),
      if (repRow.isNullAt(2)) 0L else repRow.getLong(2))
    val actLi = liF.groupBy(col("l_orderkey").cast("long").as("k"))
      .agg(count(lit(1)).as("ca"))
      .join(ord.groupBy(col("o_orderkey").cast("long").as("k"))
        .agg(count(lit(1)).as("cb")), "k")
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L))).head().getLong(0)

    // --- 3. FK elimination (J25) on the count leg ---
    val (pkRows, pkNdv, _, _) = store(("orders", "o_orderkey"))
    val fkRoot = ensureFkIntegrityStats(spark, dir, 4)
    val orphans = spark.read.parquet(s"$fkRoot/fkint")
      .agg(coalesce(sum(col("n_orphans")), lit(0L))).head().getLong(0)
    val eliminated = pkNdv == pkRows && orphans == 0L
    def cntAgg(df: DataFrame): (Long, Long, Long) = {
      val a = df.agg(count(lit(1)), sum(col("l_quantity").cast("long")))
      val r = a.head()
      val scans = a.queryExecution.optimizedPlan.collect {
        case rel: org.apache.spark.sql.execution.datasources
          .LogicalRelation => rel
      }.length.toLong
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1), scans)
    }
    val (cntN, cntSq, cntScans) =
      if (eliminated) cntAgg(liF) else cntAgg(liF.join(ord, onLi))

    // --- 4. group stat (A58 consumer) on the events corner ---
    val cells = gridCells(spark, dir)
    val nEv = cells.values.sum
    val estIndepA =
      gridMarginalA(cells, 0L, 1L) * gridMarginalB(cells, 0L, 1L) / nEv
    val estGroupA = gridRect(cells, 0L, 1L, 0L, 1L)
    val threshold = nEv / 8L
    val be = bucketedEvents(spark, dir)
    def cornerAgg(il: Long, ih: Long, tl: Long, th: Long): (Long, Long) = {
      val r = be.filter(col("b_id").between(il, ih) &&
          col("b_ts").between(tl, th))
        .agg(count(lit(1)), coalesce(sum(col("user_id").cast("long")),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (actualA, sumUidA) = cornerAgg(0L, 1L, 0L, 1L)
    val advice = if (estGroupA <= threshold) "broadcast" else "shuffle"
    val adviceCorrect =
      (actualA <= threshold) == (estGroupA <= threshold)

    // --- 5. feedback (A62/A65): the MAINTAINED store's pooled
    // correction (q250's session-shared leaf — the capstone reads it,
    // never writes its own scratch), applied to held-out rectangle B ---
    val corrE6 = feedbackCorrectionFor(spark, dir, "id_ts_diag")
    import spark.implicits._
    val estBRaw =
      gridMarginalA(cells, 2L, 3L) * gridMarginalB(cells, 2L, 3L) / nEv
    val estBCorr = feedbackCorrected(estBRaw, corrE6)
    val (actualB, sumUidB) = cornerAgg(2L, 3L, 2L, 3L)
    def errPpmOf(est: Long): Long =
      if (actualB > 0L) math.abs(est - actualB) * 1000000L / actualB
      else est * 1000000L
    val improved = errPpmOf(estBCorr) < errPpmOf(estBRaw)

    Seq(
      ("hist_route", "report", route, estS, estE, estLiUsed, robust,
        repN, repSq, repSc),
      ("join_order", "report", chosen, estLiUsed, estOc, actLi,
        chosen == "lineitem_orders_first", repN, repSq, repSc),
      ("fk_elim", "count_leg",
        if (eliminated) "eliminated" else "kept", pkNdv, orphans,
        cntScans, eliminated, cntN, cntSq, 0L),
      ("group_stat", "corner_a", advice, estIndepA, estGroupA, threshold,
        adviceCorrect, actualA, sumUidA, 0L),
      ("feedback", "corner_b", "applied", estBRaw, estBCorr, corrE6,
        improved, actualB, sumUidB, 0L))
      .toDF("step", "part", "decision", "input_a", "input_b", "output",
        "flag", "n_rows", "sum_a", "sum_b")
  }
}
