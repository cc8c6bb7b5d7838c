package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calibrates the enumerator's movement coefficients from MEASURED
  * wall-times — the r19 verdict's task 4: β (q251), γ (q254) and δ
  * (q255) shipped as unit guesses; this probe regresses the q253 arm
  * family's measured seconds onto the model's own features and records
  * what the hardware actually charges per moved row, relative to what
  * it charges per C_out row.
  *
  * Per SF dir (args, default sf0.01 + sf0.1) it executes the five
  * q253 arms full-size — star/cycle × DP-chosen/left-deep with
  * broadcast scoped off (SMJ — movement is shuffle), plus the star
  * chosen tree under default thresholds (movement is broadcast) — and
  * times each (best of `runs`, default 2, to shave ambient noise).
  * Features come from the same model the DPs price with:
  *
  *  - `cout`   = Selinger C_out (Σ est over internal join nodes);
  *  - `shuf`   = Σ est over sides that take a fresh Exchange under
  *               the [[Relational.joinExch]] partitioning-reuse rule
  *               (q253 spec-pinned ≡ Spark's EnsureRequirements);
  *  - `bcast`  = Σ est over shipped sides (per join the smaller-est
  *               side, Spark's own pick at default thresholds), 0
  *               shuffles on this fixture's all-FK star.
  *
  * The raw fit solves least squares sec ≈ a·cout + b·shuf + c·bcast
  * + d by 4×4 normal equations — and the probe's FIRST finding is that
  * this regression is structurally ill-conditioned on any SMJ arm
  * family: an SMJ tree's shuffled rows are AFFINELY DEPENDENT on its
  * C_out (shuf = cout − est(root) + Σ leaf rows absent reuse — every
  * non-root node is exchanged once, the root output never is; reuse
  * shifts the constant, never the slope), and all features scale ∝
  * SF, so a and
  * b are never separately identifiable from tree-shape contrasts
  * (measured: the raw fit's signs flip between SF subsets). The raw
  * coefficients are printed for the record; the CONSUMABLE estimates
  * come from the two contrasts the family does identify, each exact
  * algebra on paired arms (intercept and shared terms cancel):
  *
  *  - `combined_rate` (a+b): from left_deep−chosen pairs, where
  *    Δcout = Δshuf exactly, Δsec = (a+b)·Δcout — slope by
  *    est-weighted LS across graphs × SFs;
  *  - `shuffle_rate_ub` (b, upper bound at c→0): from the same-tree
  *    SMJ-vs-broadcast pairs, Δsec = b·shuf − c·bcast ≤ b·shuf;
  *  - `delta_shuffle_e2` = round(100·b_ub/(a+b)): what the DPs'
  *    γ/δ should charge per moved row if a C_out row is worth 100.
  *
  * The closing check re-runs [[Relational.dpCcpExchange]] (fitted γ)
  * and [[Relational.dpCcpUnified]] (fitted δ) on the measured stats
  * and reports whether the fitted winners still match the
  * unit-coefficient winners — agreement or flip is the finding either
  * way, recorded in BENCH_NOTES and pinned by CostFitSpec at the
  * recorded coefficients.
  *
  * Measurement probe by nature (wall clock is the dependent variable),
  * so a tools/ main like XoProbe, not a registry query. */
object CostFitProbe {
  /** (partitioning classes, C_out, shuffled rows) of an SMJ tree. */
  private[graft] def smjFeatures(est: Int => Long,
                          tree: Int => (Int, Int, Seq[Int]),
                          mask: Int): (Seq[Int], Long, Long) = {
    val (l, r, k) = tree(mask)
    if (l == 0) (Seq.empty, 0L, 0L)
    else {
      val (lp, lc, lm) = smjFeatures(est, tree, l)
      val (rp, rc, rm) = smjFeatures(est, tree, r)
      val movedL = if (lp == k) 0L else est(l)
      val movedR = if (rp == k) 0L else est(r)
      (k, lc + rc + est(mask), lm + rm + movedL + movedR)
    }
  }

  /** (C_out, broadcast rows) of the same tree run all-broadcast:
    * every join ships its smaller-est side. */
  private[graft] def bcastFeatures(est: Int => Long,
                            tree: Int => (Int, Int, Seq[Int]),
                            mask: Int): (Long, Long) = {
    val (l, r, _) = tree(mask)
    if (l == 0) (0L, 0L)
    else {
      val (lc, lb) = bcastFeatures(est, tree, l)
      val (rc, rb) = bcastFeatures(est, tree, r)
      (lc + rc + est(mask), lb + rb + math.min(est(l), est(r)))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_COSTFIT_RUNS", "2").toInt
    val spark = GraftSession.local("costfit",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val conf = spark.conf
    val points = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Long, Long, Long, Double)]
    var lastCyc: (Seq[(String, Long)], Seq[(Int, Int, Long)]) = null
    for (dir <- sfs) {
      val stats = Relational.ensureTableStats(spark, dir)
        .select(col("table_name"), col("column_name"), col("n_rows"),
          col("ndv")).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3)))
        .toMap
      def rowsOf(t: String, c: String) = stats((t, c))._1
      def d(a: (String, String), b: (String, String)) =
        math.max(stats(a)._2, stats(b)._2)
      // --- cycle (the q249/q254/q255 graph) ---
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
      lastCyc = (cycTables, cycEdges)
      val cycDp = Relational.dpCcp(cycTables, cycEdges)
      val cycDfs = Seq(Tables.lineitem(spark, dir),
        Tables.orders(spark, dir), Tables.customer(spark, dir),
        Tables.nation(spark, dir), Tables.supplier(spark, dir))
      val cycConds = Seq(
        col("l_orderkey") === col("o_orderkey"),
        col("o_custkey") === col("c_custkey"),
        col("c_nationkey") === col("n_nationkey"),
        col("n_nationkey") === col("s_nationkey"),
        col("s_suppkey") === col("l_suppkey"))
      val cycClasses = Relational.CycleKeyClasses
      def cycTree(m: Int): (Int, Int, Seq[Int]) = {
        val c = cycDp(m)
        if (c.crossEdges.isEmpty) (0, 0, Nil)
        else (c.leftMask, c.rightMask,
          c.crossEdges.map(cycClasses).distinct.sorted)
      }
      def ldTree(edges: Seq[(Int, Int, Long)],
                 classes: Seq[Int])(m: Int): (Int, Int, Seq[Int]) = {
        val k = 31 - java.lang.Integer.numberOfLeadingZeros(m)
        if (java.lang.Integer.bitCount(m) == 1) (0, 0, Nil)
        else {
          val prior = m & ~(1 << k)
          val cs = edges.indices.filter { e =>
            val (a, b, _) = edges(e)
            (a == k && (prior & (1 << b)) != 0) ||
              (b == k && (prior & (1 << a)) != 0)
          }
          (prior, 1 << k, cs.map(classes).distinct.sorted)
        }
      }
      def estOf(tables: Seq[(String, Long)], edges: Seq[(Int, Int, Long)])
          (m: Int): Long = {
        val num = tables.indices.filter(i => (m & (1 << i)) != 0)
          .map(i => BigInt(tables(i)._2)).product
        val den = edges.filter { case (a, b, _) =>
          (m & (1 << a)) != 0 && (m & (1 << b)) != 0
        }.map(e => BigInt(e._3)).product
        (num / den).toLong
      }
      val cycEst = estOf(cycTables, cycEdges) _
      def buildCyc(m: Int): DataFrame = {
        val c = cycDp(m)
        if (c.crossEdges.isEmpty)
          cycDfs(java.lang.Integer.numberOfTrailingZeros(m))
        else buildCyc(c.leftMask).join(buildCyc(c.rightMask),
          c.crossEdges.map(cycConds).reduce(_ && _))
      }
      def buildLd(dfs: Seq[DataFrame], edges: Seq[(Int, Int, Long)],
                  conds: Seq[org.apache.spark.sql.Column]): DataFrame =
        (1 until 5).foldLeft(dfs.head) { (acc, k) =>
          val prior = (1 << k) - 1
          val cs = edges.indices.filter { e =>
            val (a, b, _) = edges(e)
            (a == k && (prior & (1 << b)) != 0) ||
              (b == k && (prior & (1 << a)) != 0)
          }
          acc.join(dfs(k), cs.map(conds).reduce(_ && _))
        }
      // --- star (the q245/q251 graph) ---
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
      val starDp = Relational.selingerGraphDp(starTables, starEdges)
      val starDfs = Seq(Tables.lineitem(spark, dir),
        Tables.orders(spark, dir), Tables.customer(spark, dir),
        Tables.part(spark, dir), Tables.supplier(spark, dir))
      val starConds = Seq(
        col("l_orderkey") === col("o_orderkey"),
        col("o_custkey") === col("c_custkey"),
        col("l_partkey") === col("p_partkey"),
        col("l_suppkey") === col("s_suppkey"))
      val starEst = estOf(starTables, starEdges) _
      def starTree(m: Int): (Int, Int, Seq[Int]) = {
        val c = starDp(m)
        if (c.cutEdge < 0) (0, 0, Nil)
        else (c.leftMask, c.rightMask, Seq(c.cutEdge))
      }
      def buildStar(m: Int): DataFrame = {
        val c = starDp(m)
        if (c.cutEdge < 0)
          starDfs(java.lang.Integer.numberOfTrailingZeros(m))
        else buildStar(c.leftMask).join(buildStar(c.rightMask),
          starConds(c.cutEdge))
      }
      val full = 31
      def time(df: => DataFrame): Double =
        (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          df.agg(count(lit(1)),
            coalesce(sum(col("l_quantity").cast("long")), lit(0L)))
            .collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      val scoped = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
      val saved = scoped.map { case (k, _) => k -> conf.getOption(k) }
      scoped.foreach { case (k, v) => conf.set(k, v) }
      val smjArms = try {
        Seq(
          ("star", "chosen", starEst, starTree _,
            () => buildStar(full)),
          ("star", "left_deep", starEst,
            ldTree(starEdges, Seq(0, 1, 2, 3)) _,
            () => buildLd(starDfs, starEdges, starConds)),
          ("cycle", "chosen", cycEst, cycTree _,
            () => buildCyc(full)),
          ("cycle", "left_deep", cycEst,
            ldTree(cycEdges, cycClasses) _,
            () => buildLd(cycDfs, cycEdges, cycConds))
        ).map { case (g, a, est, tree, mk) =>
          val (_, cout, shuf) = smjFeatures(est, tree, full)
          val sec = time(mk())
          (dir, g, a, cout, shuf, 0L, sec)
        }
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      val (bcCout, bcRows) = bcastFeatures(starEst, starTree _, full)
      val bcSec = time(buildStar(full))
      points ++= smjArms
      points += ((dir, "star", "chosen_bcast", bcCout, 0L, bcRows, bcSec))
    }
    points.foreach { case (sf, g, a, cout, shuf, bc, sec) =>
      println(f"""{"sf":"$sf","graph":"$g","arm":"$a","cout":$cout,"shuf":$shuf,"bcast":$bc,"sec":$sec%.4f}""")
    }
    // least squares: sec ~ a*cout + b*shuf + c*bcast + d
    val xs = points.map(p =>
      Array(p._4.toDouble, p._5.toDouble, p._6.toDouble, 1.0)).toArray
    val ys = points.map(_._7).toArray
    val k = 4
    val ata = Array.ofDim[Double](k, k)
    val aty = Array.ofDim[Double](k)
    for (r <- xs.indices; i <- 0 until k) {
      aty(i) += xs(r)(i) * ys(r)
      for (j <- 0 until k) ata(i)(j) += xs(r)(i) * xs(r)(j)
    }
    // gaussian elimination with partial pivoting
    val m = Array.tabulate(k)(i => ata(i) :+ aty(i))
    for (c0 <- 0 until k) {
      val piv = (c0 until k).maxBy(r => math.abs(m(r)(c0)))
      val t = m(c0); m(c0) = m(piv); m(piv) = t
      require(math.abs(m(c0)(c0)) > 1e-18, "singular normal equations")
      for (r <- 0 until k if r != c0) {
        val f = m(r)(c0) / m(c0)(c0)
        for (j <- c0 to k) m(r)(j) -= f * m(c0)(j)
      }
    }
    val beta = (0 until k).map(i => m(i)(k) / m(i)(i))
    val (a, b, c, d0) = (beta(0), beta(1), beta(2), beta(3))
    // the identifiable contrasts (see Scaladoc): paired differences,
    // est-weighted LS slope through the origin
    val byKey = points.map(p => (p._1, p._2, p._3) -> p).toMap
    val ldPairs = for {
      sf <- sfs; g <- Seq("star", "cycle")
      ch <- byKey.get((sf, g, "chosen"))
      ld <- byKey.get((sf, g, "left_deep"))
    } yield ((ld._4 - ch._4).toDouble, ld._7 - ch._7)
    val combinedRate = ldPairs.map { case (x, y) => x * y }.sum /
      ldPairs.map { case (x, _) => x * x }.sum
    val bcPairs = for {
      sf <- sfs
      smj <- byKey.get((sf, "star", "chosen"))
      bcA <- byKey.get((sf, "star", "chosen_bcast"))
    } yield (smj._5.toDouble, smj._7 - bcA._7)
    val shuffleRateUb = bcPairs.map { case (x, y) => x * y }.sum /
      bcPairs.map { case (x, _) => x * x }.sum
    val dShufE2 =
      if (combinedRate > 0)
        math.max(0L, math.round(100.0 * shuffleRateUb / combinedRate))
      else -1L
    val dBcastE2 = dShufE2
    // winner stability at the fitted coefficients, on the last SF's
    // measured stats
    val (cycT, cycE) = lastCyc
    val classes = Relational.CycleKeyClasses
    def exchWinner(g: Long) = Relational
      .dpCcpExchange(cycT, cycE, classes, gammaE2 = math.max(0L, g))
      .collect { case ((m0, _), cc) if m0 == 31 => cc }
      .minBy(cc => (cc.cost, cc.part.mkString(",")))
    def uniWinner(dd: Long) = Relational
      .dpCcpUnified(cycT, cycE, classes, deltaE2 = math.max(0L, dd))
      .collect { case ((m0, _), cc) if m0 == 31 => cc }
      .minBy(cc => (cc.cost, cc.part.mkString(",")))
    val exFit = exchWinner(dShufE2)
    val exUnit = exchWinner(100L)
    val unFit = uniWinner(dBcastE2)
    val unUnit = uniWinner(100L)
    // fastest cycle arm PER SF (a global min would always land on the
    // smallest SF's point and say nothing about the others)
    val fastestPerSf = points.filter(_._2 == "cycle").groupBy(_._1)
      .map { case (sf, ps) => sf -> ps.minBy(_._7)._3 }
    val chosenFastestAllSfs = fastestPerSf.values.forall(_ == "chosen")
    println(
      f"""{"raw_fit_ill_conditioned":{"alpha_cout":$a%.3e,"beta_shuffle":$b%.3e,"gamma_bcast":$c%.3e,"intercept":$d0%.3e},""" +
      f""""combined_rate_sec_per_row":$combinedRate%.3e,"shuffle_rate_ub_sec_per_row":$shuffleRateUb%.3e,""" +
      f""""delta_shuffle_e2":$dShufE2,"delta_bcast_e2":$dBcastE2,""" +
      s""""exch_fitted_plan":"${exFit.plan}","exch_unit_plan":"${exUnit.plan}",""" +
      s""""exch_stable":${exFit.plan == exUnit.plan},""" +
      s""""uni_fitted_plan":"${unFit.plan}","uni_unit_plan":"${unUnit.plan}",""" +
      s""""uni_stable":${unFit.plan == unUnit.plan},""" +
      s""""cycle_fastest_arm_per_sf":{${fastestPerSf.map {
        case (sf, a) => s""""$sf":"$a""""
      }.mkString(",")}},""" +
      s""""cycle_chosen_fastest_all_sfs":$chosenFastestAllSfs}""")
    spark.stop()
  }
}
