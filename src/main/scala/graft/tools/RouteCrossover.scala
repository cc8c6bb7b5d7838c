package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch measurement for the [[Dedup.embeddingNearDupPairs]] route cap
  * (round-11 verdict item 2): times the exact-broadcast, banded-LSH and
  * grid-blocked routes over replica-tiled fixture embeddings at several
  * corpus sizes, so `maxExactRows` is a MEASURED time-budget constant,
  * not a guess. Tiling = the ScaleUp discipline (key-shifted replicas,
  * rotation-decorrelated vectors — 10× rows means 10× distinct points,
  * not 10 copies of each neighborhood); the tiled relation is written to
  * scratch parquet first so every route pays the same honest scan.
  *
  * Usage: runMain graft.tools.RouteCrossover <srcDir> [nTargets...]
  */
object RouteCrossover {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val targets = if (args.length > 1) args.drop(1).map(_.toLong).toSeq
                  else Seq(10000L, 20000L, 40000L)
    val spark = GraftSession.local("route-crossover",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    def tiled(n: Long): DataFrame = {
      require(n % nBase == 0, s"target $n must be a multiple of base corpus $nBase")
      val factor = n / nBase
      val reps = spark.range(factor).select(col("id").as("__rep"))
      val dim = 64
      val t = base.crossJoin(broadcast(reps))
        .withColumn("vec_id", col("vec_id") + col("__rep") * ScaleUp.KeyOffset)
        .withColumn("embedding", expr(
          s"transform(sequence(0, $dim - 1), i -> element_at(embedding, " +
          s"CAST(pmod(i + __rep, $dim) AS INT) + 1))").cast("array<float>"))
        .select(col("vec_id"), col("embedding"))
      graft.sources.Sources.spillScratch(t.repartition(32), s"xover_$n")
    }
    def time(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[xover] $label%-28s wall=$secs%8.1fs pairs=$rows%d")
    }
    // optional route filter for large-n sessions where the quadratic
    // routes are deliberately out of budget (e.g. ROUTES=banded8 at 160k)
    val routes = sys.env.get("SPARK_GRAFT_XOVER_ROUTES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def want(r: String): Boolean = routes.forall(_.contains(r))
    targets.foreach { n =>
      val e = tiled(n)
      val actual = e.count()
      println(s"[xover] === n=$actual (target $n) ===")
      if (want("banded8"))
        time(s"banded8 t=0.9 n=$actual", Dedup.embeddingNearDupPairsBandedFor(e, 0.9))
      if (want("banded4"))
        time(s"banded4 t=0.9 n=$actual",
          Dedup.embeddingNearDupPairsBandedFor(e, 0.9, bandBits = 4))
      if (want("exact09"))
        time(s"exact   t=0.9 n=$actual", Dedup.embeddingNearDupPairsExactFor(e, 0.9))
      // the blocked route is ~7× the broadcast kernel's wall on one JVM
      // (same quadratic compute through an SMJ instead of a codegen'd
      // NLJ) — measure it only where the wall stays minute-class
      if (want("blocked") && actual <= 40000L) {
        val nBlocks = math.min(1024L, actual / 100000L + 2L).toInt
        time(s"blocked t=0.4 n=$actual B=$nBlocks",
          Dedup.embeddingNearDupPairsBlockedFor(e, 0.4, nBlocks))
      }
      if (want("exact04"))
        time(s"exact   t=0.4 n=$actual", Dedup.embeddingNearDupPairsExactFor(e, 0.4))
    }
    spark.stop()
  }
}
