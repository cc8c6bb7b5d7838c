package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Scratch measurement — edge recall of the IVF-probed kNN route vs the
  * exact graph at above-cap corpus sizes, across nProbe (round-11 verdict
  * item 6: the routed-audit spec floor of 0.3 was a guess; the audit's
  * purity/reciprocity estimates need a floor chosen from a MEASURED
  * recall/cost curve). Tiles the sf0.1 embeddings like RouteCrossover
  * (key-shifted, rotation-decorrelated replicas).
  *
  * Usage: runMain graft.tools.KnnRecallProbe [srcDir] [n] [k]
  */
object KnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toLong else 20000L
    val k = if (args.length > 2) args(2).toInt else 5
    val spark = GraftSession.local("knn-recall-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val base = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    require(n % nBase == 0, s"target $n must be a multiple of base corpus $nBase")
    val factor = n / nBase
    val dim = 64
    val e = graft.sources.Sources.spillScratch(
      base.crossJoin(broadcast(spark.range(factor).select(col("id").as("__rep"))))
        .withColumn("vec_id", col("vec_id") + col("__rep") * ScaleUp.KeyOffset)
        .withColumn("embedding", expr(
          s"transform(sequence(0, $dim - 1), i -> element_at(embedding, " +
          s"CAST(pmod(i + __rep, $dim) AS INT) + 1))").cast("array<float>"))
        .select(col("vec_id"), col("embedding")).repartition(32),
      s"knnrp_$n")
    println(s"[knnrp] n=${e.count()} k=$k")
    val t0 = System.nanoTime()
    val exact = Similarity.knnEdgesRouted(e, k, exactCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[knnrp] exact  wall=${(System.nanoTime() - t0) / 1e9}%8.1fs edges=${exact.size}")
    val probes = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(4, 8, 16)
    for (nProbe <- probes) {
      val t1 = System.nanoTime()
      val routed = Similarity.knnEdgesRouted(e, k, exactCap = 0L, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val wall = (System.nanoTime() - t1) / 1e9
      val recall = routed.count(exact.contains).toDouble / exact.size
      println(f"[knnrp] nProbe=$nProbe%-2d wall=$wall%8.1fs edges=${routed.length}%d recall=$recall%.4f")
    }
    spark.stop()
  }
}
