package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch scaling diagnostics — not part of the engine surface. Prints
  * the intermediate relation sizes that drive the winnowed near-dup
  * pipeline's cost (q65's candidate generation + exact verification), so
  * an sf1/sf0.1 wall-clock ratio can be attributed to a specific
  * relation's growth instead of argued (BENCH_NOTES round-11 scaling
  * session).
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local("scale-probe")
    val docs = graft.Tables.documents(spark, dir)
    val sh = graft.sources.Sources.spillScratch(Dedup.docShingles(docs), "probe_sh")
    val fps = graft.sources.Sources.spillScratch(
      Dedup.winnowingFingerprints(docs).withColumnRenamed("fp", "shingle"),
      "probe_fp")
    println(s"docs           = ${docs.count()}")
    println(s"shingle_rows   = ${sh.count()}")
    println(s"fp_rows        = ${fps.count()}")
    val df = fps.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    println(s"fp_distinct    = ${df.count()}")
    println(s"fp_df_gt100    = ${df.filter(col("df") > 100).count()}")
    println(s"fp_df_gt1000   = ${df.filter(col("df") > 1000).count()}")
    // co-occurrence volume = sum over rare fps of df·(df−1)/2 (what the
    // equi-join materializes before the ≥ minShared count)
    val coRows = df.filter(col("df") <= 1000)
      .agg(sum((col("df") * (col("df") - 1) / 2).cast("long"))).head().getLong(0)
    println(s"co_rows(rare)  = $coRows")
    // co-occurrence mass by df band: where does the quadratic term live?
    df.withColumn("band",
        when(col("df") <= 10, "df<=10").when(col("df") <= 50, "df<=50")
          .when(col("df") <= 100, "df<=100").when(col("df") <= 200, "df<=200")
          .when(col("df") <= 1000, "df<=1000").otherwise("df>1000"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_fps"),
        sum((col("df") * (col("df") - 1) / 2).cast("long")).as("co_rows"))
      .orderBy(col("co_rows").desc)
      .collect().foreach(r => println(s"band ${r.get(0)}: n_fps=${r.get(1)} co_rows=${r.get(2)}"))
    for (cap <- Seq(1000, 200, 100)) {
      val cand = Dedup.candidatePairs(fps, cap, 2)
      println(s"cand_pairs(>=2, cap=$cap) = ${cand.count()}")
    }
    spark.stop()
  }
}
