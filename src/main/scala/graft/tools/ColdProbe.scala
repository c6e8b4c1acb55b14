package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces the driver-bench protocol (Bench's min-of-2, clearCache after
  * the pair) on a named query subset, printing BOTH run times — the
  * instrument for attributing cold-environment (fresh `data/`) risers that
  * the reported min should amortize but the r12 driver run showed it does
  * not (BENCH_r12: dedup_crossmodal 8.45 s vs 1.93 s quiet anchor).
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else Seq("dedup_crossmodal", "dedup_embedding_banded", "dedup_lsh_eval",
                         "knn_batch", "embed_maintain", "embed_top_eigen")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    for (q <- names) {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val a = once(); val b = once()
      spark.catalog.clearCache()
      println(f"COLDPROBE $q run1=$a%.2f run2=$b%.2f min=${math.min(a, b)}%.2f")
    }
    spark.stop()
  }
}
