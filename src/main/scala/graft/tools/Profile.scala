package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.VectorSearch
import graft.Tables

/** Scratch stage profiler for the heavy bench queries (dev tool, not part
  * of the driver contract).
  */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t("warmup")(spark.read.parquet(s"$sfDir/lineitem.parquet").count())
    val e = Tables.embeddings(spark, sfDir)
    t("embeddings count")(e.count())
    val nlist = 44
    val centroids = t("kmeans 5 iters")(VectorSearch.kmeansFit(e, nlist))
    val assigned = t("assign")(VectorSearch.assignCells(e, centroids)).cache()
    t("assigned materialize")(assigned.count())
    val q = VectorSearch.querySet(spark, sfDir, 5)
    t("ivf search")(VectorSearch.ivfSearch(assigned, centroids, q).count())
    t("ivf end-to-end again")(VectorSearch.ivfSearchQuery(spark, sfDir).count())
    t("knn exact")(VectorSearch.knnExact(spark, sfDir).count())
    t("dedup jaccard")(graft.operators.Dedup.ngramJaccardPairs(spark, sfDir).count())
    t("dedup jaccard again")(graft.operators.Dedup.ngramJaccardPairs(spark, sfDir).count())
    spark.stop()
  }
}
