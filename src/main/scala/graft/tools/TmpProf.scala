package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tools.Profile.t

/** Throwaway plan/timing check for round-5 PQ layout work (deleted after use). */
object TmpProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = t("ivfpq first (build)")(
      { val d = graft.sources.PqStore.searchIvfPq(spark, sfDir); d.count(); d })
    t("ivfpq warm")(graft.sources.PqStore.searchIvfPq(spark, sfDir).count())
    val plan = df.queryExecution.executedPlan.toString
    val codeScans = plan.linesIterator.filter(l => l.contains("pq_store")).toSeq
    codeScans.foreach(l => println("[plan] " + l.trim.take(300)))
    println("[check] PartitionFilters on codes scan present = " +
      plan.linesIterator.exists(l => l.contains("pq_store") && l.contains("PartitionFilters: [") &&
        l.contains("cell_id") ))
    spark.stop()
  }
}
