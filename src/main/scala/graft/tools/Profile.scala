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
    import graft.operators.MultiModel
    import org.apache.spark.sql.functions._
    // raw driver-side embed throughput, single thread
    t("driver 30k embeds d768") {
      var i = 0L; var acc = 0f
      while (i < 30000) { acc += graft.embed.Featurizer.embed(s"192.168.1.$i 192.168.1.${i + 1} TCP ${i * 10}", 768, "bert_base_nli")(0); i += 1 }
      acc
    }
    // embed-only Spark branch: 30k rows, typed encoder, count
    val synth = spark.range(0, 30000, 1, 3).toDF("i")
      .select(col("i").as("id"), format_string("192.168.1.%d 192.168.1.%d TCP %d", col("i"), col("i") + lit(1L), col("i") * lit(10L)).as("text"))
    t("spark 30k embed d768 p3")(graft.embed.Featurizer.embedBatchedTyped(synth, "id", "text", 768, salt = "bert_base_nli").toDF().agg(count(lit(1))).collect()(0).getLong(0))
    val synth32 = spark.range(0, 30000, 1, 32).toDF("i")
      .select(col("i").as("id"), format_string("192.168.1.%d 192.168.1.%d TCP %d", col("i"), col("i") + lit(1L), col("i") * lit(10L)).as("text"))
    t("spark 30k embed d768 p32")(graft.embed.Featurizer.embedBatchedTyped(synth32, "id", "text", 768, salt = "bert_base_nli").toDF().agg(count(lit(1))).collect()(0).getLong(0))
    t("sweep full")(MultiModel.combinedMetrics(spark, sfDir).collect().length)
    t("sweep full again")(MultiModel.combinedMetrics(spark, sfDir).collect().length)
    spark.stop()
  }
}
