package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AbsorbProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{GraphIndex, IndexStore}
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val half = t("ensureHalf")(GraphIndex.ensureHalf(spark, dir))
    val emb = graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 10 === 1)
    val work = GraphIndex.defaultPath(dir) + "_probe"
    (1 to 2).foreach { i =>
      t(s"clone$i")(IndexStore.cloneStore(half, work))
      t(s"absorb$i")(GraphIndex.absorb(spark, work, even, odd))
      t(s"probe$i")(GraphIndex.searchFrom(spark, work,
        even.filter(col("vec_id") % GraphIndex.entryStride === 0),
        odd.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        k = 1, beam = 32, hops = 4, maxInlineIds = graft.Tables.MaxInlineIds).count())
      t(s"search$i")(GraphIndex.search(spark, dir, work,
        graft.operators.VectorSearch.querySet(spark, dir, 5)).count())
    }
    graft.streaming.StreamOps.rmTree(new java.io.File(work))
    spark.stop()
  }
}
