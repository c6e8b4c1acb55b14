package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: full-hash duplicate multiplicity of the phash corpus —
  * the input for the distinct-hash canonicalization decision.
  */
object DupHashes {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.1", "/root/repo/data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val h = graft.operators.Multimodal.phashQuery(spark, d)
        .select(col("doc_id"), col("phash_lo"), col("phash_hi"))
      val g = h.groupBy(col("phash_lo"), col("phash_hi")).agg(count(lit(1)).as("c"))
      val st = g.agg(count(lit(1)), max(col("c")), sum(col("c")),
        sum(expr("c*(c-1) DIV 2"))).head()
      println(s"DUP dir=$d distinct=${st.getLong(0)} maxMult=${st.getLong(1)} " +
        s"total=${st.getLong(2)} sameHashPairs=${st.getLong(3)}")
    }
    spark.stop()
  }
}
