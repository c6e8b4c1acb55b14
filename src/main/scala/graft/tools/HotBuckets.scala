package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: per-(band, value) occupancy of the phash band join at the
  * derived layout — the measured input for the hot-bucket salting threshold.
  */
object HotBuckets {
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
      for (w <- Seq(8, 16, 32)) {
        val m = 64 / w
        val bandCols = (0 until m).map { i =>
          val off = w * i
          val mask = (1L << w) - 1
          val e = if (off < 32) s"((phash_lo >> $off) & $mask)"
                  else s"((phash_hi >> ${off - 32}) & $mask)"
          struct(lit(i).as("band"), expr(e).as("bv"))
        }
        val occ = h.select(explode(array(bandCols: _*)).as("b"))
          .groupBy(col("b.band"), col("b.bv")).agg(count(lit(1)).as("c"))
        val top = occ.orderBy(col("c").desc).limit(8).collect()
          .map(r => r.getLong(2)).mkString(",")
        val stats = occ.agg(count(lit(1)), max(col("c")), sum(col("c"))).head()
        println(s"HOT dir=$d w=$w buckets=${stats.getLong(0)} max=${stats.getLong(1)} " +
          s"rows=${stats.getLong(2)} top8=[$top]")
      }
    }
    spark.stop()
  }
}
