package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-measure of the driver-side cost of `spark.read.parquet(path)`
  * (file listing + footer schema inference, no action) vs the
  * fingerprint probe that would gate a memo — the r17 fixed-overhead
  * attribution for the Tables.table/storeParquet memoization decision.
  */
object ReadCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm one
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"$label%-40s ${ms}%8.2f ms/call (n=$n)")
    }
    val paths = Seq(
      s"$sfDir/lineitem.parquet", s"$sfDir/embeddings.parquet",
      s"$sfDir/documents.parquet", s"$sfDir/nation.parquet")
    paths.foreach { p =>
      time(s"read.parquet ${p.split('/').last}", 20) { spark.read.parquet(p); () }
      time(s"dirFingerprint ${p.split('/').last}", 20) { graft.Tables.dirFingerprint(p); () }
    }
    val store = "data/ivf_store_sf0_1/rows"
    if (new java.io.File(store).exists()) {
      time("read.parquet ivf rows dir", 20) { spark.read.parquet(store); () }
      time("dirFingerprint ivf rows dir", 20) { graft.Tables.dirFingerprint(store); () }
    }
    // analysis cost on top: a simple projection + filter resolve
    time("read+filter+schema lineitem", 20) {
      spark.read.parquet(paths.head).filter("l_quantity > 10").schema; ()
    }
    spark.stop()
  }
}
