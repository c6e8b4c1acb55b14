package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: a VANILLA session (none of graft's
  * configs — no extensions, no nanosAsLong) calling SparkEntry.entry.
  * entry() must not depend on anything our own builders set up.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0, "driver smoke would fail: entry returned no rows")
    spark.stop()
  }
}
