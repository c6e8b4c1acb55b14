package graft.tools
import org.apache.spark.sql.SparkSession
object CodegenDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val df = Seq((Array(1f,2f), Array(3f,4f))).toDF("a","b")
    try {
      val code = org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
      val expr = graft.expressions.DotProductFloat(
        org.apache.spark.sql.GraftColumnBridge.expression(df("a")),
        org.apache.spark.sql.GraftColumnBridge.expression(df("b")))
      println(df.select(dot($"a",$"b")).head())
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
