package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch probe: per-stage spill/shuffle attribution for one query — which
  * stage of the plan actually spills.
  */
object SpillWhere {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/data/sf1"
    val q = if (args.length > 1) args(1) else "media_phash_pairs"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val spill = m.memoryBytesSpilled + m.diskBytesSpilled
        if (spill > 0 || m.shuffleWriteMetrics.bytesWritten > 10L * 1048576)
          println(f"STAGE ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%4d " +
            f"spill=${spill / 1048576.0}%8.1f MB shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%8.1f MB " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%8.1f MB  ${s.stageInfo.name.take(80)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(q)(spark, dir).count()
    println(f"DONE $q ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(2000)
    spark.stop()
  }
}
