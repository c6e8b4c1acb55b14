package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 attribution probe for the PQ-family regression: times each stage of
  * the knn_pq plan separately (codes scan, LUT build, ADC aggregate, rank
  * window) at bench session config, and reports the codes layout (files,
  * rows, scan partitions) so layout effects separate from plan effects.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()

    val path = graft.sources.PqStore.defaultPath(sfDir)
    graft.sources.PqStore.ensure(spark, sfDir, path)

    def time(label: String, n: Int = 3)(f: => Unit): Unit = {
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }

    val codesDir = new java.io.File(s"$path/codes")
    def countFiles(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(countFiles).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    println(s"codes files: ${countFiles(codesDir)}")

    val codes = spark.read.parquet(s"$path/codes")
    println(s"codes rows: ${codes.count()}  scan partitions: ${codes.rdd.getNumPartitions}")
    println(s"embeddings rows: ${graft.Tables.embeddings(spark, sfDir).count()}")
    println(s"rotation kind: ${java.nio.file.Files.readString(java.nio.file.Paths.get(s"$path/_rotation_kind")).trim}")

    time("codes scan (noop)") {
      spark.read.parquet(s"$path/codes")
        .write.format("noop").mode("overwrite").save()
    }
    val queries = graft.operators.VectorSearch.querySet(spark, sfDir, 5)
    time("querySet count") { queries.count(); () }

    // Replicate adcScores stage by stage (keep in sync with PqStore).
    import graft.functions.VectorFunctions.{dot, micro}
    val d = 8
    val books = spark.read.parquet(s"$path/codebooks")
    val coarse = spark.read.parquet(s"$path/coarse")
    val rotRows: Array[Array[Float]] = spark.read.parquet(s"$path/rotation")
      .orderBy(col("i")).collect().map(_.getSeq[Double](1).map(_.toFloat).toArray)
    time("rotation read+collect") {
      spark.read.parquet(s"$path/rotation").orderBy(col("i")).collect(); ()
    }
    val elems = rotRows.map(row => dot(col("qvec"), lit(row)).cast("float"))
    val rq = queries.select(col("qid"), array(elems.toIndexedSeq: _*).as("rqvec"))
    time("rotated queries (count)") { rq.count(); () }
    val lut = rq.crossJoin(broadcast(books))
      .select(col("qid"), col("sub"), col("code"),
        micro(dot(slice(col("rqvec"), col("sub") * d + 1, lit(d)),
          col("centroid").cast("array<float>"))).as("p_micro"))
    time("lut (count)") { lut.count(); () }
    val cellLut = queries.crossJoin(broadcast(coarse))
      .select(col("qid"), col("cell_id"),
        micro(dot(col("qvec"), col("centroid").cast("array<float>"))).as("c_micro"))
    time("cellLut (count)") { cellLut.count(); () }
    val codesDf = spark.read.parquet(s"$path/codes")
    val adc = codesDf.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"), col("cell_id"))
      .agg(sum(col("p_micro")).as("r_micro"))
      .join(broadcast(cellLut), Seq("qid", "cell_id"))
      .select(col("qid"), col("vec_id"),
        (col("r_micro") + col("c_micro")).as("adc_micro"))
    time("adcScores (noop)") {
      adc.write.format("noop").mode("overwrite").save()
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_micro").desc, col("vec_id"))
    val ranked = adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id"), col("rank"), col("adc_micro"))
    time("ranked no orderBy (count)") { ranked.count(); () }
    time("full knn_pq (count)") {
      graft.sources.PqStore.searchQuery(spark, sfDir).count(); ()
    }

    // Per-job wall clock of one warm knn_pq call.
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, String.valueOf(js.properties.getProperty("spark.job.description"))))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        done.put(je.jobId, je.time)
    })
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[String]]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val q = stageTasks.computeIfAbsent(te.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
          q.add(f"dur=${te.taskInfo.duration}ms run=${m.executorRunTime}ms deser=${m.executorDeserializeTime}ms gc=${m.jvmGCTime}ms")
          ()
        }
      }
    })
    val t0 = System.nanoTime()
    graft.sources.PqStore.searchQuery(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    var covered = 0L
    jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (start, _)) =>
      val end = done.getOrDefault(id, start)
      covered += end - start
      println(f"job $id%3d  ${(end - start) / 1e3}%7.3f s")
    }
    println(f"knn_pq wall ${wall}%.3f s, job-covered ${covered / 1e3}%.3f s, gaps ${wall - covered / 1e3}%.3f s")
    stageTasks.asScala.toSeq.sortBy(_._1).foreach { case (sid, q) =>
      val ts = q.asScala.toSeq
      println(s"stage $sid (${ts.size} tasks): ${ts.take(6).mkString(" | ")}")
    }
    spark.stop()
  }
}
