package graft

import org.apache.spark.sql.functions._
import graft.sources.BucketedStore

/** Bucketed co-located joins: the shuffle is paid once at write time —
  * subsequent equi-joins on the bucket key plan with no Exchange on
  * either side.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without a shuffle") {
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"label")
    val f = Tables.embeddings(spark, sfDir)
      .select($"vec_id", ($"label" * 2).as("label2"))
    BucketedStore.write(e, "graft_bkt_a", "vec_id")
    BucketedStore.write(f, "graft_bkt_b", "vec_id")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucketing,
      // not about the tiny test table fitting in a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedStore.read(spark, "graft_bkt_a")
        .join(BucketedStore.read(spark, "graft_bkt_b"), "vec_id")
      assert(joined.count() == e.count(), "join is key-complete")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        "co-located join must not shuffle either side\n" + plan.take(2000))
      // bucket metadata reached the scan
      assert(plan.contains("Bucketed: true"), plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      BucketedStore.drop(spark, "graft_bkt_a")
      BucketedStore.drop(spark, "graft_bkt_b")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"label")
    BucketedStore.write(e, "graft_bkt_c", "vec_id")
    try {
      val agg = BucketedStore.read(spark, "graft_bkt_c")
        .groupBy($"vec_id").agg(count(lit(1)).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "groupBy(bucket key) must reuse the bucketing\n" + plan.take(2000))
    } finally BucketedStore.drop(spark, "graft_bkt_c")
  }
}
