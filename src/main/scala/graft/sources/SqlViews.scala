package graft.sources

import org.apache.spark.sql.SparkSession

/** Generation-keyed registration of parquet-backed temp views.
  *
  * `CREATE OR REPLACE TEMPORARY VIEW … USING parquet` eagerly infers the
  * schema from the footers (~0.3 s per call measured at bench config —
  * `BENCH_PROFILE.json` r17: 10 calls, 3.1 s), and the SQL-surface queries
  * re-registered their views on EVERY call because a temp view freezes its
  * file listing at CREATE time — a store rewritten at the same path (merge,
  * compact, absorb) would otherwise serve stale files through the old
  * relation. This helper keeps the per-call staleness guarantee at
  * fingerprint cost instead of schema-inference cost: the view is
  * re-registered only when the path's content fingerprint (file walk —
  * measured ~0.4 ms on store dirs) changes, keyed per session. Same
  * invalidation contract, ~300 ms less fixed overhead per SQL-route query.
  */
object SqlViews {

  private val registered =
    scala.collection.concurrent.TrieMap.empty[(Int, String), (String, Long)]

  def ensureParquetView(spark: SparkSession, name: String, path: String): Unit =
    graft.Profiling.timed("viewDdl") {
      val k = (System.identityHashCode(spark), name)
      val gen = graft.Tables.dirFingerprint(path)
      if (!registered.get(k).contains((path, gen))) {
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name " +
          s"USING parquet OPTIONS (path '$path')")
        registered(k) = (path, gen)
      }
    }
}
