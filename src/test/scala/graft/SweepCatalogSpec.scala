package graft

import org.apache.spark.sql.functions._
import graft.operators.{CatalogOps, Crud, MultiModel, OpsMetrics, VectorSearch}

/** S6 multi-model sweep, M1 ops-metrics table, C6 catalog surface. */
class SweepCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("combined metrics: 4 genuinely-executed op rows per (model, size)") {
    val sizes = Seq(10, 25) // spec-scale stand-ins for the reference's 6 sizes
    val out = MultiModel.combinedMetrics(spark, sfDir, sizes).collect()
    assert(out.length == MultiModel.models.size * 4 * sizes.size)
    val nBase = Tables.embeddings(spark, sfDir).count()
    MultiModel.models.foreach { case (name, dim) =>
      sizes.foreach { s =>
        def row(op: String) = out.find(r =>
          r.getString(0) == name && r.getString(1) == op && r.getLong(2) == s.toLong).get
        assert(row("insertion").getLong(3) == s.toLong, s"$name insertion@$s")
        assert(row("deletion").getLong(3) == nBase, s"$name deletion@$s")
        assert(row("update").getLong(3) == s.toLong, s"$name update@$s")
        assert(row("query").getLong(3) == MultiModel.K.toLong * s, s"$name query@$s")
        assert(row("insertion").getLong(4) == dim.toLong)
      }
    }
  }

  test("model spaces differ: 32- and 128-dim featurizer outputs have their declared dims") {
    // sanity that the sweep actually runs distinct featurizers: embeddings
    // of the same doc under different dims have different lengths
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text").limit(5)
    val d32 = graft.embed.Featurizer.embedBatched(docs, "text", "e", 32)
      .select(size($"e")).as[Int].head()
    val d128 = graft.embed.Featurizer.embedBatched(docs, "text", "e", 128)
      .select(size($"e")).as[Int].head()
    assert(d32 == 32 && d128 == 128)
  }

  test("ops metrics: deterministic rows_out, non-negative wall_ms") {
    val out = OpsMetrics.opsMetrics(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("delete", "insert", "query", "stats", "update"))
    val byOp = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp("insert") == Crud.insert(spark, sfDir).count())
    assert(byOp("query") == VectorSearch.knnExact(spark, sfDir).count())
    assert(byOp("delete") == Crud.deleteByPredicate(spark, sfDir).count())
    assert(byOp("update") == Crud.update(spark, sfDir).count())
    assert(byOp("stats") == Crud.counts(spark, sfDir).count())
    assert(out.forall(_.getLong(2) >= 0L))
    // peak memory: never negative, and the aggregate-bearing stats op
    // reports a real measurement (HashAggregate tracks peak memory)
    assert(out.forall(_.getLong(3) >= 0L))
    assert(out.find(_.getString(0) == "stats").exists(_.getLong(3) > 0L),
      "aggregate-bearing op should report operator peak memory")
  }

  test("catalog drop-by-prefix leaves non-matching stores untouched") {
    val e = Tables.embeddings(spark, sfDir)
    e.limit(5).createOrReplaceTempView("unrelated_store")
    e.limit(5).createOrReplaceTempView("graft_other_store")
    val out = CatalogOps.catalogQuery(spark, sfDir).collect()
    // survivors: exactly the keep_c store, with its true row count
    assert(out.map(_.getString(0)).toSeq == Seq("graft_cat_keep_c"))
    assert(out.head.getLong(1) == e.filter($"vec_id" < 10).count())
    // victims gone, bystanders alive
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(!names.exists(_.startsWith("graft_cat_tmp_")))
    assert(names.contains("unrelated_store") && names.contains("graft_other_store"))
    spark.catalog.dropTempView("unrelated_store")
    spark.catalog.dropTempView("graft_other_store")
  }

  test("catalog query is idempotent") {
    val a = CatalogOps.catalogQuery(spark, sfDir).collect().toSeq
    val b = CatalogOps.catalogQuery(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
