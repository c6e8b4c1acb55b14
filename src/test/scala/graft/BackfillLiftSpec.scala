package graft

import org.apache.spark.sql.functions._
import graft.sources.PartitionedStore
import graft.operators.TextAnalysis

/** Dynamic partition-overwrite backfill (only the corrected partition is
  * rewritten; result equals the raw-side correction; idempotent) and
  * collocation lift (above-chance pairs outrank frequent-but-independent
  * ones; named-query invariants).
  */
class BackfillLiftSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(root: String): Map[String, Map[String, Long]] = {
    val rows = new java.io.File(root)
    rows.listFiles().filter(_.getName.startsWith("event_date=")).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }.toMap
  }

  test("backfill rewrites ONLY the corrected day's partition") {
    PartitionedStore.backfillQuery(spark, sfDir).collect() // build + first overwrite
    val root = PartitionedStore.defaultPath(sfDir) + "_bf/rows"
    val before = partFiles(root)
    Thread.sleep(1100) // mtime granularity
    PartitionedStore.backfillQuery(spark, sfDir).collect()
    val after = partFiles(root)
    val lo = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
    val day2 = "event_date=" + lo.toLocalDate.plusDays(1).toString
    assert(before.contains(day2) && after.contains(day2), s"missing $day2 partition")
    val untouched = before.keySet - day2
    assert(untouched.nonEmpty, "need more than one partition to demonstrate selectivity")
    untouched.foreach { p =>
      assert(before(p) == after(p), s"partition $p was rewritten by an unrelated backfill")
    }
    assert(before(day2) != after(day2), s"the corrected partition must be rewritten")
  }

  test("backfill result equals the raw-side correction and is idempotent") {
    val got = PartitionedStore.backfillQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val got2 = PartitionedStore.backfillQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == got2, "overwriting the same derivation must be idempotent")
    val lo = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
    val day2 = java.sql.Date.valueOf(lo.toLocalDate.plusDays(1))
    val want = Tables.events(spark, sfDir)
      .withColumn("v", when(to_date($"ts") === lit(day2), $"value" * 2).otherwise($"value"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum($"v".cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
      .orderBy($"event_type")
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want, s"backfill changed the aggregate: $got vs $want")
  }

  test("lift ranks an always-adjacent pair above a frequent independent pair") {
    // "aa bb" always adjacent (lift ≈ N/c_a≫1); "xx"/"yy" frequent but
    // paired only once each — near-chance co-occurrence.
    val docs = (
      (1L to 10L).map(i => (i, "aa bb xx")) ++
        (11L to 20L).map(i => (i, "yy zz aa bb")) ++
        Seq((21L, "xx yy xx yy xx yy xx yy"))
      ).toDF("doc_id", "text")
    val uni = docs.select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum($"c")).head().getLong(0)
    val bi = docs.select(explode(graft.functions.Grams.kgrams(split($"text", " "), 2)).as("b"))
      .groupBy($"b").agg(count(lit(1)).as("c_ab"))
    val counts = uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pairs = bi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def lift(big: String): Long = {
      val Array(a, b) = big.split(" ")
      pairs(big) * n * 1000000L / (counts(a) * counts(b))
    }
    assert(lift("aa bb") > lift("xx yy"),
      s"adjacent pair must outrank independent pair: ${lift("aa bb")} vs ${lift("xx yy")}")
  }

  test("keyphrases: stopwords never appear inside a phrase, scores consistent") {
    val out = TextAnalysis.keyphrases(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 25)
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    assert(out.forall(r => r.getString(0).split(" ").forall(w => !stop(w) && w.nonEmpty)),
      "candidate phrases must be stopword-free")
    assert(out.forall(r => r.getString(0).split(" ").length == r.getLong(1).toInt),
      "n_words must match the phrase text")
    val scores = out.map(_.getLong(3))
    assert(scores.toSeq == scores.sortBy(-_).toSeq, "descending score order")
    // a known RAKE property on a toy doc: a 2-word phrase outscores its
    // members' single-word phrases when the words only co-occur
    val toy = Seq((1L, "alpha beta and alpha beta and gamma")).toDF("doc_id", "text")
    // alpha/beta: freq 2, degree 4 → score 2e6 each → phrase 4e6; gamma: 1e6
    // (replayed inline — keyphrases() reads the corpus table, this checks the rule)
    val toks = toy.select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("is_stop", $"w".isin("and"))
    val wrun = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
      .orderBy($"pos").rowsBetween(Long.MinValue, 0)
    val cand = toks.withColumn("grp", sum(when($"is_stop", 1L).otherwise(0L)).over(wrun))
      .filter(!$"is_stop")
    val stats = cand.groupBy($"grp").agg(count(lit(1)).as("plen"))
      .join(cand, Seq("grp"))
      .groupBy($"w").agg(count(lit(1)).as("freq"), sum($"plen").as("degree"))
      .withColumn("ws", expr("degree * 1000000 DIV freq"))
      .select($"w".as[String], $"ws".as[Long]).collect().toMap
    assert(stats("alpha") == 2000000L && stats("beta") == 2000000L && stats("gamma") == 1000000L,
      s"RAKE word scores off: $stats")
  }

  test("named lift query: deterministic, ordered, min-count enforced") {
    val a = TextAnalysis.phraseLift(spark, sfDir).collect().toSeq
    val b = TextAnalysis.phraseLift(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.length <= 50)
    assert(a.forall(_.getLong(1) >= 5L), "min-count filter must hold")
    val lifts = a.map(_.getLong(4))
    assert(lifts == lifts.sortBy(-_), "descending lift order")
  }
}
