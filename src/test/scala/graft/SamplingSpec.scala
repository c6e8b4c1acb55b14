package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}
import graft.operators.EmbedQueries

/** Deterministic sampling, tf-idf, and feature-stats invariants. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("train/test split is a partition of the corpus and roughly 80/20") {
    val s = Sampling.trainTestSplit(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(s.count() == total, "every row is assigned")
    assert(s.select($"doc_id").distinct().count() == total, "exactly once")
    val train = s.filter($"split" === "train").count()
    val frac = train.toDouble / total
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac should be near 0.8")
    s.unpersist(blocking = false)
  }

  test("split assignment is stable under corpus growth (hash, not RNG)") {
    val full = Sampling.trainTestSplit(spark, sfDir)
      .select($"doc_id", $"split")
    val half = Sampling.trainTestSplit(spark, sfDir)
    // restricting the corpus (as if sampled before it grew) changes NO
    // assignment on the surviving rows
    val restricted = half.filter($"doc_id" % 2 === 0).select($"doc_id", $"split")
    val disagree = restricted.join(full, "doc_id")
      .filter(restricted("split") =!= full("split")).count()
    assert(disagree == 0)
  }

  test("mix sample fills each language quota (or exhausts the stratum) deterministically") {
    val quotas = Map("en" -> 8, "es" -> 4, "de" -> 3, "fr" -> 2, "zh" -> 1)
    val m = Sampling.mixSample(spark, sfDir, quotas).cache()
    val perLang = m.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avail = Tables.documents(spark, sfDir).groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    quotas.foreach { case (lang, cap) =>
      val expect = math.min(cap.toLong, avail.getOrElse(lang, 0L))
      assert(perLang.getOrElse(lang, 0L) == expect, s"$lang: got ${perLang.get(lang)}, want $expect")
    }
    assert(perLang.keySet.subsetOf(quotas.keySet), "no unbudgeted language leaks through")
    // determinism + growth stability: selection is a pure function of keys
    val again = Sampling.mixSample(spark, sfDir, quotas)
    assert(m.exceptAll(again).isEmpty && again.exceptAll(m).isEmpty)
    m.unpersist(blocking = false)
  }

  test("mix sample with an empty quota map returns an empty frame, not an exception") {
    val empty = Sampling.mixSample(spark, sfDir, Map.empty)
    assert(empty.columns.toSeq == Seq("lang", "doc_id", "rn"), "contract schema preserved")
    assert(empty.count() == 0)
  }

  test("DSIR selection: deterministic, nested across budgets, and enriched toward the target domain") {
    val n = 20
    val sel = Sampling.dsirSelect(spark, sfDir, n = n).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(sel.count() == math.min(n.toLong, total), "exactly the budgeted count")
    val again = Sampling.dsirSelect(spark, sfDir, n = n)
    assert(sel.exceptAll(again).isEmpty && again.exceptAll(sel).isEmpty, "pure function of the corpus")
    // a larger budget extends the selection without revoking earlier picks
    // (top-n by a fixed total order is prefix-nested)
    val wider = Sampling.dsirSelect(spark, sfDir, n = 2 * n)
      .select($"doc_id").as[Long].collect().toSet
    val tight = sel.select($"doc_id").as[Long].collect().toSet
    assert(tight.subsetOf(wider), "top-20 must be a prefix of top-40")
    // the whole point: importance resampling overweights target-like docs —
    // the English fraction among selected beats the corpus base rate
    val selEn = sel.filter($"lang" === "en").count().toDouble / sel.count()
    val baseEn = Tables.documents(spark, sfDir).filter($"lang" === "en").count().toDouble / total
    assert(selEn > baseEn,
      s"selected en-fraction $selEn should exceed the corpus base rate $baseEn")
    sel.unpersist(blocking = false)
  }

  test("weighted sample: deterministic, prefix-nested, and mass-biased toward long documents") {
    val sel = Sampling.weightedSample(spark, sfDir, n = 100).cache()
    assert(sel.count() == math.min(100L, Tables.documents(spark, sfDir).count()))
    val again = Sampling.weightedSample(spark, sfDir, n = 100)
    assert(sel.exceptAll(again).isEmpty && again.exceptAll(sel).isEmpty)
    val tight = Sampling.weightedSample(spark, sfDir, n = 50)
      .select($"doc_id").as[Long].collect().toSet
    val wide = sel.select($"doc_id").as[Long].collect().toSet
    assert(tight.subsetOf(wide), "top-50 must be a prefix of top-100")
    // w = n_chars ⇒ selection probability rises with length: the sample's
    // mean length must beat the corpus mean
    val selMean = sel.agg(avg($"n_chars")).head.getDouble(0)
    val corpusMean = Tables.documents(spark, sfDir).agg(avg($"n_chars")).head.getDouble(0)
    assert(selMean > corpusMean,
      s"weighted sample mean length $selMean should exceed corpus mean $corpusMean")
    sel.unpersist(blocking = false)
  }

  test("temperature plan: exact budget conservation, and alpha=1/2 flattens the mix vs proportional") {
    val t = Sampling.temperaturePlan(spark, sfDir).cache()
    val p = Sampling.budgetPlan(spark, sfDir).cache()
    assert(t.agg(sum($"alloc")).head.getLong(0) == 1000000L, "allocations must sum exactly to the budget")
    val tm = t.select($"lang", $"alloc", $"mass").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pm = p.select($"lang", $"alloc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = tm.minBy(_._2._2)._1
    val maxLang = tm.maxBy(_._2._2)._1
    assert(tm(minLang)._1 > pm(minLang),
      s"temperature must upweight the smallest language ($minLang)")
    assert(tm(maxLang)._1 < pm(maxLang),
      s"temperature must downweight the largest language ($maxLang)")
    t.unpersist(blocking = false); p.unpersist(blocking = false)
  }

  test("quality-tier sample: bounded per tier, tiers in range, deterministic") {
    val s = Sampling.qualityTierSample(spark, sfDir, cap = 10).cache()
    val perTier = s.groupBy($"tier").count().as[(Long, Long)].collect().toMap
    assert(perTier.nonEmpty)
    assert(perTier.keySet.forall(t => t >= 0 && t <= 3), s"tiers out of range: ${perTier.keySet}")
    assert(perTier.values.forall(_ <= 10), "cap respected per tier")
    // tier is a pure function of the score
    val bad = s.filter(!($"tier" === least($"score_micro" / 250000, lit(3)).cast("long"))).count()
    assert(bad == 0)
    val again = Sampling.qualityTierSample(spark, sfDir, cap = 10)
    assert(s.exceptAll(again).isEmpty && again.exceptAll(s).isEmpty)
    s.unpersist(blocking = false)
  }

  test("uniform sample size and determinism") {
    val a = Sampling.uniformSample(spark, sfDir, 10).collect()
    val b = Sampling.uniformSample(spark, sfDir, 10).collect()
    assert(a.length == 10)
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
  }

  test("stratified sample takes nPer per language") {
    val s = Sampling.stratifiedSample(spark, sfDir, 5)
    val sizes = s.groupBy($"lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 5))
    val langs = Tables.documents(spark, sfDir).select($"lang").distinct().count()
    assert(s.select($"lang").distinct().count() == langs, "every stratum sampled")
  }

  test("domain cap keeps min(cap, |domain|) longest docs per source") {
    val capped = Sampling.domainCap(spark, sfDir).cache()
    val per = capped.groupBy($"source").count().as[(String, Long)].collect()
    val totals = Tables.documents(spark, sfDir)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(per.nonEmpty)
    per.foreach { case (s, n) => assert(n == math.min(20L, totals(s)), s"$s: $n") }
  }

  test("sequence packing conserves tokens and packs are contiguous per shard") {
    val packs = Sampling.packSequences(spark, sfDir).cache()
    val totalTokens = Tables.documents(spark, sfDir)
      .select(size(split($"text", " ")).cast("long")).as[Long].collect().sum
    assert(packs.agg(sum($"sum_tokens")).as[Long].head() == totalTokens,
      "every token lands in exactly one pack")
    val byShard = packs.select($"shard", $"pack_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted.toSeq }
    byShard.foreach { case (s, ids) =>
      assert(ids == (0L until ids.length), s"shard $s pack ids not contiguous: $ids")
    }
  }

  test("epoch shuffle is a deterministic permutation with dense per-shard positions") {
    val s1 = Sampling.epochShuffle(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(s1.count() == nDocs)
    assert(s1.select("doc_id").distinct().count() == nDocs, "a permutation hits every doc once")
    val byShard = s1.select($"shard", $"pos").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted.toSeq }
    byShard.foreach { case (s, ps) =>
      assert(ps == (0L until ps.length), s"shard $s positions not dense: ${ps.take(5)}")
    }
    assert(s1.collect().toSeq == Sampling.epochShuffle(spark, sfDir).collect().toSeq,
      "same epoch twice = identical order")
    // different epochs permute differently (first few rows suffice)
    val e2 = Sampling.epochShuffle(spark, sfDir, epoch = 2)
    assert(s1.limit(10).collect().toSeq != e2.limit(10).collect().toSeq)
  }

  test("tf-idf ranks a document's rare term above its common term") {
    val r = TextAnalysis.tfIdf(spark, sfDir).cache()
    // within a doc, rank order == score order (desc)
    val bad = r.as[(Long, String, Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
      .count { rows =>
        val sorted = rows.sortBy(_._6)
        sorted.map(_._5).toSeq != sorted.map(_._5).sortBy(-_).toSeq
      }
    assert(bad == 0, "rank must follow score desc")
    // idf monotonicity: same tf, smaller df => higher score
    val viol = r.filter($"rank" <= 3).as[(Long, String, Long, Long, Long, Long)]
      .collect().groupBy(_._1).values.count { rows =>
        rows.exists(a => rows.exists(b =>
          a._3 == b._3 && a._4 < b._4 && a._5 < b._5))
      }
    assert(viol == 0, "with equal tf, rarer terms must not score lower")
    r.unpersist(blocking = false)
  }

  test("dim stats cover every dimension with consistent counts and bounds") {
    val st = EmbedQueries.dimStats(spark, sfDir).cache()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(st.count() == 64, "one row per dimension")
    assert(st.filter($"n" =!= n).count() == 0, "every vector contributes to every dim")
    assert(st.filter($"min_micro" > $"max_micro").count() == 0)
    // embeddings are L2-normalized => |component| <= 1 => micros within ±1e6
    assert(st.filter($"min_micro" < -1000000L || $"max_micro" > 1000000L).count() == 0)
    st.unpersist(blocking = false)
  }

  test("budget apportionment: integer allocations conserve the budget exactly") {
    val budget = 1000000L
    val plan = graft.operators.Sampling.budgetPlan(spark, sfDir, budget)
      .select($"lang".as[String], $"mass".as[Long], $"base".as[Long], $"alloc".as[Long])
      .collect()
    assert(plan.map(_._4).sum == budget, "largest-remainder must hand out the whole budget")
    // each language gets its floor share or floor+1, never less or more
    plan.foreach { case (l, _, base, alloc) =>
      assert(alloc == base || alloc == base + 1, s"$l allocation outside [base, base+1]")
    }
    // proportionality: bigger mass never gets a smaller base share
    plan.sortBy(_._2).map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _           =>
    }
  }

  test("grouped split: identical texts never straddle splits; partition of the corpus") {
    val s = Sampling.groupedSplit(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(s.count() == total, "every row assigned exactly once")
    assert(s.select($"doc_id").distinct().count() == total)
    // contamination safety: every exact-content group lives in ONE split
    val straddlers = Tables.documents(spark, sfDir).select($"doc_id", md5($"text").as("gk"))
      .join(s, "doc_id")
      .groupBy($"gk").agg(countDistinct($"split").as("nsplits"))
      .filter($"nsplits" > 1).count()
    assert(straddlers == 0, "a content group must never straddle splits")
    // rough 80/10/10 shape (group-level hashing, so tolerances are loose)
    val frac = s.filter($"split" === "train").count().toDouble / total
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac should be near 0.8")
    s.unpersist(blocking = false)
  }

  test("cluster split: near-dup PAIRS never straddle splits; partition of the corpus") {
    val s = Sampling.clusterSplit(spark, sfDir).cache()
    val total = Tables.documents(spark, sfDir).count()
    assert(s.count() == total, "every row assigned exactly once")
    assert(s.select($"doc_id").distinct().count() == total)
    // the property groupedSplit can't give: even non-verbatim near-dups
    // (any pair the Jaccard graph connects) share a split
    val pairs = graft.operators.Dedup.ngramJaccardPairs(spark, sfDir, 0.12)
      .select($"id_a", $"id_b")
    val straddlers = pairs
      .join(s.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
      .join(s.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
      .filter($"sa" =!= $"sb").count()
    assert(straddlers == 0, "a near-dup pair must never straddle splits")
    s.unpersist(blocking = false)
  }

  test("global offsets: dense, gapless, and equal to the naive global running sum") {
    val o = Sampling.globalOffsets(spark, sfDir).cache()
    import org.apache.spark.sql.expressions.Window
    // dense: sorting globally by start_offset, each document begins exactly
    // where the previous one ended
    val gaps = o.withColumn("nxt",
        lead($"start_offset", 1).over(Window.partitionBy(lit(1)).orderBy($"start_offset")))
      .filter($"nxt".isNotNull && $"nxt" =!= $"start_offset" + $"n_tokens")
      .count()
    assert(gaps == 0, "offsets must tile the token stream with no gap or overlap")
    assert(o.agg(min($"start_offset")).as[Long].head() == 0L, "stream starts at token 0")
    // two-phase result == the naive single-window global prefix sum
    val naiveW = Window.partitionBy(lit(1)).orderBy($"shard", $"ord", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = Tables.documents(spark, sfDir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"),
        md5(concat($"doc_id".cast("string"), lit(":ep1"))).as("ord"))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(ord, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(ord, 2, 1))") - 1).cast("long") % 8)
      .withColumn("start_offset", sum($"n_tokens").over(naiveW) - $"n_tokens")
      .select($"doc_id", $"start_offset")
    val diff = o.select($"doc_id", $"start_offset").except(naive).count() +
      naive.except(o.select($"doc_id", $"start_offset")).count()
    assert(diff == 0, "two-phase prefix sum must equal the naive global window")
    o.unpersist(blocking = false)
  }

  test("neyman plan: allocations conserve the budget and track N·σ, not N") {
    val budget = 10000L
    val rows = Sampling.neymanPlan(spark, sfDir, budget).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == budget, "Hamilton must conserve exactly")
    assert(rows.forall(r => r.getAs[Long]("alloc") >= 0 && r.getAs[Long]("neyman_w") >= 0))
    // driver-side recompute of N·σ per stratum
    val docs = Tables.documents(spark, sfDir)
      .select($"lang".as[String], $"n_chars".as[Long]).collect().groupBy(_._1)
    rows.foreach { r =>
      val xs = docs(r.getAs[String]("lang")).map(_._2)
      val n = xs.length.toLong
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      val w = math.floor(math.sqrt((n * s2 - s1 * s1).toDouble)).toLong
      assert(r.getAs[Long]("neyman_w") == w, s"${r.getAs[String]("lang")}: $w")
      assert(r.getAs[Long]("n") == n)
    }
    // optimality direction: allocation shares follow weight shares within
    // the ±1 Hamilton rounding
    val totW = rows.map(_.getAs[Long]("neyman_w")).sum
    rows.foreach { r =>
      val ideal = budget.toDouble * r.getAs[Long]("neyman_w") / totW
      assert(math.abs(r.getAs[Long]("alloc") - ideal) <= 1.0,
        s"${r.getAs[String]("lang")}: alloc ${r.getAs[Long]("alloc")} vs ideal $ideal")
    }
  }
}
