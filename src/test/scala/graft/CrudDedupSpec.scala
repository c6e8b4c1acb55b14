package graft

import org.apache.spark.sql.functions._
import graft.operators.{Crud, Dedup}

/** §2.4 CRUD semantics + §2.3 dedup invariants. */
class CrudDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val n = Tables.embeddings(spark, sfDir).count()

  test("insert adds exactly the batch size") {
    assert(Crud.insert(spark, sfDir).count() == n + 100)
  }

  test("delete-last-N drops the N highest keys and nothing else") {
    val out = Crud.deleteLastN(spark, sfDir, 100)
    assert(out.count() == n - 100)
    val maxKept = out.agg(max($"vec_id")).as[Long].head()
    val threshold = Tables.embeddings(spark, sfDir)
      .orderBy($"vec_id".desc).limit(100)
      .agg(min($"vec_id")).as[Long].head()
    assert(maxKept < threshold)
  }

  test("update only touches the predicate rows") {
    val out = Crud.update(spark, sfDir)
    assert(out.count() == n)
    val changed = out.filter($"label" >= 100).count()
    val expected = Tables.embeddings(spark, sfDir).filter($"vec_id" % 7 === 3).count()
    assert(changed == expected)
  }

  test("upsert keeps exactly one row per key with v2 winning") {
    val out = Crud.upsert(spark, sfDir)
    assert(out.count() == n, "no duplicate keys survive")
    assert(out.filter($"vec_id" < 50 && $"label" < 1000).count() == 0, "v2 wins under 50")
    assert(out.filter($"vec_id" >= 50 && $"label" >= 1000).count() == 0, "v1 untouched above")
  }

  test("upsert is idempotent") {
    val once = Crud.upsert(spark, sfDir)
    // applying the same fresh batch on top of `once` changes nothing
    val again = {
      val fresh = Tables.embeddings(spark, sfDir).filter($"vec_id" < 50)
        .select($"vec_id", ($"label" + 1000).as("label"), lit(2).as("version"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"version".desc)
      once.withColumn("version", lit(2))
        .unionByName(fresh)
        .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"vec_id", $"label")
    }
    assert(again.exceptAll(once).count() == 0 && once.exceptAll(again).count() == 0)
  }

  test("exact dedup survivors partition the corpus") {
    val d = Dedup.exactDedup(spark, sfDir)
    val total = d.agg(sum($"n_copies")).as[Long].head()
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("minhash: identical texts get identical signatures") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "a completely different sentence with other words entirely"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs, numHashes = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L), "identical docs, identical sigs")
    assert(sigs(1L) != sigs(3L), "different docs differ somewhere")
  }

  test("minhash LSH finds exact duplicates as candidate pairs") {
    val pairs = Dedup.minhashLshPairs(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // exact duplicate texts must be LSH candidates (identical sigs ⇒ same bands)
    val dups = Tables.documents(spark, sfDir)
      .groupBy($"text").agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(expr(
        "flatten(transform(ids, a -> transform(ids, b -> struct(a, b))))")))
      .select($"col.a", $"col.b").filter($"a" < $"b")
      .as[(Long, Long)].collect().toSet
    assert(dups.subsetOf(pairs), s"missing ${(dups -- pairs).take(5)}")
  }

  test("md5 minhash: exact duplicates are candidates; candidates need a shared shingle") {
    val pairs = Dedup.minhashMd5Pairs(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val dups = Tables.documents(spark, sfDir)
      .groupBy($"text").agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(expr(
        "flatten(transform(ids, a -> transform(ids, b -> struct(a, b))))")))
      .select($"col.a", $"col.b").filter($"a" < $"b")
      .as[(Long, Long)].collect().toSet
    assert(dups.subsetOf(pairs), s"missing ${(dups -- pairs).take(5)}")
    // a band collision (3 shared minima) without any shared shingle would be
    // an md5 collision — candidates must overlap in shingle space
    val withJaccard = Dedup.ngramJaccardPairs(spark, sfDir, threshold = 0.0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(withJaccard), s"phantom ${(pairs -- withJaccard).take(5)}")
  }

  test("incremental near-dup equals the cross-side slice of the full pair query") {
    // Probing the corpus band index with the incoming batch must find
    // exactly the full self-join's pairs that straddle the split — no
    // pair lost by splitting, none invented.
    val inc = Dedup.incrementalNearDup(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val full = Dedup.minhashMd5Pairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val crossSide = full.collect {
      case (a, b) if a % 10 == 0 && b % 10 != 0 => (a, b)
      case (a, b) if b % 10 == 0 && a % 10 != 0 => (b, a)
    }
    assert(inc == crossSide,
      s"missing ${(crossSide -- inc).take(5)}, phantom ${(inc -- crossSide).take(5)}")
    // and no incoming-incoming or corpus-corpus pair leaks through
    assert(inc.forall { case (q, c) => q % 10 == 0 && c % 10 != 0 })
  }

  test("incremental probe reads the persisted band index with no corpus-side shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val table = Dedup.ensureBandIndex(spark, sfDir, 12, 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probes = Dedup.md5BandFrame(
        Tables.documents(spark, sfDir).filter($"doc_id" % 10 === 0), 12, 4)
      val joined = probes.as("q").join(spark.table(table).as("c"),
        $"q.band" === $"c.band" && $"q.bk" === $"c.bk")
      joined.count() // finalize the adaptive plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val smj = finalPlan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "probe must plan as a sort-merge join\n" + finalPlan)
      def hasBucketedScan(p: SparkPlan): Boolean =
        p.toString.contains("Bucketed: true")
      val corpusSide = Seq(smj.get.left, smj.get.right).find(hasBucketedScan)
      assert(corpusSide.nonEmpty, "one join side must be the bucketed index scan\n" + finalPlan)
      val shuffles = corpusSide.get.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        "corpus index side must be co-located (no Exchange)\n" + corpusSide.get)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("band index survives a catalog wipe: re-register reuses the bucketed files, no rebuild") {
    val table = Dedup.ensureBandIndex(spark, sfDir, 12, 4)
    val rows0 = spark.table(table).count()
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).location
    val dir = new java.io.File(loc.getPath)
    assert(dir.exists(), "external band-index dir must exist")
    assert(dir.listFiles().exists(_.getName.startsWith("_src_fp_")),
      "band-index dir must carry the source-fingerprint marker")
    def fileSig() = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified(), f.length())).toSet
    val sig0 = fileSig()
    assert(sig0.nonEmpty)
    // Simulate a fresh JVM: the in-memory catalog forgets the entry, the
    // files persist (the table is EXTERNAL — a bare DROP leaves data).
    spark.sql(s"DROP TABLE $table")
    assert(!spark.catalog.tableExists(table))
    assert(fileSig() == sig0, "bare DROP must leave the external files intact")
    val again = Dedup.ensureBandIndex(spark, sfDir, 12, 4)
    assert(again == table && spark.catalog.tableExists(table))
    assert(fileSig() == sig0,
      "re-register must reuse the existing bucketed files byte-for-byte, not re-CTAS")
    assert(spark.table(table).count() == rows0)
    // The re-attached entry keeps the bucket spec — the co-located-join
    // property (no corpus-side Exchange) must survive the JVM restart.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probes = Dedup.md5BandFrame(
        Tables.documents(spark, sfDir).filter($"doc_id" % 10 === 0), 12, 4)
      val joined = probes.as("q").join(spark.table(table).as("c"),
        $"q.band" === $"c.band" && $"q.bk" === $"c.bk")
      joined.count()
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val smj = finalPlan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "probe must plan as a sort-merge join\n" + finalPlan)
      val corpusSide = Seq(smj.get.left, smj.get.right)
        .find(_.toString.contains("Bucketed: true"))
      assert(corpusSide.nonEmpty,
        "re-registered scan must still be bucketed\n" + finalPlan)
      assert(corpusSide.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "re-registered corpus side must stay Exchange-free\n" + corpusSide.get)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("md5 simhash pairs: hamming bound respected and hamming<=3 pairs are complete") {
    val sigs = Dedup.simhashMd5(Tables.documents(spark, sfDir))
      .as[(Long, Long)].collect()
    val got = Dedup.simhashMd5Pairs(spark, sfDir)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
    assert(got.forall(_._3 <= 6))
    // pigeonhole: 32-bit sig in 4 chunks ⇒ any pair within hamming 3 shares
    // a chunk, so the block join CANNOT miss it
    val brute = for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)
    val gotSet = got.map(t => (t._1, t._2)).toSet
    assert(brute.forall(t => gotSet((t._1, t._2))),
      s"missed close pair among ${brute.take(3).mkString(",")}")
  }

  test("simhash: identical texts collide at hamming 0") {
    val docs = Seq((1L, "spark native analytics engine for packets"),
      (2L, "spark native analytics engine for packets")).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs).select($"simhash").as[Long].collect()
    assert(sigs(0) == sigs(1))
  }

  test("seeded delete removes a scattered ~pct sample and survivors are untouched") {
    val out = Crud.deleteSeeded(spark, sfDir)
    val kept = out.count()
    // ~10% victims: the hash is uniform-ish, allow a wide band
    assert(kept < n && kept > (n * 0.8).toLong, s"kept $kept of $n")
    // survivors are exactly the non-victim predicate rows (anti-join == filter)
    val expected = Tables.embeddings(spark, sfDir)
      .filter((($"vec_id" * 2654435761L + 42L) % 1000000007L) % 100L >= 10)
      .count()
    assert(kept == expected)
  }

  test("banded embedding near-dup candidates are a superset of the single-projection variant") {
    // band 0 of the banded variant IS the 8-bit single projection, so
    // OR-amplification can only add pairs — recall is monotonically >=.
    val single = Dedup.embeddingNearDup(spark, sfDir, bits = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.embeddingNearDupBanded(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(banded), s"missing ${(single -- banded).take(5)}")
  }

  test("banded embedding near-dup: found pairs all meet the threshold (exact verify step)") {
    import graft.functions.VectorFunctions._
    val bad = Dedup.embeddingNearDupBanded(spark, sfDir)
      .filter($"sim_micro" < 300000L).count()
    assert(bad == 0)
    // and recall vs brute force is reported-sane: every banded pair is a
    // true pair (precision 1 by construction), banded finds at least the
    // pairs agreeing on band 0
    val truth = {
      val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
      e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
        .withColumn("sim", dot($"a.embedding", $"b.embedding"))
        .filter($"sim" >= 0.30)
        .select($"a.vec_id".as[Long], $"b.vec_id".as[Long]).collect().toSet
    }
    val banded = Dedup.embeddingNearDupBanded(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(truth), "no false positives after exact verify")
  }

  test("embedding decontam: exact recall vs brute force, train/eval sides disjoint") {
    import graft.functions.VectorFunctions._
    val out = Dedup.embeddingDecontam(spark, sfDir)
    // no eval vector may appear as a flagged train row
    assert(out.filter($"vec_id" % 97 === 0).count() == 0)
    // exact scoring: flagged set == brute-force truth set (full recall)
    val truth = {
      val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
      e.as("t").join(e.as("q"),
          $"t.vec_id" % 97 =!= 0 && $"q.vec_id" % 97 === 0 &&
            dot($"t.embedding", $"q.embedding") >= 0.30)
        .select($"t.vec_id".as[Long]).distinct().collect().toSet
    }
    val flagged = out.select($"vec_id".as[Long]).collect().toSet
    assert(flagged == truth, s"missed ${(truth -- flagged).take(5)}")
    // scale shape: the eval side broadcasts (nested-loop over broadcast,
    // no shuffle of corpus vectors before the partial agg)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("keep-best dedup: partition of the corpus, survivor is argmax quality in-cluster") {
    val out = Dedup.keepBestDedup(spark, sfDir)
    val nDocs = Tables.documents(spark, sfDir).count()
    // clusters partition the corpus: member counts add up to every doc once
    assert(out.agg(sum($"n_members")).as[Long].head() == nDocs)
    // the survivor really is in its own cluster (cluster_id = min member id,
    // survivor may differ — that's the point of keep-BEST over keep-first)
    val cc = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(spark, sfDir).select($"id_a", $"id_b"))
      .select($"node".as[Long], $"label".as[Long]).collect()
    val members = cc.groupBy(_._2).map { case (l, ns) => l -> ns.map(_._1).toSet }
    out.select($"cluster_id".as[Long], $"survivor_id".as[Long]).collect().foreach {
      case (cid, sid) =>
        members.get(cid).foreach(m => assert(m.contains(sid), s"survivor $sid not in cluster $cid"))
    }
    // at least one multi-member cluster exists and keep-best beat keep-first
    // somewhere (a survivor that is not the min id), else the test is vacuous
    assert(out.filter($"n_members" > 1).count() > 0)
    assert(out.filter($"survivor_id" =!= $"cluster_id" && $"n_members" > 1).count() > 0,
      "keep-best never disagreed with keep-first — argmax not exercised")
  }

  test("connected components: chains merge transitively, labels are component minima") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .select($"node", $"label").as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L), "chain 1-2-3-4 is one cluster")
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
  }

  test("connected components: 1000-node chain converges in O(log n) iterations") {
    // The adversarial case for label propagation: a path graph, where
    // diameter = n. Alternating large-star/small-star must close it in
    // logarithmic iterations (the contract that survives a 100 TB
    // chained-duplicate corpus), with every node labelled by the min.
    val n = 1000
    val pairs = spark.range(n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    val bound = 2 * math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt
    assert(rounds <= bound, s"chain of $n took $rounds iterations (bound $bound)")
    val out = labels.select($"node", $"label").as[(Long, Long)].collect()
    assert(out.length == n, "every chain node is labelled exactly once")
    assert(out.forall(_._2 == 0L), "all labels collapse to the component min")
  }

  test("connected components: empty pair graph yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).isEmpty)
  }

  test("near-dup clusters are consistent with the pair graph") {
    val pairs = Dedup.ngramJaccardPairs(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val labels = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(spark, sfDir).select($"id_a", $"id_b"))
      .select($"node", $"label").as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    val clusters = Dedup.nearDupClusters(spark, sfDir).collect()
    assert(clusters.forall(r => r.getLong(1) >= 2), "every emitted cluster has >= 2 members")
    assert(clusters.forall(r => r.getLong(0) == r.getLong(2)), "cluster_id == min member")
  }

  test("semantic dedup: sound (pairs really clear tau), complete within cells, keep-earliest, monotone in tau") {
    val tau = 0.30
    val removed = Dedup.semanticDedup(spark, sfDir, tau).cache()
    // keep-earliest: every eviction points at a strictly lower id
    assert(removed.filter($"dup_of" >= $"vec_id").count() == 0)
    // one verdict per removed id
    assert(removed.groupBy($"vec_id").count().filter($"count" > 1).count() == 0)
    // soundness + completeness against an independent within-cell replay
    // over the SAME persisted clustering the operator reads
    val path = graft.sources.IndexStore.defaultPath(sfDir)
    val (rows, _) = graft.sources.IndexStore.read(spark, path)
    val n = rows.select($"cell_id", $"vec_id", $"embedding")
    val expect = n.as("a").join(n.as("b"),
        $"a.cell_id" === $"b.cell_id" && $"a.vec_id" < $"b.vec_id")
      .withColumn("cos", graft.functions.VectorFunctions.dot($"a.embedding", $"b.embedding"))
      .filter($"cos" >= tau)
      .groupBy($"b.vec_id".as("vec_id"))
      .agg(min($"a.vec_id").as("dup_of"))
    val got = removed.select($"vec_id", $"dup_of")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "removed set must be exactly the higher-id halves of qualifying within-cell pairs")
    // raising tau can only shrink the removed set
    val strict = Dedup.semanticDedup(spark, sfDir, tau = 0.60)
      .select($"vec_id").as[Long].collect().toSet
    val loose = removed.select($"vec_id").as[Long].collect().toSet
    assert(strict.subsetOf(loose), "tau=0.60 removals must be a subset of tau=0.30's")
    removed.unpersist(blocking = false)
  }

  test("containment dominates jaccard pairwise and names the smaller doc as contained") {
    val cont = Dedup.containmentPairs(spark, sfDir, thresholdMicro = 0L).cache()
    // c/min(|A|,|B|) ≥ c/(|A|+|B|−c) for every pair — containment can only
    // be larger than jaccard on the same common count
    val jac = Dedup.ngramJaccardPairs(spark, sfDir, threshold = 0.0)
    val joined = cont.join(jac, Seq("id_a", "id_b"))
    assert(joined.count() > 0)
    assert(joined.filter($"containment_micro" < $"jaccard_micro").count() == 0)
    // bounds + direction contract
    assert(cont.filter($"containment_micro" > 1000000L || $"common" > least($"n_a", $"n_b"))
      .count() == 0)
    assert(cont.filter($"contained_id" =!= $"id_a" && $"contained_id" =!= $"id_b").count() == 0)
    assert(cont.filter(
      ($"n_a" < $"n_b" && $"contained_id" =!= $"id_a") ||
      ($"n_b" < $"n_a" && $"contained_id" =!= $"id_b")).count() == 0)
    // a doc fully pasted into a bigger one: containment 1.0 even though
    // jaccard is diluted by the union
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    val p = Dedup.shingles(docs)
    val sh1 = p.filter($"doc_id" === 1L).select(explode($"sh").as("s"))
    val sh2 = p.filter($"doc_id" === 2L).select(explode($"sh").as("s"))
    assert(sh1.exceptAll(sh2).count() == 0, "doc 1's shingles all appear in doc 2")
    cont.unpersist(blocking = false)
  }

  test("jaccard pairs: duplicate texts score 1.0") {
    val dupPairs = Dedup.ngramJaccardPairs(spark, sfDir, threshold = 0.999)
    val exact = Dedup.exactDedup(spark, sfDir).filter($"n_copies" > 1)
    // at least every exact-duplicate group yields a jaccard-1 pair
    assert(dupPairs.count() >= exact.count())
  }

  test("auto-scaled sign-LSH bits: finer buckets yield a subset of the bits=4 pairs") {
    // bucket equality at k' > k bits implies equality at k bits (prefix
    // property), so the auto-bits result can only shrink the anchor set —
    // and every surviving pair still meets the threshold.
    val anchor = Dedup.embeddingNearDup(spark, sfDir, bits = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val auto = Dedup.embeddingNearDup(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(anchor), "auto-bits pairs must be a subset of the 4-bit anchor")
    val bad = Dedup.embeddingNearDup(spark, sfDir)
      .filter($"sim_micro" < (0.30 * 1e6).toLong - 1).count()
    assert(bad == 0, "every pair meets the cosine threshold")
  }

  test("df-capped jaccard is a subset of the exact result (skew guard only loses recall)") {
    val exact = Dedup.ngramJaccardPairs(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(spark, sfDir, dfCap = 3L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact), "capping shingle df must never invent pairs")
  }

  test("paragraph dedup: every distinct segment survives exactly once, firsts win") {
    val out = Dedup.paragraphDedup(spark, sfDir)
      .select($"doc_id", $"n_segs", $"n_kept", $"text_kept")
      .as[(Long, Long, Long, String)].collect()
    // Independent in-Scala oracle: same non-overlapping 10-word segmentation.
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val segsByDoc = docs.map { case (id, t) => id -> t.split(" ").grouped(10).map(_.mkString(" ")).toVector }
    val firstAt = scala.collection.mutable.Map.empty[String, (Long, Int)]
    for ((id, segs) <- segsByDoc; (s, i) <- segs.zipWithIndex)
      if (!firstAt.contains(s)) firstAt(s) = (id, i)
    assert(out.length == docs.length, "one output row per document")
    assert(out.map(_._3).sum == firstAt.size, "kept segments = distinct segments corpus-wide")
    val expected = segsByDoc.toMap
    for ((id, nSegs, nKept, kept) <- out) {
      val segs = expected(id)
      assert(nSegs == segs.length)
      val survivors = segs.zipWithIndex.collect { case (s, i) if firstAt(s) == (id, i) => s }
      assert(nKept == survivors.length, s"doc $id survivor count")
      assert(kept == survivors.mkString(" "), s"doc $id reconstruction")
    }
  }

  test("banded edit-distance pairs equal an unbanded per-pair replay") {
    val got = Dedup.editDistancePairs(spark, sfDir)
      .select($"id_a".as[Long], $"id_b".as[Long], $"lev".as[Long], $"lev_micro".as[Long])
      .collect().toSeq
    val texts = Tables.documents(spark, sfDir)
      .select($"doc_id".as[Long], $"text".as[String]).collect().toMap
    def fullLev(a: String, b: String): Long = {
      val (n, m) = (a.length, b.length)
      val d = Array.tabulate(n + 1)(i => i.toLong)
      for (j <- 1 to m) {
        var prev = d(0); d(0) = j.toLong
        for (i <- 1 to n) {
          val cur = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      d(n)
    }
    assert(got.nonEmpty, "edit-distance dedup must find pairs at test scale")
    got.foreach { case (ia, ib, lev, levMicro) =>
      val exact = fullLev(texts(ia), texts(ib))
      assert(lev == exact, s"banded lev differs from full DP for ($ia,$ib)")
      val mx = math.max(texts(ia).length, texts(ib).length)
      assert(levMicro == lev * 1000000L / mx && levMicro <= 300000L)
    }
  }

  test("pagerank on the near-dup graph matches an in-Scala integer replay") {
    val got = Dedup.dupPagerank(spark, sfDir)
      .select($"node", $"pr_micro", $"degree").as[(Long, Long, Long)].collect().sortBy(_._1)
    val pairs = Dedup.ngramJaccardPairs(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }.toMap
    for (_ <- 1 to 5)
      pr = edges.groupBy(_._2).map { case (dst, in) =>
        dst -> (150000L + 85L * in.map { case (src, _) => pr(src) / deg(src) }.sum / 100L)
      }
    val expected = pr.toArray.map { case (n, p) => (n, p, deg(n)) }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq, "exact fixed-point pagerank must replay")
  }

  test("repeated sketch-pair calls reuse one persisted table (no cache accumulation)") {
    Dedup.ngramJaccardPairs(spark, sfDir).count()
    Dedup.simhashPairs(spark, sfDir).count()
    val after = Dedup.sketchMemoSize
    Dedup.ngramJaccardPairs(spark, sfDir).count()
    Dedup.simhashPairs(spark, sfDir).count()
    assert(Dedup.sketchMemoSize == after,
      "re-running the pair generators must not persist new sketch tables")
  }

  test("bloom-pruned exact dedup equals the plain content join at any filter size") {
    val docs = Tables.documents(spark, sfDir)
    val expected = docs.filter($"doc_id" % 10 === 0).select($"doc_id", md5($"text").as("w"))
      .join(docs.filter($"doc_id" % 10 =!= 0)
          .groupBy(md5($"text").as("w"))
          .agg(min($"doc_id").as("dup_of"), count(lit(1)).as("n_copies")),
        Seq("w"), "left")
      .select($"doc_id", $"dup_of", coalesce($"n_copies", lit(0L)).as("n_copies"))
    def same(numBits: Long): Unit = {
      val got = Dedup.bloomIncrementalDedup(spark, sfDir, numBits)
      val diff = got.except(expected).count() + expected.except(got).count()
      assert(diff == 0, s"bloom(numBits=$numBits) must be byte-identical to the plain join")
    }
    same(8L * 1024 * 1024)
    // a deliberately tiny filter (64 bits -> fpp ~ 1): every false positive
    // must die in the confirm join — the bloom is a hint, never the answer
    same(64L)
  }

  test("bloom gate prunes: at the default size the maybe-set collapses to the true dups") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val bytes = graft.sources.BloomSidecar.ensure(sfDir, "content_xxh64", 8L * 1024 * 1024) {
      corpus.select(column(new BloomFilterAggregate(expression(xxhash64($"text")),
        Literal(1000000L), Literal(8L * 1024 * 1024)).toAggregateExpression()).as("bf"))
        .head.getAs[Array[Byte]](0)
    }
    val mc = column(BloomFilterMightContain(
      Literal(bytes, BinaryType), expression(xxhash64($"text"))))
    val total = batch.count()
    val maybe = batch.filter(mc).count()
    val trueDups = batch.select(md5($"text").as("w"))
      .join(corpus.select(md5($"text").as("w")).distinct(), "w", "left_semi").count()
    assert(maybe >= trueDups, "no false negatives, ever")
    assert(maybe <= trueDups + math.max(1L, total / 100),
      s"fpp must be ~0 at 1 MiB over this corpus: maybe=$maybe trueDups=$trueDups")
    assert(maybe < total, "the gate must prune at least some novel rows map-side")
  }

  test("bloom sidecar: built once per source generation, rebuilt only on regeneration") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    val srcDir = s"$tmp/data"; new java.io.File(srcDir).mkdirs()
    val sidecarRoot = graft.sources.BloomSidecar.root(srcDir)
    def writeDocs(df: org.apache.spark.sql.DataFrame): Unit = {
      val staging = s"$tmp/stage"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/documents.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.streaming.StreamOps.rmTree(new java.io.File(staging))
    }
    try {
      val docs = Tables.documents(spark, sfDir)
      writeDocs(docs)
      var builds = 0
      def fetch(): Array[Byte] =
        graft.sources.BloomSidecar.ensure(srcDir, "spec", 1024) {
          builds += 1; Array[Byte](1, 2, 3)
        }
      assert(fetch().toSeq == Seq[Byte](1, 2, 3)); assert(builds == 1)
      fetch(); assert(builds == 1, "unchanged source: ensure must serve the persisted sidecar")
      writeDocs(docs.filter($"doc_id" % 2 === 0))
      fetch(); assert(builds == 2, "regenerated source must force a sidecar rebuild")
    } finally {
      graft.streaming.StreamOps.rmTree(new java.io.File(tmp))
      graft.streaming.StreamOps.rmTree(new java.io.File(sidecarRoot))
    }
  }

  test("bloom absorb: a batch delta ORs in with no corpus rescan; band append self-collides") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-absorb").toString
    val docs = Tables.documents(spark, sfDir)
    docs.write.parquet(s"$tmp/documents.parquet")
    val bits = 8L * 1024 * 1024
    var rebuilds = 0
    try {
      // --- bloom sidecar lifecycle ---
      graft.operators.Dedup.ensureContentBloom(spark, tmp, bits)
      val batch = Tables.documents(spark, tmp).filter($"doc_id" % 10 === 0)
      val batchHashes = batch.select(xxhash64($"text")).as[Long].collect()
      val corpusTexts = Tables.documents(spark, tmp).filter($"doc_id" % 10 =!= 0)
        .select(md5($"text")).as[String].collect().toSet
      val novelHashes = batch.filter(!md5($"text").isInCollection(corpusTexts))
        .select(xxhash64($"text")).as[Long].collect()
      assert(novelHashes.nonEmpty, "testdata sanity: the batch has novel content")
      val before = org.apache.spark.util.sketch.BloomFilter.readFrom(
        graft.sources.BloomSidecar.ensure(tmp, "content_xxh64", bits) { rebuilds += 1; fail("must hit memo") })
      assert(novelHashes.exists(h => !before.mightContainLong(h)),
        "pre-absorb: some novel batch content must gate as definitely-absent")
      val after = org.apache.spark.util.sketch.BloomFilter.readFrom(
        graft.operators.Dedup.bloomAbsorbBatch(spark, tmp, batch, bits))
      assert(batchHashes.forall(after.mightContainLong),
        "post-absorb: every batch hash must gate as present (no false negatives)")
      assert(rebuilds == 0, "absorb must never trigger a corpus rescan")
      // --- band index lifecycle ---
      val table = graft.operators.Dedup.bandIndexAbsorb(spark, tmp, batch)
      val probes = graft.operators.Dedup.md5BandFrame(batch, 12, 4)
      val selfHits = probes.as("q")
        .join(spark.table(table).as("c"),
          $"q.band" === $"c.band" && $"q.bk" === $"c.bk" && $"q.doc_id" === $"c.doc_id",
          "left_semi")
        .select($"doc_id").distinct().count()
      val probed = probes.select($"doc_id").distinct().count()
      assert(selfHits == probed,
        "post-append: every batch doc with a band signature must collide with itself")
    } finally {
      graft.streaming.StreamOps.rmTree(new java.io.File(tmp))
      graft.streaming.StreamOps.rmTree(new java.io.File(graft.sources.BloomSidecar.root(tmp)))
      graft.sources.BucketedStore.drop(spark,
        "graft_band_index_" + tmp.replaceAll("[^A-Za-z0-9]", "_") + "_12_4")
    }
  }

  test("bloom-pruned dedup plan: definite-novel branch has no join, maybe branch exactly one") {
    val plan = Dedup.bloomIncrementalDedup(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "the bloom pruning predicate must be in the plan")
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"exactly one exact-confirm join expected, saw $joins\n$plan")
  }

  test("lsh eval: counts reconcile with the two pair queries and ratios are consistent") {
    val r = Dedup.lshEval(spark, sfDir).collect().head
    val nTruth = r.getAs[Long]("n_truth")
    val nCand = r.getAs[Long]("n_cand")
    val nHit = r.getAs[Long]("n_hit")
    assert(nTruth == Dedup.ngramJaccardPairs(spark, sfDir).count())
    assert(nCand == Dedup.minhashMd5Pairs(spark, sfDir).count())
    assert(nHit <= math.min(nTruth, nCand))
    assert(r.getAs[Long]("precision_permille") == nHit * 1000 / nCand)
    assert(r.getAs[Long]("recall_permille") == nHit * 1000 / nTruth)
    // 4 bands × 3 perms is a generous OR-amplification at τ=0.12: the
    // banding should find most true near-dup pairs on this corpus
    assert(r.getAs[Long]("recall_permille") >= 500L,
      s"LSH recall collapsed: ${r.getAs[Long]("recall_permille")}‰")
  }

  test("threshold curve: monotone in τ and consistent with the pair query at τ=0.12") {
    val rows = Dedup.thresholdCurve(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("tau_micro"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_docs_flagged"))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(120000L, 200000L, 300000L, 500000L, 800000L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3, s"not monotone: $a vs $b")
      case _ =>
    }
    assert(rows.head._2 == Dedup.ngramJaccardPairs(spark, sfDir, 0.12).count(),
      "τ=0.12 level must agree with the registered pair query")
    // a pair flags at most 2 docs; a doc needs at least one pair
    rows.foreach { case (_, p, d) => assert(d <= 2 * p && (p == 0 || d >= 2)) }
  }
}
