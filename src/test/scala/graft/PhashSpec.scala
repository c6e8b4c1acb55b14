package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Perceptual hash: deterministic grays, the perceptual property itself
  * (a rescaled copy of an image hashes close in Hamming space; unrelated
  * images don't), and the named query's contract.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(bytes: Array[Byte]): (Long, Long) = {
    val g = Multimodal.grays9x8(bytes)
    def half(h: Int): Long = (0 until 32).map { i =>
      val bit = h * 32 + i
      val (y, x) = (bit / 8, bit % 8)
      if (g(y * 9 + x) > g(y * 9 + x + 1)) 1L << i else 0L
    }.sum
    (half(0), half(1))
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("grays are deterministic and the hash of an identical image is identical") {
    val img = Multimodal.encodePng(16, 12, seed = 42L)
    assert(Multimodal.grays9x8(img).toSeq == Multimodal.grays9x8(img).toSeq)
    assert(hashOf(img) == hashOf(Multimodal.encodePng(16, 12, seed = 42L)))
  }

  test("a 2x-upscaled copy hashes within a few bits; unrelated images do not") {
    // nearest-neighbor 2x upscale of the SAME pixel content — block
    // averaging sees the same region structure, so gradient signs survive
    val small = Multimodal.encodePng(18, 16, seed = 7L)
    val imgS = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    val big = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36)
      big.setRGB(x, y, imgS.getRGB(x / 2, y / 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bos)
    val dSame = hamming(hashOf(small), hashOf(bos.toByteArray))
    assert(dSame <= 8, s"rescaled copy drifted $dSame bits")
    val dOther = hamming(hashOf(small), hashOf(Multimodal.encodePng(18, 16, seed = 9999L)))
    assert(dOther > dSame, s"unrelated image ($dOther) should exceed the rescaled copy ($dSame)")
  }

  test("pair query catches every rescaled variant against its source") {
    val pairs = Multimodal.phashPairsQuery(spark, sfDir)
      .select($"id_a".as[Long], $"id_b".as[Long], $"hamming".as[Long])
      .collect()
    val variantPairs = pairs.filter { case (a, b, _) =>
      b == a + Multimodal.VariantOffset
    }
    val nVariants = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 10 === 0).count()
    // recall is the method's dial, not a defect: a variant whose drift
    // exceeds tau is out of radius by definition (the MinHash-banding
    // recall trade) — but most variants must land inside, and EVERY
    // within-tau pair is found (pigeonhole over the 4 16-bit bands with
    // single-bit probe expansion: some band differs <= 1 bit), which
    // the exhaustive check below pins exactly
    assert(variantPairs.length * 10 >= nVariants * 7,
      s"too few variants within tau: ${variantPairs.length}/$nVariants")
    assert(pairs.forall(_._3 <= 7L))
    // completeness: brute-force hamming over all hash pairs finds exactly
    // the same within-tau set
    val hs = Multimodal.phashQuery(spark, sfDir)
      .select($"doc_id".as[Long], $"phash_lo".as[Long], $"phash_hi".as[Long])
      .collect()
    val brute = (for {
      a <- hs; b <- hs if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 7
    } yield (a._1, b._1, d.toLong)).toSet
    assert(pairs.toSet == brute,
      s"banding must be exactly the within-tau set: ${pairs.length} vs ${brute.size}")
  }

  test("derived band layout: completeness law, feasibility, and measured-cost argmin") {
    // the completeness law holds for every candidate width at every tau
    for (w <- Multimodal.HammingWidths; tau <- 0 to 15) {
      val p = Multimodal.probeBitsFor(w, tau)
      val m = 64 / w
      assert(m * (p + 1) - 1 >= tau, s"w=$w tau=$tau p=$p violates the law")
      assert(p == 0 || m * p - 1 < tau, s"w=$w tau=$tau p=$p is not minimal")
    }
    // probe combinatorics for the default tau=7
    assert(Multimodal.probesPerBand(8, Multimodal.probeBitsFor(8, 7)) == 1L)
    assert(Multimodal.probesPerBand(16, Multimodal.probeBitsFor(16, 7)) == 17L)
    assert(Multimodal.probesPerBand(32, Multimodal.probeBitsFor(32, 7)) == 5489L)
    // under uniform collision mass (coll ~ m*n^2/2^w) a tiny corpus picks
    // the cheap 8-bit bands, a big one pays probes for a bigger bucket space
    def uniform(n: Long): Map[Int, Long] =
      Multimodal.HammingWidths.map(w => w -> (64 / w) * (n * n >> w)).toMap
    assert(Multimodal.chooseHammingLayout(300, uniform(300), 7)._1 == 8)
    assert(Multimodal.chooseHammingLayout(50000, uniform(50000), 7)._1 == 16)
    // a huge well-spread corpus buys the 2^32 bucket space despite the
    // 5489-probe fan-out — candidates dominate the probe term
    assert(Multimodal.chooseHammingLayout(20000000, uniform(20000000), 7)._1 == 32)
    // a degenerate corpus (all hashes equal: coll = m*n^2 at EVERY width)
    // correctly refuses to pay probes — widening can't split the bucket
    val clone = Multimodal.HammingWidths.map(w => w -> (64 / w) * 4000000000L).toMap
    assert(Multimodal.chooseHammingLayout(63000, clone, 7)._1 == 8)
    // deterministic: same inputs, same layout
    assert(Multimodal.chooseHammingLayout(50000, uniform(50000), 7) ==
      Multimodal.chooseHammingLayout(50000, uniform(50000), 7))
  }

  test("pair query at tau=9 stays exactly the brute-force set (general probe masks)") {
    val pairs = Multimodal.phashPairsQuery(spark, sfDir, tau = 9)
      .select($"id_a".as[Long], $"id_b".as[Long], $"hamming".as[Long])
      .collect()
    val hs = Multimodal.phashQuery(spark, sfDir)
      .select($"doc_id".as[Long], $"phash_lo".as[Long], $"phash_hi".as[Long])
      .collect()
    val brute = (for {
      a <- hs; b <- hs if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 9
    } yield (a._1, b._1, d.toLong)).toSet
    assert(pairs.toSet == brute,
      s"tau=9 banding must be exactly the within-tau set: ${pairs.length} vs ${brute.size}")
  }

  test("hot-bucket salting engages on a concentrated corpus and changes nothing") {
    // 600 hashes sharing one 16-bit band value (band 0 = 0), tails spread:
    // bucket occupancy 600 >> hotCap=16, so the salted join splits it ~38
    // ways; the pair set must still be EXACTLY the brute-force within-tau
    // set (every pair matches once, at the home row's salt).
    val rng = new scala.util.Random(7)
    val tau = 7
    val noise = (0L until 600L).map { i =>
      // lo: low 16 bits zero (the hot band), upper 16 random-ish
      val lo = (rng.nextInt(1 << 16).toLong << 16)
      val hi = rng.nextLong() & 0xffffffffL
      (i, lo, hi)
    }
    // PLANTED within-tau pairs inside the hot bucket: with 48 random bits
    // outside the band, the noise rows' true pair set is almost surely
    // empty, and pairs==brute would then only prove the salted join adds
    // no FALSE POSITIVES. The salt-match argument's actual claim is that
    // salting never DROPS a real pair — so plant near-identical twins
    // (≤ tau differing bits, same hot band value) and demand they survive.
    val planted = (0 until 10).flatMap { j =>
      val lo = (rng.nextInt(1 << 16).toLong << 16)
      val hi = rng.nextLong() & 0xffffffffL
      val flips = 1 + (j % tau) // twin differs in 1..tau bits of hi
      val hiTwin = (0 until flips).foldLeft(hi)((h, b) => h ^ (1L << (3 * b)))
      Seq((1000L + 2 * j, lo, hi), (1001L + 2 * j, lo, hiTwin))
    }
    val hs = noise ++ planted
    val h = hs.toDF("doc_id", "phash_lo", "phash_hi")
    val (pairsDf, nHot) = Multimodal.hammingPairs(h, w = 16,
      p = Multimodal.probeBitsFor(16, tau), tau = tau, hotCap = 16L)
    assert(nHot >= 1L, "the crafted corpus must actually engage the salting")
    val pairs = pairsDf.select($"id_a".as[Long], $"id_b".as[Long], $"hamming".as[Long])
      .collect().toSet
    val brute = (for {
      a <- hs; b <- hs if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= tau
    } yield (a._1, b._1, d.toLong)).toSet
    assert(brute.size >= 10, s"planted pairs must make the true set nonempty: ${brute.size}")
    assert(planted.grouped(2).forall { case Seq(a, b) =>
      pairs.exists(p => p._1 == a._1 && p._2 == b._1) }, "every planted twin must survive salting")
    assert(pairs == brute,
      s"salted banding must be exactly the within-tau set: ${pairs.size} vs ${brute.size}")
    // and with salting OFF (cap above the corpus) the set is identical too
    val (plainDf, nHot0) = Multimodal.hammingPairs(h, 16,
      Multimodal.probeBitsFor(16, tau), tau, hotCap = 10000L)
    assert(nHot0 == 0L)
    assert(plainDf.select($"id_a".as[Long], $"id_b".as[Long], $"hamming".as[Long])
      .collect().toSet == brute)
  }

  test("salt map is driver-bounded: past-cap hot buckets stay unsalted, pair set unchanged") {
    // 5 hot buckets (40 rows each at cap 16) with a planted within-tau twin
    // pair per bucket; the salt cap admits only 2 — the census must still
    // report all 5, only 2 may be salted, and the pair set must be EXACTLY
    // the brute set either way (unsalted tail = task balance, not recall).
    val rng = new scala.util.Random(11)
    val tau = 7
    val hs = (0 until 5).flatMap { g =>
      val bucket = (0L until 40L).map { i =>
        (100L * g + i, (rng.nextInt(1 << 16).toLong << 16) | g.toLong,
          rng.nextLong() & 0xffffffffL)
      }
      val (_, lo, hi) = bucket.head
      bucket :+ ((100L * g + 99L, lo, hi ^ 0x15L)) // 3-bit twin of the head
    }
    val h = hs.toDF("doc_id", "phash_lo", "phash_hi")
    val brute = (for {
      a <- hs; b <- hs if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= tau
    } yield (a._1, b._1, d.toLong)).toSet
    assert(brute.size >= 5, "planted twins must make the true set nonempty")
    val p = Multimodal.probeBitsFor(16, tau)
    val (pairsDf, nHot, salted) =
      Multimodal.hammingPairsDetailed(h, 16, p, tau, hotCap = 16L, maxSalted = 2)
    assert(nHot == 5L, s"audit census must count ALL over-cap buckets, got $nHot")
    assert(salted == 2L, s"driver salt map must stop at the cap, got $salted")
    assert(pairsDf.select($"id_a".as[Long], $"id_b".as[Long], $"hamming".as[Long])
      .collect().toSet == brute, "truncated salting must not change the pair set")
    // cap above the census: everything salts, same set
    val (allDf, nHotAll, saltedAll) =
      Multimodal.hammingPairsDetailed(h, 16, p, tau, hotCap = 16L, maxSalted = 100)
    assert(nHotAll == 5L && saltedAll == 5L)
    assert(allDf.select($"id_a".as[Long], $"id_b".as[Long], $"hamming".as[Long])
      .collect().toSet == brute)
  }

  test("audit columns surface a lawful layout consistent with the measured stats") {
    val rows = Multimodal.phashPairsQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val w = rows.head.getAs[Long]("band_w")
    val m = rows.head.getAs[Long]("n_bands")
    val p = rows.head.getAs[Long]("probe_bits")
    val n = rows.head.getAs[Long]("n_hashes")
    assert(rows.forall(r => r.getAs[Long]("band_w") == w &&
      r.getAs[Long]("n_bands") == m && r.getAs[Long]("probe_bits") == p &&
      r.getAs[Long]("n_hashes") == n))
    assert(w * m == 64L && m * (p + 1) - 1 >= 7)
    // the surfaced n is the hash-frame count, and the surfaced layout IS
    // the measured-cost argmin for these hashes
    val h = Multimodal.phashQuery(spark, sfDir)
      .select($"doc_id", $"phash_lo", $"phash_hi")
    val (nM, coll) = Multimodal.hammingLayoutStats(h)
    assert(nM == n)
    assert(Multimodal.chooseHammingLayout(nM, coll, 7) == ((w.toInt, p.toInt)))
  }

  test("cross-modal join: flags recompute independently; variant self-pairs never flag") {
    val out = Multimodal.crossModalQuery(spark, sfDir)
      .select($"doc_id".as[Long], $"text_dup".as[Long], $"image_dup".as[Long],
        $"curation".as[String])
      .collect()
    // independent recompute of both flag sets from the two pair queries
    val tp = graft.operators.Dedup.minhashMd5Pairs(spark, sfDir)
      .select($"id_a".as[Long], $"id_b".as[Long]).collect()
    val textDocs = tp.flatMap(p => Seq(p._1, p._2)).toSet
    def doc(id: Long): Long =
      if (id >= Multimodal.VariantOffset) id - Multimodal.VariantOffset else id
    val ip = Multimodal.phashPairsQuery(spark, sfDir)
      .select($"id_a".as[Long], $"id_b".as[Long]).collect()
    val imageDocs = ip.flatMap { case (a, b) =>
      if (doc(a) != doc(b)) Seq(doc(a), doc(b)) else Nil
    }.toSet
    val expect = (textDocs ++ imageDocs).toSeq.sorted.map { d =>
      val (t, i) = (if (textDocs(d)) 1L else 0L, if (imageDocs(d)) 1L else 0L)
      (d, t, i, if (t == 1 && i == 1) "both" else if (t == 1) "text_only" else "image_only")
    }
    assert(out.toSeq == expect)
    // a variant pair against its own source exists in the hash pairs but
    // must not flag the doc on its own
    val selfPairDocs = ip.collect { case (a, b) if doc(a) == doc(b) => doc(a) }.toSet
    assert(selfPairDocs.nonEmpty)
    assert((selfPairDocs -- imageDocs).nonEmpty,
      "some doc with ONLY a self variant pair should stay unflagged")
    // the disagreement classes the query exists to surface are non-empty
    val classes = out.map(_._4).toSet
    assert(classes.contains("text_only") && classes.contains("image_only"), classes.toString)
  }

  test("named query: one hash per document plus variants, halves positive, n_ones consistent") {
    val out = Multimodal.phashQuery(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    val nVar = Tables.documents(spark, sfDir).filter($"doc_id" % 10 === 0).count()
    assert(out.length == nDocs + nVar)
    assert(out.forall(r => r.getLong(1) >= 0L && r.getLong(2) >= 0L))
    assert(out.forall(r => r.getLong(3) ==
      java.lang.Long.bitCount(r.getLong(1)) + java.lang.Long.bitCount(r.getLong(2))))
    // the engine-side expression must agree with the driver-side replay
    val path = Multimodal.graysPath(sfDir)
    val g0 = spark.read.parquet(s"$path/grays").filter($"doc_id" === 0L)
      .select($"grays").as[Seq[Int]].head().toArray
    def half(h: Int): Long = (0 until 32).map { i =>
      val bit = h * 32 + i
      val (y, x) = (bit / 8, bit % 8)
      if (g0(y * 9 + x) > g0(y * 9 + x + 1)) 1L << i else 0L
    }.sum
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == half(0) && r0.getLong(2) == half(1))
  }
}
