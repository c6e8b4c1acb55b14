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
