package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LineDedupSpec extends SparkSpec {

  test("lineDedup: first global occurrence survives, later copies drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one. shared line. tail a"),
      (2L, "shared line. beta two"), // "shared line" already seen in doc 1
      (3L, "gamma. gamma")           // in-doc repeat: second copy drops
    ).toDF("doc_id", "text")
    val got = LineDedup.lineDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 3L), (2L, 2L, 1L), (3L, 2L, 1L)))
  }

  test("boilerplateAudit: cross-source repeats don't count, within-source df>=3 does") {
    import spark.implicits._
    val docs = Seq(
      // "footer text" in 3 distinct docs of source A → boilerplate there
      (1L, "alpha body. footer text", "A"),
      (2L, "beta body. footer text", "A"),
      (3L, "gamma body. footer text", "A"),
      // same sentence in source B only once → NOT boilerplate in B
      (4L, "delta body. footer text", "B"),
      // in-doc repetition is occurrences, not distinct docs: df stays 1
      (5L, "echo same. echo same. echo same", "B")
    ).toDF("doc_id", "text", "source")
    val got = LineDedup.boilerplateAudit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L), (3L, 2L, 1L, 500000L),
      (4L, 2L, 0L, 0L), (5L, 3L, 0L, 0L)), got.mkString(", "))
  }

  test("bloomDecontaminate: zero false negatives vs exact semi-join, fp bounded") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val bloom = LineDedup.bloomDecontaminate(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // exact contamination (q55 semantics, same slice + n)
    val exact = CurationQueries.contamination(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom.keySet == exact.keySet) // same train docs, same shingle carriers
    // Bloom filters never miss a true member: every doc with exact overlap
    // must be flagged, and its hit count must cover the exact count.
    exact.foreach { case (id, nShared) =>
      if (nShared > 0) {
        assert(bloom(id)._2, s"doc $id contaminated but not flagged")
        assert(bloom(id)._1 >= nShared, s"doc $id bloom hits < exact overlap")
      }
    }
    // False positives only over-flag; at fpp=1% the clean-doc flag rate
    // stays small (generous 10% bound — each doc probes many shingles).
    val clean = exact.filter(_._2 == 0L).keySet
    if (clean.nonEmpty) {
      val falsePos = clean.count(id => bloom(id)._2)
      assert(falsePos.toDouble / clean.size < 0.10,
        s"$falsePos/${clean.size} clean docs false-flagged")
    }
    // deterministic rerun (bit-OR merge is order-independent)
    val again = LineDedup.bloomDecontaminate(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(again == bloom)
  }

  test("bloomDecontaminatePortable: zero false negatives vs exact, probe is bit-exact") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val bloom = LineDedup.bloomDecontaminatePortable(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val exact = CurationQueries.contamination(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bloom.keySet == exact.keySet)
    exact.foreach { case (id, nShared) =>
      if (nShared > 0) {
        assert(bloom(id)._2, s"doc $id contaminated but not flagged")
        assert(bloom(id)._1 >= nShared, s"doc $id bloom hits < exact overlap")
      }
    }
    // m=2^17 bits, k=4: fp per probe ≈ (set_bits/m)^4 — tiny here; the
    // whole-doc false-flag rate must stay well under 10%
    val clean = exact.filter(_._2 == 0L).keySet
    if (clean.nonEmpty) {
      val falsePos = clean.count(id => bloom(id)._2)
      assert(falsePos.toDouble / clean.size < 0.10,
        s"$falsePos/${clean.size} clean docs false-flagged")
    }
    // rerun identical: the bitset is a pure function of the bench slice
    val again = LineDedup.bloomDecontaminatePortable(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(again == bloom)
  }

  test("BitsetContains: bit probe matches a reference BitSet, bounds safe") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val m = 1 << 10
    val ref = new java.util.BitSet(m)
    (0 until 100).foreach(_ => ref.set(rnd.nextInt(m)))
    val bytes = new Array[Byte](m / 8)
    var b = ref.nextSetBit(0)
    while (b >= 0) {
      bytes(b >> 3) = (bytes(b >> 3) | (1 << (b & 7))).toByte
      b = ref.nextSetBit(b + 1)
    }
    val probes = ((0 until m).map(_.toLong) ++ Seq(-1L, m.toLong, m * 8L)).toDF("p")
    val got = probes.select(col("p"),
        org.apache.spark.sql.graft.SketchExpressions
          .bitsetContains(bytes, col("p")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0 until m).foreach { i =>
      assert(got(i.toLong) == ref.get(i), s"bit $i")
    }
    // valid positions are [0, m): -1, m, and m*8 all probe to false
    assert(!got(-1L) && !got(m.toLong) && !got(m.toLong * 8),
      "out-of-range probes must be false")
  }

  test("lengthHistogram: buckets partition the corpus, cum_share ends at 1") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val got = CorpusStats.lengthHistogram(docs).collect()
    assert(got.map(_.getLong(1)).sum == docs.count())
    assert(math.abs(got.last.getDouble(4) - 1.0) < 1e-9)
    // buckets are disjoint 200-char ranges: min/max stay inside
    got.foreach { r =>
      val lo = r.getLong(0)
      assert(r.getLong(2) >= lo && r.getLong(3) < lo + 200)
    }
  }

  test("sourceKlDrift: identical distributions give 0, skewed ones > 0") {
    import spark.implicits._
    // sources A and B have the SAME word distribution → corpus equals
    // both → KL = 0; source C is disjoint vocabulary → KL > 0
    val docs = Seq(
      (1L, "x y x y", "A"), (2L, "x y x y", "B"),
      (3L, "z z z z", "C")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceKlDrift(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // A,B: p_s(x)=p_s(y)=.5 vs corpus p(x)=p(y)=1/3 → KL = ln(3/2) > 0
    assert(math.abs(got("A") - got("B")) < 1e-9)
    assert(got("A") > 0.4 && got("A") < 0.41) // ln(1.5) ≈ 0.4055
    // C: p(z|C)=1 vs corpus p(z)=1/3 → KL = ln 3 ≈ 1.0986
    assert(got("C") > 1.09 && got("C") < 1.10)
  }

  test("cmsStopwordCounts: overestimate law vs exact counts, seeded rerun identical") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val est = CorpusStats.cmsStopwordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(explode(split(lower(col("text")), " ")).as("w"))
    val nTotal = toks.count()
    val exact = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (w, e) =>
      val truth = exact.getOrElse(w, 0L)
      assert(e >= truth, s"CMS undercounted '$w': $e < $truth")
      assert(e <= truth + (0.001 * nTotal).toLong + 1,
        s"CMS estimate for '$w' exceeds the eps*N bound")
    }
    val again = CorpusStats.cmsStopwordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est, "seeded sketch rerun must be bit-identical")
  }

  test("cmsPortable: overestimate law vs exact, exact when the sketch is wide enough") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val est = CorpusStats.cmsPortable(docs, TextQueries.Stopwords).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (w, e) =>
      assert(e >= exact.getOrElse(w, 0L), s"CMS undercounted '$w'")
    }
    // a width far above the corpus vocabulary makes every probe
    // collision-free in at least one row ⇒ estimates collapse to exact
    val wide = CorpusStats.cmsPortable(docs, TextQueries.Stopwords,
      depth = 4, width = 1 << 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    wide.foreach { case (w, e) =>
      assert(e == exact.getOrElse(w, 0L), s"wide CMS off for '$w'")
    }
  }

  test("labelCentroids: hand centroid of two vectors per label") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 6.0f), 0),
      (3L, Array(5.0f, 5.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.similarity.EmbeddingStats.labelCentroids(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((0, 0, 2L, 2.0), (0, 1, 2L, 4.0), (1, 0, 1L, 5.0), (1, 1, 1L, 5.0)))
  }
}
