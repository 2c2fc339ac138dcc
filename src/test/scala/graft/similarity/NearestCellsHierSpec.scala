package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{NearestCells, NearestCellsHier}

/** The two-level coarse quantizer: level-1/level-2 semantics vs an
  * independent oracle, exact agreement with the flat expression when the
  * hierarchy is trivial, codegen/interpreted agreement, the loud
  * contracts, and the Voronoi partition property of
  * [[Similarity.hierGroups]]. Also pins the sizing knob: unset keeps the
  * oracle-gated sqrt rule, set pins the spacing (bench-only).
  */
class NearestCellsHierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def cent(cid: Long, ce: Long*): (Long, IndexedSeq[Long], Long) =
    (cid, ce.toIndexedSeq, ce.iterator.map(v => v * v).sum)

  private type Cent = (Long, IndexedSeq[Long], Long)
  private type Group = (IndexedSeq[Long], Long, IndexedSeq[Cent])

  private def key(v: Seq[Long], vn: Long, ce: Seq[Long], cn: Long): Double = {
    val dot = v.iterator.zip(ce.iterator).map { case (a, b) => a * b }.sum
    (dot * dot).toDouble / (vn * cn).toDouble * (if (dot < 0) -1.0 else 1.0)
  }

  /** Independent oracle: best super-centroid (key DESC, index ASC), then
    * that group's members sorted (key DESC, cid ASC), take nprobe.
    */
  private def oracle(groups: IndexedSeq[Group], v: Seq[Long],
      nprobe: Int): Seq[Long] = {
    val vn = v.iterator.map(x => x * x).sum
    val best = groups.zipWithIndex.maxBy { case ((sce, snrm, _), i) =>
      (key(v, vn, sce, snrm), -i)
    }._2
    groups(best)._3
      .map { case (cid, ce, cn) => (key(v, vn, ce, cn), cid) }
      .sortBy { case (k, cid) => (-k, cid) }
      .take(nprobe).map(_._2)
  }

  private def evalHier(groups: IndexedSeq[Group], v: Seq[Long],
      nprobe: Int): Seq[Long] = {
    val ne = NearestCellsHier(
      ColumnBridge.expression(col("e")), ColumnBridge.expression(col("nrm")),
      groups, nprobe)
    ne.nullSafeEval(new GenericArrayData(v.toArray),
        v.iterator.map(x => x * x).sum: java.lang.Long)
      .asInstanceOf[ArrayData].toLongArray().toSeq
  }

  test("level-1 picks the best super-cell, level-2 ranks its members") {
    // super A along +x, super B along +y; each group holds one near and
    // one far member. A +x-ish query must search ONLY group A.
    val groups: IndexedSeq[Group] = IndexedSeq(
      (IndexedSeq(1L, 0L), 1L, IndexedSeq(cent(10L, 5L, 1L), cent(11L, 1L, 0L))),
      (IndexedSeq(0L, 1L), 1L, IndexedSeq(cent(20L, 0L, 7L), cent(21L, 1L, 9L))))
    assert(evalHier(groups, Seq(4L, 0L), 2) === Seq(11L, 10L))
    // +y query: only group B's members, even though cid 10 exists
    assert(evalHier(groups, Seq(0L, 3L), 2) === Seq(20L, 21L))
    // nprobe truncates within the chosen group
    assert(evalHier(groups, Seq(4L, 0L), 1) === Seq(11L))
  }

  test("a single all-members group degenerates to the flat expression") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val dim = 3
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-500L, 500L))
      .suchThat(_.exists(_ != 0L))
    val caseGen = for {
      k <- Gen.chooseNum(1, 10)
      cents <- Gen.listOfN(k, vecGen)
      v <- vecGen
      nprobe <- Gen.chooseNum(1, 3)
    } yield (cents, v, nprobe)
    val cases = (0 until 120).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 90)
    cases.foreach { case (centVecs, v, nprobe) =>
      val cents = centVecs.zipWithIndex.map { case (ce, i) =>
        cent((i + 1).toLong * 3, ce: _*)
      }.toIndexedSeq
      val groups: IndexedSeq[Group] =
        IndexedSeq((cents.head._2, cents.head._3, cents))
      val flat = NearestCells(
        ColumnBridge.expression(col("e")), ColumnBridge.expression(col("nrm")),
        cents, nprobe)
      val vn = v.iterator.map(x => x * x).sum
      val expected = flat.nullSafeEval(
          new GenericArrayData(v.toArray), vn: java.lang.Long)
        .asInstanceOf[ArrayData].toLongArray().toSeq
      assert(evalHier(groups, v, nprobe) === expected,
        s"cents=$cents v=$v nprobe=$nprobe")
    }
  }

  test("property: matches the two-level oracle on random groupings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val dim = 4
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1000L, 1000L))
      .suchThat(_.exists(_ != 0L))
    val caseGen = for {
      ng <- Gen.chooseNum(1, 5)
      groups <- Gen.listOfN(ng, for {
        sup <- vecGen
        nm <- Gen.chooseNum(1, 6)
        members <- Gen.listOfN(nm, vecGen)
      } yield (sup, members))
      v <- vecGen
      nprobe <- Gen.chooseNum(1, 4)
    } yield (groups, v, nprobe)
    val cases = (0 until 150).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 100)
    var nextCid = 0L
    cases.foreach { case (rawGroups, v, nprobe) =>
      val groups: IndexedSeq[Group] = rawGroups.map { case (sup, members) =>
        (sup.toIndexedSeq, sup.iterator.map(x => x * x).sum,
          members.map { ce =>
            nextCid += 13
            cent(nextCid, ce: _*)
          }.toIndexedSeq)
      }.toIndexedSeq
      assert(evalHier(groups, v, nprobe) === oracle(groups, v, nprobe),
        s"groups=$groups v=$v nprobe=$nprobe")
    }
  }

  test("codegen and interpreted paths agree; null vector yields NULL") {
    import spark.implicits._
    val groups: IndexedSeq[Group] = IndexedSeq(
      (IndexedSeq(3L, 4L, 0L), 25L,
        IndexedSeq(cent(10L, 3L, 4L, 0L), cent(11L, 6L, 7L, 1L))),
      (IndexedSeq(0L, 0L, 9L), 81L,
        IndexedSeq(cent(20L, 0L, 0L, 9L), cent(21L, 1L, -1L, 8L))))
    val rows = Seq(
      (1L, Some(Seq(6L, 8L, 0L))), (2L, Some(Seq(0L, 1L, 50L))),
      (3L, Some(Seq(-9L, 12L, 3L))), (4L, None))
    val df = rows.toDF("id", "e")
      .withColumn("nrm", graft.functions.VectorOps.norm2($"e"))
    val expr: Column = ColumnBridge.column(NearestCellsHier(
      ColumnBridge.expression($"e"), ColumnBridge.expression($"nrm"),
      groups, 2))
    val compiled = df.select($"id", expr.as("cids"))
      .as[(Long, Option[Seq[Long]])].collect().toMap
    assert(compiled(4L).isEmpty) // null in, NULL out
    rows.collect { case (id, Some(e)) =>
      assert(compiled(id) === Some(evalHier(groups, e, 2)), s"id=$id")
    }
  }

  test("dimension mismatch and null elements throw loudly") {
    import spark.implicits._
    val groups: IndexedSeq[Group] = IndexedSeq(
      (IndexedSeq(1L, 0L), 1L, IndexedSeq(cent(1L, 1L, 0L))))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val expr: Column = ColumnBridge.column(NearestCellsHier(
      ColumnBridge.expression($"e"), ColumnBridge.expression($"nrm"),
      groups, 1))
    val badDim = Seq((Seq(1L, 2L, 3L), 14L)).toDF("e", "nrm")
    val e1 = intercept[Exception] { badDim.select(expr).collect() }
    assert(msgs(e1).exists(_.contains("centroid dimension")))
    val badNull = Seq((Seq(Some(1L), None), 1L)).toDF("e", "nrm")
    val e2 = intercept[Exception] { badNull.select(expr).collect() }
    assert(msgs(e2).exists(_.contains("null element")))
  }

  test("hierGroups is a Voronoi partition of the centroid table") {
    // deterministic pseudo-random lattice, no RNG
    val cents = (0 until 61).map { i =>
      cent(i.toLong * 5 + 1,
        (i * 37 % 19 - 9).toLong, (i * 53 % 17 - 8).toLong,
        (i * 71 % 23 - 11).toLong)
    }.filter(_._3 > 0) // contract: no zero centroids
    val groups = Similarity.hierGroups(cents)
    // partition: every centroid appears in exactly one group
    val flat = groups.flatMap(_._3)
    assert(flat.map(_._1).sorted === cents.map(_._1).sorted)
    assert(groups.forall(_._3.nonEmpty))
    // Voronoi: each member's OWN super-centroid scores >= any other
    // super (with the index tiebreak this is exactly nearest-super)
    val supers = groups.map(g => (g._1, g._2))
    groups.zipWithIndex.foreach { case ((_, _, members), gi) =>
      members.foreach { case (cid, ce, cn) =>
        val own = key(ce, cn, supers(gi)._1, supers(gi)._2)
        supers.zipWithIndex.foreach { case ((sce, snrm), si) =>
          val other = key(ce, cn, sce, snrm)
          assert(own > other || (own == other && gi <= si),
            s"cid=$cid in group $gi but super $si scores $other > $own")
        }
      }
    }
  }

  test("hierGroups is independent of input order (collect() partition " +
      "order must not pick the super-centroids)") {
    val cents = (0 until 61).map { i =>
      cent(i.toLong * 5 + 1,
        (i * 37 % 19 - 9).toLong, (i * 53 % 17 - 8).toLong,
        (i * 71 % 23 - 11).toLong)
    }.filter(_._3 > 0)
    val sorted = Similarity.hierGroups(cents)
    // deterministic shuffle: reverse + interleave halves
    val (a, b) = cents.splitAt(cents.length / 2)
    val shuffled = a.reverse.zipAll(b, null, null)
      .flatMap { case (x, y) => Seq(x, y).filter(_ != null) }
    assert(Similarity.hierGroups(shuffled) === sorted)
  }

  test("spacing knob: unset keeps the sqrt rule, set pins it (floor 50)") {
    assert(Similarity.centroidModulus(spark, 2500L) === 50L)
    assert(Similarity.centroidModulus(spark, 1000000L) === 1000L)
    spark.conf.set(Similarity.SpacingConf, "75")
    try {
      assert(Similarity.centroidModulus(spark, 1000000L) === 75L)
      assert(Similarity.centroidModulus(spark, 2500L) === 75L)
      spark.conf.set(Similarity.SpacingConf, "10") // floor still applies
      assert(Similarity.centroidModulus(spark, 1000000L) === 50L)
    } finally spark.conf.unset(Similarity.SpacingConf)
  }

  test("spacing knob switches to the hash-based centroid sample and " +
      "still indexes every vector") {
    import spark.implicits._
    spark.conf.set(Similarity.SpacingConf, "50")
    try {
      val n = graft.Tables.embeddings(spark, TestSpark.TinySf).count()
      val m = Similarity.centroidModulus(spark, n)
      val assigned = Similarity.ivfAssigned(spark, TestSpark.TinySf)
        .select($"vec_id", $"cid").as[(Long, Long)].collect()
      assert(assigned.length.toLong === n)
      // the knob's sample rule is murmur3(vec_id) % m == 0 — verify the
      // emitted cells are exactly a subset of that sample
      val sampled = graft.Tables.embeddings(spark, TestSpark.TinySf)
        .filter(pmod(hash($"vec_id"), lit(m)) === 0)
        .select($"vec_id").as[Long].collect().toSet
      assert(sampled.nonEmpty)
      assert(assigned.map(_._2).toSet.subsetOf(sampled))
    } finally spark.conf.unset(Similarity.SpacingConf)
  }

  test("ivfAssignedN under a forced hier threshold still assigns every " +
      "vector to a real centroid cell") {
    import spark.implicits._
    // threshold 1 forces the two-level path at the tiny fixture's k
    spark.conf.set(Similarity.HierThresholdConf, "1")
    try {
      val assigned = Similarity.ivfAssigned(spark, TestSpark.TinySf)
        .select($"vec_id", $"cid").as[(Long, Long)].collect()
      val n = graft.Tables.embeddings(spark, TestSpark.TinySf).count()
      assert(assigned.length.toLong === n) // every non-null vector indexed
      assert(assigned.map(_._1).distinct.length === assigned.length)
      val m = Similarity.centroidModulus(spark, n)
      val validCids = graft.Tables.embeddings(spark, TestSpark.TinySf)
        .filter($"vec_id" % m === 0).select($"vec_id")
        .as[Long].collect().toSet
      assert(assigned.map(_._2).toSet.subsetOf(validCids))
    } finally spark.conf.unset(Similarity.HierThresholdConf)
  }
}
