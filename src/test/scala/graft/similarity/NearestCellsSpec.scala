package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.NearestCells

/** The native IVF coarse-assignment reduction: rank rule (signed-cos²
  * DESC, cid ASC), nprobe slicing, agreement between the codegen and
  * interpreted paths, and the loud dimension contract.
  */
class NearestCellsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // (cid, ce, cnrm) rows; norms must be the exact squared norms
  private def cent(cid: Long, ce: Long*): (Long, IndexedSeq[Long], Long) =
    (cid, ce.toIndexedSeq, ce.iterator.map(v => v * v).sum)

  private def nearest(cents: IndexedSeq[(Long, IndexedSeq[Long], Long)],
      nprobe: Int)(e: Column, nrm: Column): Column =
    ColumnBridge.column(NearestCells(
      ColumnBridge.expression(e), ColumnBridge.expression(nrm), cents, nprobe))

  test("ranks cells by signed-cos2 desc with cid as the tiebreak") {
    import spark.implicits._
    // axis-aligned centroids; query along +x: cell 1 is exact (key 1.0),
    // cell 3 is the same direction scaled (also key 1.0 — cid breaks the
    // tie), cell 2 orthogonal (key 0), cell 4 anti-parallel (key -1).
    val cents = IndexedSeq(
      cent(4L, -1L, 0L), cent(2L, 0L, 5L), cent(3L, 7L, 0L), cent(1L, 2L, 0L))
    val df = Seq((Seq(3L, 0L), 9L)).toDF("e", "nrm")
    val all = df.select(nearest(cents, 4)($"e", $"nrm").as("cids"))
      .as[Seq[Long]].head()
    assert(all === Seq(1L, 3L, 2L, 4L))
    val top2 = df.select(nearest(cents, 2)($"e", $"nrm").as("cids"))
      .as[Seq[Long]].head()
    assert(top2 === Seq(1L, 3L))
  }

  test("codegen and interpreted paths agree on the fixture assignment") {
    import spark.implicits._
    val cents = IndexedSeq(
      cent(10L, 3L, 4L, 0L), cent(20L, -3L, 4L, 1L), cent(30L, 0L, 0L, 9L))
    val rows = Seq(
      (1L, Seq(6L, 8L, 0L)), (2L, Seq(0L, 1L, 50L)), (3L, Seq(-9L, 12L, 3L)),
      (4L, Seq(5L, -2L, 7L)), (5L, Seq(-1L, -1L, -1L)))
    val df = rows.toDF("id", "e")
      .withColumn("nrm", graft.functions.VectorOps.norm2($"e"))
    val expr = nearest(cents, 2)($"e", $"nrm")
    val compiled = df.select($"id", expr.as("cids"))
      .as[(Long, Seq[Long])].collect().toSeq
    // the interpreted path, row-by-row through nullSafeEval
    val ne = NearestCells(
      ColumnBridge.expression($"e"), ColumnBridge.expression($"nrm"),
      cents, 2)
    val fromEval = rows.map { case (id, e) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        e.toArray)
      val nrm = e.iterator.map(v => v * v).sum
      (id, ne.nullSafeEval(arr, nrm)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq)
    }
    assert(compiled.sortBy(_._1) === fromEval.sortBy(_._1))
  }

  test("property: matches the sort-everything oracle on random lattices") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val dim = 4
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-1000L, 1000L))
      .suchThat(_.exists(_ != 0L)) // no zero vectors, per the contract
    val caseGen = for {
      k <- Gen.chooseNum(1, 12)
      cents <- Gen.listOfN(k, vecGen)
      v <- vecGen
      nprobe <- Gen.chooseNum(1, 4)
    } yield (cents, v, nprobe)
    val cases = (0 until 200).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.size >= 150) // suchThat retries may drop a few seeds
    cases.foreach { case (centVecs, v, nprobe) =>
      val cents = centVecs.zipWithIndex.map { case (ce, i) =>
        cent((i + 1).toLong * 7, ce: _*)
      }.toIndexedSeq
      // oracle: score ALL cells with the exact cos2Key arithmetic, full
      // sort by (key desc, cid asc), take nprobe
      val nrm = v.iterator.map(x => x * x).sum
      val expected = cents.map { case (cid, ce, cnrm) =>
        val dot = v.iterator.zip(ce.iterator).map { case (a, b) => a * b }.sum
        val key = (dot * dot).toDouble / (nrm * cnrm).toDouble *
          (if (dot < 0) -1.0 else 1.0)
        (key, cid)
      }.sortBy { case (key, cid) => (-key, cid) }
        .take(nprobe).map(_._2)
      val ne = NearestCells(
        ColumnBridge.expression(org.apache.spark.sql.functions.col("e")),
        ColumnBridge.expression(org.apache.spark.sql.functions.col("nrm")),
        cents, nprobe)
      val got = ne.nullSafeEval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
        nrm)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(got === expected, s"cents=$cents v=$v nprobe=$nprobe")
    }
  }

  test("nprobe beyond k returns all cells; dimension mismatch throws") {
    import spark.implicits._
    val cents = IndexedSeq(cent(1L, 1L, 0L), cent(2L, 0L, 1L))
    val df = Seq((Seq(2L, 1L), 5L)).toDF("e", "nrm")
    val all = df.select(nearest(cents, 99)($"e", $"nrm").as("cids"))
      .as[Seq[Long]].head()
    assert(all === Seq(1L, 2L))
    val bad = Seq((Seq(1L, 2L, 3L), 14L)).toDF("e", "nrm")
    val e = intercept[Exception] {
      bad.select(nearest(cents, 1)($"e", $"nrm")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("centroid dimension")))
  }
}
