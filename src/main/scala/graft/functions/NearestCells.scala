package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the `nprobe` nearest IVF centroid cells for
  * one quantized vector, as `array<bigint>` of cell ids in rank order
  * (rank rule: signed-cos² key DESC, cid ASC — identical to the DuckDB
  * oracle's `row_number() OVER (... ORDER BY key DESC, cid)`).
  *
  * The centroid table rides INSIDE the expression as plain driver-built
  * arrays (k ≈ sqrt(n) rows — the small side IVF exists to keep small) and
  * is referenced from generated code via `addReferenceObj`, so the whole
  * coarse assignment is one shuffle-free, whole-stage-codegen'd scan: a
  * tight k×dim multiply-add loop with an nprobe-sized insertion, nothing
  * wider than the input row. The first form of this scan — `transform`
  * over a centroid struct literal + `array_sort` with a lambda comparator
  * — had the right dataflow but ran INTERPRETED (higher-order functions
  * are not codegen'd) and cost more per row than the crossJoin+window it
  * replaced; this expression is that reduction compiled.
  *
  * Arithmetic contract: dot and norms are exact BIGINT sums over the
  * quantized lattice ([[VectorOps.quantize]]); the ranking key is
  * `sign(dot) * (dot*dot as double) / (nrm*cnrm as double)` — the same
  * one-double-division shape as [[VectorOps.cos2Key]], so ordering ties
  * out with the oracle bit-for-bit. Keys are never NaN: the fixture has
  * no zero vectors, and centroids keep nrm > 0 by construction (a
  * floor-mean of lattice vectors can only be all-zero if a whole cell is,
  * which the seed rule excludes).
  *
  * Failure contract (mirrors [[LongDotProduct]]): a vector whose
  * dimension differs from the centroid table's THROWS rather than
  * truncating, and a null element throws rather than reading as 0; a null
  * vector or norm returns NULL like every builtin.
  */
case class NearestCells(
    vec: Expression,
    nrm: Expression,
    cents: IndexedSeq[(Long, IndexedSeq[Long], Long)],
    nprobe: Int)
  extends BinaryExpression {

  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
  require(cents.nonEmpty, "centroid table must not be empty")
  require(cents.forall(_._2.length == cents.head._2.length),
    "centroid table has mixed dimensions")

  override def left: Expression = vec
  override def right: Expression = nrm

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, nrm.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint) — the quantized " +
        s"lattice vector and its exact squared norm; got " +
        s"${vec.dataType.catalogString} and ${nrm.dataType.catalogString}")
  }

  /** Centroid table flattened for the generated loop: ids, row-major
    * elements, squared norms. Built once per task via the lazy vals
    * (the case-class field keeps structural equality for Catalyst's
    * subexpression canonicalization).
    */
  @transient private lazy val dim: Int = cents.head._2.length
  @transient private lazy val cidArr: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val ceFlat: Array[Long] =
    cents.flatMap(_._2).toArray
  @transient private lazy val cnrmArr: Array[Long] = cents.map(_._3).toArray

  override def nullSafeEval(vecAny: Any, nrmAny: Any): Any = {
    val x = vecAny.asInstanceOf[ArrayData]
    val xn = nrmAny.asInstanceOf[Long]
    val n = x.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension $n != centroid dimension $dim")
    val k = cidArr.length
    val take = math.min(nprobe, k)
    val bk = new Array[Double](take)
    val bc = new Array[Long](take)
    var filled = 0
    var c = 0
    while (c < k) {
      var dot = 0L
      val base = c * dim
      var j = 0
      while (j < n) {
        if (x.isNullAt(j))
          throw new IllegalArgumentException(
            s"$prettyName: null element at index $j")
        dot += x.getLong(j) * ceFlat(base + j)
        j += 1
      }
      val akey = (dot * dot).toDouble / (xn * cnrmArr(c)).toDouble *
        (if (dot < 0) -1.0 else 1.0)
      val cid = cidArr(c)
      var pos = filled
      while (pos > 0 &&
          (bk(pos - 1) < akey || (bk(pos - 1) == akey && bc(pos - 1) > cid))) {
        pos -= 1
      }
      if (pos < take) {
        var m = math.min(filled, take - 1)
        while (m > pos) { bk(m) = bk(m - 1); bc(m) = bc(m - 1); m -= 1 }
        bk(pos) = akey
        bc(pos) = cid
        if (filled < take) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bc, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, xn) => {
      val cidsRef = ctx.addReferenceObj("nearestCellsCids", cidArr, "long[]")
      val ceRef = ctx.addReferenceObj("nearestCellsCe", ceFlat, "long[]")
      val cnrmRef = ctx.addReferenceObj("nearestCellsCnrm", cnrmArr, "long[]")
      val n = ctx.freshName("n")
      // top-nprobe scratch hoisted to instance state: `filled` restarts
      // at 0 each row, so no per-row allocation in the hot scan
      val takeN = math.min(nprobe, cidArr.length)
      val bk = ctx.addMutableState("double[]", "nearestCellsBk",
        v => s"$v = new double[$takeN];")
      val bc = ctx.addMutableState("long[]", "nearestCellsBc",
        v => s"$v = new long[$takeN];")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val j = ctx.freshName("j")
      val akey = ctx.freshName("akey")
      val cid = ctx.freshName("cid")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      val take = takeN.toString
      s"""
         |int $n = $x.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: vector dimension " + $n +
         |      " != centroid dimension $dim");
         |}
         |int $filled = 0;
         |for (int $c = 0; $c < ${cidArr.length}; $c++) {
         |  long $dot = 0L;
         |  int $base = $c * $dim;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($x.isNullAt($j)) {
         |      throw new IllegalArgumentException(
         |        "$prettyName: null element at index " + $j);
         |    }
         |    $dot += $x.getLong($j) * $ceRef[$base + $j];
         |  }
         |  double $akey = ((double)($dot * $dot)) /
         |    ((double)($xn * $cnrmRef[$c])) * ($dot < 0L ? -1.0 : 1.0);
         |  long $cid = $cidsRef[$c];
         |  int $pos = $filled;
         |  while ($pos > 0 && ($bk[$pos - 1] < $akey ||
         |      ($bk[$pos - 1] == $akey && $bc[$pos - 1] > $cid))) {
         |    $pos--;
         |  }
         |  if ($pos < $take) {
         |    for (int $m = java.lang.Math.min($filled, $take - 1); $m > $pos; $m--) {
         |      $bk[$m] = $bk[$m - 1];
         |      $bc[$m] = $bc[$m - 1];
         |    }
         |    $bk[$pos] = $akey;
         |    $bc[$pos] = $cid;
         |    if ($filled < $take) $filled++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bc, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(vec = newLeft, nrm = newRight)
}
