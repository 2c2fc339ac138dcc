package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, NullType, ShortType}

/** Native Catalyst expression: exact BIGINT dot product of two
  * integral-array columns, with whole-stage codegen (SURVEY.md §7.4 —
  * "cosine-distance Expression with codegen if UDF overhead shows up in
  * bench"; it did: the interpreted `zip_with`+`aggregate` higher-order
  * pipeline dominated the ε-join at 2M pairs, since HOFs are not
  * codegen'd).
  *
  * Type contract: accepts `array<tinyint|smallint|int|bigint>` on either
  * side NATIVELY (no cast inserted — the generated accessor matches the
  * element width), and REJECTS fractional-element arrays at analysis
  * time. The previous `ImplicitCastInputTypes` form let Spark's numeric
  * coercion silently truncate `array<double>` toward zero under default
  * non-ANSI casts — exactly the plausible-but-wrong result this
  * expression exists to avoid. Fractional embeddings must go through an
  * explicit quantizer ([[VectorOps]]'s 1e-4 lattice) so the rounding rule
  * is visible in the plan.
  *
  * Failure contract (mirrors [[Int8Ops.Int8DotProduct]] /
  * [[Int8Ops.PackInt8]]): mismatched dimensions THROW rather than
  * truncating to the shorter prefix — a partial dot over mixed-model
  * embeddings is plausible-but-wrong similarity — and a null ELEMENT
  * throws rather than silently scoring the component as 0 (the unsafe
  * accessors read a null slot as 0). A null ARGUMENT (either whole array
  * NULL, including a typed `NULL` / NullType literal) returns NULL, like
  * every builtin. All gated fixtures use uniform dims, so the DuckDB
  * oracle mirror never exercises the throw paths; they are spec-pinned
  * instead ([[Int8OpsSpec]]).
  *
  * The generated code is a tight primitive loop over the element
  * accessors — no boxing, no lambda dispatch, stays inside the
  * WholeStageCodegen span of the join it feeds.
  */
case class LongDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "long_dot_product"

  // IntegralType itself is private[sql]; enumerate the four widths
  private def elementType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et @ (LongType | IntegerType | ShortType | ByteType), _) =>
      Some(et)
    case _ => None
  }

  // A bare `NULL` argument types as NullType; the expression is then
  // statically NULL (builtin behavior) — it must not fail analysis with
  // the misleading "requires integral" error.
  private def acceptable(e: Expression): Boolean =
    e.dataType == NullType || elementType(e).isDefined

  override def checkInputDataTypes(): TypeCheckResult =
    if (acceptable(left) && acceptable(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires arrays of an integral element type " +
        "(TINYINT/SMALLINT/INT/BIGINT); got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}. " +
        "Fractional embeddings must be explicitly quantized first — " +
        "implicit truncation toward zero is never applied.")

  private def getter(et: DataType): (ArrayData, Int) => Long = et match {
    case LongType    => (a, i) => a.getLong(i)
    case IntegerType => (a, i) => a.getInt(i).toLong
    case ShortType   => (a, i) => a.getShort(i).toLong
    case ByteType    => (a, i) => a.getByte(i).toLong
    case other => throw new IllegalStateException(
      s"$prettyName: unexpected element type $other after type check")
  }

  @transient private lazy val leftGet =
    getter(left.dataType.asInstanceOf[ArrayType].elementType)
  @transient private lazy val rightGet =
    getter(right.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"$prettyName: dimension mismatch $n vs ${y.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null element at index $i")
      s += leftGet(x, i) * rightGet(y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (left.dataType == NullType || right.dataType == NullType) {
      // statically NULL — never touch the (absent) array element types
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = -1L;""".stripMargin)
    } else nullSafeCodeGen(ctx, ev, (x, y) => {
      val lt = left.dataType.asInstanceOf[ArrayType].elementType
      val rt = right.dataType.asInstanceOf[ArrayType].elementType
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch " + $n + " vs " +
         |      $y.numElements());
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: null element at index " + $i);
         |  }
         |  $s += (long)(${CodeGenerator.getValue(x, lt, i)})
         |      * (long)(${CodeGenerator.getValue(y, rt, i)});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}
