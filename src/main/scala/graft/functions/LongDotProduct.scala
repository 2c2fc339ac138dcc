package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

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

  override def checkInputDataTypes(): TypeCheckResult =
    (elementType(left), elementType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires arrays of an integral element type " +
          "(TINYINT/SMALLINT/INT/BIGINT); got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}. " +
          "Fractional embeddings must be explicitly quantized first — " +
          "implicit truncation toward zero is never applied.")
    }

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
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += leftGet(x, i) * rightGet(y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lt = left.dataType.asInstanceOf[ArrayType].elementType
      val rt = right.dataType.asInstanceOf[ArrayType].elementType
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |long $s = 0L;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
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
