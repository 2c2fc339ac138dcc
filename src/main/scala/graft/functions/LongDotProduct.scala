package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact BIGINT dot product of two
  * `array<bigint>` columns, with whole-stage codegen (SURVEY.md §7.4 —
  * "cosine-distance Expression with codegen if UDF overhead shows up in
  * bench"; it did: the interpreted `zip_with`+`aggregate` higher-order
  * pipeline dominated the ε-join at 2M pairs, since HOFs are not
  * codegen'd).
  *
  * The generated code is a tight primitive loop over `ArrayData.getLong`
  * — no boxing, no lambda dispatch, stays inside the WholeStageCodegen
  * span of the join it feeds.
  */
case class LongDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes (not a bare type check) so the SQL surface
  // behaves like builtin arithmetic: array<int> literals coerce to
  // array<bigint> instead of failing analysis. ExpectsInputTypes derives
  // the type check from this. (Return type inferred: `AbstractDataType`
  // is private[sql], but Seq[ArrayType] conforms.)
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "long_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |long $s = 0L;
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}
