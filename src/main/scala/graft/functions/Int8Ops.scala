package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, LongType, NullType, ShortType}

/** Compressed-domain vector ops for SQ8 (int8 scalar quantization) ANN —
  * the standard 4× memory cut for embedding search at scale: a 64-dim
  * float32 embedding is 256+ bytes as `array<float>`, 64 bytes as a
  * packed `binary` of signed int8s. Scoring then runs DIRECTLY on the
  * compressed bytes (no decompression column), so the hot join moves 4×
  * less data through the shuffle and the page cache.
  *
  * Exactness contract: quantized components are integers in [-127, 127],
  * so an int8 dot product is an exact BIGINT sum (64 · 127² ≪ 2⁶³) that
  * matches a DuckDB mirror of the same quantization bit-for-bit — same
  * determinism story as [[VectorOps]]'s 1e-4 lattice.
  */
object Int8Ops {

  /** Integral array (each element in [-127, 127]) → packed `binary`, one
    * signed byte per element. Out-of-range and null elements throw rather
    * than silently truncating / zero-filling — the quantizer upstream owns
    * the clamp. Fractional-element arrays are REJECTED at analysis time
    * (no implicit numeric coercion): a silent double→bigint truncation
    * would contradict the throw-don't-truncate contract above.
    * CodegenFallback: cost is inside eval (one O(dim) pass per row), the
    * same justification as `MinHashSignature`.
    */
  case class PackInt8(child: Expression)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = BinaryType
    override def prettyName: String = "pack_int8"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      // IntegralType itself is private[sql]; enumerate the four widths
      case ArrayType(LongType | IntegerType | ShortType | ByteType, _) =>
        TypeCheckResult.TypeCheckSuccess
      // a bare NULL argument (NullType) is statically NULL, like builtins
      // — it must not trip the misleading "requires integral" error
      case NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array of an integral element type " +
          s"(TINYINT/SMALLINT/INT/BIGINT); got ${other.catalogString}. " +
          "Fractional values must be explicitly quantized first — " +
          "implicit truncation toward zero is never applied.")
    }

    @transient private lazy val getElem: (ArrayData, Int) => Long =
      child.dataType.asInstanceOf[ArrayType].elementType match {
        case LongType    => (a, i) => a.getLong(i)
        case IntegerType => (a, i) => a.getInt(i).toLong
        case ShortType   => (a, i) => a.getShort(i).toLong
        case ByteType    => (a, i) => a.getByte(i).toLong
        case other => throw new IllegalStateException(
          s"pack_int8: unexpected element type $other after type check")
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        // element accessors on a null slot yield 0 — reject explicitly,
        // a missing component must not silently score as 0
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"pack_int8: null element at index $i")
        val v = getElem(arr, i)
        // symmetric clamp range: ±127 (NOT -128), matching the quantizer
        // and the DuckDB mirror on both ends
        if (v < -127L || v > 127L)
          throw new IllegalArgumentException(
            s"pack_int8: element $v at index $i outside int8 range")
        out(i) = v.toByte
        i += 1
      }
      out
    }

    override protected def withNewChildInternal(c: Expression): PackInt8 =
      copy(child = c)
  }

  /** Exact BIGINT dot product of two packed-int8 `binary` columns, with
    * whole-stage codegen — the compressed-domain analog of
    * [[LongDotProduct]]: a tight primitive loop over the byte arrays
    * (JVM sign-extends `byte` to `int` for free), no boxing, no array
    * headers, inside the WholeStageCodegen span of the join it feeds.
    */
  case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

    override def inputTypes = Seq(BinaryType, BinaryType)
    override def dataType: DataType = LongType
    override def prettyName: String = "int8_dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[Array[Byte]]
      val y = b.asInstanceOf[Array[Byte]]
      // mismatched dims (e.g. vectors packed under different models) must
      // fail loudly — a truncated partial dot is plausible-but-wrong
      if (x.length != y.length)
        throw new IllegalArgumentException(
          s"int8_dot_product: dimension mismatch ${x.length} vs ${y.length}")
      var s = 0L
      var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val s = ctx.freshName("sum")
        s"""
           |if ($x.length != $y.length) {
           |  throw new IllegalArgumentException(
           |    "int8_dot_product: dimension mismatch " + $x.length +
           |      " vs " + $y.length);
           |}
           |long $s = 0L;
           |for (int $i = 0; $i < $x.length; $i++) {
           |  $s += $x[$i] * $y[$i];
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Int8DotProduct = copy(left = l, right = r)
  }

  def packInt8(c: Column): Column =
    ColumnBridge.column(PackInt8(ColumnBridge.expression(c)))

  def int8Dot(a: Column, b: Column): Column =
    ColumnBridge.column(Int8DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
