package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-hash expressions for the dedup suite. The declarative
  * forms (`transform`+`array_min`+`aggregate` over md5 strings) are
  * semantically identical but run in Catalyst's interpreted higher-order
  * path — one expression-tree walk per array element per seed. These
  * compute the whole signature in one typed pass (`CodegenFallback` is
  * fine: the cost is inside eval, not in the surrounding plan).
  *
  * Hash contract (matches the DuckDB oracles exactly): md5 lowercase hex;
  * minhash_i = lexicographic MIN over 3-token shingles of
  * md5(i || '|' || shingle); byte-wise unsigned comparison of digests ==
  * lexicographic comparison of their hex strings.
  */
object TextHashes {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private[functions] def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** MinHash signature over 3-token shingles, all seeds in one pass.
    * Docs with fewer than 3 tokens yield an all-null signature (parity
    * with `array_min` over an empty shingle array).
    */
  case class MinHashSignature(child: Expression, numSeeds: Int)
    extends UnaryExpression with CodegenFallback {

    // the seed prefix is a single ASCII digit — the md5(i || '|' || x)
    // contract only holds for i in 0..9
    require(numSeeds >= 1 && numSeeds <= 10,
      s"numSeeds must be in [1, 10], got $numSeeds")

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def prettyName: String = "minhash_signature"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.sql}")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      if (n < 3) return new GenericArrayData(new Array[Any](numSeeds))
      val md = md5Local.get()
      val sep = ' '.toByte
      val bar = '|'.toByte
      val mins = new Array[Array[Byte]](numSeeds)
      // materialize token bytes once
      val tb = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        tb(i) = if (t == null) Array.emptyByteArray else t.getBytes
        i += 1
      }
      var j = 0
      while (j <= n - 3) {
        var seed = 0
        while (seed < numSeeds) {
          md.reset()
          md.update(('0' + seed).toByte)
          md.update(bar)
          md.update(tb(j)); md.update(sep)
          md.update(tb(j + 1)); md.update(sep)
          md.update(tb(j + 2))
          val digest = md.digest()
          if (mins(seed) == null || unsignedLess(digest, mins(seed)))
            mins(seed) = digest
          seed += 1
        }
        j += 1
      }
      new GenericArrayData(mins.map(d => hex(d): Any))
    }

    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  /** 16-bit SimHash: per token md5, hex digit p ∈ [1,16] votes +1 when
    * ≥ '8' (= high bit of the nibble), output '1' where the vote sum is
    * positive — identical to the declarative majority-vote form.
    */
  case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = StringType
    override def prettyName: String = "simhash16"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.sql}")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val votes = new Array[Int](16)
      val md = md5Local.get()
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        if (t != null) {
          md.reset()
          val digest = md.digest(t.getBytes)
          var p = 0
          while (p < 16) {
            val nibble =
              if (p % 2 == 0) (digest(p / 2) >> 4) & 0xf
              else digest(p / 2) & 0xf
            votes(p) += (if ((nibble & 0x8) != 0) 1 else -1)
            p += 1
          }
        }
        i += 1
      }
      val out = new Array[Byte](16)
      var p = 0
      while (p < 16) {
        out(p) = if (votes(p) > 0) '1'.toByte else '0'.toByte
        p += 1
      }
      UTF8String.fromBytes(out)
    }

    override protected def withNewChildInternal(c: Expression): SimHash16 =
      copy(child = c)
  }

  def minhashSignature(tokens: Column, numSeeds: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens), numSeeds))

  def simhash16(tokens: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(tokens)))
}
