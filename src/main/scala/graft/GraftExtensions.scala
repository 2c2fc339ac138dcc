package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.{Int8Ops, LongDotProduct, TextHashes}

/** SQL-surface registration of graft's custom Catalyst expressions, so a
  * user of the library can call them from `spark.sql(...)` (or a JDBC /
  * Thrift client) without touching the Scala Column API — the
  * Spark-idiomatic integration path (`SparkSessionExtensions
  * .injectFunction`).
  *
  * Two ways in, same builders either way:
  *
  *  1. Cluster config, applied at session build time:
  *     `spark.sql.extensions=graft.GraftExtensions` (or
  *     `SparkSession.builder.withExtensions(new GraftExtensions)`).
  *  2. An already-running session (e.g. a notebook):
  *     `GraftExtensions.register(spark)`.
  *
  * Registered functions:
  *  - `graft_minhash(tokens array<string>[, numSeeds constant int = 8])`
  *    → `array<string>` MinHash signature ([[TextHashes.MinHashSignature]])
  *  - `graft_simhash16(tokens array<string>)` → 16-char bit string
  *    ([[TextHashes.SimHash16]])
  *  - `graft_long_dot_product(a, b)` over any
  *    `array<tinyint|smallint|int|bigint>` (element widths may differ
  *    per side; fractional arrays rejected at analysis) → bigint,
  *    whole-stage-codegen'd ([[LongDotProduct]])
  *  - `graft_pack_int8(a array<tinyint|smallint|int|bigint> in
  *    [-127,127])` → `binary`, one signed byte per element
  *    ([[Int8Ops.PackInt8]])
  *  - `graft_int8_dot_product(a binary, b binary)` → bigint over the
  *    packed bytes, whole-stage-codegen'd ([[Int8Ops.Int8DotProduct]])
  *
  * The `FirstSeenDedup` Aggregator is NOT here: typed Aggregators
  * register per-session via `spark.udf.register`, not the extension
  * injector (see `FirstSeenDedup.asUdaf`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    // the 11-arg constructor is the only non-deprecated full form; empty
    // strings mean "no examples/since/notes", "built-in" source matches
    // what FunctionRegistry uses for its own expressions
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def minhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(tokens) => TextHashes.MinHashSignature(tokens, 8)
    // Any FOLDABLE integer-typed expression works — `4`, `2+2`,
    // `CAST(4 AS INT)`, `4L` — since all are constant by the time the
    // signature schema is shaped. Only genuinely row-dependent seed
    // counts are rejected (the seed count shapes the output schema).
    case Seq(tokens, n) if n.foldable &&
        Seq(ByteType, ShortType, IntegerType, LongType).contains(n.dataType) =>
      val v = n.eval() match {
        case null => throw new IllegalArgumentException(
          "graft_minhash: numSeeds must not be NULL")
        case b: Byte  => b.toLong
        case s: Short => s.toLong
        case i: Int   => i.toLong
        case l: Long  => l
      }
      if (v < 1L || v > 1024L) throw new IllegalArgumentException(
        s"graft_minhash: numSeeds must be in [1, 1024]; got $v")
      TextHashes.MinHashSignature(tokens, v.toInt)
    case Seq(_, other) => throw new IllegalArgumentException(
      "graft_minhash: numSeeds must be a constant (foldable) integer " +
        "expression — the seed count shapes the output schema, so it " +
        s"cannot be row-dependent; got $other")
    case _ => throw new IllegalArgumentException(
      s"graft_minhash expects (tokens[, numSeeds]), got ${args.length} args")
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(tokens) => TextHashes.SimHash16(tokens)
    case _ => throw new IllegalArgumentException(
      s"graft_simhash16 expects (tokens), got ${args.length} args")
  }

  private def longDotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => LongDotProduct(a, b)
    case _ => throw new IllegalArgumentException(
      s"graft_long_dot_product expects (a, b), got ${args.length} args")
  }

  private def packInt8Builder(args: Seq[Expression]): Expression = args match {
    case Seq(a) => Int8Ops.PackInt8(a)
    case _ => throw new IllegalArgumentException(
      s"graft_pack_int8 expects (a), got ${args.length} args")
  }

  private def int8DotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => Int8Ops.Int8DotProduct(a, b)
    case _ => throw new IllegalArgumentException(
      s"graft_int8_dot_product expects (a, b), got ${args.length} args")
  }

  /** The injection list — shared by the extension class (config path)
    * and [[register]] (running-session path), so the two ways in can
    * never drift.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "_FUNC_(tokens[, numSeeds]) - MinHash signature over 3-token shingles"),
      minhashBuilder),
    (FunctionIdentifier("graft_simhash16"),
      info("graft_simhash16",
        "_FUNC_(tokens) - 16-bit SimHash as a '0'/'1' string"),
      simhashBuilder),
    (FunctionIdentifier("graft_long_dot_product"),
      info("graft_long_dot_product",
        "_FUNC_(a, b) - exact BIGINT dot product of two integral arrays " +
          "(array<tinyint|smallint|int|bigint>)"),
      longDotBuilder),
    (FunctionIdentifier("graft_pack_int8"),
      info("graft_pack_int8",
        "_FUNC_(a) - pack an integral array (tinyint|smallint|int|bigint " +
          "elements in [-127,127]) into binary (SQ8)"),
      packInt8Builder),
    (FunctionIdentifier("graft_int8_dot_product"),
      info("graft_int8_dot_product",
        "_FUNC_(a, b) - exact BIGINT dot product of two packed-int8 binaries"),
      int8DotBuilder))

  /** Register on an ALREADY-BUILT session (notebooks, tests). The
    * config path can't help there: `withExtensions` on `getOrCreate`
    * is a no-op against an existing active session.
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fnInfo, builder)
    }
}
