package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashes

/** The SQL surface of the custom Catalyst expressions: same bits through
  * `spark.sql(...)` as through the Column API, plus the
  * `spark.sql.extensions` config-path wiring.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("graft_minhash via SQL equals the Column API, default and explicit seeds") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq("a b c d e f", "x y", "the quick brown fox jumps")
      .toDF("text")
    df.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT graft_minhash(split(text, ' ')) AS s8,
                graft_minhash(split(text, ' '), 4) AS s4
         FROM ext_docs""").collect()
    val viaCol = df.select(
      TextHashes.minhashSignature(org.apache.spark.sql.functions.split(
        df("text"), " "), 8).as("s8"),
      TextHashes.minhashSignature(org.apache.spark.sql.functions.split(
        df("text"), " "), 4).as("s4")).collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
    // the < 3-token row yields an all-null signature either way
    assert(viaSql(1).getSeq[String](0).forall(_ == null))
  }

  test("graft_simhash16 and graft_long_dot_product via SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash16(split('a b c', ' ')) AS sh,
                graft_long_dot_product(array(1L, 2L, 3L),
                                       array(4L, 5L, 6L)) AS dot,
                graft_long_dot_product(array(1, 2, 3),
                                       array(4, 5, 6)) AS dot_int""").head()
    import spark.implicits._
    val expectedSh = Seq("a b c").toDF("t")
      .select(TextHashes.simhash16(
        org.apache.spark.sql.functions.split($"t", " ")))
      .head().getString(0)
    assert(r.getString(0) === expectedSh)
    assert(r.getLong(1) === (4L + 10L + 18L))
    // array<int> is accepted natively (width-matched accessor, no cast)
    assert(r.getLong(2) === 32L)
  }

  test("graft_minhash accepts foldable constant seeds: 2+2, CAST, bigint") {
    GraftExtensions.register(spark)
    // ADVICE r4: any foldable integer-typed constant must work, not just
    // a bare INT literal — all four spellings shape the same 4-seed schema
    val r = spark.sql(
      """SELECT graft_minhash(split('a b c d', ' '), 4)             AS a,
                graft_minhash(split('a b c d', ' '), 2 + 2)         AS b,
                graft_minhash(split('a b c d', ' '), CAST(4 AS INT)) AS c,
                graft_minhash(split('a b c d', ' '), 4L)            AS d,
                graft_minhash(split('a b c d', ' '), length('abcd')) AS e
      """).head()
    val base = r.getSeq[String](0)
    assert(base.length === 4)
    (1 to 4).foreach(i => assert(r.getSeq[String](i) === base))
  }

  test("graft_minhash rejects a row-dependent seed count") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a b c", 4)).toDF("text", "n").createOrReplaceTempView("ext_seed")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_minhash(split(text, ' '), n) FROM ext_seed").collect()
    }
    def msg(t: Throwable) = Option(t.getMessage).getOrElse("").toLowerCase
    assert(msg(e).contains("foldable") || msg(e).contains("constant") ||
      Option(e.getCause).exists(c =>
        msg(c).contains("foldable") || msg(c).contains("constant")))
  }

  test("config-path wiring: the extension class applies the same functions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    // registerFunctions is Spark's own application step at session build
    val reg = org.apache.spark.sql.graftbridge.TestBridge
      .applyInjectedFunctions(ext, new SimpleFunctionRegistry)
    val names = Seq("graft_minhash", "graft_simhash16",
      "graft_long_dot_product", "graft_pack_int8", "graft_int8_dot_product")
    assert(names.forall(n =>
      reg.functionExists(FunctionIdentifier(n))))
    // and it is literally the same builder list the runtime path uses
    assert(GraftExtensions.functions.map(_._1.funcName) === names)
  }
}
