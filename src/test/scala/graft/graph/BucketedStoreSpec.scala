package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark.TinySf

/** Proof of the co-located-join design claim: two edge frames bucketed on
  * the document key join WITHOUT a shuffle exchange, and the co-author
  * self-join result is identical to the unbucketed plan's.
  */
class BucketedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed self-join on the doc key plans no shuffle exchange") {
    val au = BibGraph.authored(spark, TinySf)
    BucketedStore.writeBucketed(au, "authored_b", "title", buckets = 8)
    val t = BucketedStore.table(spark, "authored_b")
    val joined = t.as("a")
      .join(t.as("b"), $"a.title" === $"b.title" && $"a.author" < $"b.author")
      .select($"a.author", $"b.author")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // and produces exactly the frames the unbucketed join produces
    val bucketed = joined.as[(String, String)].collect().toSet
    val plain = au.as("a")
      .join(au.as("b"), $"a.title" === $"b.title" && $"a.author" < $"b.author")
      .select($"a.author", $"b.author").as[(String, String)].collect().toSet
    assert(bucketed === plain && plain.nonEmpty)
  }
}
