package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only access bridge: `SparkSessionExtensions.registerFunctions`
  * is `private[sql]`, and the `GraftExtensions` spec wants to drive
  * Spark's own session-build application step without a second
  * SparkContext. Lives in test sources so the production jar carries no
  * test scaffolding.
  */
object TestBridge {
  def applyInjectedFunctions(ext: SparkSessionExtensions,
                             reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
