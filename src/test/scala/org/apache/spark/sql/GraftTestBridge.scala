package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only bridge into `private[sql]` members: materialize a
  * SparkSessionExtensions' function registrations into a registry so
  * the spark.sql.extensions path is testable without a second
  * SparkSession. */
object GraftTestBridge {
  def registerFunctions(ext: SparkSessionExtensions,
                        reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
