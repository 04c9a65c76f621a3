package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the session's function registry, which is
  * `private[sql]`. Lives in Spark's package solely to expose temp-function
  * registration to the graft library — the standard pattern for Spark
  * extension libraries that must attach expressions to sessions they did
  * not create (SparkSessionExtensions only applies at builder time).
  */
object GraftRegistry {
  def register(spark: SparkSession, name: String,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
