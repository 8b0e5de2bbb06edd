package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark internals that are `private[sql]` in Spark 4.x
  * (Column↔Expression and the session FunctionRegistry). Lives under the
  * org.apache.spark.sql package for access; contains no logic. */
object Shim {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def registry(spark: org.apache.spark.sql.SparkSession): FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry

  def tableRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.tableFunctionRegistry

  /** DataFrame over a parquet [[org.apache.spark.sql.execution.datasources.FileIndex]]
    * — the hook a custom stat-pruning index needs (HadoopFsRelation's
    * constructor takes the classic session). Keeps the full vectorized
    * parquet scan + pushdown; only file LISTING is customized. */
  def parquetFrame(spark: org.apache.spark.sql.SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      dataSchema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // the relation's partition schema MUST be the index's own: an empty
    // one here would (a) resolve partition columns to nothing upstream
    // and (b) trip the parquet reader's partitionValues-arity assert
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, index.partitionSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      Map.empty)(cs)
    cs.baseRelationToDataFrame(rel)
  }
}
