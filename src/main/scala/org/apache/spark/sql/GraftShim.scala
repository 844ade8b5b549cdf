package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made Column node-based and hid the Expression conversions
  * behind `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Extension libraries conventionally expose them from inside the
  * `org.apache.spark.sql` namespace — this is the only file in this repo
  * living outside the `graft` package, and it contains no logic.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame → ONE standard Arrow IPC stream (schema header +
    * record batches + EOS), readable by any Arrow implementation
    * (pyarrow, DuckDB, arrow-rs). The batches are produced
    * DISTRIBUTED (`toArrowBatchRdd` serializes per partition — the
    * same path PySpark's toArrow uses); only the final byte
    * assembly happens on the driver, which is inherent to "give me
    * one in-memory stream" egress. Reference analogue:
    * HDK's ResultSet→Arrow conversion (ResultSetArrowConversion).
    */
  def toArrowIpcStream(df: DataFrame): Array[Byte] = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    val tz = ds.sparkSession.sessionState.conf.sessionLocalTimeZone
    val out = new java.io.ByteArrayOutputStream()
    val w = new execution.arrow.ArrowBatchStreamWriter(
      ds.schema, out, tz, true, false)
    w.writeBatches(ds.toArrowBatchRdd.collect().iterator)
    w.end()
    out.toByteArray
  }

  /** Arrow IPC stream bytes → DataFrame, schema inferred from the
    * stream itself (reference: hdk.py:2361 import_arrow). */
  def fromArrowIpcStream(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val (it, schema) = execution.arrow.ArrowConverters.fromIPCStream(bytes)
    try {
      // deep-copy rows out of the Arrow-backed batch before closing it
      val rows = it.map(_.copy()).toIndexedSeq
      session.internalCreateDataFrame(
        session.sparkContext.parallelize(rows), schema)
    } finally it.close()
  }
}
