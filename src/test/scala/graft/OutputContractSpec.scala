package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Output-schema contract for every driver-facing query.
  *
  * The driver's pandas-based comparator cannot hash-match a DECIMAL-typed
  * output column between the Spark and DuckDB arrow→pandas paths, no matter
  * how exactly precision/scale are pinned (rounds 1-3 evidence: 3/3
  * decimal-output queries red, 69/69 non-decimal green). The convention is:
  * sum money as DECIMAL internally (order-free exact), final-cast the
  * OUTPUT column to DOUBLE on both sides. This spec makes the convention a
  * compile-the-plan-only gate so the failure class cannot re-enter.
  */
class OutputContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def containsDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType      => true
    case a: ArrayType        => containsDecimal(a.elementType)
    case m: MapType          => containsDecimal(m.keyType) || containsDecimal(m.valueType)
    case s: StructType       => s.fields.exists(f => containsDecimal(f.dataType))
    case _                   => false
  }

  test("no SparkEntry query emits a DecimalType output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, TestSpark.sf).schema
        val bad = schema.fields.filter(f => containsDecimal(f.dataType))
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"decimal-typed output columns (cast to DOUBLE on both sides):\n${offenders.mkString("\n")}")
  }
}
