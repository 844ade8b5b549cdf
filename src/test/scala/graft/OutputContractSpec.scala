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

  // The full lesson, not just the decimal half: §6 documents three
  // comparator-hostile output families — DECIMAL (hashes differently
  // between the two arrow→pandas paths), ARRAY (unhashable ndarray →
  // comparator crash; the convention is comma-joined canonical strings
  // on both sides), and MAP/STRUCT (same unhashable-container failure).
  // Every ORACLED query must therefore emit only flat atomic non-decimal
  // columns. Rows-only queries are exempt: the driver just counts their
  // parquet rows, and arrays/binaries there (ann candidates, multimodal
  // frames) are part of the operator's real shape.
  test("oracled queries emit only flat atomic, non-decimal output columns") {
    val oracled = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => oracled.contains(name) }
      .flatMap { case (name, fn) =>
        val schema = fn(spark, TestSpark.sf).schema
        val bad = schema.fields.filter { f =>
          f.dataType match {
            case _: ArrayType | _: MapType | _: StructType => true
            case dt => containsDecimal(dt)
          }
        }
        if (bad.isEmpty) None
        else Some(s"$name: ${bad.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
      }
    assert(offenders.isEmpty,
      "comparator-hostile output columns in oracled queries " +
        s"(flatten/stringify per SURVEY §6):\n${offenders.mkString("\n")}")
  }
}
