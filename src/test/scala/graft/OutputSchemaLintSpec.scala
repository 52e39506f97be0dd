package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType, TimestampType}

/** Driver-hash rule (learned in round 1, VERDICT.md "What's wrong"):
  * declared query outputs must contain NO ARRAY / MAP / STRUCT / DECIMAL
  * columns. The driver compares results by loading both sides into pandas,
  * sorting over all columns, and hashing rows — array-likes are unhashable
  * there ("unhashable type: 'numpy.ndarray'", q18/q36/q40 in round 1) and
  * Spark-parquet DECIMAL arrives as Decimal objects while DuckDB's .df()
  * yields float64, so equal values hash differently (q04/q12/q14/q16/q20).
  * Exact DECIMAL math stays INSIDE queries; only the final output cast is
  * restricted. This lint would have caught all 8 round-1 reds at test time.
  *
  * Round-5 addendum: TIMESTAMP_LTZ ([[TimestampType]]) is banned too.
  * Spark writes it as parquet `timestamp[us, tz=UTC]` while the DuckDB
  * oracle's TIMESTAMP is naive `timestamp[us]`, so schema/hash compare
  * fails even when every value matches (q73 was round 5's only red).
  * Timestamps in declared outputs must be TIMESTAMP_NTZ or ISO strings.
  */
class OutputSchemaLintSpec extends SparkSpecBase {

  private def banned(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | _: DecimalType => true
    case _: TimestampType => true // LTZ; TimestampNTZType stays legal
    case _ => false
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name output schema has no ARRAY/MAP/STRUCT/DECIMAL/LTZ columns") {
      val bad = fn(spark, sf0001).schema.fields.filter(f => banned(f.dataType))
      assert(bad.isEmpty,
        s"$name declares driver-unhashable output columns: " +
          bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    }
  }
}
