package graft

import org.apache.spark.sql.types._

/** Driver-hash portability lint over every GATED query's final schema.
  *
  * The driver hashes the Spark parquet (pyarrow) against the DuckDB
  * oracle result cell-by-cell on python repr; DuckDB surfaces DECIMAL
  * as `decimal.Decimal` while DOUBLE is `float`, so a DECIMAL final
  * column hash-mismatches even when every value is equal — exactly the
  * round-9/10 `q_pmi` red. Internal decimal math is fine (it's what
  * makes sums order-free-exact); EMISSION must land on a portable
  * type. This spec makes that bug class unrecurrable: it builds every
  * oracle-gated query's plan (no action) and asserts no DecimalType —
  * or any other type we have not proven hash-portable — anywhere in
  * the final schema, including nested in arrays/maps/structs.
  *
  * Portable = types with at least one green gated query in
  * CORRECTNESS_r10: STRING, BOOLEAN, INT, BIGINT, DOUBLE, DATE,
  * TIMESTAMP(_NTZ), BINARY, FLOAT, and arrays thereof.
  */
class OutputTypeLintSpec extends SparkSpec {

  private val portable: Set[DataType] = Set(
    StringType, BooleanType, IntegerType, LongType, DoubleType,
    FloatType, DateType, TimestampType, TimestampNTZType, BinaryType)

  private def offenders(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: $dt")
    case ArrayType(el, _) => offenders(el, s"$path[]")
    case MapType(k, v, _) =>
      offenders(k, s"$path.key") ++ offenders(v, s"$path.value")
    case StructType(fs) => fs.flatMap(f => offenders(f.dataType, s"$path.${f.name}"))
    case t if portable(t) => Nil
    case t => Seq(s"$path: unvetted type $t")
  }

  test("no gated query emits DecimalType (or any unvetted type) in its final schema") {
    val gated = SparkEntry.declared.filter(_.oracle.isDefined)
    assert(gated.nonEmpty)
    val bad = gated.flatMap { q =>
      val schema = q.fn(spark, sf).schema
      info(s"${q.name}: " + schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      schema.fields.flatMap(f => offenders(f.dataType, s"${q.name}.${f.name}"))
    }
    assert(bad.isEmpty, "hash-hostile final column types:\n" + bad.mkString("\n"))
  }
}
