package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Ship-type lint: no graded query may SHIP a DecimalType column.
  *
  * Round-12 postmortem: q170/q172 produced values bit-identical to the
  * oracle yet failed the driver's hash compare, because Spark shipped a
  * raw DECIMAL(38,0) while DuckDB shipped HUGEINT — Decimal objects vs
  * ints on the driver's hash path. Wide-decimal arithmetic is fine (and
  * required for overflow-free Σc²-style sums) but it must stay INTERNAL;
  * every shipped column is cast to BIGINT/DOUBLE/STRING at select time.
  * This spec makes the failure class impossible to reintroduce: it walks
  * every SparkEntry.queries result schema (analysis only — no execution
  * beyond what builders force themselves) and fails on any DecimalType,
  * anywhere, including nested in arrays/maps/structs.
  */
class ShipTypeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType      => Seq(path)
    case s: StructType       => s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType        => decimalPaths(a.elementType, s"$path[]")
    case m: MapType          => decimalPaths(m.keyType, s"$path<key>") ++
                                decimalPaths(m.valueType, s"$path<value>")
    case _                   => Nil
  }

  test("no graded query ships a DecimalType column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      decimalPaths(StructType(fn(spark, sfDir).schema.fields), name)
    }
    assert(offenders.isEmpty,
      s"DecimalType must not be shipped (cast to BIGINT/DOUBLE/STRING at select " +
        s"time; the driver's hash path distinguishes Decimal from int even when " +
        s"values are identical): ${offenders.mkString(", ")}")
  }
}
