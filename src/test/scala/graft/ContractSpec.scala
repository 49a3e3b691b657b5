package graft

/** Driver-contract invariants: every oracle key has a query, the
  * flagship entry returns rows, and every registered query executes on
  * the smoke-scale fixture. */
class ContractSpec extends SparkTestBase {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without query impl: $missing")
  }

  test("entry (flagship) returns exactly its limit on sf0.001") {
    // the flagship ends in .limit(10) over 25 nation groups — the
    // deterministic fixture answer is exactly 10. A >0 gate would
    // pass a join/filter regression that drops most groups (the
    // driver's own smoke check is rows>0; this spec pins the count)
    assert(SparkEntry.entry(spark).count() == 10)
  }

  test("oracle-checked queries emit only scalar columns (driver comparator limit)") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.oracleSql.keySet.foreach { name =>
      val bad = SparkEntry.queries(name)(spark, sfSmoke).schema.fields
        .filter(_.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _                                         => false
        })
      assert(bad.isEmpty,
        s"$name emits non-scalar columns [${bad.map(_.name).mkString(",")}] — " +
          "the driver's pandas comparator cannot hash array/map/struct values; " +
          "stringify with array_join/to_json on BOTH engines")
    }
  }

  test("every query runs and yields a non-empty schema on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfSmoke)
      assert(df.schema.nonEmpty, s"$name produced empty schema")
      // force execution to surface runtime errors
      df.count()
    }
  }
}
