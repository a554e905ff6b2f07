package graft

class CatalogSpec extends SparkSpec {

  test("whole engine is reachable through spark.sql, including graft_dot") {
    Catalog.registerTables(spark, "/root/testdata/sf0.001")
    val top = spark.sql(
      """SELECT user_id, SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS total
        |FROM events WHERE value > 100.0
        |GROUP BY user_id ORDER BY total DESC, user_id LIMIT 3""".stripMargin)
    assert(top.count() === 3)
    val sim = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |       graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                 CAST(b.embedding AS ARRAY<DOUBLE>)) AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
    assert(sim.count() === 1)
    assert(!sim.collect().head.isNullAt(2))
  }
}
