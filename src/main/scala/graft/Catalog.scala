package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register every testdata table as a temp view (plus the
  * native function library), so the entire engine is reachable through
  * `spark.sql(...)` — the query-language capability the reference lacks
  * outright (SURVEY.md §2.D "SQL parser / query language: absent").
  *
  * Catalyst treats a sql() plan and the equivalent DataFrame plan
  * identically, so everything verified through `SparkEntry.queries` holds
  * for the SQL path too (spot-checked in `CatalogSpec`). */
object Catalog {
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { name =>
      Tables(spark, sfDir, name).createOrReplaceTempView(name)
    }
    graft.expressions.GraftFunctions.register(spark)
  }
}
