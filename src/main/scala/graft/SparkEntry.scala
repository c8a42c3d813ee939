package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator (plus the
  * large-scale-pipeline extensions) to a runnable DataFrame program over
  * the driver's tables; `oracleSql` carries the DuckDB-equivalent SQL the
  * driver hash-compares against (omitted only for ops whose semantics are
  * not SQL-expressible — those get a rows-only check).
  */
object SparkEntry {

  private val groups: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (RelQueries.qs, RelQueries.sql),
    (ScanFilterQueries.qs, ScanFilterQueries.sql),
    (FnQueries.qs, FnQueries.sql),
    (ExtQueries.qs, ExtQueries.sql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("x28_curation_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.iterator.flatMap(_._2).toMap
}
