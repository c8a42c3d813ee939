import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A declared operator query: (session, sf-dir) → result.
    * Paired 1:1 with a DuckDB oracle SQL string where SQL-expressible. */
  type Q = (SparkSession, String) => DataFrame
}
