package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one per JVM; suites reuse via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-warehouse-${sys.props.getOrElse("user.name", "t")}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val sf0001 = "/root/testdata/sf0.001"

  /** Drop a managed table AND its warehouse directory — the in-memory
    * catalog forgets tables across JVM restarts while the directory
    * persists, so a bare overwrite hits LOCATION_ALREADY_EXISTS. */
  def dropTableFully(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(loc, name)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
      ()
    }
  }

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}
