package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class DsV2Spec extends SparkSpec {
  import spark.implicits._

  lazy val path: String = fixture("readings.jsonl")

  test("DSv2 source reads with inferred schema") {
    val df = spark.read.format("graft-fixture").load(path)
    assert(df.count() == 4)
    assert(df.schema("sensor_index").dataType.typeName == "long")
    assert(df.schema("pm25").dataType.typeName == "double")
  }

  test("filters and column pruning are pushed to the connector") {
    val df = spark.read.format("graft-fixture").load(path)
      .filter($"location_type" === 0 && $"pm25" > 4.0)
      .select($"sensor_index", $"pm25")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get
    val desc = scan.scan.description()
    assert(desc.contains("EqualTo(location_type,0)"), desc)
    assert(desc.contains("GreaterThan(pm25,4.0)"), desc)
    assert(desc.contains("columns=[sensor_index,pm25]"), desc)
    val rows = df.orderBy("sensor_index").as[(Long, Double)].collect()
    assert(rows.toSeq == Seq((456L, 7.0), (999L, 12.5)))
  }

  test("unsupported predicates fall back to post-scan evaluation") {
    val df = spark.read.format("graft-fixture").load(path)
      .filter(substring($"name", 6, 1) === "A") // not connector-pushable
    assert(df.count() == 1)
    assert(df.select("sensor_index").as[Long].first() == 123L)
  }

  test("null-aware filters behave API-side") {
    val notNull = spark.read.format("graft-fixture").load(path)
      .filter($"pm25".isNotNull)
    assert(notNull.count() == 3)
    val in = spark.read.format("graft-fixture").load(path)
      .filter($"name".isin("Site A", "Site C"))
    assert(in.count() == 2)
  }
}
