package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan-evidence dev tool for checkpoint-hidden fragments: queries
  * that `localCheckpoint()` mid-build (the globalRank/globalCumSum
  * family) truncate their final `explain()` to a `Scan ExistingRDD`,
  * so the physical shape of the indexed fragment never shows in
  * `ExplainQ` output.  This prints the ATTACH fragment's plan under a
  * given strategy conf — the before/after artifact for
  * `plans/r20/`.
  *
  * Usage: `sbt "runMain graft.tools.FragPlans rank|cum [k=v,...]"` */
object FragPlans {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1) args(1).split(",").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => sys.error(s"conf entry '$kv' is not key=value " +
          "(comma-separated; values must not contain commas)")
      }
    }
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", pmod(col("id") * 37, lit(101)))
    val sorted = df.repartitionByRange(8, col("v").desc, col("id").asc)
      .sortWithinPartitions(col("v").desc, col("id").asc)
    val frag = which match {
      case "rank" =>
        val impl = spark.conf.get("spark.graft.rankIndexImpl", "codegen")
        if (impl == "codegen")
          sorted.withColumn("__mid", monotonically_increasing_id())
            .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
            .withColumn("__idx",
              col("__mid").bitwiseAND(lit((1L << 33) - 1)))
            .drop("__mid")
        else {
          import org.apache.spark.sql.{Encoders, Row}
          import org.apache.spark.sql.types.{IntegerType, LongType}
          val schema = df.schema
            .add("__pid", IntegerType, nullable = false)
            .add("__idx", LongType, nullable = false)
          sorted.mapPartitions { it =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            it.zipWithIndex.map { case (r, i) =>
              Row.fromSeq(r.toSeq :+ pid :+ i.toLong)
            }
          }(Encoders.row(schema))
        }
      case "cum" =>
        val impl = spark.conf.get("spark.graft.cumIndexImpl", "operator")
        if (impl == "operator")
          graft.plans.PartitionPrefixSum.attach(sorted, "v")
        else {
          import org.apache.spark.sql.{Encoders, Row}
          import org.apache.spark.sql.types.{IntegerType, LongType}
          val valueIdx = df.schema.fieldIndex("v")
          val schema = df.schema
            .add("__pid", IntegerType, nullable = false)
            .add("__pcum", LongType, nullable = false)
            .add("__ridx", LongType, nullable = false)
          sorted.mapPartitions { it =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var acc = 0L
            var idx = 0L
            it.map { r =>
              acc += r.getAs[Number](valueIdx).longValue()
              idx += 1
              Row.fromSeq(r.toSeq :+ pid :+ acc :+ idx)
            }
          }(Encoders.row(schema))
        }
      case other => throw new IllegalArgumentException(other)
    }
    frag.explain("formatted")
    spark.stop()
  }
}
