package graft

import org.apache.spark.sql.types.TimestampType

/** Loader behavior that is invisible to the oracle queries: the
  * TIMESTAMP(NANOS) events generation must read correctly WITHOUT the
  * loader mutating session-wide SQL conf (round-11 verdict item 6).
  * The fixture is a pyarrow-written parquet with `ts: timestamp[ns]`
  * holding sub-microsecond values straddling µs boundaries — the
  * encoding Spark's vectorized reader rejects unless the legacy
  * nanos-as-long mapping is enabled for the scan. */
class TablesSpec extends SparkSpec {

  private def nanosDir: String =
    getClass.getResource("/nanos_events").getPath

  test("events reads a TIMESTAMP(NANOS) file, floors to microseconds, " +
    "and leaves the session legacy flag at its pre-call value") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val before = spark.conf.get(key) // registered default ("false")
    val ev = Tables.events(spark, nanosDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val got = ev.orderBy("event_id")
      .selectExpr("event_id", "unix_micros(ts) AS us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // nanos floored (DIV 1000) to µs, sub-µs ordering sacrificed by design
    assert(got == Seq(
      1L -> 1700000000123456L,
      2L -> 1700000000123456L,
      3L -> 1700000001000000L,
      4L -> 1699999999999999L))
    // the load + the ACTION above must not have flipped the session
    // flag: a caller reading their OWN nanos file must still get the
    // default rejection, not a silently changed session
    assert(spark.conf.get(key) == before, s"$key leaked into session conf")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.read.parquet(s"$nanosDir/events.parquet").schema
    }
  }

  test("events still reads the plain timestamp[us] generation unchanged") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.get(key)
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(5).count() > 0)
    assert(spark.conf.get(key) == before)
  }
}
