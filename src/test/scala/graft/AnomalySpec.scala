package graft

import graft.ext.Anomaly
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  /** user A: daily counts 1,1,1,1,16 → mean 4, var 36, z(16) = 2.0
    * exactly (threshold boundary) and z(1) = −0.5; user B: constant
    * rate → var 0 → excluded entirely. */
  private def fixture = {
    val rows = Seq.newBuilder[(String, Long)]
    for (d <- 1 to 5) {
      val copies = if (d == 5) 16 else 1
      for (i <- 0 until copies) rows += ((f"2024-01-0$d $i%02d:00:00", 1L))
      for (i <- 0 until 3) rows += ((f"2024-01-0$d 2$i:00:00", 2L))
    }
    rows.result().toDF("ss", "user_id")
      .select(to_timestamp(col("ss")).as("ts"), col("user_id"))
  }

  test("rate anomalies: exact z boundary included, constant keys excluded") {
    val got = Anomaly.keyRateAnomalies(fixture, "ts", "user_id",
        "1 day", minZ = 2.0)
      .select("k", "n", "mean", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 16L, 4.0, 2.0)),
      s"expected exactly the boundary outlier, got ${got.toSeq}")
  }

  test("silent keys: a key that stops reporting is flagged with its " +
    "last window and historical mean; active keys are not") {
    import spark.implicits._
    val rows = Seq.newBuilder[(String, Long)]
    for (d <- 1 to 5) rows += ((f"2024-01-0$d 08:00:00", 1L))
    for (d <- 1 to 3; i <- 0 until 2) // user 2 goes silent after day 3
      rows += ((f"2024-01-0$d 1$i:00:00", 2L))
    val ev = rows.result().toDF("ss", "user_id")
      .select(to_timestamp(col("ss")).as("ts"), col("user_id"))
    val got = Anomaly.silentKeys(ev, "ts", "user_id", "1 day")
      .select(col("k"), date_format(col("last_seen"), "yyyy-MM-dd"),
        col("mean_n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq((2L, "2024-01-03", 2.0)))
  }

  test("reference-window mode: a permanent rate shift stays flagged in " +
    "every window, where self-baselining never flags it") {
    // history: user 1 posts 1,1,1,9 per day → mean 3, var 12
    val hist = (for (d <- 1 to 4; i <- 0 until (if (d == 4) 9 else 1))
        yield (f"2024-01-0$d $i%02d:00:00", 1L))
      .toDF("ss", "user_id")
      .select(to_timestamp(col("ss")).as("ts"), col("user_id"))
    // probe: the rate shifts permanently to 17/day for three days
    val probe = (for (d <- 5 to 7; i <- 0 until 17)
        yield (f"2024-01-0$d $i%02d:00:00", 1L))
      .toDF("ss", "user_id")
      .select(to_timestamp(col("ss")).as("ts"), col("user_id"))

    // self-baselining: the shifted rate IS the baseline (constant →
    // zero variance → filtered) — nothing flagged, the blind spot
    assert(Anomaly.keyRateAnomalies(probe, "ts", "user_id",
      "1 day", minZ = 2.0).count() === 0)

    // frozen reference stats: z = (17 − 3)/sqrt(12) ≈ 4.04 in EVERY
    // probed window — the shift never absorbs into its own baseline
    val got = Anomaly.keyRateAnomalies(probe, "ts", "user_id",
        "1 day", minZ = 2.0, statsFrom = Some(hist))
      .select("n", "mean", "z").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length === 3, s"all three windows must flag, got ${got.toSeq}")
    assert(got.forall { case (n, m, z) =>
      n == 17L && m == 3.0 && math.abs(z - 4.041452) < 1e-6 }, got.toSeq)
  }

  test("rate anomalies: lowering the threshold surfaces the mild days") {
    val got = Anomaly.keyRateAnomalies(fixture, "ts", "user_id",
        "1 day", minZ = 0.4)
      .filter(col("k") === 1L).select("z").as[Double].collect().toSet
    assert(got === Set(2.0, -0.5))
  }
}
