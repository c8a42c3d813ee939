package graft

import graft.pipeline._
import org.apache.spark.sql.functions._

class V01ProvidersSpec extends SparkSpec {
  import spark.implicits._

  test("lovemyair: P8 unit allow-list + W1 last-3 per parameter") {
    val b = LoveMyAirPipeline.run(spark, fixture("lovemyair.json"))
    val m = b.measures
      .select($"sensor_id", $"measure").as[(String, Double)].collect()
    // p1 has 4 readings → last 3 kept (2,3,4); p2 wrong units dropped;
    // p3 single reading kept
    assert(m.count(_._1 == "lovemyair-s1-pm25") == 3)
    assert(m.filter(_._1 == "lovemyair-s1-pm25").map(_._2).sorted.toSeq ==
      Seq(2.0, 3.0, 4.0))
    assert(m.count(_._1 == "lovemyair-s2-pm25") == 1)
    assert(b.stations.count() == 2)
  }

  test("aernode: W2 rounds 2..4, P14 whitelist, F9 hour-ending") {
    val b = AernodePipeline.run(spark, fixture("aernode.json"))
    val m = b.measures
      .select($"sensor_id", $"measure",
        date_format($"timestamp", "HH:mm").as("t"))
      .as[(String, Double, String)].collect()
    // rounds desc: 12:00 (rank1, dropped), 11:00, 10:00, 09:00 kept;
    // 08:00 = rank 5 dropped; noise not whitelisted
    assert(m.forall(r => !r._1.contains("noise")))
    val pm25Vals = m.filter(_._1 == "aernode-d1-pm25").map(_._2).sorted.toSeq
    assert(pm25Vals == Seq(20.0, 30.0, 40.0))
    // hour-ending: 11:00 reading stamps as 12:00
    assert(m.filter(_._2 == 40.0).head._3 == "12:00")
  }

  test("iqair: W3 first-12 per day + F9 hour-ending") {
    val b = IqAirPipeline.run(spark, fixture("iqair.csv"))
    val m = b.measures.select($"measure").as[Double].collect().sorted
    // 14 hourly rows → first 12 kept
    assert(m.toSeq == (1 to 12).map(_.toDouble))
    val ts = b.measures.filter($"measure" === 1.0)
      .select(date_format($"timestamp", "HH:mm")).as[String].first()
    assert(ts == "01:00") // hour-beginning 00:00 → hour-ending 01:00
  }

  test("airgradient: P6 precision filter + W4 lagged hour window") {
    val b = AirGradientPipeline.run(spark, fixture("airgradient.json"))
    // L2 (2dp coords) and L3 (null) filtered out
    assert(b.stations.select($"location").as[String].collect().toSeq ==
      Seq("airgradient-L1"))
    val m = b.measures
      .select($"sensor_id", $"measure",
        date_format($"timestamp", "HH:mm").as("t"))
      .as[(String, Double, String)].collect()
    // window [09:00, 11:00] keeps 09:10/10:20/11:30 readings, drops 12:05;
    // null rhum at 10:20 dropped → 3+3+2 = 8 measures
    assert(m.length == 8)
    assert(!m.exists(_._2 == 8.0))
    // temperature normalized unit passthrough + hour-ending stamps
    assert(m.filter(_._1 == "airgradient-L1-pm25").map(_._3).sorted.toSeq ==
      Seq("10:00", "11:00", "12:00"))
  }

  test("smartsense: P9 sentinels ('n/a' dropped, 'inv' → -999)") {
    val b = SmartSensePipeline.run(spark, fixture("smartsense.json"))
    val m = b.measures.select($"measure").as[Double].collect().sorted
    assert(m.toSeq == Seq(-999.0, 12.5))
  }

  test("all v0.1 providers run through the processor envelope sink") {
    val out = java.nio.file.Files.createTempDirectory("graft_v01_").toString
    for ((p, fx) <- Seq(
      "lovemyair" -> "lovemyair.json", "aernode" -> "aernode.json",
      "iqair" -> "iqair.csv", "airgradient" -> "airgradient.json",
      "smartsense" -> "smartsense.json")) {
      val s = Pipelines.processor(spark, p, fixture(fx), out).first()
      assert(s.getLong(2) > 0, s"$p measures")
      assert(new java.io.File(s"$out/measures-json/$p").exists(), p)
    }
  }
}
