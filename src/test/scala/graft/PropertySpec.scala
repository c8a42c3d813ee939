package graft

import graft.ext.{Dedup, TextAnalysis}
import graft.functions.ColumnFns
import graft.transform.Transform
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5 plan item 3) — raw ScalaCheck
  * generators pumped with a fixed seed (the scalatestplus bridge is not
  * in the offline dependency set). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("F1 normalization is linear: normalize(k·v) ≈ k·normalize(v)") {
    val gen = for {
      u <- Gen.oneOf("ppb", "ng/m³", "pp100ml", "pa", "µg/m³")
      v <- Gen.choose(-1e6, 1e6)
      k <- Gen.choose(1.0, 64.0)
    } yield (u, v, k)
    val rows = samples(gen, 40)
    val df = rows.toDF("unit", "value", "k")
    val out = df.select(
      (ColumnFns.normalizeValue($"unit", $"value" * $"k") -
        $"k" * ColumnFns.normalizeValue($"unit", $"value")).as("diff"),
      ColumnFns.normalizeValue($"unit", $"value").as("norm"))
      .as[(Double, Double)].collect()
    out.foreach { case (diff, norm) =>
      assert(math.abs(diff) <= 1e-9 * math.max(1.0, math.abs(norm) * 64))
    }
  }

  test("batch from/to equals true min/max for random batches (A1)") {
    samples(Gen.nonEmptyListOf(Gen.choose(0L, 4102444800L)), 10).foreach {
      epochs =>
        val df = epochs.toDF("e")
          .select(timestamp_seconds($"e").as("timestamp"))
        val r = df.agg(min($"timestamp").as("a"), max($"timestamp").as("b"))
          .select(unix_timestamp($"a"), unix_timestamp($"b")).first()
        assert(r.getLong(0) == epochs.min && r.getLong(1) == epochs.max)
    }
  }

  test("jaccard ∈ [0,1], symmetric, 1 for equal sets") {
    val gen = for {
      a <- Gen.nonEmptyListOf(Gen.choose(0, 20))
      b <- Gen.nonEmptyListOf(Gen.choose(0, 20))
    } yield (a, b)
    val pairs = samples(gen, 25)
    val df = pairs.map { case (a, b) =>
      (a.map(_.toString).mkString(" "), b.map(_.toString).mkString(" "),
        a.toSet == b.toSet)
    }.toDF("ta", "tb", "eq")
    val out = df.select(
      Dedup.jaccard(TextAnalysis.tokens($"ta"), TextAnalysis.tokens($"tb")),
      Dedup.jaccard(TextAnalysis.tokens($"tb"), TextAnalysis.tokens($"ta")),
      $"eq").as[(Double, Double, Boolean)].collect()
    out.foreach { case (j, ji, eq) =>
      assert(j >= 0.0 && j <= 1.0 && j == ji)
      if (eq) assert(j == 1.0)
    }
  }

  test("melt→pivot round trip over random wide rows (F13)") {
    val gen = Gen.listOfN(5, Gen.choose(-1e9, 1e9))
    val rows = samples(gen, 20)
    val df = rows.zipWithIndex
      .map { case (vs, i) => (i.toLong, vs(0), vs(1), vs(2), vs(3), vs(4)) }
      .toDF("id", "c0", "c1", "c2", "c3", "c4")
    val cols = (0 until 5).map(i => s"c$i")
    val melted = Transform.melt(df, Seq("id"), cols)
    assert(melted.count() == rows.length * 5L)
    val back = melted.groupBy("id").pivot("input_param", cols)
      .agg(first($"value"))
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }

  test("diff-write idempotence: same content twice → second write empty (K1)") {
    samples(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty)), 3).foreach {
      contents =>
        val out = java.nio.file.Files.createTempDirectory("graft_prop_").toString
        val df = contents.distinct.zipWithIndex
          .map { case (c, i) => (s"k$i", c) }.toDF("key", "json")
        val first = graft.sinks.Sinks
          .diffWriteStations(spark, df, "key", "json", s"$out/s")
        val second = graft.sinks.Sinks
          .diffWriteStations(spark, df, "key", "json", s"$out/s")
        assert(first.count() == contents.distinct.length.toLong)
        assert(second.count() == 0)
    }
  }
}

/** Reference quirks — SURVEY §2.11 keep/fix decisions, pinned by test. */
class QuirksSpec extends SparkSpec {
  import spark.implicits._

  test("§2.11.1 habitatmap inverted null check: engine keeps SANE semantics") {
    // reference `if (measure) continue` pushes only falsy measures (bug);
    // this engine drops null/NaN and keeps real values (documented fix)
    val df = Seq(Some(1.5), Some(0.0), None).toDF("value")
    val kept = Transform.dropNullMeasures(df, "value").as[Double].collect()
    assert(kept.toSet == Set(1.5, 0.0))
  }

  test("§2.11.3 aernode drop-newest-round slice keeps rounds 2..4 (W2)") {
    // rounds = days; newest (possibly partial) round excluded
    val df = Seq(
      (1L, "2024-01-04", 40), (1L, "2024-01-03", 30),
      (1L, "2024-01-02", 20), (1L, "2024-01-01", 10),
      (1L, "2023-12-31", 0)
    ).toDF("dev", "day", "v")
    val kept = Transform.roundsBetween(df, Seq("dev"), col("day"), 2, 4)
      .select("v").as[Int].collect().sorted
    assert(kept.toSeq == Seq(10, 20, 30)) // newest (40) and oldest (0) out
  }

  test("§2.11.4 smartsense -999 sentinel is preserved as a value") {
    // p9_sentinel_map semantics: 'inv' → -999.0 survives the pipeline
    val r = SparkEntry.queries("p9_sentinel_map")(spark, sf0001)
      .filter($"measure" === -999.0).count()
    assert(r > 0)
  }

  test("§2.11.6 heterogeneous timestamp conventions normalize to UTC") {
    val epoch = Seq(1714500000L).toDF("t")
      .select(Transform.normalizeTs($"t", Transform.EpochSeconds).as("ts"))
    val iso = Seq("2024-04-30T18:00:00Z").toDF("t")
      .select(Transform.normalizeTs($"t", Transform.Iso).as("ts"))
    val millis = Seq(1714500000000L).toDF("t")
      .select(Transform.normalizeTs($"t", Transform.EpochMillis).as("ts"))
    assert(epoch.union(iso).union(millis).distinct().count() == 1)
  }
}
