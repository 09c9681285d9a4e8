package graft

import graft.model.{SchemaContract, TestTableSchemas}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** §5 tier-3 contract checks (every test table matches its pinned schema)
  * and scalacheck-generated round-trip properties — the upgrade of the
  * reference's ad-hoc special-character JSON cases
  * (tests/unit/test_get_train_status.py:109-163).
  */
class ContractAndPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001
  import spark.implicits._

  test("all ten test tables satisfy their pinned schema contracts") {
    TestTableSchemas.all.foreach { case (name, expected) =>
      val df = if (name == "events") Tables.events(spark, sf)
        else Tables.load(spark, sf, name)
      SchemaContract.assertMatches(df, expected, name)
    }
  }

  test("schema drift is reported with every violation named") {
    val drifted = Tables.region(spark, sf)
      .withColumnRenamed("r_name", "region_name")
      .withColumn("r_regionkey", $"r_regionkey".cast(LongType))
    val err = intercept[IllegalStateException] {
      SchemaContract.assertMatches(drifted, TestTableSchemas.all("region"), "region")
    }
    assert(err.getMessage.contains("missing column: r_name"))
    assert(err.getMessage.contains("unexpected column: region_name"))
    assert(err.getMessage.contains("type drift: r_regionkey"))
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val seed = rng.Seed(42L)
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed), seed)) {
      case (_, s) => val s2 = s.next; (g.pureApply(Gen.Parameters.default, s2), s2)
    }.map(_._1).take(n).toSeq
  }

  test("L1 z-order layout strictly beats user-major linear on day skipping") {
    val rows = graft.analytics.LayoutQueries.zorderLayout(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (linFiles, linRows, linSpan, linProbe) = rows("linear_user_major")
    val (zFiles, zRows, zSpan, zProbe) = rows("zorder")
    assert(linRows === zRows) // same relation, two layouts
    // the point of z-ordering: per-file day extents shrink, so a
    // single-day probe touches strictly fewer files
    assert(zSpan < linSpan, s"z span $zSpan !< linear span $linSpan")
    assert(zProbe < linProbe, s"z probe $zProbe !< linear probe $linProbe")
    assert(zProbe >= 1 && zFiles >= 1 && linFiles >= 1)
  }

  test("composite key build/parse round-trips for generated inputs") {
    // key parts as the reference builds them (date#line#rn#trDr,
    // get_train_status.py:113) — '#'-free non-empty alphanumerics
    val part = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val cases = samples(Gen.zip(part, part, part, part), 60)
    val df = cases.toDF("a", "b", "c", "d")
      .withColumn("key", concat_ws("#", $"a", $"b", $"c", $"d"))
      .withColumn("parts", split($"key", "#"))
    val bad = df.filter(
      size($"parts") =!= 4 ||
        $"parts".getItem(0) =!= $"a" || $"parts".getItem(1) =!= $"b" ||
        $"parts".getItem(2) =!= $"c" || $"parts".getItem(3) =!= $"d")
    assert(bad.count() === 0)
  }

  test("to_json/from_json round-trips records with special characters") {
    // covers quotes, backslashes, unicode, newlines — the reference's
    // special-char cases, property-style
    val tricky = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\t', 'é', '中', '#', ' ')))
      .map(_.mkString)
    val cases = samples(Gen.zip(tricky, Gen.choose(-1000000L, 1000000L)), 60)
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("n", LongType)))
    val df = cases.toDF("s", "n")
      .withColumn("js", to_json(struct($"s", $"n")))
      .withColumn("back", from_json($"js", schema))
    val bad = df.filter(
      !($"back.s" <=> $"s") || !($"back.n" <=> $"n"))
    assert(bad.count() === 0)
  }

  test("floor-division identity: pmod form == true floor on any sign") {
    // the round-12 oracle-drift fix, pinned as a property: both engines'
    // k-means/PQ mirrors rely on (s − ((s % n + n) % n)) ÷ n being the
    // TRUE floor of s/n under a TRUNCATING integer division (Spark `div`,
    // DuckDB `//`), for either sign of s. BigInteger floorDiv is the
    // ground truth. Also pins the failure this fix closed: bare
    // truncating division DIVERGES from floor on negative non-exact
    // quotients, so a mirror that uses it silently drifts.
    val cases = samples(Gen.zip(
      Gen.choose(-3000000000L, 3000000000L),
      Gen.choose(1L, 5000L)), 200)
    cases.foreach { case (s, n) =>
      val truth = Math.floorDiv(s, n)
      val pmodForm = (s - (((s % n) + n) % n)) / n
      assert(pmodForm === truth, s"identity broke at s=$s n=$n")
      if (s < 0 && s % n != 0)
        assert(s / n === truth + 1,
          s"expected bare truncation to sit one above floor at s=$s n=$n")
    }
    // and the Spark column form agrees with the scalar identity
    val df = cases.toDF("s", "n")
      .withColumn("f", expr("(s - ((s % n + n) % n)) div n"))
      .as[(Long, Long, Long)]
    df.collect().foreach { case (s, n, f) =>
      assert(f === Math.floorDiv(s, n), s"column form broke at s=$s n=$n")
    }
  }
}
