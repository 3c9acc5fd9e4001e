package graft

import graft.functions.Geohash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Scalar reference: the classic bit-by-bit geohash (lng first). */
  private def refGeohash(latMilli: Long, lngMilli: Long, chars: Int): String = {
    var latLo = -90000.0; var latHi = 90000.0
    var lngLo = -180000.0; var lngHi = 180000.0
    val bits = new StringBuilder
    var evenBit = true // longitude first
    while (bits.length < chars * 5) {
      if (evenBit) {
        val mid = (lngLo + lngHi) / 2
        if (lngMilli >= mid) { bits += '1'; lngLo = mid } else { bits += '0'; lngHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (latMilli >= mid) { bits += '1'; latLo = mid } else { bits += '0'; latHi = mid }
      }
      evenBit = !evenBit
    }
    bits.toString.grouped(5)
      .map(g => Geohash.Alphabet(Integer.parseInt(g, 2))).mkString
  }

  test("encode matches the classic successive-halving algorithm") {
    val rnd = new scala.util.Random(19)
    val pts = (1 to 300).map(i => (i.toLong,
      rnd.nextLong(180001L) - 90000L, rnd.nextLong(360001L) - 180000L)) ++
      Seq((1001L, -90000L, -180000L), (1002L, 90000L, 180000L),
        (1003L, 0L, 0L), (1004L, 89999L, 179999L))
    val got = pts.toDF("id", "lat", "lng")
      .select(col("id"), Geohash.encode(col("lat"), col("lng"), 6).as("gh"))
      .as[(Long, String)].collect().toMap
    pts.foreach { case (id, lat, lng) =>
      // the top edge (+90/+180) clamps into the last cell, which the
      // halving loop reproduces because >= mid always goes high
      assert(got(id) == refGeohash(lat, lng, 6), s"($lat, $lng)")
    }
  }

  test("shared prefixes shrink with distance (locality)") {
    val base = (40123L, 116456L)
    val near = (40124L, 116457L) // ~1 milli-degree away
    val far = (-33000L, -70000L)
    val df = Seq(("b", base._1, base._2), ("n", near._1, near._2),
      ("f", far._1, far._2)).toDF("k", "lat", "lng")
      .select(col("k"), Geohash.encode(col("lat"), col("lng"), 8).as("gh"))
      .as[(String, String)].collect().toMap
    assert(df("b").zip(df("n")).takeWhile { case (a, b) => a == b }.length >= 5)
    assert(df("b").head != df("f").head)
  }

  test("cells clamp and stay in range across the whole domain") {
    val edge = Seq(-90000L, -1L, 0L, 1L, 89999L, 90000L).map(l => (l, l * 2))
    val r = edge.toDF("lat", "lng")
      .select(Geohash.latCell(col("lat"), 15).as("la"),
        Geohash.lngCell(col("lng"), 15).as("lo"))
      .as[(Long, Long)].collect()
    assert(r.forall { case (la, lo) =>
      la >= 0 && la < 32768 && lo >= 0 && lo < 32768 })
  }

  test("out-of-range coordinates clamp to the boundary cell, not garbage") {
    // below-bottom inputs used to go NEGATIVE: conv rendered the negative
    // Morton key as unsigned 64-bit and lpad truncated it to a plausible-
    // looking but wrong geohash (ADVICE r7) — now both edges clamp
    val df = Seq(
      ("under", -95000L, -190000L), ("bottom", -90000L, -180000L),
      ("over", 95000L, 190000L), ("top", 90000L, 180000L))
      .toDF("k", "lat", "lng")
      .select(col("k"),
        Geohash.latCell(col("lat"), 15).as("la"),
        Geohash.lngCell(col("lng"), 15).as("lo"),
        Geohash.encode(col("lat"), col("lng"), 6).as("gh"))
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(df("under") == df("bottom"))
    assert(df("over") == df("top"))
    assert(df.values.forall { case (la, lo, gh) =>
      la >= 0 && la < 32768 && lo >= 0 && lo < 32768 && gh.length == 6 })
  }
}
