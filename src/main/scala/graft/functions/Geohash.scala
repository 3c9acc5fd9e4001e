package graft.functions

import graft.operators.Layout
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Integer geohash over milli-degree coordinates — the geospatial
  * bucketing a web-corpus enrichment pipeline needs (geo dedup, region
  * rollups, neighbor joins), built entirely from exact integer
  * arithmetic so every hash is DuckDB-replayable (no float lat/lng
  * anywhere: callers carry milli-degrees as longs).
  *
  * Canonical geohash bit layout for EVEN character counts: 5·c bits,
  * alternating longitude/latitude with longitude on the most
  * significant bit — exactly `Layout.zOrderKey(latCell, lngCell)` with
  * both cells at 5·c/2 bits (Morton puts y=lng on odd positions, so the
  * MSB of the 5·c-bit key is a longitude bit, matching the standard).
  * Cells are the canonical successive-halving cells:
  * `floor((deg + 90|180) / extent · 2^bits)`, clamped at the top edge.
  * Base32 rendering uses the standard geohash alphabet.
  */
object Geohash {

  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Exact floor division for non-negative operands (Column has no
    * integral div; double `/` is lossy past 2⁵³).
    */
  private def fdiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** Latitude cell at `bits` resolution from milli-degrees in
    * [-90000, 90000]; BOTH edges clamp into the boundary cell. Without
    * the bottom clamp an out-of-range input yields a negative cell →
    * negative Morton key → `conv` renders it as unsigned 64-bit and
    * `lpad` truncates, silently emitting a plausible-looking but wrong
    * geohash (ADVICE r7).
    */
  def latCell(latMilli: Column, bits: Int): Column =
    least(greatest(fdiv((latMilli + 90000L) * (1L << bits), 180000L),
      lit(0L)), lit((1L << bits) - 1))

  /** Longitude cell from milli-degrees in [-180000, 180000]; both
    * edges clamp (see [[latCell]]).
    */
  def lngCell(lngMilli: Column, bits: Int): Column =
    least(greatest(fdiv((lngMilli + 180000L) * (1L << bits), 360000L),
      lit(0L)), lit((1L << bits) - 1))

  /** The 5·c-bit integer geohash (even `chars` only — odd precisions
    * flip the interleave parity; use the next even size and truncate
    * downstream if needed).
    */
  def encodeBits(latMilli: Column, lngMilli: Column, chars: Int): Column = {
    require(chars >= 2 && chars % 2 == 0 && chars <= 12,
      s"chars must be even in [2, 12]: $chars")
    val bits = 5 * chars / 2
    Layout.zOrderKey(latCell(latMilli, bits), lngCell(lngMilli, bits))
  }

  /** Digit alphabet of `conv(x, 10, 32)` / DuckDB `to_base(x, 32)` —
    * shared with the q195 oracle's translate so the two renderings stay
    * provably in sync.
    */
  private[graft] val Base32Std = "0123456789ABCDEFGHIJKLMNOPQRSTUV"

  /** Base32 geohash string of [[encodeBits]]: ONE `conv` to base-32 and
    * a `translate` remap onto the geohash alphabet (plus zero-padding).
    * Deliberately NOT a per-character extraction loop — that inlines the
    * whole Morton ladder once per character and the blown-up expression
    * tree falls out of whole-stage codegen (measured 26 s vs sub-second
    * at 2M rows).
    */
  def encode(latMilli: Column, lngMilli: Column, chars: Int): Column =
    lpad(translate(conv(encodeBits(latMilli, lngMilli, chars),
      10, 32), Base32Std, Alphabet), chars, "0")
}
