package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Real geometry arithmetic for the spatial operators the reference
  * runs through arcpy (gSSURGO_Clip.py:63-336 Clip_analysis;
  * SSURGO_ExportMuRaster.py:1252-1357 PolygonToRaster cell lookup) —
  * previously modeled key-relationally (J16/S7, SURVEY §1.5). The
  * subset implemented here is the integer-exact core that IS
  * engine-portable: axis-aligned clip, shoelace polygon area, and
  * ray-casting point-in-polygon, all in pure column arithmetic.
  *
  * Scale shape: every function is per-row expression work (no UDF, no
  * shuffle, no driver loop) — the per-row cost is O(vertices). A full
  * distributed spatial JOIN composes these with a grid-cell bucket
  * join: bboxClip against grid cells is the candidate generator (the
  * same blocked-candidates shape as the LSH dedup family), and the
  * exact predicate (pointInPolygon / clip area > 0) verifies
  * bucket-mates — never a geometry cross join.
  *
  * Integer contract: coordinates are BIGINT (a fixed-point grid — the
  * raster cell space of SSURGO_ExportMuRaster). All predicates reduce
  * to integer multiply/compare, so Spark and any ANSI engine agree
  * bit-for-bit; nothing here rounds. */
object Geo {

  /** Clipped box of (x0,y0,x1,y1) against (a0,b0,a1,b1) as a struct
    * (ix0, iy0, ix1, iy1, area); empty intersections have area 0 and
    * ix/iy columns NULL. Boxes are half-open [x0,x1)×[y0,y1): touching
    * edges do not intersect (area would be 0). */
  def bboxClip(x0: Column, y0: Column, x1: Column, y1: Column,
      a0: Long, b0: Long, a1: Long, b1: Long): Column = {
    val ix0 = greatest(x0, lit(a0)); val iy0 = greatest(y0, lit(b0))
    val ix1 = least(x1, lit(a1));    val iy1 = least(y1, lit(b1))
    val hit = ix1 > ix0 && iy1 > iy0
    struct(
      when(hit, ix0).as("ix0"), when(hit, iy0).as("iy0"),
      when(hit, ix1).as("ix1"), when(hit, iy1).as("iy1"),
      when(hit, (ix1 - ix0) * (iy1 - iy0)).otherwise(lit(0L)).as("area"))
  }

  /** Twice the absolute shoelace area of the polygon whose vertices
    * are parallel BIGINT arrays xs/ys (closed implicitly: vertex n
    * connects back to vertex 1). Doubled to stay integer-exact for
    * odd areas; callers wanting float area divide at the edge. */
  def polygonArea2(xs: Column, ys: Column): Column = {
    val n = size(xs)
    abs(aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val j = (i % n) + 1
      acc + element_at(xs, i) * element_at(ys, j) -
        element_at(xs, j) * element_at(ys, i)
    }))
  }

  /** Ray-casting point-in-polygon over parallel BIGINT vertex arrays:
    * casts the +x ray from (px,py) and counts edge crossings with the
    * standard half-open rule ((y1<=py) != (y2<=py)) and the integer
    * cross-product side test — no division, no floats, so the
    * boundary convention is identical in every engine that evaluates
    * the same arithmetic. Points exactly on an edge line (t = 0) are
    * NOT counted as crossings (consistently, both engines).
    *
    * PERFORMANCE: this higher-order form is CodegenFallback —
    * interpreted per row. Fine for per-polygon probes (s11's 3/row);
    * for cell-fan hot paths (millions of tests, the s12 zonal shape)
    * use the native codegen expression
    * org.apache.spark.sql.graft.PointInPolygon (≈20× faster,
    * GeoSpec pins the equivalence; NULL on malformed vertices where
    * this form emits a garbage verdict). */
  def pointInPolygon(px: Column, py: Column, xs: Column, ys: Column): Column = {
    val n = size(xs)
    val crossings = aggregate(sequence(lit(1), n), lit(0L), (acc, i) => {
      val j = (i % n) + 1
      val x1 = element_at(xs, i); val y1 = element_at(ys, i)
      val x2 = element_at(xs, j); val y2 = element_at(ys, j)
      val straddles = (y1 <= py) =!= (y2 <= py)
      // ray hits right of (px,py): sign((x1-px)(y2-y1) + (x2-x1)(py-y1))
      // must equal sign(y2-y1)
      val t = (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
      acc + when(straddles && ((t > 0) === (y2 > y1)) && t =!= 0, 1L)
        .otherwise(0L)
    })
    crossings % 2 === 1
  }
}
